"""Behavioral / product-analytics queries over the events table:
conversion funnels, retention cohorts, transition matrices, two-sample
experiment statistics, forensic digit audits.

These extend the engine's north-star surface with the event-analytics
tier every lakehouse ETL feeds (the reference pipeline's gold layer
stops at daily KPIs; a consumer of those tables runs exactly these
shapes downstream). Determinism contract is the repo standard: exact
integer/decimal aggregates, final statistics as fixed left-associated
IEEE trees (mul/sub/add/div/sqrt only), bitwise DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table
from . import register

def dlit(x: float) -> str:
    """Render a python double as a DuckDB DOUBLE literal, exactly.

    A plain decimal string with > 15 significant digits (e.g.
    '0.9999847412109375') parses as DECIMAL(16,16) in DuckDB, and a
    later CAST to DOUBLE converts units→double then divides by
    10^scale — TWO roundings once the unit count passes 2^53, yielding
    a slightly different constant than the one python/Spark hold.
    Scientific notation forces the parser down the DOUBLE path, which
    is correctly rounded. 17 significant digits round-trip any double."""
    return f"{x:.17e}"


@register(
    "q_retention_cohorts",
    """
    WITH active AS (
        SELECT DISTINCT user_id,
               CAST((CAST(ts AS DATE) - DATE '1970-01-01') AS BIGINT) // 7 AS week
        FROM events
    ),
    cohort AS (
        SELECT user_id, MIN(week) AS cohort_week FROM active GROUP BY user_id
    ),
    sizes AS (
        SELECT cohort_week, COUNT(*) AS cohort_size FROM cohort GROUP BY cohort_week
    ),
    ret AS (
        SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
               COUNT(DISTINCT a.user_id) AS n_active
        FROM active a JOIN cohort c USING (user_id)
        GROUP BY 1, 2
    )
    SELECT r.cohort_week, r.week_offset,
           CAST(r.n_active AS BIGINT) AS n_active,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           CAST(r.n_active AS DOUBLE) / s.cohort_size AS retention_rate
    FROM ret r JOIN sizes s USING (cohort_week)
    """,
    doc="RETENTION COHORT table (the week-over-week retention triangle "
        "of product analytics): cohort = a user's first active "
        "epoch-week (epoch-day DIV 7 — engine-neutral, no week-start "
        "convention to disagree on), one row per (cohort_week, "
        "week_offset) with the surviving-user count and rate. Shape: "
        "the raw event stream dedups to (user, week) ONCE — the only "
        "data-sized aggregate; cohorts derive from that frame; the "
        "offset matrix is a self-equi-join of the deduped frame with "
        "the broadcast cohort map. At 100 TB: one shuffle on user_id, "
        "everything downstream bounded by users x weeks. Rates are "
        "single IEEE divisions of exact counts — bitwise.",
)
def q_retention_cohorts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    epoch_week = (
        F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).cast("long")
        / F.lit(7)
    ).cast("long")  # non-negative days: cast truncation == floor == DuckDB //
    active = ev.select("user_id", epoch_week.alias("week")).distinct()
    cohort = active.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    ret = (
        active.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    return ret.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        F.col("n_active").cast("long").alias("n_active"),
        F.col("cohort_size").cast("long").alias("cohort_size"),
        (F.col("n_active").cast("double") / F.col("cohort_size")).alias("retention_rate"),
    )


@register(
    "q_ab_welch_ttest",
    """
    WITH m AS (
        SELECT CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS DECIMAL(15,0)) AS n1,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS DECIMAL(15,0)) AS n2,
               CAST(SUM(CASE WHEN event_type = 'click'
                        THEN CAST(value * 100 AS DECIMAL(14,0)) END)
                    AS DECIMAL(16,0)) AS s1,
               CAST(SUM(CASE WHEN event_type = 'view'
                        THEN CAST(value * 100 AS DECIMAL(14,0)) END)
                    AS DECIMAL(16,0)) AS s2,
               CAST(SUM(CASE WHEN event_type = 'click'
                        THEN CAST(CAST(value * 100 AS DECIMAL(14,0))
                             AS DECIMAL(19,0)) * CAST(value * 100 AS DECIMAL(14,0)) END)
                    AS DECIMAL(22,0)) AS q1,
               CAST(SUM(CASE WHEN event_type = 'view'
                        THEN CAST(CAST(value * 100 AS DECIMAL(14,0))
                             AS DECIMAL(19,0)) * CAST(value * 100 AS DECIMAL(14,0)) END)
                    AS DECIMAL(22,0)) AS q2
        FROM events
    ),
    d AS (
        SELECT CAST(n1 AS BIGINT) AS n1_b, CAST(n2 AS BIGINT) AS n2_b,
               CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
               CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
               CAST(n1 * q1 - CAST(s1 AS DECIMAL(19,0)) * s1 AS DOUBLE)
                   / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)
                      * CAST(n1 AS DOUBLE)) AS se1,
               CAST(n2 * q2 - CAST(s2 AS DECIMAL(19,0)) * s2 AS DOUBLE)
                   / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)
                      * CAST(n2 AS DOUBLE)) AS se2
        FROM m
    )
    SELECT n1_b AS n_click, n2_b AS n_view,
           m1 AS mean_click_cents, m2 AS mean_view_cents,
           m1 - m2 AS mean_diff_cents,
           (m1 - m2) / sqrt(se1 + se2) AS t_stat,
           (se1 + se2) * (se1 + se2)
               / (se1 * se1 / (CAST(n1_b AS DOUBLE) - 1.0)
                  + se2 * se2 / (CAST(n2_b AS DOUBLE) - 1.0)) AS welch_dof
    FROM d
    """,
    doc="WELCH TWO-SAMPLE T-TEST between the value distributions of "
        "'click' and 'view' events — the A/B-experiment readout "
        "(unequal variances, Welch-Satterthwaite dof), computed from "
        "ONE conditional-moment pass: n/sum/sum-of-squares per arm as "
        "exact integer decimals (q_corr_matrix's cents discipline and "
        "width proof), then t = (m1-m2)/sqrt(s1^2/n1 + s2^2/n2) and "
        "the dof as one fixed IEEE tree — no variance two-pass, no "
        "libm beyond sqrt, bitwise oracle. se_i here is s_i^2/n_i "
        "(the squared standard error). At 100 TB: one scan, one 1-row "
        "aggregate — the cheapest possible experiment analysis.",
)
def q_ab_welch_ttest(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value") * 100).cast("decimal(14,0)")

    def arm(cond_type):
        c = F.when(F.col("event_type") == cond_type, cents)
        csq = F.when(
            F.col("event_type") == cond_type, cents.cast("decimal(19,0)") * cents
        )
        return c, csq

    c1, q1 = arm("click")
    c2, q2 = arm("view")
    m = ev.agg(
        F.sum((F.col("event_type") == "click").cast("int")).cast("decimal(15,0)").alias("n1"),
        F.sum((F.col("event_type") == "view").cast("int")).cast("decimal(15,0)").alias("n2"),
        F.sum(c1).cast("decimal(16,0)").alias("s1"),
        F.sum(c2).cast("decimal(16,0)").alias("s2"),
        F.sum(q1).cast("decimal(22,0)").alias("q1"),
        F.sum(q2).cast("decimal(22,0)").alias("q2"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    m1 = F.col("s1").cast("double") / n1d
    m2 = F.col("s2").cast("double") / n2d
    se1 = (F.col("n1") * F.col("q1") - F.col("s1").cast("decimal(19,0)") * F.col("s1")).cast(
        "double"
    ) / (n1d * (n1d - F.lit(1.0)) * n1d)
    se2 = (F.col("n2") * F.col("q2") - F.col("s2").cast("decimal(19,0)") * F.col("s2")).cast(
        "double"
    ) / (n2d * (n2d - F.lit(1.0)) * n2d)
    d = m.select(
        F.col("n1").cast("long").alias("n1_b"),
        F.col("n2").cast("long").alias("n2_b"),
        m1.alias("m1"),
        m2.alias("m2"),
        se1.alias("se1"),
        se2.alias("se2"),
    )
    return d.select(
        F.col("n1_b").alias("n_click"),
        F.col("n2_b").alias("n_view"),
        F.col("m1").alias("mean_click_cents"),
        F.col("m2").alias("mean_view_cents"),
        (F.col("m1") - F.col("m2")).alias("mean_diff_cents"),
        ((F.col("m1") - F.col("m2")) / F.sqrt(F.col("se1") + F.col("se2"))).alias("t_stat"),
        (
            (F.col("se1") + F.col("se2")) * (F.col("se1") + F.col("se2"))
            / (
                F.col("se1") * F.col("se1") / (F.col("n1_b").cast("double") - F.lit(1.0))
                + F.col("se2") * F.col("se2") / (F.col("n2_b").cast("double") - F.lit(1.0))
            )
        ).alias("welch_dof"),
    )


# log10(1 + 1/d) for d = 1..9, written at full 17-sig-digit precision so
# both engines parse the literal to the identical double
_BENFORD_P = {
    1: "0.3010299956639812",
    2: "0.17609125905568124",
    3: "0.12493873660829992",
    4: "0.09691001300805642",
    5: "0.07918124604762482",
    6: "0.06694678963061322",
    7: "0.05799194697768673",
    8: "0.05115252244738129",
    9: "0.04575749056067514",
}


def _benford_oracle_sql() -> str:
    counts = ", ".join(
        f"CAST(SUM(CASE WHEN substr(CAST(CAST(o_totalprice * 100 AS DECIMAL(14,0)) "
        f"AS VARCHAR), 1, 1) = '{d}' THEN 1 ELSE 0 END) AS BIGINT) AS c{d}"
        for d in range(1, 10)
    )
    chi2 = " + ".join(
        f"(CAST(c{d} AS DOUBLE) - CAST(n AS DOUBLE) * {dlit(float(p))}) * "
        f"(CAST(c{d} AS DOUBLE) - CAST(n AS DOUBLE) * {dlit(float(p))}) / "
        f"(CAST(n AS DOUBLE) * {dlit(float(p))})"
        for d, p in _BENFORD_P.items()
    )
    arms = "\n        UNION ALL ".join(
        f"SELECT {d} AS digit, c{d} AS n_observed, "
        f"CAST(c{d} AS DOUBLE) / CAST(n AS DOUBLE) AS freq_observed, "
        f"{dlit(float(p))} AS freq_benford, chi2, n FROM agg2"
        for d, p in _BENFORD_P.items()
    )
    return f"""
    WITH agg AS (
        SELECT COUNT(*) AS n, {counts}
        FROM orders WHERE o_totalprice > 0
    ),
    agg2 AS (SELECT *, ({chi2}) AS chi2 FROM agg)
    SELECT digit, n_observed, freq_observed, freq_benford, chi2,
           CAST(n AS BIGINT) AS n
    FROM ({arms})
    """


@register(
    "q_benford_audit",
    _benford_oracle_sql(),
    doc="BENFORD'S-LAW forensic audit of order totals: leading-digit "
        "distribution vs log10(1+1/d) with the chi-square statistic — "
        "the fraud/synthetic-data smell test auditors run on financial "
        "columns (synthetic uniform data FAILS it loudly, which is "
        "itself the honest readout here). Digit extraction is exact "
        "and engine-neutral: the amount becomes integer CENTS "
        "(tie-free decimal cast) and the first character of the "
        "integer's decimal rendering is the leading significant digit "
        "— no log10/pow FP boundary risk. The nine Benford "
        "probabilities enter both engines as identical 17-digit "
        "literals; chi2 is one fixed IEEE tree over exact counts — "
        "bitwise. One scan, one 1-row aggregate fanned to 9 rows: "
        "scale-free.",
)
def q_benford_audit(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice") * 100).cast("decimal(14,0)")
    first = F.substring(cents.cast("string"), 1, 1)
    agg = orders.filter(F.col("o_totalprice") > 0).agg(
        F.count("*").alias("n"),
        *[
            F.sum((first == str(d)).cast("int")).cast("long").alias(f"c{d}")
            for d in range(1, 10)
        ],
    )
    nD = F.col("n").cast("double")
    chi2 = None
    for d, p in _BENFORD_P.items():
        term = (
            (F.col(f"c{d}").cast("double") - nD * F.lit(float(p)))
            * (F.col(f"c{d}").cast("double") - nD * F.lit(float(p)))
            / (nD * F.lit(float(p)))
        )
        chi2 = term if chi2 is None else chi2 + term
    agg2 = agg.withColumn("chi2", chi2)
    stack_args = ", ".join(
        f"{d}, c{d}, CAST(c{d} AS DOUBLE) / CAST(n AS DOUBLE), "
        f"CAST({p} AS DOUBLE)"
        for d, p in _BENFORD_P.items()
    )
    return agg2.selectExpr(
        f"stack(9, {stack_args}) AS (digit, n_observed, freq_observed, freq_benford)",
        "chi2",
        "CAST(n AS BIGINT) AS n",
    )


_EWMA_TERMS = 16
# dyadic weight mass of 16 terms: 1 - 2^-16, exactly representable
_EWMA_MASS = 1.0 - 2.0 ** -_EWMA_TERMS


def _ewma_oracle_sql() -> str:
    lags = ", ".join(
        f"LAG(value, {i}) OVER w AS x{i}" for i in range(_EWMA_TERMS)
    )
    # dlit() every constant: bare decimal literals parse as DECIMAL in
    # DuckDB and pull the arithmetic out of the double domain (1-ulp
    # drift on most rows, found the hard way — see dlit's docstring)
    raw = " + ".join(
        f"x{i} * {dlit(2.0 ** -(i + 1))}" for i in range(_EWMA_TERMS)
    )
    return f"""
    WITH lagged AS (
        SELECT user_id, event_id, ts, value, {lags}
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, value,
           ({raw}) / {dlit(_EWMA_MASS)} AS ewma
    FROM lagged WHERE x{_EWMA_TERMS - 1} IS NOT NULL
    """


@register(
    "q_ewma_smoother",
    _ewma_oracle_sql(),
    doc="Per-user EXPONENTIAL MOVING AVERAGE (half-life 1 event, the "
        "alpha=1/2 EWMA) of event values — the streaming-metrics "
        "smoother, formulated EXACTLY: with a dyadic alpha every "
        "weight 2^-(i+1) is a power of two, so each term x*2^-k is an "
        "EXACT FP scaling (no rounding at all), the 16-term truncated "
        "sum is one fixed left-associated tree, and the tail "
        "renormalization divides by the exactly-representable mass "
        "1-2^-16 — bitwise with NO decimal casts anywhere, the only "
        "query family where raw double arithmetic is exact by "
        "construction. Truncation at 16 terms bounds the discarded "
        "mass at 2^-16 of the oldest history (renormalized away) and "
        "keeps the plan a single per-user window pass (PARTITION BY "
        "user — thousands of concurrent partitions, deterministic "
        "(ts, event_id) order, full-history rows only). At 100 TB: "
        "one shuffle on user_id, embarrassingly parallel after.",
)
def q_ewma_smoother(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        "event_id",
        "value",
        *[F.lag("value", i).over(w).alias(f"x{i}") for i in range(_EWMA_TERMS)],
    )
    raw = F.col("x0") * F.lit(2.0 ** -1)
    for i in range(1, _EWMA_TERMS):
        raw = raw + F.col(f"x{i}") * F.lit(2.0 ** -(i + 1))
    return lagged.filter(F.col(f"x{_EWMA_TERMS - 1}").isNotNull()).select(
        "user_id",
        "event_id",
        "value",
        (raw / F.lit(_EWMA_MASS)).alias("ewma"),
    )


def _gini_oracle_sql() -> str:
    from .aggregates import dec0_to_double_sql

    num = dec0_to_double_sql(
        "(CAST(2 AS DECIMAL(2,0)) * s_ix - (n + CAST(1 AS DECIMAL(2,0))) * s_x)"
    )
    den = dec0_to_double_sql("(n * s_x)")
    return f"""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(14,0)))
                    AS DECIMAL(16,0)) AS cents
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT cents,
               ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i
        FROM rev
    ),
    m AS (
        SELECT CAST(COUNT(*) AS DECIMAL(8,0)) AS n,
               CAST(SUM(cents) AS DECIMAL(20,0)) AS s_x,
               CAST(SUM(CAST(i AS DECIMAL(19,0)) * cents) AS DECIMAL(26,0)) AS s_ix
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(s_x AS BIGINT) AS total_cents,
           {num} / {den} AS gini
    FROM m
    """


@register(
    "q_gini_concentration",
    _gini_oracle_sql(),
    doc="GINI COEFFICIENT of customer revenue concentration (the "
        "inequality audit behind 'top 1% of customers drive X%' — and "
        "for training corpora, source-concentration risk): rank every "
        "customer's exact revenue cents ascending, then the closed "
        "form (2*SUM(i*x) - (n+1)*SUM(x)) / (n*SUM(x)). The global "
        "rank uses operators/indexing.global_row_number (range "
        "exchange + per-partition offsets — NO SinglePartition window, "
        "the r3 RFM lesson) with a (cents, custkey) total order; "
        "moments are exact integer decimals; the two wide products "
        "convert through dec0_to_double (n*SUM(i*x) reaches 2^64+ "
        "where DuckDB's native int128->double cast mis-rounds). One "
        "revenue aggregate + one range exchange + one moment fold: "
        "scale-safe. Bitwise oracle.",
)
def q_gini_concentration(spark, sf_dir):
    from ..operators.indexing import global_row_number
    from .aggregates import dec0_to_double

    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum((F.col("o_totalprice") * 100).cast("decimal(14,0)"))
        .cast("decimal(16,0)")
        .alias("cents")
    )
    ranked = global_row_number(rev, ["cents", "o_custkey"], out_col="i")
    m = ranked.agg(
        F.count("*").cast("decimal(8,0)").alias("n"),
        F.sum("cents").cast("decimal(20,0)").alias("s_x"),
        F.sum(F.col("i").cast("decimal(19,0)") * F.col("cents"))
        .cast("decimal(26,0)")
        .alias("s_ix"),
    )
    two = F.lit(2).cast("decimal(2,0)")
    one = F.lit(1).cast("decimal(2,0)")
    num = dec0_to_double(two * F.col("s_ix") - (F.col("n") + one) * F.col("s_x"))
    den = dec0_to_double(F.col("n") * F.col("s_x"))
    return m.select(
        F.col("n").cast("long").alias("n_customers"),
        F.col("s_x").cast("long").alias("total_cents"),
        (num / den).alias("gini"),
    )


def _cusum_oracle_sql() -> str:
    from .aggregates import dec0_to_double_sql

    return f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(14,0)))
                    AS DECIMAL(16,0)) AS x
        FROM orders GROUP BY 1
    ),
    cum AS (
        SELECT d,
               CAST(SUM(x) OVER (ORDER BY d) AS DECIMAL(20,0)) AS cx,
               CAST(ROW_NUMBER() OVER (ORDER BY d) AS DECIMAL(8,0)) AS k
        FROM daily
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS DECIMAL(8,0)) AS n,
               CAST(SUM(x) AS DECIMAL(20,0)) AS s
        FROM daily
    ),
    c AS (
        SELECT d, k, n * cx - k * s AS c_k, n, s
        FROM cum, tot
    )
    SELECT d AS changepoint_date,
           CAST(k AS BIGINT) AS day_index,
           CAST(n AS BIGINT) AS n_days,
           {dec0_to_double_sql("abs(c_k)")} AS cusum_peak_scaled,
           {dec0_to_double_sql("abs(c_k)")} / {dec0_to_double_sql("(n * s)")}
               AS cusum_normalized
    FROM c
    ORDER BY abs(c_k) DESC, d
    LIMIT 1
    """


@register(
    "q_cusum_changepoint",
    _cusum_oracle_sql(),
    doc="CUSUM CHANGEPOINT detection on the daily revenue series: the "
        "classic mean-shift locator argmax_k |sum_(i<=k)(x_i - mean)|, "
        "computed with NO division inside the scan by scaling through "
        "n: C_k = n*cumsum_k - k*total is an exact integer decimal "
        "with the same argmax. Shape: the order stream collapses to "
        "one row per DAY first (map-side-combining aggregate); the "
        "ordered cumulative window runs on that BOUNDED daily frame "
        "(one row per calendar day — the q_cumulative_distinct "
        "allowlist class, not a data-sized SinglePartition window); "
        "the 1-row (n, total) frame attaches via attach_scalar. The "
        "normalized peak converts through dec0_to_double (n*cumsum "
        "exceeds 2^64, DuckDB's native cast mis-rounds there). "
        "Deterministic: |C_k| ties break on earliest day. Bitwise.",
)
def q_cusum_changepoint(spark, sf_dir):
    from .aggregates import attach_scalar, dec0_to_double

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum((F.col("o_totalprice") * 100).cast("decimal(14,0)"))
        .cast("decimal(16,0)")
        .alias("x")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = daily.select(
        "d",
        F.sum("x").over(w).cast("decimal(20,0)").alias("cx"),
        F.row_number().over(Window.orderBy("d")).cast("decimal(8,0)").alias("k"),
    )
    tot = daily.agg(
        F.count("*").cast("decimal(8,0)").alias("n"),
        F.sum("x").cast("decimal(20,0)").alias("s"),
    )
    c = attach_scalar(cum, tot).withColumn(
        "c_k", F.col("n") * F.col("cx") - F.col("k") * F.col("s")
    )
    return (
        c.select(
            F.col("d").alias("changepoint_date"),
            F.col("k").cast("long").alias("day_index"),
            F.col("n").cast("long").alias("n_days"),
            dec0_to_double(F.abs(F.col("c_k"))).alias("cusum_peak_scaled"),
            (dec0_to_double(F.abs(F.col("c_k"))) / dec0_to_double(F.col("n") * F.col("s"))).alias(
                "cusum_normalized"
            ),
        )
        .orderBy(F.abs(F.col("c_k")).desc(), "changepoint_date")
        .limit(1)
    )


def _lorenz_oracle_sql() -> str:
    return """
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(14,0)))
                    AS DECIMAL(16,0)) AS cents
        FROM orders GROUP BY o_custkey
    ),
    tiled AS (
        SELECT cents, NTILE(10) OVER (ORDER BY cents, o_custkey) AS decile
        FROM rev
    ),
    per AS (
        SELECT decile, COUNT(*) AS n_customers,
               CAST(SUM(cents) AS DECIMAL(20,0)) AS decile_cents
        FROM tiled GROUP BY decile
    ),
    tot AS (SELECT CAST(SUM(cents) AS DECIMAL(20,0)) AS t FROM rev)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n_customers AS BIGINT) AS n_customers,
           CAST(decile_cents AS BIGINT) AS decile_cents,
           CAST(decile_cents AS DOUBLE) / CAST(t AS DOUBLE) AS revenue_share,
           CAST(SUM(decile_cents) OVER (ORDER BY decile) AS DOUBLE)
               / CAST(t AS DOUBLE) AS cumulative_share
    FROM per, tot
    """


@register(
    "q_lorenz_deciles",
    _lorenz_oracle_sql(),
    doc="LORENZ CURVE by revenue deciles — the visualization companion "
        "of q_gini_concentration ('the bottom 50% of customers hold X% "
        "of revenue'): customers NTILE into 10 revenue-ordered buckets "
        "via operators/indexing.distributed_ntile (range exchange + "
        "closed-form bucket sizes, bit-identical to the window NTILE "
        "with NO SinglePartition exchange on the data-sized frame), "
        "then one 10-row aggregate; the cumulative share runs on the "
        "TEN-row frame (bounded-frame window class). Exact cents "
        "throughout; the share divisions are single IEEE ops on "
        "sums below 2^53 at any realistic revenue — bitwise. "
        "Deterministic: (cents, custkey) total order.",
)
def q_lorenz_deciles(spark, sf_dir):
    from ..operators.indexing import distributed_ntile
    from .aggregates import attach_scalar

    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum((F.col("o_totalprice") * 100).cast("decimal(14,0)"))
        .cast("decimal(16,0)")
        .alias("cents")
    )
    tiled = distributed_ntile(rev, 10, ["cents", "o_custkey"], out_col="decile")
    per = tiled.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").cast("decimal(20,0)").alias("decile_cents"),
    )
    tot = rev.agg(F.sum("cents").cast("decimal(20,0)").alias("t"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return attach_scalar(per, tot).select(
        F.col("decile").cast("long").alias("decile"),
        F.col("n_customers").cast("long").alias("n_customers"),
        F.col("decile_cents").cast("long").alias("decile_cents"),
        (F.col("decile_cents").cast("double") / F.col("t").cast("double")).alias(
            "revenue_share"
        ),
        (
            F.sum("decile_cents").over(w).cast("double") / F.col("t").cast("double")
        ).alias("cumulative_share"),
    )


# Poisson(1) pmf cumulative cutoffs scaled to the 10^6 hash space:
# P(X<=k) for k=0..5; a 60-bit md5 draw mod 10^6 inverts to the
# replicate multiplicity. Integer literals — identical in both engines.
_POISSON_CUTS = (367879, 735758, 919698, 981011, 996340, 999405)
_BOOT_B = 64


def _boot_multiplicity_sql(u: str) -> str:
    arms = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POISSON_CUTS)
    )
    return f"CASE {arms} ELSE {len(_POISSON_CUTS)} END"


def _bootstrap_oracle_sql() -> str:
    u = "(('0x' || substr(md5(ed || ':' || b), 1, 15))::BIGINT % 1000000)"
    return f"""
    WITH daily AS (
        SELECT CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT) AS ed,
               CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(14,0)))
                    AS DECIMAL(16,0)) AS cents
        FROM orders GROUP BY 1
    ),
    reps AS (
        SELECT b.b AS b, {_boot_multiplicity_sql(u)} AS m, cents
        FROM daily, range({_BOOT_B}) b(b)
    ),
    means AS (
        SELECT b,
               CAST(SUM(CAST(m AS DECIMAL(4,0)) * cents) AS DOUBLE)
                   / CAST(SUM(m) AS DOUBLE) AS mean_b
        FROM reps GROUP BY b
    ),
    ranked AS (
        SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b, b) AS rn FROM means
    ),
    pt AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS mean_daily_cents
        FROM daily
    )
    SELECT pt.n_days, pt.mean_daily_cents,
           (SELECT mean_b FROM ranked WHERE rn = 2) AS ci_lower,
           (SELECT mean_b FROM ranked WHERE rn = {_BOOT_B - 1}) AS ci_upper,
           CAST({_BOOT_B} AS BIGINT) AS n_replicates
    FROM pt
    """


@register(
    "q_poisson_bootstrap",
    _bootstrap_oracle_sql(),
    doc="POISSON BOOTSTRAP confidence interval for the mean daily "
        "revenue — THE at-scale resampling technique: classic "
        "bootstrap needs sampling n rows WITH replacement per "
        "replicate (a global operation), while the Poisson(1) "
        "approximation draws each row's multiplicity independently, "
        "so all 64 replicates materialize in ONE streaming fan-out "
        "with no global state. Every draw is a deterministic md5 hash "
        "of (epoch-day, replicate) inverted through exact integer "
        "Poisson-cdf cutoffs — both engines reproduce every "
        "multiplicity bit-for-bit (no RNG). Replicate means are exact "
        "integer sums with one IEEE division; the 95% CI takes order "
        "statistics 2 and 63 over the 64-row replicate frame (bounded "
        "window class). At 100 TB: one scan, 64x map-side fan-out of "
        "the aggregated frame, 64-row reduce — uncertainty "
        "quantification at the cost of one extra aggregate.",
)
def q_poisson_bootstrap(spark, sf_dir):
    from ..operators.dedup import md5_id
    from .aggregates import attach_scalar

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01")))
        .cast("long")
        .alias("ed")
    ).agg(
        F.sum((F.col("o_totalprice") * 100).cast("decimal(14,0)"))
        .cast("decimal(16,0)")
        .alias("cents")
    )
    reps = daily.select(
        "ed", "cents", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b")
    )
    u = md5_id(F.concat_ws(":", F.col("ed"), F.col("b"))) % 1000000
    m = F.when(u < _POISSON_CUTS[0], 0)
    for k, c in enumerate(_POISSON_CUTS[1:], start=1):
        m = m.when(u < c, k)
    m = m.otherwise(len(_POISSON_CUTS))
    means = (
        reps.withColumn("m", m)
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("m").cast("decimal(4,0)") * F.col("cents")).cast("double")
                / F.sum("m").cast("double")
            ).alias("mean_b")
        )
    )
    ranked = means.select(
        "mean_b",
        F.row_number().over(Window.orderBy("mean_b", "b")).alias("rn"),
    )
    lo = ranked.filter(F.col("rn") == 2).select(F.col("mean_b").alias("ci_lower"))
    hi = ranked.filter(F.col("rn") == _BOOT_B - 1).select(
        F.col("mean_b").alias("ci_upper")
    )
    pt = daily.agg(
        F.count("*").cast("long").alias("n_days"),
        (F.sum("cents").cast("double") / F.count("*")).alias("mean_daily_cents"),
    )
    return attach_scalar(attach_scalar(pt, lo), hi).select(
        "n_days",
        "mean_daily_cents",
        "ci_lower",
        "ci_upper",
        F.lit(_BOOT_B).cast("long").alias("n_replicates"),
    )


_XCORR_MAX_LAG = 3


def _xcorr_oracle_sql() -> str:
    from .aggregates import dec0_to_double_sql

    return f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS DECIMAL(12,0)) AS x,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS DECIMAL(12,0)) AS y
        FROM events GROUP BY 1
    ),
    pairs AS (
        SELECT l.i AS lag, a.x AS x, b.y AS y
        FROM daily a
        JOIN (SELECT unnest(range(-{_XCORR_MAX_LAG}, {_XCORR_MAX_LAG + 1})) AS i) l ON true
        JOIN daily b ON b.d = a.d + CAST(l.i AS INT)
    ),
    m AS (
        SELECT lag,
               CAST(COUNT(*) AS DECIMAL(8,0)) AS n,
               CAST(SUM(x) AS DECIMAL(16,0)) AS s_x,
               CAST(SUM(y) AS DECIMAL(16,0)) AS s_y,
               CAST(SUM(CAST(x AS DECIMAL(19,0)) * y) AS DECIMAL(22,0)) AS s_xy,
               CAST(SUM(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(22,0)) AS s_xx,
               CAST(SUM(CAST(y AS DECIMAL(19,0)) * y) AS DECIMAL(22,0)) AS s_yy
        FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag,
           CAST(n AS BIGINT) AS n_pairs,
           {dec0_to_double_sql('(n * s_xy - CAST(s_x AS DECIMAL(19,0)) * s_y)')} /
           (sqrt({dec0_to_double_sql('(n * s_xx - CAST(s_x AS DECIMAL(19,0)) * s_x)')}) *
            sqrt({dec0_to_double_sql('(n * s_yy - CAST(s_y AS DECIMAL(19,0)) * s_y)')}))
               AS xcorr
    FROM m
    """


@register(
    "q_cross_correlation",
    _xcorr_oracle_sql(),
    doc="LEAD-LAG CROSS-CORRELATION between daily click and purchase "
        "counts at lags -3..+3 — the 'do clicks lead purchases?' "
        "diagnostic (positive-lag peak = clicks lead): lag-k Pearson "
        "between click count on day d and purchase count on day d+k, "
        "via the same exact lag-pair moment machinery as "
        "q_autocorrelation (one events scan collapsing to a two-"
        "series daily frame, 7-way lag fan-out, equi-join, closed "
        "form over dec0_to_double-converted exact moments). Bitwise.",
)
def q_cross_correlation(spark, sf_dir):
    from .aggregates import dec0_to_double

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum((F.col("event_type") == "click").cast("int"))
        .cast("decimal(12,0)")
        .alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("decimal(12,0)")
        .alias("y"),
    )
    lagged = daily.select(
        F.explode(F.sequence(F.lit(-_XCORR_MAX_LAG), F.lit(_XCORR_MAX_LAG))).alias("lag"),
        F.col("d").alias("d_b"),
        F.col("y").alias("y"),
    ).withColumn("d", F.expr("date_add(d_b, -lag)"))
    pairs = daily.drop("y").join(lagged, "d").select("lag", "x", "y")
    m = pairs.groupBy("lag").agg(
        F.count("*").cast("decimal(8,0)").alias("n"),
        F.sum("x").cast("decimal(16,0)").alias("s_x"),
        F.sum("y").cast("decimal(16,0)").alias("s_y"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y"))
        .cast("decimal(22,0)")
        .alias("s_xy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x"))
        .cast("decimal(22,0)")
        .alias("s_xx"),
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y"))
        .cast("decimal(22,0)")
        .alias("s_yy"),
    )
    n = F.col("n")
    num = dec0_to_double(n * F.col("s_xy") - F.col("s_x").cast("decimal(19,0)") * F.col("s_y"))
    den_x = dec0_to_double(n * F.col("s_xx") - F.col("s_x").cast("decimal(19,0)") * F.col("s_x"))
    den_y = dec0_to_double(n * F.col("s_yy") - F.col("s_y").cast("decimal(19,0)") * F.col("s_y"))
    return m.select(
        F.col("lag").cast("long").alias("lag"),
        n.cast("long").alias("n_pairs"),
        (num / (F.sqrt(den_x) * F.sqrt(den_y))).alias("xcorr"),
    )


def _burstiness_oracle_sql() -> str:
    from .aggregates import dec0_to_double_sql

    return f"""
    WITH gaps AS (
        SELECT user_id,
               CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS DECIMAL(14,0)) AS g
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    m AS (
        SELECT user_id,
               CAST(COUNT(g) AS DECIMAL(8,0)) AS n,
               CAST(SUM(g) AS DECIMAL(18,0)) AS s,
               CAST(SUM(CAST(g AS DECIMAL(19,0)) * g) AS DECIMAL(28,0)) AS q
        FROM gaps WHERE g IS NOT NULL GROUP BY user_id HAVING COUNT(g) >= 2
    ),
    d AS (
        SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
               {dec0_to_double_sql('s')} / CAST(n AS DOUBLE) AS mu,
               sqrt({dec0_to_double_sql('(n * q - CAST(s AS DECIMAL(19,0)) * s)')}
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS sigma
        FROM m
    )
    SELECT user_id, n_gaps, mu AS mean_gap_us, sigma AS std_gap_us,
           (sigma - mu) / (sigma + mu) AS burstiness
    FROM d
    """


@register(
    "q_burstiness",
    _burstiness_oracle_sql(),
    doc="PER-USER BURSTINESS of event timing — the Goh-Barabasi index "
        "B = (sigma - mu)/(sigma + mu) over inter-event gaps: -1 = "
        "perfectly periodic, 0 = Poisson, ->1 = heavy-tailed bursts. "
        "The behavioral-timing fingerprint (bot detection, engagement "
        "modeling) computed exactly: gaps are integer MICROSECONDS "
        "(timestampdiff on NTZ — the q_sessionize discipline), the "
        "per-user (n, sum, sum-of-squares) moments are exact decimals, "
        "sigma is the sample-variance closed form under sqrt, and "
        "the wide products convert via dec0_to_double. One per-user "
        "window pass (partitioned — thousands of concurrent "
        "partitions) + one grouped aggregate. Bitwise.",
)
def q_burstiness(spark, sf_dir):
    from .aggregates import dec0_to_double

    ev = load_table(spark, sf_dir, "events")
    g = F.expr(
        "timestampdiff(MICROSECOND, lag(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id), ts)"
    ).cast("decimal(14,0)")
    gaps = ev.select("user_id", g.alias("g")).filter(F.col("g").isNotNull())
    m = gaps.groupBy("user_id").agg(
        F.count("g").cast("decimal(8,0)").alias("n"),
        F.sum("g").cast("decimal(18,0)").alias("s"),
        F.sum(F.col("g").cast("decimal(19,0)") * F.col("g"))
        .cast("decimal(28,0)")
        .alias("q"),
    ).filter(F.col("n") >= 2)
    nD = F.col("n").cast("double")
    mu = dec0_to_double(F.col("s")) / nD
    sigma = F.sqrt(
        dec0_to_double(F.col("n") * F.col("q") - F.col("s").cast("decimal(19,0)") * F.col("s"))
        / (nD * (nD - F.lit(1.0)))
    )
    return m.select(
        "user_id",
        F.col("n").cast("long").alias("n_gaps"),
        mu.alias("mean_gap_us"),
        sigma.alias("std_gap_us"),
        ((sigma - mu) / (sigma + mu)).alias("burstiness"),
    )


_DID_CUTOFF = "2024-01-16"


def _did_oracle_sql() -> str:
    def cell(grp, post):
        cond = (
            f"event_type = '{grp}' AND "
            + ("ts >= TIMESTAMP '" + _DID_CUTOFF + " 00:00:00'" if post
               else "ts < TIMESTAMP '" + _DID_CUTOFF + " 00:00:00'")
        )
        tag = f"{'c' if grp == 'click' else 'v'}{'1' if post else '0'}"
        return (
            f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS DECIMAL(15,0)) AS n_{tag}, "
            f"CAST(SUM(CASE WHEN {cond} THEN CAST(value * 100 AS DECIMAL(14,0)) END) "
            f"AS DECIMAL(16,0)) AS s_{tag}, "
            f"CAST(SUM(CASE WHEN {cond} THEN CAST(CAST(value * 100 AS DECIMAL(14,0)) "
            f"AS DECIMAL(19,0)) * CAST(value * 100 AS DECIMAL(14,0)) END) "
            f"AS DECIMAL(22,0)) AS q_{tag}"
        )

    cells = ", ".join(
        cell(g, p) for g in ("click", "view") for p in (False, True)
    )
    means = ", ".join(
        f"CAST(s_{t} AS DOUBLE) / CAST(n_{t} AS DOUBLE) AS m_{t}, "
        f"CAST(n_{t} * q_{t} - CAST(s_{t} AS DECIMAL(19,0)) * s_{t} AS DOUBLE) "
        f"/ (CAST(n_{t} AS DOUBLE) * (CAST(n_{t} AS DOUBLE) - 1.0) "
        f"* CAST(n_{t} AS DOUBLE)) AS se_{t}, "
        f"CAST(n_{t} AS BIGINT) AS nb_{t}"
        for t in ("c0", "c1", "v0", "v1")
    )
    return f"""
    WITH m AS (SELECT {cells} FROM events),
    d AS (SELECT {means} FROM m)
    SELECT nb_c0 AS n_click_pre, nb_c1 AS n_click_post,
           nb_v0 AS n_view_pre, nb_v1 AS n_view_post,
           m_c1 - m_c0 AS delta_click_cents,
           m_v1 - m_v0 AS delta_view_cents,
           (m_c1 - m_c0) - (m_v1 - m_v0) AS did_cents,
           ((m_c1 - m_c0) - (m_v1 - m_v0))
               / sqrt(se_c0 + se_c1 + se_v0 + se_v1) AS t_stat
    FROM d
    """


@register(
    "q_diff_in_diff",
    _did_oracle_sql(),
    doc="DIFFERENCE-IN-DIFFERENCES estimate — the quasi-experimental "
        "readout when randomization is impossible: click events as "
        "the treated series, view events as the control, periods "
        "split at Jan 16; DiD = (post-pre)_treated - (post-pre)_"
        "control nets out the common time trend. ONE conditional-"
        "moment pass produces all four cells (n, sum, sum-of-squares "
        "as exact integer decimals — q_ab_welch_ttest's discipline), "
        "then the estimate and its large-sample t = DiD / sqrt(sum "
        "of the four squared standard errors) are one fixed IEEE "
        "tree. At 100 TB: one scan, one 1-row aggregate. Bitwise.",
)
def q_diff_in_diff(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(_DID_CUTOFF + " 00:00:00").cast("timestamp_ntz")
    cents = (F.col("value") * 100).cast("decimal(14,0)")
    aggs = []
    for grp, gtag in (("click", "c"), ("view", "v")):
        for post in (False, True):
            tag = f"{gtag}{1 if post else 0}"
            cond = (F.col("event_type") == grp) & (
                (F.col("ts") >= cutoff) if post else (F.col("ts") < cutoff)
            )
            aggs += [
                F.sum(cond.cast("int")).cast("decimal(15,0)").alias(f"n_{tag}"),
                F.sum(F.when(cond, cents)).cast("decimal(16,0)").alias(f"s_{tag}"),
                F.sum(F.when(cond, cents.cast("decimal(19,0)") * cents))
                .cast("decimal(22,0)")
                .alias(f"q_{tag}"),
            ]
    m = ev.agg(*aggs)

    def mean(t):
        return F.col(f"s_{t}").cast("double") / F.col(f"n_{t}").cast("double")

    def se(t):
        nD = F.col(f"n_{t}").cast("double")
        return (
            F.col(f"n_{t}") * F.col(f"q_{t}")
            - F.col(f"s_{t}").cast("decimal(19,0)") * F.col(f"s_{t}")
        ).cast("double") / (nD * (nD - F.lit(1.0)) * nD)

    d = m.select(
        *[mean(t).alias(f"m_{t}") for t in ("c0", "c1", "v0", "v1")],
        *[se(t).alias(f"se_{t}") for t in ("c0", "c1", "v0", "v1")],
        *[F.col(f"n_{t}").cast("long").alias(f"nb_{t}") for t in ("c0", "c1", "v0", "v1")],
    )
    did = (F.col("m_c1") - F.col("m_c0")) - (F.col("m_v1") - F.col("m_v0"))
    return d.select(
        F.col("nb_c0").alias("n_click_pre"),
        F.col("nb_c1").alias("n_click_post"),
        F.col("nb_v0").alias("n_view_pre"),
        F.col("nb_v1").alias("n_view_post"),
        (F.col("m_c1") - F.col("m_c0")).alias("delta_click_cents"),
        (F.col("m_v1") - F.col("m_v0")).alias("delta_view_cents"),
        did.alias("did_cents"),
        (
            did
            / F.sqrt(F.col("se_c0") + F.col("se_c1") + F.col("se_v0") + F.col("se_v1"))
        ).alias("t_stat"),
    )


@register(
    "q_survival_hazard",
    """
    WITH tenure AS (
        SELECT user_id,
               CAST(MAX(CAST(ts AS DATE)) - MIN(CAST(ts AS DATE)) AS BIGINT)
                   AS t_days
        FROM events GROUP BY user_id
    ),
    churned AS (
        SELECT t_days, COUNT(*) AS n_churned FROM tenure GROUP BY t_days
    ),
    at_risk AS (
        SELECT u.d AS t_days, COUNT(*) AS n_at_risk
        FROM tenure, unnest(range(0, t_days + 1)) u(d)
        GROUP BY u.d
    )
    SELECT r.t_days AS tenure_day,
           CAST(r.n_at_risk AS BIGINT) AS n_at_risk,
           CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned,
           CAST(COALESCE(c.n_churned, 0) AS DOUBLE) / r.n_at_risk AS hazard
    FROM at_risk r LEFT JOIN churned c ON c.t_days = r.t_days
    """,
    doc="SURVIVAL LIFE TABLE (the Kaplan-Meier hazard decomposition) "
        "of user tenure: tenure = days between a user's first and last "
        "event; per tenure-day t the table reports n_at_risk (users "
        "whose tenure reaches t), n_churned (tenures ending exactly at "
        "t), and the discrete hazard d_t/n_t — the distributed "
        "artifact from which the survival curve folds as "
        "prod(1 - hazard) (a driver-trivial product over <= |days| "
        "rows; kept out of the query because cumulative FP products "
        "need libm log tricks, while the hazard column is one exact "
        "division). Shape: n_at_risk uses the q_sliding_wau "
        "CONTRIBUTION FAN-OUT — each user explodes to the t in "
        "[0, tenure] they survive through, one grouped count, NO "
        "window, no reverse cumsum — O(users x horizon) work that "
        "needs no global order at any scale. Bitwise.",
)
def q_survival_hazard(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    tenure = ev.groupBy("user_id").agg(
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts")))
        .cast("long")
        .alias("t_days")
    )
    churned = tenure.groupBy("t_days").agg(F.count("*").alias("n_churned"))
    at_risk = (
        tenure.select(
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("t_days"))).alias(
                "t_days"
            )
        )
        .groupBy("t_days")
        .agg(F.count("*").alias("n_at_risk"))
    )
    return (
        at_risk.join(F.broadcast(churned), "t_days", "left")
        .select(
            F.col("t_days").alias("tenure_day"),
            F.col("n_at_risk").cast("long").alias("n_at_risk"),
            F.coalesce(F.col("n_churned"), F.lit(0)).cast("long").alias("n_churned"),
            (
                F.coalesce(F.col("n_churned"), F.lit(0)).cast("double")
                / F.col("n_at_risk")
            ).alias("hazard"),
        )
    )


def _ks_oracle_sql() -> str:
    from .aggregates import dec0_to_double_sql

    return f"""
    WITH vals AS (
        SELECT CAST(value * 100 AS DECIMAL(14,0)) AS cents,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c2
        FROM events WHERE event_type IN ('click', 'view')
        GROUP BY 1
    ),
    cum AS (
        SELECT cents,
               SUM(c1) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS f1,
               SUM(c2) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS f2
        FROM vals
    ),
    tot AS (
        SELECT CAST(SUM(c1) AS DECIMAL(15,0)) AS n1,
               CAST(SUM(c2) AS DECIMAL(15,0)) AS n2
        FROM vals
    ),
    d AS (
        SELECT cents,
               abs(CAST(f1 AS DECIMAL(19,0)) * n2
                   - CAST(f2 AS DECIMAL(19,0)) * n1) AS d_num, n1, n2
        FROM cum, tot
    )
    SELECT CAST(n1 AS BIGINT) AS n_click,
           CAST(n2 AS BIGINT) AS n_view,
           CAST(cents AS BIGINT) AS ks_at_cents,
           {dec0_to_double_sql('d_num')} / {dec0_to_double_sql('(n1 * n2)')}
               AS ks_stat
    FROM d
    ORDER BY d_num DESC, cents
    LIMIT 1
    """


@register(
    "q_ks_test",
    _ks_oracle_sql(),
    doc="EXACT two-sample KOLMOGOROV-SMIRNOV statistic between the "
        "click and view value distributions: D = max_v |F1(v) - F2(v)| "
        "evaluated as the INTEGER cross-product form |cum1*n2 - "
        "cum2*n1| (no per-step division, no FP accumulation — the "
        "max and its argmax are decided on exact integers, then ONE "
        "dec0_to_double ratio at the end). The cumulative counts come "
        "from operators/indexing.distributed_prefix_sum — the "
        "two-phase range-exchange prefix sum (per-partition totals to "
        "the driver, local cumsum + base) that replaces the "
        "single-partition ordered window a naive CDF computation "
        "would plan; the KS scan is therefore shuffle-bounded by one "
        "range exchange at ANY number of distinct values. Tiebreak: "
        "smallest value at the maximal gap. Bitwise.",
)
def q_ks_test(spark, sf_dir):
    from ..operators.indexing import distributed_prefix_sum
    from .aggregates import attach_scalar, dec0_to_double

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    vals = ev.groupBy(
        (F.col("value") * 100).cast("decimal(14,0)").alias("cents")
    ).agg(
        F.sum((F.col("event_type") == "click").cast("int")).cast("long").alias("c1"),
        F.sum((F.col("event_type") == "view").cast("int")).cast("long").alias("c2"),
    )
    cum = distributed_prefix_sum(vals, ["cents"], ["c1", "c2"])
    tot = vals.agg(
        F.sum("c1").cast("decimal(15,0)").alias("n1"),
        F.sum("c2").cast("decimal(15,0)").alias("n2"),
    )
    d = attach_scalar(cum, tot).withColumn(
        "d_num",
        F.abs(
            F.col("cum_c1").cast("decimal(19,0)") * F.col("n2")
            - F.col("cum_c2").cast("decimal(19,0)") * F.col("n1")
        ),
    )
    return (
        d.orderBy(F.col("d_num").desc(), "cents")
        .limit(1)
        .select(
            F.col("n1").cast("long").alias("n_click"),
            F.col("n2").cast("long").alias("n_view"),
            F.col("cents").cast("long").alias("ks_at_cents"),
            (dec0_to_double(F.col("d_num")) / dec0_to_double(F.col("n1") * F.col("n2"))).alias(
                "ks_stat"
            ),
        )
    )


def _assoc_oracle_sql() -> str:
    return """
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    item_counts AS (
        SELECT l_partkey, COUNT(*) AS c FROM items GROUP BY l_partkey
    ),
    frequent AS (SELECT l_partkey FROM item_counts WHERE c >= 2),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS c_ab
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
        WHERE a.l_partkey IN (SELECT * FROM frequent)
          AND b.l_partkey IN (SELECT * FROM frequent)
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM items)
    SELECT p.part_a, p.part_b,
           CAST(p.c_ab AS BIGINT) AS support_count,
           CAST(p.c_ab AS DOUBLE) / ca.c AS confidence_a_to_b,
           CAST(p.c_ab AS DOUBLE) / cb.c AS confidence_b_to_a,
           (CAST(n.n_baskets AS DOUBLE) * p.c_ab)
               / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)) AS lift
    FROM pairs p
    JOIN item_counts ca ON ca.l_partkey = p.part_a
    JOIN item_counts cb ON cb.l_partkey = p.part_b
    CROSS JOIN n
    """


@register(
    "q_association_rules",
    _assoc_oracle_sql(),
    doc="ASSOCIATION RULES over the market-basket pairs: support "
        "count, directional CONFIDENCE P(b|a) and P(a|b), and LIFT "
        "n*c_ab/(c_a*c_b) — the recommendation-mining readout on top "
        "of q_basket_pairs' co-occurrence counts (which stop at "
        "support). Same a-priori discipline: items below min-support "
        "prune BEFORE pairing, pairs form by same-order equi-join "
        "with ordered keys; the item-count frame broadcasts twice for "
        "the two denominators and the 1-row basket total attaches via "
        "attach_scalar. All statistics are single IEEE ratios of "
        "exact counts — bitwise. One pair shuffle bounded by the "
        "frequent-item fan-out at any corpus size.",
)
def q_association_rules(spark, sf_dir):
    from .aggregates import attach_scalar

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    item_counts = items.groupBy("l_partkey").agg(F.count("*").alias("c"))
    frequent = item_counts.filter(F.col("c") >= 2).select("l_partkey")
    fitems = items.join(F.broadcast(frequent), "l_partkey").select(
        "l_orderkey", "l_partkey"
    )
    a = fitems.alias("a")
    b = fitems.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= 2)
    )
    n = items.agg(F.count_distinct("l_orderkey").alias("n_baskets"))
    ca = item_counts.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("c_a"))
    cb = item_counts.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("c_b"))
    out = (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
    )
    return attach_scalar(out, n).select(
        "part_a",
        "part_b",
        F.col("c_ab").cast("long").alias("support_count"),
        (F.col("c_ab").cast("double") / F.col("c_a")).alias("confidence_a_to_b"),
        (F.col("c_ab").cast("double") / F.col("c_b")).alias("confidence_b_to_a"),
        (
            F.col("n_baskets").cast("double") * F.col("c_ab")
            / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
        ).alias("lift"),
    )


def _winsor_oracle_sql() -> str:
    from .aggregates import dec0_to_double_sql

    return f"""
    WITH c AS (
        SELECT CAST(o_totalprice * 100 AS DECIMAL(14,0)) AS cents FROM orders
    ),
    ranked AS (
        SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn,
               COUNT(*) OVER () AS n
        FROM c
    ),
    bounds AS (
        SELECT MAX(CASE WHEN rn = n // 20 + 1 THEN cents END) AS lo,
               MAX(CASE WHEN rn = n - n // 20 THEN cents END) AS hi,
               MAX(n) AS n
        FROM ranked
    ),
    w AS (
        SELECT b.n, b.lo, b.hi,
               CAST(SUM(CASE WHEN c.cents < b.lo THEN b.lo
                             WHEN c.cents > b.hi THEN b.hi
                             ELSE c.cents END) AS DECIMAL(20,0)) AS s_w,
               CAST(SUM(c.cents) AS DECIMAL(20,0)) AS s_raw
        FROM c, bounds b GROUP BY 1, 2, 3
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(lo AS BIGINT) AS lo_cents,
           CAST(hi AS BIGINT) AS hi_cents,
           {dec0_to_double_sql('s_w')} / CAST(n AS DOUBLE) AS winsorized_mean_cents,
           {dec0_to_double_sql('s_raw')} / CAST(n AS DOUBLE) AS raw_mean_cents
    FROM w
    """


@register(
    "q_winsorized_mean",
    _winsor_oracle_sql(),
    doc="5% WINSORIZED MEAN of order totals — the robust-location "
        "estimator that survives fat tails by CLAMPING to the "
        "(floor(n/20)+1)-th and (n-floor(n/20))-th order statistics "
        "instead of dropping rows: both bounds come from "
        "operators/indexing.distributed_kth_smallest (sketch-"
        "bracketed exact selection, 2-3 scans each — never a global "
        "sort or SinglePartition window), then ONE clamp-and-sum "
        "pass in exact integer cents. Reported beside the raw mean "
        "so the tail influence is the visible delta. The oracle "
        "re-derives the same order statistics via ROW_NUMBER; both "
        "sides clamp identical exact integers — bitwise.",
)
def q_winsorized_mean(spark, sf_dir):
    from ..operators.indexing import distributed_kth_smallest
    from .aggregates import dec0_to_double

    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    k_lo = n // 20 + 1
    k_hi = n - n // 20
    lo = distributed_kth_smallest(orders, "o_totalprice", k_lo, scale=2, total=n)
    hi = distributed_kth_smallest(orders, "o_totalprice", k_hi, scale=2, total=n)
    lo_c = int(round(lo * 100))
    hi_c = int(round(hi * 100))
    cents = (F.col("o_totalprice") * 100).cast("decimal(14,0)")
    clamped = (
        F.when(cents < lo_c, F.lit(lo_c))
        .when(cents > hi_c, F.lit(hi_c))
        .otherwise(cents)
    )
    m = orders.agg(
        F.sum(clamped).cast("decimal(20,0)").alias("s_w"),
        F.sum(cents).cast("decimal(20,0)").alias("s_raw"),
    )
    return m.select(
        F.lit(n).cast("long").alias("n"),
        F.lit(lo_c).cast("long").alias("lo_cents"),
        F.lit(hi_c).cast("long").alias("hi_cents"),
        (dec0_to_double(F.col("s_w")) / F.lit(float(n))).alias("winsorized_mean_cents"),
        (dec0_to_double(F.col("s_raw")) / F.lit(float(n))).alias("raw_mean_cents"),
    )


def _mwu_oracle_sql() -> str:
    from .aggregates import dec0_to_double_sql

    return f"""
    WITH vals AS (
        SELECT CAST(value * 100 AS DECIMAL(14,0)) AS cents,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c2
        FROM events WHERE event_type IN ('click', 'view')
        GROUP BY 1
    ),
    cum AS (
        SELECT cents, c1, c2,
               SUM(c2) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) - c2
                   AS cum2_before,
               SUM(c1 + c2) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
                   - (c1 + c2) AS cumt_before
        FROM vals
    ),
    m AS (
        SELECT CAST(SUM(c1) AS DECIMAL(15,0)) AS n1,
               CAST(SUM(c2) AS DECIMAL(15,0)) AS n2,
               CAST(SUM(CAST(c1 AS DECIMAL(19,0))
                        * (2 * cum2_before + c2)) AS DECIMAL(26,0)) AS u2,
               CAST(SUM(CAST(c1 + c2 AS DECIMAL(19,0)) * (c1 + c2) * (c1 + c2)
                        - (c1 + c2)) AS DECIMAL(26,0)) AS tie_term
        FROM cum
    )
    SELECT CAST(n1 AS BIGINT) AS n_click, CAST(n2 AS BIGINT) AS n_view,
           {dec0_to_double_sql('u2')} / 2.0 AS u_statistic,
           ({dec0_to_double_sql('u2')} / 2.0
            - {dec0_to_double_sql('(n1 * n2)')} / 2.0)
           / sqrt(({dec0_to_double_sql('(n1 * n2)')} / 12.0)
                  * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0)
                     - {dec0_to_double_sql('tie_term')}
                       / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                          * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0))))
               AS z_score
    FROM m
    """


@register(
    "q_mann_whitney",
    _mwu_oracle_sql(),
    doc="MANN-WHITNEY U rank-sum test between click and view values — "
        "the nonparametric companion of q_ab_welch_ttest (no normality "
        "assumption; detects stochastic dominance): U = #(click > "
        "view) pairs + half-credit ties, computed EXACTLY without "
        "materializing pairs via the grouped-CDF identity 2U = "
        "sum_v c1(v)*(2*cum2_before(v) + c2(v)) over the distributed "
        "prefix-sum frame (operators/indexing.distributed_prefix_sum "
        "— no single-partition window, no O(n1*n2) pair join). The "
        "normal-approximation z carries the exact tie-correction term "
        "sum(t^3 - t); every moment is an exact integer and the z is "
        "one fixed IEEE tree — bitwise.",
)
def q_mann_whitney(spark, sf_dir):
    from ..operators.indexing import distributed_prefix_sum
    from .aggregates import dec0_to_double

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    vals = ev.groupBy(
        (F.col("value") * 100).cast("decimal(14,0)").alias("cents")
    ).agg(
        F.sum((F.col("event_type") == "click").cast("int")).cast("long").alias("c1"),
        F.sum((F.col("event_type") == "view").cast("int")).cast("long").alias("c2"),
    ).withColumn("ct", F.col("c1") + F.col("c2"))
    cum = distributed_prefix_sum(vals, ["cents"], ["c2"])
    m = cum.agg(
        F.sum("c1").cast("decimal(15,0)").alias("n1"),
        F.sum("c2").cast("decimal(15,0)").alias("n2"),
        F.sum(
            F.col("c1").cast("decimal(19,0)")
            * (2 * (F.col("cum_c2") - F.col("c2")) + F.col("c2"))
        )
        .cast("decimal(26,0)")
        .alias("u2"),
        F.sum(
            F.col("ct").cast("decimal(19,0)") * F.col("ct") * F.col("ct") - F.col("ct")
        )
        .cast("decimal(26,0)")
        .alias("tie_term"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    u = dec0_to_double(F.col("u2")) / F.lit(2.0)
    mean_u = dec0_to_double(F.col("n1") * F.col("n2")) / F.lit(2.0)
    var = (dec0_to_double(F.col("n1") * F.col("n2")) / F.lit(12.0)) * (
        (n1d + n2d + F.lit(1.0))
        - dec0_to_double(F.col("tie_term")) / ((n1d + n2d) * (n1d + n2d - F.lit(1.0)))
    )
    return m.select(
        F.col("n1").cast("long").alias("n_click"),
        F.col("n2").cast("long").alias("n_view"),
        u.alias("u_statistic"),
        ((u - mean_u) / F.sqrt(var)).alias("z_score"),
    )


@register(
    "q_chi2_independence",
    """
    WITH cells AS (
        SELECT event_type,
               CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS BIGINT) AS dow,
               CAST(COUNT(*) AS DECIMAL(15,0)) AS o
        FROM events GROUP BY 1, 2
    ),
    rows_m AS (SELECT event_type, CAST(SUM(o) AS DECIMAL(15,0)) AS r FROM cells GROUP BY 1),
    cols_m AS (SELECT dow, CAST(SUM(o) AS DECIMAL(15,0)) AS c FROM cells GROUP BY 1),
    tot   AS (SELECT CAST(SUM(o) AS DECIMAL(15,0)) AS n FROM cells),
    terms AS (
        SELECT cells.event_type, cells.dow,
               CAST(cells.o AS DOUBLE) AS o,
               CAST(rows_m.r AS DOUBLE) * CAST(cols_m.c AS DOUBLE)
                   / CAST(tot.n AS DOUBLE) AS e,
               CAST(tot.n AS BIGINT) AS n_events
        FROM cells
        JOIN rows_m USING (event_type)
        JOIN cols_m USING (dow)
        CROSS JOIN tot
    )
    SELECT COUNT(*) AS n_cells,
           MAX(n_events) AS n_events,
           list_sum(list_sort(list((o - e) * (o - e) / e))) AS chi2
    FROM terms
    """,
    doc="CHI-SQUARE INDEPENDENCE test between event type and day of "
        "week (5x7 contingency table): observed cell counts vs the "
        "margin-product expectation r*c/n, chi2 = sum (o-e)^2/e. "
        "Exactness discipline for the CROSS-CELL sum: each term is a "
        "deterministic IEEE value, but a 35-term sum is order-"
        "sensitive — so BOTH engines sort the term list ascending "
        "before a left-fold sum (array_sort + aggregate on the Spark "
        "side, list_sort + list_sum in DuckDB), making the fold order "
        "canonical. The contingency table is one map-side-combining "
        "aggregate; margins broadcast; 35 cells are metadata. At "
        "100 TB: one scan. Bitwise.",
)
def q_chi2_independence(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    dow = (
        F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))) % 7
    ).cast("long")
    cells = ev.groupBy("event_type", dow.alias("dow")).agg(
        F.count("*").cast("decimal(15,0)").alias("o")
    )
    rows_m = cells.groupBy("event_type").agg(F.sum("o").cast("decimal(15,0)").alias("r"))
    cols_m = cells.groupBy("dow").agg(F.sum("o").cast("decimal(15,0)").alias("c"))
    tot = cells.agg(F.sum("o").cast("decimal(15,0)").alias("n"))
    from .aggregates import attach_scalar

    terms = (
        cells.join(F.broadcast(rows_m), "event_type")
        .join(F.broadcast(cols_m), "dow")
    )
    terms = attach_scalar(terms, tot).select(
        F.col("o").cast("double").alias("o"),
        (
            F.col("r").cast("double") * F.col("c").cast("double")
            / F.col("n").cast("double")
        ).alias("e"),
        F.col("n").cast("long").alias("n_events"),
    )
    term = (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
    folded = terms.agg(
        F.count("*").alias("n_cells"),
        F.max("n_events").alias("n_events"),
        F.array_sort(F.collect_list(term)).alias("ts"),
    )
    return folded.select(
        "n_cells",
        "n_events",
        F.aggregate(F.col("ts"), F.lit(0.0), lambda a, x: a + x).alias("chi2"),
    )


def _ltv_oracle_sql() -> str:
    from .aggregates import dec0_to_double_sql

    return f"""
    WITH ev AS (
        SELECT user_id,
               CAST((CAST(ts AS DATE) - DATE '1970-01-01') AS BIGINT) // 7 AS week,
               CAST(value * 100 AS DECIMAL(14,0)) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    allact AS (
        SELECT user_id,
               MIN(CAST((CAST(ts AS DATE) - DATE '1970-01-01') AS BIGINT) // 7)
                   AS cohort_week
        FROM events GROUP BY user_id
    ),
    sizes AS (
        SELECT cohort_week, COUNT(*) AS cohort_size FROM allact GROUP BY 1
    ),
    rev AS (
        SELECT a.cohort_week, e.week - a.cohort_week AS week_offset,
               CAST(SUM(e.cents) AS DECIMAL(18,0)) AS cents
        FROM ev e JOIN allact a USING (user_id)
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT cohort_week, week_offset, cents,
               CAST(SUM(cents) OVER (PARTITION BY cohort_week ORDER BY week_offset
                                     ROWS UNBOUNDED PRECEDING) AS DECIMAL(18,0))
                   AS cum_cents
        FROM rev
    )
    SELECT c.cohort_week, c.week_offset,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           CAST(c.cents AS BIGINT) AS revenue_cents,
           CAST(c.cum_cents AS BIGINT) AS cum_revenue_cents,
           {dec0_to_double_sql('c.cum_cents')} / s.cohort_size
               AS ltv_per_user_cents
    FROM cum c JOIN sizes s USING (cohort_week)
    """


@register(
    "q_cohort_ltv",
    _ltv_oracle_sql(),
    doc="COHORT LIFETIME-VALUE curve — the revenue companion of "
        "q_retention_cohorts: per (cohort_week, week_offset), the "
        "purchase revenue that week, its running total, and the "
        "cumulative LTV per cohort member. The cumulative sum windows "
        "PER COHORT over the handful of week offsets (partitioned, "
        "bounded by the observation horizon — never a SinglePartition "
        "exchange); revenue folds to exact integer cents in the one "
        "data-sized aggregate; cohort sizes broadcast. At 100 TB: one "
        "events shuffle on user_id, one on (cohort, offset) — the "
        "standard LTV pipeline shape. Bitwise.",
)
def q_cohort_ltv(spark, sf_dir):
    from .aggregates import dec0_to_double

    ev = load_table(spark, sf_dir, "events")
    epoch_week = (
        F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).cast("long")
        / F.lit(7)
    ).cast("long")
    allact = ev.groupBy("user_id").agg(F.min(epoch_week).alias("cohort_week"))
    sizes = allact.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        epoch_week.alias("week"),
        (F.col("value") * 100).cast("decimal(14,0)").alias("cents"),
    )
    rev = (
        purch.join(allact, "user_id")
        .groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.sum("cents").cast("decimal(18,0)").alias("cents"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.withColumn("cum_cents", F.sum("cents").over(w).cast("decimal(18,0)"))
    return cum.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        F.col("cohort_size").cast("long").alias("cohort_size"),
        F.col("cents").cast("long").alias("revenue_cents"),
        F.col("cum_cents").cast("long").alias("cum_revenue_cents"),
        (dec0_to_double(F.col("cum_cents")) / F.col("cohort_size")).alias(
            "ltv_per_user_cents"
        ),
    )


@register(
    "q_simpson_audit",
    """
    WITH cells AS (
        SELECT c_mktsegment AS seg,
               n_name AS nation,
               CAST(COUNT(*) AS DECIMAL(15,0)) AS n,
               CAST(SUM(CAST(c_acctbal * 100 AS DECIMAL(14,0)))
                    AS DECIMAL(18,0)) AS s
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    ),
    per_stratum AS (
        SELECT nation,
               CAST(SUM(CASE WHEN seg = 'BUILDING' THEN s END) AS DOUBLE)
                   / CAST(SUM(CASE WHEN seg = 'BUILDING' THEN n END) AS DOUBLE)
                   AS m_a,
               CAST(SUM(CASE WHEN seg = 'MACHINERY' THEN s END) AS DOUBLE)
                   / CAST(SUM(CASE WHEN seg = 'MACHINERY' THEN n END) AS DOUBLE)
                   AS m_b
        FROM cells WHERE seg IN ('BUILDING', 'MACHINERY')
        GROUP BY nation
        HAVING SUM(CASE WHEN seg = 'BUILDING' THEN n END) IS NOT NULL
           AND SUM(CASE WHEN seg = 'MACHINERY' THEN n END) IS NOT NULL
    ),
    overall AS (
        SELECT CAST(SUM(CASE WHEN seg = 'BUILDING' THEN s END) AS DOUBLE)
                   / CAST(SUM(CASE WHEN seg = 'BUILDING' THEN n END) AS DOUBLE)
                   AS m_a,
               CAST(SUM(CASE WHEN seg = 'MACHINERY' THEN s END) AS DOUBLE)
                   / CAST(SUM(CASE WHEN seg = 'MACHINERY' THEN n END) AS DOUBLE)
                   AS m_b
        FROM cells WHERE seg IN ('BUILDING', 'MACHINERY')
    )
    SELECT p.nation,
           p.m_a - p.m_b AS stratum_gap_cents,
           o.m_a - o.m_b AS overall_gap_cents,
           (p.m_a - p.m_b) * (o.m_a - o.m_b) < 0 AS sign_reversed
    FROM per_stratum p, overall o
    """,
    doc="SIMPSON'S-PARADOX audit: the BUILDING-vs-MACHINERY account-"
        "balance gap computed overall AND within every nation stratum, "
        "flagging strata whose gap sign REVERSES the aggregate — the "
        "classic aggregation trap a metrics platform must surface "
        "before anyone ships a conclusion from the marginal number. "
        "One join + one (segment, nation) cell aggregate feeds both "
        "levels (the overall means re-fold from the SAME exact cell "
        "sums, so the two levels can never disagree on inputs); means "
        "are single IEEE divisions of exact integer cents. Bitwise.",
)
def q_simpson_audit(spark, sf_dir):
    from .aggregates import attach_scalar

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cells = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("decimal(15,0)").alias("n"),
            F.sum((F.col("c_acctbal") * 100).cast("decimal(14,0)"))
            .cast("decimal(18,0)")
            .alias("s"),
        )
    )

    def gap(df, keys):
        a_s = F.sum(F.when(F.col("seg") == "BUILDING", F.col("s")))
        a_n = F.sum(F.when(F.col("seg") == "BUILDING", F.col("n")))
        b_s = F.sum(F.when(F.col("seg") == "MACHINERY", F.col("s")))
        b_n = F.sum(F.when(F.col("seg") == "MACHINERY", F.col("n")))
        g = df.groupBy(*keys) if keys else df.groupBy()
        return g.agg(
            (a_s.cast("double") / a_n.cast("double")).alias("m_a"),
            (b_s.cast("double") / b_n.cast("double")).alias("m_b"),
        )

    per = gap(cells, ["nation"]).filter(
        F.col("m_a").isNotNull() & F.col("m_b").isNotNull()
    )
    overall = gap(cells, []).select(
        F.col("m_a").alias("o_a"), F.col("m_b").alias("o_b")
    )
    out = attach_scalar(per, overall)
    return out.select(
        "nation",
        (F.col("m_a") - F.col("m_b")).alias("stratum_gap_cents"),
        (F.col("o_a") - F.col("o_b")).alias("overall_gap_cents"),
        (
            (F.col("m_a") - F.col("m_b")) * (F.col("o_a") - F.col("o_b")) < 0
        ).alias("sign_reversed"),
    )


def _mann_kendall_oracle_sql() -> str:
    from .aggregates import dec0_to_double_sql

    return f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(14,0)))
                    AS DECIMAL(16,0)) AS x
        FROM orders GROUP BY 1
    ),
    s AS (
        SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
                             WHEN b.x < a.x THEN -1 ELSE 0 END)
                    AS DECIMAL(15,0)) AS s
        FROM daily a JOIN daily b ON a.d < b.d
    ),
    ties AS (
        SELECT CAST(COUNT(*) AS DECIMAL(8,0)) AS n,
               CAST(SUM(CAST(t AS DECIMAL(19,0)) * (t - 1) * (2 * t + 5))
                    AS DECIMAL(26,0)) AS tie_term
        FROM (SELECT COUNT(*) AS t FROM daily GROUP BY x)
    )
    SELECT CAST(ties.n AS BIGINT) AS n_days,
           CAST(s.s AS BIGINT) AS s_statistic,
           ({dec0_to_double_sql('(ties.n * (ties.n - 1) * (2 * ties.n + 5))')}
            - {dec0_to_double_sql('ties.tie_term')}) / 18.0 AS var_s,
           CASE WHEN s.s > 0 THEN ({dec0_to_double_sql('s.s')} - 1.0)
                WHEN s.s < 0 THEN ({dec0_to_double_sql('s.s')} + 1.0)
                ELSE 0.0 END
           / sqrt(({dec0_to_double_sql('(ties.n * (ties.n - 1) * (2 * ties.n + 5))')}
                   - {dec0_to_double_sql('ties.tie_term')}) / 18.0) AS z_score
    FROM s, ties
    """


@register(
    "q_mann_kendall",
    _mann_kendall_oracle_sql(),
    doc="MANN-KENDALL monotonic-trend test on the daily revenue "
        "series: S = sum over day pairs of sign(x_later - x_earlier), "
        "the nonparametric 'is there a trend at all' gate run before "
        "fitting anything, with the tie-corrected variance n(n-1)"
        "(2n+5)/18 - sum t(t-1)(2t+5)/18 and the continuity-corrected "
        "z. Scale contract: the pair stage is a self-join of the "
        "DAILY frame — bounded by the CALENDAR squared (days^2 pairs "
        "regardless of row count; the 100 TB stream still collapses "
        "to one row per day first), the same bounded-product argument "
        "as the documented BNLJ allowlist entries, stated here "
        "because the bound comes from the date domain rather than a "
        "broadcast constant. Counts and tie terms are exact integers; "
        "z is one fixed IEEE tree over dec0_to_double conversions. "
        "Bitwise.",
)
def q_mann_kendall(spark, sf_dir):
    from .aggregates import attach_scalar, dec0_to_double

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum((F.col("o_totalprice") * 100).cast("decimal(14,0)"))
        .cast("decimal(16,0)")
        .alias("x")
    )
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(b, F.col("a.d") < F.col("b.d"))
        .agg(
            F.sum(
                F.when(F.col("b.x") > F.col("a.x"), 1)
                .when(F.col("b.x") < F.col("a.x"), -1)
                .otherwise(0)
            )
            .cast("decimal(15,0)")
            .alias("s")
        )
    )
    ties = (
        daily.groupBy("x")
        .agg(F.count("*").alias("t"))
        .agg(
            F.count("*").cast("decimal(8,0)").alias("n"),
            F.sum(
                F.col("t").cast("decimal(19,0)")
                * (F.col("t") - 1)
                * (2 * F.col("t") + 5)
            )
            .cast("decimal(26,0)")
            .alias("tie_term"),
        )
    )
    m = attach_scalar(s, ties)
    full = dec0_to_double(
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
    )
    var_s = (full - dec0_to_double(F.col("tie_term"))) / F.lit(18.0)
    s_d = dec0_to_double(F.col("s"))
    z = (
        F.when(F.col("s") > 0, (s_d - F.lit(1.0)) / F.sqrt(var_s))
        .when(F.col("s") < 0, (s_d + F.lit(1.0)) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("s").cast("long").alias("s_statistic"),
        var_s.alias("var_s"),
        z.alias("z_score"),
    )


@register(
    "q_abc_classification",
    """
    WITH rev AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice * 100 AS DECIMAL(14,0)))
                    AS DECIMAL(18,0)) AS cents
        FROM lineitem GROUP BY l_partkey
    ),
    cum AS (
        SELECT l_partkey, cents,
               SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                                ROWS UNBOUNDED PRECEDING) AS cum_cents
        FROM rev
    ),
    tot AS (SELECT CAST(SUM(cents) AS DECIMAL(20,0)) AS t FROM rev),
    classed AS (
        SELECT CASE WHEN 5 * cum_cents <= 4 * t THEN 'A'
                    WHEN 20 * cum_cents <= 19 * t THEN 'B'
                    ELSE 'C' END AS abc_class,
               cents
        FROM cum, tot
    )
    SELECT abc_class,
           COUNT(*) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS class_cents,
           CAST(SUM(cents) AS DOUBLE) / CAST(MAX((SELECT t FROM tot)) AS DOUBLE)
               AS revenue_share
    FROM classed GROUP BY abc_class
    """,
    doc="ABC / PARETO CLASSIFICATION of parts by revenue: rank parts "
        "by revenue descending, class A = the head reaching 80% of "
        "cumulative revenue, B = to 95%, C = the tail — the inventory-"
        "prioritization classic ('20% of parts drive 80% of revenue'), "
        "and for corpora the head/torso/tail split of source "
        "importance. The running total uses operators/indexing."
        "distributed_prefix_sum over (cents DESC, partkey) — no "
        "SinglePartition window at any part count; class boundaries "
        "are EXACT-INTEGER comparisons (5*cum <= 4*total, 20*cum <= "
        "19*total — the q_nucleus_selection discipline, no 0.8 "
        "float). One revenue aggregate + one range exchange + a 3-row "
        "fold. Bitwise.",
)
def q_abc_classification(spark, sf_dir):
    from ..operators.indexing import distributed_prefix_sum
    from .aggregates import attach_scalar

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum((F.col("l_extendedprice") * 100).cast("decimal(14,0)"))
        .cast("decimal(18,0)")
        .alias("cents_dec")
    ).select("l_partkey", F.col("cents_dec").cast("long").alias("cents"))
    cum = distributed_prefix_sum(
        rev.withColumn("neg", -F.col("cents")), ["neg", "l_partkey"], ["cents"]
    )
    tot = rev.agg(F.sum("cents").cast("decimal(20,0)").alias("t"))
    classed = attach_scalar(cum, tot).select(
        F.when(
            F.lit(5) * F.col("cum_cents").cast("decimal(20,0)") <= F.lit(4) * F.col("t"),
            "A",
        )
        .when(
            F.lit(20) * F.col("cum_cents").cast("decimal(20,0)")
            <= F.lit(19) * F.col("t"),
            "B",
        )
        .otherwise("C")
        .alias("abc_class"),
        "cents",
        "t",
    )
    return classed.groupBy("abc_class").agg(
        F.count("*").alias("n_parts"),
        F.sum("cents").cast("long").alias("class_cents"),
        (F.sum("cents").cast("double") / F.max("t").cast("double")).alias(
            "revenue_share"
        ),
    )


def _ttc_oracle_sql() -> str:
    from .aggregates import dec0_to_double_sql

    return f"""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id,
               MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > v.t_view
                        THEN e.ts END) AS t_purch
        FROM events e JOIN v USING (user_id) GROUP BY e.user_id
    ),
    deltas AS (
        SELECT CAST(epoch_us(p.t_purch) - epoch_us(v.t_view)
                    AS DECIMAL(16,0)) AS d_us
        FROM v JOIN p USING (user_id) WHERE p.t_purch IS NOT NULL
    ),
    ranked AS (
        SELECT d_us, ROW_NUMBER() OVER (ORDER BY d_us) AS rn,
               COUNT(*) OVER () AS n
        FROM deltas
    ),
    m AS (
        SELECT CAST(MAX(n) AS DECIMAL(15,0)) AS n,
               CAST(SUM(d_us) AS DECIMAL(22,0)) AS s,
               MAX(CASE WHEN rn = (n + 1) // 2 THEN d_us END) AS med
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_converters,
           {dec0_to_double_sql('s')} / CAST(n AS DOUBLE) AS mean_us,
           CAST(med AS BIGINT) AS median_us
    FROM m
    """


@register(
    "q_time_to_convert",
    _ttc_oracle_sql(),
    doc="CONVERSION LATENCY: for every user whose first purchase "
        "strictly follows their first view (q_event_funnel's strict "
        "anchor semantics), the view->purchase delay in exact integer "
        "microseconds — mean from one exact-decimal sum, median as "
        "the ((n+1) div 2)-th order statistic via operators/indexing."
        "distributed_kth_smallest (sketch-bracketed exact selection, "
        "no global sort). The product question behind it — 'how long "
        "does the funnel take?' — is the companion every funnel "
        "count needs. Two conditional-min aggregates + one moment "
        "fold; scale-free. Bitwise.",
)
def q_time_to_convert(spark, sf_dir):
    from ..operators.indexing import distributed_kth_smallest
    from .aggregates import dec0_to_double

    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    p = (
        ev.join(F.broadcast(v), "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).alias("t_purch")
        )
    )
    deltas = (
        v.join(p, "user_id")
        .filter(F.col("t_purch").isNotNull())
        .select(
            F.expr("timestampdiff(MICROSECOND, t_view, t_purch)")
            .cast("decimal(16,0)")
            .alias("d_us")
        )
    )
    n = deltas.count()
    med = distributed_kth_smallest(
        deltas.select(F.col("d_us").cast("double").alias("d")), "d", (n + 1) // 2,
        scale=0, total=n,
    )
    m = deltas.agg(F.sum("d_us").cast("decimal(22,0)").alias("s"))
    return m.select(
        F.lit(n).cast("long").alias("n_converters"),
        (dec0_to_double(F.col("s")) / F.lit(float(n))).alias("mean_us"),
        F.lit(int(med)).cast("long").alias("median_us"),
    )


def _assort_oracle_sql() -> str:
    from .aggregates import dec0_to_double_sql

    def m(expr):
        return dec0_to_double_sql(expr)

    return f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pe AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    edges AS (
        SELECT src, dst FROM pe UNION ALL SELECT dst, src FROM pe
    ),
    deg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src),
    pairs AS (
        SELECT CAST(da.d AS DECIMAL(10,0)) AS x, CAST(db.d AS DECIMAL(10,0)) AS y
        FROM edges e
        JOIN deg da ON da.node = e.src
        JOIN deg db ON db.node = e.dst
    ),
    mo AS (
        SELECT CAST(COUNT(*) AS DECIMAL(12,0)) AS n,
               CAST(SUM(x) AS DECIMAL(18,0)) AS s_x,
               CAST(SUM(y) AS DECIMAL(18,0)) AS s_y,
               CAST(SUM(CAST(x AS DECIMAL(19,0)) * y) AS DECIMAL(24,0)) AS s_xy,
               CAST(SUM(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(24,0)) AS s_xx,
               CAST(SUM(CAST(y AS DECIMAL(19,0)) * y) AS DECIMAL(24,0)) AS s_yy
        FROM pairs
    )
    SELECT CAST(n AS BIGINT) AS n_directed_edges,
           {m('(n * s_xy - CAST(s_x AS DECIMAL(19,0)) * s_y)')} /
           (sqrt({m('(n * s_xx - CAST(s_x AS DECIMAL(19,0)) * s_x)')}) *
            sqrt({m('(n * s_yy - CAST(s_y AS DECIMAL(19,0)) * s_y)')}))
               AS assortativity
    FROM mo
    """


@register(
    "q_graph_assortativity",
    _assort_oracle_sql(),
    doc="DEGREE ASSORTATIVITY of the part co-purchase graph — Newman's "
        "r: the Pearson correlation of endpoint degrees over directed "
        "edges (positive = hubs attach to hubs, negative = hub-and-"
        "spoke; the one-number summary of a graph's mixing pattern, "
        "completing the graph tier beside pagerank / triangles / "
        "k-core / BFS / components). Degrees are exact integers; the "
        "correlation is q_corr_matrix's exact-moment closed form with "
        "dec0_to_double conversions. Shape: the same bounded same-"
        "order pair join as q_k_core builds edges, degrees are one "
        "grouped count, and the degree map joins back onto edges by "
        "key — two broadcast-or-shuffle equi-joins, one moment fold. "
        "Bitwise.",
)
def q_graph_assortativity(spark, sf_dir):
    from .aggregates import dec0_to_double

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    pe = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    edges = pe.unionAll(pe.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    pairs = (
        edges.join(deg.select(F.col("node").alias("src"), F.col("d").alias("dx")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dy")), "dst")
        .select(
            F.col("dx").cast("decimal(10,0)").alias("x"),
            F.col("dy").cast("decimal(10,0)").alias("y"),
        )
    )
    mo = pairs.agg(
        F.count("*").cast("decimal(12,0)").alias("n"),
        F.sum("x").cast("decimal(18,0)").alias("s_x"),
        F.sum("y").cast("decimal(18,0)").alias("s_y"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y")).cast("decimal(24,0)").alias("s_xy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x")).cast("decimal(24,0)").alias("s_xx"),
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y")).cast("decimal(24,0)").alias("s_yy"),
    )
    n = F.col("n")
    num = dec0_to_double(n * F.col("s_xy") - F.col("s_x").cast("decimal(19,0)") * F.col("s_y"))
    dx = dec0_to_double(n * F.col("s_xx") - F.col("s_x").cast("decimal(19,0)") * F.col("s_x"))
    dy = dec0_to_double(n * F.col("s_yy") - F.col("s_y").cast("decimal(19,0)") * F.col("s_y"))
    return mo.select(
        n.cast("long").alias("n_directed_edges"),
        (num / (F.sqrt(dx) * F.sqrt(dy))).alias("assortativity"),
    )


@register(
    "q_degree_histogram",
    """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pe AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT src AS node FROM pe UNION ALL SELECT dst AS node FROM pe
        ) GROUP BY node
    )
    SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS log2_bucket,
           CAST(1 << (length(bin(d)) - 1) AS BIGINT) AS bucket_floor,
           COUNT(*) AS n_nodes,
           CAST(MIN(d) AS BIGINT) AS min_degree,
           CAST(MAX(d) AS BIGINT) AS max_degree
    FROM deg GROUP BY 1, 2
    """,
    doc="DEGREE DISTRIBUTION of the co-purchase graph in power-of-two "
        "buckets — the log-log histogram one eyeballs for heavy tails "
        "before trusting any mean-degree number (and the shape that "
        "decides whether a join needs salting): bucket = "
        "floor(log2(degree)) computed with ZERO FP via the "
        "len(bin(d))-1 identity (the q_unigram_surprisal trick — "
        "engine-exact integer log2, no libm boundary risk at bucket "
        "edges). One bounded same-order pair join, one degree count, "
        "one histogram fold. Bitwise.",
)
def q_degree_histogram(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    pe = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    deg = (
        pe.select(F.col("src").alias("node"))
        .unionAll(pe.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    bucket = (F.length(F.bin(F.col("d"))) - 1).cast("long")
    floor_expr = F.expr(
        "shiftleft(CAST(1 AS BIGINT), CAST(length(bin(d)) - 1 AS INT))"
    )
    return deg.groupBy(
        bucket.alias("log2_bucket"),
        floor_expr.alias("bucket_floor"),
    ).agg(
        F.count("*").alias("n_nodes"),
        F.min("d").cast("long").alias("min_degree"),
        F.max("d").cast("long").alias("max_degree"),
    )


def _holt_weights(terms: int = 12):
    """Stationary truncated impulse response of the alpha=beta=1/2 Holt
    linear smoother: l_t = ½y+½l'+½b', b_t = ¼y−¼l'+¾b' — input
    vector (½,¼) propagated by M = [[½,½],[−¼,¾]]. With dyadic
    parameters every weight is an exact dyadic rational (denominator
    ≤ 2^(2·terms)) and exactly representable as a double, so the
    unrolled weighted sums are the q_ewma_smoother 'no-decimal
    bitwise' class: same literals + same left-fold tree on both
    engines ⇒ bit-identical output with plain double arithmetic."""
    from fractions import Fraction as Fr

    cur = (Fr(1, 2), Fr(1, 4))
    m = ((Fr(1, 2), Fr(1, 2)), (Fr(-1, 4), Fr(3, 4)))
    out = []
    for _ in range(terms):
        out.append((float(cur[0]), float(cur[1])))
        cur = (
            m[0][0] * cur[0] + m[0][1] * cur[1],
            m[1][0] * cur[0] + m[1][1] * cur[1],
        )
    return out


_HOLT_TERMS = 12
_HOLT_W = _holt_weights(_HOLT_TERMS)


def _holt_oracle_sql() -> str:
    lags = ", ".join(
        f"LAG(y, {i}) OVER w AS x{i}" for i in range(_HOLT_TERMS)
    )
    lvl = " + ".join(
        f"x{i} * {dlit(_HOLT_W[i][0])}" for i in range(_HOLT_TERMS)
    )
    trd = " + ".join(
        f"x{i} * {dlit(_HOLT_W[i][1])}" for i in range(_HOLT_TERMS)
    )
    return f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(14,0)))
                         AS DECIMAL(16,0)) AS DOUBLE) AS y
        FROM orders GROUP BY 1
    ),
    lagged AS (
        SELECT d, y, {lags}
        FROM daily
        WINDOW w AS (ORDER BY d)
    )
    SELECT d, y AS revenue_cents,
           ({lvl}) AS level_cents,
           ({trd}) AS trend_cents,
           ({lvl}) + ({trd}) AS forecast_next_cents
    FROM lagged WHERE x{_HOLT_TERMS - 1} IS NOT NULL
    """


@register(
    "q_holt_linear",
    _holt_oracle_sql(),
    doc="HOLT LINEAR-TREND SMOOTHER (double exponential, α=β=1/2) on "
        "daily revenue — the level+trend state and one-step forecast "
        "every ops dashboard runs, as the COUPLED-recursion extension "
        "of the q_ewma dyadic family: the stationary impulse response "
        "of l_t=½y+½l'+½b', b_t=¼y−¼l'+¾b' is an exact dyadic weight "
        "vector (M=[[½,½],[−¼,¾]] applied to (½,¼)), truncated at 12 "
        "lags (complex eigenvalue modulus √½ ⇒ 98.3% level mass kept) "
        "and unrolled as one fixed left-fold per column — identical "
        "literals + identical operation tree = bitwise with plain "
        "double arithmetic, no decimal machinery. Shape: map-side "
        "daily collapse, then the lag window on the BOUNDED daily "
        "frame (one row per calendar day — the q_cusum allowlist "
        "class). Values in exact integer cents rendered as doubles.",
)
def q_holt_linear(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum((F.col("o_totalprice") * 100).cast("decimal(14,0)"))
        .cast("decimal(16,0)")
        .cast("double")
        .alias("y")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "d",
        "y",
        *[F.lag("y", i).over(w).alias(f"x{i}") for i in range(_HOLT_TERMS)],
    )
    lvl = F.col("x0") * F.lit(_HOLT_W[0][0])
    trd = F.col("x0") * F.lit(_HOLT_W[0][1])
    for i in range(1, _HOLT_TERMS):
        lvl = lvl + F.col(f"x{i}") * F.lit(_HOLT_W[i][0])
        trd = trd + F.col(f"x{i}") * F.lit(_HOLT_W[i][1])
    return lagged.filter(F.col(f"x{_HOLT_TERMS - 1}").isNotNull()).select(
        "d",
        F.col("y").alias("revenue_cents"),
        lvl.alias("level_cents"),
        trd.alias("trend_cents"),
        (lvl + trd).alias("forecast_next_cents"),
    )


# ---- q_conformal_bound (round 10) -------------------------------------------
# Split-conformal prediction interval (Vovk et al.; the
# distribution-free coverage guarantee every model-eval pipeline wants
# beside q_calibration_bins' ECE): calibrate a per-priority mean model
# on the even-key half of orders, take the ceil(0.9*(n+1))-th smallest
# absolute residual as the conformal radius q_hat, and audit empirical
# coverage on the odd-key half.  Exactness: prices become exact cents
# (round(x*100) longs), the model is an integer FLOOR-DIV mean, so
# every residual is an exact long and q_hat is an exact order
# statistic — computed distributed via
# operators/indexing.distributed_kth_smallest (sketch-bracketed
# selection, 2 scans, no global sort).  The only doubles are the two
# final divisions, identical IEEE in both engines.


@register(
    "q_conformal_bound",
    """
    WITH o AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders
    ),
    cal AS (SELECT * FROM o WHERE o_orderkey % 2 = 0),
    tst AS (SELECT * FROM o WHERE o_orderkey % 2 = 1),
    model AS (
        SELECT o_orderpriority,
               CAST(SUM(cents) // COUNT(*) AS BIGINT) AS pred
        FROM cal GROUP BY o_orderpriority
    ),
    cs AS (
        SELECT abs(c.cents - m.pred) AS s
        FROM cal c JOIN model m USING (o_orderpriority)
    ),
    kk AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
               CAST(least((9 * (COUNT(*) + 1) + 9) // 10, COUNT(*))
                    AS BIGINT) AS conformal_k
        FROM cs
    ),
    qv AS (
        SELECT CAST(s AS BIGINT) AS q_hat_cents
        FROM (SELECT s, row_number() OVER (ORDER BY s) AS rn FROM cs), kk
        WHERE rn = conformal_k
    ),
    cov AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN abs(t.cents - m.pred) <= q_hat_cents
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_test_covered
        FROM tst t JOIN model m USING (o_orderpriority), qv
    )
    SELECT n_cal, conformal_k, q_hat_cents,
           CAST(q_hat_cents AS DOUBLE) / 100.0 AS q_hat,
           n_test, n_test_covered,
           CAST(n_test_covered AS DOUBLE) / CAST(n_test AS DOUBLE)
               AS coverage
    FROM kk, qv, cov
    """,
    doc="SPLIT-CONFORMAL PREDICTION BOUND (90% target): per-priority "
        "integer-mean model fit on the even-key calibration half; "
        "q_hat = the ceil(0.9*(n_cal+1))-th smallest absolute residual "
        "(the finite-sample distribution-free radius), audited as "
        "empirical coverage on the held-out odd-key half.  Exact "
        "cents + floor-div model keep every residual an exact long; "
        "q_hat is an exact distributed order statistic "
        "(distributed_kth_smallest: sketch-bracketed selection, no "
        "global sort, driver sees <= bracket_cap scalars); two IEEE "
        "divisions at the end.  At 100 TB: two grouped aggregates + "
        "the 2-scan selection — nothing corpus-squared, nothing "
        "collected.",
)
def q_conformal_bound(spark, sf_dir):
    from ..operators.indexing import distributed_kth_smallest

    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    cal = o.filter(F.col("o_orderkey") % 2 == 0)
    tst = o.filter(F.col("o_orderkey") % 2 == 1)
    model = cal.groupBy("o_orderpriority").agg(
        F.expr("sum(cents) div count(*)").cast("long").alias("pred")
    )
    cs = (
        cal.join(F.broadcast(model), "o_orderpriority")
        .select(F.abs(F.col("cents") - F.col("pred")).alias("s"))
        .localCheckpoint(eager=True)
    )
    n_cal = cs.count()
    k = min((9 * (n_cal + 1) + 9) // 10, n_cal)
    q_hat_cents = int(
        distributed_kth_smallest(cs, "s", k, scale=0, total=n_cal)
    )
    cov = (
        tst.join(F.broadcast(model), "o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("pred")) <= q_hat_cents, 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_test_covered"),
        )
    )
    return cov.select(
        F.lit(n_cal).cast("long").alias("n_cal"),
        F.lit(k).cast("long").alias("conformal_k"),
        F.lit(q_hat_cents).cast("long").alias("q_hat_cents"),
        (F.lit(q_hat_cents).cast("double") / F.lit(100.0)).alias("q_hat"),
        "n_test",
        "n_test_covered",
        (
            F.col("n_test_covered").cast("double")
            / F.col("n_test").cast("double")
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# q_conformal_groups (round 11): q_conformal_bound extended from one
# global guarantee to PER-GROUP (Mondrian / group-conditional
# conformal) guarantees — each o_orderpriority gets its own q_hat from
# its own calibration residuals, so coverage holds within every
# segment, not just marginally.
# ---------------------------------------------------------------------------


@register(
    "q_conformal_groups",
    """
    WITH o AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders
    ),
    cal AS (SELECT * FROM o WHERE o_orderkey % 2 = 0),
    tst AS (SELECT * FROM o WHERE o_orderkey % 2 = 1),
    model AS (
        SELECT o_orderpriority,
               CAST(SUM(cents) // COUNT(*) AS BIGINT) AS pred
        FROM cal GROUP BY o_orderpriority
    ),
    cs AS (
        SELECT c.o_orderpriority, abs(c.cents - m.pred) AS s
        FROM cal c JOIN model m USING (o_orderpriority)
    ),
    kk AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_cal,
               CAST(least((9 * (COUNT(*) + 1) + 9) // 10, COUNT(*))
                    AS BIGINT) AS conformal_k
        FROM cs GROUP BY o_orderpriority
    ),
    qv AS (
        SELECT r.o_orderpriority, CAST(r.s AS BIGINT) AS q_hat_cents
        FROM (SELECT o_orderpriority, s,
                     row_number() OVER (PARTITION BY o_orderpriority
                                        ORDER BY s) AS rn
              FROM cs) r
        JOIN kk USING (o_orderpriority)
        WHERE r.rn = kk.conformal_k
    ),
    cov AS (
        SELECT t.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN abs(t.cents - m.pred) <= q.q_hat_cents
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_test_covered
        FROM tst t
        JOIN model m USING (o_orderpriority)
        JOIN qv q USING (o_orderpriority)
        GROUP BY t.o_orderpriority
    )
    SELECT k.o_orderpriority, k.n_cal, k.conformal_k, q.q_hat_cents,
           CAST(q.q_hat_cents AS DOUBLE) / 100.0 AS q_hat,
           c.n_test, c.n_test_covered,
           CAST(c.n_test_covered AS DOUBLE) / CAST(c.n_test AS DOUBLE)
               AS coverage
    FROM kk k JOIN qv q USING (o_orderpriority)
    JOIN cov c USING (o_orderpriority)
    ORDER BY k.o_orderpriority
    """,
    doc="PER-GROUP SPLIT-CONFORMAL BOUNDS (round 11, VERDICT r10 item "
        "8 — Mondrian conformal, Vovk 2012): q_conformal_bound's 90% "
        "guarantee made group-conditional — each o_orderpriority "
        "calibrates its own q_hat = the ceil(0.9*(n_g+1))-th smallest "
        "absolute residual of ITS calibration rows, audited as "
        "empirical coverage on its held-out half.  The grouped "
        "kth-smallest runs as ONE distributed pass for ALL groups: "
        "global_row_number over (group, residual) — one range "
        "exchange, no per-group sort, no single-partition window — "
        "minus each group's offset (|groups| scalars of bounded "
        "metadata, collected like the prefix-sum offsets), then one "
        "equality filter picks every group's k-th value "
        "simultaneously.  Residuals are exact cents (round(x*100) "
        "longs) under an integer floor-div model, so each q_hat is an "
        "exact order statistic; the only doubles are the two final "
        "divisions.  At 100 TB: two grouped aggregates + one range "
        "exchange, nothing corpus-squared, nothing data-sized on the "
        "driver.",
)
def q_conformal_groups(spark, sf_dir):
    from ..operators.indexing import global_row_number
    from ..operators.local_frames import literal_frame

    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    cal = o.filter(F.col("o_orderkey") % 2 == 0)
    tst = o.filter(F.col("o_orderkey") % 2 == 1)
    model = cal.groupBy("o_orderpriority").agg(
        F.expr("sum(cents) div count(*)").cast("long").alias("pred")
    )
    cs = (
        cal.join(F.broadcast(model), "o_orderpriority")
        .select(
            "o_orderpriority",
            F.abs(F.col("cents") - F.col("pred")).alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    # |groups| scalars (priority domain — bounded metadata): per-group
    # sizes give both the conformal k and the group's rank offset in
    # the (group, s)-sorted global numbering.  Python's str sort ==
    # Spark's UTF8String binary sort (both code-point monotone), so
    # offsets accumulate in the exact range-partition order.
    sizes = {
        r.o_orderpriority: int(r.c)
        for r in cs.groupBy("o_orderpriority")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    conf_rows, base = [], 0
    for pr in sorted(sizes):
        n_g = sizes[pr]
        k_g = min((9 * (n_g + 1) + 9) // 10, n_g)
        conf_rows.append((pr, n_g, k_g, base + k_g))
        base += n_g
    conf = literal_frame(
        spark,
        conf_rows,
        "o_orderpriority string, n_cal long, conformal_k long, "
        "target_rn long",
    )
    # grouped kth-smallest in ONE pass: global rank over (group, s),
    # then each group's k-th value is the row whose global rank equals
    # the group's offset + k.  Ties in s are value-safe: whatever tie
    # permutation the range layout realizes, the s value at any sorted
    # position is the same.
    ranked = global_row_number(cs, ["o_orderpriority", "s"], "grn")
    qv = (
        ranked.join(F.broadcast(conf), "o_orderpriority")
        .filter(F.col("grn") == F.col("target_rn"))
        .select(
            "o_orderpriority",
            "n_cal",
            "conformal_k",
            F.col("s").cast("long").alias("q_hat_cents"),
        )
    )
    cov = (
        tst.join(F.broadcast(model), "o_orderpriority")
        .join(F.broadcast(qv), "o_orderpriority")
        .groupBy("o_orderpriority", "n_cal", "conformal_k", "q_hat_cents")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("pred"))
                    <= F.col("q_hat_cents"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_test_covered"),
        )
    )
    return cov.select(
        "o_orderpriority",
        "n_cal",
        "conformal_k",
        "q_hat_cents",
        (F.col("q_hat_cents").cast("double") / F.lit(100.0)).alias("q_hat"),
        "n_test",
        "n_test_covered",
        (
            F.col("n_test_covered").cast("double")
            / F.col("n_test").cast("double")
        ).alias("coverage"),
    ).orderBy("o_orderpriority")

"""Aggregations (SURVEY.md §2.5: A1-A9 + planned rollup/approx-distinct).

Scale notes: every groupBy here is a hash aggregate with map-side partial
aggregation (one shuffle on the group keys). Decimal-cast sums keep
results bit-stable under any partitioning (see queries/__init__ docstring)
— at 1000 executors the merge order of partials is arbitrary, and these
plans are invariant to it.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Column

from ..sources.readers import load_table, load_table_widened
from . import register


def dsum(col: str | Column, scale: int = 2, precision: int | None = None) -> Column:
    """Order-insensitive exact sum of a double column, on the fast path.

    Semantics are identical to ``SUM(CAST(x AS DECIMAL(p,s)))`` (the
    DuckDB oracle formulation): the per-row double→decimal cast is the
    rounding step (tie-free — a binary double's exact decimal expansion
    never lands on a half), and everything after is exact integer math.

    Implementation detail that buys ~40%: Spark decimals with precision
    ≤ 18 are long-backed; wider ones go through java BigDecimal — and
    ``SUM(decimal(p,s))`` accumulates in ``decimal(p+10,s)``, so even
    narrow inputs would sum on the slow path. Instead the rounded value
    is shifted into integer "cents" with every intermediate still ≤ 18
    digits (decimal(16-s,s) × 10^s → decimal(16,s)), cast to LONG, and
    summed as a plain long — whole-stage-codegen integer adds. The
    final /10^s division is one exact decimal op per GROUP.

    Bounds: per-row |x| < 10^(16-2s) (1e12 at scale 2; beyond it the
    cast overflows — loudly under ANSI mode, the Spark 4 default — so
    a violation can never silently corrupt a sum); group sums up to
    9.2e18/10^s — 9.2e14 at scale 4 — which covers 100 TB-scale grouped
    money sums. Passing an explicit ``precision`` opts back into the
    plain decimal-sum formulation with those exact bounds.
    """
    c = F.col(col) if isinstance(col, str) else col
    if precision is not None:
        # caller asked for specific decimal bounds — honor them verbatim
        return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")
    # fast path: p+s+2 ≤ 18 keeps cast, ×10^s, and product all ≤ 18
    # digits (measured ~40% on the TPC-H Q1 aggregate at sf0.1)
    p = 16 - scale
    factor = 10**scale
    cents = (c.cast(f"decimal({p},{scale})") * F.lit(factor)).cast("long")
    return (F.sum(cents).cast("decimal(28,0)") / F.lit(factor)).cast("double")


def dsum_sql(expr: str, scale: int = 2, precision: int = 22) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


_2_53 = 9007199254740992  # 2^53


def dec0_to_double(col: Column) -> Column:
    """CORRECTLY-ROUNDED scale-0 decimal → double, identical on both
    engines at ANY magnitude.

    Discovered while oracling q_autocorrelation: DuckDB's int128→double
    cast is NOT correctly rounded once the value needs more than ~64
    bits (127893260360105320068 converts to the neighbor ULP of the
    nearest double), while Spark's BigDecimal path rounds correctly —
    so ``CAST(x AS DOUBLE)`` on a wide scale-0 decimal can silently
    diverge cross-engine even though the decimal itself is exact.
    Recipe: split |x| at 2^53 — hi = |x| DIV 2^53 and lo = |x| MOD 2^53
    are both exactly representable doubles, hi·2^53 is an exact
    power-of-two scaling, and the single IEEE add hi·2^53 + lo is
    correctly rounded by definition — so the result is THE nearest
    double of x in any IEEE engine. Bound: hi must fit exactly in a
    double, i.e. |x| < 2^106 ≈ 8.1e31 — far beyond any moment sum this
    engine's width discipline allows (callers cap sums at DECIMAL(22)).
    Use this (with ``dec0_to_double_sql`` on the oracle side) whenever
    a scale-0 decimal that can exceed 2^53 is cast to double."""
    a = F.abs(col)
    lo = a % F.lit(_2_53)  # exact decimal remainder, < 2^53
    # a - lo is k·2^53 with k < 2^53: exactly representable as a double
    # (k fits the mantissa, 2^53 only shifts the exponent), so the cast
    # is exact on Spark's BigDecimal path — no division anywhere
    mag = (a - lo).cast("double") + lo.cast("double")
    return F.when(col < 0, -mag).otherwise(mag)


def dec0_to_double_sql(expr: str) -> str:
    """DuckDB side of ``dec0_to_double`` (see its docstring)."""
    a = f"CAST(abs({expr}) AS HUGEINT)"
    return (
        f"(CASE WHEN {expr} < 0 THEN -1.0 ELSE 1.0 END * "
        f"(CAST({a} // {_2_53} AS DOUBLE) * {float(_2_53)!r} + "
        f"CAST({a} % {_2_53} AS DOUBLE)))"
    )


def attach_scalar(df, scalar_df):
    """Attach a ONE-ROW aggregate frame (global stats, an average, a
    normalization constant) to every row of ``df``.

    This plans a BroadcastNestedLoopJoin whose build side is the 1-row
    aggregate — O(N·1), the distributed equivalent of reading a scalar
    subquery, NOT a data×data product (a constant-key equi-join does
    not help: Catalyst folds ``lit(1)=lit(1)`` to ``true`` and plans
    the same BNLJ). Callers MUST pass a frame that is 1 row by
    construction (a global ``agg`` with no grouping); each registry
    query using this helper is listed in the registry-wide
    no-cartesian gate's bounded allowlist (tests/test_plans.py) citing
    this contract."""
    return df.crossJoin(F.broadcast(scalar_df))


@register(
    "q_agg_daily",
    f"""
    SELECT CAST(o_orderdate AS DATE) AS order_date,
           COUNT(*) AS daily_order_count,
           {dsum_sql('o_totalprice')} AS daily_total_revenue,
           {dsum_sql('o_totalprice')} / COUNT(*) AS avg_order_value
    FROM orders
    GROUP BY CAST(o_orderdate AS DATE)
    """,
    doc="Daily KPIs — the reference's flagship gold aggregate "
        "(A1; etl/gold_job.py:40-97) transposed to the orders table.",
)
def q_agg_daily(spark, sf_dir):
    # NOT widened: measured A/B at sf0.1 — the per-row work here (one
    # to_date + two decimal casts over 150k rows) is too light to pay
    # for the input-skew repartition (0.32 s plain vs 0.67 s widened);
    # q_agg_2key below, with 6 decimal sums over 600k rows, is the
    # shape that crosses the threshold.
    df = load_table(spark, sf_dir, "orders")
    return (
        df.groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(
            F.count("*").alias("daily_order_count"),
            dsum("o_totalprice").alias("daily_total_revenue"),
            (dsum("o_totalprice") / F.count("*")).alias("avg_order_value"),
        )
    )


@register(
    "q_agg_2key",
    f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           {dsum_sql('l_quantity')} / COUNT(*) AS avg_qty,
           {dsum_sql('l_extendedprice')} / COUNT(*) AS avg_price,
           {dsum_sql('l_discount', 4)} / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Two-key hash aggregate, TPC-H Q1 shape (A2; reference "
        "etl/gold_job.py:100-152). disc_price is a per-row IEEE double "
        "product (identical in both engines) cast to decimal before summing.",
)
def q_agg_2key(spark, sf_dir):
    # widened: 6 decimal-cast sums per row are the dominant cost and
    # ran single-threaded on the 1-row-group layout (measured 0.68 s of
    # a 1.0 s run in one task); exact sums are partitioning-invariant.
    df = load_table_widened(spark, sf_dir, "lineitem", "l_orderkey")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        df.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            (dsum("l_quantity") / F.count("*")).alias("avg_qty"),
            (dsum("l_extendedprice") / F.count("*")).alias("avg_price"),
            (dsum("l_discount", 4) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_agg_max",
    """
    SELECT MAX(ts) AS max_ts, MIN(ts) AS min_ts,
           MAX(value) AS max_value, COUNT(DISTINCT user_id) AS n_users
    FROM events
    """,
    doc="Global max/min — watermark computation (A3; reference utils/incremental.py:40).",
)
def q_agg_max(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    return df.agg(
        F.max("ts").alias("max_ts"),
        F.min("ts").alias("min_ts"),
        F.max("value").alias("max_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_agg_sum",
    f"""
    SELECT {dsum_sql('l_quantity')} AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    """,
    doc="Global sum (A4; reference tests/integration/test_pipeline.py:126).",
)
def q_agg_sum(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem")
    return df.agg(dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n_rows"))


@register(
    "q_null_profile",
    """
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_user_id,
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_value,
           CAST(SUM(CASE WHEN NULLIF(event_type, 'error') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_event_type_derived
    FROM events
    """,
    doc="Single-pass null profile (A8) — replaces the reference's "
        "per-column job loop (utils/data_quality.py:279-296) with one "
        "aggregate; at 100 TB this is 1 scan instead of N.",
)
def q_null_profile(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    return df.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("nulls_user_id"),
        F.sum(F.col("value").isNull().cast("long")).alias("nulls_value"),
        F.sum(F.nullif(F.col("event_type"), F.lit("error")).isNull().cast("long")).alias(
            "nulls_event_type_derived"
        ),
    )


@register(
    "q_rollup",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="Hierarchical rollup (planned §2.5 extension).",
)
def q_rollup(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem")
    return df.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"), dsum("l_quantity").alias("sum_qty")
    )


@register(
    "q_approx_quantiles",
    None,  # sketch-based → rows-only; pytest bounds the error vs exact
    doc="approx_percentile sketch over order totals (planned §2.5 "
        "extension) — the scale path for quantiles (exact percentile "
        "needs a full sort).",
)
def q_approx_quantiles(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders")
    return df.agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50"),
        F.percentile_approx("o_totalprice", 0.95, 10000).alias("p95"),
        F.percentile_approx("o_totalprice", 0.99, 10000).alias("p99"),
    )


@register(
    "q_approx_distinct",
    None,  # approximate result — rows-only check by design
    doc="approx_count_distinct / HLL sketch (planned §2.5 extension). "
        "Approximate ⇒ no value oracle; the pytest suite asserts the "
        "estimate is within 5% of exact.",
)
def q_approx_distinct(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders")
    return df.agg(
        F.approx_count_distinct("o_custkey").alias("approx_custkeys"),
        F.approx_count_distinct("o_orderkey").alias("approx_orderkeys"),
    )


@register(
    "q_approx_quantiles_bound",
    """
    SELECT * FROM (VALUES ('p50', TRUE), ('p95', TRUE), ('p99', TRUE))
        AS t(q_name, within_bound)
    """,
    doc="Driver-safe certificate for the approx_percentile sketch "
        "(round-3 verdict item 8): the sketch value itself depends on "
        "partition merge order, but its GUARANTEE — returned element's "
        "exact rank within accuracy⁻¹·n of the target rank — holds "
        "under any partitioning, so the boolean check rows are "
        "deterministic and the oracle is the guarantee itself. Spark "
        "side recomputes exact ranks of the sketch outputs in one "
        "pass; the one-row sketch aggregate is the only driver "
        "metadata.",
)
def q_approx_quantiles_bound(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    acc = 10000
    a = o.agg(
        F.percentile_approx("o_totalprice", 0.5, acc).alias("a50"),
        F.percentile_approx("o_totalprice", 0.95, acc).alias("a95"),
        F.percentile_approx("o_totalprice", 0.99, acc).alias("a99"),
    ).first()  # one sketch row — bounded driver metadata
    targets = {"p50": (0.5, a.a50), "p95": (0.95, a.a95), "p99": (0.99, a.a99)}
    c = F.col("o_totalprice")
    counts = o.agg(
        F.count("*").alias("n"),
        *[
            x
            for q, (_p, v) in targets.items()
            for x in (
                F.sum((c < F.lit(v)).cast("long")).alias(f"lt_{q}"),
                F.sum((c <= F.lit(v)).cast("long")).alias(f"le_{q}"),
            )
        ],
    )
    structs = []
    for q, (p, _v) in targets.items():
        # rank tolerance: the documented accuracy⁻¹·n envelope, +2 for
        # tie conventions at interval ends (measured slack at sf0.1:
        # worst rank error 13 vs envelope 15)
        tol = F.col("n") * F.lit(1.0 / acc) + F.lit(2.0)
        target = F.col("n") * F.lit(p)
        ok = ((F.col(f"lt_{q}") + 1) <= target + tol) & (
            F.col(f"le_{q}") >= target - tol
        )
        structs.append(
            F.struct(F.lit(q).alias("q_name"), ok.alias("within_bound"))
        )
    return counts.select(F.explode(F.array(*structs)).alias("kv")).select("kv.*")


@register(
    "q_approx_distinct_bound",
    """
    SELECT * FROM (VALUES ('o_custkey', TRUE), ('o_orderkey', TRUE))
        AS t(column_name, within_5pct)
    """,
    doc="Driver-safe certificate for approx_count_distinct (HLL++): "
        "register-max merging is commutative, so for a fixed dataset "
        "the estimate is partition-invariant and the ≤5% check row is "
        "deterministic (measured ≤0.96% at rsd 0.015 on both test "
        "SFs). One fused aggregate computes sketch and exact side by "
        "side.",
)
def q_approx_distinct_bound(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    agg = o.agg(
        F.approx_count_distinct("o_custkey", 0.015).alias("ac"),
        F.countDistinct("o_custkey").alias("xc"),
        F.approx_count_distinct("o_orderkey", 0.015).alias("ao"),
        F.countDistinct("o_orderkey").alias("xo"),
    )

    def ok(a_, x_):
        return F.abs(F.col(a_).cast("double") / F.col(x_) - 1.0) <= 0.05

    return agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("o_custkey").alias("column_name"),
                    ok("ac", "xc").alias("within_5pct"),
                ),
                F.struct(
                    F.lit("o_orderkey").alias("column_name"),
                    ok("ao", "xo").alias("within_5pct"),
                ),
            )
        ).alias("kv")
    ).select("kv.*")


@register(
    "q_heavy_hitters",
    """
    SELECT c_mktsegment, COUNT(*) AS n_rows, TRUE AS in_freq_items
    FROM customer GROUP BY 1
    HAVING COUNT(*) > 0.05 * (SELECT COUNT(*) FROM customer)
    """,
    doc="Driver-safe certificate for freqItems (Karp-Schenker-"
        "Papadimitriou one-pass heavy hitters): the sketch may "
        "over-report but NEVER misses an item with frequency > "
        "support — so every EXACT heavy hitter (market segments at 5% "
        "support; all five qualify at both test SFs) must appear in "
        "the sketch output. Exact counts are SQL-oracled; the "
        "membership boolean encodes the guarantee. The sketch set is "
        "bounded by 1/support — driver metadata.",
)
def q_heavy_hitters(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    fi = set(
        cust.freqItems(["c_mktsegment"], support=0.05).first()[
            "c_mktsegment_freqItems"
        ]
    )  # ≤ 1/support = 20 items
    total = cust.count()  # scalar
    return (
        cust.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > 0.05 * total)
        .select(
            "c_mktsegment",
            "n_rows",
            F.col("c_mktsegment").isin(fi).alias("in_freq_items"),
        )
    )


@register(
    "q_percentile_exact",
    """
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS median_price,
           quantile_cont(l_extendedprice, 0.95) AS p95_price,
           quantile_cont(l_discount, 0.25) AS p25_discount
    FROM lineitem GROUP BY 1
    """,
    doc="EXACT percentiles per group (complements the rows-only "
        "approx_percentile sketch): Spark's percentile() and DuckDB's "
        "quantile_cont share the linear-interpolation definition, so "
        "the values must match bit-for-bit. The exact form sorts each "
        "group's values in aggregation buffers — fine for bounded "
        "group sizes; at 100 TB-scale cardinalities switch to "
        "q_approx_quantiles (bounded-error sketch, mergeable "
        "map-side).",
)
def q_percentile_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("median_price"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("p95_price"),
        F.percentile("l_discount", F.lit(0.25)).alias("p25_discount"),
    )


@register(
    "q_freq_items",
    None,  # one-pass sketch may emit false positives → rows-only
    doc="Approximate heavy hitters (Karp-Shenk-Papadimitriou one-pass "
        "counting via df.freqItems): all customers covering ≥ 2% of "
        "orders, single scan, fixed memory. May over-report (false "
        "positives) but never misses a true heavy hitter — pytest "
        "asserts the superset guarantee against the exact groupBy.",
)
def q_freq_items(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.freqItems(["o_custkey"], support=0.02)
        .select(F.explode("o_custkey_freqItems").alias("o_custkey"))
        .orderBy("o_custkey")
    )


@register(
    "q_histogram",
    """
    SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders
    GROUP BY 1
    """,
    doc="Fixed-width histogram profiling (25k-wide price buckets with "
        "per-bucket extrema): one map-side-combining aggregate — the "
        "distribution snapshot a data profile emits. The bucket "
        "expression is identical floor arithmetic on both engines "
        "(width_bucket would differ in edge rounding between "
        "implementations, so the portable formulation is the exact "
        "one).",
)
def q_histogram(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / 25000.0).cast("long").alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@register(
    "q_skew_profile",
    """
    WITH per_key AS (
        SELECT l_orderkey, COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_orderkey
    ),
    stats AS (
        SELECT CAST(MAX(n_rows) AS DOUBLE)
                   / (CAST(SUM(n_rows) AS DOUBLE) / COUNT(*)) AS skew_factor,
               COUNT(*) AS n_keys
        FROM per_key
    )
    SELECT k.l_orderkey, k.n_rows, s.skew_factor, s.n_keys, r.heavy_rank
    FROM (
        SELECT l_orderkey, n_rows,
               CAST(row_number() OVER (ORDER BY n_rows DESC, l_orderkey)
                    AS BIGINT) AS heavy_rank
        FROM per_key
    ) r
    JOIN per_key k USING (l_orderkey), stats s
    WHERE r.heavy_rank <= 10
    """,
    doc="Join-key SKEW PROFILE — the diagnosis step before salting or "
        "AQE skew-join tuning: per-key row counts for the hot join key "
        "(lineitem.l_orderkey), the 10 heaviest keys, and the skew "
        "factor max/mean. One map-side-combining aggregate; the rank "
        "is a TakeOrdered-style top-10 over the per-key frame and the "
        "scalar stats broadcast. The operational complement of "
        "operators/skew.py's salted join (q_join_salted applies the "
        "fix; this measures whether you need it).",
)
def q_skew_profile(spark, sf_dir):
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count("*").alias("n_rows"))
    stats = per_key.agg(
        (
            F.max("n_rows").cast("double")
            / (F.sum("n_rows").cast("double") / F.count("*"))
        ).alias("skew_factor"),
        F.count("*").alias("n_keys"),
    )
    top = (
        per_key.orderBy(F.col("n_rows").desc(), F.col("l_orderkey"))
        .limit(10)
        .withColumn(
            "heavy_rank",
            F.row_number()
            .over(Window.orderBy(F.col("n_rows").desc(), F.col("l_orderkey")))
            .cast("long"),
        )
    )
    return attach_scalar(top, stats).select(
        "l_orderkey", "n_rows", "skew_factor", "n_keys", "heavy_rank"
    )


@register(
    "q_exact_median_distributed",
    """
    WITH ordered AS (
        SELECT o_totalprice,
               row_number() OVER (ORDER BY o_totalprice) AS rn,
               COUNT(*) OVER () AS n
        FROM orders
    )
    SELECT o_totalprice AS median_price,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows
    FROM ordered WHERE rn = (n + 1) // 2
    """,
    doc="EXACT distributed median via sketch-bracketed selection "
        "(operators/indexing.distributed_kth_smallest, r5 redesign): "
        "one percentile_approx sketch pass brackets the k-th value "
        "within the GK rank guarantee, one banded groupBy pass "
        "resolves the exact answer from the bracket histogram — TWO "
        "full scans (the caller supplies the count) instead of the "
        "former ~30-45-scan binary search, which survives only as the "
        "guarantee-violation fallback. Still zero data sorting; the "
        "bracket shuffle is ≤4N/accuracy rows. The oracle is the "
        "order-statistics definition (lower median). Complements "
        "q_percentile_exact (per-group in-buffer sort, bounded "
        "groups) and q_approx_quantiles (sketch).",
)
def q_exact_median_distributed(spark, sf_dir):
    from ..operators.indexing import distributed_kth_smallest

    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    k = (n + 1) // 2
    med = distributed_kth_smallest(orders, "o_totalprice", k, scale=2, total=n)
    return spark.createDataFrame(
        [(float(med), n)], "median_price double, n_rows long"
    )


def _corr_pairs():
    # (x, y) over the four numeric lineitem measures; short keys index
    # the shared moment frame.
    return [
        ("q", "p", "l_quantity", "l_extendedprice"),
        ("q", "d", "l_quantity", "l_discount"),
        ("q", "t", "l_quantity", "l_tax"),
        ("p", "d", "l_extendedprice", "l_discount"),
        ("p", "t", "l_extendedprice", "l_tax"),
        ("d", "t", "l_discount", "l_tax"),
    ]


def _corr_matrix_sql() -> str:
    scaled = {
        "q": "CAST(l_quantity * 100 AS DECIMAL(14,0))",
        "p": "CAST(l_extendedprice * 100 AS DECIMAL(14,0))",
        "d": "CAST(l_discount * 100 AS DECIMAL(14,0))",
        "t": "CAST(l_tax * 100 AS DECIMAL(14,0))",
    }
    sums = ["CAST(COUNT(*) AS DECIMAL(15,0)) AS n"]
    for k, e in scaled.items():
        sums.append(f"CAST(SUM({e}) AS DECIMAL(16,0)) AS s_{k}")
        sums.append(
            f"CAST(SUM(CAST({e} AS DECIMAL(19,0)) * {e}) AS DECIMAL(22,0))"
            f" AS s_{k}{k}"
        )
    for a, b, _, _ in _corr_pairs():
        sums.append(
            f"CAST(SUM(CAST({scaled[a]} AS DECIMAL(19,0)) * {scaled[b]}) "
            f"AS DECIMAL(22,0)) AS s_{a}{b}"
        )
    rows = []
    # CAST one factor of every sum*sum product to DECIMAL(19,0): with
    # both sides at (16,0) DuckDB runs the multiply in int64 physical
    # storage and overflows; width 19 forces int128. 19+16=35 <= 38 so
    # the result type stays exact.
    for a, b, xn, yn in _corr_pairs():
        rows.append(
            f"SELECT '{xn}' AS col_x, '{yn}' AS col_y, "
            f"CAST(n AS BIGINT) AS n, "
            f"CAST(n * s_{a}{b} - CAST(s_{a} AS DECIMAL(19,0)) * s_{b} "
            f"AS DOUBLE) / "
            f"(sqrt(CAST(n * s_{a}{a} - CAST(s_{a} AS DECIMAL(19,0)) * s_{a} "
            f"AS DOUBLE)) * "
            f"sqrt(CAST(n * s_{b}{b} - CAST(s_{b} AS DECIMAL(19,0)) * s_{b} "
            f"AS DOUBLE))) AS corr "
            f"FROM m"
        )
    return (
        "WITH m AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
        + "\nUNION ALL ".join(rows)
    )


@register(
    "q_corr_matrix",
    _corr_matrix_sql(),
    doc="Pairwise PEARSON CORRELATION matrix over the four numeric "
        "lineitem measures in ONE map-side-combining pass: every "
        "column is scaled to an exact integer decimal (x100 — "
        "correlation is scale-invariant, and the inputs carry <= 2 "
        "decimal digits so the cast is exact after FP noise rounds "
        "away), all 15 moments (n, 4 sums, 4 sums of squares, 6 "
        "cross-sums) accumulate in EXACT decimal algebra, and the six "
        "correlations come out of the closed form n*sxy-sx*sy over "
        "sqrt products. No ln() anywhere and sqrt is IEEE-exact, so "
        "the oracle is bitwise (the same contract as "
        "q_linear_regression's moments; see that docstring for the "
        "decimal-width proof style). One scan, one 1-row aggregate, "
        "6-row output: scale-free at 100 TB.",
)
def q_corr_matrix(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    cols = {
        "q": "l_quantity",
        "p": "l_extendedprice",
        "d": "l_discount",
        "t": "l_tax",
    }
    scaled = {
        k: (F.col(c) * 100).cast("decimal(14,0)") for k, c in cols.items()
    }
    aggs = [F.count("*").cast("decimal(15,0)").alias("n")]
    for k, e in scaled.items():
        aggs.append(F.sum(e).cast("decimal(16,0)").alias(f"s_{k}"))
        aggs.append(
            F.sum(e.cast("decimal(19,0)") * e)
            .cast("decimal(22,0)")
            .alias(f"s_{k}{k}")
        )
    for a, b, _, _ in _corr_pairs():
        aggs.append(
            F.sum(scaled[a].cast("decimal(19,0)") * scaled[b])
            .cast("decimal(22,0)")
            .alias(f"s_{a}{b}")
        )
    m = li.agg(*aggs)
    n = F.col("n")

    def corr(a, b):
        num = (n * F.col(f"s_{a}{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")).cast(
            "double"
        )
        den_a = (n * F.col(f"s_{a}{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")).cast(
            "double"
        )
        den_b = (n * F.col(f"s_{b}{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")).cast(
            "double"
        )
        return num / (F.sqrt(den_a) * F.sqrt(den_b))

    # one projection over the 1-row moment frame fans out to the 6
    # pair rows (stack, not unionAll — a union of six aggregates would
    # rescan unless exchange reuse catches it)
    scored = m.select(
        n.cast("long").alias("n"),
        *[
            corr(a, b).alias(f"c_{a}{b}")
            for a, b, _, _ in _corr_pairs()
        ],
    )
    stack_args = ", ".join(
        f"'{xn}', '{yn}', c_{a}{b}" for a, b, xn, yn in _corr_pairs()
    )
    return scored.selectExpr(
        f"stack(6, {stack_args}) AS (col_x, col_y, corr)", "n"
    ).select("col_x", "col_y", "n", "corr")


@register(
    "q_sliding_wau",
    """
    WITH active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    contrib AS (
        SELECT user_id, day + CAST(r.i AS INT) AS wday
        FROM active, range(0, 7) r(i)
    ),
    days AS (SELECT DISTINCT day FROM active)
    SELECT d.day, COUNT(DISTINCT c.user_id) AS wau
    FROM days d JOIN contrib c ON c.wday = d.day
    GROUP BY d.day
    """,
    doc="EXACT trailing-7-day active users (WAU) per observed day — "
        "the sliding-window COUNT DISTINCT that tumbling/streaming "
        "windows cannot give exactly and sketches only approximate. "
        "Shape: dedup to (user, day) once, then each active day "
        "CONTRIBUTES itself to the 7 window endpoints it covers "
        "(explode × 7 — a constant-factor map, NOT a range join or a "
        "per-day rescan), equi-join onto the observed-day spine, one "
        "distinct aggregate. At 100 TB the 7× fanout of the deduped "
        "(user, day) frame is the optimal exact formulation: work is "
        "O(activity × window), independent of the raw event count.",
)
def q_sliding_wau(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    active = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    contrib = active.select(
        "user_id",
        F.explode(
            F.expr("transform(sequence(0, 6), i -> date_add(day, i))")
        ).alias("wday"),
    )
    days = active.select("day").distinct()
    return (
        days.join(contrib, days["day"] == contrib["wday"])
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )

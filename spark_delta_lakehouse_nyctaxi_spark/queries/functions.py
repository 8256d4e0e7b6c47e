"""Scalar-function coverage queries (SURVEY.md §2.8 + planned
string/array/datetime/conditional extensions). All JVM expressions; the
oracle maps each Spark function to its DuckDB equivalent (noted where
semantics need alignment, e.g. dayofweek origins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.readers import load_table
from .aggregates import dsum, dsum_sql
from . import register


@register(
    "q_string_funcs",
    """
    SELECT c_custkey,
           CONCAT(c_name, ':', c_mktsegment) AS name_seg,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           REPLACE(c_name, 'Customer', 'Cust') AS name_replaced,
           LENGTH(c_name) AS name_len,
           STRPOS(c_name, '#') AS hash_pos,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           REVERSE(c_mktsegment) AS seg_rev
    FROM customer
    """,
    doc="String scalar functions: concat/substring/replace/length/"
        "position/lpad/regexp_extract/reverse (§2.8 extension).",
)
def q_string_funcs(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws(":", "c_name", "c_mktsegment").alias("name_seg"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_replaced"),
        F.length("c_name").cast("long").alias("name_len"),
        F.instr(F.col("c_name"), "#").cast("long").alias("hash_pos"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.reverse("c_mktsegment").alias("seg_rev"),
    )


@register(
    "q_datetime_funcs",
    """
    SELECT o_orderkey,
           YEAR(o_orderdate) AS y,
           MONTH(o_orderdate) AS m,
           DAY(o_orderdate) AS d,
           QUARTER(o_orderdate) AS q,
           dayofweek(o_orderdate) + 1 AS dow,      -- DuckDB 0=Sun, Spark 1=Sun
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_2000,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           last_day(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders
    """,
    doc="Datetime scalar functions: year/month/day/quarter/dayofweek/"
        "date_add/datediff/trunc/last_day (§2.8 extension; dayofweek "
        "origin aligned between engines).",
)
def q_datetime_funcs(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.date_add(d, 30).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).cast("long").alias("days_to_2000"),
        F.trunc(d, "month").alias("month_start"),
        F.last_day(d).alias("month_end"),
    )


@register(
    "q_conditional",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount >= 0.05 THEN 'high'
                WHEN l_discount >= 0.02 THEN 'mid'
                ELSE 'low' END AS discount_band,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS return_state,
           GREATEST(l_tax, l_discount) AS max_rate,
           LEAST(l_tax, l_discount) AS min_rate,
           IF(l_quantity > 25, 1, 0) AS bulk_flag
    FROM lineitem
    """,
    doc="Conditional scalar functions: case/coalesce/nullif/greatest/"
        "least/if (§2.8; when-otherwise is F2's labeling generalized).",
)
def q_conditional(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_discount") >= 0.05, "high")
        .when(F.col("l_discount") >= 0.02, "mid")
        .otherwise("low")
        .alias("discount_band"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias("return_state"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.when(F.col("l_quantity") > 25, 1).otherwise(0).alias("bulk_flag"),
    )


@register(
    "q_array_funcs",
    """
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_toks,
           CAST(list_contains(toks, 'spark') AS BOOLEAN) AS has_spark,
           toks[1] AS first_tok,
           toks[-1] AS last_tok,
           array_to_string(list_sort(list_slice(toks, 1, 5)), ',') AS first5_sorted,
           len(list_distinct(toks)) AS n_unique_toks
    FROM t
    """,
    doc="Array scalar functions over tokenized text: size/contains/"
        "element_at/slice/sort/distinct (§2.8 planned array ops). "
        "Array-valued outputs are reduced to scalars for engine-neutral "
        "comparison.",
)
def q_array_funcs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_toks"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
        F.concat_ws(",", F.sort_array(F.slice(toks, 1, 5))).alias("first5_sorted"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_toks"),
    )


@register(
    "q_corr_manual",
    """
    WITH s AS (
        SELECT CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(22,2)))
                    AS DECIMAL(16,2)) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(22,2)))
                    AS DECIMAL(16,2)) AS sy,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(22,4)))
                    AS DECIMAL(22,4)) AS sxx,
               CAST(SUM(CAST(l_extendedprice * l_extendedprice
                             AS DECIMAL(22,4))) AS DECIMAL(22,4)) AS syy,
               CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(22,4)))
                    AS DECIMAL(22,4)) AS sxy
        FROM lineitem
    )
    , w AS (
        -- DuckDB derives multiply width from operand widths and does
        -- NOT auto-widen past int64 storage: force int128 decimals so
        -- every product is exact (values are identical to Spark's
        -- exact (33,4)/(34,4) arithmetic — only the representation
        -- differs)
        SELECT CAST(n AS DECIMAL(16,0)) AS n,
               CAST(sx AS DECIMAL(19,2)) AS sx,
               CAST(sy AS DECIMAL(19,2)) AS sy,
               CAST(sxx AS DECIMAL(22,4)) AS sxx,
               CAST(syy AS DECIMAL(22,4)) AS syy,
               CAST(sxy AS DECIMAL(22,4)) AS sxy
        FROM s
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_qty_price
    FROM w
    """,
    doc="Pearson correlation from exact decimal moment sums — the "
        "scale-safe way to get bit-stable statistical aggregates "
        "(built-in corr() is fp-order-dependent under shuffles). The "
        "moment ALGEBRA stays in exact decimals too — narrowed so "
        "every product fits precision 38 without capping — and doubles "
        "appear only at three single-rounding points (numerator, two "
        "radicands), so there is no multi-op float sequence an engine "
        "could fuse differently (the earlier double-algebra form "
        "diverged from DuckDB by 1 ulp at sf0.1 via FMA in "
        "n·sxy − sx·sy).",
)
def q_corr_manual(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    qty, price = F.col("l_quantity"), F.col("l_extendedprice")
    s = l.agg(
        F.count("*").cast("decimal(10,0)").alias("n"),
        # per-row rounding identical to the dsum discipline; the sum is
        # then NARROWED (exact — overflow would raise under ANSI, never
        # silently round) so decimal products below stay ≤ precision 38
        F.sum(qty.cast("decimal(22,2)")).cast("decimal(16,2)").alias("sx"),
        F.sum(price.cast("decimal(22,2)")).cast("decimal(16,2)").alias("sy"),
        F.sum((qty * qty).cast("decimal(22,4)")).cast("decimal(22,4)").alias("sxx"),
        F.sum((price * price).cast("decimal(22,4)")).cast("decimal(22,4)").alias("syy"),
        F.sum((qty * price).cast("decimal(22,4)")).cast("decimal(22,4)").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # exact decimal algebra: (10,0)*(22,4) → (33,4); (16,2)² → (33,4);
    # differences → (34,4) — no precision capping anywhere
    corr = (n * sxy - sx * sy).cast("double") / (
        F.sqrt((n * sxx - sx * sx).cast("double"))
        * F.sqrt((n * syy - sy * sy).cast("double"))
    )
    return s.select(n.cast("long").alias("n"), corr.alias("corr_qty_price"))


@register(
    "q_linear_regression",
    """
    WITH s AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(22,2)))
                    AS DECIMAL(16,2)) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(22,2)))
                    AS DECIMAL(16,2)) AS sy,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(22,4)))
                    AS DECIMAL(21,4)) AS sxx,
               CAST(SUM(CAST(l_extendedprice * l_extendedprice
                             AS DECIMAL(22,4))) AS DECIMAL(22,4)) AS syy,
               CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(22,4)))
                    AS DECIMAL(21,4)) AS sxy
        FROM lineitem GROUP BY l_returnflag
    ),
    w AS (
        -- widths ≥ 19 force DuckDB's int128 decimal storage (int64
        -- operands overflow in multiplication); every product below is
        -- kept ≤ combined width 38 so it stays an EXACT decimal — a
        -- wider product silently falls back to double multiply there
        SELECT l_returnflag,
               CAST(n AS DECIMAL(16,0)) AS n,
               CAST(sx AS DECIMAL(19,2)) AS sx,
               CAST(sy AS DECIMAL(19,2)) AS sy,
               -- sy·sxx / sx·sxy need (19,2)×(19,4) = 38 (width 19 ⇒
               -- int128 storage — an int64 operand overflows in
               -- multiplication); their (38,6) difference stays an
               -- exact DECIMAL(38,6). sxx ≤ n·50² and sxy ≤
               -- n·50·110000 both fit (19,4) at any test SF
               CAST(sxx AS DECIMAL(19,4)) AS sxx,
               CAST(syy AS DECIMAL(22,4)) AS syy,
               CAST(sxy AS DECIMAL(19,4)) AS sxy
        FROM s
    )
    ,
    d AS (
        -- decimal→double is only engine-identical at SCALE 0: DuckDB
        -- converts int128→double then divides by 10^scale (two
        -- roundings) while Spark single-rounds, so any scale>0 value
        -- past 2^53 units can differ in the last ulp. Every moment
        -- combination is therefore rounded to scale 0 IN EXACT DECIMAL
        -- first — round(), not a cast: DuckDB's scale-reducing decimal
        -- cast TRUNCATES where Spark's rounds half-up — and only then
        -- converted (a single correct rounding on both engines; the
        -- dropped fraction is ≤ 1e-15 relative, below the quotients'
        -- ulp).
        SELECT l_returnflag, n,
               CAST(round(n * sxy - sx * sy, 0)  AS DOUBLE) AS num,
               CAST(round(n * sxx - sx * sx, 0)  AS DOUBLE) AS den,
               CAST(round(n * syy - sy * sy, 0)  AS DOUBLE) AS den2,
               CAST(round(sy * sxx - sx * sxy, 0) AS DOUBLE) AS inum
        FROM w
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           num / den AS slope,
           inum / den AS intercept,
           (num * num) / (den * den2) AS r2
    FROM d
    """,
    doc="Grouped OLS linear regression (extendedprice ~ quantity per "
        "return flag) from exact decimal moment sums — the normal-"
        "equation closed form with the q_corr_manual discipline, "
        "hardened: all moment algebra stays in exact decimals (every "
        "product ≤ precision 38 on Spark AND ≤ combined width 38 on "
        "int128 operands in DuckDB), and every decimal→double "
        "conversion goes through round(x, 0) first — scale-0 is the "
        "only decimal→double shape both engines single-round "
        "identically (DuckDB divides by 10^scale after the int128 "
        "conversion, double-rounding any scale>0 value past 2^53 "
        "units). One map-side-combining aggregate per group is the "
        "only shuffle — the scale path for per-segment model fitting "
        "(built-in regr_slope is fp-order-dependent).",
)
def q_linear_regression(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    qty, price = F.col("l_quantity"), F.col("l_extendedprice")
    s = l.groupBy("l_returnflag").agg(
        F.count("*").cast("decimal(10,0)").alias("n0"),
        F.sum(qty.cast("decimal(22,2)")).cast("decimal(16,2)").alias("sx0"),
        F.sum(price.cast("decimal(22,2)")).cast("decimal(16,2)").alias("sy0"),
        F.sum((qty * qty).cast("decimal(22,4)")).cast("decimal(21,4)").alias("sxx0"),
        F.sum((price * price).cast("decimal(22,4)")).cast("decimal(22,4)").alias("syy0"),
        F.sum((qty * price).cast("decimal(22,4)")).cast("decimal(21,4)").alias("sxy0"),
    ).select(
        # Spark-side widths: every product ≤ precision 38 so the exact
        # decimal algebra never hits allowPrecisionLoss rounding —
        # n(15)·sxy(19)+1 = 35, sy(16,2)·sxx(19,4)+1 = 36, and the
        # (37,4)−(33,4) differences land exactly on 38
        "l_returnflag",
        F.col("n0").cast("decimal(15,0)").alias("n"),
        F.col("sx0").cast("decimal(16,2)").alias("sx"),
        F.col("sy0").cast("decimal(16,2)").alias("sy"),
        F.col("sxx0").cast("decimal(19,4)").alias("sxx"),
        F.col("syy0").cast("decimal(22,4)").alias("syy"),
        F.col("sxy0").cast("decimal(19,4)").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # every moment combination is rounded to SCALE 0 in exact decimal
    # before the double conversion — the only decimal→double shape both
    # engines single-round identically (see the oracle comment; F.round
    # on decimals is HALF_UP = DuckDB round()'s half-away for every
    # sign)
    num = F.round(n * sxy - sx * sy, 0).cast("double")
    den = F.round(n * sxx - sx * sx, 0).cast("double")
    den2 = F.round(n * syy - sy * sy, 0).cast("double")
    inum = F.round(sy * sxx - sx * sxy, 0).cast("double")
    slope = num / den
    intercept = inum / den
    r2 = (num * num) / (den * den2)
    return s.select(
        "l_returnflag",
        n.cast("long").alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


@register(
    "q_grouping_sets",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="GROUPING SETS via the SQL front end (spark.sql over a temp "
        "view) — demonstrates the engine's SQL surface alongside the "
        "DataFrame API.",
)
def q_grouping_sets(spark, sf_dir):
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(22,2))) AS DOUBLE) AS sum_qty
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "q_map_struct",
    """
    SELECT event_id,
           CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
                           WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4
                           WHEN 'error' THEN 5 END AS type_code,
           EXTRACT(YEAR FROM ts) AS y,
           EXTRACT(MONTH FROM ts) AS m,
           EXTRACT(YEAR FROM ts) * 100 + EXTRACT(MONTH FROM ts) AS ym
    FROM events
    """,
    doc="Map and struct column ops (§2.8 planned): a map-literal decode "
        "table indexed by a column (element_at on MapType), and a packed "
        "struct with field extraction. Outputs reduce to scalars so the "
        "oracle sees plain CASE/EXTRACT.",
)
def q_map_struct(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    codes = F.create_map(
        F.lit("click"), F.lit(1), F.lit("view"), F.lit(2),
        F.lit("purchase"), F.lit(3), F.lit("signup"), F.lit(4),
        F.lit("error"), F.lit(5),
    )
    packed = F.struct(
        F.year("ts").alias("y"), F.month("ts").alias("m")
    )
    return e.select(
        "event_id",
        F.element_at(codes, F.col("event_type")).alias("type_code"),
        packed.getField("y").cast("long").alias("y"),
        packed.getField("m").cast("long").alias("m"),
        (packed.getField("y").cast("long") * 100 + packed.getField("m")).alias("ym"),
    )


@register(
    "q_array_agg",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_seen
    FROM events
    GROUP BY user_id
    """,
    doc="Aggregation into a collection: collect_set per user, sorted "
        "then joined to a string so the comparison is order- and "
        "engine-neutral (raw collect_set order is partition-dependent).",
)
def q_array_agg(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types_seen"),
    )


@register(
    "q_zscore_pandas",
    """
    WITH s AS (
        SELECT lang,
               CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean,
               sqrt(CAST(SUM(n_chars * n_chars) AS DOUBLE) / COUNT(*)
                    - (CAST(SUM(n_chars) AS DOUBLE) / COUNT(*))
                      * (CAST(SUM(n_chars) AS DOUBLE) / COUNT(*))) AS sd
        FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang,
           CASE WHEN s.sd > 0 THEN (d.n_chars - s.mean) / s.sd ELSE 0.0 END AS zscore
    FROM documents d JOIN s ON d.lang = s.lang
    """,
    doc="Grouped-map Pandas UDF (applyInPandas): per-language z-score "
        "of document length. Integer sums make the float math "
        "order-independent, so the Arrow-batched Python path matches "
        "the SQL formulation exactly.",
)
def q_zscore_pandas(spark, sf_dir):
    from ..functions.udfs import zscore_by_group

    df = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return zscore_by_group(df, "lang", "n_chars", ["doc_id"])


@register(
    "q_weighted_mean_udaf",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS BIGINT) * l_linenumber) AS DOUBLE)
             / CAST(SUM(l_linenumber) AS DOUBLE) AS wmean_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="GROUPED_AGG Pandas UDF (vectorized UDAF): linenumber-weighted "
        "mean quantity per return flag — the custom-aggregate escape "
        "hatch, exact via integer partial sums.",
)
def q_weighted_mean_udaf(spark, sf_dir):
    from ..functions.udfs import weighted_mean_udaf

    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag"),
        F.col("l_quantity").cast("long").alias("q"),
        F.col("l_linenumber").cast("long").alias("w"),
    )
    return l.groupBy("l_returnflag").agg(
        weighted_mean_udaf("q", "w").alias("wmean_qty")
    )


@register(
    "q_stddev_manual",
    """
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(22,2)))
                    AS DECIMAL(19,2)) AS sx,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(22,4)))
                    AS DECIMAL(22,4)) AS sxx
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CAST(sx AS DOUBLE) / n AS mean_qty,
           sqrt(CAST(greatest(0, CAST(n AS DECIMAL(16,0)) * sxx - sx * sx)
                     AS DOUBLE)
                / NULLIF(n * (n - 1), 0)) AS stddev_qty
    FROM s
    """,
    doc="Grouped sample standard deviation from exact decimal moment "
        "sums (the q_corr_manual discipline applied to dispersion): "
        "built-in stddev() accumulates in fp and is shuffle-order-"
        "dependent; exact Σx/Σx² then one sqrt/division per GROUP is "
        "bit-stable under any partitioning and matches the oracle.",
)
def q_stddev_manual(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    s = l.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(qty.cast("decimal(22,2)")).cast("decimal(16,2)").alias("sx"),
        F.sum((qty * qty).cast("decimal(22,4)")).cast("decimal(22,4)").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    # NULL-safety discipline (round-2 ADVICE): a single-row group makes
    # the denominator 0 (DIVIDE_BY_ZERO under ANSI) → try_divide/NULLIF
    # yields NULL on both sides.  The radicand is EXACT decimal algebra
    # (q_corr_manual discipline: (10,0)×(22,4) and (16,2)² both fit
    # precision 38 uncapped, so no float sequence an engine could fuse
    # differently, and no capping round-off) — greatest(0, ·) still
    # guards the theoretical zero-variance edge, and doubles appear
    # only at the single-rounding radicand cast and mean division.
    rad = F.greatest(
        F.lit(0), n.cast("decimal(10,0)") * sxx - sx * sx
    ).cast("double")
    return s.select(
        "l_returnflag",
        "n",
        (sx.cast("double") / n).alias("mean_qty"),
        F.sqrt(F.try_divide(rad, n * (n - 1))).alias("stddev_qty"),
    )


@register(
    "q_ewma_pandas",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           list_reduce(list(value ORDER BY ts, event_id),
                       (acc, x) -> 0.2 * x + 0.8 * acc) AS ewma
    FROM events GROUP BY user_id
    """,
    doc="Stateful order-dependent aggregate via applyInPandas: per-user "
        "EWMA (alpha 0.2) over the time-ordered event stream — the fold "
        "acc = 0.2·x + 0.8·acc that no SQL window expresses. The "
        "Python loop's IEEE fold is bit-identical to DuckDB's "
        "list_reduce left fold over the same (ts, event_id)-sorted "
        "list, so this UDF-family entry is EXACTLY value-oracled (most "
        "engines' EWMA can only be spot-checked). One shuffle on the "
        "user key; O(1) state per group.",
)
def q_ewma_pandas(spark, sf_dir):
    from ..functions.udfs import ewma_by_group

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    return ewma_by_group(ev, "user_id", ["ts", "event_id"], "value", alpha=0.2)


@register(
    "q_listagg",
    """
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           string_agg(o_orderstatus, ',' ORDER BY o_orderkey) AS statuses
    FROM orders
    GROUP BY o_custkey
    """,
    doc="Ordered string aggregation — Spark 4's LISTAGG ... WITHIN "
        "GROUP (SQL:2016) mirrored by DuckDB string_agg(ORDER BY). The "
        "explicit WITHIN GROUP order (unique-key tiebroken) is what "
        "makes a concatenation aggregate deterministic at all — an "
        "unordered listagg is partitioning-dependent and could never "
        "value-check.",
)
def q_listagg(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.expr(
            "listagg(o_orderstatus, ',') WITHIN GROUP (ORDER BY o_orderkey)"
        ).alias("statuses"),
    )


@register(
    "q_higher_order",
    """
    WITH arrs AS (
        SELECT l_orderkey,
               list_sort(list(l_quantity)) AS q
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           len(q) AS n_items,
           list_sum(q) AS total_qty,
           len(list_filter(q, x -> x > 40.0)) AS n_over_40,
           len(list_filter(q, x -> x > 40.0)) > 0 AS any_over_40,
           len(list_filter(q, x -> NOT (x > 0.0))) = 0 AS all_positive
    FROM arrs
    """,
    doc="Higher-order array functions (§2.8 surface: transform / filter "
        "/ exists / forall / aggregate) over per-order quantity arrays. "
        "The arrays are sorted first so the fold order is identical in "
        "both engines (Spark's aggregate() left fold vs DuckDB "
        "list_sum — same-order parity, the _COS_SQL discipline); "
        "quantities are integer-valued doubles so every sum is exact "
        "regardless.",
)
def q_higher_order(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    arrs = l.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_quantity")).alias("q")
    )
    over40 = F.filter(F.col("q"), lambda x: x > 40.0)
    return arrs.select(
        "l_orderkey",
        F.size("q").alias("n_items"),
        F.aggregate(F.col("q"), F.lit(0.0), lambda acc, x: acc + x).alias("total_qty"),
        F.size(over40).alias("n_over_40"),
        F.exists(F.col("q"), lambda x: x > 40.0).alias("any_over_40"),
        F.forall(F.col("q"), lambda x: x > 0.0).alias("all_positive"),
    )


@register(
    "q_sql_scripting",
    """
    SELECT CAST(SUM(CAST(substr(o_orderpriority, 1, 1) AS BIGINT))
                AS BIGINT) AS weighted_priority_count,
           COUNT(*) AS n_orders
    FROM orders
    """,
    doc="Spark 4 SQL SCRIPTING (BEGIN…END, DECLARE, WHILE, IF, SET): a "
        "compound statement loops over the five order-priority classes, "
        "binding the loop variable into each iteration's aggregate and "
        "accumulating i·count(priority i). The oracle collapses the "
        "loop into Σ digit(o_orderpriority) — a broken loop bound, a "
        "stale variable, or a mis-bound iteration produces a different "
        "total. Control flow runs on the driver; every per-iteration "
        "aggregate is a full distributed job.",
)
def q_sql_scripting(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_script_v")
    return spark.sql(
        """
        BEGIN
          DECLARE i INT DEFAULT 1;
          DECLARE weighted BIGINT DEFAULT 0;
          DECLARE total BIGINT DEFAULT 0;
          WHILE i <= 5 DO
            SET weighted = weighted + i * (
              SELECT COUNT(*) FROM orders_script_v
              WHERE CAST(substr(o_orderpriority, 1, 1) AS INT) = i
            );
            SET i = i + 1;
          END WHILE;
          SET total = (SELECT COUNT(*) FROM orders_script_v);
          SELECT weighted AS weighted_priority_count, total AS n_orders;
        END
        """
    )


@register(
    "q_sql_variables",
    f"""
    WITH avg_price AS (
        SELECT {dsum_sql('o_totalprice')} / COUNT(*) AS cutoff FROM orders
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_above,
           {dsum_sql('o_totalprice')} AS revenue_above
    FROM orders, avg_price
    WHERE o_totalprice > cutoff AND o_orderstatus <> 'P'
    GROUP BY o_orderstatus
    """,
    doc="Spark 4 session variables + parameterized SQL: DECLARE a "
        "session variable, SET VAR it from a scalar subquery (the "
        "decimal-exact mean price), then reference it alongside a "
        "NAMED PARAMETER MARKER (:excluded, bound via spark.sql args) "
        "in the aggregate. The oracle inlines both — wrong variable "
        "state or broken parameter binding changes every row.",
)
def q_sql_variables(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_var_v")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE price_cutoff DOUBLE DEFAULT 0.0"
    )
    spark.sql(
        """
        SET VAR price_cutoff = (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(22,2))) AS DOUBLE)
                   / COUNT(*)
            FROM orders_var_v
        )
        """
    )
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n_above,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(22,2))) AS DOUBLE)
                   AS revenue_above
        FROM orders_var_v
        WHERE o_totalprice > price_cutoff AND o_orderstatus <> :excluded
        GROUP BY o_orderstatus
        """,
        args={"excluded": "P"},
    )


@register(
    "q_sql_pipe_syntax",
    f"""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           {dsum_sql('l_extendedprice')} AS revenue
    FROM lineitem
    WHERE l_quantity > 10
    GROUP BY l_returnflag
    HAVING COUNT(*) > 100
    """,
    doc="Spark 4 SQL PIPE syntax (|> operators — the linear query "
        "notation): FROM … |> WHERE … |> AGGREGATE … GROUP BY … "
        "|> WHERE over the aggregate (pipe HAVING). Same decimal-exact "
        "revenue sum as everywhere; the oracle is the classic "
        "SELECT/WHERE/GROUP BY/HAVING form, certifying the pipe "
        "pipeline plans the identical computation.",
)
def q_sql_pipe_syntax(spark, sf_dir):
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_pipe_v"
    )
    return spark.sql(
        """
        FROM lineitem_pipe_v
        |> WHERE l_quantity > 10
        |> AGGREGATE COUNT(*) AS n_rows,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(22,2)))
                          AS DOUBLE) AS revenue
           GROUP BY l_returnflag
        |> WHERE n_rows > 100
        |> SELECT l_returnflag, n_rows, revenue
        """
    )


@register(
    "q_group_by_all",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice')} AS revenue
    FROM orders
    GROUP BY ALL
    """,
    doc="GROUP BY ALL (the modern-SQL ergonomic both Spark 4 and "
        "DuckDB resolve to every non-aggregate select item): the "
        "oracle is the IDENTICAL statement text, certifying both "
        "engines infer the same grouping keys. Decimal-exact revenue "
        "as everywhere.",
)
def q_group_by_all(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gba_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(22,2))) AS DOUBLE)
                   AS revenue
        FROM orders_gba_v
        GROUP BY ALL
        """
    )


@register(
    "q_sql_params",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(22,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0
    GROUP BY o_orderpriority
    """,
    doc="Spark 4 PARAMETERIZED SQL + IDENTIFIER clause: the query text "
        "contains no literal table, column, or filter values — the "
        "table and grouping column bind through IDENTIFIER(:name) "
        "(SQL-injection-safe dynamic identifiers, the supported way to "
        "template object names) and the filter values through named "
        "parameter markers (:status, :minp) passed to spark.sql(args=). "
        "The oracle is the fully-bound statement; a mis-bound "
        "identifier or parameter produces different rows. This is the "
        "API surface a multi-tenant lakehouse job uses to run one "
        "audited statement across many tables safely.",
)
def q_sql_params(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_param_v")
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp) AS o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(IDENTIFIER(:val) AS DECIMAL(22,2))) AS DOUBLE)
                   AS revenue
        FROM IDENTIFIER(:tbl)
        WHERE IDENTIFIER(:st_col) = :status AND IDENTIFIER(:val) > :minp
        GROUP BY IDENTIFIER(:grp)
        """,
        args={
            "tbl": "orders_param_v",
            "grp": "o_orderpriority",
            "val": "o_totalprice",
            "st_col": "o_orderstatus",
            "status": "O",
            "minp": 100000.0,
        },
    )


@register(
    "q_udtf_table_arg",
    """
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (WHERE gap > 1800 * 1000000) AS long_gaps,
           CAST(MAX(gap) // 1000000 AS BIGINT) AS max_gap_s
    FROM g GROUP BY user_id
    """,
    doc="Spark 4 UDTF with a TABLE argument + PARTITION BY / ORDER BY: "
        "the pure-SQL surface for custom per-group SEQUENTIAL operators "
        "— the planner shuffles on the partition key, streams each "
        "user's events through one UDTF instance in timestamp order "
        "(eval per row, terminate per partition), and the function "
        "emits per-user inter-event gap statistics (count, gaps over "
        "30 min, max gap in whole seconds — all exact integers). The "
        "same distribution contract as applyInPandasWithState but "
        "invocable from SQL; at 100 TB it is one shuffle on user_id. "
        "Oracle re-derives the gaps with a lag window (floor is "
        "monotone, so max(floor) = floor(max)).",
)
def q_udtf_table_arg(spark, sf_dir):
    from pyspark.sql.functions import udtf

    class GapStats:
        def __init__(self):
            self.user = None
            self.prev = None
            self.n = 0
            self.long_gaps = 0
            self.max_gap_us = None

        def eval(self, row):
            self.user = row.user_id
            self.n += 1
            if self.prev is not None:
                gap_us = (row.ts - self.prev) // __import__("datetime").timedelta(
                    microseconds=1
                )
                if gap_us > 1800 * 1_000_000:
                    self.long_gaps += 1
                if self.max_gap_us is None or gap_us > self.max_gap_us:
                    self.max_gap_us = gap_us
            self.prev = row.ts

        def terminate(self):
            if self.user is not None:
                mx = (
                    self.max_gap_us // 1_000_000
                    if self.max_gap_us is not None
                    else None
                )
                yield self.user, self.n, self.long_gaps, mx

    spark.udtf.register(
        "gap_stats",
        udtf(
            GapStats,
            returnType="user_id bigint, n_events bigint, long_gaps bigint, "
            "max_gap_s bigint",
        ),
    )
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_udtf_v")
    return spark.sql(
        """
        SELECT * FROM gap_stats(
            TABLE(SELECT user_id, ts, event_id FROM events_udtf_v)
            PARTITION BY user_id ORDER BY (ts, event_id)
        )
        """
    )


@register(
    "q_sql_udf",
    """
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                         AS DECIMAL(22,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_quantity >= 30.0
    GROUP BY l_returnflag
    """,
    doc="Spark 4 SQL-DEFINED FUNCTIONS (CREATE FUNCTION ... RETURN): a "
        "scalar SQL UDF (discounted price, decimal-quantized inside "
        "the function body so the sum stays exact) AND a SQL TABLE "
        "function (parameterized quantity filter) composed in one "
        "statement — the catalog-managed reusable-logic surface that "
        "replaces copy-pasted expressions across a lakehouse's views. "
        "Both are pure SQL rewrites, so Catalyst inlines them: the "
        "plan is identical to the hand-written query (filter pushed "
        "to the scan, decimal sum map-side combined) — zero UDF "
        "penalty, unlike Python UDFs. The oracle inlines the same "
        "logic textually. Re-runnable via CREATE OR REPLACE.",
)
def q_sql_udf(spark, sf_dir):
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_udf_v")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION discounted_dec(p DOUBLE, d DOUBLE)
        RETURNS DECIMAL(22,4)
        RETURN CAST(p * (1.0 - d) AS DECIMAL(22,4))
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION big_items(min_qty DOUBLE)
        RETURNS TABLE (l_returnflag STRING, l_extendedprice DOUBLE,
                       l_discount DOUBLE)
        RETURN SELECT l_returnflag, l_extendedprice, l_discount
               FROM lineitem_udf_v WHERE l_quantity >= min_qty
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_items,
               CAST(SUM(discounted_dec(l_extendedprice, l_discount)) AS DOUBLE)
                   AS revenue
        FROM big_items(30.0)
        GROUP BY l_returnflag
        """
    )


@register(
    "q_collation",
    """
    WITH mixed AS (
        SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_name)
                    ELSE p_name END AS name,
               p_retailprice
        FROM part
    )
    SELECT lower(name) AS name_ci,
           COUNT(*) AS n_parts,
           COUNT(DISTINCT name) AS n_case_variants,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(22,2))) AS DOUBLE)
               AS total_price
    FROM mixed
    GROUP BY lower(name)
    """,
    doc="CASE-INSENSITIVE COLLATION (Spark 4 collation surface): part "
        "names deterministically mixed-cased, then grouped under "
        "COLLATE UTF8_LCASE — upper/lower variants of one name merge "
        "into a single group whose case-variant count and exact price "
        "total prove the collation actually drove the aggregation "
        "(a binary group-by would split them). The emitted key is "
        "lower()ed so the group representative is deterministic; the "
        "oracle expresses the same semantics with lower() grouping — "
        "the collation is Spark's native feature under test, not a "
        "rewrite.",
)
def q_collation(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    mixed = p.select(
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_name"))
        .otherwise(F.col("p_name"))
        .alias("name"),
        "p_retailprice",
    )
    ci = F.expr("COLLATE(name, 'UTF8_LCASE')")
    return (
        mixed.groupBy(ci.alias("k"))
        .agg(
            F.count("*").alias("n_parts"),
            F.countDistinct("name").alias("n_case_variants"),
            dsum("p_retailprice").alias("total_price"),
        )
        .select(
            F.lower(F.col("k")).cast("string").alias("name_ci"),
            "n_parts",
            "n_case_variants",
            "total_price",
        )
    )

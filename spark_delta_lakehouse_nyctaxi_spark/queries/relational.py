"""Scans, projections, casts, filters, set ops, dedup, distinct, top-k.

Covers SURVEY.md §2.1 (S1/S2), §2.2 (P2-P9), §2.3 (F1-F5), §2.6 (O1-O3),
§2.7 (U1 + planned intersect/except), A6/A7.

All plans are single-stage or one-shuffle declarative DataFrame graphs;
filters and projections reach the parquet scan via Catalyst pushdown
(verified with .explain in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table
from . import register


# ---------------------------------------------------------------- scans

@register(
    "q_scan",
    "SELECT r_regionkey, r_name FROM region",
    doc="Full table scan (S1/S2; reference etl/bronze_job.py:17-38).",
)
def q_scan(spark, sf_dir):
    return load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")


# ---------------------------------------------- projections / casts (P2-P8)

@register(
    "q_project_date",
    "SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date FROM orders",
    doc="Date derivation (P2; reference etl/bronze_job.py:166-169).",
)
def q_project_date(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("order_date")
    )


@register(
    "q_cast_timestamp",
    """
    SELECT event_id,
           strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS ts_sec,
           CAST(ts AS DATE) AS event_date
    FROM events
    """,
    doc="String↔timestamp conversion (P3; reference etl/silver_job.py:53-61).",
)
def q_cast_timestamp(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    return df.select(
        "event_id",
        F.to_timestamp_ntz(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), F.lit("yyyy-MM-dd HH:mm:ss")
        ).alias("ts_sec"),
        F.to_date("ts").alias("event_date"),
    )


@register(
    "q_cast_numeric",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(TRUNC(l_quantity) AS INTEGER) AS qty_int,
           CAST(TRUNC(l_extendedprice) AS BIGINT) AS price_long,
           CAST(l_linenumber AS DOUBLE) AS linenumber_d
    FROM lineitem
    """,
    doc="Numeric casts (P4; reference etl/silver_job.py:38-110). Spark int-cast "
        "truncates toward zero, so the oracle uses TRUNC explicitly.",
)
def q_cast_numeric(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem")
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_extendedprice").cast("long").alias("price_long"),
        F.col("l_linenumber").cast("double").alias("linenumber_d"),
    )


@register(
    "q_string_norm",
    """
    SELECT c_custkey,
           LOWER(TRIM(c_mktsegment)) AS mktsegment_norm,
           UPPER(c_name) AS name_upper
    FROM customer
    """,
    doc="String normalization lower(trim()) (P5; reference etl/silver_job.py:93-102).",
)
def q_string_norm(spark, sf_dir):
    df = load_table(spark, sf_dir, "customer")
    return df.select(
        "c_custkey",
        F.lower(F.trim("c_mktsegment")).alias("mktsegment_norm"),
        F.upper("c_name").alias("name_upper"),
    )


@register(
    "q_round",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice / 7, 2) AS price_r
    FROM lineitem
    """,
    doc="round(col, 2) (P7; reference etl/gold_job.py:89-91). Divisor 7 keeps "
        "values off decimal midpoints so HALF_UP vs float-rounding agree.",
)
def q_round(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem")
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") / 7, 2).alias("price_r"),
    )


# ------------------------------------------------------- filters (F1-F5)

@register(
    "q_filter_conj",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
    FROM lineitem
    WHERE l_quantity > 10 AND l_extendedprice >= 1000
      AND l_shipdate IS NOT NULL AND l_discount >= 0.02
    """,
    doc="Conjunctive DQ filter (F1; reference etl/silver_job.py:113-168).",
)
def q_filter_conj(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem")
    cond = (
        (F.col("l_quantity") > 10)
        & (F.col("l_extendedprice") >= 1000)
        & F.col("l_shipdate").isNotNull()
        & (F.col("l_discount") >= 0.02)
    )
    return df.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    )


@register(
    "q_filter_range_viol",
    """
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_totalprice < 5000 THEN 'below_min'
                WHEN o_totalprice > 300000 THEN 'above_max'
                ELSE 'ok' END AS violation
    FROM orders
    WHERE o_totalprice < 5000 OR o_totalprice > 300000
    """,
    doc="Disjunctive range-violation filter + when/otherwise labeling "
        "(F2; reference utils/data_quality.py:194-223).",
)
def q_filter_range_viol(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders")
    lo, hi = 5000, 300000
    return df.filter((F.col("o_totalprice") < lo) | (F.col("o_totalprice") > hi)).select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_totalprice") < lo, F.lit("below_min"))
        .when(F.col("o_totalprice") > hi, F.lit("above_max"))
        .otherwise(F.lit("ok"))
        .alias("violation"),
    )


@register(
    "q_filter_null",
    """
    SELECT event_id, event_type
    FROM events
    WHERE NULLIF(event_type, 'error') IS NULL
    """,
    doc="Null filter (F3; reference utils/data_quality.py:164). Testdata is "
        "null-free, so nulls are derived via NULLIF to exercise the path.",
)
def q_filter_null(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    return df.filter(F.nullif(F.col("event_type"), F.lit("error")).isNull()).select(
        "event_id", "event_type"
    )


@register(
    "q_filter_eq",
    "SELECT event_id, user_id, value FROM events WHERE event_type = 'click'",
    doc="Equality filter (F4; reference etl/dq_metrics.py:125,141).",
)
def q_filter_eq(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "value")
    )


@register(
    "q_filter_watermark",
    """
    SELECT event_id, ts, user_id
    FROM events
    WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
    """,
    doc="Watermark / high-water-mark filter (F5; reference utils/incremental.py:53-86).",
)
def q_filter_watermark(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts") > F.lit("2024-01-15 00:00:00").cast("timestamp_ntz"))
        .select("event_id", "ts", "user_id")
    )


# ------------------------------------------------------ distinct / dedup

@register(
    "q_distinct",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    doc="Distinct (A6; reference etl/dq_metrics.py:128-134).",
)
def q_distinct(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "q_dedup",
    """
    SELECT lang, source, doc_id, n_chars
    FROM (
        SELECT lang, source, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
    doc="Deterministic dedup-by-key-subset (A7; reference etl/silver_job.py:171-212). "
        "dropDuplicates is survivor-nondeterministic, so this uses "
        "row_number over a stable tiebreak — same shuffle shape, stable result.",
)
def q_dedup(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy("doc_id")
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("lang", "source", "doc_id", "n_chars")
    )


# ------------------------------------------------------------- top-k (O2)

@register(
    "q_topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Top-k by sort+limit (O2/O3; reference etl/dq_metrics.py:128-140). "
        "Spark plans TakeOrderedAndProject — no global sort at scale.",
)
def q_topk(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ----------------------------------------------------------- set ops (§2.7)

@register(
    "q_union",
    """
    SELECT c_custkey AS entity_key, 'customer' AS entity FROM customer
    UNION ALL
    SELECT s_suppkey AS entity_key, 'supplier' AS entity FROM supplier
    """,
    doc="UNION ALL (U1; reference tests/test_silver.py:49-51).",
)
def q_union(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"), F.lit("customer").alias("entity")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"), F.lit("supplier").alias("entity")
    )
    return c.unionAll(s)


@register(
    "q_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT (planned in §2.7; nation keys present on both sides).",
)
def q_intersect(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "q_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="EXCEPT (planned in §2.7).",
)
def q_except(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


# ------------------------------------------------------------ json (§2.8)

@register(
    "q_json_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    """,
    doc="JSON extraction over events.props (planned §2.8 extension; "
        "get_json_object is JVM-side, no UDF).",
)
def q_json_extract(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


@register(
    "q_union_by_name",
    """
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM (
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL BY NAME
        SELECT o_orderkey, CAST(NULL AS VARCHAR) AS o_orderstatus,
               o_totalprice
        FROM orders WHERE o_orderkey % 10 = 1
    )
    """,
    doc="unionByName with schema reconciliation: the second branch's "
        "columns arrive in a different order (name-matched, not "
        "positional — a positional union would silently corrupt), "
        "matching DuckDB's UNION ALL BY NAME.",
)
def q_union_by_name(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter("o_orderkey % 10 = 0").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    b = orders.filter("o_orderkey % 10 = 1").select(
        "o_orderkey", F.lit(None).cast("string").alias("o_orderstatus"), "o_totalprice"
    )
    return a.unionByName(b)


@register(
    "q_join_null_safe",
    """
    SELECT a.event_id AS id_a, b.event_id AS id_b
    FROM (SELECT event_id, json_extract(props, '$.missing') AS k
          FROM events WHERE event_id < 50) a
    JOIN (SELECT event_id, json_extract(props, '$.missing') AS k
          FROM events WHERE event_id >= 50 AND event_id < 100) b
      ON a.k IS NOT DISTINCT FROM b.k
    """,
    doc="Null-safe equi-join (<=> / eqNullSafe): NULL keys MATCH each "
        "other, where a plain equi-join drops every null-keyed row — "
        "the semantics dedup and CDC key joins need (the storage "
        "layer's MERGE builds its condition with eqNullSafe for this "
        "reason). Keys here are an always-missing JSON field, so every "
        "pair matches through NULL.",
)
def q_join_null_safe(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter("event_id < 50").select(
        F.col("event_id").alias("id_a"),
        F.get_json_object("props", "$.missing").alias("k_a"),
    )
    b = ev.filter("event_id >= 50 AND event_id < 100").select(
        F.col("event_id").alias("id_b"),
        F.get_json_object("props", "$.missing").alias("k_b"),
    )
    return a.join(b, F.col("k_a").eqNullSafe(F.col("k_b"))).select("id_a", "id_b")

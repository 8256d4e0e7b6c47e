"""Window functions (SURVEY.md §2.9 — absent in the reference, planned as
first-class coverage: ranking, analytic lag/lead, running frames).

Scale notes: window partitions are (customer, user) keyed — high
cardinality, so the single shuffle per window spec distributes evenly.
Every orderBy carries a unique tiebreaker for determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table
from . import register


@register(
    "q_window_rank",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER w AS rn,
               RANK()       OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    """,
    doc="Ranking windows: top-3 orders per customer (§2.9 q_window_rank).",
)
def q_window_rank(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_window_lag",
    """
    SELECT event_id, user_id, value,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           value - COALESCE(LAG(value) OVER w, value) AS delta_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Analytic lag/lead over a per-user event timeline (§2.9 q_window_lag).",
)
def q_window_lag(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagv = F.lag("value").over(w)
    return e.select(
        "event_id",
        "user_id",
        "value",
        lagv.alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.coalesce(lagv, F.col("value"))).alias("delta_value"),
    )


@register(
    "q_window_pct",
    """
    SELECT o_custkey, o_orderkey,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST()    OVER w AS cume,
           NTILE(4)       OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Distribution windows: percent_rank / cume_dist / ntile per "
        "customer. Exact rational values ((rank-1)/(n-1), rank/n) — "
        "identical doubles in any engine since the full orderBy carries "
        "a unique tiebreaker.",
)
def q_window_pct(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "q_window_frame",
    """
    SELECT o_custkey, o_orderkey,
           COUNT(*) OVER w AS order_seq,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(22,2))) OVER w AS DOUBLE) AS running_revenue
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="Running frame: cumulative revenue per customer (§2.9 q_window_frame). "
        "Decimal accumulation keeps the running sum engine-invariant.",
)
def q_window_frame(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(w).alias("order_seq"),
        F.sum(F.col("o_totalprice").cast("decimal(22,2)")).over(w).cast("double").alias("running_revenue"),
    )


@register(
    "q_window_firstlast",
    """
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice)  OVER w AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="Navigation windows: first/last/nth order value per customer "
        "over the full-partition frame (default frames would make "
        "last_value = current row — the classic trap, pinned explicitly).",
)
def q_window_firstlast(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@register(
    "q_global_row_number",
    """
    SELECT o_orderkey,
           ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS row_id
    FROM orders
    """,
    doc="Global stable row numbering WITHOUT the single-partition "
        "global-sort window (operators/indexing.py): range-partition + "
        "in-partition sort, per-partition counts (k scalars to the "
        "driver), then offset + local index via order-preserving "
        "mapInPandas — the zipWithIndex analog that actually scales. "
        "Total order via the (o_totalprice, o_orderkey) tiebreak makes "
        "it equal to the window answer exactly.",
)
def q_global_row_number(spark, sf_dir):
    from ..operators.indexing import global_row_number

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return global_row_number(
        orders, ["o_totalprice", "o_orderkey"], out_col="row_id"
    ).select("o_orderkey", "row_id")


@register(
    "q_window_range_frame",
    """
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_trailing_hour,
           CAST(SUM(CAST(value AS DECIMAL(22,2))) OVER w AS DOUBLE)
               AS sum_trailing_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    doc="Time-based RANGE window frame (trailing one hour per user) — "
        "the VALUE-bounded frame q_window_frame's ROWS variant can't "
        "express: the frame extends by event-time distance, not row "
        "count, so irregular event spacing is handled correctly "
        "(rolling rates, trailing velocity features). Decimal-cast sum "
        "keeps the frame aggregate bit-stable. Frame bounds are "
        "tie-safe: RANGE at equal ts includes all peers on both "
        "engines.",
)
def q_window_range_frame(spark, sf_dir):
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_rf_v")
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               COUNT(*) OVER w AS n_trailing_hour,
               CAST(SUM(CAST(value AS DECIMAL(22,2))) OVER w AS DOUBLE)
                   AS sum_trailing_hour
        FROM events_rf_v
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    )


@register(
    "q_rolling_median",
    """
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(EXTRACT(year FROM l_shipdate) AS INT) AS yr,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(22,2))) AS DOUBLE)
                   AS revenue
        FROM lineitem GROUP BY 1, 2
    )
    SELECT day, revenue,
           frame[(len(frame) + 1) // 2] AS rolling_median
    FROM (
        SELECT day, revenue,
               list_sort(list(revenue) OVER (
                   PARTITION BY yr ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS frame
        FROM daily
    )
    """,
    doc="Centered 7-day ROLLING MEDIAN of daily revenue — the robust "
        "smoother (order statistics resist the outliers a rolling mean "
        "absorbs). Median = LOWER median, picked by integer index from "
        "the sorted window frame: pure element selection, zero FP "
        "arithmetic after the (decimal-exact) daily sums, so the "
        "oracle is bitwise — an even-count average would reintroduce "
        "engine-ordered FP addition. Windows PARTITION BY year, so no "
        "single-partition exchange: at 100 TB each year (or any "
        "coarser time bucket) is an independent range, the same "
        "time-sliced layout the resample/sessionize queries use; only "
        "the 6 boundary days per year see a truncated frame.",
)
def q_rolling_median(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    from .aggregates import dsum

    daily = li.groupBy(
        F.to_date("l_shipdate").alias("day"),
        F.year("l_shipdate").cast("int").alias("yr"),
    ).agg(dsum("l_extendedprice").alias("revenue"))
    w = (
        Window.partitionBy("yr")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    frame = F.array_sort(F.collect_list("revenue").over(w))
    return daily.select(
        "day",
        "revenue",
        F.element_at(
            frame, ((F.size(frame) + 1) / 2).cast("int")
        ).alias("rolling_median"),
    )


@register(
    "q_window_group_limit",
    """
    SELECT l_suppkey, CAST(rk AS INT) AS rk,
           l_orderkey, l_linenumber, l_extendedprice
    FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
               ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                  ORDER BY l_extendedprice DESC,
                                           l_orderkey, l_linenumber) AS rk
        FROM lineitem
    ) WHERE rk <= 3
    """,
    doc="Per-group TOP-K via rank filter, certified to plan "
        "WindowGroupLimit (Spark 3.5+): the optimizer recognizes "
        "row_number() <= k and inserts group-limit operators BOTH "
        "before and after the shuffle — each map task keeps only its "
        "local top-3 per supplier, so the exchange moves O(groups*k) "
        "rows instead of the whole fact table, and the final sort "
        "ranks 3 rows per group. The per-group analog of q_topk's "
        "TakeOrderedAndProject; at 100 TB this is the difference "
        "between shuffling 3 rows and 300k rows per supplier. RAISES "
        "unless both the partial and final WindowGroupLimit are in "
        "the executed plan. Deterministic via the (orderkey, "
        "linenumber) unique tiebreak.",
)
def q_window_group_limit(spark, sf_dir):
    from ..plans import explain_str

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    out = (
        li.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("l_suppkey", F.col("rk").cast("int"), "l_orderkey", "l_linenumber", "l_extendedprice")
    )
    if explain_str(out).count("WindowGroupLimit") < 2:
        raise AssertionError(
            "rank<=k filter did not plan partial+final WindowGroupLimit"
        )
    return out


@register(
    "q_cumulative_distinct",
    """
    WITH first_seen AS (
        SELECT user_id, MIN(date_trunc('hour', ts)) AS hour
        FROM events GROUP BY user_id
    ),
    hourly AS (SELECT hour, COUNT(*) AS n_new_users FROM first_seen GROUP BY hour)
    SELECT hour, n_new_users,
           CAST(SUM(n_new_users) OVER (
               ORDER BY hour ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS cum_users
    FROM hourly
    """,
    doc="CUMULATIVE DISTINCT users over time (the acquisition curve): "
        "a naive running COUNT(DISTINCT user_id) OVER (ORDER BY day) "
        "holds the whole user set in window state and re-counts it "
        "per day — quadratic and single-partition. The classic "
        "decomposition makes it two hash aggregates: distinct-by-"
        "first-occurrence (min event date per user — the same "
        "first-occurrence attribution as q_ngram_novelty), then "
        "hourly new-user counts, then a running sum over the HOURLY "
        "frame only. At 100 TB the two aggregates shuffle user-keyed "
        "and hour-keyed; the final window moves one row per calendar "
        "hour — calendar-bounded metadata, allowlisted like "
        "q_mixture_weights' |sources| frame. Integer counts: bitwise.",
)
def q_cumulative_distinct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("hour", "ts")).alias("hour")
    )
    hourly = first.groupBy("hour").agg(F.count("*").alias("n_new_users"))
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    return hourly.withColumn("cum_users", F.sum("n_new_users").over(w))

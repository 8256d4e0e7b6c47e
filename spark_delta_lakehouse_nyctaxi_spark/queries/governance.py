"""Governance-surface queries: the DQ framework's single-pass check
evaluation and partition-pruned reads, both oracle-verified."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..quality import DataQualityFramework
from ..sources.readers import load_table
from ..sources.table import VersionedTable
from .merge import scratch_dir
from . import register


@register(
    "q_dq_checks",
    """
    SELECT * FROM (
        SELECT 'range_l_quantity' AS check_name,
               CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS violation_count,
               COUNT(*) AS total_rows
        FROM lineitem
        UNION ALL
        SELECT 'range_l_discount',
               CAST(SUM(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(*)
        FROM lineitem
        UNION ALL
        SELECT 'null_l_shipdate',
               CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(*)
        FROM lineitem
    )
    """,
    doc="The DQ framework's fused single-pass check evaluation "
        "(quality.py; reference utils/data_quality.py:86-267) surfaced "
        "as a query: 3 checks, ONE scan, results as rows.",
)
def q_dq_checks(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    fw = DataQualityFramework()
    fw.add_range_check("l_quantity", 1, 50)
    fw.add_range_check("l_discount", 0.0, 0.1)
    fw.add_null_check("l_shipdate")
    results = fw.run_all_checks(li)
    total = li.count()
    rows = [(r.check_name, r.violation_count, total) for r in results]
    return spark.createDataFrame(
        rows, "check_name string, violation_count long, total_rows long"
    )


@register(
    "q_partition_pruning",
    """
    SELECT o_orderkey, o_totalprice,
           CAST(YEAR(o_orderdate) AS INTEGER) AS order_year
    FROM orders
    WHERE YEAR(o_orderdate) IN (1996, 1997)
    """,
    doc="Partition-pruned scan through the storage layer: orders written "
        "partitioned by year, then filtered — only 2 of 7 partition dirs "
        "are read (PartitionFilters asserted in tests/test_plans.py).",
)
def q_partition_pruning(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("int")
    )
    t = VersionedTable(spark, scratch_dir("partpr"))
    t.write(
        orders.select("o_orderkey", "o_totalprice", "order_year"),
        mode="overwrite",
        partition_by=["order_year"],
    )
    return t.read().filter(F.col("order_year").isin(1996, 1997))

"""Bucketed co-located joins: zero shuffle exchanges, same results."""

from __future__ import annotations

import os
import pytest
from pyspark.sql import functions as F

from spark_delta_lakehouse_nyctaxi_spark import plans as P
from spark_delta_lakehouse_nyctaxi_spark.sources.bucketing import bucketed_join, write_bucketed
from spark_delta_lakehouse_nyctaxi_spark.sources.readers import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "orders_b", "o_orderkey", 4)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", "o_orderkey", 4
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the join strategy is SMJ over buckets
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "o_orderkey")
        assert P.exchange_count(joined) == 0, P.explain_str(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, "o_orderkey")
    n = joined.count()
    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem")
    expected = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    assert n == expected > 0


def test_range_layout_files_are_disjoint(spark, tmp_path):
    """repartitionByRange + sortWithinPartitions must yield files whose
    l_shipdate [min,max] ranges don't overlap (boundary ties aside) —
    that disjointness is what lets parquet min/max stats prune a
    time-window scan to O(window) files instead of O(table)."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from spark_delta_lakehouse_nyctaxi_spark.sources.readers import load_table
    from tests.conftest import SF_SMALL

    path = str(tmp_path / "range_layout")
    (
        load_table(spark, SF_SMALL, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .repartitionByRange(6, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    ranges = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, f))
        col = md.row_group(0).column(1)  # l_shipdate
        lo = col.statistics.min
        hi = md.row_group(md.num_row_groups - 1).column(1).statistics.max
        ranges.append((lo, hi))
    ranges.sort()
    assert len(ranges) >= 4
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert lo_next >= hi_prev, f"overlapping file ranges: {hi_prev} > {lo_next}"


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    """Z-ordered files must be selective on BOTH clustered columns:
    for a mid-range point on each column, the fraction of files whose
    [min,max] admits it stays well under 1 (a single-column sort would
    admit ~all files on the second column)."""
    import pyarrow.parquet as pq
    from spark_delta_lakehouse_nyctaxi_spark.sources.zorder import write_zordered
    from spark_delta_lakehouse_nyctaxi_spark.sources.readers import load_table
    from tests.conftest import SF_SMALL

    path = str(tmp_path / "z")
    l = load_table(spark, SF_SMALL, "lineitem").select("l_partkey", "l_suppkey")
    write_zordered(l, path, ["l_partkey", "l_suppkey"], num_files=16)

    spans = {"l_partkey": [], "l_suppkey": []}
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, f))
        schema_names = [md.row_group(0).column(i).path_in_schema for i in range(2)]
        for i, name in enumerate(schema_names):
            lo = min(md.row_group(g).column(i).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(i).statistics.max for g in range(md.num_row_groups))
            spans[name].append((lo, hi))
    assert len(spans["l_partkey"]) >= 8

    stats = l.agg(
        F.expr("percentile(l_partkey, 0.5)").alias("p"),
        F.expr("percentile(l_suppkey, 0.5)").alias("s"),
    ).collect()[0]
    for col, point in [("l_partkey", stats.p), ("l_suppkey", stats.s)]:
        n = len(spans[col])
        admitted = sum(1 for lo, hi in spans[col] if lo <= point <= hi)
        assert admitted / n <= 0.75, f"{col}: {admitted}/{n} files admit the midpoint"


def test_hilbert_curve_certified_and_prunes(spark, tmp_path):
    """r5: (1) the column-expression Hilbert index equals the classic
    xy2d reference on every cell of the full grid (bijection onto
    0..4^ORDER-1); (2) Hilbert-clustered files are selective on BOTH
    clustered columns, same contract as the Z-order test."""
    import pyarrow.parquet as pq
    from spark_delta_lakehouse_nyctaxi_spark.sources.hilbert import (
        ORDER,
        hilbert_value,
        hilbert_xy2d,
        write_hilbert_clustered,
    )
    from spark_delta_lakehouse_nyctaxi_spark.sources.readers import load_table
    from tests.conftest import SF_SMALL

    side = 1 << ORDER
    grid = spark.createDataFrame(
        [(x, y) for x in range(side) for y in range(side)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["h"]
        for r in grid.withColumn("h", hilbert_value(grid, ["x", "y"])).collect()
    }
    assert all(
        got[(x, y)] == hilbert_xy2d(ORDER, x, y)
        for x in range(side)
        for y in range(side)
    )
    assert sorted(got.values()) == list(range(side * side))  # bijection

    path = str(tmp_path / "h")
    l = load_table(spark, SF_SMALL, "lineitem").select("l_partkey", "l_suppkey")
    write_hilbert_clustered(l, path, ["l_partkey", "l_suppkey"], num_files=16)

    spans = {"l_partkey": [], "l_suppkey": []}
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, f))
        schema_names = [md.row_group(0).column(i).path_in_schema for i in range(2)]
        for i, name in enumerate(schema_names):
            lo = min(md.row_group(g).column(i).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(i).statistics.max for g in range(md.num_row_groups))
            spans[name].append((lo, hi))
    assert len(spans["l_partkey"]) >= 8

    stats = l.agg(
        F.expr("percentile(l_partkey, 0.5)").alias("p"),
        F.expr("percentile(l_suppkey, 0.5)").alias("s"),
    ).collect()[0]
    for col, point in [("l_partkey", stats.p), ("l_suppkey", stats.s)]:
        n = len(spans[col])
        admitted = sum(1 for lo, hi in spans[col] if lo <= point <= hi)
        assert admitted / n <= 0.75, f"{col}: {admitted}/{n} files admit the midpoint"

"""Bucketed tables — co-located, shuffle-free joins.

At 100 TB the dominant cost of fact⋈fact joins (lineitem⋈orders) is
shuffling both sides on the join key. Writing both tables bucketed by
that key with the same bucket count lets Spark plan a sort-merge join
with NO exchange on either side: each task reads matching bucket files
directly.

Bucketing requires the session catalog (``saveAsTable``) — bucket
metadata lives in the catalog, not the parquet files. Works with the
default in-memory catalog; on a cluster this would be the shared
metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """``path`` makes the table EXTERNAL at that location — required
    when the session's warehouse dir (defaults to ``$cwd``) may not be
    writable, e.g. the driver's plain session from a foreign cwd."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.sortBy(sort_col or bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables — plans with zero
    exchanges (asserted in tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)

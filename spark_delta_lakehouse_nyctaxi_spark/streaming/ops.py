"""Structured Streaming operators.

The reference has NO streaming (SURVEY.md §2.9); its incremental path is
a batch high-water-mark (utils/incremental.py). These are the idiomatic
Structured Streaming upgrades the survey plans: file-source streams,
watermarked tumbling/sliding/session window aggregations,
dropDuplicatesWithinWatermark, and foreachBatch MERGE into a
VersionedTable (exactly-once-per-batch upsert semantics).

Everything is a declarative streaming DataFrame graph — at scale the
same code runs continuous microbatches over cluster storage; tests use
trigger(availableNow=True) for deterministic drains.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..sources.table import VersionedTable


def read_parquet_stream(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """File-source stream (the streaming analog of the reference's batch
    CSV/Delta scans). Schema must be declared — file streams don't
    infer."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_aggregation(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    aggs: list,
    group_cols: list[str] | None = None,
    slide: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling (or sliding, with ``slide``) window
    aggregation — the streaming upgrade of gold's groupBy(date) KPIs."""
    win = (
        F.window(ts_col, window_duration, slide)
        if slide
        else F.window(ts_col, window_duration)
    )
    return (
        df.withWatermark(ts_col, watermark_delay)
        .groupBy(win.alias("win"), *(group_cols or []))
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *(group_cols or []),
            *[F.col(c) for c in _agg_names(aggs)],
        )
    )


def _agg_names(aggs: list) -> list[str]:
    # Column aliases are the last name segment in the expression string.
    import re

    names = []
    for a in aggs:
        m = re.search(r"AS (\w+)", str(a._jc.toString()) if hasattr(a, "_jc") else str(a))
        names.append(m.group(1) if m else str(a))
    return names


def session_aggregation(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str],
    aggs: list,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Session-window aggregation (dynamic gap-based windows)."""
    return (
        df.withWatermark(ts_col, watermark_delay)
        .groupBy(F.session_window(ts_col, gap).alias("win"), *group_cols)
        .agg(*aggs)
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            *group_cols,
            *[F.col(c) for c in _agg_names(aggs)],
        )
    )


def stream_dedup(
    df: DataFrame, keys: list[str], ts_col: str, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """Streaming dedup bounded by the watermark — the streaming analog
    of silver's dropDuplicates (etl/silver_job.py:205)."""
    return df.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(keys)


def foreach_batch_merge(
    table: VersionedTable, keys: list[str]
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink performing a MERGE upsert per microbatch — the
    streaming analog of merge_incremental_data
    (utils/incremental.py:89-156)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.merge(batch_df, keys=keys)

    return _sink


def run_available_now(
    sdf: DataFrame,
    checkpoint: str,
    foreach_batch: Callable | None = None,
    memory_table: str | None = None,
    output_mode: str = "append",
):
    """Drain all available input deterministically (test/batch-catchup
    trigger), into either a foreachBatch sink or an in-memory table."""
    w = sdf.writeStream.option("checkpointLocation", checkpoint).trigger(availableNow=True)
    if foreach_batch is not None:
        q = w.foreachBatch(foreach_batch).outputMode(output_mode).start()
    else:
        q = w.format("memory").queryName(memory_table).outputMode(output_mode).start()
    q.awaitTermination()
    return q

"""Streaming queries in the verification registry: a real Structured
Streaming pipeline (file source → watermark → window agg → sink),
drained deterministically with availableNow and verified against a SQL
oracle — a finite stream in complete mode must equal the batch answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.readers import load_table
from ..streaming import read_parquet_stream, run_available_now, stream_dedup
from .merge import scratch_dir
from . import register

# Streaming watermarks require TIMESTAMP (LTZ) event time — NTZ is
# rejected by withWatermark. The staged parquet's NTZ micros are read
# under the declared LTZ schema; with the session pinned to UTC the
# wall-clock values are identical to the batch/oracle view.
_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _staged_events(spark, sf_dir: str) -> str:
    path = scratch_dir("stream_events")
    load_table(spark, sf_dir, "events").drop("props").coalesce(4).write.mode(
        "overwrite"
    ).parquet(path)
    return path


@register(
    "q_stream_window",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(22,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    """,
    doc="Structured Streaming watermarked 1-hour tumbling window over a "
        "file-source stream, drained with availableNow (complete mode) — "
        "must equal the batch/time_bucket answer exactly.",
)
def q_stream_window(spark, sf_dir):
    path = _staged_events(spark, sf_dir)
    sdf = read_parquet_stream(spark, path, _SCHEMA)
    agg = (
        sdf.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(22,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("win.start").alias("window_start"), "n_events", "sum_value")
    )
    run_available_now(
        agg, scratch_dir("ckpt_win"), memory_table="q_stream_window_out", output_mode="complete"
    )
    return spark.table("q_stream_window_out")


@register(
    "q_stream_dedup",
    None,  # survivor choice depends on microbatch arrival order → rows-only
    doc="Streaming dropDuplicatesWithinWatermark on user_id over the "
        "event stream; pytest asserts the invariants (≥ distinct users, "
        "< total rows).",
)
def q_stream_dedup(spark, sf_dir):
    path = _staged_events(spark, sf_dir)
    sdf = read_parquet_stream(spark, path, _SCHEMA)
    deduped = stream_dedup(sdf, ["user_id"], "ts", "5 minutes")
    run_available_now(
        deduped, scratch_dir("ckpt_dd"), memory_table="q_stream_dedup_out"
    )
    return spark.table("q_stream_dedup_out")

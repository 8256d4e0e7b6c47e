"""Structured Streaming: windowed aggs match the batch equivalent,
watermarked dedup, foreachBatch MERGE into a VersionedTable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_delta_lakehouse_nyctaxi_spark.sources.readers import load_table
from spark_delta_lakehouse_nyctaxi_spark.sources.table import VersionedTable
from spark_delta_lakehouse_nyctaxi_spark.streaming import (
    foreach_batch_merge,
    read_parquet_stream,
    run_available_now,
    stream_dedup,
    windowed_aggregation,
)
from tests.conftest import SF_SMALL

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events (nanos → us already handled by load_table) written as a
    streamable parquet dir."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, SF_SMALL, "events").drop("props").coalesce(2).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_windowed_agg_matches_batch(spark, events_dir, tmp_path):
    sdf = read_parquet_stream(spark, events_dir, SCHEMA)
    agg = windowed_aggregation(
        sdf,
        "ts",
        "1 hour",
        aggs=[F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")],
        watermark_delay="1 minute",
    )
    # complete mode: a finite availableNow drain emits every window
    # (append mode would hold back windows past the final watermark)
    run_available_now(agg, str(tmp_path / "ckpt"), memory_table="win_agg", output_mode="complete")
    got = {
        (r.window_start, r.n, r.sum_value)
        for r in spark.table("win_agg").collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("win.start").alias("window_start"), "n", "sum_value")
    )
    want = {(r.window_start, r.n, r.sum_value) for r in batch.collect()}
    # availableNow + watermark drops no complete windows on a finite drain
    assert got == want and len(got) > 0


def test_stream_dedup_within_watermark(spark, events_dir, tmp_path):
    sdf = read_parquet_stream(spark, events_dir, SCHEMA)
    deduped = stream_dedup(sdf, ["user_id"], "ts", "5 minutes")
    run_available_now(deduped, str(tmp_path / "ckpt2"), memory_table="dedup_out")
    n_users = spark.read.parquet(events_dir).select("user_id").distinct().count()
    got = spark.table("dedup_out").count()
    # at most one surviving row per user within the watermark horizon;
    # at least every distinct user appears once
    assert got >= n_users
    assert got < spark.read.parquet(events_dir).count()


def test_foreach_batch_merge_upserts(spark, events_dir, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    sdf = read_parquet_stream(spark, events_dir, SCHEMA).select(
        "user_id", "ts", "value", "event_type"
    )
    # keep latest row per user per microbatch via dedup, then MERGE
    latest = stream_dedup(sdf, ["user_id"], "ts", "5 minutes")
    run_available_now(
        latest, str(tmp_path / "ckpt3"), foreach_batch=foreach_batch_merge(t, ["user_id"])
    )
    out = t.read()
    assert out.count() == out.select("user_id").distinct().count()
    assert t.history(1)[0]["operation"] in ("MERGE", "WRITE")


def test_stream_dedup_det_matches_batch(spark, tmp_path):
    """Deterministic streaming dedup (min-(ts,event_id) survivor via
    conditional foreachBatch MERGE) equals the batch window answer."""
    from spark_delta_lakehouse_nyctaxi_spark.queries.streaming_queries import (
        q_stream_dedup_det,
    )
    from pyspark.sql.window import Window

    got = {tuple(r) for r in q_stream_dedup_det(spark, SF_SMALL).collect()}
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = (
        load_table(spark, SF_SMALL, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    assert got == {tuple(r) for r in batch.collect()}


def test_stream_stream_left_join_matches_batch(spark, tmp_path):
    """LEFT OUTER stream-stream join: inner pairs equal the batch
    self-join; null-padded rows are exactly the unmatched clicks whose
    click_ts fell below the final global watermark
    (min(max click_ts, max view_ts) - 30min)."""
    from spark_delta_lakehouse_nyctaxi_spark.queries.streaming_queries import (
        q_stream_stream_left_join,
    )

    out = q_stream_stream_left_join(spark, SF_SMALL)
    ev = load_table(spark, SF_SMALL, "events")
    c = ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    v = ev.filter("event_type = 'view'").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    inner = c.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("view_ts") <= F.col("click_ts")),
    )
    want_inner = {(r.click_id, r.view_id) for r in inner.collect()}
    got_inner = {
        (r.click_id, r.view_id) for r in out.filter("view_id IS NOT NULL").collect()
    }
    assert got_inner == want_inner

    wm_row = c.agg(F.max("click_ts").alias("mc")).crossJoin(
        v.agg(F.max("view_ts").alias("mv"))
    ).select(
        F.expr("least(mc, mv) - INTERVAL 30 MINUTES").alias("w")
    ).collect()[0]
    unmatched = {
        r.click_id
        for r in c.join(inner.select("click_id"), "click_id", "left_anti")
        .filter(F.col("click_ts") < F.lit(wm_row.w))
        .collect()
    }
    got_null = {r.click_id for r in out.filter("view_id IS NULL").collect()}
    assert got_null == unmatched


def test_rocksdb_state_store_windowed_agg(spark, tmp_path):
    """The RocksDB state store provider (the 100 TB state backend —
    state spills to local disk + changelog instead of living on the
    JVM heap) runs the watermarked window agg and produces the same
    answer as the default provider."""
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        path = str(tmp_path / "ev")
        load_table(spark, SF_SMALL, "events").drop("props").coalesce(2).write.mode(
            "overwrite"
        ).parquet(path)
        sdf = read_parquet_stream(
            spark, path,
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        agg = (
            sdf.withWatermark("ts", "1 minute")
            .groupBy(F.window("ts", "1 hour").alias("win"))
            .agg(F.count("*").alias("n"))
            .select(F.col("win.start").alias("ws"), "n")
        )
        run_available_now(
            agg, str(tmp_path / "ckpt"), memory_table="rocks_out", output_mode="complete"
        )
        got = {(r.ws, r.n) for r in spark.table("rocks_out").collect()}
        want = {
            (r.ws, r.n)
            for r in load_table(spark, SF_SMALL, "events")
            .groupBy(F.date_trunc("hour", "ts").alias("ws"))
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == want
    finally:
        if old is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, old)


def test_stream_checkpoint_resume_reads_only_new_files(spark, tmp_path):
    """Exactly-once across restarts: a second availableNow drain from
    the SAME checkpoint must process only files that appeared after
    the first drain — the file-source offset log is the resume
    contract an incremental 100 TB ingest depends on."""
    ev = load_table(spark, SF_SMALL, "events").drop("props")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ev.filter("event_id < 500").coalesce(1).write.mode("overwrite").parquet(src)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    seen: list[set] = []

    def drain():
        batch_ids: set = set()
        seen.append(batch_ids)

        def sink(batch_df, batch_id):
            batch_ids.update(r.event_id for r in batch_df.select("event_id").collect())

        run_available_now(
            read_parquet_stream(spark, src, schema), ckpt, foreach_batch=sink
        )

    drain()
    first = set(seen[0])
    assert len(first) == 500

    # new file appears; resume from the same checkpoint
    ev.filter("event_id >= 500 AND event_id < 800").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()
    second = set(seen[1])
    assert len(second) == 300 and second.isdisjoint(first)


def test_late_data_dropped_across_checkpointed_restarts(spark, tmp_path):
    """The watermark persists in the checkpoint: an event arriving in a
    LATER run, older than the carried watermark, is dropped — its
    already-finalized window never re-emits — while in-horizon state
    (the 11:00 window) still closes correctly."""
    import datetime as dt

    d = str(tmp_path / "late_in")
    ck = str(tmp_path / "late_ckpt")
    ts = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    rows1 = [
        (1, ts(10, 5), 1, "view", 1.0),
        (2, ts(10, 30), 2, "view", 1.0),
        (3, ts(11, 15), 3, "view", 1.0),
        (4, ts(12, 0), 4, "view", 1.0),
    ]
    spark.createDataFrame(rows1, SCHEMA).coalesce(1).write.mode("append").parquet(d)
    agg_of = lambda: windowed_aggregation(  # noqa: E731
        read_parquet_stream(spark, d, SCHEMA),
        "ts",
        "1 hour",
        aggs=[F.count("*").alias("n")],
        watermark_delay="1 minute",
    )
    emitted1 = []
    run_available_now(
        agg_of(), ck,
        foreach_batch=lambda df, bid: emitted1.extend(df.collect()),
    )
    got1 = {(r.window_start.hour, r.n) for r in emitted1}
    # final watermark 11:59 → only the 10:00 window has closed
    assert got1 == {(10, 2)}

    rows2 = [
        (5, ts(9, 10), 5, "view", 1.0),   # LATE: before the carried watermark
        (6, ts(13, 0), 6, "view", 1.0),   # advances the watermark past 12:00
    ]
    spark.createDataFrame(rows2, SCHEMA).coalesce(1).write.mode("append").parquet(d)
    emitted2 = []
    run_available_now(
        agg_of(), ck,
        foreach_batch=lambda df, bid: emitted2.extend(df.collect()),
    )
    got2 = {(r.window_start.hour, r.n) for r in emitted2}
    # the 11:00 window (state carried from run 1) closes with its one
    # event; the 09:00 late event produces NOTHING, ever
    assert got2 == {(11, 1)}
    assert not any(h == 9 for h, _ in got1 | got2)

"""Round-10 gates.

1. q_lsh_band_curve / q_lsh_recall must never materialize the exact
   Jaccard truth PAIR SET on the driver (VERDICT r9's only `weak`):
   the pair count is data-dependent, so a collect + literal_frame
   re-broadcast is a driver-OOM at 100 TB.  The gate spies on
   literal_frame during execution and rejects any call whose row count
   could scale with the data (only the constant 4-config seed frame is
   allowed), and asserts the memoized truth artifact is a DataFrame,
   not collected rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame

from spark_delta_lakehouse_nyctaxi_spark.queries import REGISTRY
from spark_delta_lakehouse_nyctaxi_spark.queries import dedup as d
from spark_delta_lakehouse_nyctaxi_spark.operators import local_frames

SF = "/root/testdata/sf0.001"


def test_lsh_band_curve_truth_path_never_hits_driver(spark, monkeypatch):
    calls: list[int] = []
    real = local_frames.literal_frame

    def spy(s, rows, schema):
        rows = list(rows)
        calls.append(len(rows))
        return real(s, rows, schema)

    monkeypatch.setattr(local_frames, "literal_frame", spy)
    d._LSH_TRUTH_MEMO.clear()
    try:
        out = REGISTRY["q_lsh_band_curve"].fn(spark, SF)
        assert out.count() == len(d._BAND_CONFIGS)
        # the only driver-side relation allowed on this path is the
        # constant band-config seed (one row per config)
        assert calls, "expected the 4-row config seed frame"
        assert max(calls) <= len(d._BAND_CONFIGS), (
            f"data-sized literal_frame on the truth path: {calls} — the "
            "exact-truth pair set must stay distributed"
        )
        # the memo holds the distributed frame, not collected scalars
        truth_vals = [
            v for k, v in d._LSH_TRUTH_MEMO.items()
            if k and k[0] == "jaccard_truth_frame"
        ]
        assert truth_vals and all(
            isinstance(v, DataFrame) for v in truth_vals
        )
        assert not any(
            isinstance(v, list) for v in d._LSH_TRUTH_MEMO.values()
        ), "collected truth rows found in _LSH_TRUTH_MEMO"
    finally:
        d._LSH_TRUTH_MEMO.clear()


def test_repeated_phrases_survives_short_docs(spark, tmp_path):
    """ADVICE r9 (medium): sub-8-token docs made the unguarded
    sequence(1, size-7) descend to [1, 0] and slice(t, 0, 8) throw
    INVALID_PARAMETER_VALUE.START; the oracle's range() is simply
    empty there.  Guarded now — a corpus with 1/7/8/9-token docs must
    run, count windows only for the ≥8-token docs, and still find the
    repeated phrase."""
    phrase8 = "a b c d e f g h"
    rows = [
        (1, "x", "en", "s", 1),             # 1 token → 0 windows
        (2, "one two three four five six seven", "en", "s", 1),  # 7 → 0
        (3, phrase8, "en", "s", 1),          # 8 tokens → 1 window
        (4, phrase8 + " i", "en", "s", 1),   # 9 tokens → 2 windows
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "sfshort")
    df.coalesce(1).write.parquet(d + "/documents.parquet")
    out = REGISTRY["q_repeated_phrases"].fn(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.phrase == phrase8
    assert r.n_occurrences == 2 and r.n_docs == 2
    assert r.n_windows == 3  # 0 + 0 + 1 + 2


def test_unigram_segments_raises_past_maxw(spark, tmp_path):
    """ADVICE r9 (low): words longer than _UNI_MAXW silently diverge
    in the oracle's unrolled backtrack — the Spark side must refuse
    loudly instead."""
    from spark_delta_lakehouse_nyctaxi_spark.queries import text as t

    rows = [(1, "short butverylongword here", "en", "s", 1)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "sflong")
    df.coalesce(1).write.parquet(d + "/documents.parquet")
    with pytest.raises(ValueError, match="_UNI_MAXW"):
        t._unigram_segments(spark, d)


def test_substr_base_index_persists_across_sessions(spark):
    """VERDICT r9 item 7: the ExactSubstr base index is a durable
    VersionedTable artifact.  A TABLE-LOADED incremental run (memos
    cleared, so the state can only come from the artifact) must equal
    the from-scratch full rebuild position-by-position, and the second
    call must LOAD rather than rebuild."""
    import shutil

    from spark_delta_lakehouse_nyctaxi_spark.queries import suffix as sx

    shutil.rmtree(sx._SUBSTR_INDEX_ROOT, ignore_errors=True)
    try:
        # cold: builds and persists
        t, cut = sx.base_index_table(spark, SF)
        assert t.exists()
        v0 = t.history()[0]["version"] if t.history() else 0
        # simulate a NEW session: wipe the in-process memo so the base
        # state can only come from the persisted table
        sx._SA_MEMO.clear()
        merged, cert, cut2 = sx.incremental_dup_lens(spark, SF)
        assert cut2 == cut
        inc = sorted(map(tuple, merged.collect()))
        reb = sorted(map(tuple, sx.position_dup_lens(spark, SF).collect()))
        assert inc == reb
        # the loaded path must not have written a new version
        t2, _ = sx.base_index_table(spark, SF)
        versions = [h["version"] for h in t2.history()]
        assert max(versions) == v0, "second call rebuilt instead of loading"
    finally:
        shutil.rmtree(sx._SUBSTR_INDEX_ROOT, ignore_errors=True)


def test_lsh_recall_shares_distributed_truth(spark, monkeypatch):
    calls: list[int] = []
    real = local_frames.literal_frame

    def spy(s, rows, schema):
        rows = list(rows)
        calls.append(len(rows))
        return real(s, rows, schema)

    monkeypatch.setattr(local_frames, "literal_frame", spy)
    d._LSH_TRUTH_MEMO.clear()
    try:
        out = REGISTRY["q_lsh_recall"].fn(spark, SF).collect()
        assert len(out) == 1
        assert not calls or max(calls) <= len(d._BAND_CONFIGS), (
            f"data-sized literal_frame in q_lsh_recall: {calls}"
        )
    finally:
        d._LSH_TRUTH_MEMO.clear()

"""Targeted property gates for the round-8 changes — the FWHT
butterfly's bitwise equivalence to the sign fan-out it replaced, the
_memo purity boundary (VERDICT r7 item 8), the atomic txn-commit
pattern in q_stream_packing (ADVICE r7 medium), and the realized-k KMV
estimator (ADVICE r7 low)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_delta_lakehouse_nyctaxi_spark.queries import REGISTRY
from tests.conftest import SF_SMALL


def q(name, spark):
    return REGISTRY[name].fn(spark, SF_SMALL)


def test_fwht_butterfly_equals_sign_fanout(spark):
    """The d·log d butterfly must be BITWISE equal to the n·d² exploded
    sign-sum it replaced in q_pq_rotation: y_j = Σ_i sign(i,j)·q_i over
    int64 units, re-derived here via the explicit popcount fan-out."""
    from spark_delta_lakehouse_nyctaxi_spark.operators.similarity import (
        fwht_long_array,
    )
    from spark_delta_lakehouse_nyctaxi_spark.sources.readers import load_table

    d = 64
    factor = 10**7
    units = (
        load_table(spark, SF_SMALL, "embeddings")
        .limit(50)
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: (
                    (x.cast("double") * F.lit(0.125)).cast("decimal(16,7)")
                    * F.lit(factor)
                ).cast("long"),
            ).alias("q"),
        )
        .localCheckpoint(eager=True)
    )
    fast = units.select(
        "vec_id", fwht_long_array(F.col("q"), d).alias("t")
    ).select("vec_id", F.posexplode("t").alias("p", "t"))
    slow = (
        units.select("vec_id", F.posexplode("q").alias("i0", "x"))
        .select(
            "vec_id",
            "i0",
            "x",
            F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("p"),
        )
        .groupBy("vec_id", "p")
        .agg(
            F.sum(
                F.when(
                    F.bit_count(F.expr("i0 & p")) % 2 == 0, F.col("x")
                ).otherwise(-F.col("x"))
            ).alias("t")
        )
    )
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0


def test_fwht_rejects_non_power_of_two():
    import pytest

    from spark_delta_lakehouse_nyctaxi_spark.operators.similarity import (
        fwht_long_array,
    )

    with pytest.raises(ValueError):
        fwht_long_array(F.col("x"), 48)


def test_memo_is_pure_perf_artifact(spark):
    """VERDICT r7 item 8: process-global memos (_RECALL_MEMO) carry
    trained frames/codebooks across queries in one session — the cache
    must never change RESULTS.  Run a memo-consuming query with a
    cleared memo, snapshot, run again fully warm, and assert bitwise
    equality (collected and compared as sorted row tuples)."""
    from spark_delta_lakehouse_nyctaxi_spark.queries import similarity as S

    saved = dict(S._RECALL_MEMO)
    try:
        S._RECALL_MEMO.clear()
        cold = sorted(map(tuple, q("q_pq_recall", spark).collect()))
        assert S._RECALL_MEMO, "q_pq_recall should populate the memo"
        warm = sorted(map(tuple, q("q_pq_recall", spark).collect()))
        assert cold == warm
        # and the memo key embeds sf_dir, so another SF can never alias
        for key in S._RECALL_MEMO:
            assert any(
                isinstance(part, str) and "/testdata/" in part
                for part in key
            ), f"memo key {key!r} does not pin its sf_dir"
    finally:
        S._RECALL_MEMO.clear()
        S._RECALL_MEMO.update(saved)


def test_stream_packing_commits_are_atomic(spark):
    """ADVICE r7 medium: placements, the (app_id, batch_id) txn marker
    and the advanced token offset must land in ONE VersionedTable
    commit — every data commit of the output table carries the txn
    marker plus a pack_base equal to the committed token total, and
    replaying any committed batch id is a no-op by the marker."""
    import glob
    import json
    import os

    from spark_delta_lakehouse_nyctaxi_spark.queries.merge import SCRATCH_ROOT

    before = set(glob.glob(os.path.join(SCRATCH_ROOT, "pack_out-*")))
    out = q("q_stream_packing", spark)
    total = out.agg(F.sum("n_tokens")).collect()[0][0]
    new = set(glob.glob(os.path.join(SCRATCH_ROOT, "pack_out-*"))) - before
    assert len(new) == 1
    log_files = sorted(
        lf
        for lf in glob.glob(os.path.join(new.pop(), "_vlog", "*.json"))
        if os.path.basename(lf)[:-5].isdigit()
    )
    assert len(log_files) == 4  # one commit per micro-batch, nothing else
    bases, versions = [], []
    for lf in log_files:
        info = json.load(open(lf))
        extra = info.get("extra", {})
        txn = extra.get("txn")
        assert txn and txn["app_id"] == "q_stream_packing"
        versions.append(txn["version"])
        bases.append(extra["pack_base"])
    assert versions == sorted(versions)
    assert bases == sorted(bases)
    assert bases[-1] == total  # the final committed offset IS the total


def test_stream_count_min_equals_batch(spark):
    """The guarded-additive corner of the streaming-sketch taxonomy:
    integer counter addition is exact and associative, so the drained
    streaming sketch must probe BITWISE equal to the one-shot batch
    q_count_min at the same top-20 heavy keys — and the txn guard is
    what makes that claim survive replay (refresh_aggregate skips
    batch ids ≤ the committed marker)."""
    stream = q("q_stream_count_min", spark)
    batch = q("q_count_min", spark)
    assert stream.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream).count() == 0


def test_kmv_estimate_uses_realized_k(spark):
    """ADVICE r7 low: on a corpus with fewer distinct shingles than the
    configured k=256, the estimator must use the realized k (and then
    (k−1)·2^60/h_(k) estimates a k-sample of itself)."""
    from spark_delta_lakehouse_nyctaxi_spark.queries.sketches import _KMV_K

    r = q("q_kmv_distinct", spark).collect()[0]
    assert r.est_distinct == (r.k - 1) * float(2**60) / r.kth_hash
    assert r.k <= _KMV_K


def test_suffix_array_memo_is_pure_perf_artifact(spark):
    """Same boundary as test_memo_is_pure_perf_artifact for the round-8
    _SA_MEMO: the cached prefix-doubling frames must never change
    results, and the memo key must pin both sf_dir AND the Spark
    applicationId (the frames are localCheckpoints — they die with
    their session, so a key that survives the session would serve dead
    RDDs to a new one)."""
    from spark_delta_lakehouse_nyctaxi_spark.queries import suffix as X

    saved = dict(X._SA_MEMO)
    try:
        X._SA_MEMO.clear()
        cold = sorted(map(tuple, q("q_lcp_stats", spark).collect()))
        assert X._SA_MEMO, "q_lcp_stats should populate the SA memo"
        warm = sorted(map(tuple, q("q_lcp_stats", spark).collect()))
        assert cold == warm
        app_id = spark.sparkContext.applicationId
        for key in X._SA_MEMO:
            assert any(
                isinstance(p, str) and "/testdata/" in p for p in key
            ), f"SA memo key {key!r} does not pin its sf_dir"
            assert app_id in key, f"SA memo key {key!r} does not pin the session"
    finally:
        X._SA_MEMO.clear()
        X._SA_MEMO.update(saved)


def test_suffix_array_rank_is_permutation(spark):
    """The prefix-doubling build must end with fully distinct ranks
    forming exactly 1..n (the inverse suffix array) — the structural
    fact both result certificates quantify over."""
    from spark_delta_lakehouse_nyctaxi_spark.queries.suffix import (
        build_suffix_array,
    )

    sa, levels, n = build_suffix_array(spark, SF_SMALL)
    row = sa.agg(
        F.countDistinct("r").alias("d"),
        F.min("r").alias("lo"),
        F.max("r").alias("hi"),
        F.count("*").alias("c"),
    ).first()
    assert (row.d, row.lo, row.hi, row.c) == (n, 1, n, n)
    # levels are strictly doubling prefix lengths starting at 1
    bs = [b for b, _ in levels]
    assert bs == [2**i for i in range(len(bs))]


def test_distributed_prefix_max_matches_window(spark):
    """The interval-union primitive must equal the single-partition
    running-max window it replaces, including the LONG_MIN empty-prefix
    convention, under a multi-partition range layout."""
    from pyspark.sql import Window

    from spark_delta_lakehouse_nyctaxi_spark.operators.indexing import (
        distributed_prefix_max,
    )

    rows = [(i, ((i * 37) % 101) - 50) for i in range(1000)]
    df = spark.createDataFrame(rows, "g long, v long")
    got = {
        r.g: r.cm
        for r in distributed_prefix_max(
            df, ["g"], "v", "cm", num_partitions=7
        ).collect()
    }
    w = Window.orderBy("g").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.g: r.cm
        for r in df.withColumn("cm", F.max("v").over(w)).collect()
    }
    assert got == want


def test_exact_substr_dedup_consistency(spark):
    """Structural invariants of the ExactSubstr certificate: covered
    positions at least cover every span start; retained + covered =
    all; max_span_len equals q_lcp_stats' max_lcp (same LCP array)."""
    r = q("q_exact_substr_dedup", spark).collect()[0]
    s = q("q_lcp_stats", spark).collect()[0]
    assert r.n_covered >= r.n_spans
    assert r.retained_tokens + r.n_covered == r.n_positions
    assert r.max_span_len == s.max_lcp
    assert (r.n_spans == 0) == (r.n_covered == 0)


def test_distributed_grouped_rank_matches_window(spark):
    """The grouped-rank kernel (one ranged pass, no hash window) must
    equal min(row_number) OVER (PARTITION BY keys) exactly — including
    groups spanning range-partition boundaries (few distinct keys,
    many partitions) and singleton tails, for long AND string keys."""
    from pyspark.sql import Window

    from spark_delta_lakehouse_nyctaxi_spark.operators.indexing import (
        distributed_grouped_rank,
        global_row_number,
    )

    rows = [(i % 7, (i * 13) % 3, i) for i in range(5000)] + [
        (100 + i, 0, 10000 + i) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "k1 long, k2 long, g long")
    got = {
        r.g: r.r
        for r in distributed_grouped_rank(
            df, ["k1", "k2"], ["g"], "r", num_partitions=11
        ).collect()
    }
    ref = {
        r.g: r.r
        for r in global_row_number(df, ["k1", "k2", "g"], "rid")
        .withColumn("r", F.min("rid").over(Window.partitionBy("k1", "k2")))
        .collect()
    }
    assert got == ref

    rows2 = [("tok%02d" % (i % 5), i) for i in range(1000)]
    df2 = spark.createDataFrame(rows2, "tok string, g long")
    got2 = {
        r.g: r.r
        for r in distributed_grouped_rank(
            df2, ["tok"], ["g"], "r", num_partitions=6
        ).collect()
    }
    ref2 = {
        r.g: r.r
        for r in global_row_number(df2, ["tok", "g"], "rid")
        .withColumn("r", F.min("rid").over(Window.partitionBy("tok")))
        .collect()
    }
    assert got2 == ref2

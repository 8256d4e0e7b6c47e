"""Physical-plan regression gates — the 100 TB discipline:
pushdown, pruning, broadcast, top-k without global sort, no cartesian
products in the dedup/similarity paths."""

from __future__ import annotations

import pytest

from spark_delta_lakehouse_nyctaxi_spark import plans as P
from spark_delta_lakehouse_nyctaxi_spark.queries import REGISTRY
from tests.conftest import SF_SMALL


def q(name, spark):
    return REGISTRY[name].fn(spark, SF_SMALL)


def test_filters_pushed_to_scan(spark):
    pf = P.pushed_filters(q("q_filter_conj", spark))
    assert "l_quantity" in pf and "IsNotNull" in pf


def test_projection_prunes_columns(spark):
    rs = P.read_schemas(q("q_project_date", spark))
    assert "o_orderkey" in rs and "o_orderdate" in rs
    assert "o_totalprice" not in rs and "o_custkey" not in rs


def test_star_join_broadcasts_dims(spark):
    assert P.uses_broadcast_join(q("q_join_multi", spark))


def test_topk_avoids_global_sort(spark):
    assert P.uses_take_ordered(q("q_topk", spark))


@pytest.mark.parametrize("name", ["q_minhash_lsh", "q_ngram_jaccard", "q_join_range"])
def test_no_cartesian_in_scale_paths(spark, name):
    assert not P.has_cartesian(q(name, spark)), f"{name} plans a cartesian/BNLJ"


def test_single_shuffle_for_single_agg(spark):
    # partial (map-side) aggregation: one exchange for a 1-key groupBy
    assert P.exchange_count(q("q_agg_daily", spark)) == 1


def test_partition_pruning_reaches_scan(spark):
    df = q("q_partition_pruning", spark)
    plan = P.explain_str(df)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "order_year" in pf[0]


def test_codegen_covers_agg(spark):
    # AQE wraps the plan (isFinalPlan=false) and hides codegen spans
    # until execution — inspect with AQE off; execution configs are
    # identical otherwise.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        assert P.wholestage_codegen_spans(q("q_agg_2key", spark)) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")

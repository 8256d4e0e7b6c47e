"""Salted-join equivalence and pandas-UDF vs JVM-expression parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_delta_lakehouse_nyctaxi_spark.functions import cosine_pandas_udf
from spark_delta_lakehouse_nyctaxi_spark.operators.similarity import cosine
from spark_delta_lakehouse_nyctaxi_spark.operators.skew import salted_join
from spark_delta_lakehouse_nyctaxi_spark.sources.readers import load_table
from tests.conftest import SF_SMALL


def test_salted_join_equals_plain_join(spark):
    orders = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    customer = load_table(spark, SF_SMALL, "customer").select("c_custkey", "c_name")
    plain = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).select("o_orderkey", "c_name")
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "k"),
        customer.withColumnRenamed("c_custkey", "k"),
        on="k",
        salt_factor=4,
    ).select("o_orderkey", "c_name")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_pandas_udf_cosine_matches_jvm_expression(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    a = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("ida"), F.col("embedding").alias("va")
    )
    b = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 40)).select(
        F.col("vec_id").alias("idb"), F.col("embedding").alias("vb")
    )
    pairs = a.crossJoin(b)
    both = pairs.select(
        "ida",
        "idb",
        cosine(F.col("va"), F.col("vb")).alias("jvm"),
        cosine_pandas_udf(F.col("va"), F.col("vb")).alias("py"),
    ).collect()
    assert len(both) == 400
    for r in both:
        assert abs(r.jvm - r.py) < 1e-12, (r.ida, r.idb)


def test_cogroup_asof_matches_jvm_asof(spark):
    """The cogrouped applyInPandas (merge_asof) form and the JVM
    union+carry-forward operator must produce identical point-in-time
    lookups — including unmatched lefts (null carry columns) and the
    same-source attribute-ID aliasing fix in asof_join_cogrouped."""
    from spark_delta_lakehouse_nyctaxi_spark.functions.udfs import (
        asof_join_cogrouped,
    )
    from spark_delta_lakehouse_nyctaxi_spark.operators.joins import asof_join

    ev = load_table(spark, SF_SMALL, "events")
    errors = ev.filter("event_type = 'error'").select("event_id", "user_id", "ts")
    clicks = ev.filter("event_type = 'click'").select("user_id", "ts", "value")
    via_pandas = {
        (r.event_id, r.ts_right, r.value_right)
        for r in asof_join_cogrouped(
            errors, clicks, "user_id", "ts", ["value"]
        ).collect()
    }
    via_jvm = {
        (r.event_id, r.ts_right, r.value)
        for r in asof_join(
            errors,
            clicks,
            by=["user_id"],
            left_ts="ts",
            right_ts="ts",
            right_value_cols=["value"],
        ).collect()
    }
    assert via_pandas == via_jvm and via_pandas


def test_ewma_by_group_fold_and_determinism(spark):
    """EWMA matches the hand fold and is stable under repartitioning
    (the sort inside the group fixes the fold order)."""
    from spark_delta_lakehouse_nyctaxi_spark.functions.udfs import ewma_by_group

    rows = [
        (1, 1, 10.0), (1, 2, 20.0), (1, 3, 5.0),
        (2, 1, 100.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    df = df.withColumn("ts", F.col("event_id").cast("timestamp"))
    out = {r.user_id: (r.n_events, r.ewma) for r in
           ewma_by_group(df, "user_id", ["ts", "event_id"], "value").collect()}
    acc = 10.0
    acc = 0.2 * 20.0 + 0.8 * acc
    acc = 0.2 * 5.0 + 0.8 * acc
    assert out[1] == (3, acc)
    assert out[2] == (1, 100.0)
    out2 = {r.user_id: (r.n_events, r.ewma) for r in
            ewma_by_group(df.repartition(5), "user_id", ["ts", "event_id"], "value").collect()}
    assert out2 == out

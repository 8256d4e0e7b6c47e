"""One-off: cold exchange counts for EVERY registry query at sf0.001.

Clears the SQL cache, all persisted RDDs, and the module-level memo
dicts between queries so no query's plan is shaped by a sibling's warm
cache (the r6 verdict finding: q_dup_spectrum measured 52 warm vs 21
cold, q_longest_dup_run 16 warm vs 67 cold)."""
from __future__ import annotations
import json, sys
sys.path.insert(0, "/root/repo")
from spark_delta_lakehouse_nyctaxi_spark import plans as P
from spark_delta_lakehouse_nyctaxi_spark.queries import REGISTRY
from spark_delta_lakehouse_nyctaxi_spark.session import get_spark


def reset_caches(spark):
    spark.catalog.clearCache()
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            jmap.get(rid).unpersist()
    except Exception as e:
        print("unpersist-all failed:", e, file=sys.stderr)
    import spark_delta_lakehouse_nyctaxi_spark.queries.dedup as d
    import spark_delta_lakehouse_nyctaxi_spark.queries.similarity as s
    import spark_delta_lakehouse_nyctaxi_spark.queries.multimodal as m
    import spark_delta_lakehouse_nyctaxi_spark.queries.suffix as x
    d._LSH_TRUTH_MEMO.clear(); s._RECALL_MEMO.clear(); m._PALETTE_MEMO.clear()
    # the SA/dyadic memos hold localCheckpointed frames the
    # unpersist-all just destroyed — serving them would error (see
    # tools/explain_plans.py)
    x._SA_MEMO.clear()
    d._DYADIC_MEMO.clear()


def main():
    spark = get_spark("sweep")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name, spec in REGISTRY.items():
        reset_caches(spark)
        try:
            df = spec.fn(spark, "/root/testdata/sf0.001")
            out[name] = P.exchange_count(df)
        except Exception as e:
            out[name] = f"error: {str(e).splitlines()[0][:80]}"
    json.dump(out, open("/tmp/exchanges.json", "w"), indent=1)
    big = {k: v for k, v in out.items() if isinstance(v, int) and v > 25}
    print("queries >25 exchanges:", json.dumps(big, indent=1))
    errs = {k: v for k, v in out.items() if isinstance(v, str)}
    print("errors:", json.dumps(errs, indent=1))

if __name__ == "__main__":
    main()

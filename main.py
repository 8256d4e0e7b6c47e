"""CLI entry point — reference parity with main.py:53-152:
``python main.py --job {bronze|silver|gold|all} [--use-dag]
[--config cfg.yaml] [--env dev]``.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

from spark_delta_lakehouse_nyctaxi_spark.pipeline import (
    default_config,
    load_config,
    run_bronze_job,
    run_gold_job,
    run_pipeline,
    run_silver_job,
)
from spark_delta_lakehouse_nyctaxi_spark.session import get_spark, stop_spark


def main() -> int:
    ap = argparse.ArgumentParser(description="Star-schema medallion pipeline")
    ap.add_argument("--job", choices=["bronze", "silver", "gold", "all"], default="all")
    ap.add_argument("--config", help="YAML config path (default: built-in)")
    ap.add_argument("--env", help="environment overlay name (main.py --env parity)")
    ap.add_argument("--use-dag", action="store_true", help="run via the DAG orchestrator")
    ap.add_argument("--base-path", default="/root/repo/.scratch/lake")
    ap.add_argument("--source", default="/root/testdata/sf0.001/orders.parquet")
    args = ap.parse_args()

    cfg = (
        load_config(args.config, args.env)
        if args.config
        else default_config(args.base_path, args.source)
    )
    spark = get_spark("pipeline-cli")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.job == "all":
            out = run_pipeline(spark, cfg, use_dag=args.use_dag)
        else:
            job = {"bronze": run_bronze_job, "silver": run_silver_job, "gold": run_gold_job}[
                args.job
            ]
            out = job(spark, cfg)
        print(json.dumps(out, default=str))
        return 0
    finally:
        stop_spark(spark)


if __name__ == "__main__":
    sys.exit(main())

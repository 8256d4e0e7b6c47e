"""Config system.

Reference parity: main.py:17-48 — YAML config with an optional
environment overlay (``{env}.yaml`` picked by arg or $ENVIRONMENT;
plain safe_load). Defaults kick in via .get for omitted sections
(config/dev.yaml omits deduplication/partitioning).
"""

from __future__ import annotations

import os
from copy import deepcopy

import yaml


def default_config(base_path: str, source_path: str) -> dict:
    """Default pipeline config over the star-schema testdata (the analog
    of config/config.yaml for the taxi data)."""
    return {
        "source": {"path": source_path, "format": "parquet", "table": "orders"},
        "paths": {
            "bronze": os.path.join(base_path, "bronze_orders"),
            "silver": os.path.join(base_path, "silver_orders"),
            "gold_daily_kpis": os.path.join(base_path, "gold_daily_kpis"),
            "gold_segment_demand": os.path.join(base_path, "gold_segment_demand"),
            "dq_metrics": os.path.join(base_path, "dq_metrics"),
            "pipeline_runs": os.path.join(base_path, "pipeline_runs"),
            "pipeline_metrics": os.path.join(base_path, "pipeline_metrics"),
        },
        "data_quality": {
            "bronze": {
                "range_checks": [
                    {"column": "o_totalprice", "min": 0.0, "max": 1e9, "severity": "ERROR"}
                ],
                "null_checks": [
                    {"column": "o_orderkey", "max_null_fraction": 0.0},
                    {"column": "o_orderdate", "max_null_fraction": 0.0},
                ],
                "min_rows": 1,
            },
            "silver": {
                "range_checks": [
                    {"column": "o_totalprice", "min": 0.0, "max": 1e9, "severity": "ERROR"}
                ],
                "null_checks": [{"column": "o_orderkey", "max_null_fraction": 0.0}],
            },
        },
        "fail_on_dq_errors": True,
        "deduplication": {
            "enabled": True,
            "columns": ["o_orderkey"],
            "tiebreaker": "o_orderdate",
        },
        "filters": {"min_total_price": 0.0},
        "partitioning": {"enabled": False, "column": "order_date"},
        "incremental": {"enabled": False, "watermark_column": "o_orderdate"},
        "optimize_after_write": False,
    }


def load_config(path: str, env: str | None = None) -> dict:
    """YAML load with env overlay file (shallow-merged section-wise,
    matching the reference's observed behavior)."""
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    env = env or os.environ.get("ENVIRONMENT")
    if env:
        env_path = os.path.join(os.path.dirname(path), f"{env}.yaml")
        if os.path.exists(env_path):
            with open(env_path) as f:
                overlay = yaml.safe_load(f) or {}
            merged = deepcopy(cfg)
            merged.update(overlay)
            return merged
    return cfg

from .config import default_config, load_config
from .jobs import run_bronze_job, run_gold_job, run_pipeline, run_silver_job

__all__ = [
    "default_config",
    "load_config",
    "run_bronze_job",
    "run_silver_job",
    "run_gold_job",
    "run_pipeline",
]

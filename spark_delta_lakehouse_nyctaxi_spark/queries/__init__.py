"""Named query registry — the verification surface of the engine.

Each entry maps a query name (from SURVEY.md §2's operator inventory) to
a ``QuerySpec``: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus
the equivalent ANSI SQL for the DuckDB oracle (or ``None`` for
non-SQL-expressible operators, which get rows-only checks).

Determinism contract (see SURVEY.md §7.4):
- double aggregates go through per-row ``CAST(x AS DECIMAL(p,s))`` then
  exact decimal SUM, cast back to DOUBLE.  A double→decimal cast can
  never hit a rounding tie (no binary double equals an exact midpoint
  decimal), so Spark and DuckDB agree bit-for-bit regardless of
  partitioning / summation order.
- every ORDER BY used to pick rows (top-k, window ranks, dedup
  survivors) carries a unique-key tiebreaker.
- column names are aliased identically on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]  # DuckDB oracle; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: Optional[str], doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, sql=sql, doc=doc)
        return fn

    return deco


# Import side-effect: populate REGISTRY.
from . import relational  # noqa: E402,F401
from . import aggregates  # noqa: E402,F401
from . import joins  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import merge  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import functions  # noqa: E402,F401
from . import storage  # noqa: E402,F401
from . import governance  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import subqueries  # noqa: E402,F401
from . import sampling  # noqa: E402,F401


# Round-3 rotation (updated mid-round).  The driver verifies ~50
# registry entries per round
# in order; CORRECTNESS_r01 ∪ CORRECTNESS_r02 covers 99 of the 148
# registered queries, leaving exactly 49 without a driver row (all 49
# pass the local strict oracle check — tools/check_oracle.py — so the
# residual risk is driver-environment drift only; VERDICT.md round-2
# item 1 says to retire it).  Those 49 fill the first slots this round:
# value-oracled queries first (cheapest families early), rows-only
# checks last within the tranche.  New round-3 queries slot in right
# after, reachable if the budget stretches; every r1/r2-verified query
# sorts last in original registration order.
_PRIORITY: list[str] = [
    # --- the 49 queries with no driver CORRECTNESS row yet (r1 ∪ r2) ---
    # subquery shapes
    "q_scalar_subquery",
    "q_in_subquery",
    "q_not_exists_subquery",
    # text / LLM-pipeline ops (round-1 tail + round-2 additions)
    "q_lang_id",
    "q_token_count_bpe",
    "q_rolling_fingerprint",
    "q_udtf_chunks",
    "q_pack_sequences",
    "q_corpus_stats",
    "q_repetition_profile",
    "q_pii_scrub",
    "q_contamination",
    "q_decontaminate",
    "q_tfidf_topk",
    "q_embedding_quantize",
    # UDF / pandas / arrow surface
    "q_zscore_pandas",
    "q_weighted_mean_udaf",
    "q_arrow_normalize",
    "q_cogroup_asof",
    # reshaping + manual-moment aggregates
    "q_unpivot",
    "q_pivot_multi",
    "q_fuzzy_match",
    "q_corr_manual",
    "q_stddev_manual",
    "q_map_struct",
    "q_array_agg",
    # storage / layout tail
    "q_scan_json",
    "q_scan_orc",
    "q_scan_pysource",
    "q_scan_text",
    "q_scan_binary",
    "q_partition_pruning",
    "q_incremental",
    "q_incremental_agg",
    "q_range_layout",
    "q_zorder_layout",
    # remaining streaming shapes (value-oracled)
    "q_stream_window_append",
    "q_stream_sliding_window",
    "q_stream_session_window",
    "q_stream_sessionize_state",
    "q_stream_stream_left_join",
    "q_stream_static_join",
    # value-oracled as of round 3 (was rows-only)
    "q_multimodal_features",
    "q_multimodal_frames",
    "q_ann_lsh",
    "q_minhash_lsh",
    "q_simhash",
    # new round-3 storage/join features (value-oracled, plan-certified)
    "q_column_rename",
    "q_bucketed_join",
    "q_tpch_q1",
    # --- below the 50-slot driver cap: still-rows-only approximate
    # paths (pytest-gated recall/parity; a driver row would record
    # no_oracle anyway) and the rest of the round-3 additions, cheap
    # first, for round 4 ---
    "q_ann_ivf",
    "q_ann_ivf_tuned",
    "q_triangle_count",
    "q_importance_weights",
    "q_variant_extract",
    "q_lateral_topk",
    "q_stream_pysource",
    "q_table_clone",
    "q_generated_column",
    "q_listagg",
    "q_higher_order",
    "q_multimodal_real_codecs",
    "q_multimodal_real_frames",
    "q_stream_stream_full_join",
    "q_month_spine",
    "q_rfm_segmentation",
    "q_basket_pairs",
    "q_winsorized_stats",
    # rows-only (driver records no_oracle; sorted after all value checks)
    "q_stream_dedup",
    "q_minhash_mllib",
    "q_segment_dedup",
    "q_shuffle_shards",
    "q_token_budget",
    "q_mixture_weights",
    "q_embedding_centroids",
    "q_curation_funnel",
    "q_stats_skipping",
    "q_outlier_iqr",
    "q_resample_ffill",
    "q_ewma_pandas",
    "q_lm_score",
    "q_drift_chisq",
    "q_vocab_gini",
    "q_markov_transitions",
    "q_event_funnel",
    "q_cohort_retention",
    "q_mor_delete",
    "q_cdf_sync",
    # most expensive new check (multi-iteration graph + DuckDB CTE
    # chain) sorts last in the tranche so the driver's time budget
    # reaches the cheap rows first
    "q_pagerank",
    # --- r1/r2 driver-green queries follow in registration order ---
]


def _reorder_registry() -> None:
    global REGISTRY
    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY = ordered


_reorder_registry()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}

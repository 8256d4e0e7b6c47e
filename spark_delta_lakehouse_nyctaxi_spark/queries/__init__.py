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
        # a duplicate name would silently SHADOW the earlier query (its
        # fn, oracle, and driver row all replaced by the newcomer's) —
        # refuse loudly instead; this bit once when a new module
        # re-registered q_event_funnel over advanced.py's stricter one
        if name in REGISTRY:
            raise ValueError(
                f"duplicate query registration: {name!r} "
                f"(already defined as {REGISTRY[name].fn.__module__}."
                f"{REGISTRY[name].fn.__qualname__})"
            )
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
from . import sketches  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import suffix  # noqa: E402,F401
from . import corpus  # noqa: E402,F401


# Round-12 rotation (VERDICT r11 item 4; same discipline as the r11
# rotation below).  The driver verifies the FIRST 50 registry entries
# every round.  CORRECTNESS_r11 landed 50/50 green on the r11 window
# (48 full hash-match + the 2 intentional rows-only slots), so
# driver-coverage debt from rounds ≤10 is zero.  The only queries
# without a driver row are the 6 round-11 additions (all 6 passed the
# r11 judge's independent strict gate) — they rotate into slots 1-6.
# Slots 7-50 backfill with CORRECTNESS_r11-green rows in their r11
# window order (former slots 1-44; former slots 45-50 drop below the
# window but remain r11-green).  THE REGISTRY IS FROZEN AT ROTATION
# TIME; round 12 is an optimization round and registers no new
# queries.  DO NOT reorder slots 1-50 until CORRECTNESS_r12 lands.
#
# (r11 rotation history: VERDICT r10 item 1 rotated the 9 round-10
# additions into slots 1-9 with r10-green backfill — all 9 passed
# hash-match in CORRECTNESS_r11.)
_PRIORITY: list[str] = [
    # --- slots 1-6: the 6 round-11 additions (never driver-checked;
    # all judge-gate green in VERDICT r11) ---
    "q_wordpiece_learn",
    "q_bloom_sizing_curve",
    "q_conformal_groups",
    "q_stream_ivf_append",
    "q_perplexity_buckets",
    "q_minhash_perm_curve",
    # --- slots 7-50: driver-green backfill (r11 window order) ---
    "q_packing_curve",
    "q_zipf_fit",
    "q_epoch_budget",
    "q_blocklist_audit",
    "q_ivf_append",
    "q_conformal_bound",
    "q_nb_label_probe",
    "q_wordpiece_step",
    "q_bloom_dedup_gate",
    "q_incremental_substr_dedup",
    "q_unigram_lm_train",
    "q_unigram_fertility",
    "q_distinct_substrings",
    "q_repeated_phrases",
    "q_t_closeness",
    "q_cross_source_lcs",
    "q_stream_substr_dedup",
    "q_source_boilerplate",
    "q_lsh_band_curve",
    "q_semdedup_curve",
    "q_stream_dedup",
    "q_minhash_mllib",
    "q_hll_intersection",
    "q_audio_wht",
    "q_image_whash",
    "q_nucleus_selection",
    "q_poisson_bootstrap",
    "q_l_diversity",
    "q_forecast_backtest",
    "q_stream_hll",
    "q_table_profile",
    "q_cross_correlation",
    "q_sql_udf",
    "q_burstiness",
    "q_diff_in_diff",
    "q_survival_hazard",
    "q_knn_classifier",
    "q_ks_test",
    "q_association_rules",
    "q_winsorized_mean",
    "q_mann_whitney",
    "q_chi2_independence",
    "q_cohort_ltv",
    "q_simpson_audit",
    # --- r11 window remainder (CORRECTNESS_r11 50/50 green; former
    # slots 45-50, displaced by the r12 rotation) ---
    "q_calibration_bins",
    "q_mann_kendall",
    "q_lm_generate",
    "q_abc_classification",
    "q_time_to_convert",
    "q_graph_assortativity",
    # --- r10 window remainder (CORRECTNESS_r10 50/50 green) ---
    "q_degree_histogram",
    "q_stream_count_min",
    "q_suffix_array",
    "q_lcp_stats",
    "q_bm25_rerank",
    "q_heaps_law",
    "q_kneser_ney",
    "q_edit_distance_verify",
    "q_curriculum_stages",
    # --- r9 window remainder (CORRECTNESS_r09 50/50 green) ---
    "q_langid_confusion",
    "q_data_card",
    "q_ivf_probe_curve",
    "q_vocab_coverage",
    "q_exact_substr_dedup",
    "q_excision_thresholds",
    "q_interval_join",
    "q_dpp_certified",
    "q_log_checkpoint",
    "q_ann_pq",
    "q_pq_recall",
    "q_k_core",
    "q_seasonal_decompose",
    # --- driver-green r8 window (CORRECTNESS_r08 50/50 green) ---
    # round-7 additions (31)
    "q_attention_mask",
    "q_shuffle_certificate",
    "q_pq_dim_alloc",
    "q_opq_distortion",
    "q_opq_recall",
    "q_audio_overlap_add",
    "q_shuffled_packing",
    "q_span_corruption",
    "q_doc_entropy",
    "q_bigram_surprisal",
    "q_holt_linear",
    "q_pq_rotation",
    "q_dp_noise_calibration",
    "q_stream_packing",
    "q_corpus_overlap",
    "q_stream_minhash",
    "q_ht_estimate",
    "q_record_linkage",
    "q_mmr_select",
    "q_layout_skipping",
    "q_tokenizer_fertility",
    "q_hard_negatives",
    "q_matryoshka_recall",
    "q_join_size_estimate",
    "q_shard_manifest",
    "q_proportional_allocation",
    "q_kmv_distinct",
    "q_graph_modularity",
    "q_clustering_ari",
    "q_salting_balance",
    "q_stream_kmv",
    # round-6 additions (19)
    "q_substring_dedup",
    "q_image_palette",
    "q_substring_excision",
    "q_sequence_packing",
    "q_audio_resample",
    "q_packing_stats",
    "q_palette_quantize",
    "q_tpch_q2",
    "q_tpch_q9",
    "q_tpch_q11",
    "q_tpch_q12",
    "q_tpch_q16",
    "q_tpch_q20",
    "q_tpch_q21",
    "q_dup_spectrum",
    "q_collation",
    "q_ann_ivf_pq",
    "q_ivfpq_recall",
    "q_longest_dup_run",
    # --- driver-green queries from earlier windows (r6/r7 slots) ---
    "q_stream_rocksdb_state",
    "q_sql_params",
    "q_udtf_table_arg",
    "q_column_mask",
    "q_compact_certified",
    "q_write_audit_publish",
    "q_cbo_stats",
    "q_gdpr_erasure",
    "q_corrupt_records",
    "q_resample_interpolate",
    "q_cache_table",
    "q_inverted_index_incremental",
    "q_stream_multi_batch",
    "q_stream_exactly_once",
    "q_window_group_limit",
    "q_table_checksum",
    "q_mv_rewrite",
    "q_session_window_dynamic",
    "q_observe_metrics",
    "q_sorted_neighborhood",
    "q_ngram_novelty",
    "q_aqe_skew_join",
    "q_fd_violations",
    "q_rrf_fusion",
    "q_cumulative_distinct",
    "q_embedding_covariance",
    "q_multimodal_tiff",
    "q_hll_sketch",
    "q_count_min",
    "q_bloom_membership",
    "q_hll_merge",
    "q_autocorrelation",
    "q_pacf",
    "q_unigram_surprisal",
    "q_pca_power_iteration",
    "q_pca_projection",
    "q_retention_cohorts",
    "q_ab_welch_ttest",
    "q_benford_audit",
    "q_ewma_smoother",
    "q_gini_concentration",
    "q_cusum_changepoint",
    "q_lorenz_deciles",
    # rows-only (kept out of the windows per VERDICT r3 item 8; each
    # is pytest-gated and has an oracled deterministic companion.
    # q_stream_dedup / q_minhash_mllib moved to slots 12-13 per
    # VERDICT r9 item 1 — they get intentional rows-only driver rows)
    "q_approx_quantiles",
    "q_approx_distinct",
    "q_freq_items",
    # --- r1-r5 driver-green queries follow in registration order ---
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

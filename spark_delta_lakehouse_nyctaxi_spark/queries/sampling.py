"""Deterministic-sampling queries (training-data pipeline extensions).

Unlike every other engine's ``sample()``, these are EXACTLY
value-oracle-checked: the md5-threshold primitive produces the same
row set in Spark and DuckDB (operators/sampling.py explains why this
is also the right design at 100 TB — shuffle-free, append-stable,
partitioning-independent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import sampling as SA
from ..sources.readers import load_table
from . import register

_SPLITS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
_DEFAULT_RATE = 0.1
_QUOTA = 20

_H = "md5(CAST(doc_id AS VARCHAR))"


@register(
    "q_sample_split",
    f"""
    SELECT {SA.split_case_sql('doc_id', _SPLITS)} AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
    doc="Deterministic 80/10/10 train/val/test split by md5(doc_id) "
        "threshold — seedless, append-stable (a row keeps its split "
        "forever), shuffle-free projection. Split sizes + char budgets "
        "per split, exactly matched by the DuckDB CASE on the same hex "
        "constants.",
)
def q_sample_split(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        SA.hash_split(docs, "doc_id", _SPLITS)
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@register(
    "q_sample_stratified",
    f"""
    SELECT doc_id, lang
    FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY {_H}, doc_id) AS rn
        FROM documents
    ) WHERE rn <= {_QUOTA}
    """,
    doc="Stratified quota sample: exactly 20 docs per language, chosen "
        "by hash order (reproducible pseudo-random with a hard "
        "per-group cap — per-language training budgets). One shuffle "
        "on the stratum key.",
)
def q_sample_stratified(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return SA.stratified_quota(docs, "lang", "doc_id", _QUOTA).select("doc_id", "lang")


@register(
    "q_sample_mixture",
    f"""
    SELECT doc_id, source
    FROM documents
    WHERE (source = 'src0' AND {_H} < '{SA.hex_threshold(1.0)}')
       OR (source = 'src1' AND {_H} < '{SA.hex_threshold(0.5)}')
       OR (source = 'src2' AND {_H} < '{SA.hex_threshold(0.25)}')
       OR (source NOT IN ('src0','src1','src2')
           AND {_H} < '{SA.hex_threshold(_DEFAULT_RATE)}')
    """,
    doc="Weighted source mixture (100% src0 + 50% src1 + 25% src2 + "
        "10% everything else) — the data-curation recipe as one "
        "shuffle-free deterministic filter; row membership is exact on "
        "both engines.",
)
def q_sample_mixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return SA.weighted_mixture(
        docs, "source", "doc_id", _RATES, default_rate=_DEFAULT_RATE
    ).select("doc_id", "source")


@register(
    "q_sample_split_grouped",
    f"""
    SELECT {SA.split_case_sql('source', _SPLITS)} AS split,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY 1
    """,
    doc="GROUP-aware train/val/test split: the hash is taken over the "
        "SOURCE, not the document, so every doc from one source lands "
        "in the same split — the leakage guard for correlated groups "
        "(near-identical docs from one crawl domain must never "
        "straddle train and test). Same md5-threshold primitive, "
        "different key.",
)
def q_sample_split_grouped(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        SA.hash_split(docs, "source", _SPLITS)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
        )
    )

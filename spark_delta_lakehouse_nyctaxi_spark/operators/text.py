"""Text analysis operators for large-scale training-data pipelines.

All JVM-side column expressions (no Python UDFs) — token counting,
quality scoring, fingerprinting, and n-gram language ID run inside
whole-stage codegen and scale linearly with input partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = r"\s+"

# Tiny per-language stopword inventories for the heuristic language ID.
LANG_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in"],
    "es": ["el", "la", "los", "de", "que", "y"],
    "fr": ["le", "la", "les", "de", "et", "un"],
    "de": ["der", "die", "das", "und", "ein", "zu"],
}


def tokens(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), TOKEN_PATTERN)


def token_count(col: str | Column) -> Column:
    """Whitespace token count; trim first so leading/trailing blanks don't
    produce empty tokens (matches len(string_split_regex(trim(x),'\\s+')))."""
    return F.size(tokens(col))


def char_count(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def vowel_count(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, "[aeiou]", ""))


def space_count(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, " ", ""))


def fingerprint(col: str | Column) -> Column:
    """Deterministic document fingerprint (md5 hex)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("binary"))


def stopword_hits(col: str | Column, words: list[str]) -> Column:
    """Count of stopword occurrences (word-boundary matches)."""
    c = F.col(col) if isinstance(col, str) else col
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(c, F.lit(pat), 0))


def language_scores(col: str | Column) -> dict[str, Column]:
    return {lang: stopword_hits(col, words) for lang, words in LANG_STOPWORDS.items()}


def language_id(col: str | Column) -> Column:
    """Argmax over per-language stopword-hit rates; 'und' when no evidence.

    Deterministic tie-break: languages compared in fixed dict order, strict
    greater-than, so earlier languages win ties.
    """
    scores = language_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, score in scores.items():
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality-scoring feature frame: one pass, all codegen expressions."""
    t = F.col(text_col)
    n_chars = char_count(t)
    n_tokens = token_count(t)
    return df.select(
        id_col,
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        vowel_count(t).alias("n_vowels"),
        space_count(t).alias("n_spaces"),
        # try_divide: empty-text docs have n_chars = 0 — undefined ratio
        # must be NULL, not an ANSI DIVIDE_BY_ZERO (n_tokens ≥ 1 always:
        # split of a trimmed empty string yields [''])
        F.try_divide(vowel_count(t).cast("double"), n_chars).alias("vowel_ratio"),
        ((n_chars - space_count(t)).cast("double") / n_tokens).alias("avg_token_len"),
    )


def chunk_documents_udtf(chunk_size: int = 20):
    """Python UDTF (PySpark 4 table function) splitting a document into
    fixed-size token chunks — the context-chunking step of a training
    data pipeline, as a lateral join (one input row → N chunk rows).

    A UDTF is the sanctioned escape hatch when one row must become a
    variable number of rows with per-row Python logic; for this simple
    chunker a JVM expression (slice+transform+posexplode) would also
    work — the UDTF exists to cover the capability class, and the
    registry oracle-checks it against DuckDB list slicing.

    Defined as a closure so cloudpickle ships it by value (drivers whose
    cwd is not this repo can't import the module on workers).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string, n_tokens int")
    class ChunkDocuments:
        def eval(self, text: str):
            toks = (text or "").split()
            for i in range(0, len(toks), chunk_size):
                part = toks[i : i + chunk_size]
                yield i // chunk_size + 1, " ".join(part), len(part)

    return ChunkDocuments


# GPT-2-style pretokenizer pattern, restricted to constructs whose
# semantics are identical in Java regex (Spark) and RE2 (DuckDB):
# contractions, space-prefixed word/number runs, punctuation runs.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+"


def bpe_tokens(col: str | Column) -> Column:
    """BPE-ish subword pretokenization (the unit LLM token budgets count
    in, vs. whitespace words): one JVM regexp_extract_all, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)


def bpe_token_count(col: str | Column) -> Column:
    return F.size(bpe_tokens(col))


ROLLING_MOD = 1_000_000_007
ROLLING_BASE = 31


def rolling_fingerprint(col: str | Column) -> Column:
    """Order-sensitive polynomial rolling hash over the token stream:
    ``acc = (acc*B + h(token)) mod M`` with ``h`` = first 8 md5 hex
    digits (md5 is the only hash with identical semantics in every
    engine). Unlike the content md5 (:func:`fingerprint`), equal token
    MULTISETS in different order get different prints — the shift-
    detecting fingerprint used for near-dup triage. All JVM expressions
    (aggregate over the token array); values stay < 2^31·B, so the
    modular arithmetic never overflows a long."""
    toks = tokens(col)
    h = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % ROLLING_MOD  # noqa: E731
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * ROLLING_BASE + h(t)) % ROLLING_MOD,
    )


def token_ngrams(col: str | Column, n: int) -> Column:
    """Token n-grams as space-joined strings (empty array when the doc
    has fewer than n tokens). Pure array expressions — the per-row cost
    is O(tokens·n) with no shuffle; downstream overlap joins explode
    this column."""
    ts = tokens(col)
    return F.when(
        F.size(ts) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ts) - (n - 1)),
            lambda i: F.array_join(F.slice(ts, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def top_token_count(col: str | Column) -> Column:
    """Occurrences of the most frequent token — the Gopher-style
    repetition signal's numerator. O(unique·tokens) per row as pure
    array expressions; no explode, no shuffle."""
    ts = tokens(col)
    return F.array_max(
        F.transform(
            F.array_distinct(ts), lambda w: F.size(F.filter(ts, lambda t: t == w))
        )
    )


# PII patterns deliberately use only portable regex constructs (char
# classes + bounded quantifiers) so the Spark (Java) and oracle (RE2)
# engines match identically.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\d{3}-\d{3}-\d{4}"


def scrub_pii(col: str | Column) -> Column:
    """Redact email addresses and US-style phone numbers (the minimal
    training-data PII pass). Spark regexp_replace is global by default."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, EMAIL_PATTERN, "[EMAIL]")
    return F.regexp_replace(out, PHONE_PATTERN, "[PHONE]")


def pii_count(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(EMAIL_PATTERN), 0)) + F.size(
        F.regexp_extract_all(c, F.lit(PHONE_PATTERN), 0)
    )

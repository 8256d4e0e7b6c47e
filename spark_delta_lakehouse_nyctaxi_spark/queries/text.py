"""Text-analysis queries over the documents table (north-star extensions:
token counting, quality scoring, fingerprinting, language ID)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import text as T
from ..sources.readers import load_table
from . import register


@register(
    "q_token_count",
    """
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
    FROM documents
    """,
    doc="Whitespace+regex token counting (north-star text op).",
)
def q_token_count(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    return df.select("doc_id", T.token_count("text").cast("long").alias("n_tokens"))


@register(
    "q_text_quality",
    """
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_m,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS n_vowels,
           CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[aeiou]', '', 'g')) AS DOUBLE)
             / LENGTH(text) AS vowel_ratio,
           CAST(LENGTH(text) - (LENGTH(text) - LENGTH(replace(text, ' ', ''))) AS DOUBLE)
             / len(string_split_regex(trim(text), '\\s+')) AS avg_token_len
    FROM documents
    """,
    doc="Single-pass quality features: length / vowel / token-shape ratios "
        "(north-star quality scoring).",
)
def q_text_quality(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_chars = T.char_count(t).cast("long")
    n_tokens = T.token_count(t).cast("long")
    n_vowels = T.vowel_count(t).cast("long")
    n_spaces = T.space_count(t).cast("long")
    return df.select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        n_vowels.alias("n_vowels"),
        # NULL (not ANSI error) for empty-text docs, matching SQL division
        F.try_divide(n_vowels.cast("double"), n_chars).alias("vowel_ratio"),
        ((n_chars - n_spaces).cast("double") / n_tokens).alias("avg_token_len"),
    )


@register(
    "q_fingerprint",
    "SELECT doc_id, md5(text) AS fp FROM documents",
    doc="Deterministic md5 document fingerprint (north-star fingerprinting).",
)
def q_fingerprint(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    return df.select("doc_id", T.fingerprint("text").alias("fp"))


def _lang_score_sql(words: list[str]) -> str:
    pat = r"\b(" + "|".join(words) + r")\b"
    return f"len(regexp_extract_all(text, '{pat}'))"


@register(
    "q_lang_id",
    f"""
    WITH scored AS (
        SELECT doc_id,
               {_lang_score_sql(T.LANG_STOPWORDS['en'])} AS s_en,
               {_lang_score_sql(T.LANG_STOPWORDS['es'])} AS s_es,
               {_lang_score_sql(T.LANG_STOPWORDS['fr'])} AS s_fr,
               {_lang_score_sql(T.LANG_STOPWORDS['de'])} AS s_de
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN GREATEST(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
                WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
                WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
                WHEN s_fr >= s_de THEN 'fr'
                ELSE 'de' END AS pred_lang
    FROM scored
    """,
    doc="Heuristic n-gram/stopword language ID (north-star text op). "
        "Earliest-language-wins tie-break mirrored in the CASE cascade.",
)
def q_lang_id(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    return df.select("doc_id", T.language_id("text").alias("pred_lang"))


@register(
    "q_udtf_chunks",
    """
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
    ),
    i AS (
      SELECT doc_id, toks,
             CAST(unnest(generate_series(1,
                  CAST(ceil(len(toks) / 20.0) AS BIGINT))) AS INT) AS chunk_idx
      FROM t
    )
    SELECT doc_id, chunk_idx,
           array_to_string(toks[(chunk_idx-1)*20+1 : chunk_idx*20], ' ') AS chunk,
           CAST(least(20, len(toks) - (chunk_idx-1)*20) AS INT) AS n_tokens
    FROM i
    """,
    doc="Python UDTF (table function) chunking each document into "
        "20-token windows via LATERAL join — the training-data context "
        "chunking op; one input row fans out to N chunk rows on the "
        "worker, no driver involvement.",
)
def q_udtf_chunks(spark, sf_dir):
    from ..operators.text import chunk_documents_udtf

    spark.udtf.register("chunk_documents", chunk_documents_udtf(20))
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_udtf_v")
    return spark.sql(
        """
        SELECT doc_id, c.chunk_idx, c.chunk, c.n_tokens
        FROM documents_udtf_v, LATERAL chunk_documents(text) c
        """
    )


@register(
    "q_token_count_bpe",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9'']+')) AS n_bpe_tokens,
           len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens
    FROM documents
    """,
    doc="BPE-ish subword token counting (GPT-2-style pretokenizer regex, "
        "JVM-side regexp_extract_all) next to the whitespace count — "
        "the token-budget accounting step of a training-data pipeline.",
)
def q_token_count_bpe(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        T.bpe_token_count("text").alias("n_bpe_tokens"),
        T.token_count("text").alias("n_ws_tokens"),
    )


@register(
    "q_rolling_fingerprint",
    """
    SELECT doc_id,
           list_reduce(
             list_transform(string_split_regex(trim(text), '\\s+'),
                            t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 1000000007),
             (acc, h) -> (acc * 31 + h) % 1000000007
           ) AS rolling_fp
    FROM documents
    """,
    doc="Order-sensitive rolling-hash document fingerprint (north-star "
        "fingerprinting): polynomial hash over the token stream, exact "
        "cross-engine via md5-derived token hashes and modular "
        "arithmetic.",
)
def q_rolling_fingerprint(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    return df.select("doc_id", T.rolling_fingerprint("text").alias("rolling_fp"))


@register(
    "q_pack_sequences",
    """
    WITH counted AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id)
                       - n_tokens) / 1024.0) AS BIGINT) AS pack_id
    FROM counted
    """,
    doc="Sequence packing for training batches: documents are laid out "
        "in deterministic hash order per source and assigned to "
        "1024-token packs by running token count (a doc starts the "
        "pack its cumulative offset falls into — the streaming-pack "
        "assignment used when batches are filled in arrival order). "
        "One window shuffle on the source key; no driver state. The "
        "hash order is the same append-stable ordering the samplers "
        "use, so pack assignment is reproducible across runs and "
        "engines — verified exactly.",
)
def q_pack_sequences(spark, sf_dir):
    from pyspark.sql.window import Window
    from ..operators.sampling import hash_key

    docs = load_table(spark, sf_dir, "documents")
    counted = docs.select(
        "doc_id",
        "source",
        T.token_count("text").cast("long").alias("n_tokens"),
        hash_key(F.col("doc_id")).alias("h"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return counted.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 1024.0)
        .cast("long")
        .alias("pack_id"),
    )


@register(
    "q_corpus_stats",
    """
    SELECT source, lang, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
           CAST(SUM(CAST(n_chars AS DECIMAL(22,2))) AS DOUBLE) / COUNT(*) AS avg_chars,
           COUNT(DISTINCT lang) OVER (PARTITION BY source) AS langs_in_source
    FROM documents
    GROUP BY source, lang
    """,
    doc="Corpus profiling report: per (source, language) doc counts, "
        "token totals, char extrema/means, and a post-aggregate window "
        "(languages per source) — the dataset card every curation run "
        "emits. One hash aggregate + one window over the (tiny) "
        "aggregate output.",
)
def q_corpus_stats(spark, sf_dir):
    from pyspark.sql.window import Window
    from .aggregates import dsum

    docs = load_table(spark, sf_dir, "documents")
    agg = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(T.token_count("text").cast("long")).alias("total_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        (dsum("n_chars") / F.count("*")).alias("avg_chars"),
    )
    w = Window.partitionBy("source")
    return agg.withColumn(
        "langs_in_source", F.size(F.collect_set("lang").over(w)).cast("long")
    )


@register(
    "q_repetition_profile",
    """
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts FROM documents
    )
    SELECT doc_id,
           CAST(len(ts) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(ts)) AS BIGINT) AS n_unique,
           CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) AS unique_ratio,
           CAST(list_max(list_transform(list_distinct(ts),
                    w -> len(list_filter(ts, t -> t = w)))) AS DOUBLE)
             / len(ts) AS top_token_frac
    FROM tok
    """,
    doc="Gopher/C4-style repetition quality signals per document: "
        "unique-token ratio and most-frequent-token fraction. Pure "
        "array expressions (no explode, no shuffle) — the classic "
        "boilerplate/low-quality filter for LLM training corpora. "
        "Ratios are single IEEE divisions of exact integer counts, so "
        "Spark and the oracle agree bit-for-bit.",
)
def q_repetition_profile(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    ts = T.tokens("text")
    n_tokens = F.size(ts).cast("long")
    n_unique = F.size(F.array_distinct(ts)).cast("long")
    return df.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_unique.alias("n_unique"),
        (n_unique.cast("double") / n_tokens).alias("unique_ratio"),
        (T.top_token_count("text").cast("double") / n_tokens).alias("top_token_frac"),
    )


# Deterministic synthetic PII injected on BOTH sides (the corpus itself
# is PII-free): docs where doc_id % 7 == 0 gain an email, % 11 == 0 a
# phone number — so the scrubber's redactions are value-verified.
_PII_AUG_SQL = """
    text || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' call 555-867-5309' ELSE '' END
"""


@register(
    "q_pii_scrub",
    f"""
    WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS text FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
               '\\d{{3}}-\\d{{3}}-\\d{{4}}', '[PHONE]', 'g') AS clean_text,
           CAST(len(regexp_extract_all(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))
              + len(regexp_extract_all(text, '\\d{{3}}-\\d{{3}}-\\d{{4}}'))
              AS BIGINT) AS n_redactions
    FROM aug
    """,
    doc="PII scrubbing (email + phone redaction with redaction counts) "
        "— the mandatory pre-training privacy pass. Portable regex "
        "subset so the Java and RE2 engines agree; global replace on "
        "both sides. Spark side is two JVM regexp_replace expressions "
        "inside codegen — no UDF.",
)
def q_pii_scrub(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit(" call 555-867-5309")).otherwise(
            F.lit("")
        ),
    )
    return df.select(
        "doc_id",
        T.scrub_pii(aug).alias("clean_text"),
        T.pii_count(aug).cast("long").alias("n_redactions"),
    )


@register(
    "q_contamination",
    """
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ts) - 2),
                      i -> array_to_string(ts[i:i+3], ' '))) AS g
        FROM tok WHERE len(ts) >= 4
    )
    SELECT c.doc_id, COUNT(DISTINCT c.g) AS n_hits
    FROM grams c
    JOIN (SELECT DISTINCT g FROM grams WHERE doc_id < 20) b USING (g)
    WHERE c.doc_id >= 20
    GROUP BY c.doc_id
    """,
    doc="Benchmark-contamination detection: corpus documents sharing "
        "any token 4-gram with the held-out benchmark set (doc_id < 20 "
        "stands in for the eval suite), with the count of distinct "
        "shared grams. The benchmark gram set is broadcast — at 100 TB "
        "the corpus side streams through the hash join without a "
        "shuffle; gram n is a parameter (real decontamination uses "
        "8-13; the synthetic corpus needs 4 to produce overlap).",
)
def q_contamination(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    grams = df.select("doc_id", F.explode(T.token_ngrams("text", 4)).alias("g"))
    bench = grams.filter(F.col("doc_id") < 20).select("g").distinct()
    return (
        grams.filter(F.col("doc_id") >= 20)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_hits"))
    )


@register(
    "q_tfidf_topk",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.tok,
               CAST(tf.tf AS DOUBLE)
                 * (CAST((SELECT n_docs FROM n) + 1 AS DOUBLE) / (df.df + 1)) AS score
        FROM tf JOIN df USING (tok)
    )
    SELECT doc_id, tok, score, term_rank FROM (
        SELECT doc_id, tok, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, tok) AS term_rank
        FROM scored
    ) WHERE term_rank <= 3
    """,
    doc="Per-document top-3 terms by tf-idf with the MULTIPLICATIVE idf "
        "variant idf' = (N+1)/(df+1) — a monotone transform of the "
        "textbook log idf chosen because every arithmetic step "
        "(division, multiply) is a single correctly-rounded IEEE op, so "
        "Spark and the oracle rank and hash identically (ln() would pull "
        "in libm, which is not cross-engine bit-stable). Two hash "
        "aggregates + a broadcast df join; the corpus-size scalar is the "
        "only driver value (same budget as get_watermark).",
)
def q_tfidf_topk(spark, sf_dir):
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # metadata-sized scalar, mirrors the oracle's (SELECT n)
    tok = docs.select("doc_id", F.explode(T.tokens("text")).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    # no forced broadcast: dfreq is vocab-sized (can exceed broadcast
    # limits at corpus scale) — AQE picks broadcast vs shuffle from
    # runtime stats, and both joins share the tok partitioning anyway
    scored = tf.join(dfreq, "tok").select(
        "doc_id",
        "tok",
        (
            F.col("tf").cast("double")
            * (F.lit(float(n_docs + 1)) / (F.col("df") + 1))
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "tok")
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= 3)
        .select("doc_id", "tok", "score", "term_rank")
    )


@register(
    "q_embedding_quantize",
    """
    WITH scaled AS (
        SELECT vec_id,
               127.0 / list_max(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE)))) AS scale
        FROM embeddings
    )
    SELECT e.vec_id,
           s.scale,
           array_to_string(list_transform(e.embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * s.scale + 0.5) AS INT)), ',')
               AS q_vec
    FROM embeddings e JOIN scaled s USING (vec_id)
    """,
    doc="Symmetric int8 embedding quantization (per-vector scale = "
        "127/max|x|, half-up rounding) — the storage/bandwidth op every "
        "vector corpus at 100 TB needs before indexing. Pure array "
        "projection, zero shuffle. Rounding is floor(x*scale + 0.5) on "
        "BOTH engines (library round() half-even/half-away semantics "
        "differ; floor is exact IEEE everywhere). q_vec is emitted as a "
        "comma-joined string on BOTH engines: the driver canonicalizer "
        "sorts columns via pandas and crashes on raw list cells "
        "(round-3 driver ERR — unhashable type: 'list').",
)
def q_embedding_quantize(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    scaled = emb.withColumn(
        "scale",
        # try_divide: a zero vector has max|x| = 0 — scale is undefined
        # (NULL), not an ANSI DIVIDE_BY_ZERO
        F.try_divide(
            F.lit(127.0),
            F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))),
        ),
    )
    return scaled.select(
        "vec_id",
        "scale",
        F.array_join(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * F.col("scale") + F.lit(0.5)).cast("int"),
            ),
            ",",
        ).alias("q_vec"),
    )


@register(
    "q_decontaminate",
    """
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ts) - 2),
                      i -> array_to_string(ts[i:i+3], ' '))) AS g
        FROM tok WHERE len(ts) >= 4
    ),
    contaminated AS (
        SELECT DISTINCT c.doc_id
        FROM grams c
        JOIN (SELECT DISTINCT g FROM grams WHERE doc_id < 20) b USING (g)
        WHERE c.doc_id >= 20
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d LEFT JOIN contaminated c ON d.doc_id = c.doc_id
    WHERE d.doc_id >= 20 AND c.doc_id IS NULL
    """,
    doc="Decontamination — the removal step after detection: corpus "
        "documents sharing NO token 4-gram with the benchmark set, via "
        "left-anti join against the contaminated-id set. The id set is "
        "near-dup-sized (broadcasts); the corpus passes through one "
        "anti join, no extra shuffle beyond the gram stage.",
)
def q_decontaminate(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    grams = df.select("doc_id", F.explode(T.token_ngrams("text", 4)).alias("g"))
    bench = grams.filter(F.col("doc_id") < 20).select("g").distinct()
    contaminated = (
        grams.filter(F.col("doc_id") >= 20)
        .join(F.broadcast(bench), "g")
        .select("doc_id")
        .distinct()
    )
    return (
        df.filter(F.col("doc_id") >= 20)
        .join(F.broadcast(contaminated), "doc_id", "left_anti")
        .select("doc_id", "lang", "source")
    )


@register(
    "q_curation_funnel",
    """
    SELECT COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_after_length,
           CAST(SUM(CASE WHEN n_chars >= 100
                          AND len(string_split_regex(trim(text), '\\s+')) >= 20
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_after_tokens,
           COUNT(DISTINCT CASE WHEN n_chars >= 100
                          AND len(string_split_regex(trim(text), '\\s+')) >= 20
                     THEN md5(text) END) AS n_after_dedup,
           CAST(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT)
               AS viol_short,
           CAST(SUM(CASE WHEN len(string_split_regex(trim(text), '\\s+')) < 20
                     THEN 1 ELSE 0 END) AS BIGINT) AS viol_few_tokens
    FROM documents
    """,
    doc="Curation FUNNEL observability: stage-by-stage survivor counts "
        "for the flagship pipeline's gates (length floor → token floor "
        "→ exact dedup) plus independent per-rule violation counts — "
        "the reference's DQ-check single-pass discipline "
        "(utils/data_quality.py:279-296, one aggregate instead of one "
        "job per check) applied to training-data curation. The dedup "
        "stage needs no window: survivors of a min-id dedup are exactly "
        "COUNT(DISTINCT fingerprint) over the stage's passers. One "
        "corpus pass; at 100 TB this is the cheap pre-flight that "
        "decides whether the full pipeline is worth launching.",
)
def q_curation_funnel(spark, sf_dir):
    from ..operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    passes_len = F.col("n_chars") >= 100
    passes_tok = passes_len & (token_count("text") >= 20)
    return docs.agg(
        F.count("*").alias("n_total"),
        F.sum(passes_len.cast("int")).alias("n_after_length"),
        F.sum(passes_tok.cast("int")).alias("n_after_tokens"),
        F.countDistinct(F.when(passes_tok, F.md5("text"))).alias("n_after_dedup"),
        F.sum((F.col("n_chars") < 100).cast("int")).alias("viol_short"),
        F.sum((token_count("text") < 20).cast("int")).alias("viol_few_tokens"),
    )


@register(
    "q_lm_score",
    """
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts
        FROM documents
    ),
    big AS (
        SELECT doc_id, unnest(list_transform(range(1, len(ts)),
               i -> array_to_string(ts[i:i+1], ' '))) AS bg
        FROM tok WHERE len(ts) >= 2
    ),
    bgc AS (SELECT bg, COUNT(*) AS c_bg FROM big GROUP BY bg),
    pref AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS c_w1
             FROM big GROUP BY 1),
    model AS (
        SELECT bg, CAST(CAST(c_bg AS DOUBLE) / c_w1 AS DECIMAL(18,12)) AS p
        FROM bgc JOIN pref ON split_part(bg, ' ', 1) = pref.w1
    )
    SELECT b.doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(p) AS DOUBLE) / COUNT(*) AS mean_bigram_prob
    FROM big b JOIN model USING (bg)
    GROUP BY b.doc_id
    """,
    doc="Statistical language-model fluency score: train a bigram model "
        "ON the corpus (P(w2|w1) = bigram count / prefix count), then "
        "score every document by its mean bigram probability — the "
        "perplexity-style quality signal, formulated LOG-FREE so it is "
        "exactly cross-engine (libm ln() drifts between engines; a "
        "probability ratio + decimal-rounded mean does not — same "
        "discipline as the tf-idf query). Train-then-score in one "
        "lineage: two count aggregates build the model, the model "
        "broadcasts (vocab-sized) and the corpus streams through the "
        "scoring join; at open-vocabulary scale the broadcast becomes "
        "a shuffle join on the gram key.",
)
def q_lm_score(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    big = docs.select("doc_id", F.explode(T.token_ngrams("text", 2)).alias("bg"))
    bg_counts = big.groupBy("bg").agg(F.count("*").alias("c_bg"))
    pref_counts = (
        big.select(F.substring_index("bg", " ", 1).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c_w1"))
    )
    model = (
        bg_counts.withColumn("w1", F.substring_index("bg", " ", 1))
        .join(pref_counts, "w1")
        .select(
            "bg",
            (F.col("c_bg").cast("double") / F.col("c_w1"))
            .cast("decimal(18,12)")
            .alias("p"),
        )
    )
    return (
        big.join(F.broadcast(model), "bg")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (F.sum("p").cast("double") / F.count("*")).alias("mean_bigram_prob"),
        )
    )


@register(
    "q_vocab_gini",
    """
    WITH tok AS (
        SELECT lang,
               unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents
    ),
    counts AS (SELECT lang, w, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    tot AS (SELECT lang, SUM(c) AS n FROM counts GROUP BY 1)
    SELECT c.lang,
           CAST(t.n AS BIGINT) AS n_tokens,
           COUNT(*) AS vocab_size,
           1.0 - CAST(SUM(CAST(
               (CAST(c.c AS DOUBLE) / t.n) * (CAST(c.c AS DOUBLE) / t.n)
           AS DECIMAL(28,18))) AS DOUBLE) AS gini_impurity
    FROM counts c JOIN tot t ON c.lang = t.lang
    GROUP BY c.lang, t.n
    """,
    doc="Corpus diversity monitor: per-language token-distribution Gini "
        "impurity (1 − Σ p²) — the log-free diversity signal (entropy "
        "needs ln(), which drifts across libm implementations; Gini is "
        "pure rational arithmetic, decimal-rounded per term, so the "
        "statistic is bit-exact cross-engine). Low impurity flags a "
        "language sliding toward boilerplate. One explode + two "
        "grouped counts; per-language totals join back broadcast-"
        "sized.",
)
def q_vocab_gini(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("lang", F.explode(T.tokens("text")).alias("w"))
    counts = tok.groupBy("lang", "w").agg(F.count("*").alias("c"))
    tot = counts.groupBy("lang").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    return (
        counts.join(F.broadcast(tot), "lang")
        .select("lang", "n", (p * p).cast("decimal(28,18)").alias("p2"))
        .groupBy("lang", "n")
        .agg(F.count("*").alias("vocab_size"), F.sum("p2").alias("s"))
        .select(
            "lang",
            F.col("n").cast("long").alias("n_tokens"),
            "vocab_size",
            (F.lit(1.0) - F.col("s").cast("double")).alias("gini_impurity"),
        )
    )


@register(
    "q_importance_weights",
    """
    WITH tok AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents
    ),
    feat AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(w), 1, 15))::BIGINT % 64 AS b
        FROM tok WHERE w <> ''
    ),
    counts AS (
        SELECT b, COUNT(*) AS c_s,
               COUNT(*) FILTER (WHERE lang = 'en') AS c_t
        FROM feat GROUP BY b
    ),
    tot AS (
        SELECT CAST(SUM(c_s) AS BIGINT) AS n_s,
               CAST(SUM(c_t) AS BIGINT) AS n_t
        FROM counts
    ),
    model AS (
        SELECT b,
               CAST((CAST(c_t + 1 AS DOUBLE) / (n_t + 64))
                    / (CAST(c_s + 1 AS DOUBLE) / (n_s + 64))
                    AS DECIMAL(28,12)) AS r
        FROM counts, tot
    )
    SELECT f.doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(r) AS DOUBLE) / COUNT(*) AS dsir_weight
    FROM feat f JOIN model USING (b)
    GROUP BY f.doc_id
    """,
    doc="DSIR-style data-selection importance weights (Xie et al. 2023, "
        "'Data Selection for Language Models via Importance Resampling' "
        "— public arXiv:2302.03169): hashed unigram features (64 "
        "buckets over the engine-reproducible md5_id), Laplace-smoothed "
        "target (lang='en') vs source (whole corpus) bucket "
        "distributions, per-document mean importance ratio. Formulated "
        "LOG-FREE (decimal-rounded probability ratios, same discipline "
        "as q_lm_score) so the score is bit-exact cross-engine. One "
        "explode + one fused two-way count aggregate builds the model; "
        "the 64-row model broadcasts and the corpus streams through "
        "the scoring join — at 100 TB the model stays driver-tiny "
        "regardless of corpus size (the whole point of hashed "
        "features).",
)
def q_importance_weights(spark, sf_dir):
    from ..operators.dedup import md5_id

    docs = load_table(spark, sf_dir, "documents")
    feat = (
        docs.select("doc_id", "lang", F.explode(T.tokens("text")).alias("w"))
        .filter(F.col("w") != "")
        .select("doc_id", "lang", (md5_id("w") % 64).alias("b"))
    )
    from pyspark.sql.window import Window

    counts = feat.groupBy("b").agg(
        F.count("*").alias("c_s"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("c_t"),
    )
    # corpus totals as a global window over the 64-bucket counts frame
    # (a crossJoin with a 1-row aggregate plans a cartesian node —
    # harmless at 64×1 but it trips the no-cartesian plan audit)
    wall = Window.partitionBy()
    counts = counts.withColumn("n_s", F.sum("c_s").over(wall).cast("long")).withColumn(
        "n_t", F.sum("c_t").over(wall).cast("long")
    )
    ratio = (
        (F.col("c_t") + 1).cast("double") / (F.col("n_t") + 64)
    ) / ((F.col("c_s") + 1).cast("double") / (F.col("n_s") + 64))
    model = counts.select("b", ratio.cast("decimal(28,12)").alias("r"))
    return (
        feat.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (F.sum("r").cast("double") / F.count("*")).alias("dsir_weight"),
        )
    )


# ---- BM25 ranked retrieval ------------------------------------------
# The classic IR scoring operator a retrieval-augmented pipeline needs.
# Engine-exactness discipline: idf is the RATIONAL Robertson form
# (N - df + 0.5)/(df + 0.5) WITHOUT the logarithm (Math.log and libm
# may differ in the last ulp — same reason q_lm_score is log-free), the
# per-(doc,term) score is one double expression tree identical on both
# engines, and the over-terms sum goes through the decimal-cast
# discipline so it is order-invariant.
_BM25_TERMS = ["stream", "join", "filter"]
_BM25_K1, _BM25_B = 1.2, 0.75

# The dl/stats/tf/df/scored/total CTE chain over an upstream tok
# (doc_id, t) CTE — shared verbatim by the q_bm25_search oracle and the
# q_bm25_rerank stage-1 oracle (queries/corpus.py), so the two stay one
# scorer by construction.
_BM25_SCORE_CTES = f"""
    dl AS (SELECT doc_id, COUNT(*) AS len FROM tok GROUP BY doc_id),
    stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
               CAST(SUM(len) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, t, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM tok WHERE t IN ('stream', 'join', 'filter')
        GROUP BY doc_id, t
    ),
    df AS (SELECT t, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY t),
    scored AS (
        SELECT tf.doc_id,
               ((stats.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * ({_BM25_K1} + 1.0))
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * (CAST(dl.len AS DOUBLE) / stats.avgdl)))
               AS s
        FROM tf JOIN dl USING (doc_id) JOIN df USING (t), stats
    ),
    total AS (
        SELECT doc_id,
               CAST(SUM(CAST(s AS DECIMAL(28,12))) AS DOUBLE) AS bm25
        FROM scored GROUP BY doc_id
    )
"""

_BM25_SQL = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents
    ),
    {_BM25_SCORE_CTES.strip().rstrip()}
    SELECT doc_id, bm25, rank FROM (
        SELECT doc_id, bm25,
               CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
                   AS rank
        FROM total
    ) WHERE rank <= 20
"""


def bm25_doc_scores(tok) -> "DataFrame":
    """(doc_id, bm25) from a (doc_id, t) token frame — the one BM25
    scorer (k1/b/terms above) behind q_bm25_search and
    q_bm25_rerank's stage 1: Robertson idf, per-(doc,term) double
    expression tree identical on both engines, decimal-cast
    order-invariant over-terms sum."""
    from .aggregates import attach_scalar

    dl = tok.groupBy("doc_id").agg(F.count("*").alias("len"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("len").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("t").isin(_BM25_TERMS))
        .groupBy("doc_id", "t")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("t").agg(F.count("*").cast("double").alias("df"))
    k1, b = _BM25_K1, _BM25_B
    scored = attach_scalar(
        tf.join(dl, "doc_id").join(F.broadcast(dfreq), "t"), stats
    ).select(
        "doc_id",
        (
            ((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * (F.col("len").cast("double") / F.col("avgdl")))
            )
        ).alias("s"),
    )
    return scored.groupBy("doc_id").agg(
        F.sum(F.col("s").cast("decimal(28,12)")).cast("double").alias("bm25")
    )



@register(
    "q_bm25_search",
    _BM25_SQL,
    doc="BM25 ranked retrieval (k1=1.2, b=0.75) for a fixed term query "
        "— the lexical-search operator of a RAG/retrieval pipeline, "
        "complementing the embedding ANN paths. Log-free rational "
        "Robertson idf (same monotone ordering; Math.log/libm differ "
        "in final ulps), one identical double expression tree per "
        "(doc, term) on both engines, decimal-cast over-terms sum "
        "(order-invariant), deterministic top-20 with doc_id "
        "tiebreak. Shuffles: token tf aggregate + doc-length "
        "aggregate + the final rank — df and corpus stats are "
        "term-count-sized broadcasts.",
)
def q_bm25_search(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(T.tokens("text")).alias("t"))
    total = bm25_doc_scores(tok)
    # TakeOrderedAndProject first (scale-safe top-k — per-partition
    # heaps, no global sort), THEN the rank window over the k=20
    # surviving rows: its single-partition exchange moves 20 rows —
    # bounded metadata, allowlisted in the registry-wide window gate
    top = total.orderBy(F.col("bm25").desc(), F.col("doc_id")).limit(20)
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "doc_id", "bm25", "rank"
    )


# ---- Gopher quality rules -------------------------------------------
_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


@register(
    "q_gopher_rules",
    f"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(trim(text), '\\s+') AS toks,
               text
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               len(toks) AS n_words,
               list_sum(list_transform(toks, w -> strlen(w))) AS sum_len,
               len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
                   AS n_alpha_words,
               len(list_intersect(list_distinct(toks),
                   ['the','be','to','of','and','that','have','with']))
                   AS n_stopwords,
               len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_symbols
        FROM t
    )
    SELECT doc_id, n_words,
           (n_words BETWEEN 50 AND 100000) AS ok_word_count,
           (CAST(sum_len AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0)
               AS ok_mean_word_len,
           (CAST(n_symbols AS DOUBLE) / n_words <= 0.1) AS ok_symbol_ratio,
           (CAST(n_alpha_words AS DOUBLE) / n_words >= 0.8) AS ok_alpha_frac,
           (n_stopwords >= 2) AS ok_stopwords,
           ((n_words BETWEEN 50 AND 100000)
            AND (CAST(sum_len AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0)
            AND (CAST(n_symbols AS DOUBLE) / n_words <= 0.1)
            AND (CAST(n_alpha_words AS DOUBLE) / n_words >= 0.8)
            AND (n_stopwords >= 2)) AS gopher_pass
    FROM m
    """,
    doc="Gopher quality rules (Rae et al. 2021 §A1.1 — the canonical "
        "pretraining quality filter): word-count bounds, mean word "
        "length 3-10, symbol-to-word ratio (# / ellipsis) ≤ 0.1, "
        "≥ 80% words containing an alphabetic character, ≥ 2 distinct "
        "required stopwords. Pure JVM array/regex expressions, one "
        "pass, zero shuffle; every ratio compares ints cast to double "
        "in the same expression tree on both engines.",
)
def q_gopher_rules(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens("text")
    n_words = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS]),
        )
    )
    n_symbols = F.size(F.regexp_extract_all("text", F.lit(r"#|\.\.\."), F.lit(0)))
    ok_wc = (n_words >= 50) & (n_words <= 100000)
    mwl = sum_len.cast("double") / n_words
    ok_mwl = (mwl >= 3.0) & (mwl <= 10.0)
    ok_sym = (n_symbols.cast("double") / n_words) <= 0.1
    ok_alpha = (n_alpha.cast("double") / n_words) >= 0.8
    ok_stop = n_stop >= 2
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_alpha.alias("ok_alpha_frac"),
        ok_stop.alias("ok_stopwords"),
        (ok_wc & ok_mwl & ok_sym & ok_alpha & ok_stop).alias("gopher_pass"),
    )


@register(
    "q_text_normalize",
    """
    WITH n AS (
        SELECT doc_id, text,
               trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                   ' +', ' ', 'g')) AS norm
        FROM documents
    )
    SELECT doc_id, norm,
           (norm <> text) AS changed,
           md5(norm) AS norm_fp
    FROM n
    """,
    doc="Canonical text normalization (the cleaning step before exact "
        "dedup): lowercase → non-alphanumerics to spaces → whitespace "
        "collapse → trim, with an md5 fingerprint of the normal form "
        "(what normalized exact-dedup keys on). Pure JVM string "
        "expressions, zero shuffle; identical regex semantics on both "
        "engines for these character-class patterns.",
)
def q_text_normalize(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm"),
        (norm != F.col("text")).alias("changed"),
        F.md5(norm).alias("norm_fp"),
    )


@register(
    "q_chunk_reassembly",
    """
    SELECT doc_id, md5(text) AS original_fp, md5(text) AS reassembled_fp,
           TRUE AS round_trip_ok
    FROM documents
    WHERE len(string_split_regex(trim(text), '\\s+')) >= 1
    """,
    doc="Chunking ROUND-TRIP certificate (the inverse of q_udtf_chunks "
        "— RAG pipelines must be able to reconstruct documents from "
        "their chunk store): documents are exploded into 20-token "
        "chunks by the Python UDTF, the chunks are reassembled "
        "DISTRIBUTED (sorted collect per doc, order by chunk_idx) and "
        "the md5 of the reassembly must equal the original "
        "fingerprint. A lost chunk, a boundary off-by-one, or an "
        "unstable chunk order breaks the hash equality the oracle "
        "asserts as literal TRUE.",
)
def q_chunk_reassembly(spark, sf_dir):
    from ..operators.text import chunk_documents_udtf

    spark.udtf.register("chunk_documents_r", chunk_documents_udtf(20))
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents_reasm_v")
    chunks = spark.sql(
        """
        SELECT doc_id, c.chunk_idx, c.chunk
        FROM documents_reasm_v, LATERAL chunk_documents_r(text) c
        """
    )
    reassembled = (
        chunks.select(
            "doc_id", F.struct("chunk_idx", "chunk").alias("p")
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("p")), lambda s: s["chunk"]),
                " ",
            ).alias("reassembled")
        )
    )
    # the chunker tokenizes on whitespace, so the round trip reproduces
    # the TOKEN stream; compare against the same canonical join of the
    # original's tokens
    orig = docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("original_fp"),
        F.md5(F.array_join(T.tokens("text"), " ")).alias("token_fp"),
    )
    return (
        orig.join(reassembled, "doc_id")
        .select(
            "doc_id",
            "original_fp",
            F.md5(F.col("reassembled")).alias("reassembled_fp"),
            (F.md5(F.col("reassembled")) == F.col("token_fp")).alias(
                "round_trip_ok"
            ),
        )
    )


@register(
    "q_corpus_datasheet",
    """
    WITH base AS (
        SELECT doc_id, source, lang,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens,
               md5(text) AS fp
        FROM documents
    ),
    fp_counts AS (
        SELECT fp, COUNT(*) AS n_fp FROM base GROUP BY fp
    )
    SELECT b.source,
           COUNT(*) AS n_docs,
           CAST(SUM(b.n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(b.n_tokens) AS DOUBLE) / COUNT(*) AS mean_tokens,
           CAST(MIN(b.n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(b.n_tokens) AS BIGINT) AS max_tokens,
           COUNT(DISTINCT b.lang) AS n_langs,
           CAST(COUNT(*) FILTER (WHERE f.n_fp > 1) AS BIGINT)
               AS n_exact_dup_docs
    FROM base b JOIN fp_counts f USING (fp)
    GROUP BY b.source
    """,
    doc="Per-source CORPUS DATASHEET (the 'datasheets for datasets' "
        "governance summary a training-data release ships): document "
        "and token counts, token-length envelope, language diversity, "
        "and exact-duplicate exposure (docs whose fingerprint appears "
        "more than once corpus-wide) — all in one grouped pass plus a "
        "fingerprint frequency join. Integer stats exact; the one "
        "ratio is a single double division.",
)
def q_corpus_datasheet(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        T.token_count("text").cast("long").alias("n_tokens"),
        F.md5("text").alias("fp"),
    )
    fp_counts = docs.groupBy("fp").agg(F.count("*").alias("n_fp"))
    return (
        docs.join(fp_counts, "fp")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.sum("n_tokens").cast("double") / F.count("*")).alias("mean_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum((F.col("n_fp") > 1).cast("long")).alias("n_exact_dup_docs"),
        )
    )


# ---- tokenizer-training + collocation primitives (round 5) ----------


@register(
    "q_bpe_merge_step",
    r"""
    WITH words AS (
        SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x <> '')) AS w
        FROM documents
    ),
    wc AS (SELECT w, COUNT(*) AS cnt FROM words GROUP BY w),
    pairs AS (
        SELECT unnest(list_transform(range(1, length(w)),
                      i -> substring(w, CAST(i AS INT), 2))) AS pair,
               cnt
        FROM wc WHERE length(w) >= 2
    )
    SELECT pair, CAST(SUM(cnt) AS BIGINT) AS pair_count
    FROM pairs GROUP BY pair ORDER BY pair_count DESC, pair LIMIT 10
    """,
    doc="ONE BPE training iteration (the tokenizer-training primitive "
        "behind every modern vocab): corpus → word frequencies "
        "(map-side-combining hash agg — the vocabulary, not the "
        "corpus, feeds the pair stage) → adjacent-symbol pair counts "
        "weighted by word frequency (in-array transform, no "
        "self-join) → arg-max merge candidates via TakeOrdered top-10 "
        "(count DESC, pair ASC tiebreak). At 100 TB the word-count "
        "agg is the only corpus-sized shuffle; the pair explosion "
        "runs over distinct words only. Iterating = re-running with "
        "the chosen merge applied; one exactly-oracled step "
        "certifies the machinery.",
)
def q_bpe_merge_step(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.filter(T.tokens("text"), lambda x: x != F.lit(""))
        ).alias("w")
    )
    wc = words.groupBy("w").agg(F.count("*").alias("cnt"))
    pairs = wc.filter(F.length("w") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w)-1), i -> substring(w, i, 2))"
            )
        ).alias("pair"),
        "cnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "pair")
        .limit(10)
    )


@register(
    "q_pmi_collocations",
    r"""
    WITH toks AS (
        SELECT list_filter(string_split_regex(trim(text), '\s+'),
                           x -> x <> '') AS t
        FROM documents
    ),
    bg AS (
        SELECT p[1] AS w1, p[2] AS w2, COUNT(*) AS c_ab FROM (
            SELECT unnest(list_transform(range(1, len(t)),
                   i -> [t[CAST(i AS INT)], t[CAST(i AS INT)+1]])) AS p
            FROM toks WHERE len(t) >= 2
        ) GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    uc AS (
        SELECT w, COUNT(*) AS c
        FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS nu FROM uc),
    totb AS (SELECT CAST(SUM(c_ab) AS DOUBLE) AS nb FROM bg)
    SELECT w1 || ' ' || w2 AS bigram, CAST(c_ab AS BIGINT) AS pair_count,
           ((CAST(c_ab AS DOUBLE) / c1.c) * ((SELECT nu FROM tot) / c2.c))
               * ((SELECT nu FROM tot) / (SELECT nb FROM totb)) AS pmi_ratio
    FROM bg JOIN uc c1 ON c1.w = bg.w1 JOIN uc c2 ON c2.w = bg.w2
    ORDER BY pmi_ratio DESC, bigram LIMIT 20
    """,
    doc="Top-20 bigram collocations by pointwise mutual information — "
        "the corpus-analysis primitive for phrase mining and stop-pair "
        "detection. PMI's log argument c(ab)·N²/(c(a)·c(b)·N_b) is "
        "reported as the raw ratio (log is monotone, so the ranking "
        "is identical and the value stays exactly comparable: every "
        "factor is an IEEE division of exact integer counts in "
        "identical association order on both engines). Global totals "
        "attach as uncorrelated SCALAR SUBQUERIES — planned as "
        "ScalarSubquery, not a BNLJ row-attach, so the query stays "
        "out of the no-cartesian allowlist. Bigram and unigram "
        "aggregates are map-side-combining; the vocab joins shuffle "
        "only distinct bigrams; top-k is TakeOrdered. HAVING c_ab ≥ 2 "
        "bounds the join input.",
)
def q_pmi_collocations(spark, sf_dir):
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "pmi_docs_v"
    )
    return spark.sql(
        r"""
        WITH toks AS (
            SELECT filter(split(trim(text), '\\s+'), x -> x <> '') AS t
            FROM pmi_docs_v
        ),
        bg AS (
            SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS c_ab FROM (
                SELECT explode(transform(sequence(1, size(t)-1),
                    i -> named_struct('w1', element_at(t, i),
                                      'w2', element_at(t, i+1)))) AS p
                FROM toks WHERE size(t) >= 2
            ) GROUP BY p.w1, p.w2 HAVING COUNT(*) >= 2
        ),
        uc AS (
            SELECT w, COUNT(*) AS c
            FROM (SELECT explode(t) AS w FROM toks) GROUP BY w
        ),
        tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS nu FROM uc),
        totb AS (SELECT CAST(SUM(c_ab) AS DOUBLE) AS nb FROM bg)
        SELECT concat(w1, ' ', w2) AS bigram, c_ab AS pair_count,
               ((CAST(c_ab AS DOUBLE) / c1.c)
                   * ((SELECT nu FROM tot) / c2.c))
                   * ((SELECT nu FROM tot) / (SELECT nb FROM totb))
                   AS pmi_ratio
        FROM bg JOIN uc c1 ON c1.w = bg.w1 JOIN uc c2 ON c2.w = bg.w2
        ORDER BY pmi_ratio DESC, bigram LIMIT 20
        """
    )


def _bpe_learn_oracle(iters: int = 3) -> str:
    """Unrolled BPE training loop. Word states are symbol sequences
    encoded as strings with each symbol individually wrapped in
    chr(1): ``<d>sym<d><d>sym<d>...`` — merging pair (a,b) is then ONE
    plain ``replace()`` of ``<d>a<d><d>b<d>`` with ``<d>ab<d>``, and
    both engines' replace() scans left-to-right non-overlapping, which
    IS greedy BPE merge-application order. Wrappers never straddle
    neighbors, so no boundary sharing."""
    d = "chr(1)"
    dd = f"{d} || {d}"
    parts = [
        r"""
    WITH words AS (
        SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x <> '')) AS w
        FROM documents
    ),
    wc AS (SELECT w, COUNT(*) AS cnt FROM words GROUP BY w),
    w0 AS (
        SELECT array_to_string(list_transform(
                   range(1, length(w) + 1),
                   i -> chr(1) || substring(w, CAST(i AS INT), 1) || chr(1)
               ), '') AS seq, cnt
        FROM wc
    )"""
    ]
    for k in range(1, iters + 1):
        parts.append(f""",
    s{k} AS (
        SELECT string_split(substring(seq, 2, length(seq) - 2), {dd})
                   AS syms, cnt
        FROM w{k - 1}
    ),
    pc{k} AS (
        SELECT u.p.a AS a, u.p.b AS b, SUM(cnt) AS pc
        FROM s{k}, unnest(list_transform(
                 range(1, len(syms)),
                 i -> {{'a': syms[CAST(i AS INT)],
                        'b': syms[CAST(i AS INT) + 1]}})) u(p)
        WHERE len(syms) >= 2
        GROUP BY 1, 2
    ),
    m{k} AS (SELECT a, b, pc FROM pc{k} ORDER BY pc DESC, a, b LIMIT 1),
    w{k} AS (
        SELECT replace(seq,
                   {d} || (SELECT a FROM m{k}) || {dd}
                        || (SELECT b FROM m{k}) || {d},
                   {d} || (SELECT a FROM m{k})
                        || (SELECT b FROM m{k}) || {d}) AS seq,
               cnt
        FROM w{k - 1}
    )""")
    arms = [
        f"SELECT {k} AS step, (SELECT a FROM m{k}) AS left_sym, "
        f"(SELECT b FROM m{k}) AS right_sym, "
        f"(SELECT a || b FROM m{k}) AS merged, "
        f"CAST((SELECT pc FROM m{k}) AS BIGINT) AS pair_count"
        for k in range(1, iters + 1)
    ]
    arms.append(
        f"SELECT {iters + 1}, '<corpus>', '<corpus>', '<total_symbols>', "
        f"CAST((SELECT SUM(cnt * len(string_split("
        f"substring(seq, 2, length(seq) - 2), {dd}))) FROM w{iters}) "
        f"AS BIGINT)"
    )
    return "".join(parts) + "\n    " + "\n    UNION ALL ".join(arms)


@register(
    "q_bpe_learn",
    _bpe_learn_oracle(3),
    doc="FULL BPE tokenizer TRAINING loop (3 merges), distributed: "
        "word-frequency table once, then per merge (1) adjacent-symbol "
        "pair counts over the DISTINCT vocabulary weighted by word "
        "frequency, (2) argmax merge selection (count DESC, symbols "
        "ASC tiebreak — the deterministic variant of Sennrich et al. "
        "2016), (3) merge APPLICATION to every word state. States are "
        "chr(1)-wrapped symbol strings, so application is one "
        "replace() whose left-to-right non-overlapping scan IS greedy "
        "BPE order — no UDF, no per-row loop. The only driver "
        "transfers are the three 1-row argmax frames (bounded "
        "metadata, same class as q_bloom_join's conf rows); the "
        "corpus is touched once, every iteration runs over the "
        "vocabulary. Output: the 3 learned merges + the post-merge "
        "corpus symbol total (certifying application, not just "
        "selection); whole loop bitwise vs the unrolled-CTE oracle.",
)
def q_bpe_learn(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    d = "\x01"
    words = docs.select(
        F.explode(
            F.filter(T.tokens("text"), lambda x: x != F.lit(""))
        ).alias("w")
    )
    wc = words.groupBy("w").agg(F.count("*").alias("cnt"))
    st = wc.select(
        F.expr(
            "concat_ws('', transform(sequence(1, length(w)), "
            "i -> concat(chr(1), substring(w, i, 1), chr(1))))"
        ).alias("seq"),
        "cnt",
    ).persist()
    syms = F.split(
        F.expr("substring(seq, 2, length(seq) - 2)"), "\x01\x01"
    )
    rows = []
    for step in (1, 2, 3):
        pr = (
            st.withColumn("syms", syms)
            .filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(element_at(syms, i) AS a, "
                        "element_at(syms, i + 1) AS b))"
                    )
                ).alias("p"),
                "cnt",
            )
        )
        best = (
            pr.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("pc"))
            .orderBy(F.col("pc").desc(), "a", "b")
            .limit(1)
            .collect()[0]
        )
        rows.append((step, best["a"], best["b"],
                     best["a"] + best["b"], int(best["pc"])))
        nxt = st.select(
            F.replace(
                F.col("seq"),
                F.lit(d + best["a"] + d + d + best["b"] + d),
                F.lit(d + best["a"] + best["b"] + d),
            ).alias("seq"),
            "cnt",
        ).persist()
        nxt.count()
        st.unpersist()
        st = nxt
    total = st.select(
        F.sum(F.col("cnt") * F.size(syms)).cast("long").alias("t")
    ).collect()[0]["t"]
    st.unpersist()
    rows.append((4, "<corpus>", "<corpus>", "<total_symbols>", int(total)))
    return spark.createDataFrame(
        rows,
        "step int, left_sym string, right_sym string, "
        "merged string, pair_count long",
    )


def _wordpiece_learn_oracle(iters: int = 3) -> str:
    """Unrolled WordPiece training loop — the q_bpe_learn chr(1)-wrapped
    state machinery (see :func:`_bpe_learn_oracle` for the wrapper
    argument) with the argmax scored by the Schuster & Nakajima
    likelihood ratio score(ab) = c_ab·N / (c_a·c_b) over the CURRENT
    symbol inventory instead of raw pair frequency.  Counts are exact
    int64; each score is ONE identical IEEE expression tree
    ((pc·N)/(ca·cb), association order mirrored in the Spark build),
    so the per-step argmax (score DESC, a, b) is engine-identical."""
    d = "chr(1)"
    dd = f"{d} || {d}"
    parts = [
        r"""
    WITH words AS (
        SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x <> '')) AS w
        FROM documents
    ),
    wc AS MATERIALIZED (SELECT w, COUNT(*) AS cnt FROM words GROUP BY w),
    w0 AS MATERIALIZED (
        SELECT array_to_string(list_transform(
                   range(1, length(w) + 1),
                   i -> chr(1) || substring(w, CAST(i AS INT), 1) || chr(1)
               ), '') AS seq, cnt
        FROM wc
    )"""
    ]
    for k in range(1, iters + 1):
        parts.append(f""",
    s{k} AS MATERIALIZED (
        SELECT string_split(substring(seq, 2, length(seq) - 2), {dd})
                   AS syms, cnt
        FROM w{k - 1}
    ),
    pc{k} AS MATERIALIZED (
        SELECT u.p.a AS a, u.p.b AS b, SUM(cnt) AS pc
        FROM s{k}, unnest(list_transform(
                 range(1, len(syms)),
                 i -> {{'a': syms[CAST(i AS INT)],
                        'b': syms[CAST(i AS INT) + 1]}})) u(p)
        WHERE len(syms) >= 2
        GROUP BY 1, 2
    ),
    uc{k} AS MATERIALIZED (
        SELECT u.sym AS sym, SUM(cnt) AS c
        FROM s{k}, unnest(syms) u(sym)
        GROUP BY 1
    ),
    nn{k} AS MATERIALIZED (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uc{k}),
    m{k} AS MATERIALIZED (
        SELECT p.a, p.b, p.pc, ca.c AS ca, cb.c AS cb,
               (SELECT n FROM nn{k}) AS n,
               CAST(p.pc AS DOUBLE)
                   * CAST((SELECT n FROM nn{k}) AS DOUBLE)
                   / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)) AS score
        FROM pc{k} p
        JOIN uc{k} ca ON ca.sym = p.a
        JOIN uc{k} cb ON cb.sym = p.b
        ORDER BY score DESC, p.a, p.b LIMIT 1
    ),
    w{k} AS MATERIALIZED (
        SELECT replace(seq,
                   {d} || (SELECT a FROM m{k}) || {dd}
                        || (SELECT b FROM m{k}) || {d},
                   {d} || (SELECT a FROM m{k})
                        || (SELECT b FROM m{k}) || {d}) AS seq,
               cnt
        FROM w{k - 1}
    )""")
    arms = [
        f"SELECT {k} AS step, (SELECT a FROM m{k}) AS left_sym, "
        f"(SELECT b FROM m{k}) AS right_sym, "
        f"(SELECT a || b FROM m{k}) AS merged, "
        f"CAST((SELECT pc FROM m{k}) AS BIGINT) AS pair_count, "
        f"CAST((SELECT ca FROM m{k}) AS BIGINT) AS left_count, "
        f"CAST((SELECT cb FROM m{k}) AS BIGINT) AS right_count, "
        f"CAST((SELECT n FROM m{k}) AS BIGINT) AS n_units, "
        f"(SELECT score FROM m{k}) AS score"
        for k in range(1, iters + 1)
    ]
    arms.append(
        f"SELECT {iters + 1}, '<corpus>', '<corpus>', '<total_symbols>', "
        f"CAST((SELECT SUM(cnt * len(string_split("
        f"substring(seq, 2, length(seq) - 2), {dd}))) FROM w{iters}) "
        f"AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), "
        f"CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)"
    )
    return "".join(parts) + "\n    " + "\n    UNION ALL ".join(arms)


@register(
    "q_wordpiece_learn",
    _wordpiece_learn_oracle(3),
    doc="FULL WORDPIECE tokenizer TRAINING loop (3 merges) — the "
        "iterated q_bpe_learn analogue that completes the trainer-"
        "family symmetry (BPE: q_bpe_merge_step/q_bpe_learn; unigram: "
        "q_unigram_lm_train; WordPiece: q_wordpiece_step/this): per "
        "iteration (1) adjacent-symbol pair counts AND current-symbol "
        "unit counts over the DISTINCT vocabulary weighted by word "
        "frequency, (2) argmax by the likelihood ratio "
        "score(ab) = c_ab*N/(c_a*c_b) (Schuster & Nakajima 2012 — "
        "score DESC, symbols ASC tiebreak; one identical IEEE "
        "expression tree over exact int64 counts), (3) merge "
        "application via the chr(1)-wrapped replace() (left-to-right "
        "non-overlapping scan IS greedy merge order — no UDF).  The "
        "only driver transfers are the three 1-row argmax frames; the "
        "corpus is touched once, every iteration runs over the "
        "vocabulary, unit tables broadcast into the scoring join.  "
        "Output: the 3 learned merges with their full score "
        "decomposition + the post-merge corpus symbol total "
        "(certifying application, not just selection); whole loop "
        "bitwise vs the unrolled-CTE oracle.",
)
def q_wordpiece_learn(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    d = "\x01"
    words = docs.select(
        F.explode(
            F.filter(T.tokens("text"), lambda x: x != F.lit(""))
        ).alias("w")
    )
    wc = words.groupBy("w").agg(F.count("*").alias("cnt"))
    st = wc.select(
        F.expr(
            "concat_ws('', transform(sequence(1, length(w)), "
            "i -> concat(chr(1), substring(w, i, 1), chr(1))))"
        ).alias("seq"),
        "cnt",
    ).persist()
    syms = F.split(
        F.expr("substring(seq, 2, length(seq) - 2)"), "\x01\x01"
    )
    rows = []
    for step in (1, 2, 3):
        sy = st.withColumn("syms", syms)
        pairs = (
            sy.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(element_at(syms, i) AS a, "
                        "element_at(syms, i + 1) AS b))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("pc"))
        )
        units = (
            sy.select(F.explode("syms").alias("sym"), "cnt")
            .groupBy("sym")
            .agg(F.sum("cnt").alias("c"))
            .localCheckpoint(eager=True)
        )
        n = int(units.agg(F.sum("c")).first()[0])
        ca = units.select(F.col("sym").alias("sa"), F.col("c").alias("ca"))
        cb = units.select(F.col("sym").alias("sb"), F.col("c").alias("cb"))
        best = (
            pairs.join(F.broadcast(ca), F.col("a") == F.col("sa"))
            .join(F.broadcast(cb), F.col("b") == F.col("sb"))
            .select(
                "a", "b", "pc", "ca", "cb",
                (
                    F.col("pc").cast("double") * F.lit(float(n))
                    / (F.col("ca").cast("double") * F.col("cb").cast("double"))
                ).alias("score"),
            )
            .orderBy(F.col("score").desc(), "a", "b")
            .limit(1)
            .collect()[0]
        )
        rows.append(
            (step, best["a"], best["b"], best["a"] + best["b"],
             int(best["pc"]), int(best["ca"]), int(best["cb"]), n,
             float(best["score"]))
        )
        nxt = st.select(
            F.replace(
                F.col("seq"),
                F.lit(d + best["a"] + d + d + best["b"] + d),
                F.lit(d + best["a"] + best["b"] + d),
            ).alias("seq"),
            "cnt",
        ).persist()
        nxt.count()
        st.unpersist()
        st = nxt
    total = st.select(
        F.sum(F.col("cnt") * F.size(syms)).cast("long").alias("t")
    ).collect()[0]["t"]
    st.unpersist()
    rows.append(
        (4, "<corpus>", "<corpus>", "<total_symbols>", int(total),
         None, None, None, None)
    )
    return spark.createDataFrame(
        rows,
        "step int, left_sym string, right_sym string, merged string, "
        "pair_count long, left_count long, right_count long, "
        "n_units long, score double",
    )


@register(
    "q_inverted_index_incremental",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents
    ),
    postings AS (
        SELECT t AS term, doc_id, COUNT(*) AS tf
        FROM tok
        WHERE t IN ('stream', 'join', 'filter')
        GROUP BY t, doc_id
    )
    SELECT term,
           COUNT(*) AS n_docs,
           CAST(SUM(tf) AS BIGINT) AS total_tf,
           CAST(MAX(tf) AS BIGINT) AS max_tf
    FROM postings GROUP BY term
    """,
    doc="PERSISTED INVERTED INDEX with INCREMENTAL MAINTENANCE: the "
        "postings list (term, doc_id, tf) lives in a VersionedTable; "
        "an initial build covers 2/3 of the corpus and a later "
        "ingestion batch appends postings computed from ONLY the new "
        "documents — the index updates at batch cost, never corpus "
        "cost (at 100 TB, re-tokenizing the whole corpus per batch is "
        "the difference between minutes and days). RAISES unless the "
        "incremental append touched exactly the new docs' postings "
        "(count certified against a direct recount of the batch) and "
        "landed as one new version. Term lookups then read the "
        "postings table — an equi-scan on the term key, the shape "
        "that serves q_bm25_search's df/tf stage from storage instead "
        "of recomputing it. Oracle: full-corpus tokenize of the same "
        "three terms.",
)
def q_inverted_index_incremental(spark, sf_dir):
    from .merge import scratch_dir
    from ..sources.table import VersionedTable

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    terms = ["stream", "join", "filter"]

    def postings_of(frame):
        return (
            frame.select("doc_id", F.explode(T.tokens("text")).alias("t"))
            .filter(F.col("t").isin(terms))
            .groupBy(F.col("t").alias("term"), "doc_id")
            .agg(F.count("*").alias("tf"))
        )

    base = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    idx = VersionedTable(spark, scratch_dir("invidx"))
    idx.write(postings_of(base), mode="overwrite")
    v0 = idx.latest_version()
    batch_postings = postings_of(batch)  # tokenizes ONLY the new docs
    idx.write(batch_postings, mode="append")
    if idx.latest_version() != v0 + 1:
        raise AssertionError("incremental append must commit exactly one version")
    added = idx.read().count() - idx.read(version=v0).count()
    if added != batch_postings.count():
        raise AssertionError(
            f"index grew by {added} postings, batch recount says {batch_postings.count()}"
        )
    return (
        idx.read()
        .groupBy("term")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tf").cast("long").alias("total_tf"),
            F.max("tf").cast("long").alias("max_tf"),
        )
    )


# ---- hybrid retrieval fusion ----------------------------------------
from .similarity import _COS_SQL as _COS_SQL_AB  # noqa: E402


@register(
    "q_rrf_fusion",
    f"""
    WITH bm AS ({_BM25_SQL}),
    dense AS (
        SELECT neighbor_id AS doc_id, cos_rank FROM (
            SELECT b.vec_id AS neighbor_id,
                   CAST(row_number() OVER (
                       ORDER BY ({_COS_SQL_AB}) DESC, b.vec_id
                   ) AS BIGINT) AS cos_rank
            FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
            WHERE a.vec_id = 0
        ) WHERE cos_rank <= 20
    ),
    fused AS (
        SELECT COALESCE(bm.doc_id, dense.doc_id) AS doc_id,
               COALESCE(bm.rank, 0) AS bm25_rank,
               COALESCE(dense.cos_rank, 0) AS cos_rank,
               COALESCE(1000000000000 // (60 + bm.rank), 0)
             + COALESCE(1000000000000 // (60 + dense.cos_rank), 0)
                   AS rrf_score
        FROM bm FULL OUTER JOIN dense ON bm.doc_id = dense.doc_id
    )
    SELECT doc_id, bm25_rank, cos_rank, rrf_score FROM (
        SELECT *, row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rn
        FROM fused
    ) WHERE rn <= 10
    """,
    doc="RECIPROCAL RANK FUSION (k=60) of two retrieval systems over "
        "the same corpus: BM25 lexical top-20 (q_bm25_search's exact "
        "pipeline) and exact cosine top-20 for query vector 0 "
        "(doc_id = vec_id pairing, the corpus's embedding column) — "
        "the standard hybrid-search merge in RAG stacks, where "
        "neither ranker's score scale is trusted, only its ranks. "
        "Scores are EXACT INTEGERS: contribution = 10^12 div "
        "(60 + rank) via integer division on both engines (the "
        "float 1/(60+r) form would hinge on libm), absent ranks "
        "contribute 0, fused top-10 tie-breaks on doc_id. Plan: the "
        "two rankers' 20-row outputs full-outer-join on doc_id — "
        "bounded frames, so every post-ranker stage is metadata-"
        "sized; the rankers themselves reuse the scale-audited BM25 "
        "and broadcast-query brute-force paths (the 1-query BNLJ is "
        "in the bounded allowlist).",
)
def q_rrf_fusion(spark, sf_dir):
    from ..operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    bm = q_bm25_search(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("bm25_rank")
    )
    dense = brute_force_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=20
    ).select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("sim_rank").cast("long").alias("cos_rank"),
    )
    fused = (
        bm.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("bm25_rank", F.lit(0)).alias("bm25_rank"),
            F.coalesce("cos_rank", F.lit(0)).alias("cos_rank"),
            (
                F.coalesce(
                    F.expr("1000000000000 div (60 + bm25_rank)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr("1000000000000 div (60 + cos_rank)"), F.lit(0)
                )
            ).alias("rrf_score"),
        )
    )
    return fused.orderBy(F.col("rrf_score").desc(), "doc_id").limit(10)


@register(
    "q_unigram_surprisal",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents
    ),
    voc AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM voc),
    ic AS (
        SELECT w, CAST(length(bin(t // c)) - 1 AS BIGINT) AS bits
        FROM voc, tot
    )
    SELECT k.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(bits) AS BIGINT) AS sum_bits,
           CAST(MAX(bits) AS BIGINT) AS max_bits,
           CAST(SUM(bits) AS DOUBLE) / COUNT(*) AS mean_bits
    FROM tok k JOIN ic USING (w)
    GROUP BY k.doc_id
    """,
    doc="Unigram-LM SURPRISAL quality filter (the CCNet/RedPajama "
        "perplexity-filter shape, made exactly cross-engine): train a "
        "unigram model ON the corpus, then score each document by its "
        "total and mean per-token surprisal. Instead of libm ln() "
        "(which drifts between engines), surprisal is quantized to "
        "EXACT INTEGER BITS: floor(log2(total/count)) computed with no "
        "FP at all via floor(log2(x)) = floor(log2(floor(x))) = "
        "len(bin(total DIV count)) - 1 — within 1 bit of the true "
        "Shannon surprisal, which is all a keep/drop gate needs. Low "
        "mean_bits = boilerplate/repetitive, high = rare-token noise; "
        "the CCNet recipe drops both tails. The single division in "
        "mean_bits is one IEEE op on exact integers, so the whole "
        "output is bitwise. Shape: one token explode + count (map-side "
        "combining), the 1-row total attaches to the VOCAB frame (not "
        "the corpus — O(vocab) BNLJ, see attach_scalar's contract), "
        "the ic model broadcasts to the token stream, one per-doc "
        "aggregate. At open-vocabulary 100 TB the broadcast becomes a "
        "shuffle join on the token key; everything else is unchanged.",
)
def q_unigram_surprisal(spark, sf_dir):
    from .aggregates import attach_scalar

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(T.tokens("text")).alias("w"))
    voc = tok.groupBy("w").agg(F.count("*").alias("c"))
    tot = voc.agg(F.sum("c").cast("long").alias("t"))
    ic = attach_scalar(voc, tot).select(
        "w",
        (F.length(F.bin(F.expr("t DIV c"))) - 1).cast("long").alias("bits"),
    )
    return (
        tok.join(F.broadcast(ic), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("bits").cast("long").alias("sum_bits"),
            F.max("bits").cast("long").alias("max_bits"),
            (F.sum("bits").cast("double") / F.count("*")).alias("mean_bits"),
        )
    )


@register(
    "q_nucleus_selection",
    """
    WITH scored AS (
        SELECT source, doc_id, n_chars,
               SUM(n_chars) OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_chars AS cum_before,
               SUM(n_chars) OVER (PARTITION BY source) AS total
        FROM documents
    ),
    kept AS (
        SELECT * FROM scored WHERE 10 * cum_before < 9 * total
    )
    SELECT source,
           COUNT(*) AS n_selected,
           CAST(SUM(n_chars) AS BIGINT) AS chars_selected,
           CAST(MAX(total) AS BIGINT) AS chars_total,
           CAST(SUM(n_chars) AS DOUBLE) / MAX(total) AS mass_share
    FROM kept GROUP BY source
    """,
    doc="NUCLEUS (top-p, p=0.9) SELECTION per source — the "
        "top-p-sampling idea applied to corpus curation: within each "
        "source, keep the smallest prefix of docs (ordered by score "
        "desc, here n_chars with doc_id tiebreak) whose mass reaches "
        "90% of the source total; everything past the nucleus is the "
        "long tail a budgeted training run drops first. The predicate "
        "is EXACT INTEGER arithmetic (10*cum_before < 9*total — no "
        "0.9 float, no division) over a PARTITIONED running-sum "
        "window (per-source partitions — no SinglePartition exchange) "
        "plus the partition-total window on the same exchange. "
        "Boundary semantics: a doc enters the nucleus iff the mass "
        "BEFORE it is under the threshold, so the nucleus always "
        "crosses p with its last member — the standard top-p rule. "
        "One shuffle on source; bitwise oracle.",
)
def q_nucleus_selection(spark, sf_dir):
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w_cum = (
        Window.partitionBy("source")
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("source")
    scored = docs.select(
        "source",
        "doc_id",
        "n_chars",
        (F.sum("n_chars").over(w_cum) - F.col("n_chars")).alias("cum_before"),
        F.sum("n_chars").over(w_all).alias("total"),
    )
    kept = scored.filter(F.lit(10) * F.col("cum_before") < F.lit(9) * F.col("total"))
    return kept.groupBy("source").agg(
        F.count("*").alias("n_selected"),
        F.sum("n_chars").cast("long").alias("chars_selected"),
        F.max("total").cast("long").alias("chars_total"),
        (F.sum("n_chars").cast("double") / F.max("total")).alias("mass_share"),
    )


def _calibration_oracle_sql() -> str:
    hits = {
        lang: _lang_score_sql(words) for lang, words in T.LANG_STOPWORDS.items()
    }
    total = " + ".join(hits.values())
    return f"""
    WITH scored AS (
        SELECT doc_id,
               CAST({hits['en']} AS DOUBLE)
                   / (CAST(({total}) AS DOUBLE) + 1.0) AS conf,
               lang = 'en' AS outcome
        FROM documents
    ),
    binned AS (
        SELECT CAST(floor(conf * 10.0) AS BIGINT) AS bin,
               COUNT(*) AS n,
               CAST(SUM(CAST(conf AS DECIMAL(9,7))) AS DOUBLE) AS sum_conf,
               CAST(SUM(CASE WHEN outcome THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        FROM scored GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM binned),
    terms AS (
        SELECT b.bin, b.n, b.n_pos,
               b.sum_conf / b.n AS mean_conf,
               CAST(b.n_pos AS DOUBLE) / b.n AS accuracy,
               (CAST(b.n AS DOUBLE) / t.n_total)
                   * abs(CAST(b.n_pos AS DOUBLE) / b.n - b.sum_conf / b.n) AS term
        FROM binned b, tot t
    )
    SELECT bin, CAST(n AS BIGINT) AS n_docs, mean_conf, accuracy,
           (SELECT list_sum(list_sort(list(term))) FROM terms) AS ece
    FROM terms
    """


@register(
    "q_calibration_bins",
    _calibration_oracle_sql(),
    doc="RELIABILITY DIAGRAM + expected calibration error for the "
        "heuristic English-confidence score (en stopword hits over "
        "total stopword hits + 1) against the true lang label — the "
        "model-eval harness every classifier feeding a pipeline gate "
        "needs: per equal-width confidence bin, mean confidence vs "
        "observed accuracy, and ECE = sum n_b/n * |acc_b - conf_b|. "
        "Exactness: confidence is one IEEE division per doc; per-bin "
        "confidence sums quantize at tie-proof DECIMAL(9,7) (|v| < 1, "
        "scale 7 — the NOTES half-up-regime rule); the <= 10 ECE "
        "terms fold in canonical sorted order (the q_chi2 recipe). "
        "One scan + one 10-row aggregate. Bitwise.",
)
def q_calibration_bins(spark, sf_dir):
    from .aggregates import attach_scalar

    docs = load_table(spark, sf_dir, "documents")
    scores = T.language_scores("text")
    total = None
    for c in scores.values():
        total = c if total is None else total + c
    conf = scores["en"].cast("double") / (total.cast("double") + F.lit(1.0))
    scored = docs.select(
        conf.alias("conf"), (F.col("lang") == "en").alias("outcome")
    )
    binned = scored.groupBy(
        F.floor(F.col("conf") * 10.0).cast("long").alias("bin")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("conf").cast("decimal(9,7)")).cast("double").alias("sum_conf"),
        F.sum(F.col("outcome").cast("int")).cast("long").alias("n_pos"),
    )
    tot = binned.agg(F.sum("n").cast("long").alias("n_total"))
    terms = attach_scalar(binned, tot).select(
        "bin",
        "n",
        "n_pos",
        (F.col("sum_conf") / F.col("n")).alias("mean_conf"),
        (F.col("n_pos").cast("double") / F.col("n")).alias("accuracy"),
        (
            (F.col("n").cast("double") / F.col("n_total"))
            * F.abs(
                F.col("n_pos").cast("double") / F.col("n")
                - F.col("sum_conf") / F.col("n")
            )
        ).alias("term"),
    )
    ece_frame = terms.agg(
        F.aggregate(
            F.array_sort(F.collect_list("term")), F.lit(0.0), lambda a, x: a + x
        ).alias("ece")
    )
    return attach_scalar(terms, ece_frame).select(
        "bin",
        F.col("n").cast("long").alias("n_docs"),
        "mean_conf",
        "accuracy",
        "ece",
    )


_GEN_STEPS = 8


def _lm_generate_oracle_sql() -> str:
    chain = [
        """big AS (
        SELECT w1, w2, COUNT(*) AS c FROM (
            SELECT ts[i] AS w1, ts[i + 1] AS w2
            FROM (SELECT string_split_regex(trim(text), '\\s+') AS ts
                  FROM documents),
                 unnest(range(1, len(ts))) u(i)
        ) GROUP BY 1, 2
    )""",
        """uni AS (
        SELECT w1 AS w, SUM(c) AS c FROM big GROUP BY w1
    )""",
        """s0 AS (
        SELECT w AS token FROM uni ORDER BY c DESC, w LIMIT 1
    )""",
    ]
    for i in range(1, _GEN_STEPS):
        chain.append(
            f"""s{i} AS (
        SELECT b.w2 AS token FROM big b, s{i - 1} p
        WHERE b.w1 = p.token ORDER BY b.c DESC, b.w2 LIMIT 1
    )"""
        )
    arms = "\n    UNION ALL ".join(
        f"SELECT {i} AS step, token FROM s{i}" for i in range(_GEN_STEPS)
    )
    return "WITH " + ",\n    ".join(chain) + "\n    " + arms


@register(
    "q_lm_generate",
    _lm_generate_oracle_sql(),
    doc="GREEDY GENERATION from the corpus-trained bigram LM — the "
        "train-then-sample loop closed entirely inside the engine: "
        "the q_lm_score bigram counts are the model; decoding starts "
        "at the highest-frequency token and follows argmax "
        "P(next|cur) for 8 steps (count-desc, lexicographic "
        "tiebreak — fully deterministic greedy decoding; cycles are "
        "legitimate greedy behavior and reproduce identically). The "
        "distributed work is the ONE bigram-count aggregate (persist-"
        "once); each decode step is an argmax probe of the cached "
        "model — 8 metadata-sized jobs, the iterative-trainer pattern "
        "(IVF/k-core precedent). Both engines walk the identical "
        "chain — bitwise.",
)
def q_lm_generate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    big = (
        docs.select(F.explode(T.token_ngrams("text", 2)).alias("bg"))
        .select(
            F.substring_index("bg", " ", 1).alias("w1"),
            F.substring_index("bg", " ", -1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    try:
        start = (
            big.groupBy("w1")
            .agg(F.sum("c").alias("c"))
            .orderBy(F.col("c").desc(), "w1")
            .limit(1)
            .collect()[0]
            .w1
        )
        out = [(0, start)]
        cur = start
        for i in range(1, _GEN_STEPS):
            nxt = (
                big.filter(F.col("w1") == cur)
                .orderBy(F.col("c").desc(), "w2")
                .limit(1)
                .collect()
            )
            if not nxt:
                break  # dead end: cur never starts a bigram — the
                # oracle's s_i CTEs go empty from here too, so both
                # sides emit the same truncated chain
            cur = nxt[0].w2
            out.append((i, cur))
    finally:
        big.unpersist()
    return spark.createDataFrame(out, "step int, token string")


@register(
    "q_sequence_packing",
    """
    WITH c AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens,
               SUM(CAST(len(string_split_regex(trim(text), '\\s+'))
                        AS BIGINT))
                   OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS tok_start,
           CAST((cum - n_tokens) // 512 AS BIGINT) AS first_seq,
           CAST((cum - 1) // 512 AS BIGINT) AS last_seq,
           CAST((cum - 1) // 512 - (cum - n_tokens) // 512 + 1 AS BIGINT)
               AS n_seqs
    FROM c
    """,
    doc="SEQUENCE PACKING MAP (GPT-style concat-and-chunk): documents "
        "concatenate in deterministic doc_id order into one token "
        "stream split every 512 tokens; each document's placement "
        "(global token offset, first/last packed sequence, sequences "
        "spanned) is the map an LLM trainer uses to pack batches and "
        "mask cross-document attention. The global running offset "
        "comes from operators/indexing.distributed_prefix_sum (range "
        "exchange + per-partition bases — k scalars to the driver), "
        "NEVER a single-partition window: the one global-cumsum shape "
        "that scales to a 100 TB corpus. Pure integer arithmetic — "
        "value-checks bitwise.",
)
def q_sequence_packing(spark, sf_dir):
    from ..operators.indexing import distributed_prefix_sum
    from ..operators.text import token_count

    seq_len = 512
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    cum = distributed_prefix_sum(counts, ["doc_id"], ["n_tokens"])
    tok_start = F.col("cum_n_tokens") - F.col("n_tokens")
    first_seq = F.expr(f"(cum_n_tokens - n_tokens) div {seq_len}")
    last_seq = F.expr(f"(cum_n_tokens - 1) div {seq_len}")
    return cum.select(
        "doc_id",
        "n_tokens",
        tok_start.alias("tok_start"),
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (last_seq - first_seq + 1).alias("n_seqs"),
    )


@register(
    "q_packing_stats",
    """
    WITH c AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens,
               SUM(CAST(len(string_split_regex(trim(text), '\\s+'))
                        AS BIGINT))
                   OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents
    ),
    placed AS (
        SELECT doc_id,
               CAST(cum - n_tokens AS BIGINT) AS tok_start,
               CAST(cum AS BIGINT) AS tok_end,
               CAST((cum - n_tokens) // 512 AS BIGINT) AS first_seq,
               CAST((cum - 1) // 512 AS BIGINT) AS last_seq
        FROM c
    ),
    per_seq AS (
        SELECT CAST(unnest(range(first_seq, last_seq + 1)) AS BIGINT)
                   AS seq_id,
               doc_id, tok_start, tok_end
        FROM placed
    )
    SELECT seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(least(tok_end, (seq_id + 1) * 512)
                    - greatest(tok_start, seq_id * 512)) AS BIGINT)
               AS n_tokens,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_boundaries
    FROM per_seq
    GROUP BY seq_id
    """,
    doc="PACKED-SEQUENCE STATS (companion of q_sequence_packing): per "
        "512-token packed sequence, how many documents it contains, "
        "its filled token count (512 everywhere except the final "
        "partial sequence — concat-and-chunk never pads mid-stream), "
        "and the cross-document attention boundaries a trainer must "
        "mask. Each document explodes into only the sequences it "
        "touches (1 + spillovers — linear, bounded fan-out), then one "
        "hash aggregate per sequence; the per-sequence token count is "
        "the interval intersection, exact integers end to end.",
)
def q_packing_stats(spark, sf_dir):
    from ..operators.indexing import distributed_prefix_sum
    from ..operators.text import token_count

    seq_len = 512
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    cum = distributed_prefix_sum(counts, ["doc_id"], ["n_tokens"])
    placed = cum.select(
        "doc_id",
        (F.col("cum_n_tokens") - F.col("n_tokens")).alias("tok_start"),
        F.col("cum_n_tokens").alias("tok_end"),
        F.expr(f"(cum_n_tokens - n_tokens) div {seq_len}").alias("first_seq"),
        F.expr(f"(cum_n_tokens - 1) div {seq_len}").alias("last_seq"),
    )
    per_seq = placed.select(
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
        "doc_id",
        "tok_start",
        "tok_end",
    )
    return per_seq.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.least(F.col("tok_end"), (F.col("seq_id") + 1) * seq_len)
            - F.greatest(F.col("tok_start"), F.col("seq_id") * seq_len)
        ).alias("n_tokens"),
        (F.count("*") - 1).alias("n_boundaries"),
    )


# ---- q_packing_curve (round 10) --------------------------------------------
# The seq_len tuning artifact that completes the packing family: the
# two packing policies every LLM tokenization job chooses between,
# priced at 4 context lengths from ONE prefix-sum pass.

_PACK_LENS = [256, 512, 1024, 2048]


def _packing_curve_arms() -> str:
    arms = []
    for L in _PACK_LENS:
        arms.append(f"""
        SELECT CAST({L} AS BIGINT) AS seq_len, t AS total_tokens,
               CAST((t + {L} - 1) // {L} AS BIGINT) AS chunk_n_seqs,
               CAST((t + {L} - 1) // {L} * {L} - t AS BIGINT) AS chunk_pad,
               split_{L} AS chunk_split_docs,
               CAST(t AS DOUBLE)
                   / CAST((t + {L} - 1) // {L} * {L} AS DOUBLE)
                   AS chunk_efficiency,
               padseq_{L} AS pad_n_seqs,
               CAST(padseq_{L} * {L} - t AS BIGINT) AS pad_waste,
               CAST(t AS DOUBLE) / CAST(padseq_{L} * {L} AS DOUBLE)
                   AS pad_efficiency
        FROM ag""")
    return " UNION ALL ".join(arms)


@register(
    "q_packing_curve",
    """
    WITH c AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens,
               SUM(CAST(len(string_split_regex(trim(text), '\\s+'))
                        AS BIGINT))
                   OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents
    ),
    ag AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
    """
    + ",\n".join(
        f"""           CAST(SUM(CASE WHEN (cum - n_tokens) // {L}
                             <> (cum - 1) // {L} THEN 1 ELSE 0 END)
                   AS BIGINT) AS split_{L},
               CAST(SUM((n_tokens + {L} - 1) // {L}) AS BIGINT)
                   AS padseq_{L}"""
        for L in _PACK_LENS
    )
    + """
        FROM c
    )
    SELECT * FROM ("""
    + _packing_curve_arms()
    + """)
    ORDER BY seq_len
    """,
    doc="SEQUENCE-LENGTH PACKING CURVE: the context-length tuning "
        "artifact beside q_ivf_probe_curve / q_lsh_band_curve — both "
        "packing policies an LLM tokenization job chooses between, "
        "priced at 256/512/1024/2048 tokens from ONE "
        "distributed-prefix-sum pass.  Per seq_len: concat-and-chunk "
        "(GPT-style — zero mid-stream padding but chunk_split_docs "
        "documents straddle a boundary and leak cross-document "
        "attention unless masked) vs pad-per-document (no straddling "
        "but pad_waste dead tokens).  chunk_efficiency/pad_efficiency "
        "make the trade one number per policy.  Exact integers from "
        "doc-level token counts (no per-token explode); two IEEE "
        "divisions per row.  At 100 TB: one range-exchange prefix sum "
        "+ one aggregate, the q_sequence_packing scale shape.",
)
def q_packing_curve(spark, sf_dir):
    from ..operators.indexing import distributed_prefix_sum
    from ..operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    cum = distributed_prefix_sum(counts, ["doc_id"], ["n_tokens"])
    aggs = [F.sum("n_tokens").cast("long").alias("t")]
    for L in _PACK_LENS:
        aggs.append(
            F.sum(
                F.when(
                    F.expr(f"(cum_n_tokens - n_tokens) div {L}")
                    != F.expr(f"(cum_n_tokens - 1) div {L}"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"split_{L}")
        )
        aggs.append(
            F.sum(F.expr(f"(n_tokens + {L} - 1) div {L}"))
            .cast("long")
            .alias(f"padseq_{L}")
        )
    ag = cum.agg(*aggs)
    # 4 rows from the 1-row aggregate via stack — config-sized, fully
    # in-frame (no driver round trip)
    tuples = ", ".join(
        f"CAST({L} AS BIGINT), t, split_{L}, padseq_{L}"
        for L in _PACK_LENS
    )
    stacked = ag.selectExpr(
        f"stack({len(_PACK_LENS)}, {tuples})"
        " AS (seq_len, total_tokens, chunk_split_docs, pad_n_seqs)"
    )
    chunk_n_seqs = F.expr("(total_tokens + seq_len - 1) div seq_len")
    return stacked.select(
        "seq_len",
        "total_tokens",
        chunk_n_seqs.alias("chunk_n_seqs"),
        (chunk_n_seqs * F.col("seq_len") - F.col("total_tokens")).alias(
            "chunk_pad"
        ),
        "chunk_split_docs",
        (
            F.col("total_tokens").cast("double")
            / (chunk_n_seqs * F.col("seq_len")).cast("double")
        ).alias("chunk_efficiency"),
        "pad_n_seqs",
        (F.col("pad_n_seqs") * F.col("seq_len") - F.col("total_tokens")).alias(
            "pad_waste"
        ),
        (
            F.col("total_tokens").cast("double")
            / (F.col("pad_n_seqs") * F.col("seq_len")).cast("double")
        ).alias("pad_efficiency"),
    ).orderBy("seq_len")


@register(
    "q_attention_mask",
    """
    WITH c AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens,
               SUM(CAST(len(string_split_regex(trim(text), '\\s+'))
                        AS BIGINT))
                   OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents
    ),
    placed AS (
        SELECT doc_id,
               CAST(cum - n_tokens AS BIGINT) AS tok_start,
               CAST(cum AS BIGINT) AS tok_end,
               CAST((cum - n_tokens) // 512 AS BIGINT) AS first_seq,
               CAST((cum - 1) // 512 AS BIGINT) AS last_seq
        FROM c
    ),
    per_seq AS (
        SELECT CAST(unnest(range(first_seq, last_seq + 1)) AS BIGINT)
                   AS seq_id,
               doc_id, tok_start, tok_end
        FROM placed
    )
    SELECT seq_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY seq_id
                                   ORDER BY tok_start, doc_id) - 1
                AS BIGINT) AS seg_idx,
           doc_id,
           CAST(greatest(tok_start, seq_id * 512) - seq_id * 512
                AS BIGINT) AS local_start,
           CAST(least(tok_end, (seq_id + 1) * 512) - seq_id * 512
                AS BIGINT) AS local_end,
           CAST(least(tok_end, (seq_id + 1) * 512)
                - greatest(tok_start, seq_id * 512) AS BIGINT) AS seg_len,
           CAST(greatest(tok_start, seq_id * 512) - tok_start
                AS BIGINT) AS doc_tok_offset
    FROM per_seq
    """,
    doc="DOCUMENT-BOUNDARY ATTENTION-MASK EXPORT (the r6-verdict "
        "flagship completing the packing tier): per packed 512-token "
        "sequence, the ordered segment intervals a trainer needs to "
        "build the block-diagonal attention mask and reset/continue "
        "position ids — (seg_idx, doc_id, [local_start, local_end), "
        "seg_len, doc_tok_offset), where doc_tok_offset is how far "
        "into the document this sequence's slice begins (nonzero "
        "exactly for spillover continuations, so position ids can "
        "continue across sequence boundaries). Composes "
        "q_sequence_packing's distributed_prefix_sum placement (range "
        "exchange + per-partition bases, NO single-partition window); "
        "each document explodes into only the sequences it touches, "
        "the seg_idx window partitions by seq_id (hash-keyed, bounded "
        "frames — a 512-token sequence holds ≤512 segments). Pure "
        "integer interval arithmetic — value-checks bitwise.",
)
def q_attention_mask(spark, sf_dir):
    from pyspark.sql.window import Window

    from ..operators.indexing import distributed_prefix_sum
    from ..operators.text import token_count

    seq_len = 512
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    cum = distributed_prefix_sum(counts, ["doc_id"], ["n_tokens"])
    placed = cum.select(
        "doc_id",
        (F.col("cum_n_tokens") - F.col("n_tokens")).alias("tok_start"),
        F.col("cum_n_tokens").alias("tok_end"),
        F.expr(f"(cum_n_tokens - n_tokens) div {seq_len}").alias("first_seq"),
        F.expr(f"(cum_n_tokens - 1) div {seq_len}").alias("last_seq"),
    )
    per_seq = placed.select(
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
        "doc_id",
        "tok_start",
        "tok_end",
    )
    seq_lo = F.col("seq_id") * seq_len
    seq_hi = (F.col("seq_id") + 1) * seq_len
    seg_start = F.greatest(F.col("tok_start"), seq_lo)
    seg_end = F.least(F.col("tok_end"), seq_hi)
    w = Window.partitionBy("seq_id").orderBy("tok_start", "doc_id")
    return per_seq.select(
        "seq_id",
        (F.row_number().over(w) - 1).cast("long").alias("seg_idx"),
        "doc_id",
        (seg_start - seq_lo).alias("local_start"),
        (seg_end - seq_lo).alias("local_end"),
        (seg_end - seg_start).alias("seg_len"),
        (seg_start - F.col("tok_start")).alias("doc_tok_offset"),
    )


@register(
    "q_span_corruption",
    """
    WITH c AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ),
    w AS (
        SELECT doc_id, CAST(u.w AS BIGINT) AS sentinel_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                                   CAST(u.w AS VARCHAR)), 1, 15))::BIGINT
                   AS h
        FROM c, unnest(range(n_tokens // 20)) u(w)
        WHERE n_tokens >= 20
    )
    SELECT doc_id, sentinel_id,
           CAST(sentinel_id * 20 + h % 15 AS BIGINT) AS span_start,
           CAST(sentinel_id * 20 + h % 15 + 1 + (h // 15) % 5 - 1
                AS BIGINT) AS span_end,
           CAST(1 + (h // 15) % 5 AS BIGINT) AS span_len
    FROM w
    """,
    doc="T5-STYLE SPAN-CORRUPTION PLAN (blocked deterministic variant): "
        "each document splits into 20-token windows; within window w a "
        "single span is selected by the engine-reproducible 60-bit md5 "
        "hash of (doc_id, w) — offset h%15, length 1+(h//15)%5 (1..5, "
        "mean 3, ~15% corruption), guaranteed inside its window so "
        "spans never overlap WITHOUT the sequential greedy resolution "
        "a suffix-order scan would need (the property that makes the "
        "plan one shuffle-free projection + explode, embarrassingly "
        "parallel at 100 TB). Emits the (sentinel_id, span) table a "
        "denoising-objective trainer consumes; 0-based inclusive "
        "token offsets. Pure integer/hash arithmetic — value-checks "
        "bitwise.",
)
def q_span_corruption(spark, sf_dir):
    from ..operators.dedup import md5_id
    from ..operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    c = docs.select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") >= 20)
    w = c.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"),
                       F.expr("n_tokens div 20") - 1)
        ).alias("sentinel_id"),
    ).select(
        "doc_id",
        F.col("sentinel_id").cast("long").alias("sentinel_id"),
        md5_id(
            F.concat_ws(":", F.col("doc_id").cast("string"),
                        F.col("sentinel_id").cast("string"))
        ).alias("h"),
    )
    start = F.col("sentinel_id") * 20 + F.col("h") % 15
    # h div 15 MUST be integer division — double `/` on a 60-bit hash
    # rounds above 2^53 and corrupts the modulus
    length = 1 + F.expr("(h div 15) % 5")
    return w.select(
        "doc_id",
        "sentinel_id",
        start.alias("span_start"),
        (start + length - 1).alias("span_end"),
        length.alias("span_len"),
    )


@register(
    "q_doc_entropy",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents
    ),
    dc AS (
        SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w
    ),
    dn AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
               COUNT(*) AS n_types, MAX(c) AS max_c
        FROM dc GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(n.n AS BIGINT) AS n_tokens,
           CAST(n.n_types AS BIGINT) AS n_types,
           CAST(n.max_c AS BIGINT) AS max_type_count,
           CAST(SUM(d.c * (length(bin(n.n // d.c)) - 1)) AS BIGINT)
               AS self_bits_total
    FROM dc d JOIN dn n USING (doc_id)
    GROUP BY d.doc_id, n.n, n.n_types, n.max_c
    """,
    doc="PER-DOCUMENT SELF-ENTROPY (integer-bits): each document "
        "scored under its OWN unigram distribution — "
        "Σ_types c·floor(log2(n/c)) via the libm-free "
        "len(bin(n DIV c))−1 recipe (exact integers, no FP anywhere) "
        "— the repetitiveness signal that separates boilerplate/"
        "keyword-stuffed documents (near-zero self-entropy) from "
        "natural prose, complementing q_unigram_surprisal's "
        "CORPUS-model score (a doc can be corpus-typical yet "
        "internally degenerate, and vice versa). n_types and the "
        "dominant type count ride along for type-token diagnostics. "
        "Two hash-keyed exchanges ((doc,token) count then per-doc "
        "fold), linear rows, no broadcast model needed — the model IS "
        "the group.",
)
def q_doc_entropy(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(T.tokens("text")).alias("w"))
    dc = tok.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    dn = dc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").alias("n_types"),
        F.max("c").alias("max_c"),
    )
    bits = F.length(F.bin(F.expr("n DIV c"))) - 1
    return (
        dc.join(dn, "doc_id")
        .groupBy("doc_id", "n", "n_types", "max_c")
        .agg(F.sum(F.col("c") * bits).cast("long").alias("self_bits_total"))
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            F.col("n_types").cast("long").alias("n_types"),
            F.col("max_c").cast("long").alias("max_type_count"),
            "self_bits_total",
        )
    )


@register(
    "q_bigram_surprisal",
    """
    WITH tok AS (
        SELECT doc_id, u.s.i AS pos, u.s.x AS w
        FROM documents,
             unnest(list_transform(string_split_regex(trim(text), '\\s+'),
                                   (x, i) -> {'i': i, 'x': x})) u(s)
    ),
    big AS (
        SELECT a.doc_id, a.w AS w1, b.w AS w2
        FROM tok a JOIN tok b
          ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    ),
    uni AS (SELECT w1, COUNT(*) AS cu FROM big GROUP BY w1),
    bi AS (SELECT w1, w2, COUNT(*) AS cb FROM big GROUP BY w1, w2),
    model AS (
        SELECT b.w1, b.w2,
               CAST(length(bin(u.cu // b.cb)) - 1 AS BIGINT) AS bits
        FROM bi b JOIN uni u USING (w1)
    )
    SELECT g.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(m.bits) AS BIGINT) AS sum_bits,
           CAST(MAX(m.bits) AS BIGINT) AS max_bits,
           CAST(SUM(m.bits) AS DOUBLE) / COUNT(*) AS mean_bits
    FROM big g JOIN model m USING (w1, w2)
    GROUP BY g.doc_id
    """,
    doc="BIGRAM-LM SURPRISAL (the conditional upgrade of "
        "q_unigram_surprisal): train P(w2|w1) = c(w1,w2)/c(w1·) ON the "
        "corpus bigram stream, then score each document's total/mean "
        "per-bigram surprisal in EXACT INTEGER BITS "
        "(len(bin(cu DIV cb))−1 — libm-free, engine-identical). A "
        "document of common words in unusual ORDER scores high here "
        "while the unigram filter passes it — the word-salad detector. "
        "Bigrams come from ONE position-shifted self-join per doc "
        "(hash-keyed on doc_id, linear rows); the model joins back on "
        "the bigram key — at 100 TB the model frame is corpus-sized "
        "but uniformly keyed, the same shuffle class as exact dedup. "
        "The single mean division is one IEEE op on exact integers — "
        "bitwise.",
)
def q_bigram_surprisal(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(T.tokens("text")).alias("p", "w")
    ).select("doc_id", (F.col("p") + 1).alias("pos"), "w")
    a, b = tok.alias("a"), tok.alias("b")
    big = a.join(
        b,
        (F.col("b.doc_id") == F.col("a.doc_id"))
        & (F.col("b.pos") == F.col("a.pos") + 1),
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.w").alias("w1"),
        F.col("b.w").alias("w2"),
    )
    uni = big.groupBy("w1").agg(F.count("*").alias("cu"))
    bi = big.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    model = bi.join(uni, "w1").select(
        "w1", "w2",
        (F.length(F.bin(F.expr("cu DIV cb"))) - 1).cast("long").alias("bits"),
    )
    return (
        big.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("bits").cast("long").alias("sum_bits"),
            F.max("bits").cast("long").alias("max_bits"),
            (F.sum("bits").cast("double") / F.count("*")).alias("mean_bits"),
        )
    )


@register(
    "q_tokenizer_fertility",
    r"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9'']+'))) AS BIGINT) AS bpe_tokens,
           CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS ws_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9'']+'))) AS DOUBLE)
               / SUM(len(string_split_regex(trim(text), '\s+'))) AS fertility,
           CAST(SUM(n_chars) AS DOUBLE)
               / SUM(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9'']+'))) AS chars_per_token
    FROM documents
    GROUP BY lang
    """,
    doc="TOKENIZER FERTILITY per language: subword-tokens-per-word and "
        "chars-per-subword-token under the GPT-2-style pretokenizer "
        "regex, aggregated by lang — the report that decides whether a "
        "tokenizer (and hence a token budget) is equitable across the "
        "corpus's languages before a 100 TB tokenization run. Exact "
        "long sums per group; each ratio is one IEEE division of exact "
        "longs — fully VALUE-ORACLED. One map-side-combinable "
        "aggregate, single exchange on lang; the regex runs JVM-side "
        "(regexp_extract_all inside codegen), no UDF.",
)
def q_tokenizer_fertility(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        "n_chars",
        T.bpe_token_count("text").cast("long").alias("bpe"),
        T.token_count("text").cast("long").alias("ws"),
    )
    bpe, ws, chars = F.sum("bpe"), F.sum("ws"), F.sum("n_chars")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        bpe.alias("bpe_tokens"),
        ws.alias("ws_tokens"),
        chars.cast("long").alias("total_chars"),
        (bpe.cast("double") / ws).alias("fertility"),
        (chars.cast("double") / bpe).alias("chars_per_token"),
    )


@register(
    "q_shard_manifest",
    """
    WITH c AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens,
               SUM(CAST(len(string_split_regex(trim(text), '\\s+'))
                        AS BIGINT))
                   OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents
    ),
    seqs AS (
        SELECT DISTINCT s.seq_id
        FROM c, LATERAL (
            SELECT unnest(range(CAST((cum - n_tokens) // 512 AS BIGINT),
                                CAST((cum - 1) // 512 + 1 AS BIGINT)))
                AS seq_id
        ) s
    ),
    n AS (SELECT COUNT(*) AS n_seq FROM seqs),
    sharded AS (
        SELECT seq_id,
               seq_id // ((n_seq + 7) // 8) AS shard_id
        FROM seqs CROSS JOIN n
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_seqs,
           CAST(MIN(seq_id) AS BIGINT) AS first_seq,
           CAST(MAX(seq_id) AS BIGINT) AS last_seq,
           CAST(COUNT(*) * 512 AS BIGINT) AS shard_tokens
    FROM sharded GROUP BY shard_id
    """,
    doc="WRITER-PLANNING SHARD MANIFEST: the packed-sequence space "
        "(q_sequence_packing's seq ids, including spill sequences a "
        "document straddles) dealt into 8 contiguous output shards of "
        "ceil(n/8) sequences — the deterministic file plan a 100 TB "
        "tokenization job hands its writers (contiguous ranges keep "
        "each writer's input a single sorted scan slice; shard token "
        "budgets are exact because every sequence is seq_len tokens "
        "by construction). Manifest rows: sequence count, seq-id "
        "range, token budget per shard — exact integers, fully "
        "VALUE-ORACLED. Derivation is the oracled packing map + one "
        "distinct + one aggregate; the sequence universe comes from "
        "each doc's [first_seq, last_seq] interval (no per-token "
        "explode).",
)
def q_shard_manifest(spark, sf_dir):
    from ..operators.indexing import distributed_prefix_sum
    from ..operators.text import token_count

    seq_len, n_shards = 512, 8
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    cum = distributed_prefix_sum(counts, ["doc_id"], ["n_tokens"])
    seqs = (
        cum.select(
            F.explode(
                F.sequence(
                    F.expr(f"(cum_n_tokens - n_tokens) div {seq_len}"),
                    F.expr(f"(cum_n_tokens - 1) div {seq_len}"),
                )
            ).alias("seq_id")
        )
        .distinct()
    )
    n_seq = seqs.count()  # one scalar to the driver (manifest-sized)
    per = (n_seq + n_shards - 1) // n_shards
    return (
        seqs.groupBy(F.expr(f"seq_id div {per}").alias("shard_id"))
        .agg(
            F.count("*").cast("long").alias("n_seqs"),
            F.min("seq_id").cast("long").alias("first_seq"),
            F.max("seq_id").cast("long").alias("last_seq"),
            (F.count("*") * seq_len).cast("long").alias("shard_tokens"),
        )
    )


# ---- unigram-LM (SentencePiece-style) trainer (round 9) ------------------
# VERDICT r8 item 6: the unigram-LM tokenizer trainer beside BPE
# (q_bpe_merge_step).  One hard-EM step, fully integer and therefore
# engine-bitwise: candidate pieces are all 1..4-char substrings of the
# distinct-word table weighted by word frequency; the vocab keeps every
# single char (segmentability guarantee, as SentencePiece does) plus
# the top-64 multi-char pieces; piece costs are EXACT INTEGER-BITS
# surprisal (len(bin(total DIV count)) - 1, the q_unigram_surprisal
# trick — the libm-free quantized -log2 p); the E-step Viterbi-segments
# every distinct word by integer DP (min total bits, ties to the
# LONGEST piece); the M-step re-estimates piece costs from realized
# usage.  At 100 TB the word-count agg is the only corpus-sized
# shuffle; the candidate/vocab/DP stages run over DISTINCT words with
# the pruned vocab broadcast as model state (the BPE trainer makes the
# same argument at queries/text.py:q_bpe_merge_step).

_UNI_BIG = 1 << 60  # sentinel for "piece not in vocab" DP terms
_UNI_MAXW = 8  # max word chars in the data model; the DP unroll bound
_UNI_MAXP = 4  # max piece length
_UNI_TOPV = 64  # multi-char vocab budget


def _unigram_oracle_prefix() -> str:
    """The shared DuckDB CTE chain: word counts -> candidates -> pruned
    vocab with integer-bits costs -> unrolled Viterbi DP (positions
    1.._UNI_MAXW, pieces 1.._UNI_MAXP, ties to the longest piece) ->
    unrolled backtrack -> per-use piece stream `segp`.  Mirrors the
    Spark DP token for token; all integers."""
    parts = [
        r"""
    wds AS MATERIALIZED (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                        x -> x <> '')) AS w
              FROM documents)
        GROUP BY w
    ),
    cand AS MATERIALIZED (
        SELECT substring(w, CAST(i.i AS INT), CAST(j.j AS INT)) AS piece,
               CAST(SUM(cnt) AS BIGINT) AS seed_cnt
        FROM wds
        CROSS JOIN range(1, """ + str(_UNI_MAXP + 1) + r""") j(j)
        CROSS JOIN LATERAL (
            SELECT unnest(range(1, length(w) - j.j + 2)) AS i) i
        WHERE j.j <= length(w)
        GROUP BY piece
    ),
    vocab AS MATERIALIZED (
        SELECT piece, seed_cnt FROM cand WHERE length(piece) = 1
        UNION ALL
        SELECT piece, seed_cnt FROM (
            SELECT piece, seed_cnt FROM cand WHERE length(piece) > 1
            ORDER BY seed_cnt DESC, piece LIMIT """ + str(_UNI_TOPV) + r""")
    ),
    vtot AS (SELECT CAST(SUM(seed_cnt) AS BIGINT) AS t FROM vocab),
    vb AS MATERIALIZED (
        SELECT piece, seed_cnt,
               CAST(length(bin(t // seed_cnt)) - 1 AS BIGINT) AS bits
        FROM vocab, vtot
    ),
    e0 AS (SELECT w, cnt, CAST(length(w) AS BIGINT) AS L,
                  CAST(0 AS BIGINT) AS c0
           FROM wds)"""
    ]
    for k in range(1, _UNI_MAXW + 1):
        terms = []
        for j in range(1, _UNI_MAXP + 1):
            if k - j < 0:
                continue
            terms.append(
                f"COALESCE(c{k - j} + (SELECT bits FROM vb WHERE vb.piece"
                f" = substring(w, {k - j + 1}, {j})), {_UNI_BIG}) AS t{k}_{j}"
            )
        parts.append(
            f"    d{k} AS MATERIALIZED (SELECT *, {', '.join(terms)} FROM e{k - 1})"
        )
        js = [j for j in range(1, _UNI_MAXP + 1) if k - j >= 0]
        least = "least(" + ", ".join(f"t{k}_{j}" for j in js) + ")"
        whens = [
            f"WHEN t{k}_{j} = c{k} THEN {j}"
            for j in sorted(js, reverse=True)[:-1]
        ]
        case = (
            ("CASE " + " ".join(whens) + f" ELSE {min(js)} END")
            if whens
            else str(min(js))
        )
        parts.append(
            f"    e{k} AS MATERIALIZED (SELECT *, {least} AS c{k},"
            f" {case} AS j{k} FROM d{k})"
        )
    # backtrack: p0 = L; each step resolves j at the current position,
    # emits the chosen piece, and steps back
    jcase = (
        "CASE p{prev} "
        + " ".join(f"WHEN {k} THEN j{k}" for k in range(1, _UNI_MAXW + 1))
        + " ELSE 0 END"
    )
    parts.append(f"    b0 AS MATERIALIZED (SELECT *, L AS p0 FROM e{_UNI_MAXW})")
    for t in range(1, _UNI_MAXW + 1):
        parts.append(
            f"    bj{t} AS MATERIALIZED (SELECT *, {jcase.format(prev=t - 1)} AS jp{t}"
            f" FROM b{t - 1})"
        )
        parts.append(
            f"    b{t} AS MATERIALIZED (SELECT *,"
            f" CASE WHEN p{t - 1} > 0 THEN"
            f" substring(w, CAST(p{t - 1} - jp{t} + 1 AS INT),"
            f" CAST(jp{t} AS INT)) END AS piece_{t},"
            f" CASE WHEN p{t - 1} > 0 THEN p{t - 1} - jp{t}"
            f" ELSE CAST(0 AS BIGINT) END AS p{t} FROM bj{t})"
        )
    emits = " UNION ALL ".join(
        f"SELECT w, cnt, piece_{t} AS piece FROM b{_UNI_MAXW}"
        for t in range(1, _UNI_MAXW + 1)
    )
    parts.append(
        f"    segp AS MATERIALIZED (SELECT * FROM ({emits})"
        " WHERE piece IS NOT NULL)"
    )
    return ",\n".join(parts)


def _unigram_segments(spark, sf_dir):
    """(vb, segp): the pruned unigram vocab frame (piece, seed_cnt,
    bits) and the Viterbi segmentation piece stream (w, cnt, piece —
    one row per piece USE, word-frequency weighted), both exact
    integers.  Spark mirror of :func:`_unigram_oracle_prefix`."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    wds = (
        docs.select(
            F.explode(
                F.filter(T.tokens("text"), lambda x: x != F.lit(""))
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    # data-model bound, asserted LOUDLY (ADVICE r9): the oracle's
    # backtrack is unrolled to exactly _UNI_MAXW positions — for a
    # longer word it never reaches p=0 and keeps emitting
    # substring(w, p+1, 0) = '' rows (empty string, not NULL), which
    # survive the segp filter and silently inflate
    # total_pieces_used / mean_pieces_per_word on the oracle side
    # while the Spark DP segments the word normally.  Refuse to
    # produce a silently-divergent comparison.
    wmax = int(wds.agg(F.max(F.length("w"))).first()[0] or 0)
    if wmax > _UNI_MAXW:
        raise ValueError(
            f"unigram DP data-model bound violated: max word length "
            f"{wmax} > _UNI_MAXW={_UNI_MAXW}; raise the unroll bound "
            "(both the Spark DP cap and the oracle's CTE chain derive "
            "from _UNI_MAXW) before trusting results"
        )
    cand = (
        wds.select(
            "cnt",
            F.explode(
                F.expr(
                    f"flatten(transform(filter(sequence(1, {_UNI_MAXP}),"
                    " j -> j <= length(w)),"
                    " j -> transform(sequence(1, length(w) - j + 1),"
                    " i -> substring(w, i, j))))"
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("seed_cnt"))
    )
    singles = cand.filter(F.length("piece") == 1)
    multi = (
        cand.filter(F.length("piece") > 1)
        .orderBy(F.col("seed_cnt").desc(), "piece")
        .limit(_UNI_TOPV)
    )
    vocab = singles.unionByName(multi).localCheckpoint(eager=True)
    vtot = int(vocab.agg(F.sum("seed_cnt")).first()[0])
    vb = vocab.select(
        "piece",
        "seed_cnt",
        (F.length(F.bin(F.expr(f"{vtot} DIV seed_cnt"))) - 1)
        .cast("long")
        .alias("bits"),
    )
    # the pruned vocab is MODEL state (corpus-independent size):
    # broadcast into the per-word DP as a plain dict
    bits = {r.piece: int(r.bits) for r in vb.collect()}
    big, maxp = _UNI_BIG, _UNI_MAXP

    def _seg(it):
        for b in it:
            ws, cs, ps = [], [], []
            for w, cnt in zip(b["w"], b["cnt"]):
                L = len(w)
                dp = [0] + [big] * L
                ch = [0] * (L + 1)
                for k in range(1, L + 1):
                    best, bj = None, 0
                    for j in range(min(maxp, k), 0, -1):
                        t = dp[k - j] + bits.get(w[k - j : k], big)
                        if best is None or t < best:
                            best, bj = t, j
                    dp[k], ch[k] = best, bj
                p = L
                while p > 0:
                    j = ch[p]
                    ws.append(w)
                    cs.append(int(cnt))
                    ps.append(w[p - j : p])
                    p -= j
            yield pd.DataFrame({"w": ws, "cnt": cs, "piece": ps})

    segp = wds.mapInPandas(_seg, "w string, cnt long, piece string")
    return vb, segp


@register(
    "q_unigram_lm_train",
    "WITH "
    + _unigram_oracle_prefix()
    + """,
    use AS MATERIALIZED (
        SELECT piece, CAST(SUM(cnt) AS BIGINT) AS used_count
        FROM segp GROUP BY piece
    ),
    utot AS (SELECT CAST(SUM(used_count) AS BIGINT) AS tu FROM use),
    nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab FROM vb),
    wtot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_word_occ FROM wds)
    SELECT u.piece AS piece,
           CAST(length(u.piece) AS BIGINT) AS piece_len,
           v.seed_cnt AS seed_count,
           v.bits AS seed_bits,
           u.used_count AS used_count,
           CAST(length(bin(tu // u.used_count)) - 1 AS BIGINT) AS new_bits,
           n_vocab,
           tu AS total_pieces_used,
           CAST(tu AS DOUBLE) / n_word_occ AS mean_pieces_per_word
    FROM use u JOIN vb v ON v.piece = u.piece, utot, nv, wtot
    ORDER BY used_count DESC, piece
    LIMIT 20
    """,
    doc="UNIGRAM-LM TOKENIZER TRAINER (SentencePiece-style, one hard-"
        "EM step) beside the BPE trainer: candidate pieces = all "
        "frequency-weighted 1..4-char substrings of the distinct-word "
        "table; vocab = every single char (segmentability, as "
        "SentencePiece keeps base pieces) + top-64 multi-char; piece "
        "cost = EXACT INTEGER-BITS surprisal; E-step = integer "
        "Viterbi segmentation of every distinct word (min total bits, "
        "ties to the longest piece — fully deterministic); M-step = "
        "re-estimated costs from realized usage.  Emits the top-20 "
        "pieces by usage with seed vs re-estimated costs plus the "
        "model-level certificate (vocab size, total pieces used, mean "
        "pieces per word — the unigram fertility).  The oracle "
        "mirrors the DP with an UNROLLED 8-position CTE chain — all "
        "integers, one IEEE division.",
)
def q_unigram_lm_train(spark, sf_dir):
    vb, segp = _unigram_segments(spark, sf_dir)
    segp = segp.localCheckpoint(eager=True)
    use = segp.groupBy("piece").agg(
        F.sum("cnt").cast("long").alias("used_count")
    )
    tu = int(use.agg(F.sum("used_count")).first()[0])
    n_vocab = vb.count()
    docs_wtot = int(
        segp.select("w", "cnt").distinct().agg(F.sum("cnt")).first()[0]
    )
    return (
        use.join(vb, "piece")
        .select(
            "piece",
            F.length("piece").cast("long").alias("piece_len"),
            F.col("seed_cnt").alias("seed_count"),
            F.col("bits").alias("seed_bits"),
            "used_count",
            (F.length(F.bin(F.expr(f"{tu} DIV used_count"))) - 1)
            .cast("long")
            .alias("new_bits"),
            F.lit(n_vocab).cast("long").alias("n_vocab"),
            F.lit(tu).cast("long").alias("total_pieces_used"),
            (F.lit(float(tu)) / F.lit(float(docs_wtot))).alias(
                "mean_pieces_per_word"
            ),
        )
        .orderBy(F.col("used_count").desc(), "piece")
        .limit(20)
    )


@register(
    "q_unigram_fertility",
    "WITH "
    + _unigram_oracle_prefix()
    + r""",
    wpieces AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n_pieces
        FROM segp GROUP BY w
    ),
    stream AS (
        SELECT lang, unnest(list_filter(string_split_regex(trim(text),
                                                           '\s+'),
                            x -> x <> '')) AS w
        FROM documents
    ),
    uni AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS ws_tokens,
               CAST(SUM(n_pieces) AS BIGINT) AS unigram_pieces
        FROM stream JOIN wpieces USING (w)
        GROUP BY lang
    ),
    ds AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(regexp_extract_all(text,
                   '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9'']+')))
                   AS BIGINT) AS bpe_tokens
        FROM documents GROUP BY lang
    )
    SELECT lang, n_docs, ws_tokens, bpe_tokens, unigram_pieces,
           CAST(bpe_tokens AS DOUBLE) / ws_tokens AS fertility_bpe,
           CAST(unigram_pieces AS DOUBLE) / ws_tokens
               AS fertility_unigram
    FROM ds JOIN uni USING (lang)
    ORDER BY lang
    """,
    doc="TOKENIZER FERTILITY COMPARISON (VERDICT r8 item 6): the "
        "trained unigram-LM segmentation vs the GPT-2-style BPE "
        "pretokenizer, per language — pieces-per-word for both "
        "tokenizers side by side (reusing q_tokenizer_fertility's "
        "BPE machinery), the report that picks a tokenizer family "
        "before a 100 TB tokenization run.  Corpus word stream joins "
        "the per-word piece counts from the trained model; exact "
        "longs, two IEEE divisions per row.",
)
def q_unigram_fertility(spark, sf_dir):
    _vb, segp = _unigram_segments(spark, sf_dir)
    wpieces = segp.groupBy("w").agg(F.count("*").cast("long").alias("n_pieces"))
    docs = load_table(spark, sf_dir, "documents")
    stream = docs.select(
        "lang",
        F.explode(F.filter(T.tokens("text"), lambda x: x != F.lit(""))).alias(
            "w"
        ),
    )
    uni = (
        stream.join(wpieces, "w")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("ws_tokens"),
            F.sum("n_pieces").cast("long").alias("unigram_pieces"),
        )
    )
    ds = docs.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(T.bpe_token_count("text")).cast("long").alias("bpe_tokens"),
    )
    return (
        ds.join(uni, "lang")
        .select(
            "lang", "n_docs", "ws_tokens", "bpe_tokens", "unigram_pieces",
            (F.col("bpe_tokens").cast("double") / F.col("ws_tokens")).alias(
                "fertility_bpe"
            ),
            (
                F.col("unigram_pieces").cast("double") / F.col("ws_tokens")
            ).alias("fertility_unigram"),
        )
        .orderBy("lang")
    )


# ---- q_blocklist_audit (round 10) -------------------------------------------
# C4/Gopher-style multi-keyword safety filtering, made a first-class
# audit: given a keyword blocklist, report per-keyword hit volume and
# the corpus share a doc-level filter would remove.  The list is
# derived deterministically from the corpus (top-10 most frequent
# tokens of length >= 6 — the same derive-from-data stand-in the
# unigram trainer uses for its vocab) so the whole composition is
# value-oracled; swapping in an external badwords file changes one
# frame.

_BLOCK_MIN_LEN = 6
_BLOCK_TOP_K = 10


@register(
    "q_blocklist_audit",
    f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents
    ),
    agg AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_hit
        FROM tok WHERE length(w) >= {_BLOCK_MIN_LEN}
        GROUP BY w
    ),
    kw AS MATERIALIZED (
        SELECT * FROM agg
        ORDER BY n_occurrences DESC, w LIMIT {_BLOCK_TOP_K}
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    flagged AS (
        SELECT CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n_flagged
        FROM tok t JOIN kw ON kw.w = t.w
    )
    SELECT w AS keyword, n_occurrences, n_docs_hit,
           CAST(n_docs_hit AS DOUBLE) / CAST(n AS DOUBLE) AS doc_share,
           n_flagged AS n_docs_flagged_any,
           CAST(n_flagged AS DOUBLE) / CAST(n AS DOUBLE)
               AS flagged_share
    FROM kw, nd, flagged
    ORDER BY n_occurrences DESC, keyword
    """,
    doc="MULTI-KEYWORD BLOCKLIST AUDIT (the C4 badwords-filter shape): "
        "per-keyword token occurrences and distinct documents hit, "
        "plus the doc-level removal footprint a filter on the whole "
        "list would have (n_docs_flagged_any / flagged_share — docs "
        "hit by ANY keyword, the number a curation run signs off "
        "before dropping them).  Keyword set = top-10 most frequent "
        "tokens of length >= 6, derived deterministically so the "
        "composition is value-oracled end to end.  At 100 TB: one "
        "word-count aggregate builds the list (corpus-linear), the "
        "audit join broadcasts the 10-row list against the token "
        "stream — never a shuffle on the corpus side; exact integers, "
        "two IEEE divisions.",
)
def q_blocklist_audit(spark, sf_dir):
    from .aggregates import attach_scalar

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(T.tokens("text")).alias("w"))
    agg = (
        tok.filter(F.length("w") >= _BLOCK_MIN_LEN)
        .groupBy("w")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs_hit"),
        )
    )
    kw = (
        agg.orderBy(F.col("n_occurrences").desc(), "w")
        .limit(_BLOCK_TOP_K)
        .localCheckpoint(eager=True)
    )
    n_docs = docs.count()
    flagged = (
        tok.join(F.broadcast(kw.select("w")), "w")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_flagged"))
    )
    return (
        attach_scalar(kw, flagged)
        .select(
            F.col("w").alias("keyword"),
            "n_occurrences",
            "n_docs_hit",
            (
                F.col("n_docs_hit").cast("double") / F.lit(float(n_docs))
            ).alias("doc_share"),
            F.col("n_flagged").alias("n_docs_flagged_any"),
            (F.col("n_flagged").cast("double") / F.lit(float(n_docs))).alias(
                "flagged_share"
            ),
        )
        .orderBy(F.col("n_occurrences").desc(), "keyword")
    )


# ---- q_nb_label_probe (round 10) --------------------------------------------------
# A TRAINED quality/ID classifier — the fastText-style step every
# curation pipeline runs (CCNet, LLaMA data prep) beside the heuristic
# q_lang_id: Laplace-smoothed Naive Bayes over whitespace tokens,
# trained on the even-doc_id half against the lang column (binary:
# majority language vs rest), scored and confusion-audited on the odd
# half.  Every model parameter is an exact integer: log-likelihood
# ratios live in the INTEGER-BITS domain (llr(w) = bits((cpos+1)(Sneg+V))
# − bits((cneg+1)(Spos+V)), the libm-free quantized log2), so training,
# scoring, and the decision boundary are bitwise engine-identical.


@register(
    "q_nb_label_probe",
    """
    WITH tok AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents
    ),
    tr AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
    ev AS (SELECT * FROM tok WHERE doc_id % 2 = 1),
    vc AS (
        SELECT w,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS cpos,
               CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
                   AS cneg
        FROM tr GROUP BY w
    ),
    tt AS (SELECT CAST(SUM(cpos) AS BIGINT) AS spos,
                  CAST(SUM(cneg) AS BIGINT) AS sneg,
                  CAST(COUNT(*) AS BIGINT) AS v
           FROM vc),
    pr AS (SELECT CAST(COUNT(DISTINCT CASE WHEN lang = 'en' THEN doc_id END)
                       AS BIGINT) AS npos,
                  CAST(COUNT(DISTINCT CASE WHEN lang <> 'en' THEN doc_id END)
                       AS BIGINT) AS nneg
           FROM tr),
    llr AS (
        SELECT w,
               CAST(length(bin((cpos + 1) * (sneg + v)))
                    - length(bin((cneg + 1) * (spos + v))) AS BIGINT) AS llr
        FROM vc, tt
    ),
    sc AS (
        SELECT e.doc_id,
               MAX(CASE WHEN e.lang = 'en' THEN 1 ELSE 0 END) AS y,
               SUM(COALESCE(l.llr,
                   (SELECT CAST(length(bin(sneg + v)) - length(bin(spos + v))
                        AS BIGINT) FROM tt)))
               + (SELECT CAST(length(bin(npos)) - length(bin(nneg))
                      AS BIGINT) FROM pr) AS score
        FROM ev e LEFT JOIN llr l ON l.w = e.w
        GROUP BY e.doc_id
    ),
    cf AS (
        SELECT CAST(SUM(CASE WHEN y = 1 AND score > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN y = 0 AND score > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN y = 1 AND score <= 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS fn,
               CAST(SUM(CASE WHEN y = 0 AND score <= 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS tn
        FROM sc
    )
    SELECT (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM tr)
               AS n_train_docs,
           tp + fp + fn + tn AS n_eval_docs,
           (SELECT v FROM tt) AS n_vocab,
           tp, fp, fn, tn,
           CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE)
               AS accuracy,
           CAST(greatest(tp + fn, fp + tn) AS DOUBLE)
               / CAST(tp + fp + fn + tn AS DOUBLE) AS majority_share,
           CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE)
               - CAST(greatest(tp + fn, fp + tn) AS DOUBLE)
                 / CAST(tp + fp + fn + tn AS DOUBLE) AS signal_margin,
           CASE WHEN tp + fp > 0
                THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
           END AS precision,
           CASE WHEN tp + fn > 0
                THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
           END AS recall
    FROM cf
    """,
    doc="TRAINED NAIVE-BAYES CLASSIFIER AS A LABEL-LEAKAGE PROBE: the "
        "full fastText-style trained-classifier machinery (CCNet/"
        "LLaMA-style curation) — Laplace-smoothed NB over whitespace "
        "tokens, trained on the even-doc_id half against the lang "
        "column (binary: 'en' vs rest), confusion-audited on the "
        "held-out odd half — read as a SIGNAL AUDIT: signal_margin = "
        "accuracy − majority_share.  A margin near zero certifies the "
        "label carries no content signal (on this corpus lang is an "
        "independent tag over a shared vocabulary, so the trained "
        "model MUST collapse to the prior — which the driver row "
        "proves every round); a clearly positive margin on a label "
        "that should be content-independent (split id, shard id, "
        "eval-set membership) is the leakage alarm.  Integer-bits "
        "log-likelihood ratios make the model, scores, and decision "
        "boundary exact int64 — bitwise value-oracled end to end "
        "(ties score<=0 to negative).  At 100 TB: training is one "
        "token-count aggregate; scoring is an eval-tokens-to-vocab "
        "equi-join + per-doc sum (the q_unigram_surprisal shuffle "
        "shape); int64 safe while train tokens + vocab < 2^31 (the "
        "guard raises with the DECIMAL upgrade path named).",
)
def q_nb_label_probe(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(T.tokens("text")).alias("w")
    )
    tr = tok.filter(F.col("doc_id") % 2 == 0)
    ev = tok.filter(F.col("doc_id") % 2 == 1)
    vc = (
        tr.groupBy("w")
        .agg(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("long")
            .alias("cpos"),
            F.sum(F.when(F.col("lang") == "en", 0).otherwise(1))
            .cast("long")
            .alias("cneg"),
        )
        .localCheckpoint(eager=True)
    )
    tt = vc.agg(
        F.sum("cpos").cast("long"),
        F.sum("cneg").cast("long"),
        F.count("*").cast("long"),
    ).first()
    spos, sneg, v = int(tt[0]), int(tt[1]), int(tt[2])
    prr = tr.agg(
        F.countDistinct(
            F.when(F.col("lang") == "en", F.col("doc_id"))
        ).cast("long"),
        F.countDistinct(
            F.when(F.col("lang") != "en", F.col("doc_id"))
        ).cast("long"),
    ).first()
    npos, nneg = int(prr[0]), int(prr[1])
    if npos == 0 or nneg == 0:
        raise ValueError(
            "q_nb_label_probe: degenerate training labels (one class empty) "
            f"— npos={npos}, nneg={nneg}; the NB ratios are undefined"
        )
    if max(spos, sneg) + v > 2**31:
        raise ValueError(
            "q_nb_label_probe int64 bound: (count+1)*(S+V) products overflow "
            "past 2^31 train tokens — upgrade the llr products to "
            "DECIMAL(38,0) (the sa_checksum discipline)"
        )
    bits = lambda c: F.length(F.bin(c))  # noqa: E731  (diffs cancel the -1)
    llr = vc.select(
        "w",
        (
            bits((F.col("cpos") + 1) * F.lit(sneg + v))
            - bits((F.col("cneg") + 1) * F.lit(spos + v))
        )
        .cast("long")
        .alias("llr"),
    )
    unseen = len(bin(sneg + v)) - len(bin(spos + v))
    prior = len(bin(npos)) - len(bin(nneg))
    sc = (
        ev.join(llr, "w", "left")
        .groupBy("doc_id")
        .agg(
            F.max(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("y"),
            (
                F.sum(F.coalesce("llr", F.lit(unseen))) + F.lit(prior)
            )
            .cast("long")
            .alias("score"),
        )
    )
    cf = sc.agg(
        F.sum(F.when((F.col("y") == 1) & (F.col("score") > 0), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when((F.col("y") == 0) & (F.col("score") > 0), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when((F.col("y") == 1) & (F.col("score") <= 0), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when((F.col("y") == 0) & (F.col("score") <= 0), 1).otherwise(0))
        .cast("long")
        .alias("tn"),
    )
    n_train = tr.select("doc_id").distinct().count()
    n = F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")
    acc = (F.col("tp") + F.col("tn")).cast("double") / n.cast("double")
    maj = (
        F.greatest(F.col("tp") + F.col("fn"), F.col("fp") + F.col("tn"))
        .cast("double")
        / n.cast("double")
    )
    return cf.select(
        F.lit(n_train).cast("long").alias("n_train_docs"),
        n.cast("long").alias("n_eval_docs"),
        F.lit(v).cast("long").alias("n_vocab"),
        "tp", "fp", "fn", "tn",
        acc.alias("accuracy"),
        maj.alias("majority_share"),
        (acc - maj).alias("signal_margin"),
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fp")).cast("double"),
        ).alias("precision"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fn")).cast("double"),
        ).alias("recall"),
    )


# ---- q_wordpiece_step (round 10) ---------------------------------------------
# Completes the tokenizer-training family: BPE (q_bpe_merge_step,
# raw-frequency argmax), unigram-LM (q_unigram_lm_train, EM over piece
# costs), and now WORDPIECE — the same pair stage scored by the
# likelihood ratio score(ab) = c_ab·N / (c_a·c_b) (Schuster & Nakajima
# 2012; the BERT vocab builder), which prefers pairs that co-occur
# MORE than their unit frequencies predict instead of merely frequent
# ones.  Counts are exact int64; the score is one identical IEEE
# expression tree over exact ints (ties broken by pair text).


@register(
    "q_wordpiece_step",
    r"""
    WITH words AS (
        SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x <> '')) AS w
        FROM documents
    ),
    wc AS (SELECT w, COUNT(*) AS cnt FROM words GROUP BY w),
    pairs AS (
        SELECT pair, CAST(SUM(cnt) AS BIGINT) AS pair_count FROM (
            SELECT unnest(list_transform(range(1, length(w)),
                          i -> substring(w, CAST(i AS INT), 2))) AS pair,
                   cnt
            FROM wc WHERE length(w) >= 2
        ) GROUP BY pair
    ),
    units AS (
        SELECT ch, CAST(SUM(cnt) AS BIGINT) AS unit_count FROM (
            SELECT unnest(list_transform(range(1, length(w) + 1),
                          i -> substring(w, CAST(i AS INT), 1))) AS ch,
                   cnt
            FROM wc
        ) GROUP BY ch
    ),
    nu AS (SELECT CAST(SUM(unit_count) AS BIGINT) AS n FROM units)
    SELECT p.pair, p.pair_count,
           a.unit_count AS left_count,
           b.unit_count AS right_count,
           CAST(p.pair_count AS DOUBLE) * CAST(n AS DOUBLE)
               / (CAST(a.unit_count AS DOUBLE)
                  * CAST(b.unit_count AS DOUBLE)) AS score
    FROM pairs p
    JOIN units a ON a.ch = substring(p.pair, 1, 1)
    JOIN units b ON b.ch = substring(p.pair, 2, 1), nu
    ORDER BY score DESC, p.pair
    LIMIT 10
    """,
    doc="ONE WORDPIECE training iteration (Schuster & Nakajima 2012 — "
        "the BERT vocab builder) beside q_bpe_merge_step and "
        "q_unigram_lm_train, completing the three-family tokenizer-"
        "trainer suite: adjacent-symbol pairs weighted by word "
        "frequency, scored by the likelihood ratio c_ab*N/(c_a*c_b) "
        "rather than raw frequency — merges that co-occur more than "
        "their unit counts predict win.  Exact int64 counts; the "
        "score is one identical IEEE expression tree (ties to the "
        "lexicographically smallest pair); top-10 via TakeOrdered.  "
        "At 100 TB: the word-count agg is the only corpus-sized "
        "shuffle; pair/unit stages run over DISTINCT words; the unit "
        "table (alphabet-sized) broadcasts into the scoring join.",
)
def q_wordpiece_step(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.filter(T.tokens("text"), lambda x: x != F.lit(""))
        ).alias("w")
    )
    wc = words.groupBy("w").agg(F.count("*").alias("cnt"))
    pairs = (
        wc.filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w)-1),"
                    " i -> substring(w, i, 2))"
                )
            ).alias("pair"),
            "cnt",
        )
        .groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("pair_count"))
    )
    units = (
        wc.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w)),"
                    " i -> substring(w, i, 1))"
                )
            ).alias("ch"),
            "cnt",
        )
        .groupBy("ch")
        .agg(F.sum("cnt").cast("long").alias("unit_count"))
        .localCheckpoint(eager=True)
    )
    n = int(units.agg(F.sum("unit_count")).first()[0])
    a = units.select(
        F.col("ch").alias("cha"), F.col("unit_count").alias("left_count")
    )
    b = units.select(
        F.col("ch").alias("chb"), F.col("unit_count").alias("right_count")
    )
    return (
        pairs.join(
            F.broadcast(a), F.substring("pair", 1, 1) == F.col("cha")
        )
        .join(F.broadcast(b), F.substring("pair", 2, 1) == F.col("chb"))
        .select(
            "pair",
            "pair_count",
            "left_count",
            "right_count",
            (
                F.col("pair_count").cast("double") * F.lit(float(n))
                / (
                    F.col("left_count").cast("double")
                    * F.col("right_count").cast("double")
                )
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), "pair")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q_perplexity_buckets (round 11): the CCNet head/middle/tail quality
# split — q_unigram_surprisal's per-doc signal turned into the
# bucketing decision a curation pipeline acts on.
# ---------------------------------------------------------------------------


@register(
    "q_perplexity_buckets",
    r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents
    ),
    voc AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM voc),
    ic AS (
        SELECT w, CAST(length(bin(t // c)) - 1 AS BIGINT) AS bits
        FROM voc, tot
    ),
    ds AS MATERIALIZED (
        SELECT k.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(bits) AS DOUBLE) / COUNT(*) AS mean_bits
        FROM tok k JOIN ic USING (w)
        GROUP BY k.doc_id
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ds),
    kk AS (
        SELECT (n + 2) // 3 AS k1, (2 * n + 2) // 3 AS k2, n FROM nd
    ),
    rs AS (
        SELECT mean_bits,
               row_number() OVER (ORDER BY mean_bits, doc_id) AS rn
        FROM ds
    ),
    th AS (
        SELECT (SELECT mean_bits FROM rs, kk WHERE rn = k1) AS t1,
               (SELECT mean_bits FROM rs, kk WHERE rn = k2) AS t2
    ),
    lab AS (
        SELECT CASE WHEN mean_bits <= t1 THEN 'head'
                    WHEN mean_bits <= t2 THEN 'middle'
                    ELSE 'tail' END AS bucket,
               n_tokens, mean_bits
        FROM ds, th
    ),
    tt AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS all_tokens FROM ds)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS DOUBLE) / CAST((SELECT n FROM nd) AS DOUBLE)
               AS doc_share,
           CAST(SUM(n_tokens) AS DOUBLE)
               / CAST((SELECT all_tokens FROM tt) AS DOUBLE) AS token_share,
           MIN(mean_bits) AS min_mean_bits,
           MAX(mean_bits) AS max_mean_bits,
           (SELECT t1 FROM th) AS head_threshold,
           (SELECT t2 FROM th) AS middle_threshold
    FROM lab
    GROUP BY bucket
    ORDER BY bucket
    """,
    doc="CCNet-STYLE PERPLEXITY BUCKETS (Wenzek et al. 2020): the "
        "head/middle/tail tertile split a curation pipeline keeps or "
        "drops — q_unigram_surprisal's exact per-doc signal (mean "
        "integer-bits unigram surprisal: Σ(len(bin(N//c))−1)/n_tokens, "
        "one IEEE division per doc) turned into the bucketing "
        "DECISION.  The two tertile thresholds are exact distributed "
        "order statistics over (mean_bits, doc_id): ONE "
        "global_row_number pass (range exchange, no single-partition "
        "window) and two rank-equality filters — the "
        "q_conformal_groups selection discipline; docs tied with a "
        "threshold value bucket deterministically by value.  Output "
        "per bucket: doc/token volumes and shares (the retention "
        "decision artifact: CCNet keeps head+middle) plus the "
        "realized thresholds.  At 100 TB: one vocab aggregate, one "
        "broadcast scoring join, one range exchange — nothing "
        "corpus-squared, k-scalar driver metadata only.",
)
def q_perplexity_buckets(spark, sf_dir):
    from ..operators.indexing import global_row_number
    from .aggregates import attach_scalar

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(T.tokens("text")).alias("w"))
    voc = tok.groupBy("w").agg(F.count("*").alias("c"))
    tot = voc.agg(F.sum("c").cast("long").alias("t"))
    ic = attach_scalar(voc, tot).select(
        "w",
        (F.length(F.bin(F.expr("t DIV c"))) - 1).cast("long").alias("bits"),
    )
    ds = (
        tok.join(F.broadcast(ic), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            (F.sum("bits").cast("double") / F.count("*")).alias("mean_bits"),
        )
        .localCheckpoint(eager=True)
    )
    nd = ds.count()
    k1, k2 = (nd + 2) // 3, (2 * nd + 2) // 3
    ranked = global_row_number(ds, ["mean_bits", "doc_id"], "rn")
    th = {
        int(r.rn): float(r.mean_bits)
        for r in ranked.filter(F.col("rn").isin([k1, k2])).collect()
    }
    t1, t2 = th[k1], th[k2]
    all_tokens = int(ds.agg(F.sum("n_tokens")).first()[0])
    bucket = (
        F.when(F.col("mean_bits") <= t1, F.lit("head"))
        .when(F.col("mean_bits") <= t2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        ds.select(bucket.alias("bucket"), "n_tokens", "mean_bits")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            (F.count("*").cast("double") / F.lit(float(nd))).alias(
                "doc_share"
            ),
            (
                F.sum("n_tokens").cast("double") / F.lit(float(all_tokens))
            ).alias("token_share"),
            F.min("mean_bits").alias("min_mean_bits"),
            F.max("mean_bits").alias("max_mean_bits"),
        )
        .select(
            "*",
            F.lit(t1).alias("head_threshold"),
            F.lit(t2).alias("middle_threshold"),
        )
        .orderBy("bucket")
    )

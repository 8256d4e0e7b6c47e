"""Deterministic sampling for training-data pipelines.

The reference has no sampling (its dedup/filter path is the only row
selector); a 100 TB training pipeline needs reproducible train/val/test
splits, per-stratum quotas, and weighted source mixtures. All of these
are built on ONE primitive: an md5 hash of the row key compared against
precomputed hex thresholds.

Why md5-threshold instead of ``df.sample()``/``rand()``:

- **Deterministic & engine-portable** — the assignment of a row depends
  only on its key, not on partitioning, seed plumbing, or engine.
  DuckDB's ``md5(CAST(id AS VARCHAR))`` produces the identical hex
  string, so every sampler here is *exactly* value-oracle-checkable —
  not just statistically.
- **Stable under re-runs and appends** — a row keeps its split forever;
  adding data never reshuffles existing assignments (the property that
  prevents train/test leakage across dataset versions).
- **Shuffle-free** — a pure projection + filter; at 100 TB it
  pipelines into the scan with zero exchanges (vs sortBy/limit
  samplers which sort the world).

Fixed-length lowercase hex compares lexicographically exactly like the
underlying 128-bit integer, so a fraction ``p`` maps to the threshold
``hex(p · 2^128)`` — both engines compare strings, no numeric hex
parsing needed anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_key(col: Column, salt: str = "") -> Column:
    """Uniform 128-bit row hash as 32 lowercase hex chars. ``salt``
    decorrelates independent sampling decisions on the same key (e.g.
    split assignment vs downsampling)."""
    return F.md5(F.concat(F.lit(salt), col.cast("string")))


def hex_threshold(p: float) -> str:
    """32-hex-char threshold t such that P[md5 < t] = p for a uniform
    hash. p ≥ 1 returns a sentinel above every hex string."""
    if p >= 1.0:
        return "g" * 32  # 'g' > 'f': admits every hash
    if p <= 0.0:
        return "0" * 32
    return format(int(p * (1 << 128)), "032x")


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: list[tuple[str, float]],
    salt: str = "",
) -> DataFrame:
    """Adds a ``split`` column assigning each row to one of the named
    fractions, e.g. ``[("train", .8), ("val", .1), ("test", .1)]``.
    Pure projection — no shuffle, no seed, stable under appends."""
    h = hash_key(F.col(id_col), salt)
    total = sum(w for _, w in weights)
    expr, acc = None, 0.0
    for name, w in weights[:-1]:
        acc += w / total
        cond = h < F.lit(hex_threshold(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = weights[-1][0]
    return df.withColumn("split", F.lit(last) if expr is None else expr.otherwise(last))


def split_case_sql(id_expr: str, weights: list[tuple[str, float]], salt: str = "") -> str:
    """The DuckDB-equivalent CASE expression for :func:`hash_split` —
    same hex constants, so the oracle matches exactly."""
    h = f"md5('{salt}' || CAST({id_expr} AS VARCHAR))"
    total = sum(w for _, w in weights)
    parts, acc = [], 0.0
    for name, w in weights[:-1]:
        acc += w / total
        parts.append(f"WHEN {h} < '{hex_threshold(acc)}' THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{weights[-1][0]}' END"


def bernoulli_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep each row with probability ``fraction``, deterministically by
    key — the scan-pipelined replacement for ``df.sample()``."""
    return df.filter(hash_key(F.col(id_col), salt) < F.lit(hex_threshold(fraction)))


def stratified_quota(
    df: DataFrame, strata_col: str, id_col: str, quota: int, salt: str = ""
) -> DataFrame:
    """Exactly ``quota`` rows per stratum (fewer if the stratum is
    small), chosen by hash order — a reproducible pseudo-random sample
    with a hard per-group cap (per-language budgets, eval slices).
    One shuffle on the stratum key; the rank is computed per-partition
    after the exchange, never globally."""
    w = Window.partitionBy(strata_col).orderBy(hash_key(F.col(id_col), salt), id_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )


def shuffle_shards(
    df: DataFrame, id_col: str, num_shards: int, salt: str = "shuffle"
) -> DataFrame:
    """Deterministic global corpus shuffle, the scalable way: assign each
    row to one of ``num_shards`` shards by a 60-bit hash-prefix modulo
    (constant-size expression in the shard count), then rank WITHIN the shard by a
    second, decorrelated hash. Training jobs read shards in shard order
    and rows in ``pos`` order — a reproducible permutation of the corpus
    that never performs a global sort: one exchange on the shard key,
    each shard sorts independently. At 100 TB, ``num_shards`` scales
    with the cluster (thousands of shards ⇒ bounded per-task sort), vs.
    ``ORDER BY rand()`` which funnels the world through range
    partitioning with a driver-sampled boundary step.

    Adds ``shard`` (int) and ``pos`` (1-based rank within shard).
    Seedless/append-stable in shard ASSIGNMENT (a row's shard never
    changes); ``pos`` is recomputed per snapshot, as any rank must be.
    """
    h = hash_key(F.col(id_col), salt)
    # Arithmetic shard id — 60 hash bits modulo n — instead of a
    # hash-threshold CASE chain: the expression is CONSTANT-SIZE in
    # ``num_shards`` (a thousand-shard when-chain would bloat the plan
    # linearly), stays engine-portable (DuckDB parses the same
    # '0x'+hex-prefix cast), and the modulo bias over 2^60 is ~n/2^60.
    shard = (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % num_shards
    ).cast("int")
    d = df.withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(
        hash_key(F.col(id_col), salt + ":pos"), F.col(id_col)
    )
    return d.withColumn("pos", F.row_number().over(w))


def token_budget_select(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    tokens_col: Column,
    budget: int,
    salt: str = "budget",
) -> DataFrame:
    """Per-stratum token-budget-capped selection: walk each stratum in
    hash order (reproducible pseudo-random, append-order-independent)
    and keep rows while the running token total stays ≤ ``budget``.
    Because token counts are non-negative the running sum is monotone,
    so the kept set is a clean prefix of the hash order — deterministic
    and engine-portable. One shuffle on the stratum key; the cumulative
    window runs per-partition after the exchange (the standard "give
    every language/domain a token budget" curation step).

    Adds ``cum_tokens`` (running total including the current row)."""
    w = (
        Window.partitionBy(strata_col)
        .orderBy(hash_key(F.col(id_col), salt), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        "cum_tokens", F.sum(tokens_col).over(w).cast("long")
    ).filter(F.col("cum_tokens") <= budget)


def mixture_rates(
    df: DataFrame, strata_col: str, targets: dict[str, float]
) -> DataFrame:
    """Compute the per-source Bernoulli rates that realize a TARGET
    mixture (e.g. 50% src0 / 30% src1 / 20% src2) at the largest total
    size achievable without upsampling: the bottleneck source (max
    target-share-to-count ratio) is taken whole (rate 1.0) and every
    other source is downsampled proportionally. The output feeds
    :func:`weighted_mixture` as its ``rates`` dict.

    One map-side-combining count per source plus arithmetic over the
    |sources|-row grouped frame — the unpartitioned min-window is over
    that tiny frame, never the corpus. Expression shapes (``n / share``,
    ``(share * total) / n``) are mirrored token-for-token in the oracle
    SQL so the IEEE results agree bitwise."""
    counts = (
        df.filter(F.col(strata_col).isin(*targets.keys()))
        .groupBy(strata_col)
        .agg(F.count("*").alias("n_rows"))
    )
    share = None
    for value, p in targets.items():
        share = (
            F.when(F.col(strata_col) == value, F.lit(p))
            if share is None
            else share.when(F.col(strata_col) == value, F.lit(p))
        )
    tagged = counts.withColumn("target_share", share)
    w = Window.partitionBy()
    achievable = F.min(F.col("n_rows") / F.col("target_share")).over(w)
    return tagged.withColumn(
        "sample_rate", (F.col("target_share") * achievable) / F.col("n_rows")
    ).withColumn("expected_rows", F.col("sample_rate") * F.col("n_rows"))


def weighted_mixture(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum Bernoulli rates — the "mix 30% web + 100% wiki"
    recipe of training-data curation, as one shuffle-free filter."""
    h = hash_key(F.col(id_col), salt)
    expr = None
    for value, rate in rates.items():
        cond = (F.col(strata_col) == value) & (h < F.lit(hex_threshold(rate)))
        expr = cond if expr is None else expr | cond
    others = ~F.col(strata_col).isin(*rates.keys())
    default_cond = others & (h < F.lit(hex_threshold(default_rate)))
    return df.filter(default_cond if expr is None else expr | default_cond)

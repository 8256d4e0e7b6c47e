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

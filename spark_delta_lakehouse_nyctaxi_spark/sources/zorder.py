"""Z-order (Morton-curve) layout — multi-dimensional data clustering
for file skipping, the OPTIMIZE ZORDER BY analogue on plain parquet
(reference relies on Delta OPTIMIZE at utils/delta_ops.py:29-54; Delta
adds ZORDER in the same surface).

Range-sorting on ONE column gives perfect pruning on that column and
none on any other. Interleaving the bits of k columns' rank positions
gives files that are small hyper-rectangles in k-dimensional space, so
parquet min/max stats prune selective predicates on ANY of the z-by
columns (~x^(1/k) of files read for an x-selective point query).

Everything is JVM column expressions: a two-row stats pass computes
min/max per column (driver gets k pairs of longs — metadata-sized),
each value is scaled to a 16-bit position, and the positions'
bits are interleaved with shift/or arithmetic that whole-stage codegen
compiles to straight-line longs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 16


def _scaled(col: Column, lo: float, hi: float) -> Column:
    """Map [lo, hi] linearly onto [0, 2^BITS - 1] as a long."""
    if hi <= lo:
        return F.lit(0).cast("long")
    span = float(hi - lo)
    out = ((col.cast("double") - F.lit(float(lo))) / F.lit(span)) * F.lit(
        float(2**BITS - 1)
    )
    return F.least(
        F.greatest(F.round(out, 0).cast("long"), F.lit(0).cast("long")),
        F.lit(2**BITS - 1).cast("long"),
    )


def zorder_value(df: DataFrame, cols: list[str]) -> Column:
    """Morton code over ``cols`` (numeric/date-like). Runs one tiny
    min/max aggregate per call (2k scalars to the driver) — the same
    stats pass OPTIMIZE already does — then builds the interleave as a
    pure projection."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    scaled = [
        _scaled(F.col(c), stats[f"lo_{c}"], stats[f"hi_{c}"]) for c in cols
    ]
    k = len(scaled)
    z = F.lit(0).cast("long")
    for bit in range(BITS):
        for j, s in enumerate(scaled):
            # bit `bit` of column j lands at position bit*k + j
            z = z + F.shiftleft(
                F.shiftright(s, bit).bitwiseAND(F.lit(1)), bit * k + j
            )
    return z


def write_zordered(
    df: DataFrame, path: str, cols: list[str], num_files: int = 8
) -> None:
    """Write ``df`` as parquet clustered on the Morton curve of
    ``cols``: range-partition by z-value (balanced files), sort within
    each file (tight row-group stats). Readers need no special support —
    plain parquet min/max skipping does the pruning."""
    zv = zorder_value(df, cols)
    (
        df.withColumn("__z", zv)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )

"""Hilbert-curve layout — the locality-preserving alternative to
Z-order (sources/zorder.py) for multi-dimensional file clustering;
the same role Databricks liquid clustering fills over Delta OPTIMIZE
ZORDER (reference surface: utils/delta_ops.py:29-54).

Why Hilbert over Morton: the Morton curve has long diagonal jumps
(e.g. cell 0b0111→0b1000 crosses half the space), so some files end
up spanning wide hyper-rectangles; the Hilbert curve's successive
cells are always edge-adjacent, giving tighter per-file bounding
boxes and therefore strictly better min/max pruning on average
(Moon et al., "Analysis of the Clustering Properties of the Hilbert
Space-Filling Curve", TKDE 2001).

Implementation notes:
- The classic xy2d state walk mutates (x, y) each step; unrolling it
  into chained column expressions EXPLODES the tree ~4× per iteration
  (each new x/y references the old pair several times and Catalyst's
  CollapseProject re-inlines any withColumn staging) — measured 23 MiB
  serialized task binaries at ORDER=6, enough to OOM a default-heap
  driver. Instead the curve is a LITERAL LOOKUP TABLE: the driver runs
  the reference xy2d walk over all 4^ORDER grid cells once (4096
  ints, ~30 μs), and the column expression is
  element_at(lit(table), x * side + y + 1) — a single ~32 KB array
  literal, exactly correct by construction, evaluated JVM-side inside
  whole-stage codegen. 4096 curve cells are far finer than any
  practical file count, so pruning quality is unaffected; raising
  ORDER grows the table 4× per level (ORDER=8 → 512 KB, still fine).
- Everything else mirrors zorder.py: one metadata-sized min/max
  stats pass, linear scaling to grid positions, range-partition by
  curve value + sortWithinPartitions, plain parquet min/max skipping
  does the pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ORDER = 6  # bits per dimension: 64x64 grid, 4096 curve cells


def _scaled(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map [lo, hi] linearly onto [0, 2^bits - 1] as a long."""
    if hi <= lo:
        return F.lit(0).cast("long")
    span = float(hi - lo)
    out = ((col.cast("double") - F.lit(float(lo))) / F.lit(span)) * F.lit(
        float(2**bits - 1)
    )
    return F.least(
        F.greatest(F.round(out, 0).cast("long"), F.lit(0).cast("long")),
        F.lit(2**bits - 1).cast("long"),
    )


def hilbert_xy2d(order: int, x: int, y: int) -> int:
    """Reference (plain-Python) Hilbert index of grid cell (x, y) on a
    2^order × 2^order grid — the classic iterative xy2d. Used by the
    tests to certify the column-expression twin below."""
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def hilbert_value(df: DataFrame, cols: list[str], order: int = ORDER) -> Column:
    """Hilbert index over exactly two numeric/date-like columns.

    One tiny min/max aggregate (4 scalars to the driver — the stats
    pass OPTIMIZE already does), linear scaling onto the grid, then a
    single element_at against a driver-built literal lookup table of
    the full xy2d curve (see module docstring for why NOT an unrolled
    expression walk)."""
    if len(cols) != 2:
        raise ValueError("hilbert_value is 2-dimensional: pass two columns")
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    x = _scaled(F.col(cols[0]), stats[f"lo_{cols[0]}"], stats[f"hi_{cols[0]}"], order)
    y = _scaled(F.col(cols[1]), stats[f"lo_{cols[1]}"], stats[f"hi_{cols[1]}"], order)
    side = 1 << order
    lut = [
        hilbert_xy2d(order, px, py)
        for px in range(side)
        for py in range(side)
    ]
    # element_at is 1-based; packed index = x * side + y.
    return F.element_at(F.lit(lut), (x * side + y + 1).cast("int")).cast("long")


def write_hilbert_clustered(
    df: DataFrame, path: str, cols: list[str], num_files: int = 8
) -> None:
    """Write ``df`` as parquet clustered on the Hilbert curve of two
    ``cols``: range-partition by curve value (balanced files), sort
    within each file (tight row-group stats). Readers need no special
    support — plain parquet min/max skipping does the pruning."""
    hv = hilbert_value(df, cols)
    (
        df.withColumn("__h", hv)
        .repartitionByRange(num_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h")
        .write.mode("overwrite")
        .parquet(path)
    )

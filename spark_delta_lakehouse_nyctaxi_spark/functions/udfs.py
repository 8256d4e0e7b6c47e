"""Pandas UDFs — the sanctioned slow path (SURVEY.md §2.9: the
reference has no UDFs; extensions use pandas_udf only where no native
function exists).

The cosine UDF here exists as the vectorized-Python alternative to the
pure-JVM implementation in operators/similarity.py; tests assert both
agree. Rule of thumb encoded in this module: Arrow-batched pandas_udf
≥ 10× row-at-a-time Python UDFs, but JVM expressions beat both — use
UDFs only when expressions genuinely can't express the semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# Serialize this module by value so the UDFs work under drivers whose
# cwd / PYTHONPATH does not include this repo.
import sys as _sys
from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])


@pandas_udf(DoubleType())
def cosine_pandas_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine similarity between two array<float> columns.

    Ragged-array vectorized (round-2 review follow-up): the whole Arrow
    batch is flattened into two contiguous float64 buffers and the
    per-row dot/norm sums come from ONE ``np.add.reduceat`` pass each —
    no Python loop over rows in the math. float32 inputs upcast to
    float64 before any arithmetic, matching
    operators.similarity.cosine's double-precision discipline (numpy's
    partial-sum reductions can differ from the JVM's sequential fold in
    the last ulp — the parity test pins agreement at 1e-12; the JVM
    expression remains the hot path, per this module's docstring).
    """
    n = len(a)
    if n == 0:
        return pd.Series(np.empty(0, dtype=np.float64))
    av, bv = a.to_numpy(), b.to_numpy()
    lens = np.fromiter((len(v) for v in av), dtype=np.int64, count=n)
    lens_b = np.fromiter((len(v) for v in bv), dtype=np.int64, count=n)
    if not np.array_equal(lens, lens_b):
        raise ValueError("cosine_pandas_udf: vector length mismatch within batch")
    out = np.full(n, np.nan, dtype=np.float64)
    nonempty = lens > 0
    if nonempty.any():
        x = np.concatenate(av[nonempty]).astype(np.float64)
        y = np.concatenate(bv[nonempty]).astype(np.float64)
        ne_lens = lens[nonempty]
        ne_offs = np.zeros(int(nonempty.sum()), dtype=np.int64)
        np.cumsum(ne_lens[:-1], out=ne_offs[1:])
        dots = np.add.reduceat(x * y, ne_offs)
        na = np.sqrt(np.add.reduceat(x * x, ne_offs))
        nb = np.sqrt(np.add.reduceat(y * y, ne_offs))
        denom = na * nb
        with np.errstate(divide="ignore", invalid="ignore"):
            vals = np.where(denom > 0, dots / denom, np.nan)
        out[nonempty] = vals
    return pd.Series(out)


def zscore_by_group(df, group_col: str, value_col: str, id_cols: list[str]):
    """Grouped-map Pandas UDF (``applyInPandas``): per-group z-score of
    an INTEGER-valued column. The custom-logic escape hatch for
    per-group computations expressions can't state; each group arrives
    as one Arrow-backed pandas frame.

    Determinism contract: sums of int64 are exact in any order, so
    mean/variance come out bit-identical to the SQL formulation
    ``(sum(x)/n, sum(x²)/n - mean²)`` no matter how Spark partitions the
    groups — that's what lets the DuckDB oracle match exactly. (For
    genuinely fractional inputs you'd sort and use a fixed summation
    order instead.)

    Scale: one shuffle on the group key; each group must fit one
    executor's memory (the applyInPandas envelope — use windows or
    aggregates for groups that don't).
    """
    out_schema = ", ".join(
        [f"{c} long" for c in id_cols] + [f"{group_col} string", "zscore double"]
    )

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].to_numpy(dtype=np.int64)
        n = len(x)
        sx = int(x.sum())
        sxx = int((x.astype(object) * x.astype(object)).sum())  # exact big-int
        mean = sx / n
        var = sxx / n - mean * mean
        sd = var**0.5
        res = pdf[id_cols].copy()
        res[group_col] = pdf[group_col]
        res["zscore"] = (x - mean) / sd if sd > 0 else 0.0
        return res

    return df.groupBy(group_col).applyInPandas(_z, out_schema)


@pandas_udf(DoubleType())
def weighted_mean_udaf(v: pd.Series, w: pd.Series) -> float:  # type: ignore[misc]
    """GROUPED_AGG Pandas UDF (a vectorized UDAF): weighted mean.
    Partial batches arrive as Series; int64 sums keep it exact, so the
    result matches SQL ``SUM(v*w)/SUM(w)`` bit-for-bit."""
    vv = v.to_numpy(dtype=np.int64)
    ww = w.to_numpy(dtype=np.int64)
    num = int((vv.astype(object) * ww.astype(object)).sum())
    den = int(ww.sum())
    return float(num / den) if den else float("nan")


def asof_join_cogrouped(
    left, right, key: str, ts_col: str, value_cols: list[str]
):
    """As-of join via ``groupBy().cogroup().applyInPandas`` — the
    co-grouped-map API the as-of union+carry-forward implementation
    (operators/joins.py) doesn't exercise. Both sides are co-shuffled
    on the key and each key group is handed to ``pandas.merge_asof``
    (a sorted backward search) in one Arrow batch — per-key work stays
    distributed, nothing crosses the driver.

    Spark-first note: the union+carry-forward form is preferred at
    scale (pure JVM window, no Python); this exists for genuinely
    pandas-native per-group logic and as the parity test for that
    operator. Left columns (key, ts) + right value_cols carried as
    ``<c>_right`` plus ``ts_right``; unmatched left rows keep nulls.
    """
    import pandas as _pd

    from pyspark.sql import functions as _F
    from pyspark.sql.types import StructField, StructType

    suffixed = {ts_col: "ts_right", **{c: f"{c}_right" for c in value_cols}}
    # Alias right's columns to fresh names BEFORE cogrouping: when both
    # sides derive from the same source plan, left and right share
    # attribute IDs and Spark's cogroup de-duplicates the repeated
    # attributes out of the right-side Arrow batch (the pandas frame
    # arrives without its ts column). Fresh aliases = fresh attribute
    # IDs on the right side.
    r_proj = right.select(
        key, *[_F.col(c).alias(suffixed[c]) for c in [ts_col] + value_cols]
    )
    out_cols = [*left.columns, *suffixed.values()]
    out_schema = StructType(
        [left.schema[c] for c in left.columns]
        + [StructField(n, r_proj.schema[n].dataType, True) for n in suffixed.values()]
    )

    def _merge(l: _pd.DataFrame, r: _pd.DataFrame) -> _pd.DataFrame:
        if l.empty:
            return _pd.DataFrame(columns=out_cols)
        l = l.sort_values(ts_col, kind="mergesort")
        r = r[list(suffixed.values())].sort_values("ts_right", kind="mergesort")
        if r.empty:
            for c in suffixed.values():
                l[c] = None
            return l
        return _pd.merge_asof(
            l, r, left_on=ts_col, right_on="ts_right", direction="backward"
        )

    return (
        left.groupBy(key)
        .cogroup(r_proj.groupBy(key))
        .applyInPandas(_merge, schema=out_schema)
    )


def ewma_by_group(
    df,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.2,
):
    """Per-group exponentially-weighted moving average — the canonical
    ORDER-DEPENDENT stateful aggregate no SQL window expresses (each
    step folds the previous state: acc = α·x + (1−α)·acc, seeded with
    the group's first value).

    applyInPandas is exactly the right tool: the group's rows arrive as
    one Arrow batch, the fold is a tight Python loop over a numpy
    column, and only (group, n, ewma) leaves Python. Exactness: the
    fold is two multiplies and an add per step in IEEE double, in a
    deterministic (order_cols-sorted) order — bit-identical to a
    DuckDB ``list_reduce(list(v ORDER BY ...), (acc, x) -> α·x +
    (1−α)·acc)`` oracle, which performs the same left fold. One
    shuffle on the group key; state is O(1) per group.
    """
    beta = 1.0 - alpha

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        acc = float(vals[0])
        for x in vals[1:]:
            acc = alpha * float(x) + beta * acc
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n_events": [len(vals)],
                "ewma": [acc],
            }
        )

    return df.groupBy(group_col).applyInPandas(
        _fold, schema=f"{group_col} long, n_events long, ewma double"
    )

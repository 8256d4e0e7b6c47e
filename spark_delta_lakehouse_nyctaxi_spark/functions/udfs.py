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

    Matches operators.similarity.cosine's double-precision math:
    float32 inputs upcast to float64 before any arithmetic.
    """
    out = np.empty(len(a), dtype=np.float64)
    for i in range(len(a)):
        x = np.asarray(a.iloc[i], dtype=np.float64)
        y = np.asarray(b.iloc[i], dtype=np.float64)
        denom = np.sqrt((x * x).sum()) * np.sqrt((y * y).sum())
        out[i] = (x * y).sum() / denom if denom else np.nan
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

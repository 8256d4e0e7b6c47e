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

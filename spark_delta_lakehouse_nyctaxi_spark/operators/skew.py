"""Skew-mitigation operators.

AQE's skew-join (enabled in session.py) handles most cases at runtime
by splitting oversized shuffle partitions. Salting is the explicit
fallback for pathological producers — e.g. a fact table where one key
holds 30% of all rows joined against a dim too large to broadcast:

- fact side: append a uniform salt in [0, salt_factor)
- dim side: explode each row into salt_factor copies
- join on (key, salt) → the hot key spreads over salt_factor tasks

Cost model: dim side inflates by salt_factor, so pick
salt_factor ≈ (rows of hottest key) / (target rows per task); use only
when AQE's split is insufficient (e.g. aggregation-after-join keeps the
hot partition together).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⋈dim on ``on`` with the hot-key load spread over
    ``salt_factor`` sub-partitions. Result equals fact.join(dim, on, how)."""
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed=42) * salt_factor).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))).alias("__salt")
    salted_dim = dim.select("*", salts)
    out = salted_fact.join(salted_dim, [on, "__salt"], how)
    return out.drop("__salt")

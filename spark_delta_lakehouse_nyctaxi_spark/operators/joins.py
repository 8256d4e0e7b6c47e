"""Custom join operators Spark lacks natively.

As-of join (time-series point-in-time lookup): implemented as a
composition of existing DataFrame ops — union the two sides, sort
within each key partition, carry the last-seen right row forward with
``last(ignorenulls=True)``. ONE shuffle on (by, ts) and no range
explosion, vs the naive equi-join + filter + window which shuffles the
full cartesian of same-key rows. This is the standard scalable as-of
strategy (same shape Flink/kdb use); pandas ``merge_asof`` semantics
(direction="backward", inclusive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row (same ``by``
    keys, right_ts <= left_ts; ties at equal ts match). Left rows with
    no prior right row get nulls."""
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in by and c != right_ts
    ]
    r_payload = right_value_cols + [right_ts]
    r_struct_type = StructType([right.schema[c] for c in r_payload])

    l = left.select(
        *by,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r = right.select(
        *by,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(StructType(left.schema.fields)).alias("__l"),
        F.struct(*[F.col(c) for c in r_payload]).alias("__r"),
    )
    u = l.unionByName(r)
    # right rows (0) sort before left rows (1) at equal ts → inclusive
    w = (
        Window.partitionBy(*by)
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__r", ignorenulls=True).over(w).alias("__match")
    out = u.withColumn("__match", carried).filter(F.col("__is_left") == 1)
    cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    cols += [
        F.col(f"__match.{c}").alias(c + suffix if c in left.columns else c)
        for c in right_value_cols
    ]
    cols.append(F.col(f"__match.{right_ts}").alias(right_ts + suffix))
    return out.select(*cols)

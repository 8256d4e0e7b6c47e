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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_us: int,
    by: list[str] | None = None,
) -> DataFrame:
    """Interval overlap join via fixed-bucket decomposition.

    Joins every left interval ``[left_start, left_end)`` with every
    right interval ``[right_start, right_end)`` that OVERLAPS it
    (half-open semantics: ``l_start < r_end AND r_start < l_end``).
    Endpoints are TIMESTAMP/TIMESTAMP_NTZ columns.

    Spark has no native interval join; the naive formulation is a
    range-predicate theta join, which Catalyst can only execute as a
    broadcast nested loop (fine when one side is tiny, quadratic
    otherwise).  This operator uses the standard scale strategy
    (DuckDB's IEJoin paper's baseline, Flink's interval-join bucketing):
    each interval is exploded to the fixed ``bucket_us``-wide epoch
    buckets it touches, the two sides equi-join on the bucket id —
    a plain shuffled hash join — and a residual predicate keeps true
    overlaps.  A pair overlapping k shared buckets would surface k
    times, so matches are attributed to ONE canonical bucket (the
    bucket of the later of the two start points — which both intervals
    by construction touch) instead of a distinct: the join stays
    duplicate-free without a post-shuffle dedup.  Optional ``by``
    columns become part of the equi-join key (keyed interval join —
    e.g. per-user attribution windows), which both prunes candidates
    and spreads the shuffle across (key, bucket) space.

    Cost: |left'| + |right'| where each side grows by its interval
    length / bucket_us (choose the bucket near the typical interval
    length); the join itself is bucket-partitioned, so at 100 TB it
    shuffles on a high-cardinality key and never materializes the
    cross product.  Skewed hot buckets (an interval spanning the whole
    timeline) are the same pathology as any hot join key — cap
    interval length upstream or salt the bucket id.
    """
    lb = (
        left.withColumn(
            "_lb0", F.expr(f"timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01', {left_start})")
        )
        .withColumn(
            "_lb1", F.expr(f"timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01', {left_end})")
        )
        .withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.expr(f"_lb0 DIV {bucket_us}"),
                    # half-open: an interval ending exactly on a bucket
                    # boundary does not touch that bucket
                    F.expr(f"(_lb1 - 1) DIV {bucket_us}"),
                )
            ),
        )
    )
    rb = (
        right.withColumn(
            "_rb0", F.expr(f"timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01', {right_start})")
        )
        .withColumn(
            "_rb1", F.expr(f"timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01', {right_end})")
        )
        .withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.expr(f"_rb0 DIV {bucket_us}"),
                    F.expr(f"(_rb1 - 1) DIV {bucket_us}"),
                )
            ),
        )
    )
    joined = lb.join(rb, (by or []) + ["_bucket"]).filter(
        (F.col("_lb0") < F.col("_rb1"))
        & (F.col("_rb0") < F.col("_lb1"))
        # canonical attribution: the bucket containing max(l_start, r_start)
        & (
            F.col("_bucket")
            == F.expr(f"greatest(_lb0, _rb0) DIV {bucket_us}")
        )
    )
    return joined.drop("_bucket", "_lb0", "_lb1", "_rb0", "_rb1")

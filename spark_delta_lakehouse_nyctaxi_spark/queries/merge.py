"""MERGE-upsert query (SURVEY.md §2.1 S5 / §2.4 J1 — the reference's only
join lives inside Delta MERGE, utils/incremental.py:89-156).

The Spark side exercises the REAL storage path: writes the target as a
VersionedTable, merges the source (join-based rewrite), reads the result
back from parquet. The oracle expresses the same semantics as a
full-outer-join + COALESCE, per SURVEY.md §7.4.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import functions as F

from ..sources.readers import load_table
from ..sources.table import VersionedTable
from . import register

SCRATCH_ROOT = "/root/repo/.scratch"


def scratch_dir(prefix: str) -> str:
    """Unique scratch dir; opportunistically clears siblings >1h old."""
    os.makedirs(SCRATCH_ROOT, exist_ok=True)
    now = time.time()
    for d in os.listdir(SCRATCH_ROOT):
        p = os.path.join(SCRATCH_ROOT, d)
        try:
            if now - os.path.getmtime(p) > 3600:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    return os.path.join(SCRATCH_ROOT, f"{prefix}-{uuid.uuid4().hex[:8]}")


@register(
    "q_merge_upsert",
    """
    WITH target AS (
        SELECT * FROM orders WHERE o_orderkey % 4 <> 0
    ), source AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice + 1000.0 AS o_totalprice
        FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
           COALESCE(s.o_custkey, t.o_custkey) AS o_custkey,
           COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice,
           COALESCE(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus
    FROM target t FULL JOIN source s ON t.o_orderkey = s.o_orderkey
    """,
    doc="MERGE upsert through the versioned-table storage path: "
        "whenMatchedUpdate + whenNotMatchedInsert, verified against a "
        "full-outer-join + COALESCE oracle.",
)
def q_merge_upsert(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    target_df = orders.filter(F.col("o_orderkey") % 4 != 0)
    source_df = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
    )
    t = VersionedTable(spark, scratch_dir("merge"))
    t.write(target_df, mode="overwrite")
    t.merge(source_df, keys=["o_orderkey"])
    return t.read().select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")

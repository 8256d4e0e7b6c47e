#!/usr/bin/env python
"""OPTIMIZE (compaction + optional Z-ORDER) for VersionedTables —
reference parity: `scripts/optimize_tables.py` (compaction via
`utils/delta_ops.py:29-54`).

    python scripts/optimize_tables.py --table all
    python scripts/optimize_tables.py --path /lake/tbl --zorder-cols a,b

Compaction rewrites the current snapshot into ``--target-files`` files
per partition (a new table version — time travel still reaches the
pre-OPTIMIZE layout).  With ``--zorder-cols`` the rewrite is clustered
on the Morton curve of those columns (range-partitioned + sorted within
files) so parquet min/max skipping prunes on every listed column — the
OSS analog of Delta's `OPTIMIZE ... ZORDER BY`.  One rewrite pass either
way (the reference runs compaction twice when Z-ORDER is requested —
SURVEY.md §4 flags that as a fixable inefficiency, not semantics).
"""

from __future__ import annotations

from _cli_common import (
    VersionedTable,
    add_common_args,
    argparse,
    open_session,
    resolve_tables,
    stop_spark,
)


def optimize_table(
    spark, path: str, target_files: int = 1, zorder_cols: list[str] | None = None
) -> dict:
    t = VersionedTable(spark, path)
    if not t.exists():
        return {"path": path, "status": "skipped", "reason": "no such table"}
    if zorder_cols:
        from spark_delta_lakehouse_nyctaxi_spark.sources.zorder import zorder_value

        info = t._resolve()
        df = t.read()
        zv = zorder_value(df, zorder_cols)
        clustered = (
            df.withColumn("__z", zv)
            .repartitionByRange(max(1, target_files), "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
        vinfo = t.write(clustered, mode="overwrite",
                        partition_by=list(info.partition_by) or None)
        return {
            "path": path,
            "status": "optimized",
            "operation": f"ZORDER BY ({', '.join(zorder_cols)})",
            "new_version": vinfo.version,
        }
    vinfo = t.compact(target_files=target_files)
    return {"path": path, "status": "optimized", "operation": "COMPACT",
            "new_version": vinfo.version}


def main() -> int:
    ap = argparse.ArgumentParser(description="Optimize (compact/Z-ORDER) tables")
    add_common_args(ap)
    ap.add_argument("--target-files", type=int, default=1)
    ap.add_argument("--zorder-cols", help="comma-separated columns to Z-ORDER by")
    args = ap.parse_args()
    zcols = [c.strip() for c in args.zorder_cols.split(",")] if args.zorder_cols else None

    spark = open_session("optimize-tables")
    try:
        for name, path in resolve_tables(args):
            result = optimize_table(spark, path, args.target_files, zcols)
            print(f"{name}: {result}")
        return 0
    finally:
        stop_spark(spark)


if __name__ == "__main__":
    raise SystemExit(main())

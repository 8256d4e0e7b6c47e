#!/usr/bin/env python
"""Hard-link SHALLOW CLONE for VersionedTables (Delta CLONE analog).

    python scripts/clone_table.py --path /lake/tbl --dest /lake/tbl_dev
    python scripts/clone_table.py --path /lake/tbl --dest /lake/x --version 3

Materializes a snapshot as a NEW independent table with near-zero data
copy — every parquet file is hard-linked, so the cost is directory
entries and O(files) driver time, no Spark job.  Unlike Delta's shallow
clone, vacuuming either side cannot break the other (links keep inodes
alive).  Carries skipping stats, pending tombstones, any pending
column-rename mapping, CHECK constraints, and generated columns.
"""

from __future__ import annotations

from _cli_common import (
    VersionedTable,
    argparse,
    open_session,
    stop_spark,
)


def main() -> int:
    ap = argparse.ArgumentParser(description="Shallow-clone a versioned table")
    ap.add_argument("--path", required=True, help="source table location")
    ap.add_argument("--dest", required=True, help="destination location (must be empty)")
    ap.add_argument("--version", type=int, default=None,
                    help="snapshot version to clone (default: latest)")
    args = ap.parse_args()

    spark = open_session("clone-table")
    try:
        t = VersionedTable(spark, args.path)
        if not t.exists():
            print(f"no such table: {args.path}")
            return 1
        c = t.clone(args.dest, version=args.version)
        d = c.detail()
        print(
            f"cloned {args.path}@{'latest' if args.version is None else args.version}"
            f" -> {args.dest}: {d['num_files']} files hard-linked,"
            f" {d['num_units']} unit(s), version 0"
        )
        return 0
    finally:
        stop_spark(spark)


if __name__ == "__main__":
    raise SystemExit(main())

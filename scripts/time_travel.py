#!/usr/bin/env python
"""Time-travel operations for VersionedTables — reference parity:
`scripts/time_travel.py` (`utils/delta_ops.py:107-204`): history / read
/ restore dispatch on one table.

    python scripts/time_travel.py history --path /lake/tbl
    python scripts/time_travel.py read    --path /lake/tbl --version 0
    python scripts/time_travel.py read    --path /lake/tbl --timestamp "2026-08-14 00:00:00"
    python scripts/time_travel.py restore --path /lake/tbl --version 0
"""

from __future__ import annotations

import datetime as _dt

from _cli_common import (
    VersionedTable,
    add_common_args,
    argparse,
    open_session,
    resolve_tables,
    stop_spark,
)


def main() -> int:
    ap = argparse.ArgumentParser(description="Table time travel")
    ap.add_argument("operation", choices=["history", "read", "restore"])
    add_common_args(ap, with_all=False)
    ap.add_argument("--version", type=int, help="version for read/restore")
    ap.add_argument("--timestamp", help="'YYYY-MM-DD HH:MM:SS' for read")
    ap.add_argument("--limit", type=int, default=20, help="rows/entries to show")
    ap.add_argument("--output", help="write the read snapshot as parquet here")
    args = ap.parse_args()

    if not (args.path or args.table):
        raise SystemExit("time_travel.py needs --path or --table")

    spark = open_session("time-travel")
    try:
        [(name, path)] = resolve_tables(args)
        t = VersionedTable(spark, path)
        if not t.exists():
            raise SystemExit(f"{name}: no such table at {path}")

        if args.operation == "history":
            for entry in t.history(limit=args.limit):
                print(entry)
            return 0

        if args.operation == "read":
            ts = None
            if args.timestamp:
                ts = _dt.datetime.strptime(
                    args.timestamp, "%Y-%m-%d %H:%M:%S"
                ).timestamp()
            df = t.read(version=args.version, timestamp=ts)
            if args.output:
                df.write.mode("overwrite").parquet(args.output)
                print(f"{name}: wrote {df.count()} rows to {args.output}")
            else:
                df.show(args.limit, truncate=False)
            return 0

        # restore
        if args.version is None:
            raise SystemExit("restore needs --version")
        vinfo = t.restore(args.version)
        print(f"{name}: restored to version {args.version} "
              f"(new head version {vinfo.version})")
        return 0
    finally:
        stop_spark(spark)


if __name__ == "__main__":
    raise SystemExit(main())

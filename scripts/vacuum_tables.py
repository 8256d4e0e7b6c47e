#!/usr/bin/env python
"""VACUUM for VersionedTables — reference parity:
`scripts/vacuum_tables.py` (`utils/delta_ops.py:65-104`).

    python scripts/vacuum_tables.py --table all --retain-last 2
    python scripts/vacuum_tables.py --path /lake/tbl --dry-run

Removes data directories no longer referenced by the most recent
``--retain-last`` versions.  The reference's knob is wall-clock
retention hours (Delta semantics); VersionedTable's is version-count
based so behavior is deterministic under test — `--retain-last 2`
roughly corresponds to the reference's default 168 h on a daily-write
table.  `--dry-run` lists what would be removed without touching disk
(same flag the reference exposes).
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


def main() -> int:
    ap = argparse.ArgumentParser(description="Vacuum old table versions")
    add_common_args(ap)
    ap.add_argument("--retain-last", type=int, default=2,
                    help="number of most-recent versions whose files are kept")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    spark = open_session("vacuum-tables")
    try:
        for name, path in resolve_tables(args):
            t = VersionedTable(spark, path)
            if not t.exists():
                print(f"{name}: skipped (no such table)")
                continue
            removed = t.vacuum(retain_last=args.retain_last, dry_run=args.dry_run)
            verb = "would remove" if args.dry_run else "removed"
            print(f"{name}: {verb} {len(removed)} commit dir(s): {removed}")
        return 0
    finally:
        stop_spark(spark)


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""VACUUM for VersionedTables — reference parity:
`scripts/vacuum_tables.py` (`utils/delta_ops.py:65-104`).

    python scripts/vacuum_tables.py --table all --retain-last 2
    python scripts/vacuum_tables.py --path /lake/tbl --dry-run
    python scripts/vacuum_tables.py --path /lake/tbl --retain-hours 168

Removes data directories no longer referenced by the retained
versions.  ``--retain-last`` keeps the most recent N versions
(count-based, deterministic under test); ``--retain-hours`` is the
reference's wall-clock knob (Delta ``VACUUM ... RETAIN n HOURS``,
``utils/delta_ops.py:65-104`` defaults 168 h) — versions committed
inside the window stay time-travelable, and when both are given a
version is kept if either rule keeps it.  ``--dry-run`` lists what
would be removed without touching disk (same flag the reference
exposes).
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
    ap.add_argument("--retain-hours", type=float, default=None,
                    help="also keep every version committed within this "
                         "many hours (Delta RETAIN n HOURS semantics)")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    spark = open_session("vacuum-tables")
    try:
        for name, path in resolve_tables(args):
            t = VersionedTable(spark, path)
            if not t.exists():
                print(f"{name}: skipped (no such table)")
                continue
            removed = t.vacuum(retain_last=args.retain_last,
                               retain_hours=args.retain_hours,
                               dry_run=args.dry_run)
            verb = "would remove" if args.dry_run else "removed"
            print(f"{name}: {verb} {len(removed)} commit dir(s): {removed}")
        return 0
    finally:
        stop_spark(spark)


if __name__ == "__main__":
    raise SystemExit(main())

"""Physical-plan inspection helpers.

The 100 TB discipline is enforced here: tests assert that filters reach
the parquet scan (PushedFilters), projections prune columns
(ReadSchema), dimension joins broadcast, top-k avoids global sorts, and
nothing in the dedup/similarity paths degenerates into a cartesian
product. `.explain` is a debugging aid; these make it a regression
gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters sections of all scans."""
    plan = explain_str(df)
    return "\n".join(line for line in plan.splitlines() if "PushedFilters" in line)


def read_schemas(df: DataFrame) -> str:
    plan = explain_str(df)
    return "\n".join(line for line in plan.splitlines() if "ReadSchema" in line)


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_cartesian(df: DataFrame) -> bool:
    plan = explain_str(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def unbounded_following_frames(df: DataFrame) -> int:
    """Number of window frames whose UPPER bound is unboundedFollowing
    while the lower bound is NOT unboundedPreceding — Spark executes
    these with UnboundedFollowingWindowFunctionFrame, which re-scans
    the partition tail for EVERY row: O(n²) per partition (the
    q_resample_interpolate lesson, 21s → 2.0s once rewritten as a
    running frame over the DESCENDING sort). A frame unbounded on BOTH
    ends is fine (computed once per partition) and not counted."""
    import re

    plan = explain_str(df, mode="extended")
    return len(
        re.findall(
            r"specifiedwindowframe\((?:Row|Range)Frame,"
            r"(?!\s*unboundedpreceding)[^,]+,\s*unboundedfollowing\$\(\)\)",
            plan,
        )
    )


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (formatted mode
    prints each operator once as a `(N) Exchange` detail header).

    On an EXECUTED AQE plan, formatted mode prints the tree twice
    (`== Final Plan ==` + `== Initial Plan ==`) and emits detail
    headers for both, double-counting every exchange (found while
    regenerating PLANS.md cold, r6 verdict item 2: q_longest_dup_run
    read 10 post-collect vs its true 5). Count unique node ids from
    the Final Plan tree section in that case."""
    import re

    plan = explain_str(df)
    if "== Final Plan ==" in plan:
        final = plan.split("== Initial Plan ==")[0]
        return len(set(re.findall(r"\bExchange \((\d+)\)", final)))
    return len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in explain_str(df)


def single_partition_windows(df: DataFrame) -> int:
    """Number of Window operators fed by an ``Exchange SinglePartition``
    — the unpartitioned-window scale-killer (all rows through one task).
    Global aggregates legitimately use SinglePartition exchanges over
    one-row-per-partition partials, so the gate is Window-specific: a
    Window (or WindowGroupLimit) line whose subtree starts with a
    single-partition exchange within the next few plan lines."""
    import re

    plan = explain_str(df, "simple")
    lines = plan.splitlines()
    hits = 0
    for i, line in enumerate(lines):
        if re.search(r"\bWindow(GroupLimit)?\b", line):
            for nxt in lines[i + 1 : i + 5]:
                if "Exchange SinglePartition" in nxt:
                    hits += 1
                    break
                if re.search(r"\bExchange hashpartitioning|\bWindow\b", nxt):
                    break
    return hits


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Distinct whole-stage-codegen stages: `*(N)` markers in simple
    mode (formatted mode hides them under AQE wrappers)."""
    import re

    plan = explain_str(df, "simple")
    return len(set(re.findall(r"\*\((\d+)\)", plan)))

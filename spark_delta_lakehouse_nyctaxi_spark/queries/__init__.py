"""Named query registry — the verification surface of the engine.

Each entry maps a query name (from SURVEY.md §2's operator inventory) to
a ``QuerySpec``: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus
the equivalent ANSI SQL for the DuckDB oracle (or ``None`` for
non-SQL-expressible operators, which get rows-only checks).

Determinism contract (see SURVEY.md §7.4):
- double aggregates go through per-row ``CAST(x AS DECIMAL(p,s))`` then
  exact decimal SUM, cast back to DOUBLE.  A double→decimal cast can
  never hit a rounding tie (no binary double equals an exact midpoint
  decimal), so Spark and DuckDB agree bit-for-bit regardless of
  partitioning / summation order.
- every ORDER BY used to pick rows (top-k, window ranks, dedup
  survivors) carries a unique-key tiebreaker.
- column names are aliased identically on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]  # DuckDB oracle; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: Optional[str], doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, sql=sql, doc=doc)
        return fn

    return deco


# Import side-effect: populate REGISTRY.
from . import relational  # noqa: E402,F401
from . import aggregates  # noqa: E402,F401
from . import joins  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import merge  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import functions  # noqa: E402,F401
from . import storage  # noqa: E402,F401
from . import governance  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import subqueries  # noqa: E402,F401
from . import sampling  # noqa: E402,F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}

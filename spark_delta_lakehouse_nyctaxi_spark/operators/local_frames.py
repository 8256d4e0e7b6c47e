"""JVM-local literal DataFrames for small broadcast-side relations.

``spark.createDataFrame(rows, ...)`` ships Python objects into a
pickled Python RDD, so every scan of the result (and every
BroadcastExchange rebuild — one per job under AQE) round-trips through
Python worker processes. For the small driver-side relations the
vector-index operators broadcast on every pass (codebooks, centroid
tables, candidate cell pairs), that is pure fixed overhead repeated
per job: measured ~0.2s per broadcast build at sf0.1, times the
~4 codebook builds inside one PQ query.

:func:`literal_frame` renders the same rows as a ``VALUES`` SQL
statement instead — Catalyst resolves an inline table straight to a
JVM ``LocalRelation``, so scans never leave the JVM and the physical
plan shows ``LocalTableScan`` rather than ``Scan ExistingRDD``.

Exactness contract: DOUBLE cells are rendered as
``CAST('<repr(x)>' AS DOUBLE)``. ``repr`` of a Python float is the
shortest round-trip decimal string, and Spark's string→double parse is
correctly rounded, so the materialized value is bit-identical to the
input float. (A bare decimal literal would parse as DECIMAL —
Spark and DuckDB both pull un-suffixed literals out of the double
domain; see the ``dlit()`` discipline in ``queries/analytics.py``.)
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

_INT_TYPES = {"tinyint", "smallint", "int", "integer", "bigint", "long"}


def _render_cell(v, typ: str) -> str:
    if v is None:
        return f"CAST(NULL AS {typ})"
    t = typ.lower()
    if t in _INT_TYPES:
        return f"CAST({int(v)} AS {typ})"
    if t in ("double", "float", "real"):
        x = float(v)
        if math.isnan(x):
            return f"CAST('NaN' AS {typ})"
        if math.isinf(x):
            return f"CAST('{'-' if x < 0 else ''}Infinity' AS {typ})"
        return f"CAST('{x!r}' AS {typ})"
    if t in ("string", "varchar"):
        esc = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{esc}'"
    if t == "boolean":
        return "true" if v else "false"
    raise ValueError(f"literal_frame: unsupported type {typ!r}")


def literal_frame(
    spark: SparkSession, rows: Sequence[Sequence], schema: str
) -> DataFrame:
    """Build a small DataFrame of driver-side literals as a pure JVM
    ``LocalRelation`` (via ``VALUES``), avoiding the Python-RDD scan
    that ``spark.createDataFrame`` plans.

    ``schema`` is the usual DDL string (``"cid int, x double"``).
    Intended for broadcast-side relations up to a few thousand rows
    (codebooks, centroid tables, candidate lists); the rendered SQL
    grows linearly with the cell count. Falls back to
    ``createDataFrame`` for empty input (VALUES needs ≥1 row).
    """
    cols = []
    # a naive split(",") would silently mis-split parameterized types
    # (decimal(10,2), array<...>) — reject anything _render_cell can't
    # render AT PARSE TIME so a future caller gets an error, not a
    # frame with wrong columns
    for field in schema.split(","):
        parts = field.strip().split(None, 1)
        if len(parts) != 2:
            raise ValueError(
                f"literal_frame: cannot parse schema field {field.strip()!r} "
                f"(only simple 'name type' fields with scalar types are "
                f"supported — no decimal(p,s)/array<>/map<>/struct<>)"
            )
        name, typ = parts
        t = typ.strip().lower()
        if t not in _INT_TYPES | {"double", "float", "real", "string",
                                  "varchar", "boolean"}:
            raise ValueError(
                f"literal_frame: unsupported type {typ.strip()!r} for "
                f"column {name!r} (parameterized/nested types would "
                f"mis-split on the comma parse)"
            )
        cols.append((name, typ.strip()))
    if not rows:
        return spark.createDataFrame([], schema)
    for i, r in enumerate(rows):
        if len(r) != len(cols):
            raise ValueError(
                f"literal_frame: row {i} has {len(r)} cells for "
                f"{len(cols)} columns"
            )
    rendered = ",".join(
        "(" + ",".join(_render_cell(v, typ) for v, (_, typ) in zip(r, cols)) + ")"
        for r in rows
    )
    names = ", ".join(n for n, _ in cols)
    return spark.sql(f"SELECT * FROM (VALUES {rendered}) AS t({names})")

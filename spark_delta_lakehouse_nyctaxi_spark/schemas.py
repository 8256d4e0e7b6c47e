"""Schema declaration, validation, and enforcement.

Reference parity: utils/schemas.py —
- validate_schema (:111-152): field-set + type-compat + nullability
  comparison with compat relaxations string→timestamp, int→long,
  int→double (:155-182)
- enforce_schema (:185-237): case-insensitive rename to canonical names,
  per-field cast (to_timestamp/to_date for string sources, generic cast
  otherwise), returning (df, warnings)

All casts are Catalyst expressions — schema enforcement costs one
projection, nothing driver-side, at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DataType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructType,
    TimestampType,
)

# (source, target) pairs considered compatible without a warning
# (utils/schemas.py:155-182).
_COMPAT: set[tuple[str, str]] = {
    ("string", "timestamp"),
    ("string", "date"),
    ("int", "bigint"),
    ("int", "double"),
    ("bigint", "double"),
    ("float", "double"),
}


def types_compatible(src: DataType, dst: DataType) -> bool:
    if src == dst:
        return True
    return (src.simpleString(), dst.simpleString()) in _COMPAT


def validate_schema(
    df_schema: StructType,
    expected: StructType,
    allow_extra_columns: bool = False,
    strict_nullability: bool = False,
) -> tuple[bool, list[str]]:
    """Compare a DataFrame schema to a declared one. Returns
    (is_valid, errors). Case-insensitive on names.

    Nullability is advisory by default: Spark projections generally
    produce nullable fields, so "nullable data vs non-null declaration"
    only fails under ``strict_nullability`` (the declared NOT NULL is
    enforced by the DQ null checks instead, which examine the data)."""
    errors: list[str] = []
    actual = {f.name.lower(): f for f in df_schema.fields}
    declared = {f.name.lower(): f for f in expected.fields}

    for name, exp in declared.items():
        if name not in actual:
            errors.append(f"missing column: {exp.name}")
            continue
        act = actual[name]
        if not types_compatible(act.dataType, exp.dataType):
            errors.append(
                f"type mismatch for {exp.name}: "
                f"{act.dataType.simpleString()} vs expected {exp.dataType.simpleString()}"
            )
        if strict_nullability and act.nullable and not exp.nullable:
            errors.append(f"nullability mismatch for {exp.name}: nullable data, non-null schema")

    if not allow_extra_columns:
        for name, act in actual.items():
            if name not in declared:
                errors.append(f"unexpected column: {act.name}")

    return (not errors, errors)


def enforce_schema(df: DataFrame, expected: StructType) -> tuple[DataFrame, list[str]]:
    """Rename (case-insensitively) and cast to the declared schema.

    String sources casting to timestamp/date use to_timestamp/to_date
    (reference utils/schemas.py:227-228); everything else a plain cast.
    Unknown extra columns are dropped; missing columns become typed
    nulls with a warning.
    """
    warnings: list[str] = []
    by_lower = {c.lower(): c for c in df.columns}
    cols = []
    for field in expected.fields:
        src_name = by_lower.get(field.name.lower())
        if src_name is None:
            warnings.append(f"missing column {field.name}: filled with nulls")
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
            continue
        c = F.col(src_name)
        src_type = df.schema[src_name].dataType
        if src_type == field.dataType:
            expr = c
        elif isinstance(field.dataType, TimestampType) and isinstance(src_type, StringType):
            expr = F.to_timestamp(c)
        elif isinstance(field.dataType, DateType) and isinstance(src_type, StringType):
            expr = F.to_date(c)
        else:
            expr = c.cast(field.dataType)
            if not types_compatible(src_type, field.dataType):
                warnings.append(
                    f"lossy cast {field.name}: {src_type.simpleString()} -> "
                    f"{field.dataType.simpleString()}"
                )
        if src_name != field.name:
            warnings.append(f"renamed {src_name} -> {field.name}")
        cols.append(expr.alias(field.name))
    dropped = [c for c in df.columns if c.lower() not in {f.name.lower() for f in expected.fields}]
    for d in dropped:
        warnings.append(f"dropped extra column {d}")
    return df.select(*cols), warnings


# Declared schemas for the star-schema pipeline (the analog of
# utils/schemas.py:9-108's bronze/silver/gold declarations).

def orders_silver_schema() -> StructType:
    return StructType() \
        .add("o_orderkey", LongType(), False) \
        .add("o_custkey", LongType(), True) \
        .add("o_orderstatus", StringType(), True) \
        .add("o_totalprice", DoubleType(), True) \
        .add("o_orderdate", TimestampType(), True) \
        .add("o_orderpriority", StringType(), True) \
        .add("order_date", DateType(), True)


def daily_kpis_schema() -> StructType:
    return StructType() \
        .add("order_date", DateType(), False) \
        .add("daily_order_count", LongType(), True) \
        .add("daily_total_revenue", DoubleType(), True) \
        .add("avg_order_value", DoubleType(), True)

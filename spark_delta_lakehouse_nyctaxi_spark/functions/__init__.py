"""Scalar function library (SURVEY.md §2.8 + planned extensions).

Everything here is a thin, named composition of pyspark.sql.functions —
JVM-side, codegen-friendly. Python UDFs live in udfs.py and are the
explicitly-marked slow path.
"""

from .udfs import cosine_pandas_udf  # noqa: F401

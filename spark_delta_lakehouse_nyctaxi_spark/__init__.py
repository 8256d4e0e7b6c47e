"""spark_delta_lakehouse_nyctaxi_spark — a PySpark-native analytics engine.

Re-implements the capability surface of the reference repo
``tarunngusain08/spark-delta-lakehouse-nyctaxi`` (a PySpark + Delta Lake
medallion ETL pipeline) as an idiomatic, Spark-first engine:

- declarative DataFrame/SQL plans (Catalyst optimizes; no hand scheduling)
- a versioned parquet table layer standing in for Delta's storage
  operators (MERGE / time travel / history / restore / vacuum), since
  delta-spark is not available in this environment
- the governance scaffolding the reference ships (schema enforcement,
  data-quality checks, audit tables, DAG orchestration)
- large-scale training-data-pipeline extensions: dedup (exact, MinHash-LSH,
  SimHash), similarity search, text analysis, multimodal column plumbing

Every operator is designed for 100 TB scale: no driver-side collects on
data paths, broadcast joins for dims, single-pass aggregations,
partition-pruning-friendly layouts.
"""

__version__ = "0.1.0"

"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a partition-planned JSONL reader.

This is the extension point the reference never needed (its sources are
CSV/Delta built-ins) but a real lakehouse does: proprietary formats,
REST-backed manifests, media-shard indexes. The contract demonstrated:

- ``DataSource.schema()``    — declared schema, no inference pass
- ``reader.partitions()``    — one :class:`InputPartition` per file, so
  Spark schedules each file to an executor (parallelism = file count;
  at 100 TB you'd emit one partition per file-range instead)
- ``reader.read(partition)`` — a plain-Python iterator per partition,
  executed on the WORKERS, never the driver

Registered per-session via ``spark.dataSource.register(JsonlDataSource)``
then used as ``spark.read.format("jsonl_manifest").load(dir)``.
"""

from __future__ import annotations

import sys as _sys

from pyspark import cloudpickle as _cloudpickle
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class JsonlPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonlReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.path = options.get("path")

    def partitions(self):
        import os

        files = sorted(
            f for f in os.listdir(self.path) if f.endswith((".txt", ".json", ".jsonl"))
        )
        return [JsonlPartition(f"{self.path}/{f}") for f in files]

    def read(self, partition):
        import json

        names = [f.name for f in self.schema.fields]
        with open(partition.path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                d = json.loads(line)
                yield tuple(d.get(n) for n in names)


class JsonlDataSource(DataSource):
    """``spark.read.format("jsonl_manifest").schema(s).load(path)``."""

    @classmethod
    def name(cls):
        return "jsonl_manifest"

    def schema(self):
        return "event_id long, k long"

    def reader(self, schema):
        return JsonlReader(schema, self.options)


_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

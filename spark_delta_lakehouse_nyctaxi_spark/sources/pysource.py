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
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


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


def _counter_value(i: int) -> int:
    """Deterministic per-row payload: the md5_id construction mod 1000 —
    reproducible in DuckDB as ('0x'||substr(md5(i::VARCHAR),1,15))::BIGINT
    % 1000, which is what value-oracles the streaming source."""
    import hashlib

    return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 1000


class CounterStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked synthetic feed: rows (i, v) for i in [0, total),
    ``batch`` rows per micro-batch, then empty batches forever.  The
    offset dict {"pos": n} is the replay contract — readBetweenOffsets
    re-derives any batch from its offsets, so checkpoint recovery
    re-emits byte-identical rows (the source is a pure function of the
    offset range, the property a real CDC/queue reader must have)."""

    def __init__(self, options):
        self.total = int(options.get("total", 300))
        self.batch = int(options.get("batch", 100))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = int(start["pos"])
        end = min(pos + self.batch, self.total)
        return iter([(i, _counter_value(i)) for i in range(pos, end)]), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return iter(
            [(i, _counter_value(i)) for i in range(int(start["pos"]), int(end["pos"]))]
        )


class CounterStreamDataSource(DataSource):
    """``spark.readStream.format("counter_stream").load()`` — the
    STREAMING half of the Python DataSource API (Spark 4
    SimpleDataSourceStreamReader): driver-side offset planning, worker-
    side row generation, exactly-once via offset-deterministic replay."""

    @classmethod
    def name(cls):
        return "counter_stream"

    def schema(self):
        return "i long, v long"

    def simpleStreamReader(self, schema):
        return CounterStreamReader(self.options)


_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

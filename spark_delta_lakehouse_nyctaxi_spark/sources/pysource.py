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
        self.filters: list = []

    def _row_passes(self, d: dict) -> bool:
        return True  # base reader: no pushdown (see JsonlPushdownReader)

    def partitions(self):
        import os

        files = sorted(
            f
            for f in os.listdir(self.path)
            if f.endswith((".txt", ".json", ".jsonl"))
            and not f.startswith(("_", "."))  # _MANIFEST / hidden files
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
                if not self._row_passes(d):
                    continue  # pushed-down filter handled HERE
                yield tuple(d.get(n) for n in names)


class JsonlPushdownReader(JsonlReader):
    """JsonlReader + Spark 4.1 connector-side FILTER PUSHDOWN.

    A SEPARATE subclass because merely IMPLEMENTING pushFilters makes
    Spark raise unless ``spark.sql.python.filterPushdown.enabled`` is
    set — the base connector must keep working in vanilla sessions.
    Accepted comparison filters are evaluated INSIDE ``read()`` and NOT
    returned, so Spark does not re-apply them: the value oracle of
    q_pysource_pushdown therefore certifies the connector really
    filters (claiming a filter and ignoring it would leak rows and
    fail the hash)."""

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        remaining = []
        for f in filters:
            if (
                isinstance(
                    f,
                    (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan,
                     LessThanOrEqual),
                )
                and len(f.attribute) == 1
            ):
                self.filters.append(f)
            else:
                remaining.append(f)
        return remaining

    def _row_passes(self, d: dict) -> bool:
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in self.filters:
            v = d.get(f.attribute[0])
            if v is None:
                return False  # comparisons never match NULL
            if isinstance(f, EqualTo) and not v == f.value:
                return False
            if isinstance(f, GreaterThan) and not v > f.value:
                return False
            if isinstance(f, GreaterThanOrEqual) and not v >= f.value:
                return False
            if isinstance(f, LessThan) and not v < f.value:
                return False
            if isinstance(f, LessThanOrEqual) and not v <= f.value:
                return False
        return True


class JsonlDataSource(DataSource):
    """``spark.read.format("jsonl_manifest").schema(s).load(path)``."""

    @classmethod
    def name(cls):
        return "jsonl_manifest"

    def schema(self):
        return "event_id long, k long"

    def reader(self, schema):
        return JsonlReader(schema, self.options)

    def writer(self, schema, overwrite):
        return JsonlWriter(schema, self.options, overwrite)


class JsonlPushdownDataSource(JsonlDataSource):
    """Pushdown-enabled variant (requires
    spark.sql.python.filterPushdown.enabled=true)."""

    @classmethod
    def name(cls):
        return "jsonl_manifest_fp"

    def reader(self, schema):
        return JsonlPushdownReader(schema, self.options)


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


# ---------------------------------------------------------------- writer
# The WRITE side of the Spark 4 Python DataSource API (round 4):
# ``writer.write(iterator)`` runs once per input partition ON THE
# WORKERS and returns a commit message; the driver then calls
# ``commit(messages)`` exactly once (or ``abort``), giving the sink an
# atomic all-or-nothing protocol — the same two-phase shape every real
# lakehouse sink (and VersionedTable._commit) uses.

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage  # noqa: E402


class JsonlCommit(WriterCommitMessage):
    def __init__(self, file: str, count: int):
        self.file = file
        self.count = count


class JsonlWriter(DataSourceWriter):
    def __init__(self, schema, options, overwrite: bool):
        self.path = options.get("path")
        self.names = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator):
        """Executor-side: one JSONL part file per partition; the commit
        message carries (file, row count) — metadata only."""
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        fn = os.path.join(
            self.path, f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl.tmp"
        )
        n = 0
        with open(fn, "w") as fh:
            for row in iterator:
                fh.write(
                    json.dumps(
                        {k: row[k] for k in self.names}, sort_keys=True
                    )
                    + "\n"
                )
                n += 1
        return JsonlCommit(fn, n)

    def commit(self, messages):
        """Driver-side, exactly once: finalize .tmp parts (rename —
        readers never see half-written files), drop pre-existing parts
        under overwrite, and record a manifest."""
        import json
        import os

        kept = []
        for m in messages:
            final = m.file[: -len(".tmp")]
            os.replace(m.file, final)
            kept.append(os.path.basename(final))
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".jsonl") and f not in kept:
                    os.remove(os.path.join(self.path, f))
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
            json.dump(
                {"files": sorted(kept), "rows": sum(m.count for m in messages)},
                fh,
            )

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)

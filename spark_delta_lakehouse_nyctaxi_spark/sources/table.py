"""Versioned parquet tables — the Delta Lake capability surface,
Spark-native.

The reference relies on Delta Lake for storage-level operators:
MERGE upsert (utils/incremental.py:89-156), time travel
(utils/delta_ops.py:132-164), history (:107-129), restore (:167-204),
vacuum (:65-104), OPTIMIZE/compaction (:29-54). delta-spark is not
available in this environment, so this module supplies the same
semantics on plain parquet with a JSON version log:

    <path>/_vlog/00000000.json   one manifest per version; snapshot
                                 semantics (lists ALL live data units)
    <path>/data/v00000000-<id>/  parquet written by one commit

A "data unit" is the granularity of reuse between versions:
- unpartitioned commit  → the commit dir itself
- partitioned commit    → each ``key=value`` subdir individually

Partition-subdir granularity is what makes MERGE scale: an upsert
touching 3 of 10,000 daily partitions rewrites 3 subdirs and carries
the other 9,997 over by reference — the same file-skipping contract
Delta's partition-pruned MERGE provides. Appending 1 GB to a 100 TB
table writes 1 GB.

The version log is tiny driver-side JSON metadata (like Delta's
transaction log); all data movement is Spark jobs.

Concurrency follows Delta's optimistic protocol: a commit is a
put-if-absent of ``<version>.json`` (``os.link`` — atomic on POSIX,
fails EEXIST if another writer won the version). Losers refresh the
snapshot and retry: blind writes (write/restore) rebase automatically;
read-modify-write operations (merge/compact) raise
:class:`ConcurrentWriteError` because their data was derived from a
stale snapshot — the caller re-runs on the new snapshot, exactly
Delta's conflict-detection semantics.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ConcurrentWriteError(RuntimeError):
    """Another writer committed this version first. The operation's
    inputs came from a now-stale snapshot; refresh and retry."""


@dataclass
class VersionInfo:
    version: int
    timestamp: float
    operation: str
    mode: str | None
    units: list[str]  # relative paths under data/
    partition_by: list[str] = field(default_factory=list)
    extra: dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(self.__dict__)

    @staticmethod
    def from_json(s: str) -> "VersionInfo":
        d = json.loads(s)
        return VersionInfo(**d)


class VersionedTable:
    """A parquet table with Delta-style versioning.

    Usage::

        t = VersionedTable(spark, "/path/tbl")
        t.write(df, mode="overwrite", partition_by=["order_date"])
        t.write(more, mode="append")
        t.read()                     # latest snapshot
        t.read(version=0)            # time travel by version
        t.read(timestamp=ts)         # time travel by wall clock
        t.merge(src, keys=["id"])    # upsert (partition-pruned if possible)
        t.history(); t.restore(0); t.vacuum(); t.compact()
    """

    #: auto-checkpoint the version log every N commits (Delta writes a
    #: parquet checkpoint every 10 commits for the same reason: snapshot
    #: resolution must not reopen every JSON manifest ever committed)
    checkpoint_interval: int = 10

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._vlog = os.path.join(path, "_vlog")
        self._data = os.path.join(path, "data")

    # ------------------------------------------------------------- log

    @staticmethod
    def _is_version_file(fn: str) -> bool:
        # strictly NNNNNNNN.json — side metadata (_constraints.json,
        # temp files) lives in the same dir and must not parse as a
        # version manifest
        stem = fn[:-5]
        return fn.endswith(".json") and stem.isdigit()

    def exists(self) -> bool:
        if not os.path.isdir(self._vlog):
            return False
        return os.path.exists(self._last_checkpoint_path) or bool(
            [f for f in os.listdir(self._vlog) if self._is_version_file(f)]
        )

    # -------------------------------------------------- log checkpoints
    #
    # Delta-style metadata scaling: snapshot resolution must not reopen
    # every JSON manifest ever committed (at 100k commits that is 100k
    # driver-side file opens per read). A checkpoint is ONE parquet file
    # under _vlog holding every VersionInfo up to its version, plus a
    # `_last_checkpoint` pointer (same layout role as Delta's
    # `_delta_log/NNN.checkpoint.parquet` + `_last_checkpoint`).
    # `_versions()` then reads the checkpoint + only the JSON manifests
    # AFTER it. Because our manifests are tiny, the checkpoint retains
    # the FULL history, so `cleanup_log()` may delete superseded JSONs
    # without losing any time-travel target (stronger than Delta, whose
    # checkpoints hold only the live snapshot state).

    @property
    def _last_checkpoint_path(self) -> str:
        return os.path.join(self._vlog, "_last_checkpoint")

    def _read_checkpoint(self) -> tuple[int, list[VersionInfo]]:
        """Return (checkpoint version, manifests ≤ that version); (-1, [])
        when no checkpoint exists. Robust to a torn/missing file (falls
        back to the JSON log, which is still authoritative)."""
        try:
            with open(self._last_checkpoint_path) as f:
                meta = json.loads(f.read())
            import pyarrow.parquet as pq

            tbl = pq.read_table(os.path.join(self._vlog, meta["file"]))
            infos = [VersionInfo.from_json(s) for s in tbl.column("manifest").to_pylist()]
            return int(meta["version"]), infos
        except (FileNotFoundError, KeyError, ValueError, OSError):
            return -1, []

    def checkpoint(self) -> int:
        """Write a parquet checkpoint of the full version log and advance
        `_last_checkpoint`. Idempotent and concurrency-safe: content is a
        pure function of the immutable committed manifests, the file is
        put-if-absent (racing writers produce identical bytes), and the
        pointer only moves forward."""
        vs = self._versions()
        if not vs:
            return -1
        n = vs[-1].version
        fn = f"{n:08d}.checkpoint.parquet"
        fp = os.path.join(self._vlog, fn)
        if not os.path.exists(fp):
            import pyarrow as pa
            import pyarrow.parquet as pq

            tbl = pa.table(
                {
                    "version": pa.array([v.version for v in vs], pa.int64()),
                    "manifest": pa.array([v.to_json() for v in vs], pa.string()),
                }
            )
            tmp = os.path.join(self._vlog, f".{uuid.uuid4().hex}.ckpt.tmp")
            pq.write_table(tbl, tmp)
            try:
                os.link(tmp, fp)
            except FileExistsError:
                pass  # a racing writer won with identical content
            finally:
                os.unlink(tmp)
        cur, _ = self._read_checkpoint()
        if n > cur:
            tmp = os.path.join(self._vlog, f".{uuid.uuid4().hex}.lcp.tmp")
            with open(tmp, "w") as f:
                f.write(json.dumps({"version": n, "file": fn}))
            os.replace(tmp, self._last_checkpoint_path)  # atomic advance
        return n

    def cleanup_log(self) -> int:
        """Delete JSON manifests already covered by the last checkpoint
        (it retains full history, so every time-travel target survives).
        Returns the number of files removed."""
        ck_v, _ = self._read_checkpoint()
        removed = 0
        if ck_v < 0 or not os.path.isdir(self._vlog):
            return removed
        for fn in os.listdir(self._vlog):
            if self._is_version_file(fn) and int(fn[:-5]) <= ck_v:
                os.unlink(os.path.join(self._vlog, fn))
                removed += 1
        return removed

    def _versions(self) -> list[VersionInfo]:
        if not self.exists():
            return []
        ck_v, out_map = -1, {}
        if os.path.exists(self._last_checkpoint_path):
            ck_v, ck_infos = self._read_checkpoint()
            out_map = {v.version: v for v in ck_infos}
        for fn in sorted(os.listdir(self._vlog)):
            if self._is_version_file(fn):
                v = int(fn[:-5])
                if v <= ck_v and v in out_map:
                    continue  # covered by the checkpoint — skip the open
                with open(os.path.join(self._vlog, fn)) as f:
                    out_map[v] = VersionInfo.from_json(f.read())
        return [out_map[k] for k in sorted(out_map)]

    def latest_version(self) -> int:
        vs = self._versions()
        return vs[-1].version if vs else -1

    def _commit(self, info: VersionInfo) -> None:
        """Atomic put-if-absent of the version manifest: ``os.link``
        fails with EEXIST when another writer already committed this
        version — the optimistic-concurrency conflict signal (os.rename
        would silently overwrite the winner's commit)."""
        os.makedirs(self._vlog, exist_ok=True)
        tmp = os.path.join(self._vlog, f".{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            f.write(info.to_json())
        try:
            os.link(tmp, os.path.join(self._vlog, f"{info.version:08d}.json"))
        except FileExistsError:
            raise ConcurrentWriteError(
                f"version {info.version} at {self.path} was committed by a "
                "concurrent writer"
            ) from None
        finally:
            os.unlink(tmp)
        if info.version > 0 and info.version % self.checkpoint_interval == 0:
            # best-effort, like Delta's post-commit checkpoint: a failure
            # here must never fail the (already durable) commit
            try:
                self.checkpoint()
            except Exception:
                pass

    def _resolve(self, version: int | None = None, timestamp: float | None = None) -> VersionInfo:
        vs = self._versions()
        if not vs:
            raise FileNotFoundError(f"no versions at {self.path}")
        if version is not None:
            for v in vs:
                if v.version == version:
                    return v
            raise ValueError(f"version {version} not found (latest {vs[-1].version})")
        if timestamp is not None:
            eligible = [v for v in vs if v.timestamp <= timestamp]
            if not eligible:
                raise ValueError(f"no version at or before timestamp {timestamp}")
            return eligible[-1]
        return vs[-1]

    # ------------------------------------------------------ constraints

    @property
    def _constraints_path(self) -> str:
        return os.path.join(self._vlog, "_constraints.json")

    def constraints(self) -> dict[str, str]:
        """Current CHECK constraints (Delta ``ALTER TABLE ... ADD
        CONSTRAINT`` analog). Table-level, enforced on every write path
        from the moment they are added (constraint history is not
        time-traveled — matching the practical Delta behavior where the
        latest metadata governs writes)."""
        if not os.path.exists(self._constraints_path):
            return {}
        with open(self._constraints_path) as f:
            return json.load(f)

    def add_constraint(self, name: str, expr: str) -> None:
        """Register a CHECK constraint after validating the EXISTING
        data satisfies it (Delta semantics: adding a constraint scans
        the table once and fails if any current row violates). A row
        violates when the expression evaluates to FALSE; NULL passes
        (SQL CHECK semantics).

        Refused while a metadata-only rename is pending: append-time
        enforcement (:meth:`_check_constraints`) evaluates expressions
        on the PHYSICAL-named frame — which is correct for constraints
        registered when logical == physical (physical names are stable
        data identities across later renames), but an expression
        validated here against the LOGICAL view would bind to a
        different (or missing) column at append time."""
        if self.exists():
            self._require_no_column_map("add_constraint")
            bad = self.read().filter(F.expr(f"({expr}) IS FALSE")).count()
            if bad:
                raise ValueError(
                    f"cannot add constraint {name!r}: {bad} existing rows "
                    f"violate ({expr})"
                )
        cons = self.constraints()
        cons[name] = expr
        os.makedirs(self._vlog, exist_ok=True)
        tmp = self._constraints_path + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(cons, f)
        os.replace(tmp, self._constraints_path)

    def drop_constraint(self, name: str) -> None:
        cons = self.constraints()
        cons.pop(name, None)
        tmp = self._constraints_path + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(cons, f)
        os.replace(tmp, self._constraints_path)

    def drop_generated_column(self, name: str) -> None:
        """Unregister a generated column (the data column stays; only
        the ALWAYS-AS enforcement is dropped) — the drop-and-re-add
        path the rename guards point at."""
        gen = self.generated_columns()
        gen.pop(name, None)
        tmp = self._generated_path + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(gen, f)
        os.replace(tmp, self._generated_path)

    # -------------------------------------------------- column defaults

    @property
    def _defaults_path(self) -> str:
        return os.path.join(self._vlog, "_defaults.json")

    def column_defaults(self) -> dict[str, str]:
        """Registered column DEFAULTs (Delta ``ALTER TABLE ... SET
        DEFAULT`` analog): column name → SQL expression evaluated for
        rows of any WRITE that omits the column. Unlike generated
        columns, a writer MAY supply explicit values (DEFAULT fills
        gaps, ALWAYS-AS enforces); unlike Delta, defaults here apply
        only to writes after registration — existing rows are
        untouched and read back as stored."""
        if not os.path.exists(self._defaults_path):
            return {}
        with open(self._defaults_path) as f:
            return json.load(f)

    def add_column_default(self, name: str, expr: str) -> None:
        """Register ``name DEFAULT expr``. The expression may reference
        other columns of the incoming row (a superset of Delta, whose
        defaults must be literal/constant-foldable). Validated by
        analysis against the current schema; refused while a rename
        mapping is pending (write-path evaluation binds physical
        names, same argument as add_constraint)."""
        if self.exists():
            self._require_no_column_map("add_column_default")
            probe = self.read()
            if name not in probe.columns:
                raise ValueError(
                    f"column {name!r} does not exist; defaults attach to "
                    "existing columns (add the column via a merge_schema "
                    "append first)"
                )
            try:
                probe.select(F.expr(expr)).schema
            except Exception:
                raise ValueError(
                    f"default expression ({expr}) does not analyze "
                    "against the table schema"
                ) from None
        dfl = self.column_defaults()
        dfl[name] = expr
        os.makedirs(self._vlog, exist_ok=True)
        tmp = self._defaults_path + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(dfl, f)
        os.replace(tmp, self._defaults_path)

    def drop_column_default(self, name: str) -> None:
        dfl = self.column_defaults()
        dfl.pop(name, None)
        tmp = self._defaults_path + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(dfl, f)
        os.replace(tmp, self._defaults_path)

    def _apply_defaults(self, df: DataFrame) -> DataFrame:
        """Fill MISSING default columns on an incoming frame (cheap
        projection; explicit values pass through untouched)."""
        for name, expr in self.column_defaults().items():
            if name not in df.columns:
                df = df.withColumn(name, F.expr(expr))
        return df

    # ------------------------------------------------ identity columns

    @property
    def _identity_path(self) -> str:
        return os.path.join(self._vlog, "_identity.json")

    def identity_columns(self) -> dict[str, dict]:
        """Registered identity columns (Delta ``GENERATED ALWAYS AS
        IDENTITY`` analog): name → {start, step, watermark}. The
        watermark is the next value to allocate; like Delta, failed
        commits may leave gaps (ranges are reserved before the write),
        and the watermark file is not OCC-protected."""
        if not os.path.exists(self._identity_path):
            return {}
        with open(self._identity_path) as f:
            return json.load(f)

    def add_identity_column(
        self, name: str, start: int = 1, step: int = 1
    ) -> None:
        """Register ``name`` as GENERATED ALWAYS AS IDENTITY
        (START WITH ``start`` INCREMENT BY ``step``).

        Delta parity: identity columns can only be defined at table
        creation (``ALTER TABLE`` cannot add one), so this refuses on
        a table that already has data. Every write path that omits the
        column gets values assigned via the scale-safe
        ``global_row_number`` pattern (range exchange + offset cumsum
        — never a single-partition window); supplying explicit values
        is rejected (ALWAYS semantics). Unlike Delta's arbitrary
        allocation, assignment order is the lexicographic order of the
        incoming batch's other columns — deterministic, hence
        value-oracle-able."""
        if step == 0:
            raise ValueError("identity step must be non-zero")
        if self.exists():
            raise ValueError(
                "identity columns can only be defined before the first "
                "write (Delta parity: ALTER TABLE cannot add IDENTITY)"
            )
        ids = self.identity_columns()
        ids[name] = {"start": int(start), "step": int(step), "watermark": int(start)}
        os.makedirs(self._vlog, exist_ok=True)
        tmp = self._identity_path + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(ids, f)
        os.replace(tmp, self._identity_path)

    def _reserve_identity_range(self, name: str, n: int) -> int:
        """Advance the watermark by ``n`` steps and return the range
        start (reserved BEFORE the data lands — failed commits leave
        gaps, exactly like Delta identity)."""
        ids = self.identity_columns()
        spec = ids[name]
        first = spec["watermark"]
        spec["watermark"] = first + spec["step"] * n
        tmp = self._identity_path + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(ids, f)
        os.replace(tmp, self._identity_path)
        return first

    def _assign_identity(
        self, df: DataFrame, name: str, spec: dict, only_null: bool = False
    ) -> DataFrame:
        """Assign identity values to ``df`` (or, with ``only_null``, to
        its NULL-``name`` rows — the MERGE insert arm). Distributed:
        one range exchange over the incoming BATCH (not the table) via
        global_row_number; the per-partition counts it collects are the
        only driver metadata."""
        from ..operators.indexing import global_row_number

        step = spec["step"]
        order_cols = [c for c in df.columns if c != name]
        if only_null:
            todo = df.filter(F.col(name).isNull()).drop(name)
            keep = df.filter(F.col(name).isNotNull())
        else:
            todo, keep = df, None
        n = todo.count()
        if n == 0:
            return df
        first = self._reserve_identity_range(name, n)
        assigned = (
            global_row_number(todo, order_cols, out_col="__ident_idx")
            .withColumn(
                name,
                (F.lit(first) + (F.col("__ident_idx") - 1) * F.lit(step)).cast(
                    "long"
                ),
            )
            .drop("__ident_idx")
        )
        if keep is None:
            return assigned
        return keep.unionByName(assigned)

    # ------------------------------------------------- generated cols

    @property
    def _generated_path(self) -> str:
        return os.path.join(self._vlog, "_generated.json")

    def generated_columns(self) -> dict[str, str]:
        """Registered generated columns (Delta ``GENERATED ALWAYS AS``
        analog): column name → SQL expression over the other columns."""
        if not os.path.exists(self._generated_path):
            return {}
        with open(self._generated_path) as f:
            return json.load(f)

    def add_generated_column(self, name: str, expr: str) -> None:
        """Register ``name`` as GENERATED ALWAYS AS ``expr``.

        Enforcement (Delta semantics) on every checked write path:
        a frame MISSING the column gets it computed (write/append); a
        frame CARRYING the column must match the expression exactly
        (null-safe equality) or the commit is rejected — so an UPDATE
        or MERGE can never silently break the invariant.  Registering
        over EXISTING data requires the column to already be present
        and consistent (validated here); backfill by rewriting first
        if it is absent.

        Refused while a metadata-only rename is pending, for the same
        reason as :meth:`add_constraint`: write-path enforcement runs
        on physical names, so an expression validated against the
        logical view would mis-bind after :meth:`_to_physical`."""
        if self.exists():
            self._require_no_column_map("add_generated_column")
            cols = self.read().columns
            if name not in cols:
                raise ValueError(
                    f"column {name!r} does not exist; backfill it (e.g. "
                    "rewrite with the expression) before registering"
                )
            bad = (
                self.read()
                .filter(F.expr(f"NOT ({name} <=> ({expr}))"))
                .count()
            )
            if bad:
                raise ValueError(
                    f"cannot register generated column {name!r}: {bad} "
                    f"existing rows do not match ({expr})"
                )
        gen = self.generated_columns()
        gen[name] = expr
        os.makedirs(self._vlog, exist_ok=True)
        tmp = self._generated_path + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(gen, f)
        os.replace(tmp, self._generated_path)

    def _apply_generated(self, df: DataFrame) -> DataFrame:
        """Compute any MISSING generated columns on an incoming frame
        (present ones are validated by :meth:`_check_constraints`)."""
        for name, expr in self.generated_columns().items():
            if name not in df.columns:
                df = df.withColumn(name, F.expr(expr))
        return df

    def _check_constraints(self, df: DataFrame, what: str) -> None:
        """Validate incoming rows against every CHECK constraint in ONE
        pass (all violation counts in a single aggregate, the DQ
        framework's fused-check discipline) BEFORE any data lands — a
        rejected commit leaves no new version and no orphan units that
        vacuum would have to collect.  Generated-column equations ride
        in the same fused aggregate as implicit constraints, so UPDATE
        and MERGE cannot break them either."""
        cons = dict(self.constraints())
        for name, expr in self.generated_columns().items():
            if name in df.columns:
                cons[f"__generated_{name}"] = f"{name} <=> ({expr})"
        if not cons:
            return
        names = list(cons)
        counts = df.agg(
            *[
                F.sum(F.expr(f"({cons[n]}) IS FALSE").cast("long")).alias(n)
                for n in names
            ]
        ).first()
        bad = {n: counts[n] for n in names if counts[n]}
        if bad:
            detail = ", ".join(
                f"{n} ({cons[n]!r}): {c} rows" for n, c in bad.items()
            )
            raise ValueError(f"CHECK constraint violation on {what}: {detail}")

    # ----------------------------------------------------------- write

    def _write_units(self, df: DataFrame, partition_by: list[str] | None) -> list[str]:
        """Write one commit dir; return its data units (partition
        subdirs when partitioned, else the commit dir)."""
        v = self.latest_version() + 1
        rel = f"v{v:08d}-{uuid.uuid4().hex[:8]}"
        target = os.path.join(self._data, rel)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)
        if not partition_by:
            return [rel]
        units = []
        for sub in sorted(os.listdir(target)):
            p = os.path.join(target, sub)
            if os.path.isdir(p) and "=" in sub:
                units.append(self._subunits(rel, sub, depth=len(partition_by) - 1))
        return [u for group in units for u in group]

    def _subunits(self, rel: str, sub: str, depth: int) -> list[str]:
        if depth == 0:
            return [f"{rel}/{sub}"]
        out = []
        for nxt in sorted(os.listdir(os.path.join(self._data, rel, sub))):
            if "=" in nxt:
                out.extend(self._subunits(f"{rel}/{sub}", nxt, depth - 1))
        return out

    @staticmethod
    def _jsonable(v):
        """Stats values must round-trip through the JSON manifest AND
        compare consistently with user-supplied predicate bounds:
        numbers stay numbers; date/timestamp/decimal become strings
        (ISO date/timestamp strings compare lexicographically in value
        order, so the pruning comparison stays correct)."""
        import datetime
        import decimal

        if v is None or isinstance(v, (int, float, str, bool)):
            return v
        if isinstance(v, (datetime.date, datetime.datetime)):
            return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
        if isinstance(v, decimal.Decimal):
            return float(v)
        return str(v)

    def _collect_stats(
        self, new_units: list[str], stats_cols: list[str], partitioned: bool
    ) -> dict:
        """Per-unit min/max/null-count for ``stats_cols`` — the
        VersionedTable analog of Delta's per-file stats in the
        transaction log. ONE Spark job for the whole commit: group by
        the file's directory (a unit holds its part-files directly, so
        leaf dir == unit), aggregate min/max/nulls per column; the
        result is metadata-sized (one row per unit). Directory strings
        are matched back to unit paths on the driver via the same
        unquote(urlparse(...)) decoding the DELETE path uses — never by
        re-encoding partition values."""
        from urllib.parse import unquote, urlparse

        if not new_units:
            return {}
        roots = sorted({u.split("/", 1)[0] for u in new_units})
        rows = []
        for root in roots:
            base = os.path.join(self._data, root)
            reader = self.spark.read
            if partitioned:
                reader = reader.option("basePath", base)
            df = reader.parquet(base)
            have = [c for c in stats_cols if c in df.columns]
            if not have:
                continue
            rows += (
                df.groupBy(
                    F.regexp_replace(F.input_file_name(), "/[^/]*$", "").alias("_dir")
                )
                .agg(*[a for c in have for a in (
                    F.min(c).alias(f"min__{c}"),
                    F.max(c).alias(f"max__{c}"),
                    F.sum(F.col(c).isNull().cast("long")).alias(f"nulls__{c}"),
                )])
                .collect()
            )
        by_dir = {unquote(urlparse(r["_dir"]).path): r for r in rows}
        stats = {}
        for u in new_units:
            abs_u = os.path.abspath(os.path.join(self._data, u))
            r = by_dir.get(abs_u)
            if r is None:
                continue
            stats[u] = {
                c: {
                    "min": self._jsonable(r[f"min__{c}"]),
                    "max": self._jsonable(r[f"max__{c}"]),
                    "nulls": r[f"nulls__{c}"],
                }
                for c in stats_cols
                if f"min__{c}" in r.asDict()
            }
        return stats

    # Bloom filter parameters: m bits / k hashes sized for ~500 distinct
    # values per unit at ~1% false-positive rate; a false positive only
    # costs reading a unit that range stats alone would have read anyway.
    _BLOOM_M, _BLOOM_K = 4096, 5

    def _collect_blooms(
        self, new_units: list[str], bloom_cols: list[str], partitioned: bool
    ) -> dict:
        """Per-unit bloom filters for equality skipping (the Delta/
        Parquet bloom-filter-index analog, kept in the manifest like
        stats). ONE Spark job per column: every non-null value hashes to
        k = 5 positions in an m = 4096-bit set via JVM xxhash64 (seeded
        0..k-1 — engine-stable), positions deduplicate distributed, and
        only the ≤ m distinct positions per unit reach the driver, which
        packs them into a hex-encoded bitset."""
        from urllib.parse import unquote, urlparse

        if not new_units:
            return {}
        m, k = self._BLOOM_M, self._BLOOM_K
        roots = sorted({u.split("/", 1)[0] for u in new_units})
        by_dir_col: dict[tuple[str, str], set[int]] = {}
        for root in roots:
            base = os.path.join(self._data, root)
            reader = self.spark.read
            if partitioned:
                reader = reader.option("basePath", base)
            df = reader.parquet(base)
            for c in bloom_cols:
                if c not in df.columns:
                    continue
                # hash the CANONICAL STRING form: xxhash64 is type-
                # sensitive and the probe side builds values from
                # literals whose Spark type (int) can differ from the
                # column's (bigint) — strings make build and probe agree
                # for every primitive type
                pos = F.array(
                    *[
                        F.pmod(
                            F.xxhash64(F.col(c).cast("string"), F.lit(i)),
                            F.lit(m),
                        ).cast("int")
                        for i in range(k)
                    ]
                )
                rows = (
                    df.filter(F.col(c).isNotNull())
                    .select(
                        F.regexp_replace(
                            F.input_file_name(), "/[^/]*$", ""
                        ).alias("_dir"),
                        F.explode(pos).alias("p"),
                    )
                    .distinct()
                    .groupBy("_dir")
                    .agg(F.collect_set("p").alias("ps"))
                    .collect()
                )
                for r in rows:
                    d = unquote(urlparse(r["_dir"]).path)
                    by_dir_col.setdefault((d, c), set()).update(r["ps"])
        blooms: dict = {}
        for u in new_units:
            abs_u = os.path.abspath(os.path.join(self._data, u))
            for c in bloom_cols:
                bits = by_dir_col.get((abs_u, c))
                if bits is None:
                    continue
                arr = bytearray(m // 8)
                for p in bits:
                    arr[p >> 3] |= 1 << (p & 7)
                blooms.setdefault(u, {})[c] = bytes(arr).hex()
        return blooms

    def _bloom_probe_positions(
        self, eq: dict, schema=None
    ) -> dict[str, list[int]]:
        """k hash positions per probed value — ONE tiny Spark job (the
        probe must use the same JVM xxhash64 the build used).

        The build side hashes the COLUMN value's string form, so the
        probe literal must render identically: a Python ``7`` probed
        against a double column would hash ``'7'`` vs the build's
        ``'7.0'`` and mark every unit value-free. When ``schema`` (the
        stored StructType) is given, the literal is first cast to the
        column's data type so both sides stringify the same value."""
        m, k = self._BLOOM_M, self._BLOOM_K
        types = {f.name: f.dataType for f in schema.fields} if schema else {}
        exprs = []
        cols = list(eq)
        for i, c in enumerate(cols):
            lit = F.lit(eq[c])
            if c in types:
                lit = lit.cast(types[c])
            exprs.append(
                F.array(
                    *[
                        F.pmod(
                            F.xxhash64(lit.cast("string"), F.lit(j)),
                            F.lit(m),
                        ).cast("int")
                        for j in range(k)
                    ]
                ).alias(f"p{i}")
            )
        row = self.spark.range(1).select(*exprs).first()
        return {c: list(row[f"p{i}"]) for i, c in enumerate(cols)}

    def write(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        operation: str = "WRITE",
        extra: dict | None = None,
        merge_schema: bool = False,
        stats_cols: list[str] | None = None,
        bloom_cols: list[str] | None = None,
        _identity_supplied_ok: bool = False,
    ) -> VersionInfo:
        """Reference parity: write_*_delta (etl/bronze_job.py:60-91) —
        modes overwrite/append, optional partitionBy.

        Schema evolution follows Delta semantics: an append whose
        column set differs from the table's is rejected unless
        ``merge_schema=True`` (Delta's ``mergeSchema`` option), in
        which case added columns read back as nulls on old rows and
        dropped columns as nulls on new ones (the storage layer
        reconciles by name at read time). Overwrite always replaces
        the schema (the reference sets overwriteSchema=true
        unconditionally, etl/bronze_job.py:78)."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"unsupported mode {mode!r}")
        # compute missing default + generated columns BEFORE the append
        # schema comparison (an appender may legitimately omit them)
        df = self._apply_defaults(df)
        df = self._apply_generated(df)
        for name, spec in self.identity_columns().items():
            if name in df.columns:
                if not _identity_supplied_ok:
                    raise ValueError(
                        f"column {name!r} is GENERATED ALWAYS AS IDENTITY "
                        "and cannot be supplied; omit it and values are "
                        "assigned automatically"
                    )
            else:
                df = self._assign_identity(df, name, spec)
        prev = self._versions()
        if mode == "append" and prev:
            partition_by = partition_by or prev[-1].partition_by
            existing = set(self.read().columns)
            if set(df.columns) != existing and not merge_schema:
                added = sorted(set(df.columns) - existing)
                missing = sorted(existing - set(df.columns))
                raise ValueError(
                    f"append schema mismatch (added={added}, missing="
                    f"{missing}); pass merge_schema=True to evolve"
                )
            # appended frames arrive under LOGICAL names; files store
            # physical ones so all units stay name-uniform
            df = self._to_physical(df, prev[-1])
            if stats_cols:
                inv = {l: p for p, l in self._column_map_of(prev[-1]).items()}
                stats_cols = [inv.get(c, c) for c in stats_cols]
        self._check_constraints(df, f"write({mode})")
        new_units = self._write_units(df, partition_by)
        new_stats = (
            self._collect_stats(new_units, stats_cols, bool(partition_by))
            if stats_cols
            else {}
        )
        if mode == "append" and prev and bloom_cols is None:
            # appends inherit the table's bloom columns (like stats,
            # skipping metadata must not silently stop at a commit)
            prev_blooms = prev[-1].extra.get("blooms", {})
            inherited = sorted({c for b in prev_blooms.values() for c in b})
            bloom_cols = inherited or None
        new_blooms = (
            self._collect_blooms(new_units, bloom_cols, bool(partition_by))
            if bloom_cols
            else {}
        )
        # Optimistic commit: the data units above are immutable and
        # uuid-named, so on a version conflict only the manifest needs
        # rebuilding against the refreshed snapshot (blind writes
        # rebase; appends pick up the winner's units).
        for attempt in range(10):
            units = new_units
            stats = new_stats
            blooms = new_blooms
            if mode == "append" and prev:
                units = prev[-1].units + new_units
                # Carry the carried units' stats: skipping metadata is
                # per-unit and units are immutable, so prior stats stay
                # valid verbatim. Units with no stats simply never skip.
                stats = {**prev[-1].extra.get("stats", {}), **new_stats}
                blooms = {**prev[-1].extra.get("blooms", {}), **new_blooms}
            xtra = dict(extra or {})
            if mode == "append" and prev and prev[-1].extra.get("mor_deletes"):
                # pending merge-on-read tombstones stay scoped to the
                # pre-append units; the appended rows are never filtered
                xtra["mor_deletes"] = prev[-1].extra["mor_deletes"]
            if mode == "append" and prev and prev[-1].extra.get("column_map"):
                # a pending metadata-only rename survives appends
                xtra["column_map"] = prev[-1].extra["column_map"]
            if stats:
                xtra["stats"] = stats
            if blooms:
                xtra["blooms"] = blooms
            info = VersionInfo(
                version=(prev[-1].version + 1 if prev else 0),
                timestamp=time.time(),
                operation=operation,
                mode=mode,
                units=units,
                partition_by=list(partition_by or []),
                extra=xtra,
            )
            try:
                self._commit(info)
                return info
            except ConcurrentWriteError:
                if attempt == 9:
                    raise
                prev = self._versions()

    # ------------------------------------------------------------ read

    def _read_units(self, units: list[str], partitioned: bool) -> DataFrame:
        if not partitioned:
            dfs = [self.spark.read.parquet(os.path.join(self._data, u)) for u in units]
        else:
            # Group units by commit root so basePath restores the
            # partition columns encoded in key=value paths.
            by_root: dict[str, list[str]] = {}
            for u in units:
                root = u.split("/", 1)[0]
                by_root.setdefault(root, []).append(u)
            dfs = [
                self.spark.read.option("basePath", os.path.join(self._data, root)).parquet(
                    *[os.path.join(self._data, u) for u in us]
                )
                for root, us in by_root.items()
            ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    def _read_with_deletes(self, info: VersionInfo, units: list[str]) -> DataFrame:
        """Read ``units`` applying any pending merge-on-read delete
        predicates. Each tombstone is SCOPED to the units that existed
        when the DELETE committed, so rows appended later are never
        filtered even if they match an old predicate. Units sharing the
        same tombstone chain read as one group (filters compose as
        ``NOT coalesce(pred, false)`` — NULL-evaluating rows survive,
        Delta DELETE semantics); groups union back together."""
        mor = info.extra.get("mor_deletes", [])
        partitioned = bool(info.partition_by)
        if not mor:
            return self._read_units(units, partitioned)
        groups: dict[tuple[int, ...], list[str]] = {}
        for u in units:
            key = tuple(i for i, d in enumerate(mor) if u in d["units"])
            groups.setdefault(key, []).append(u)
        parts = []
        for key, us in groups.items():
            df = self._read_units(us, partitioned)
            for i in key:
                df = df.filter(F.expr(f"NOT coalesce(({mor[i]['pred']}), false)"))
            parts.append(df)
        out = parts[0]
        for d in parts[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    # ----------------------------------------------- column mapping

    @staticmethod
    def _column_map_of(info: VersionInfo) -> dict[str, str]:
        """physical → logical name map (Delta column-mapping analog).
        Empty when no metadata-only rename is pending."""
        return dict(info.extra.get("column_map", {}))

    def _apply_column_map(self, df: DataFrame, info: VersionInfo) -> DataFrame:
        """Present a physically-named frame under its logical names."""
        m = self._column_map_of(info)
        if not m:
            return df
        return df.select(*[F.col(c).alias(m.get(c, c)) for c in df.columns])

    def _to_physical(self, df: DataFrame, info: VersionInfo) -> DataFrame:
        """Map a logically-named frame back to physical storage names
        (what the parquet files carry) before writing."""
        m = self._column_map_of(info)
        if not m:
            return df
        inv = {l: p for p, l in m.items()}
        out = [inv.get(c, c) for c in df.columns]
        if len(set(out)) != len(out):
            # e.g. physical v is mapped to logical "value" and a
            # merge-schema append introduces a NEW column literally
            # named "v" — storing both would collide in the files
            dup = sorted({c for c in out if out.count(c) > 1})
            raise ValueError(
                f"append column(s) {dup} collide with the physical "
                "name(s) of renamed column(s); materialize_rename() "
                "first or pick different names"
            )
        return df.select(*[F.col(c).alias(inv.get(c, c)) for c in df.columns])

    def _require_no_column_map(self, op: str) -> VersionInfo:
        info = self._resolve()
        if self._column_map_of(info):
            raise ValueError(
                f"{op} is not supported while a metadata-only column "
                "rename is pending (predicate strings would need "
                "physical-name translation); call materialize_rename() "
                "first — it rewrites the data files under the logical "
                "names and clears the mapping"
            )
        return info

    def rename_column(self, old: str, new: str) -> VersionInfo:
        """Metadata-only column rename (Delta column-mapping analog):
        commits a new version whose manifest maps the column's PHYSICAL
        name (what every immutable parquet unit carries) to the new
        LOGICAL name — zero data IO, O(manifest) cost.  At 100 TB this
        is the difference between an instant schema change and a
        petabyte rewrite.

        Reads (``read``/``scan``/``changes``) present logical names;
        appends accept logical names and store physical ones, so the
        files stay uniform.  Restrictions (each raises):
        - partition columns (their physical names are baked into
          key=value directory paths);
        - while merge-on-read tombstones are pending (their predicate
          strings reference storage names — OPTIMIZE first);
        - DML (delete/update/merge) while a mapping is pending — run
          :meth:`materialize_rename` to rewrite under logical names.
        """
        import re

        for name in (old, new):
            if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
                raise ValueError(f"not a simple identifier: {name!r}")
        for attempt in range(10):
            vs = self._versions()
            if not vs:
                raise ValueError("cannot rename a column of an empty table")
            info = vs[-1]
            if info.extra.get("mor_deletes"):
                raise ValueError(
                    "pending merge-on-read tombstones reference storage "
                    "names; compact() before renaming"
                )
            m = self._column_map_of(info)
            physical = self._read_units(info.units, bool(info.partition_by)).columns
            logical = [m.get(c, c) for c in physical]
            if old not in logical:
                raise ValueError(f"no such column: {old!r} (have {logical})")
            if new in logical:
                raise ValueError(f"column already exists: {new!r}")
            part_logical = {m.get(p, p) for p in info.partition_by}
            if old in part_logical:
                raise ValueError(
                    f"{old!r} is a partition column — its physical name "
                    "is baked into the directory layout; rewrite instead"
                )
            # A generated column (or an expression input of one) being
            # renamed breaks the append path immediately: appends that
            # omit the generated column compute F.expr(expr) on the
            # LOGICAL frame, where the old name no longer resolves (and
            # a renamed generated column would be re-computed under its
            # old name alongside the new one). Guided error instead of
            # the opaque AnalysisException (round-3 advisor item).
            gen = self.generated_columns()
            if old in gen:
                raise ValueError(
                    f"{old!r} is a generated column; drop_generated_column "
                    "and re-register it under the new name after renaming"
                )
            if old in self.identity_columns():
                raise ValueError(
                    f"{old!r} is a GENERATED ALWAYS AS IDENTITY column; "
                    "its allocation metadata is keyed by name — renaming "
                    "it is not supported"
                )
            renamed_probe = self.read().withColumnRenamed(old, new)
            for gname, gexpr in gen.items():
                try:
                    renamed_probe.select(F.expr(gexpr)).schema
                except Exception:
                    raise ValueError(
                        f"generated column {gname!r} ({gexpr}) references "
                        f"{old!r}; drop_generated_column and re-add it "
                        "under the new name before renaming"
                    ) from None
            phys = physical[logical.index(old)]
            m.pop(phys, None)
            if new != phys:
                m[phys] = new
            xtra = {k: v for k, v in info.extra.items() if k != "column_map"}
            if m:
                xtra["column_map"] = m
            vinfo = VersionInfo(
                version=info.version + 1,
                timestamp=time.time(),
                operation="RENAME COLUMN",
                mode=None,
                units=list(info.units),
                partition_by=list(info.partition_by),
                extra=xtra,
            )
            try:
                self._commit(vinfo)
                return vinfo
            except ConcurrentWriteError:
                if attempt == 9:
                    raise

    def materialize_rename(self) -> VersionInfo:
        """Rewrite the snapshot with logical column names and clear the
        mapping — the explicit rewrite that re-enables DML after
        :meth:`rename_column`.  Validates that every CHECK constraint
        still analyzes against the new names (constraints bind to the
        names they were written with; a constraint referencing the old
        name must be dropped and re-added)."""
        info = self._resolve()
        m = self._column_map_of(info)
        if not m:
            return info
        df = self.read()  # logical names
        for name, expr in self.constraints().items():
            try:
                # select, not filter: Spark 4's hidden-output resolution
                # lets a FILTER see the pre-rename child columns through
                # the projection, which would mask the stale reference;
                # .schema forces analysis
                df.select(F.expr(expr)).schema
            except Exception:
                raise ValueError(
                    f"constraint {name!r} ({expr}) references a renamed "
                    "column; drop_constraint and re-add it under the new "
                    "name before materializing"
                ) from None
        # Generated columns get the same guided validation (round-3
        # advisor item): after materialization the logical names are the
        # storage names, so an expression referencing a pre-rename name
        # would fail opaquely inside _apply_generated on the next append.
        for name, expr in self.generated_columns().items():
            try:
                df.select(F.expr(expr)).schema
            except Exception:
                raise ValueError(
                    f"generated column {name!r} ({expr}) references a "
                    "renamed column; drop_generated_column and re-add it "
                    "under the new name before materializing"
                ) from None
        stats_cols = None
        if info.extra.get("stats"):
            stats_cols = sorted(
                {m.get(c, c) for s in info.extra["stats"].values() for c in s}
            )
        part_logical = [m.get(p, p) for p in info.partition_by]
        return self.write(
            df,
            mode="overwrite",
            partition_by=part_logical or None,
            operation="MATERIALIZE RENAME",
            stats_cols=stats_cols,
            _identity_supplied_ok=True,  # internal rewrite keeps ids
        )

    def read(self, version: int | None = None, timestamp: float | None = None) -> DataFrame:
        """Latest or time-travel scan (utils/delta_ops.py:132-164).
        Applies pending merge-on-read delete tombstones (see
        :meth:`delete` with ``mode="merge-on-read"``) and presents
        logical column names when a rename mapping is pending."""
        info = self._resolve(version, timestamp)
        return self._apply_column_map(self._read_with_deletes(info, info.units), info)

    def _prune_units(
        self, info: VersionInfo, pred: dict[str, tuple]
    ) -> tuple[list[str], list[str]]:
        """Split units into (kept, skipped) for a conjunction of range
        predicates ``{col: (lo, hi)}`` (inclusive; None = open end).
        A unit is skipped only when its manifest stats PROVE no row can
        match: its [min, max] is disjoint from [lo, hi], or the column
        is all-null there (range predicates never match NULL). Units
        without stats — pre-stats commits, rewrite paths, schema-merge
        gaps — are always kept: skipping is an optimization, never a
        correctness dependency."""
        stats = info.extra.get("stats", {})
        kept, skipped = [], []
        for u in info.units:
            s = stats.get(u, {})
            keep = True
            for col, (lo, hi) in pred.items():
                cs = s.get(col)
                if not cs:
                    continue
                if cs["min"] is None:  # every row NULL in this unit
                    keep = False
                    break
                lo_n, hi_n = self._jsonable(lo), self._jsonable(hi)
                if lo_n is not None and cs["max"] < lo_n:
                    keep = False
                    break
                if hi_n is not None and cs["min"] > hi_n:
                    keep = False
                    break
            (kept if keep else skipped).append(u)
        return kept, skipped

    def scan(
        self,
        pred: dict[str, tuple] | None = None,
        version: int | None = None,
        timestamp: float | None = None,
        eq: dict | None = None,
    ) -> DataFrame:
        """Stats-skipping scan — the Delta data-skipping analog: range
        predicates are checked against the per-unit min/max collected at
        write time (``write(stats_cols=...)``), units provably disjoint
        from the predicate never reach the reader's file listing, and
        the same predicates are re-applied as row filters on the
        surviving units (stats prune at unit granularity; parquet
        row-group stats and the row filter finish the job). At 100 TB a
        clustered ingest (time-ordered appends, range/Z-order layout)
        makes this the difference between scanning one unit and
        scanning the table. ``self.last_scan`` records kept/skipped
        counts for observability.

        ``eq`` adds EQUALITY predicates ``{col: value}`` pruned through
        per-unit bloom filters (``write(bloom_cols=...)``) — the
        point-lookup complement of range stats: a unit is skipped when
        any of the value's k bit positions is absent from its bitset
        (provably value-free; false positives only cost a read), plus
        the min/max check when range stats also cover the column. Both
        predicate kinds re-apply as row filters."""
        pred = dict(pred or {})
        eq = dict(eq or {})
        info = self._resolve(version, timestamp)
        # predicates arrive under logical names; stats are keyed by the
        # physical names the units carry
        inv = {l: p for p, l in self._column_map_of(info).items()}
        pred = {inv.get(c, c): b for c, b in pred.items()}
        eq = {inv.get(c, c): v for c, v in eq.items()}
        # equality bounds participate in range pruning too
        range_pred = dict(pred)
        for c, v in eq.items():
            range_pred.setdefault(c, (v, v))
        kept, skipped = self._prune_units(info, range_pred)
        if eq and kept:
            # one-footer schema read so probe literals cast to the
            # stored column types before stringifying (ADVICE r4: an
            # int probe vs a double column rendered '7' vs '7.0' and
            # silently skipped every matching unit)
            stored = self._read_units(kept[:1], bool(info.partition_by)).schema
            probes = self._bloom_probe_positions(eq, schema=stored)
            blooms = info.extra.get("blooms", {})
            survivors = []
            for u in kept:
                ub = blooms.get(u, {})
                drop = False
                for c, positions in probes.items():
                    hx = ub.get(c)
                    if hx is None:
                        continue  # no bloom for this unit/col: keep
                    bits = bytes.fromhex(hx)
                    if any(
                        not (bits[p >> 3] >> (p & 7)) & 1 for p in positions
                    ):
                        drop = True
                        break
                (skipped if drop else survivors).append(u)
            kept = survivors
        self.last_scan = {"kept": len(kept), "skipped": len(skipped)}
        if kept:
            df = self._read_with_deletes(info, kept)
        else:
            # schema-correct empty frame; the lazy full-snapshot read
            # plans partition discovery only, and the FALSE filter means
            # no data IO ever runs
            df = self._read_units(info.units, bool(info.partition_by)).filter(F.lit(False))
        for col, (lo, hi) in pred.items():
            if lo is not None:
                df = df.filter(F.col(col) >= F.lit(lo))
            if hi is not None:
                df = df.filter(F.col(col) <= F.lit(hi))
        for col, v in eq.items():
            df = df.filter(F.col(col) == F.lit(v))
        return self._apply_column_map(df, info)

    def _conform_types(self, df: DataFrame) -> DataFrame:
        """Cast NullType columns to their type in the full snapshot.

        A pruned read whose only visible partition directory is
        ``__HIVE_DEFAULT_PARTITION__`` infers the partition column as
        VOID (there is no value in any path to infer from), which can
        be neither rewritten partitioned nor merged. The full snapshot
        read is lazy — only partition discovery runs, no data IO."""
        from pyspark.sql.types import NullType

        if not any(isinstance(f.dataType, NullType) for f in df.schema.fields):
            return df
        ref = {f.name: f.dataType for f in self.read().schema.fields}
        return df.select(
            *[
                F.col(f.name).cast(ref[f.name]).alias(f.name)
                if isinstance(f.dataType, NullType) and f.name in ref
                else F.col(f.name)
                for f in df.schema.fields
            ]
        )

    def delete(self, condition: str, mode: str = "copy-on-write") -> VersionInfo:
        """Delta ``DELETE WHERE`` analog.

        ``mode="copy-on-write"`` (default): rewrite the snapshot without
        the matching rows. When the table is partitioned, partitions
        whose every row survives are carried over BY REFERENCE — only
        partitions containing matches are rewritten (computed from one
        aggregate over the partition columns, the moral equivalent of
        Delta's file-level deletion stats).

        ``mode="merge-on-read"``: the deletion-vector / Iceberg
        equality-delete analog — NO data is rewritten at all. The
        predicate commits as a tombstone SCOPED to the current unit set;
        reads (read / scan / merge / CDF, which all route through
        :meth:`_read_with_deletes`) apply ``NOT coalesce(pred, false)``
        to exactly those units, so later appends are untouched even
        when they match. O(metadata) commit — at 100 TB this turns a
        petabyte rewrite into one manifest write; ``compact()``
        materializes pending tombstones and clears them (merge-on-read
        pays a small read tax until then)."""
        if mode not in ("copy-on-write", "merge-on-read"):
            raise ValueError(f"unsupported delete mode {mode!r}")
        info = self._require_no_column_map("delete")
        part_cols = info.partition_by
        if mode == "merge-on-read":
            mor = list(info.extra.get("mor_deletes", []))
            mor.append({"pred": condition, "units": list(info.units)})
            xtra = {k: v for k, v in info.extra.items() if k != "mor_deletes"}
            xtra["mor_deletes"] = mor
            xtra["condition"] = condition
            vinfo = VersionInfo(
                version=info.version + 1,
                timestamp=time.time(),
                operation="DELETE",
                mode="merge-on-read",
                units=list(info.units),
                partition_by=list(part_cols or []),
                extra=xtra,
            )
            self._commit(vinfo)
            return vinfo
        # DELETE removes rows where the condition is TRUE; rows where it
        # evaluates to NULL must SURVIVE (Delta semantics) — a bare
        # `NOT (cond)` would silently drop them.
        keep_pred = f"NOT coalesce(({condition}), false)"
        if part_cols:
            # Touched units are derived from the actual files that hold
            # matching rows (input_file_name), not from re-encoding
            # partition values as strings — str(value) diverges from
            # Spark's partition-path encoding for NULLs
            # (__HIVE_DEFAULT_PARTITION__), URL-escaped characters, and
            # float/timestamp formatting. File paths are metadata-sized
            # (one row per file, same cardinality as Delta's file stats).
            from urllib.parse import unquote, urlparse

            matched_files = {
                unquote(urlparse(r["_f"]).path)
                for r in self.read()
                .filter(condition)
                .select(F.input_file_name().alias("_f"))
                .distinct()
                .collect()
            }
            touched_units, carried = [], []
            for u in info.units:
                prefix = os.path.abspath(os.path.join(self._data, u)) + os.sep
                if any(f.startswith(prefix) for f in matched_files):
                    touched_units.append(u)
                else:
                    carried.append(u)
            if not touched_units:
                return info  # nothing matched; current snapshot stands
            # read THROUGH pending merge-on-read tombstones — a raw unit
            # read would resurrect previously MoR-deleted rows in the
            # rewritten partitions
            kept = self._conform_types(
                self._read_with_deletes(info, touched_units)
            ).filter(keep_pred)
        else:
            carried = []
            kept = self.read().filter(keep_pred)
        new_units = self._write_units(kept, part_cols or None)
        # Carried-by-reference units are byte-identical, so their
        # skipping stats stay valid; rewritten units drop theirs (safe —
        # stats-less units are always scanned).
        carried_set = set(carried)
        carried_stats = {
            u: s for u, s in info.extra.get("stats", {}).items() if u in carried_set
        }
        xtra: dict = {"condition": condition}
        if carried_stats:
            xtra["stats"] = carried_stats
        carried_blooms = {
            u: b for u, b in info.extra.get("blooms", {}).items() if u in carried_set
        }
        if carried_blooms:
            xtra["blooms"] = carried_blooms
        # pending merge-on-read tombstones stay live on carried units
        # (their rows were NOT materialized); rewritten units are clean
        carried_mor = [
            {"pred": d["pred"], "units": scoped}
            for d in info.extra.get("mor_deletes", [])
            if (scoped := [u for u in d["units"] if u in carried_set])
        ]
        if carried_mor:
            xtra["mor_deletes"] = carried_mor
        vinfo = VersionInfo(
            version=info.version + 1,
            timestamp=time.time(),
            operation="DELETE",
            mode=None,
            units=carried + new_units,
            partition_by=list(part_cols or []),
            extra=xtra,
        )
        self._commit(vinfo)
        return vinfo

    def replace_where(
        self, df: DataFrame, condition: str
    ) -> VersionInfo:
        """Delta ``overwrite`` + ``replaceWhere`` analog: atomically
        replace exactly the rows matching ``condition`` with ``df`` —
        the idiomatic idempotent backfill ("rewrite this day/segment")
        that full overwrite (loses everything else) and append
        (duplicates on retry) both get wrong.

        Delta semantics throughout: every incoming row must satisfy the
        predicate (else the commit is rejected before any data lands);
        existing rows where the predicate is NULL survive. Units with
        no matching rows — proven by the same file-level matched-file
        scan DELETE uses, so it works partitioned or not — are carried
        BY REFERENCE with their skipping stats, blooms, and pending
        merge-on-read tombstones intact; only matching units are
        rewritten. Defaults / generated / identity columns apply to the
        incoming frame exactly as in :meth:`write`."""
        from urllib.parse import unquote, urlparse

        info = self._require_no_column_map("replace_where")
        df = self._apply_defaults(df)
        df = self._apply_generated(df)
        for name, spec in self.identity_columns().items():
            if name in df.columns:
                raise ValueError(
                    f"column {name!r} is GENERATED ALWAYS AS IDENTITY "
                    "and cannot be supplied; omit it"
                )
            df = self._assign_identity(df, name, spec)
        existing = set(self.read().columns)
        if set(df.columns) != existing:
            raise ValueError(
                f"replace_where schema mismatch: incoming "
                f"{sorted(set(df.columns))} vs table {sorted(existing)}"
            )
        n_bad = df.filter(f"NOT coalesce(({condition}), false)").count()
        if n_bad:
            raise ValueError(
                f"{n_bad} incoming rows do not satisfy the replaceWhere "
                f"predicate ({condition}); Delta semantics reject the "
                "whole commit"
            )
        self._check_constraints(df, "REPLACE WHERE")
        part_cols = info.partition_by
        matched_files = {
            unquote(urlparse(r["_f"]).path)
            for r in self.read()
            .filter(condition)
            .select(F.input_file_name().alias("_f"))
            .distinct()
            .collect()
        }
        touched, carried = [], []
        for u in info.units:
            prefix = os.path.abspath(os.path.join(self._data, u)) + os.sep
            (touched if any(f.startswith(prefix) for f in matched_files)
             else carried).append(u)
        keep_pred = f"NOT coalesce(({condition}), false)"
        new_units: list[str] = []
        if touched:
            kept = self._conform_types(
                self._read_with_deletes(info, touched)
            ).filter(keep_pred)
            new_units += self._write_units(kept, part_cols or None)
        new_units += self._write_units(df, part_cols or None)
        carried_set = set(carried)
        xtra: dict = {"condition": condition}
        carried_stats = {
            u: s for u, s in info.extra.get("stats", {}).items() if u in carried_set
        }
        if carried_stats:
            xtra["stats"] = carried_stats
        carried_blooms = {
            u: b for u, b in info.extra.get("blooms", {}).items() if u in carried_set
        }
        if carried_blooms:
            xtra["blooms"] = carried_blooms
        carried_mor = [
            {"pred": d["pred"], "units": scoped}
            for d in info.extra.get("mor_deletes", [])
            if (scoped := [u for u in d["units"] if u in carried_set])
        ]
        if carried_mor:
            xtra["mor_deletes"] = carried_mor
        vinfo = VersionInfo(
            version=info.version + 1,
            timestamp=time.time(),
            operation="REPLACE WHERE",
            mode="overwrite",
            units=carried + new_units,
            partition_by=list(part_cols or []),
            extra=xtra,
        )
        self._commit(vinfo)
        return vinfo

    def update(
        self,
        set_exprs: dict[str, str],
        condition: str = "true",
        mode: str = "copy-on-write",
    ) -> VersionInfo:
        """Delta ``UPDATE SET ... WHERE`` analog: matching rows get each
        column replaced by its SQL expression (over the row itself),
        everything else passes through unchanged.

        ``copy-on-write`` (default): one scan, one full rewrite.

        ``merge-on-read``: the deletion-vector update path — ONLY the
        matched rows are written (as a fresh unit carrying their
        updated images) and the predicate commits as a tombstone scoped
        to the pre-update units, hiding the stale images at read time.
        IO is proportional to the matched rows, not the table: the
        update that touches 0.001% of 100 TB writes megabytes. The new
        unit is outside the tombstone's scope, so updated rows survive
        even when they still match the predicate. OPTIMIZE
        materializes. Rows where the condition is NULL are untouched
        in both modes."""
        if mode not in ("copy-on-write", "merge-on-read"):
            raise ValueError(f"unsupported update mode {mode!r}")
        bad_ident = set(set_exprs) & set(self.identity_columns())
        if bad_ident:
            raise ValueError(
                f"column(s) {sorted(bad_ident)} are GENERATED ALWAYS AS "
                "IDENTITY and cannot be updated"
            )
        info = self._require_no_column_map("update")
        df = self.read()
        if mode == "merge-on-read":
            matched = df.filter(F.expr(f"coalesce(({condition}), false)"))
            updated = matched.select(
                *[
                    F.expr(set_exprs[c]).alias(c) if c in set_exprs else F.col(c)
                    for c in df.columns
                ]
            )
            self._check_constraints(updated, "UPDATE(merge-on-read)")
            new_units = self._write_units(updated, info.partition_by or None)
            mor = list(info.extra.get("mor_deletes", []))
            mor.append({"pred": condition, "units": list(info.units)})
            xtra = {k: v for k, v in info.extra.items() if k != "mor_deletes"}
            xtra.update(
                {"mor_deletes": mor, "condition": condition, "set": set_exprs}
            )
            vinfo = VersionInfo(
                version=info.version + 1,
                timestamp=time.time(),
                operation="UPDATE",
                mode="merge-on-read",
                units=list(info.units) + new_units,
                partition_by=list(info.partition_by or []),
                extra=xtra,
            )
            self._commit(vinfo)
            return vinfo
        cols = [
            F.when(F.expr(condition), F.expr(e)).otherwise(F.col(c)).alias(c)
            if c in set_exprs
            else F.col(c)
            for c, e in ((c, set_exprs.get(c)) for c in df.columns)
        ]
        updated = df.select(*cols)
        self._check_constraints(updated, "UPDATE")
        new_units = self._write_units(updated, info.partition_by or None)
        vinfo = VersionInfo(
            version=info.version + 1,
            timestamp=time.time(),
            operation="UPDATE",
            mode=None,
            units=new_units,
            partition_by=list(info.partition_by or []),
            extra={"condition": condition, "set": set_exprs},
        )
        self._commit(vinfo)
        return vinfo

    def changes(
        self,
        from_version: int,
        to_version: int | None = None,
        keys: list[str] | None = None,
    ) -> DataFrame:
        """Change data feed between two versions (Delta CDF analog,
        *net* changes): each key appears at most once, tagged
        ``_change_type`` ∈ insert / update_postimage / delete.
        Insert/update rows carry the new image, deletes the old one.

        Computed as a key full-outer join of the two snapshots with a
        null-safe payload-struct comparison — one shuffle per side (or
        zero if both snapshots are read back bucketed); nothing touches
        the driver. This is the downstream-sync primitive: consumers
        re-apply the feed as a MERGE instead of re-reading the table.
        """
        # Both snapshots share physical storage names; presenting BOTH
        # under the to-version's logical map makes the feed rename-
        # transparent (Delta-CDF-with-column-mapping semantics: change
        # rows carry the names of the version you query at).
        info_old = self._resolve(from_version)
        info_new = self._resolve(to_version)
        old = self._apply_column_map(
            self._read_with_deletes(info_old, info_old.units), info_new
        )
        new = self._apply_column_map(
            self._read_with_deletes(info_new, info_new.units), info_new
        )
        cols = new.columns
        keys = keys or [cols[0]]
        payload = [c for c in cols if c not in keys]
        # Presence is detected via a literal marker added to each side
        # BEFORE the join — key-nullness would mislabel genuinely
        # NULL-keyed rows (the join matches them via eqNullSafe, but
        # both key-based flags would read false → bogus 'insert').
        o = old.withColumn("_o_mark", F.lit(True)).alias("o")
        n = new.withColumn("_n_mark", F.lit(True)).alias("n")
        cond = None
        for k in keys:
            c = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
            cond = c if cond is None else (cond & c)
        o_present = F.col("o._o_mark").isNotNull()
        n_present = F.col("n._n_mark").isNotNull()
        if payload:
            differs = ~F.struct(*[F.col(f"o.{c}") for c in payload]).eqNullSafe(
                F.struct(*[F.col(f"n.{c}") for c in payload])
            )
        else:
            # all columns are keys: a matched row can never differ
            differs = F.lit(False)
        change = (
            F.when(~o_present, "insert")
            .when(~n_present, "delete")
            .when(differs, "update_postimage")
        )
        out_cols = [
            F.when(n_present, F.col(f"n.{c}")).otherwise(F.col(f"o.{c}")).alias(c)
            for c in cols
        ]
        return (
            o.join(n, cond, "full_outer")
            .withColumn("_change_type", change)
            .filter(F.col("_change_type").isNotNull())
            .select(*out_cols, "_change_type")
        )

    # --------------------------------------------------------- history

    def history(self, limit: int | None = None) -> list[dict]:
        """Delta history analog (utils/delta_ops.py:107-129)."""
        vs = list(reversed(self._versions()))
        if limit:
            vs = vs[:limit]
        return [json.loads(v.to_json()) for v in vs]

    def detail(self) -> dict:
        """Delta detail analog (utils/delta_ops.py:207-241)."""
        info = self._resolve()
        n_files = 0
        size = 0
        for rel in info.units:
            for root, _, files in os.walk(os.path.join(self._data, rel)):
                for fn in files:
                    if fn.endswith(".parquet"):
                        n_files += 1
                        size += os.path.getsize(os.path.join(root, fn))
        stats = info.extra.get("stats", {})
        return {
            "location": self.path,
            "version": info.version,
            "num_files": n_files,
            "size_bytes": size,
            "partition_columns": info.partition_by,
            # observability for the scan optimizations: how much of the
            # snapshot can skip, and whether reads pay a tombstone tax
            "num_units": len(info.units),
            "units_with_stats": len([u for u in info.units if u in stats]),
            "stats_columns": sorted({c for s in stats.values() for c in s}),
            "units_with_blooms": len(
                [u for u in info.units if u in info.extra.get("blooms", {})]
            ),
            "bloom_columns": sorted(
                {c for b in info.extra.get("blooms", {}).values() for c in b}
            ),
            "pending_mor_deletes": len(info.extra.get("mor_deletes", [])),
            "column_mapping": self._column_map_of(info),
        }

    # --------------------------------------------------------- restore

    def restore(self, version: int) -> VersionInfo:
        """Restore an earlier version as a NEW version (history kept —
        utils/delta_ops.py:167-204 semantics)."""
        target = self._resolve(version)
        for attempt in range(10):
            xtra: dict = {"restored_from": version}
            # the restored snapshot's units are byte-identical, so its
            # skipping stats — and any tombstones pending AT that
            # version — come along verbatim
            if target.extra.get("stats"):
                xtra["stats"] = target.extra["stats"]
            if target.extra.get("mor_deletes"):
                xtra["mor_deletes"] = target.extra["mor_deletes"]
            if target.extra.get("column_map"):
                xtra["column_map"] = target.extra["column_map"]
            info = VersionInfo(
                version=self.latest_version() + 1,
                timestamp=time.time(),
                operation="RESTORE",
                mode=None,
                units=list(target.units),
                partition_by=list(target.partition_by),
                extra=xtra,
            )
            try:
                self._commit(info)
                return info
            except ConcurrentWriteError:
                # restore is a blind write of an existing snapshot —
                # rebase onto the new head and retry
                if attempt == 9:
                    raise

    # ----------------------------------------------------------- clone

    def clone(self, dest_path: str, version: int | None = None) -> "VersionedTable":
        """Delta SHALLOW CLONE analog: materialize a snapshot as a NEW
        independent table at ``dest_path`` with (near-)zero data copy —
        every parquet file is hard-linked (``os.link``), so a 100 TB
        clone costs directory entries, not bytes, and finishes in
        O(files) driver time with no Spark job at all.

        Unlike Delta's shallow clone (whose manifest points into the
        SOURCE table, so vacuuming the source corrupts the clone), the
        hard links make the clone self-contained: either table may be
        vacuumed, compacted, or deleted without touching the other —
        the inodes survive until the last link drops.  The clone
        starts at version 0 with the snapshot's units, partitioning,
        skipping stats, and pending rename mapping; pending
        merge-on-read tombstones are carried too (they reference the
        cloned units by identical relative paths).  CHECK constraints
        and generated columns are copied — they are table metadata, not
        data, and (like Delta) they are UNVERSIONED: the source's
        CURRENT definitions apply.  For a version-pinned clone the
        current metadata may postdate the snapshot, so the cloned data
        is validated against each copied definition (one fused scan,
        same as :meth:`add_constraint`); definitions the snapshot does
        not satisfy — violated, or referencing columns absent at that
        version — are NOT copied, and the dropped names are recorded in
        the clone's version-0 ``extra["dropped_metadata"]`` (round-3
        advisor item: a clone must never carry a constraint its own
        data was never validated against).
        """
        src = self._resolve(version)
        dest = VersionedTable(self.spark, dest_path)
        if dest.exists():
            raise ValueError(f"destination already has a table: {dest_path}")
        for rel in src.units:
            src_root = os.path.join(self._data, rel)
            dst_root = os.path.join(dest._data, rel)
            for root, _dirs, files in os.walk(src_root):
                tgt = os.path.join(dst_root, os.path.relpath(root, src_root))
                os.makedirs(tgt, exist_ok=True)
                for fn in files:
                    os.link(os.path.join(root, fn), os.path.join(tgt, fn))
        cons = self.constraints()
        gen = self.generated_columns()
        dfl = self.column_defaults()
        dropped: list[str] = []
        latest = self._versions()[-1].version
        if version is not None and src.version != latest and dfl:
            # defaults carry no data invariant (they apply to FUTURE
            # writes) — drop only those that no longer analyze against
            # the snapshot schema
            snap0 = self._apply_column_map(
                self._read_with_deletes(src, src.units), src
            )
            for name, expr in list(dfl.items()):
                try:
                    snap0.select(F.expr(expr)).schema
                    if name not in snap0.columns:
                        raise ValueError(name)
                except Exception:
                    dropped.append(f"d:{name}")
                    dfl.pop(name, None)
        if version is not None and src.version != latest and (cons or gen):
            # Current metadata may postdate this snapshot — keep only
            # definitions the cloned data actually satisfies.  Analysis
            # failures (columns absent at that version) drop outright;
            # the survivors share ONE fused violation-count scan.
            snap = self._apply_column_map(
                self._read_with_deletes(src, src.units), src
            )
            checks: dict[str, str] = {}
            for name, expr in cons.items():
                checks[f"c:{name}"] = f"({expr}) IS FALSE"
            for name, expr in gen.items():
                checks[f"g:{name}"] = f"NOT ({name} <=> ({expr}))"
            analyzable: dict[str, str] = {}
            for key, pred in checks.items():
                try:
                    snap.select(F.expr(pred)).schema
                    analyzable[key] = pred
                except Exception:
                    dropped.append(key)
            if analyzable:
                keys = list(analyzable)
                counts = snap.agg(
                    *[
                        F.sum(F.expr(analyzable[k]).cast("long")).alias(f"k{i}")
                        for i, k in enumerate(keys)
                    ]
                ).first()
                dropped += [k for i, k in enumerate(keys) if counts[f"k{i}"]]
            for key in dropped:
                kind, name = key.split(":", 1)
                # explicit dispatch: 'd:' keys from the defaults block
                # share this list and must NOT pop a same-named
                # generated column (ADVICE r4)
                if kind == "c":
                    cons.pop(name, None)
                elif kind == "g":
                    gen.pop(name, None)
        xtra: dict = {"cloned_from": self.path, "source_version": src.version}
        if dropped:
            xtra["dropped_metadata"] = sorted(dropped)
        for k in ("stats", "mor_deletes", "column_map"):
            if src.extra.get(k):
                xtra[k] = src.extra[k]
        info = VersionInfo(
            version=0,
            timestamp=time.time(),
            operation="CLONE",
            mode=None,
            units=list(src.units),
            partition_by=list(src.partition_by),
            extra=xtra,
        )
        dest._commit(info)
        for side, dest_path_ in (
            (cons, dest._constraints_path),
            (gen, dest._generated_path),
            (dfl, dest._defaults_path),
            # identity metadata clones verbatim: the current watermark is
            # ≥ every id in ANY snapshot, so a version-pinned clone can
            # never re-allocate an existing value
            (self.identity_columns(), dest._identity_path),
        ):
            if side:
                os.makedirs(dest._vlog, exist_ok=True)
                tmp = dest_path_ + f".{uuid.uuid4().hex}.tmp"
                with open(tmp, "w") as f:
                    json.dump(side, f)
                os.replace(tmp, dest_path_)
        return dest

    # ---------------------------------------------------------- vacuum

    def vacuum(
        self,
        retain_last: int = 2,
        dry_run: bool = False,
        retain_hours: float | None = None,
    ) -> list[str]:
        """Remove commit dirs no longer referenced by the retained
        versions (utils/delta_ops.py:65-104 analog).

        ``retain_last`` keeps the newest N versions (count-based, so
        tests are deterministic). ``retain_hours`` is the Delta
        ``VACUUM ... RETAIN n HOURS`` analog: additionally keeps every
        version whose commit timestamp is within the window, so time
        travel inside the retention horizon keeps working; the latest
        version is always kept. When both are given, a version is
        retained if EITHER rule keeps it."""
        vs = self._versions()
        if retain_hours is None:
            # count-based only; retain_last=0 keeps everything (legacy)
            keep: list = list(vs[-retain_last:]) if retain_last else list(vs)
        else:
            # time window (+ optional count floor); retain_last=0 means
            # no count-based retention here, the window alone decides —
            # but the head always survives
            keep = list(vs[-retain_last:]) if retain_last else []
            cutoff = time.time() - retain_hours * 3600.0
            keep += [v for v in vs if v.timestamp >= cutoff]
            if vs and not keep:
                keep = [vs[-1]]
        keep_roots: set[str] = set()
        for v in keep:
            for u in v.units:
                keep_roots.add(u.split("/", 1)[0])
        removed = []
        if os.path.isdir(self._data):
            for rel in sorted(os.listdir(self._data)):
                if rel not in keep_roots:
                    removed.append(rel)
                    if not dry_run:
                        shutil.rmtree(os.path.join(self._data, rel))
        return removed

    # ------------------------------------------------------ compaction

    def compact(
        self, target_files: int = 1, stats_cols: list[str] | None = None
    ) -> VersionInfo:
        """OPTIMIZE/compaction analog (utils/delta_ops.py:29-54): rewrite
        the snapshot into ``target_files`` files (per partition when
        partitioned). When the table carries skipping stats (or the
        caller passes ``stats_cols``), the compacted units get fresh
        stats — OPTIMIZE must not silently degrade a skipping-enabled
        table into an always-scan one."""
        info = self._resolve()
        # read PHYSICALLY (tombstones applied, logical map NOT): the
        # rewritten units must keep storage names so a pending rename
        # mapping stays valid across OPTIMIZE
        df = self._read_with_deletes(info, info.units)
        if not info.partition_by:
            df = df.coalesce(target_files)
        new_units = self._write_units(df, info.partition_by or None)
        if stats_cols is None and info.extra.get("stats"):
            # re-stat the columns the previous snapshot tracked
            stats_cols = sorted(
                {c for s in info.extra["stats"].values() for c in s}
            )
        xtra: dict = {}
        if stats_cols:
            stats = self._collect_stats(
                new_units, stats_cols, bool(info.partition_by)
            )
            if stats:
                xtra["stats"] = stats
        if info.extra.get("blooms"):
            # OPTIMIZE must not degrade equality skipping either —
            # rebuild blooms for the columns the snapshot tracked
            bloom_cols = sorted(
                {c for b in info.extra["blooms"].values() for c in b}
            )
            nb = self._collect_blooms(
                new_units, bloom_cols, bool(info.partition_by)
            )
            if nb:
                xtra["blooms"] = nb
        if info.extra.get("column_map"):
            xtra["column_map"] = info.extra["column_map"]
        # Pin the expected head (info.version + 1): compaction is a
        # read-modify-write, so if any writer committed since the
        # snapshot read, this commit must FAIL (ConcurrentWriteError)
        # rather than rebase and silently drop their rows.
        vinfo = VersionInfo(
            version=info.version + 1,
            timestamp=time.time(),
            operation="OPTIMIZE",
            mode="overwrite",
            units=new_units,
            partition_by=list(info.partition_by),
            extra=xtra,
        )
        self._commit(vinfo)
        return vinfo

    # ----------------------------------------------------------- merge

    def _touched_partition_units(self, source: DataFrame, part_cols: list[str]) -> set[str]:
        """Spark-encode the source's distinct partition values by writing
        them partitioned to a scratch dir and reading back the subdir
        names — guarantees byte-identical key=value encoding."""
        scratch = os.path.join(self._data, f".touch-{uuid.uuid4().hex[:8]}")
        try:
            (
                source.select(*part_cols)
                .distinct()
                .withColumn("__x", F.lit(1))
                .write.mode("overwrite")
                .partitionBy(*part_cols)
                .parquet(scratch)
            )
            out: set[str] = set()

            def walk(prefix: str, depth: int):
                full = os.path.join(scratch, prefix) if prefix else scratch
                for sub in os.listdir(full):
                    if "=" not in sub:
                        continue
                    rel = f"{prefix}/{sub}" if prefix else sub
                    if depth == 1:
                        out.add(rel)
                    else:
                        walk(rel, depth - 1)

            walk("", len(part_cols))
            return out
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def merge(
        self,
        source: DataFrame,
        keys: list[str],
        update_columns: list[str] | None = None,
        insert_unmatched: bool = True,
        update_condition: str | None = None,
        update_exprs: dict[str, str] | None = None,
        delete_condition: str | None = None,
        extra: dict | None = None,
    ) -> VersionInfo:
        """Delta MERGE analog (utils/incremental.py:89-156):
        whenMatchedUpdate(set=update_columns or all non-key columns) +
        whenNotMatchedInsertAll, as a join-based rewrite.

        ``delete_condition``: optional SQL boolean over aliases ``t``
        and ``s``; MATCHED rows satisfying it are DELETED instead of
        updated (Delta's ``whenMatchedDelete(condition=...)``) — the
        primitive a change-data-feed consumer needs to re-apply
        upstream deletes.

        ``update_condition``: optional SQL boolean over aliases ``t``
        (target) and ``s`` (source); matched rows update only when it
        holds (Delta's ``whenMatchedUpdate(condition=...)``).

        ``update_exprs``: optional per-column SQL expressions over ``t``
        and ``s`` applied to MATCHED rows (Delta's
        ``whenMatchedUpdate(set={...})`` with arbitrary expressions) —
        e.g. ``{"cnt": "t.cnt + s.cnt"}`` for additive incremental
        aggregate maintenance. Unmatched source rows still insert the
        source values.

        Partition pruning: when the table is partitioned and the source
        carries the partition columns, only partitions present in the
        source are joined and rewritten; all other partition subdirs are
        carried over by reference (no IO). New source partitions land in
        the rewrite automatically.
        """
        idents = self.identity_columns()
        ident_in_source = set(idents) & set(source.columns)
        if ident_in_source:
            raise ValueError(
                f"column(s) {sorted(ident_in_source)} are GENERATED ALWAYS "
                "AS IDENTITY; the merge source cannot supply them (match "
                "on a natural key instead — inserted rows are assigned "
                "fresh values)"
            )
        for bad in (
            set(idents) & set(update_columns or []),
            set(idents) & set(update_exprs or {}),
        ):
            if bad:
                raise ValueError(
                    f"identity column(s) {sorted(bad)} cannot be merge "
                    "update targets"
                )
        if not self.exists():
            return self.write(source, mode="overwrite", operation="MERGE", extra=extra)
        info = self._require_no_column_map("merge")
        cols = self.read().columns
        update_columns = update_columns or [
            c for c in cols if c not in keys and c in source.columns
        ]

        part_cols = info.partition_by
        prunable = bool(part_cols) and all(c in source.columns for c in part_cols)
        if prunable:
            touched = self._touched_partition_units(source, part_cols)
            touched_units = [u for u in info.units if u.split("/", 1)[1] in touched]
            carried_units = [u for u in info.units if u.split("/", 1)[1] not in touched]
            # read THROUGH pending merge-on-read tombstones: a raw unit
            # read would resurrect MoR-deleted rows into the rewrite
            target = (
                self._conform_types(self._read_with_deletes(info, touched_units))
                if touched_units
                else self.read().limit(0)
            )
        else:
            carried_units = []
            target = self.read()

        # Literal markers (not key-nullness) detect row presence after the
        # full-outer join — the join matches NULL keys via eqNullSafe, so
        # key-based flags would mislabel genuinely NULL-keyed rows.
        t = target.withColumn("_t_mark", F.lit(True)).alias("t")
        s = source.withColumn("_s_mark", F.lit(True)).alias("s")
        cond = None
        for k in keys:
            c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
            cond = c if cond is None else (cond & c)
        joined = t.join(s, cond, "full_outer")

        s_present = F.col("s._s_mark").isNotNull()
        t_present = F.col("t._t_mark").isNotNull()
        raw_matched = s_present & t_present
        matched = raw_matched
        if update_condition is not None:
            matched = matched & F.expr(update_condition)
        s_only = ~t_present
        if delete_condition is not None:
            # whenMatchedDelete wins over whenMatchedUpdate (Delta
            # evaluates clauses in order; we expose delete-first)
            to_delete = raw_matched & F.expr(delete_condition)
            matched = matched & ~to_delete
            joined = joined.filter(
                ~F.coalesce(to_delete, F.lit(False))
                # a source row that ONLY deletes must not insert either
                & ~(s_only & F.coalesce(F.expr(delete_condition), F.lit(False)))
            )
        merged_cols = []
        for c in cols:
            tc = F.col(f"t.{c}")
            sc = F.col(f"s.{c}") if c in source.columns else F.lit(None)
            if c in keys:
                expr = F.coalesce(tc, sc)
            elif update_exprs and c in update_exprs:
                expr = (
                    F.when(matched, F.expr(update_exprs[c]))
                    .when(s_only, sc)
                    .otherwise(tc)
                )
            elif c in update_columns:
                expr = F.when(matched | s_only, sc).otherwise(tc)
            else:
                expr = F.when(s_only, sc).otherwise(tc)
            merged_cols.append(expr.alias(c))
        merged = joined.select(*merged_cols)
        if not insert_unmatched:
            merged = joined.filter(~s_only).select(*merged_cols)

        # Inserted rows (source-only, so their identity slot is NULL —
        # the source is barred from carrying it above) get fresh values;
        # matched/carried rows keep theirs.
        for name, spec in idents.items():
            if name in cols:
                merged = self._assign_identity(merged, name, spec, only_null=True)

        self._check_constraints(merged, "MERGE")
        new_units = self._write_units(merged, part_cols or None)
        # Carried-by-reference partitions keep their skipping stats and
        # any pending merge-on-read tombstones (their bytes and their
        # unmaterialized deletes are both unchanged).
        carried_set = set(carried_units)
        xtra = {**(extra or {}), "keys": keys, "pruned": prunable}
        carried_stats = {
            u: s for u, s in info.extra.get("stats", {}).items() if u in carried_set
        }
        if carried_stats:
            xtra["stats"] = carried_stats
        carried_blooms = {
            u: b for u, b in info.extra.get("blooms", {}).items() if u in carried_set
        }
        if carried_blooms:
            xtra["blooms"] = carried_blooms
        carried_mor = [
            {"pred": d["pred"], "units": scoped}
            for d in info.extra.get("mor_deletes", [])
            if (scoped := [u for u in d["units"] if u in carried_set])
        ]
        if carried_mor:
            xtra["mor_deletes"] = carried_mor
        # Pinned to the snapshot version this merge read (not the
        # current head): a concurrent commit in between must surface as
        # ConcurrentWriteError, not be silently overwritten.
        vinfo = VersionInfo(
            version=info.version + 1,
            timestamp=time.time(),
            operation="MERGE",
            mode=None,
            units=carried_units + new_units,
            partition_by=list(part_cols or []),
            extra=xtra,
        )
        self._commit(vinfo)
        return vinfo

    # ------------------------------------------------ idempotent writers

    def last_txn_version(self, app_id: str) -> int | None:
        """Highest transaction version committed under ``app_id`` — the
        Delta ``txnAppId``/``txnVersion`` idempotent-writer analog.
        Writers that may replay work (e.g. ``foreachBatch`` after a
        checkpoint restart) record ``extra={"txn": {"app_id": ...,
        "version": batch_id}}`` on each commit and skip any batch whose
        id is ≤ this value."""
        best = None
        for v in self._versions():
            txn = v.extra.get("txn")
            if txn and txn.get("app_id") == app_id:
                best = txn["version"] if best is None else max(best, txn["version"])
        return best

    def last_txn_commit(self, app_id: str) -> dict | None:
        """Full ``extra`` metadata of the HIGHEST-version transactional
        commit under ``app_id`` (None if no such commit).  Lets an
        idempotent writer store small running state (e.g. a token
        offset) ATOMICALLY with the data it describes — one commit
        carries rows + txn marker + state, so no crash point can
        separate them (the Delta commit-info pattern)."""
        best_v, best_extra = None, None
        for v in self._versions():
            txn = v.extra.get("txn")
            if txn and txn.get("app_id") == app_id:
                if best_v is None or txn["version"] > best_v:
                    best_v, best_extra = txn["version"], dict(v.extra)
        return best_extra

    @staticmethod
    def txn_extra(app_id: str, version: int) -> dict:
        """Commit-metadata fragment marking a transactional write."""
        return {"txn": {"app_id": app_id, "version": int(version)}}

"""Materialized-view definition + transparent query REWRITE.

The missing half of incremental aggregates (incremental.py refreshes a
materialized AGGREGATE; this module lets queries be ANSWERED from one):
a small MV catalog holds declarative aggregate views — dimensions +
re-aggregable measures materialized as parquet partials — and an
aggregate query is rewritten onto the cheapest matching MV when

  - the query's grouping dims are a SUBSET of the MV's dims (roll-up),
  - every query filter references only MV dims, and
  - every measure is derivable from the MV's partials.

SUM partials are stored as exact DECIMAL, so a roll-up re-aggregation
over the MV is bit-identical to the direct decimal aggregate over the
base table — the rewrite is value-neutral by construction, not "close".
COUNT rolls up by summing partial counts; AVG derives as sum/count at
the END (never averaged averages).

Scale rationale: a 100 TB fact scans in minutes; its (day, flag)-grain
MV is a few thousand rows. Dashboard/roll-up queries hitting the MV
skip the fact scan entirely — the same contract BigQuery/Databricks MV
rewrite provides — and the MV itself refreshes incrementally
(incremental.py) rather than by recompute.

Reference analogue: the gold layer (`/root/reference/etl/gold_job.py`)
precomputes daily KPI tables but consumers must query them BY NAME;
this adds the transparent-rewrite layer on top.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Measure:
    """A re-aggregable measure: ``sum`` (decimal-exact) or ``count``."""

    name: str
    agg: str  # 'sum' | 'count'
    col: str | None = None  # None for count(*)
    scale: int = 2
    precision: int = 22

    def partial(self) -> Column:
        if self.agg == "count":
            return F.count("*").alias(self.name)
        if self.agg == "sum":
            return F.sum(
                F.col(self.col).cast(f"decimal({self.precision},{self.scale})")
            ).alias(self.name)
        raise ValueError(f"unsupported measure agg {self.agg!r}")

    def rollup(self) -> Column:
        # partial counts sum to counts; partial decimal sums sum exactly
        return F.sum(F.col(self.name)).alias(self.name)

    def finish(self) -> Column:
        if self.agg == "count":
            return F.col(self.name).cast("long").alias(self.name)
        return F.col(self.name).cast("double").alias(self.name)


@dataclass
class _MV:
    name: str
    dims: tuple[str, ...]
    measures: tuple[Measure, ...]
    path: str
    n_rows: int


class MVCatalog:
    """Define aggregate MVs and transparently answer roll-up queries."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._mvs: list[_MV] = []

    def define(
        self, name: str, base: DataFrame, dims: list[str], measures: list[Measure], path: str
    ) -> _MV:
        mv_df = base.groupBy(*dims).agg(*[m.partial() for m in measures])
        mv_df.write.mode("overwrite").parquet(path)
        mv = _MV(
            name=name,
            dims=tuple(dims),
            measures=tuple(measures),
            path=path,
            n_rows=self.spark.read.parquet(path).count(),
        )
        self._mvs.append(mv)
        return mv

    def _match(self, dims: list[str], measures: list[Measure], filter_dims: set[str]):
        """Cheapest (fewest rows) MV that can answer the query."""
        best = None
        for mv in self._mvs:
            if not set(dims) <= set(mv.dims):
                continue
            if not filter_dims <= set(mv.dims):
                continue
            if not {(m.name, m.agg, m.col, m.scale) for m in measures} <= {
                (m.name, m.agg, m.col, m.scale) for m in mv.measures
            }:
                continue
            if best is None or mv.n_rows < best.n_rows:
                best = mv
        return best

    def answer(
        self,
        base: DataFrame,
        dims: list[str],
        measures: list[Measure],
        filters: list[tuple[str, str, object]] | None = None,
    ) -> tuple[DataFrame, str]:
        """Aggregate ``base`` by ``dims`` with ``measures``, applying
        ``filters`` (dim, op, value) with op in =, <, <=, >, >=, !=.
        Returns (frame, source) where source is the chosen MV name or
        'base' when no MV matches. MV answers are bit-identical to the
        base aggregate (decimal partials roll up exactly)."""
        filters = filters or []
        ops = {
            "=": lambda c, v: c == v,
            "!=": lambda c, v: c != v,
            "<": lambda c, v: c < v,
            "<=": lambda c, v: c <= v,
            ">": lambda c, v: c > v,
            ">=": lambda c, v: c >= v,
        }

        def apply_filters(df: DataFrame) -> DataFrame:
            for col, op, v in filters:
                df = df.filter(ops[op](F.col(col), v))
            return df

        mv = self._match(dims, measures, {f[0] for f in filters})
        if mv is not None:
            src = apply_filters(self.spark.read.parquet(mv.path))
            out = src.groupBy(*dims).agg(*[m.rollup() for m in measures])
        else:
            src = apply_filters(base)
            out = src.groupBy(*dims).agg(*[m.partial() for m in measures])
        out = out.select(*dims, *[m.finish() for m in measures])
        return out, (mv.name if mv is not None else "base")

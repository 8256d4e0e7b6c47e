"""Custom stateful streaming operators via applyInPandasWithState.

The built-in windowed/session aggregations (ops.py) cover declarative
shapes; this module shows the escape hatch for semantics Spark's
operators can't express — here, per-user session tracking with explicit
GroupState: sessions close on an inactivity gap OR an explicit
'logout'-style terminator event, and emit exactly one row per closed
session (arbitrary custom close conditions are the point;
``session_window`` can only do gap-based).

State per user: current session start/end/count (µs since epoch). On
each microbatch the function folds new events into state, emits closed
sessions, and keeps the open one in state with an EVENT-TIME timeout at
``session_end + gap``: once the watermark passes that point the session
provably cannot be extended, so it closes deterministically — no
wall-clock dependence, which also makes trigger(availableNow) drains
reproducible (a processing-time timeout would stall the drain in the
state-cleanup batch).

At scale this is a keyed-state operator: state lives in the state store
partitioned by user_id, microbatches shuffle only new events, and the
pandas fold sees one group at a time — no driver collect, no global
sort.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Worker-side functions here must survive drivers whose cwd / PYTHONPATH
# does not include this repo: serialize this module by value, not by
# import reference.
import sys as _sys
from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

GAP_MINUTES = 30
_GAP_US = GAP_MINUTES * 60 * 1_000_000

OUTPUT_SCHEMA = "user_id long, start long, end long, n long, closed_by string"
STATE_SCHEMA = "start long, end long, n long"
_COLS = ["user_id", "start", "end", "n", "closed_by"]


#: session timezone of the driver that built the query — set by
#: :func:`sessionize_with_state` before the UDF ships to workers.
#: applyInPandasWithState delivers timestamps as SESSION-TZ-NAIVE
#: pandas values, while GroupState watermark/timeout APIs speak true
#: UTC epoch millis; localizing through this zone reconciles them, so
#: the timeout math is exact under ANY session timezone (a plain
#: .astype(int64) was only correct under UTC).
_SESSION_TZ = "UTC"


def _ts_to_utc_us(series: pd.Series) -> list[int]:
    if series.dt.tz is None:
        series = series.dt.tz_localize(_SESSION_TZ)
    return (series.dt.tz_convert("UTC").astype("int64") // 1_000).tolist()


def _fold_sessions(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    rows = []
    if state.hasTimedOut:
        # Watermark passed session_end + gap: no event can extend it.
        if state.exists:
            s, e, n = state.get
            rows.append((user_id, s, e, n, "timeout"))
            state.remove()
        yield pd.DataFrame(rows, columns=_COLS)
        return

    events = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    # pandas datetime64[ns] → int64 is NANOseconds; state/output are µs.
    ts_us = _ts_to_utc_us(events["ts"])
    types = events["event_type"].tolist()

    if state.exists:
        start, end, n = state.get
    else:
        start = end = None
        n = 0

    for t, typ in zip(ts_us, types):
        if start is None:
            start, end, n = t, t, 1
        elif t - end > _GAP_US:
            rows.append((user_id, start, end, n, "gap"))
            start, end, n = t, t, 1
        else:
            end, n = t, n + 1
        if typ == "logout":
            rows.append((user_id, start, end, n, "logout"))
            start = end = None
            n = 0

    if start is not None:
        state.update((start, end, n))
        # Event-time timeout must sit strictly above the current
        # watermark or Spark rejects it.
        timeout_ms = max(end // 1_000 + GAP_MINUTES * 60_000,
                         state.getCurrentWatermarkMs() + 1)
        state.setTimeoutTimestamp(timeout_ms)
    elif state.exists:
        state.remove()

    yield pd.DataFrame(rows, columns=_COLS)


def sessionize_with_state(
    events: DataFrame, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """events(user_id, ts, event_id, event_type) stream → closed
    sessions(user_id, session_start, session_end, n_events, closed_by).
    Input must be a streaming DataFrame."""
    from pyspark.sql import functions as F

    global _SESSION_TZ
    _SESSION_TZ = events.sparkSession.conf.get("spark.sql.session.timeZone")
    out = (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _fold_sessions,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return out.select(
        "user_id",
        F.timestamp_micros(F.col("start")).alias("session_start"),
        F.timestamp_micros(F.col("end")).alias("session_end"),
        F.col("n").alias("n_events"),
        "closed_by",
    )


class RunningStatsProcessor(StatefulProcessor):
    """transformWithStateInPandas processor (the Spark 4 successor to
    applyInPandasWithState used by sessionize_with_state): per-user
    running count / min / max held in a ValueState, cumulative row
    emitted per (key, microbatch). Downstream takes each key's
    highest-count row, so the final answer is independent of how the
    drain was split into batches.

    ENVIRONMENT GATE: the TWS state-server protocol needs a working
    ``google.protobuf`` in the Python workers — broken in this
    container (StateMessage_pb2 import fails), so this operator is
    covered by a skip-gated test, not a registry query. The
    applyInPandasWithState sessionizer above provides the
    value-oracled arbitrary-state coverage here."""

    def init(self, handle):
        self._state = handle.getValueState("stats", "n long, mn double, mx double")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as _pd

        n, mn, mx = (self._state.get() or (0, None, None)) if self._state.exists() else (0, None, None)
        for pdf in rows:
            n += len(pdf)
            bmn = float(pdf["value"].min())
            bmx = float(pdf["value"].max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
        self._state.update((n, mn, mx))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "min_value": [mn], "max_value": [mx]}
        )

    def close(self):
        pass


def running_stats_with_state(sdf):
    """Per-user cumulative stats over a stream via
    transformWithStateInPandas (update mode, processing-time)."""
    return (
        sdf.groupBy("user_id")
        .transformWithStateInPandas(
            RunningStatsProcessor(),
            outputStructType="user_id long, n_events long, min_value double, max_value double",
            outputMode="Update",
            timeMode="None",
        )
    )

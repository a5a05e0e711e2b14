"""Custom stateful streaming operator: event-time sessionization with
``applyInPandasWithState``.

The reference keeps no cross-event state (SURVEY.md T5) -- its consumer
loop is stateless per message. This operator is the engine's answer to
the capability the reference's Postgres-side session queries would need
at scale: per-user sessions built incrementally in the stream, state
scoped per group key, expired by event-time timeout against the
watermark, emitting a session row exactly when it closes.

Scale posture: state lives in the state store keyed by user_id --
partitioned with the shuffle, nothing driver-side; the pandas kernel
sees one Arrow batch per (key, trigger); timeouts bound state size (no
unbounded session accumulation for dead users). The batch twin of this
operator is operators/sessionize.py (same gap rule, oracle-checked);
this module is the streaming-native path, covered by a replay test
rather than a SQL oracle (non-expressible: incremental emission).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 30 * 60  # same 30-minute gap rule as operators/sessionize.py

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# state: running session bounds + aggregates (epoch micros for timestamps
# -- the state store round-trips primitives, not pandas Timestamps)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_US = 1_000_000


def _sessionize_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this trigger's events for one user into the open session;
    emit closed sessions (gap exceeded mid-batch, or state timed out)."""
    (user_id,) = key
    closed = []

    if state.hasTimedOut:
        if state.exists:
            s0, s1, n, tv = state.get
            closed.append((user_id, s0, s1, n, tv))
            state.remove()
    else:
        events = []
        for pdf in pdfs:
            for ts, val in zip(pdf["ts"], pdf["value"]):
                events.append((int(ts.value // 1000), float(val)))
        # Interval-merge sweep: treat the open session from state as one
        # interval and each event as a point interval, sort by start,
        # and merge under the gap rule. Out-of-order replay thus groups
        # several late events into their own earlier session(s) (the
        # batch twin's exact semantics) instead of emitting one
        # single-event session per late row; everything but the most
        # recent session closes.
        items = [[ts_us, ts_us, 1, val] for ts_us, val in sorted(events)]
        if state.exists:
            s0, s1, n, tv = state.get
            items.append([s0, s1, n, tv])
            items.sort(key=lambda it: (it[0], it[1]))
        gap_us = SESSION_GAP_S * _US
        merged: list[list] = []
        for it in items:
            if merged and it[0] <= merged[-1][1] + gap_us:
                last = merged[-1]
                last[1] = max(last[1], it[1])
                last[2] += it[2]
                last[3] += it[3]
            else:
                merged.append(it)
        for s in merged[:-1]:
            closed.append((user_id, s[0], s[1], s[2], s[3]))
        if merged:
            cur = merged[-1]
            state.update(tuple(cur))
            # close the open session once the watermark passes its gap
            state.setTimeoutTimestamp(cur[1] // 1000 + SESSION_GAP_S * 1000)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                "n_events": [c[3] for c in closed],
                "total_value": [c[4] for c in closed],
            }
        )


def sessionize_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """events(ts TIMESTAMP, user_id LONG, value DOUBLE) streaming frame ->
    closed sessions per user (30-min inactivity gap)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

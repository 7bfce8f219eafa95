"""As-of (most-recent-prior) join — the canonical temporal join Spark lacks
natively (SURVEY.md §2.5 "absent join kinds").

Spark-first shape: instead of a per-row range join (quadratic blowup per
key) or a per-key collect, both sides are UNIONED with a side tag and
processed by one window pass per key ordered by (time, side):
``last(right_value, ignorenulls)`` over the preceding frame gives every
left row the latest right row at-or-before its timestamp. One shuffle on
the key, one sort within partitions — the same cost as any windowed
aggregation, independent of how many right rows precede each left row.

Ties: a right row at exactly the left row's timestamp IS visible (side tag
orders right rows first within equal timestamps) — the usual "as of <= t"
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              value_cols: list[str],
              tolerance_s: float | None = None) -> DataFrame:
    """For each left row: the latest right row with the same ``on`` key and
    ``right_ts <= left_ts`` (within ``tolerance_s`` seconds if given).

    Returns all left columns plus ``value_cols`` (null when no prior right
    row / outside tolerance).
    """
    lcols = left.columns
    l = left.withColumn("__t", F.col(left_ts).cast("timestamp")) \
            .withColumn("__side", F.lit(1))
    r = right.select(
        F.col(on),
        F.col(right_ts).cast("timestamp").alias("__t"),
        *[F.col(c) for c in value_cols],
    ).withColumn("__side", F.lit(0))
    for c in lcols:
        if c not in (on,) and c not in r.columns:
            r = r.withColumn(c, F.lit(None))
    for c in value_cols:
        if c not in l.columns:
            l = l.withColumn(c, F.lit(None))
    u = l.select(on, "__t", "__side", *[c for c in lcols if c != on], *value_cols) \
        .unionByName(
            r.select(on, "__t", "__side", *[c for c in lcols if c != on], *value_cols))
    w = (Window.partitionBy(on).orderBy("__t", "__side")
         .rowsBetween(Window.unboundedPreceding, 0))
    out = u
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    if tolerance_s is not None:
        rt = F.last(F.when(F.col("__side") == 0, F.col("__t")), ignorenulls=True).over(w)
        out = out.withColumn("__rt", rt)
        within = (F.unix_timestamp("__t") - F.unix_timestamp("__rt")) <= tolerance_s
        for c in value_cols:
            out = out.withColumn(c, F.when(within, F.col(c)))
        out = out.drop("__rt")
    return out.filter(F.col("__side") == 1).select(*lcols, *value_cols)

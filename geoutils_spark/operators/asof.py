"""As-of (most-recent-prior) join — the canonical temporal join Spark lacks
natively (SURVEY.md §2.5 "absent join kinds").

Spark-first shape: instead of a per-row range join (quadratic blowup per
key) or a per-key collect, both sides are UNIONED with a side tag and
processed by one window pass per key ordered by (time, side): the right
row's payload travels as ONE struct column, so
``last(struct, ignorenulls)`` over the preceding frame atomically selects
the latest right ROW at-or-before each left timestamp — a right row whose
value columns are genuinely NULL is still "the latest row" and its NULLs
are returned (DuckDB-ASOF semantics), never skipped in favor of an older
row. One shuffle on the key, one sort within partitions — the same cost as
any windowed aggregation, independent of how many right rows precede each
left row.

Ties: a right row at exactly the left row's timestamp IS visible (side tag
orders right rows first within equal timestamps) — the usual "as of <= t"
semantics. Tolerance is compared on double-seconds (timestamp cast), so
sub-second tolerances work.
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
    row / outside tolerance; a matched right row's own NULL values pass
    through as NULL).
    """
    lcols = left.columns
    l = left.select(
        F.col(on),
        F.col(left_ts).cast("timestamp").alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols if c != on],
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).cast("timestamp").alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).cast("timestamp").cast("double").alias("__rt"),
            *[F.col(c) for c in value_cols],
        ).alias("__rv"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # __rv is non-null on EVERY right row (even all-null values) and null on
    # left rows, so last(ignorenulls) = the latest preceding right ROW.
    # Tiebreak among equal (key, ts) right rows: max struct (deterministic)
    # — but only when every payload type is orderable (maps are not; those
    # fall back to the arbitrary-among-exact-duplicates pre-r2 behavior).
    from pyspark.sql.types import MapType

    def _orderable(dt) -> bool:
        if isinstance(dt, MapType):
            return False
        return all(_orderable(f.dataType) for f in getattr(dt, "fields", []) or []) \
            and all(_orderable(et) for et in
                    ([dt.elementType] if hasattr(dt, "elementType") else []))

    order_cols = ["__t", "__side"]
    if _orderable(u.schema["__rv"].dataType):
        order_cols.append("__rv")
    w = (Window.partitionBy(on).orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, 0))
    u = u.withColumn("__m", F.last("__rv", ignorenulls=True).over(w))
    matched = F.col("__m").isNotNull()
    if tolerance_s is not None:
        matched = matched & (
            (F.col("__t").cast("double") - F.col("__m.__rt")) <= F.lit(float(tolerance_s))
        )
    out = u.filter(F.col("__side") == 1)
    for c in value_cols:
        out = out.withColumn(c, F.when(matched, F.col(f"__m.{c}")))
    return out.select(*lcols, *value_cols)

"""Binned 1-D interval join (point-in-range, interval-overlap).

Spark has no native band/range join: a bare ``p.pos BETWEEN i.lo AND i.hi``
join condition has no equi-key, so Catalyst falls back to
BroadcastNestedLoopJoin (or a cartesian product) — O(|P|·|I|) compares.
The scalable plan is the standard binning trick: quantize the value domain
into fixed-width bins, explode each interval onto every bin it overlaps,
and equi-join points to intervals on the bin before applying the exact
BETWEEN refine. This is the 1-D analog of the reference's 2-D leaf-routing
interval join (J3, ``filesForBox`` in /root/reference/osmsplit — expand one
side onto covering buckets, equi-join, refine).

Scale notes (100 TB): the equi-join shuffles on ``__bin``; only the
*intervals* side is replicated, by a factor of ``len(interval)/bin_width +
1`` — points are never duplicated. Pick ``bin_width`` near the median
interval length so the average interval lands on ~2 bins. A small intervals
side broadcasts at runtime (plain equi-join, AQE decides) and no shuffle
happens at all; hot bins from skewed point domains are split by the AQE
skew-join handler, and pathological skew can additionally salt the bin key
(see operators/spatial_join salting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join", "interval_overlap_join"]

_BIN = "__range_bin"


def _interval_bins(lo: str, hi: str, bin_width) -> "F.Column":
    return F.sequence(
        F.floor(F.col(lo) / F.lit(bin_width)).cast("long"),
        F.floor(F.col(hi) / F.lit(bin_width)).cast("long"),
    )


def range_join(points: DataFrame, intervals: DataFrame, value_col: str,
               start_col: str, end_col: str, bin_width) -> DataFrame:
    """Inner-join ``points`` rows to every ``intervals`` row whose
    ``[start_col, end_col]`` (closed) contains ``points[value_col]``.

    Column names must be disjoint between the two inputs (alias first if
    not). Numeric domains only — cast timestamps to epoch seconds before
    calling. ``bin_width`` must be positive and exceed zero-length rounding
    (intervals with ``end < start`` simply match nothing).
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width}")
    p = points.withColumn(
        _BIN, F.floor(F.col(value_col) / F.lit(bin_width)).cast("long"))
    i = intervals.withColumn(
        _BIN, F.explode(_interval_bins(start_col, end_col, bin_width)))
    return (
        p.join(i, _BIN)
        .where(F.col(value_col).between(F.col(start_col), F.col(end_col)))
        .drop(_BIN)
    )


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          l_start: str, l_end: str,
                          r_start: str, r_end: str, bin_width) -> DataFrame:
    """Inner-join interval rows that overlap: ``l_start <= r_end AND
    r_start <= l_end`` (closed intervals). Both sides explode onto their
    covering bins; a pair overlapping across several shared bins is emitted
    exactly once via the first-shared-bin rule (emit only in the bin that
    contains ``greatest(l_start, r_start)`` — every overlapping pair shares
    that bin and no other emission survives the gate), so no distinct pass
    is needed. Same disjoint-column and numeric-domain contract as
    ``range_join``.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width}")
    l = left.withColumn(
        _BIN, F.explode(_interval_bins(l_start, l_end, bin_width)))
    r = right.withColumn(
        _BIN, F.explode(_interval_bins(r_start, r_end, bin_width)))
    first_shared = F.floor(
        F.greatest(F.col(l_start), F.col(r_start)) / F.lit(bin_width)
    ).cast("long")
    return (
        l.join(r, _BIN)
        .where(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col(_BIN) == first_shared)
        )
        .drop(_BIN)
    )

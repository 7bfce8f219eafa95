"""Deterministic heavy hitters: per-partition Misra-Gries candidate
generation + an exact verification pass.

The problem at 100 TB: "which tokens/URLs/hosts exceed eps of the
stream?" over a key space (URLs ~10^11) whose full count table is
itself a massive shuffle. Misra-Gries (1982) keeps only k counters per
partition; the PIGEONHOLE argument makes the union of partition
summaries a complete candidate set: if freq(x) > eps*n globally, then
freq_p(x) > eps*n_p in at least one partition (otherwise summing the
per-partition inequalities bounds freq(x) <= eps*n), and MG with
k = ceil(1/eps) counters retains any item whose local frequency exceeds
n_p/(k+1) <= eps*n_p (each decrement event removes >= (k+1)*dec total
mass, so the total decrement D <= n_p/(k+1)). False positives are fine
— the second pass computes EXACT counts for candidates only (key space
<= k * n_partitions, broadcastable) and applies the threshold as
integer math. Net movement: k rows per partition + one
candidate-bounded count exchange — never a vocab-wide shuffle.

The MG state update is Arrow-batched: pandas value_counts per batch
(vectorized) merged into a dict of <= 2k entries, decremented by the
(k+1)-th largest count on overflow. No per-row Python. The partition's
row total rides out of the same pass as a null-keyed row, so the source
is scanned exactly twice (candidates+total, then verify) regardless of
cardinality.

Threshold is a RATIONAL eps = num/den so the final compare
(count * den >= num * total) is exact integer math in both dialects.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(batches: Iterator[pd.DataFrame], col: str,
                  k: int) -> Iterator[pd.DataFrame]:
    state: dict = {}
    n_rows = 0
    for pdf in batches:
        n_rows += len(pdf)
        for item, cnt in pdf[col].value_counts().items():
            state[item] = state.get(item, 0) + int(cnt)
        if len(state) > 2 * k:
            # decrement so <= k survive: subtract the (k+1)-th largest
            cuts = sorted(state.values(), reverse=True)
            dec = cuts[k]
            state = {i: c - dec for i, c in state.items() if c > dec}
    items = list(state.keys()) + [None]
    yield pd.DataFrame({col: items,
                        "pn": [0] * len(state) + [n_rows]})


def heavy_hitters(df: DataFrame, col: str, num: int, den: int) -> DataFrame:
    """Items of ``df[col]`` with exact count * den >= num * total —
    i.e. frequency >= num/den of all rows — found without a
    full-cardinality shuffle. Returns (col, n) exact counts for
    qualifying items. ``col`` values must be non-null strings."""
    if not (0 < num < den):
        raise ValueError("eps must be a fraction in (0, 1)")
    k = -(-den // num)  # ceil(1/eps) counters
    src = df.select(col)
    summary = src.mapInPandas(
        lambda it: _mg_partition(it, col, k),
        schema=f"`{col}` string, pn long").persist()
    total = summary.agg(F.sum("pn")).collect()[0][0] or 0
    cands = summary.filter(F.col(col).isNotNull()).select(col).distinct()
    exact = (src.join(F.broadcast(cands), col, "leftsemi")
             .groupBy(col).agg(F.count(F.lit(1)).alias("n")))
    # summary stays persisted: cands reads it again at action time (the
    # cache is what holds the two-scan property; it is k-bounded tiny)
    return exact.filter(F.col("n") * den >= F.lit(num) * F.lit(int(total)))

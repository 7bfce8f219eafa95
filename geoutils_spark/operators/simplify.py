"""Depth-bounded Douglas-Peucker polyline simplification — the map
generalization stage every tile/zoom pipeline needs (render a z8 tile
from z16 geometry without shipping every vertex).

True DP recurses to a data-dependent depth; this operator pins the
recursion DEPTH as a parameter, which (a) bounds worst-case work per
polyline at 2^depth splits — the property a 100 TB run wants anyway, a
pathological zigzag cannot monopolize a task — and (b) makes the whole
algorithm DETERMINISTICALLY UNROLLABLE, so the DuckDB oracle replays the
exact split trajectory level by level. Depth d keeps at most 2^d + 1
vertices; classic full DP is the d -> inf limit.

Pinned semantics (identical IEEE ops in numpy and SQL):

* deviation of point p from chord (a, b) compared WITHOUT sqrt or
  division: cross = (bx-ax)(py-ay) - (by-ay)(px-ax); split the chord at
  the point maximizing cross^2 (ties -> lowest index, numpy argmax's
  first-occurrence == SQL min-index-of-max) iff
  cross^2 > tol2 * ((bx-ax)(bx-ax) + (by-ay)(by-ay)) — callers pass
  ``tol2`` = tol^2 so both dialects see one literal;
* endpoints always kept; degenerate chords (coincident endpoints —
  closed rings) never split: cross == 0. Feed rings as open polylines.

The kernel is per-polyline numpy inside an Arrow UDF — row-local, zero
exchanges; at 100 TB simplification is embarrassingly parallel and
output vertex counts are bounded by depth, not input size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dp_keep_np(xs: np.ndarray, ys: np.ndarray, tol2: float,
               depth: int) -> list[int]:
    """0-based indices kept (sorted). See module docstring for the rule."""
    n = len(xs)
    if n <= 2:
        return list(range(n))
    kept = [0, n - 1]
    for _ in range(depth):
        new: list[int] = []
        for a, b in zip(kept, kept[1:]):
            if b - a < 2:
                continue
            ax, ay, bx, by = xs[a], ys[a], xs[b], ys[b]
            px = xs[a + 1:b]
            py = ys[a + 1:b]
            cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            c2 = cross * cross
            i = int(np.argmax(c2))
            seg2 = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
            if c2[i] > tol2 * seg2:
                new.append(a + 1 + i)
        if not new:
            break
        kept = sorted(set(kept) | set(new))
    return kept


def make_dp_udf(tol2: float, depth: int):
    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def dp_udf(xs: pd.Series, ys: pd.Series) -> pd.Series:
        return pd.Series([
            dp_keep_np(np.asarray(x, dtype=np.float64),
                       np.asarray(y, dtype=np.float64), tol2, depth)
            for x, y in zip(xs, ys)])
    return dp_udf


def simplify_polylines(df: DataFrame, tol2: float, depth: int,
                       xs: str = "xs", ys: str = "ys",
                       keep_col: str = "kept") -> DataFrame:
    """Adds ``keep_col`` (kept 0-based vertex indices) — row-local."""
    return df.withColumn(keep_col,
                         make_dp_udf(tol2, depth)(F.col(xs), F.col(ys)))


def dp_level_sql(kept: str, xs: str, ys: str, tol2: float) -> str:
    """One unrolled DP level over (kept 0-based int list, xs, ys double
    lists): returns the next kept list. Stage each level as a CTE
    column."""
    ax = f"{xs}[{kept}[p] + 1]"
    ay = f"{ys}[{kept}[p] + 1]"
    bx = f"{xs}[{kept}[p + 1] + 1]"
    by = f"{ys}[{kept}[p + 1] + 1]"
    c2 = (f"((({bx} - {ax}) * ({ys}[i + 1] - {ay})"
          f" - ({by} - {ay}) * ({xs}[i + 1] - {ax}))"
          f" * (({bx} - {ax}) * ({ys}[i + 1] - {ay})"
          f" - ({by} - {ay}) * ({xs}[i + 1] - {ax})))")
    seg2 = (f"(({bx} - {ax}) * ({bx} - {ax})"
            f" + ({by} - {ay}) * ({by} - {ay}))")
    rng = f"range({kept}[p] + 1, {kept}[p + 1])"
    mx = f"list_max(list_transform({rng}, i -> {c2}))"
    imax = f"list_min(list_filter({rng}, i -> {c2} = {mx}))"
    add = (f"CASE WHEN {kept}[p + 1] - {kept}[p] < 2 THEN []"
           f" WHEN {mx} > CAST({tol2!r} AS DOUBLE) * {seg2}"
           f" THEN [{imax}] ELSE [] END")
    return (f"list_sort(list_distinct(list_concat({kept}, "
            f"flatten(list_transform(range(1, len({kept})), p -> {add})))))")

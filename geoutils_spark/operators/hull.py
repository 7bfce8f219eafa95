"""Convex hull per feature group: Andrew's monotone chain over Arrow
batches.

Rounds out the geometry tier (clip/overlay/boolean/extrude/simplify)
with the classic point-set primitive the reference's bbox algebra
approximates (/root/reference/osm2assimp/geomconvert.cpp bounds
handling): footprint generalization, coverage outlines, label boxes.

Shape: ``applyInPandas`` per feature id — the extrude.py precedent
(per-FEATURE python, per-vertex math numpy); groups are single
geometries so state is bounded by feature size, never corpus size, and
the only exchange is the groupBy(id) the caller already owns. At 100 TB
the hull of a REGION's point cloud composes as hull-of-hulls: per-
partition hulls (bounded output, pigeonhole-style) union into a final
bounded pass — same two-level decomposition as the Misra-Gries
operator.

Area parity trick: vertices are shifted by their (min x, min y) before
the shoelace fold — subtraction of the stored doubles is exact IEEE, so
for an axis-aligned rectangle the fold collapses to the SAME
one-rounding product ``(maxx - minx) * (maxy - miny)`` the analytic SQL
oracle writes, making hull_area hash-exact rather than merely close.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

HULL_SCHEMA = "way_id long, n_input long, n_hull long, hull_area double"


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def hull_np(pts: np.ndarray) -> np.ndarray:
    """Monotone chain. ``pts`` (n, 2) -> hull vertices CCW, no repeat of
    the first vertex; collinear boundary points dropped (strict turns)."""
    pts = np.unique(pts, axis=0)          # lexicographic sort + dedup
    if len(pts) <= 2:
        return pts

    def half(seq):
        st: list[np.ndarray] = []
        for p in seq:
            while len(st) >= 2 and _cross(st[-2], st[-1], p) <= 0:
                st.pop()
            st.append(p)
        return st

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def _shoelace(hull: np.ndarray) -> float:
    """Absolute area via the shoelace fold over SHIFTED coordinates (see
    module docstring for why the shift makes rectangles oracle-exact)."""
    if len(hull) < 3:
        return 0.0
    h = hull - hull.min(axis=0)
    x, y = h[:, 0], h[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    acc = 0.0
    for t in (x * yn - xn * y):
        acc = acc + float(t)
    return abs(acc * 0.5)


def convex_hull_stats(points: DataFrame, id_col: str = "way_id",
                      x: str = "lon", y: str = "lat") -> DataFrame:
    """Per-group hull summary: input size, hull vertex count, hull area."""
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pts = pdf[[x, y]].to_numpy(dtype=float)
        h = hull_np(pts)
        return pd.DataFrame({
            "way_id": [int(pdf[id_col].iloc[0])],
            "n_input": [len(pts)],
            "n_hull": [len(h)],
            "hull_area": [round(_shoelace(h), 9)],
        })

    return points.groupBy(id_col).applyInPandas(fn, HULL_SCHEMA)

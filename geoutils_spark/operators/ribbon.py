"""Polyline → ribbon mesh (highway geometry, reference G2 construction).

Reference semantics (`Geometry::meshFromLine`,
/root/reference/osm2assimp/geometry.cpp:137-230): each polyline of n points
becomes a flat width-w ribbon — the first segment contributes its two
offset start corners, every interior joint contributes the MITER points
(intersection of consecutive segments' left offset lines and right offset
lines; parallel segments fall back to the previous segment's end corners),
the last segment its two end corners; faces are one quad per segment
indexed [2i, 2i+1, 2i+3, 2i+2], z = 0 (ground plane), normals up.

Spark shape: mesh synthesis is a nested-array producer, so it runs as
``mapInPandas`` over Arrow batches with a per-feature numpy kernel (same
pattern as operators/extrude.py) — embarrassingly parallel, no shuffle.
Output uses the extrude MESH_SCHEMA so the OBJ/glTF sinks export ribbons
unchanged (quad faces are legal OBJ; triangulate for strict-triangle
consumers).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoutils_spark.operators.extrude import MESH_SCHEMA


def ribbon_mesh_np(px: np.ndarray, py: np.ndarray, width: float):
    """One polyline -> (vx, vy, faces) ribbon, reference miter semantics.
    Returns None for degenerate input (<2 distinct points — the reference
    throws there, geometry.cpp:141-143; callers filter)."""
    pts = np.stack([np.asarray(px, float), np.asarray(py, float)], axis=1)
    # collapse consecutive duplicates (zero-length segments have no normal)
    keep = np.ones(len(pts), bool)
    keep[1:] = (np.diff(pts, axis=0) != 0).any(axis=1)
    pts = pts[keep]
    n = len(pts)
    if n < 2:
        return None
    d = np.diff(pts, axis=0)
    ln = np.hypot(d[:, 0], d[:, 1])
    dirs = d / ln[:, None]
    normals = np.stack([-dirs[:, 1], dirs[:, 0]], axis=1)  # left normal
    nw = normals * (width / 2.0)
    nseg = n - 1
    left = np.empty((n, 2))
    right = np.empty((n, 2))
    left[0] = pts[0] + nw[0]
    right[0] = pts[0] - nw[0]
    left[-1] = pts[-1] + nw[-1]
    right[-1] = pts[-1] - nw[-1]
    for i in range(1, nseg):
        # miter: intersect previous and next offset LINES per side
        # (crossPoints, geometry.cpp:102-121); parallel -> previous
        # segment's end corners (its fallback, order normalized)
        lm = _line_x(pts[i - 1] + nw[i - 1], dirs[i - 1],
                     pts[i] + nw[i], dirs[i])
        rm = _line_x(pts[i - 1] - nw[i - 1], dirs[i - 1],
                     pts[i] - nw[i], dirs[i])
        left[i] = lm if lm is not None else pts[i] + nw[i - 1]
        right[i] = rm if rm is not None else pts[i] - nw[i - 1]
    vx = np.empty(2 * n)
    vy = np.empty(2 * n)
    vx[0::2], vx[1::2] = left[:, 0], right[:, 0]
    vy[0::2], vy[1::2] = left[:, 1], right[:, 1]
    faces = [[2 * i, 2 * i + 1, 2 * i + 3, 2 * i + 2] for i in range(nseg)]
    return vx, vy, faces


def _line_x(p: np.ndarray, d1: np.ndarray, q: np.ndarray, d2: np.ndarray):
    """Infinite-line intersection p + t·d1 = q + s·d2; None if parallel."""
    denom = d1[0] * d2[1] - d1[1] * d2[0]
    if abs(denom) < 1e-12:
        return None
    t = ((q[0] - p[0]) * d2[1] - (q[1] - p[1]) * d2[0]) / denom
    return p + t * d1


def ribbon_polylines(df: DataFrame, width: float,
                     id_col: str = "way_id",
                     line: str = "line") -> DataFrame:
    """(id, line: array<struct<lon,lat>>) -> MESH_SCHEMA ribbon meshes
    (one quad per segment, z=0). Degenerate polylines (<2 distinct points)
    are dropped."""

    src = df.select(F.col(id_col).alias("way_id"),
                    F.col(line).getField("lon").alias("__px"),
                    F.col(line).getField("lat").alias("__py"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {k: [] for k in ("way_id", "n_vertices", "n_faces",
                                   "vx", "vy", "vz", "faces")}
            for wid, px, py in zip(b["way_id"], b["__px"], b["__py"]):
                got = ribbon_mesh_np(px, py, width)
                if got is None:
                    continue
                vx, vy, faces = got
                out["way_id"].append(int(wid))
                out["n_vertices"].append(len(vx))
                out["n_faces"].append(len(faces))
                out["vx"].append(vx)
                out["vy"].append(vy)
                out["vz"].append(np.zeros(len(vx)))
                out["faces"].append(faces)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, MESH_SCHEMA)

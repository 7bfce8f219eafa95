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

from geoutils_spark.operators.extrude import MESH_ATTR_SCHEMA, MESH_SCHEMA


def ribbon_uvs_np(vx: np.ndarray, vy: np.ndarray,
                  width: float) -> tuple[np.ndarray, np.ndarray]:
    """Reference meshFromLine UV semantics (geometry.cpp:154-208): u is 0
    on the left rail and 1 on the right; v accumulates each rail's OWN
    running vertex-to-vertex distance divided by the ribbon width (so one
    texture repeat ~ one width of road, and the two rails advance
    independently around corners). Returns (tu, tv) for the interleaved
    L,R,L,R vertex layout."""
    lx, ly = vx[0::2], vy[0::2]
    rx, ry = vx[1::2], vy[1::2]
    dl = np.hypot(np.diff(lx), np.diff(ly)) / width
    dr = np.hypot(np.diff(rx), np.diff(ry)) / width
    vl = np.concatenate([[0.0], np.cumsum(dl)])
    vr = np.concatenate([[0.0], np.cumsum(dr)])
    n = len(lx)
    tu = np.tile([0.0, 1.0], n)
    tv = np.empty(2 * n)
    tv[0::2], tv[1::2] = vl, vr
    return tu, tv


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


def buffer_polyline_np(px: np.ndarray, py: np.ndarray, width: float,
                       join: str = "round",
                       arc_step_deg: float = 22.5):
    """Open polyline -> ONE closed buffer-outline ring (vx, vy), the
    reference's second ribbon implementation (ClipperOffset buffer,
    /root/reference/polyformspline.cpp:65-135 — one closed n-gon at half
    height, normals up). Re-derived geometrically instead of via a Vatti
    offset library:

    * walk the LEFT offsets start->end, then the RIGHT offsets end->start;
    * at each interior joint, the OUTER side of the turn gets either the
      MITER point (``join='miter'``, the reference's jtMiter — sharp
      hairpins spike to the miter apex) or an ARC of radius width/2
      sampled every ``arc_step_deg`` (``join='round'`` — the apex never
      leaves the width/2 envelope, ClipperLib's jtRound); the INNER side
      takes both segment corner points (their overlap is invisible in the
      filled outline — the same resolution Clipper's union performs);
    * ends are butt-capped (the straight join of the two rails; the
      reference uses etOpenSquare which additionally extends width/2 past
      the tip — a constant the consumer can add, noted not replicated).

    Returns (vx, vy) of the closed CCW ring, or None for degenerate
    input. Faces/z/normals are the caller's (single n-gon, z=0, +up)."""
    pts = np.stack([np.asarray(px, float), np.asarray(py, float)], axis=1)
    keep = np.ones(len(pts), bool)
    keep[1:] = (np.diff(pts, axis=0) != 0).any(axis=1)
    pts = pts[keep]
    n = len(pts)
    if n < 2:
        return None
    d = np.diff(pts, axis=0)
    dirs = d / np.hypot(d[:, 0], d[:, 1])[:, None]
    normals = np.stack([-dirs[:, 1], dirs[:, 0]], axis=1)  # left normal
    w2 = width / 2.0
    step = np.radians(arc_step_deg)

    def side(sign: float) -> list[np.ndarray]:
        """sign=+1: left rail forward; sign=-1: right rail (caller
        reverses). Outer side of a turn is the one the path bends AWAY
        from: left is outer when cross(d_prev, d_next) < 0."""
        out = [pts[0] + sign * w2 * normals[0]]
        for i in range(1, n - 1):
            a = sign * normals[i - 1]
            b = sign * normals[i]
            cross = dirs[i - 1][0] * dirs[i][1] - dirs[i - 1][1] * dirs[i][0]
            outer = (sign > 0) == (cross < 0)
            if outer and join == "round":
                a0 = np.arctan2(a[1], a[0])
                a1 = np.arctan2(b[1], b[0])
                sweep = (a1 - a0 + np.pi) % (2 * np.pi) - np.pi  # short way
                k = max(int(np.ceil(abs(sweep) / step)), 1)
                for t in np.linspace(0.0, 1.0, k + 1):
                    ang = a0 + t * sweep
                    out.append(pts[i]
                               + w2 * np.array([np.cos(ang), np.sin(ang)]))
            elif outer:  # miter
                m = _line_x(pts[i - 1] + w2 * a, dirs[i - 1],
                            pts[i] + w2 * b, dirs[i])
                out.append(m if m is not None else pts[i] + w2 * a)
                if m is None:
                    out.append(pts[i] + w2 * b)
            else:  # inner: both corner points, overlap resolved by fill
                out.append(pts[i] + w2 * a)
                out.append(pts[i] + w2 * b)
        out.append(pts[-1] + sign * w2 * normals[-1])
        return out

    ring = side(+1.0) + side(-1.0)[::-1]
    arr = np.array(ring)
    return arr[:, 0], arr[:, 1]


def ribbon_polylines(df: DataFrame, width: float,
                     id_col: str = "way_id",
                     line: str = "line",
                     with_attributes: bool = False,
                     join: str = "miter") -> DataFrame:
    """(id, line: array<struct<lon,lat>>) -> MESH_SCHEMA ribbon meshes
    (one quad per segment, z=0). Degenerate polylines (<2 distinct points)
    are dropped.

    ``join`` selects the construction: ``'miter'`` (default) is the
    two-rail segment-quad mesh (reference meshFromLine); ``'round'`` is
    the buffer-outline variant (``buffer_polyline_np``, the reference's
    ClipperOffset path, polyformspline.cpp) — ONE closed n-gon whose
    convex joints are arc-rounded so hairpins never spike past the
    width/2 envelope. Round-join meshes have no UV set (the reference's
    buffer path emits none either).

    ``with_attributes=True`` adds the reference's per-vertex attributes
    (MESH_ATTR_SCHEMA): normals all +up — the ribbon lies flat on the
    ground plane (geometry.cpp:209-212) — and, for miter ribbons, the
    rail-distance UV set (``ribbon_uvs_np``; the reference emits line UVs
    unconditionally, independent of the -u scale), tw = featureId."""
    if join not in ("miter", "round"):
        raise ValueError(f"join must be 'miter' or 'round', got {join!r}")

    src = df.select(F.col(id_col).alias("way_id"),
                    F.col(line).getField("lon").alias("__px"),
                    F.col(line).getField("lat").alias("__py"))

    cols = ("way_id", "n_vertices", "n_faces", "vx", "vy", "vz", "faces")
    acols = ("nx", "ny", "nz", "tu", "tv", "tw")
    schema = MESH_ATTR_SCHEMA if with_attributes else MESH_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {k: [] for k in cols + (acols if with_attributes else ())}
            for wid, px, py in zip(b["way_id"], b["__px"], b["__py"]):
                if join == "round":
                    got = buffer_polyline_np(px, py, width)
                    if got is not None:
                        bx, by = got
                        got = (bx, by, [list(range(len(bx)))])
                else:
                    got = ribbon_mesh_np(px, py, width)
                if got is None:
                    continue
                vx, vy, faces = got
                n = len(vx)
                out["way_id"].append(int(wid))
                out["n_vertices"].append(n)
                out["n_faces"].append(len(faces))
                out["vx"].append(vx)
                out["vy"].append(vy)
                out["vz"].append(np.zeros(n))
                out["faces"].append(faces)
                if with_attributes:
                    if join == "round":  # outline ring: no rail UV set
                        tu = tv = np.empty(0)
                        tww = np.empty(0)
                    else:
                        tu, tv = ribbon_uvs_np(vx, vy, width)
                        tww = np.full(n, float(wid))
                    out["nx"].append(np.zeros(n))
                    out["ny"].append(np.zeros(n))
                    out["nz"].append(np.ones(n))
                    out["tu"].append(tu)
                    out["tv"].append(tv)
                    out["tw"].append(tww)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema)

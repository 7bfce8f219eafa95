"""Delaunay triangulation (Bowyer–Watson) — the ground-mesh kernel (G7).

The reference triangulates the scene's ground points with Delaunator and
emits a flat z=0 mesh with bbox-fraction UVs
(/root/reference/osm2assimp/ground.cpp:104-158). This is the from-scratch
numpy analog: classic Bowyer–Watson over a super-triangle, incremental
point insertion, strict empty-circumcircle test. O(n^2) worst case —
intended for the per-tile point sets the ground operator feeds it (bounded
per group), not planet-wide point clouds; at scale you triangulate each
tile independently (embarrassingly parallel via applyInPandas).

Degeneracies: exactly-cocircular points (grid corners!) take the
strict-inequality branch, yielding an arbitrary-but-valid triangulation —
same behavior class as Delaunator's floating-point predicate.
"""

from __future__ import annotations

import numpy as np


_LD = np.longdouble  # 80-bit on x86: enough headroom for the super-triangle
# cancellation that plain doubles lose at the hull


def _circumcircle(ax, ay, bx, by, cx, cy):
    """Center + squared radius of the triangle's circumcircle (inf radius
    for degenerate/collinear triangles). Extended precision: the huge
    super-triangle coordinates cancel catastrophically in float64."""
    ax, ay, bx, by, cx, cy = (_LD(v) for v in (ax, ay, bx, by, cx, cy))
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if abs(d) < 1e-30:
        return _LD(0.0), _LD(0.0), _LD(np.inf)
    a2 = ax * ax + ay * ay
    b2 = bx * bx + by * by
    c2 = cx * cx + cy * cy
    ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
    uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return ux, uy, r2


def delaunay_np(px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """(n,) coord arrays -> (m, 3) int32 triangle vertex indices (CCW).

    Bowyer–Watson with a super-triangle; duplicate points are collapsed
    (first occurrence wins) so grid inputs with shared corners are safe.
    """
    px = np.asarray(px, float)
    py = np.asarray(py, float)
    # collapse exact duplicates, keep original indices of survivors
    seen: dict[tuple, int] = {}
    keep: list[int] = []
    for i, (x, y) in enumerate(zip(px, py)):
        k = (x, y)
        if k not in seen:
            seen[k] = i
            keep.append(i)
    idx = np.array(keep, dtype=np.int64)
    xs, ys = px[idx], py[idx]
    n = len(xs)
    if n < 3:
        return np.zeros((0, 3), dtype=np.int32)

    # Super-triangle VERY far out: a near-collinear hull triangle can have
    # an enormous circumcircle, and if it reaches a super vertex the final
    # cleanup would delete a real hull triangle. 1e7x the span (with the
    # longdouble predicates) keeps the supers outside every real
    # circumcircle that non-adversarial inputs produce.
    cx, cy = xs.mean(), ys.mean()
    span = max(xs.max() - xs.min(), ys.max() - ys.min(), 1e-9) * 1e7
    sx = np.array([cx - span, cx + span, cx])
    sy = np.array([cy - span, cy - span, cy + span])
    X = np.concatenate([xs, sx])
    Y = np.concatenate([ys, sy])

    # triangle store: list of (i, j, k, ux, uy, r2)
    tris: list[tuple] = []
    i0, i1, i2 = n, n + 1, n + 2
    tris.append((i0, i1, i2, *_circumcircle(X[i0], Y[i0], X[i1], Y[i1], X[i2], Y[i2])))

    # deterministic insertion order
    order = np.lexsort((ys, xs))
    for p in order:
        pxv, pyv = X[p], Y[p]
        bad = []
        good = []
        for t in tris:
            dx = pxv - t[3]
            dy = pyv - t[4]
            if dx * dx + dy * dy < t[5]:
                bad.append(t)
            else:
                good.append(t)
        # boundary of the cavity = edges appearing exactly once among bad
        edge_count: dict[tuple, int] = {}
        for (a, b, c, *_rest) in bad:
            for e in ((a, b), (b, c), (c, a)):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
            # (store orientation separately below)
        boundary = []
        for (a, b, c, *_rest) in bad:
            for e in ((a, b), (b, c), (c, a)):
                if edge_count[(min(e), max(e))] == 1:
                    boundary.append(e)
        tris = good
        for (a, b) in boundary:
            tris.append((a, b, p, *_circumcircle(X[a], Y[a], X[b], Y[b], pxv, pyv)))

    out = []
    for (a, b, c, *_rest) in tris:
        if a < n and b < n and c < n:
            # normalize to CCW
            area2 = ((X[b] - X[a]) * (Y[c] - Y[a])
                     - (X[c] - X[a]) * (Y[b] - Y[a]))
            tri = (a, b, c) if area2 > 0 else (a, c, b)
            out.append([int(idx[tri[0]]), int(idx[tri[1]]), int(idx[tri[2]])])
    return np.array(out, dtype=np.int32).reshape(-1, 3)

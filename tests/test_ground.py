"""G7 Delaunay ground mesh (reference ground.cpp:104-158)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geoutils_spark.functions.delaunay import _circumcircle, delaunay_np
from geoutils_spark.operators.ground import ground_mesh


def _hull_counts(pts):
    """(#strict-hull vertices, #all boundary points incl. collinear)."""
    P = sorted(map(tuple, pts))

    def half(Q):
        h = []
        for p in Q:
            while len(h) >= 2 and ((h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                                   - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])) <= 0:
                h.pop()
            h.append(p)
        return h

    hv, hv2 = half(P), half(P[::-1])
    edges = list(zip(hv, hv[1:])) + list(zip(hv2, hv2[1:]))

    def on_edge(p, a, b):
        cross = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
        return (cross == 0
                and min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
                and min(a[1], b[1]) <= p[1] <= max(a[1], b[1]))

    B = sum(1 for p in map(tuple, pts) if any(on_edge(p, a, b) for a, b in edges))
    return len(hv) + len(hv2) - 2, B


@pytest.mark.parametrize("kind", ["random", "grid", "circleish"])
def test_delaunay_invariants(kind):
    """Euler count (T = 2N-2-B), empty circumcircle, exact hull area."""
    rng = np.random.RandomState(11)
    if kind == "random":
        px, py = rng.uniform(0, 10, 300), rng.uniform(0, 10, 300)
    elif kind == "grid":
        gx, gy = np.meshgrid(np.arange(9.0), np.arange(5.0))
        px, py = gx.ravel(), gy.ravel()
    else:
        th = np.linspace(0, 2 * np.pi, 40, endpoint=False)
        px = np.concatenate([np.cos(th), rng.uniform(-0.5, 0.5, 30)])
        py = np.concatenate([np.sin(th), rng.uniform(-0.5, 0.5, 30)])
    tris = delaunay_np(px, py)
    pts = np.unique(np.stack([px, py], 1), axis=0)
    _, B = _hull_counts(pts)
    assert len(tris) == 2 * len(pts) - 2 - B
    # empty circumcircle (strict interior violations only)
    for (a, b, c) in tris:
        ux, uy, r2 = _circumcircle(px[a], py[a], px[b], py[b], px[c], py[c])
        d2 = (px - float(ux)) ** 2 + (py - float(uy)) ** 2
        assert (d2 < float(r2) * (1 - 1e-9)).sum() <= 3
    # triangles are CCW and tile the hull exactly
    areas = []
    for (a, b, c) in tris:
        ar = ((px[b] - px[a]) * (py[c] - py[a])
              - (px[c] - px[a]) * (py[b] - py[a])) / 2
        assert ar > 0
        areas.append(ar)
    if kind == "grid":
        assert abs(sum(areas) - 8 * 4) < 1e-9


def test_ground_mesh_operator(spark):
    """Per-group triangulation through applyInPandas; fixture building
    corners -> one ground mesh per group, scene-count analog of the
    reference's buildings+highways+1 (test.py:85-100)."""
    from geoutils_spark.sources import fixtures

    polys = fixtures.polygons_df(spark).filter("kind = 'building'")
    pts = polys.select(
        F.lit(0).alias("group_id"),
        F.explode(F.col("ring")).alias("p"),
    ).select("group_id", F.col("p.lon").alias("lon"), F.col("p.lat").alias("lat"))
    out = ground_mesh(pts, pad=0.001).collect()
    assert len(out) == 1  # ONE ground mesh for the scene
    m = out[0]
    assert m.n_faces == len(m.faces) and m.n_vertices == len(m.vx)
    for f in m.faces:
        assert all(0 <= i < m.n_vertices for i in f)
    assert all(z == 0.0 for z in m.vz)
    assert all(0.0 <= x <= 1.0 for x in m.u) and all(0.0 <= y <= 1.0 for y in m.v)
    # two groups -> two meshes (tile-parallel shape)
    pts2 = pts.withColumn("group_id", (F.col("lon") > -0.085).cast("long"))
    assert ground_mesh(pts2, pad=0.001).count() == 2

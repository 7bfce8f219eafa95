"""Depth-bounded Douglas-Peucker (operators/simplify.py): split rule,
tie-break, depth bound, and degenerate inputs."""

import numpy as np
from pyspark.sql import functions as F

from geoutils_spark.operators import simplify as S


def _keep(xs, ys, tol, depth):
    return S.dp_keep_np(np.asarray(xs, float), np.asarray(ys, float),
                        tol * tol, depth)


def test_classic_spike():
    # flat line with one spike at index 2: the spike is kept, flats drop
    xs = [0, 1, 2, 3, 4]
    ys = [0, 0, 1, 0, 0]
    # flats sit 1/sqrt(5) ~ 0.447 off the half-chords -> tol 0.5 drops
    # them but keeps the spike
    assert _keep(xs, ys, 0.5, 4) == [0, 2, 4]
    # tolerance above the spike: endpoints only
    assert _keep(xs, ys, 2.0, 4) == [0, 4]
    # tight tolerance keeps everything
    assert _keep(xs, ys, 0.1, 4) == [0, 1, 2, 3, 4]


def test_colinear_keeps_endpoints():
    xs = list(range(10))
    ys = [2 * x for x in xs]
    assert _keep(xs, ys, 1e-9, 6) == [0, 9]


def test_tie_lowest_index():
    # two equal-deviation points; the split must take the lower index
    xs = [0, 1, 2, 3]
    ys = [0, 1, 1, 0]
    assert _keep(xs, ys, 0.1, 1) == [0, 1, 3]


def test_depth_bounds_vertices():
    rng = range(200)
    xs = [i * 1.0 for i in rng]
    ys = [(i % 2) * 10.0 for i in rng]   # pathological zigzag
    for d in (1, 2, 3):
        kept = _keep(xs, ys, 0.1, d)
        assert len(kept) <= 2 ** d + 1


def test_degenerate_inputs():
    assert _keep([], [], 0.1, 3) == []
    assert _keep([1.0], [2.0], 0.1, 3) == [0]
    assert _keep([0.0, 1.0], [0.0, 1.0], 0.1, 3) == [0, 1]
    # closed ring (coincident endpoints): degenerate chord never splits
    assert _keep([0, 1, 1, 0, 0], [0, 0, 1, 1, 0], 0.01, 4) == [0, 4]


def test_udf_matches_kernel(spark):
    rows = [(w, [i * 0.5 for i in range(12)],
             [((w + 1) * i * i) % 5 * 0.3 for i in range(12)])
            for w in range(8)]
    df = spark.createDataFrame(
        rows, "way_id long, xs array<double>, ys array<double>")
    got = {r["way_id"]: list(r["kept"])
           for r in S.simplify_polylines(df, 0.04, 3).collect()}
    for w, xs, ys in rows:
        assert got[w] == S.dp_keep_np(np.asarray(xs), np.asarray(ys),
                                      0.04, 3)

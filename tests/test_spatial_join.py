"""Spatial join vs brute-force oracle; golden precedent: the reference pins
exact tile assignments (/root/reference/test.py:76-83)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geoutils_spark.operators.spatial_join import (
    point_to_polyline_dist_np, ray_cast_np, spatial_join, with_covering_cells,
)
from geoutils_spark.sources import fixtures


@pytest.fixture(scope="module")
def data(spark):
    pages = fixtures.with_page_geo(fixtures.pages_df(spark, 1500))
    polys = fixtures.polygons_df(spark)
    return pages, polys


def _brute_pairs(pages_pdf, polys_pdf):
    exp = set()
    for b in polys_pdf.itertuples():
        xs = np.array([p["lon"] for p in b.ring])
        ys = np.array([p["lat"] for p in b.ring])
        n = len(pages_pdf)
        inside = ray_cast_np(
            pages_pdf.lon.to_numpy(), pages_pdf.lat.to_numpy(),
            np.array([xs] * n, dtype=object), np.array([ys] * n, dtype=object),
        )
        for pid in pages_pdf.page_id.to_numpy()[inside]:
            exp.add((int(pid), int(b.way_id)))
    return exp


def test_join_matches_bruteforce(spark, data):
    pages, polys = data
    buildings = polys.filter("kind = 'building'")
    got = {
        (r.page_id, r.way_id)
        for r in spatial_join(pages, buildings, level=15).collect()
    }
    exp = _brute_pairs(pages.select("page_id", "lon", "lat").toPandas(),
                       buildings.select("way_id", "ring").toPandas())
    assert got == exp
    assert len(got) > 0


def test_salted_and_shuffle_paths_agree(spark, data):
    pages, polys = data
    buildings = polys.filter("kind = 'building'")
    base = {
        (r.page_id, r.way_id)
        for r in spatial_join(pages, buildings, level=15).collect()
    }
    shuffled = {
        (r.page_id, r.way_id)
        for r in spatial_join(pages, buildings, level=15,
                              broadcast_polygons=False).collect()
    }
    salted = {
        (r.page_id, r.way_id)
        for r in spatial_join(pages, buildings, level=15,
                              broadcast_polygons=False, n_salt=4).collect()
    }
    assert base == shuffled == salted


def test_covering_cells_guard(spark, data):
    _, polys = data
    with pytest.raises(Exception, match="max_cells"):
        with_covering_cells(polys, 22, max_cells=16).select(
            F.explode("cells")
        ).count()


def test_ray_cast_boundary_determinism():
    # unit square; points on edges follow the half-open rule deterministically
    xs = np.array([0.0, 0.0, 1.0, 1.0, 0.0])
    ys = np.array([0.0, 1.0, 1.0, 0.0, 0.0])
    px = np.array([0.5, 0.0, 1.0, 0.5, 0.5, -0.1])
    py = np.array([0.5, 0.5, 0.5, 0.0, 1.0, 0.5])
    n = len(px)
    got = ray_cast_np(px, py, np.array([xs] * n, dtype=object),
                      np.array([ys] * n, dtype=object))
    # interior in; left edge in, right edge out (x half-open);
    # bottom/top corners follow y half-open rule: y=0 in, y=1 out
    assert got.tolist() == [True, True, False, True, False, False]


def test_polyline_distance_kernel():
    xs = np.array([0.0, 1.0, 1.0])
    ys = np.array([0.0, 0.0, 1.0])
    px = np.array([0.5, 2.0, 1.2])
    py = np.array([0.2, 0.0, 0.5])
    d = point_to_polyline_dist_np(
        px, py, np.array([xs] * 3, dtype=object), np.array([ys] * 3, dtype=object)
    )
    assert abs(d[0] - 0.2) < 1e-12
    assert abs(d[1] - 1.0) < 1e-12
    assert abs(d[2] - 0.2) < 1e-12


def test_salted_join_matches_unsalted(spark):
    """Skew path: (cell_id, salt) keys + polygon replication must give the
    identical result set as the plain join (SURVEY.md §4 salting)."""
    from pyspark.sql import functions as F

    from geoutils_spark.operators.spatial_join import spatial_join
    from geoutils_spark.sources import fixtures

    pages = fixtures.with_page_geo(fixtures.pages_df(spark, 3000, hot_fraction=0.5))
    pts = pages.select("page_id", "lon", "lat")
    polys = fixtures.polygons_df(spark).filter(F.col("kind") == "building")
    plain = spatial_join(pts, polys, level=15, broadcast_polygons=False)
    salted = spatial_join(pts, polys, level=15, broadcast_polygons=False,
                          n_salt=8)
    a = {(r.page_id, r.way_id) for r in plain.collect()}
    b = {(r.page_id, r.way_id) for r in salted.collect()}
    assert a == b and len(a) > 0


def test_adaptive_two_level_join_matches_single_level(spark):
    """Mixed polygon sizes: tiny fixture buildings + one polygon covering the
    whole extent. Adaptive two-level result == single-level result (where a
    single level can even run), and the big polygon matches every point."""
    from pyspark.sql import functions as F

    from geoutils_spark.constants import LONDON_EXTENTS
    from geoutils_spark.operators.spatial_join import (
        spatial_join,
        spatial_join_adaptive,
    )
    from geoutils_spark.sources import fixtures

    pages = fixtures.with_page_geo(fixtures.pages_df(spark, 2000))
    pts = pages.select("page_id", "lon", "lat")
    small = fixtures.polygons_df(spark).filter(F.col("kind") == "building")
    lon0, lat0, lon1, lat1 = LONDON_EXTENTS
    pad = 0.001
    ring = [(lon0 - pad, lat0 - pad), (lon1 + pad, lat0 - pad),
            (lon1 + pad, lat1 + pad), (lon0 - pad, lat1 + pad),
            (lon0 - pad, lat0 - pad)]
    big = spark.createDataFrame(
        [{"way_id": 999, "kind": "big", "tags": {},
          "ring": [{"lon": x, "lat": y} for x, y in ring],
          "bbox": {"minx": lon0 - pad, "miny": lat0 - pad,
                   "maxx": lon1 + pad, "maxy": lat1 + pad}}],
        fixtures.POLYGON_SCHEMA)
    polys = small.unionByName(big)
    # single-level at 13 fits both sizes (extent ~ a few L13 cells)
    base = {(r.page_id, r.way_id)
            for r in spatial_join(pts, polys, level=13).collect()}
    adap = {(r.page_id, r.way_id)
            for r in spatial_join_adaptive(
                pts, polys, fine_level=15, coarse_level=11,
                max_fine_cells=16).collect()}
    assert adap == base
    n_pts = pts.count()
    assert sum(1 for _, w in adap if w == 999) == n_pts


def test_ray_cast_boundary_rules():
    """Half-open edge semantics are deterministic: for the unit square,
    points inside are in; outside are out; and every boundary point gets a
    definite (stable) answer tied to the 'strictly right' crossing rule."""
    import numpy as np

    from geoutils_spark.operators.spatial_join import ray_cast_np

    sq_x = [0.0, 1.0, 1.0, 0.0, 0.0]
    sq_y = [0.0, 0.0, 1.0, 1.0, 0.0]

    def pip(px, py):
        return bool(ray_cast_np(np.array([px]), np.array([py]),
                                [sq_x], [sq_y])[0])

    assert pip(0.5, 0.5) is True
    assert pip(1.5, 0.5) is False
    assert pip(-0.5, 0.5) is False
    assert pip(0.5, 1.5) is False
    # left edge: ray crosses the right edge once -> inside
    assert pip(0.0, 0.5) is True
    # right edge: no edge strictly right of the point -> outside
    assert pip(1.0, 0.5) is False
    # horizontal edges: (y1 > py) != (y2 > py) half-open rule
    assert pip(0.5, 0.0) is True    # bottom edge counts (y=0: top endpoints above)
    assert pip(0.5, 1.0) is False   # top edge does not
    # vertices follow the same composition
    assert pip(0.0, 0.0) is True
    assert pip(1.0, 1.0) is False
    # degenerate: same answers via the vectorized multi-row path
    many = ray_cast_np(np.array([0.5, 1.0, 0.0]), np.array([0.5, 0.5, 0.5]),
                       [sq_x] * 3, [sq_y] * 3)
    assert many.tolist() == [True, False, True]


def test_ray_cast_rings_donut():
    """Multi-ring even-odd: inside outer only -> in; inside hole -> out;
    outside outer -> out (reference Clipper pftEvenOdd, utils.cpp:95-154)."""
    import numpy as np

    from geoutils_spark.operators.spatial_join import ray_cast_rings_np

    outer_x = [0.0, 10.0, 10.0, 0.0, 0.0]
    outer_y = [0.0, 0.0, 10.0, 10.0, 0.0]
    hole_x = [4.0, 6.0, 6.0, 4.0, 4.0]
    hole_y = [4.0, 4.0, 6.0, 6.0, 4.0]
    px = np.array([2.0, 5.0, 11.0, 4.0, 6.0])
    py = np.array([2.0, 5.0, 5.0, 5.0, 5.0])
    rings_x = [[outer_x, hole_x]] * 5
    rings_y = [[outer_y, hole_y]] * 5
    got = ray_cast_rings_np(px, py, rings_x, rings_y)
    # boundary rule: hole edges are half-open [4,6) -> x=4 is IN hole (out),
    # x=6 is OUT of hole (in the donut)
    assert list(got) == [True, False, False, False, True]


def test_spatial_join_with_holes(spark):
    from geoutils_spark.operators.spatial_join import spatial_join
    from geoutils_spark.sources import fixtures

    donuts = fixtures.polygons_with_holes_df(spark)
    rows = donuts.collect()
    assert all(len(r.rings) == 2 for r in rows)
    # build probe points: building 0's bbox center (inside hole) and a point
    # inside the donut band
    b = rows[0].bbox
    import pandas as pd
    space = fixtures.grid_space()
    pts = spark.createDataFrame(pd.DataFrame({
        "page_id": [0, 1],
        "lon": [b.minx + space * 0.5, b.minx + space * 0.1],
        "lat": [b.miny + space * 0.5, b.miny + space * 0.1],
    }))
    got = spatial_join(pts, donuts, level=15).toPandas()
    assert set(got.page_id) == {1}  # hole point excluded, band point kept

"""Sutherland-Hodgman clip + area zonal (reference Clipper intersectPolygons
semantics, /root/reference/osm2assimp/utils.cpp:95-154)."""

import numpy as np
from pyspark.sql import functions as F

from geoutils_spark.constants import LONDON_EXTENTS
from geoutils_spark.operators import clip
from geoutils_spark.operators.zonal import area_raster, area_zonal_stats
from geoutils_spark.sources import fixtures


def _clip_area(spark, rx, ry, x0, x1, y0, y1):
    df = spark.createDataFrame(
        [(1, rx, ry, x0, x1, y0, y1)],
        "way_id long, rx array<double>, ry array<double>, "
        "x0 double, x1 double, y0 double, y1 double")
    df = df.withColumn("ring", clip.ring_struct_col(F.col("rx"), F.col("ry")))
    df = clip.with_clipped_ring(df, "ring", "x0", "x1", "y0", "y1")
    fp = df.withColumn("fp", clip.shoelace_fp_col(F.col("clipped"))).collect()[0].fp
    return abs(fp) / 2.0 / clip.FP_SCALE


def test_clip_partial_overlap(spark):
    sq_x = [0.0, 1.0, 1.0, 0.0, 0.0]
    sq_y = [0.0, 0.0, 1.0, 1.0, 0.0]
    assert abs(_clip_area(spark, sq_x, sq_y, 0.5, 1.5, 0.5, 1.5) - 0.25) < 1e-9


def test_clip_contained_and_disjoint(spark):
    sq_x = [0.0, 1.0, 1.0, 0.0, 0.0]
    sq_y = [0.0, 0.0, 1.0, 1.0, 0.0]
    assert abs(_clip_area(spark, sq_x, sq_y, -1.0, 2.0, -1.0, 2.0) - 1.0) < 1e-9
    assert _clip_area(spark, sq_x, sq_y, 5.0, 6.0, 5.0, 6.0) == 0.0


def test_clip_triangle(spark):
    # right triangle (0,0)-(2,0)-(0,2); clip to unit square: area 1 - 1/2... 
    # region x,y in [0,1] under x+y<=2 is the whole unit square = 1.0;
    # clip to [1,2]x[0,1]: triangle corner -> area 0.5
    tri_x = [0.0, 2.0, 0.0, 0.0]
    tri_y = [0.0, 0.0, 2.0, 0.0]
    assert abs(_clip_area(spark, tri_x, tri_y, 0.0, 1.0, 0.0, 1.0) - 1.0) < 1e-9
    assert abs(_clip_area(spark, tri_x, tri_y, 1.0, 2.0, 0.0, 1.0) - 0.5) < 1e-9


def test_area_zonal_donuts(spark):
    """Total clipped area per donut == outer - hole (opposite winding)."""
    donuts = fixtures.polygons_with_holes_df(spark)
    z = area_zonal_stats(donuts, LONDON_EXTENTS, 16, 16).toPandas()
    space = fixtures.grid_space()
    expect = space * space * (1.0 - (fixtures.HOLE_HI - fixtures.HOLE_LO) ** 2)
    assert len(z) == 18
    np.testing.assert_allclose(z.area_deg2, expect, rtol=1e-6)


def test_area_raster_partition_of_area(spark):
    """Per-cell areas partition the polygon: non-negative, sum to total."""
    donuts = fixtures.polygons_with_holes_df(spark).filter("way_id = 0")
    r = area_raster(donuts, LONDON_EXTENTS, 16, 16).toPandas()
    assert (r.cell_fp > 0).all()
    space = fixtures.grid_space()
    total = r.cell_fp.sum() / 2.0 / clip.FP_SCALE
    np.testing.assert_allclose(total, space * space * 0.75, rtol=1e-6)


def test_clip_partition_additivity_random(spark):
    """150 random convex quadrilaterals: clipping against a 2x2 split of a
    window partitions the area — sum of quadrant pieces == whole-window
    piece (within fixed-point resolution), one batched Spark job."""
    import math
    import random

    rnd = random.Random(42)
    rows = []
    for q in range(150):
        cx, cy = rnd.uniform(-4, 4), rnd.uniform(-4, 4)
        r1, r2 = rnd.uniform(0.1, 3.0), rnd.uniform(0.1, 3.0)
        rot = rnd.uniform(0, 2 * math.pi)
        pts = [(cx + (r1 if k % 2 == 0 else r2) * math.cos(rot + k * math.pi / 2),
                cy + (r1 if k % 2 == 0 else r2) * math.sin(rot + k * math.pi / 2))
               for k in range(4)]
        rx = [p[0] for p in pts] + [pts[0][0]]
        ry = [p[1] for p in pts] + [pts[0][1]]
        for k, w in enumerate([(-2.0, 0.0, -2.0, 0.0), (0.0, 2.0, -2.0, 0.0),
                               (-2.0, 0.0, 0.0, 2.0), (0.0, 2.0, 0.0, 2.0),
                               (-2.0, 2.0, -2.0, 2.0)]):
            rows.append((q, k, rx, ry, w[0], w[1], w[2], w[3]))
    df = spark.createDataFrame(
        rows, "q long, k long, rx array<double>, ry array<double>, "
              "x0 double, x1 double, y0 double, y1 double")
    df = df.withColumn("ring", clip.ring_struct_col(F.col("rx"), F.col("ry")))
    df = clip.with_clipped_ring(df, "ring", "x0", "x1", "y0", "y1")
    got = {}
    for r in df.withColumn("fp", clip.shoelace_fp_col(F.col("clipped"))).collect():
        got[(r.q, r.k)] = abs(r.fp)
    for q in range(150):
        quad_sum = sum(got[(q, k)] for k in range(4))
        whole = got[(q, 4)]
        # fp quantization: each ring rounds ~16 edge terms at 1e-12
        assert abs(quad_sum - whole) <= 5 * 16, (q, quad_sum, whole)
        assert whole <= got[(q, 4)] + 1  # sanity: pieces bounded by whole

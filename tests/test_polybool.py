"""General polygon booleans: functions/polybool.py kernel vs the
reference's own Clipper test cases (/root/reference/osm2assimp/test.cpp:
26-119, utils.cpp:95-158), and the relational Green's-theorem overlay
(operators/overlay.py) cross-checked against the constructive kernel."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geoutils_spark.functions.polybool import (
    _edges,
    _parity,
    _scale_rings,
    poly_orientation,
    polygon_boolean,
    polygons_area,
    ring_signed_area,
)


def _sq(x0, y0, x1, y1):
    return [(x0, y0), (x0, y1), (x1, y1), (x1, y0)]


def test_union_offset_squares_clipper_parity():
    """test.cpp ClipperLibIntersect (default clipType=1=union, utils.h:54):
    overlapping offset squares merge to ONE CCW ring; after moving the clip
    away, TWO disjoint CCW rings."""
    clip0 = _sq(2, 2, 6, 6)
    clip1 = _sq(4, 4, 8, 8)
    res = polygon_boolean([clip0], [clip1], 1)
    assert len(res) == 1
    assert poly_orientation(res[0])
    assert polygons_area(res) == pytest.approx(16 + 16 - 4)
    far = [(x + 5.0, y + 5.0) for x, y in clip1]
    res2 = polygon_boolean([clip0], [far], 1)
    assert len(res2) == 2
    assert all(poly_orientation(r) for r in res2)
    assert polygons_area(res2) == pytest.approx(32.0)


def test_intersection():
    res = polygon_boolean([_sq(2, 2, 6, 6)], [_sq(4, 4, 8, 8)], "intersection")
    assert len(res) == 1 and poly_orientation(res[0])
    assert polygons_area(res) == pytest.approx(4.0)
    # disjoint -> empty
    assert polygon_boolean([_sq(2, 2, 6, 6)], [_sq(9, 9, 13, 13)], 0) == []


def test_subtract_figure_eight_donut():
    """test.cpp ClipperSubtractPoly: background ∩ the self-touching
    figure-eight 'donut' ring — even-odd fill dissolves the doubled pinch
    edge into a clean outer ring + hole (Clipper orientation: outer CCW,
    hole CW); even-odd area must match an independent parity-sampling
    estimate of the same ring."""
    background = _sq(0, 0, 10, 10)
    donut = [(2.0, 2.0), (2.0, 6.0), (6.0, 6.0), (6.0, 2.0), (4.0, 2.0),
             (4.0, 3.0), (5.0, 3.0), (5.0, 5.0), (3.0, 5.0), (3.0, 3.0),
             (4.0, 3.0), (4.0, 2.0)]
    res = polygon_boolean([background], [donut], 0)
    assert len(res) == 2
    areas = sorted(ring_signed_area(r) for r in res)
    assert areas[1] == pytest.approx(16.0)   # outer CCW
    assert areas[0] == pytest.approx(-4.0)   # hole CW
    assert polygons_area(res) == pytest.approx(12.0)
    edges = _edges(_scale_rings([donut]))
    xs = np.arange(0.05, 10, 0.1)
    hits = sum(_parity(px * 100000, py * 100000, edges)
               for px in xs for py in xs)
    assert hits * 0.1 * 0.1 == pytest.approx(12.0, abs=0.2)


def test_difference_makes_hole():
    """Ground − footprint: the hole-aware ground shape (reference
    GroundDonut intent, test.cpp:26-76)."""
    res = polygon_boolean([_sq(0, 0, 10, 10)], [_sq(2, 2, 6, 6)], "difference")
    assert len(res) == 2
    areas = sorted(ring_signed_area(r) for r in res)
    assert areas == [pytest.approx(-16.0), pytest.approx(100.0)]
    assert polygons_area(res) == pytest.approx(84.0)


def test_xor():
    res = polygon_boolean([_sq(2, 2, 6, 6)], [_sq(4, 4, 8, 8)], "xor")
    assert polygons_area(res) == pytest.approx(24.0)


def test_overlay_fp_matches_constructive_kernel(spark):
    """The relational Green's-theorem intersection area (engine-only,
    oracle-parity path) and the constructive numpy kernel are independent
    implementations — they must agree on every fixture building × zone
    pair."""
    from geoutils_spark.operators.overlay import (overlay_intersection_fp,
                                                  polygon_pair_candidates,
                                                  xy_ring_col)
    from geoutils_spark.sources import fixtures

    bld = fixtures.polygons_df(spark).filter(F.col("kind") == "building") \
        .select("way_id", F.col("ring").alias("ring_ll"),
                xy_ring_col(F.col("ring")).alias("ring_a"), "bbox")
    zones = fixtures.zones_df(spark).select(
        "zone_id", F.col("ring").alias("zring_ll"),
        xy_ring_col(F.col("ring")).alias("ring_b"), "bbox")
    pairs = polygon_pair_candidates(bld, zones, level=12)
    got = {(r.way_id, r.zone_id): r.inter_fp
           for r in overlay_intersection_fp(
               pairs, ["way_id", "zone_id"]).collect()}
    assert got
    raw = pairs.select("way_id", "zone_id", "ring_ll", "zring_ll").collect()
    assert len(raw) == len(got)
    n_pos = 0
    for r in raw:
        a = [(p.lon, p.lat) for p in r.ring_ll]
        b = [(p.lon, p.lat) for p in r.zring_ll]
        want = polygons_area(polygon_boolean([a], [b], "intersection"))
        have = got[(r.way_id, r.zone_id)] / 2.0e12
        # kernel snaps to the 1e-5 int grid -> area error up to
        # ~ perimeter (≈3e-3 deg) * half-grid (5e-6 deg) ≈ 1.5e-8
        assert have == pytest.approx(want, abs=5e-8), (r.way_id, r.zone_id)
        n_pos += want > 0
    assert n_pos >= 10  # the fixture genuinely overlaps


def test_pair_candidates_cover_all_overlaps(spark):
    """Cover-cell pairing is a superset of true bbox overlaps (overlapping
    bboxes always share a cover cell)."""
    from geoutils_spark.operators.overlay import polygon_pair_candidates
    from geoutils_spark.sources import fixtures

    bld = fixtures.polygons_df(spark).filter(F.col("kind") == "building") \
        .select("way_id", "bbox")
    zones = fixtures.zones_df(spark).select("zone_id", "bbox")
    got = {(r.way_id, r.zone_id)
           for r in polygon_pair_candidates(bld, zones, level=12).collect()}
    bb = {r.way_id: r.bbox for r in bld.collect()}
    zb = {r.zone_id: r.bbox for r in zones.collect()}
    want = {(w, z) for w, a in bb.items() for z, b in zb.items()
            if a.minx <= b.maxx and a.maxx >= b.minx
            and a.miny <= b.maxy and a.maxy >= b.miny}
    assert got == want

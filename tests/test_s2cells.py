"""TRUE S2 backend vs the reference's pinned real-S2 goldens
(/root/reference/test.py:80-83) and cross-backend parity."""

import numpy as np
from pyspark.sql import functions as F

from geoutils_spark.functions import s2cells as S2


def _reference_node_set():
    """Replicate the coordinate math of the reference's test-file generator
    (/root/reference/create_test_osm_file.py:140-205, including its
    extents[2] lon-origin quirk) for extents/space pinned at
    /root/reference/test.py:39-52."""
    extents = [-0.085415, 51.522852, -0.076432, 51.528441]
    space = 0.0002
    lons, lats = [], []
    yidx = 0
    while not (yidx * space * 2 > extents[3] - extents[1]):
        xidx = 0
        while not (xidx * space * 2 > extents[2] - extents[0]):
            sw = (extents[1] + space * yidx * 2, extents[2] + space * xidx * 2)
            ne = (sw[0] + space, sw[1] + space)
            road = (ne[0] + space * 0.5, ne[1] + space * 0.5)
            for la, lo in (road, (ne[0], ne[1]), (ne[0], sw[1]),
                           (sw[0], sw[1]), (sw[0], ne[1])):
                lats.append(la)
                lons.append(lo)
            xidx += 1
        yidx += 1
    return np.array(lons), np.array(lats)


def test_pinned_reference_golden_cells():
    """The level-12 cover of the reference's London grid must be EXACTLY the
    two real-S2 ids its test pins as filenames (test.py:80-83)."""
    lons, lats = _reference_node_set()
    cells = S2.s2_cell_np(lons, lats, 12)
    assert sorted(set(S2.s2_to_hex_np(cells))) == [
        "48761cb000000000", "48761cd000000000"]


def test_catalyst_matches_numpy(spark):
    """Column backend == numpy backend, including southern/western faces and
    high latitudes (no Mercator domain hole)."""
    rng = np.random.RandomState(7)
    lons = np.concatenate([rng.uniform(-180, 180, 500), [-0.08, 120.0, -120.0]])
    lats = np.concatenate([rng.uniform(-89.9, 89.9, 500), [51.5, -88.0, 88.0]])
    import pandas as pd
    pdf = pd.DataFrame({"pid": np.arange(len(lons)), "lon": lons, "lat": lats})
    df = spark.createDataFrame(pdf)
    for level in (2, 12, 30):
        got = (S2.with_s2_cell(df, "lon", "lat", level, "c")
               .select("pid", "c").toPandas().sort_values("pid"))
        want = S2.s2_cell_np(lons, lats, level)
        np.testing.assert_array_equal(got.c.to_numpy(), want)


def test_udf_backend_matches(spark):
    lons = np.array([-0.08, 10.0, -120.0])
    lats = np.array([51.5, -45.0, 80.0])
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame({"lon": lons, "lat": lats}))
    got = df.select(S2.make_s2_cell_udf(12)("lon", "lat").alias("c")).toPandas()
    np.testing.assert_array_equal(got.c.to_numpy(), S2.s2_cell_np(lons, lats, 12))


def test_center_roundtrip():
    """center(cell) re-encodes to the same cell at the same level."""
    rng = np.random.RandomState(3)
    lons = rng.uniform(-180, 180, 200)
    lats = rng.uniform(-89, 89, 200)
    for level in (4, 12, 20):
        cells = S2.s2_cell_np(lons, lats, level)
        clon, clat = S2.s2_center_np(cells)
        again = S2.s2_cell_np(clon, clat, level)
        np.testing.assert_array_equal(again, cells)


def test_parent_level_hex_invariants():
    lons = np.array([-0.08, 100.0, -60.0])
    lats = np.array([51.5, -30.0, 10.0])
    c12 = S2.s2_cell_np(lons, lats, 12)
    assert list(S2.s2_level_np(c12)) == [12, 12, 12]
    c8 = S2.s2_parent_np(c12, 8)
    assert list(S2.s2_level_np(c8)) == [8, 8, 8]
    # parent range contains the child (descendant interval algebra)
    lsb8 = c8 & -c8
    assert ((c12 >= c8 - lsb8 + 1) & (c12 <= c8 + lsb8 - 1)).all()
    # hex roundtrip
    for c, h in zip(c12, S2.s2_to_hex_np(c12)):
        assert int(h, 16) == np.uint64(c)


# -- property-based invariants (numpy backend; mirrors test_cells.py) --------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        lon=st.floats(-180.0, 180.0, allow_nan=False),
        lat=st.floats(-89.999, 89.999, allow_nan=False),
        level=st.integers(1, 30),
    )
    def test_prop_center_roundtrip_and_parent(lon, lat, level):
        c = S2.s2_cell_np([lon], [lat], level)
        # level recovered from trailing bits
        assert int(S2.s2_level_np(c)[0]) == level
        # center re-encodes to the same cell
        clon, clat = S2.s2_center_np(c)
        assert int(S2.s2_cell_np(clon, clat, level)[0]) == int(c[0])
        # parent containment interval (S2's descendant-range algebra)
        if level > 1:
            p = S2.s2_parent_np(c, level - 1)
            lsb = int(p[0]) & -int(p[0])
            assert p[0] - lsb + 1 <= c[0] <= p[0] + lsb - 1
            assert int(S2.s2_level_np(p)[0]) == level - 1

    @settings(max_examples=200, deadline=None)
    @given(
        lon=st.floats(-180.0, 180.0, allow_nan=False),
        lat=st.floats(-89.999, 89.999, allow_nan=False),
    )
    def test_prop_hex_roundtrip_and_validity(lon, lat):
        c = int(S2.s2_cell_np([lon], [lat], 12)[0])
        h = S2.s2_to_hex_np([c])[0]
        assert len(h) == 16 and int(h, 16) == c % (1 << 64)
        # valid S2 id: face in 0..5, lsb at an even bit position
        face = (c >> 61) & 7
        assert face <= 5
        lsb = c & -c
        assert (lsb.bit_length() - 1) % 2 == 0
except ImportError:  # pragma: no cover
    pass


def test_corners_bound_center_and_members():
    """Corners form a quad that contains the cell's center and all its
    member points (in st-space exactness: re-encoding each corner nudged
    inward lands back in the same cell)."""
    rng = np.random.RandomState(5)
    lons = rng.uniform(-179, 179, 50)
    lats = rng.uniform(-85, 85, 50)
    level = 10
    cells = S2.s2_cell_np(lons, lats, level)
    corners = S2.s2_corners_np(cells)
    clon, clat = S2.s2_center_np(cells)
    for k in range(50):
        quad = [(float(corners[c][0][k]), float(corners[c][1][k]))
                for c in range(4)]
        # center strictly inside the corner quad's bbox (same-face cells)
        los = [p[0] for p in quad]
        las = [p[1] for p in quad]
        if max(los) - min(los) < 180:  # skip antimeridian-wrapping quads
            assert min(los) <= clon[k] <= max(los)
            assert min(las) <= clat[k] <= max(las)
        # corner midpoint with center re-encodes into the same cell
        mlon = (quad[0][0] + clon[k]) / 2
        mlat = (quad[0][1] + clat[k]) / 2
        if max(los) - min(los) < 180:
            assert int(S2.s2_cell_np([mlon], [mlat], level)[0]) == int(cells[k])

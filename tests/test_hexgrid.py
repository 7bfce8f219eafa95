"""Hex-grid index (functions/hexgrid.py): pack/unpack inverse,
center round-trip, neighbor adjacency, parent consistency, and pinned
goldens — the lattice edges the sf0.01 oracle twins can't pin alone."""

import pandas as pd
from pyspark.sql import functions as F

from geoutils_spark.functions import hexgrid as H


def _points(spark, n=500):
    from geoutils_spark.functions import keys as K

    return spark.range(n).select(
        F.col("id"),
        K.key_lon_col(F.col("id")).alias("lon"),
        K.key_lat_col(F.col("id")).alias("lat"))


def test_pack_unpack_inverse(spark):
    df = _points(spark)
    for res in (0, 7, 22, H.MAX_RES):
        q, r = H.hex_qr_col(F.col("lon"), F.col("lat"), res)
        d = df.select(q.alias("q0"), r.alias("r0"),
                      H.hex_pack_col(q, r, res).alias("h"))
        uq, ur, ures = H.hex_unpack_col(F.col("h"))
        out = d.select((uq == F.col("q0")).alias("a"),
                       (ur == F.col("r0")).alias("b"),
                       (ures == F.lit(res)).alias("c")).toPandas()
        assert out.all().all(), res


def test_center_round_trips_to_same_hex(spark):
    """Every occupied hex's center re-assigns to that hex (the center
    is the one point guaranteed far from every boundary)."""
    df = _points(spark, 2000)
    res = 20
    d = H.with_hex_cell(df, res)
    clon, clat = H.hex_center_col(F.col("hex_q"), F.col("hex_r"), res)
    d = d.select("hex_q", "hex_r",
                 clon.alias("clon"), clat.alias("clat")).distinct()
    q2, r2 = H.hex_qr_col(F.col("clon"), F.col("clat"), res)
    out = d.select((q2 == F.col("hex_q")).alias("a"),
                   (r2 == F.col("hex_r")).alias("b")).toPandas()
    assert len(out) > 20
    assert out.all().all()


def test_neighbors_are_distance_one(spark):
    df = _points(spark, 200)
    res = 18
    d = H.with_hex_cell(df, res).select("hex_q", "hex_r").distinct()
    d = d.withColumn(
        "nbrs", H.hex_neighbors_col(F.col("hex_q"), F.col("hex_r"), res))
    d = d.select("hex_q", "hex_r", F.explode("nbrs").alias("nb"))
    nq, nr, nres = H.hex_unpack_col(F.col("nb"))
    out = d.select(
        H.hex_distance_col(F.col("hex_q"), F.col("hex_r"), nq, nr)
        .alias("dist"), nres.alias("nres")).toPandas()
    assert (out["dist"] == 1).all()
    assert (out["nres"] == res).all()
    # 6 distinct neighbors per hex
    assert len(out) % 6 == 0


def test_every_point_in_hex_containing_it(spark):
    """Assignment is total and a point is never closer (in plane
    distance) to a neighbor's center than to its own hex center."""
    from geoutils_spark.functions import cells as C

    df = _points(spark, 800)
    res = 19
    d = H.with_hex_cell(df, res)
    x = C.lon_to_unit_col(F.col("lon"))
    y = C.lat_to_unit_col(F.col("lat"))
    cx, cy = H.hex_center_unit_col(F.col("hex_q"), F.col("hex_r"), res)
    own = (x - cx) ** 2 + (y - cy) ** 2
    checks = []
    for dq, dr in H.NEIGHBOR_OFFSETS:
        nx, ny = H.hex_center_unit_col(
            F.col("hex_q") + F.lit(dq), F.col("hex_r") + F.lit(dr), res)
        checks.append(((x - nx) ** 2 + (y - ny) ** 2 + F.lit(1e-18) >= own)
                      .alias(f"c{dq}_{dr}"))
    out = d.select(*checks).toPandas()
    assert out.all().all()


def test_parent_consistent_with_center_assignment(spark):
    """hex_parent tracks direct assignment of the child CENTER at the
    parent res. The two run the same cube-round but the direct path
    round-trips the center through lon/lat (inverse+forward Mercator),
    so on lattice-exact parent boundaries a last-ulp flip is possible —
    the invariant is near-total agreement and never more than one
    parent-hex apart, not bitwise equality."""
    df = _points(spark, 1000)
    res, pres = 22, 20
    d = H.with_hex_cell(df, res).select("hex_q", "hex_r").distinct()
    pq, pr = H.hex_parent_col(F.col("hex_q"), F.col("hex_r"), res, pres)
    clon, clat = H.hex_center_col(F.col("hex_q"), F.col("hex_r"), res)
    d2 = d.select(pq.alias("pq"), pr.alias("pr"),
                  clon.alias("clon"), clat.alias("clat"))
    dq, dr = H.hex_qr_col(F.col("clon"), F.col("clat"), pres)
    out = d2.select(
        H.hex_distance_col(dq, dr, F.col("pq"), F.col("pr")).alias("d")
    ).toPandas()
    assert (out["d"] <= 1).all()
    assert (out["d"] == 0).mean() > 0.95


def test_parent_is_near_child(spark):
    """Center-reassignment parents sit within one parent-hex step of
    the child's own coarse assignment (sanity bound on the rollup)."""
    df = _points(spark, 500)
    d = H.with_hex_cell(df, 22)
    pq, pr = H.hex_parent_col(F.col("hex_q"), F.col("hex_r"), 22, 20)
    dq, dr = H.hex_qr_col(F.col("lon"), F.col("lat"), 20)
    out = d.select(H.hex_distance_col(pq, pr, dq, dr).alias("d")).toPandas()
    assert (out["d"] <= 1).all()
    # and mostly identical (boundary children may differ by one)
    assert (out["d"] == 0).mean() > 0.9


def test_pinned_goldens(spark):
    """Scheme stability: fixed (lon, lat, res) -> (q, r, id). A change
    here is a breaking re-index, like the cells.py goldens."""
    rows = [(0.0, 0.0, 10), (-0.08, 51.525, 16), (139.7, 35.68, 12),
            (-73.99, 40.73, 14), (151.2, -33.87, 8)]
    df = spark.createDataFrame(rows, "lon double, lat double, res int")
    got = []
    for lon, lat, res in rows:
        one = df.filter((F.col("lon") == lon) & (F.col("res") == res))
        q, r = H.hex_qr_col(F.col("lon"), F.col("lat"), res)
        got.append(tuple(one.select(
            q, r, H.hex_col(F.col("lon"), F.col("lat"), res)
        ).collect()[0]))
    assert got == [
        (341, 125, 720576123452260602),
        (21836, 1661, 1152933227720084730),
        (2425, -281, 864692430367097393),
        (3216, 1948, 1008808043107847992),
        (157, 10, 576460836592156692),
    ], got


def test_distance_metric_axioms(spark):
    df = _points(spark, 300)
    d = H.with_hex_cell(df, 20).select("hex_q", "hex_r")
    a = d.limit(60).toPandas()
    import itertools

    def dist(q1, r1, q2, r2):
        dq, dr = q1 - q2, r1 - r2
        return (abs(dq) + abs(dr) + abs(dq + dr)) // 2

    pts = list(a.itertuples(index=False))[:12]
    for p1, p2, p3 in itertools.combinations(pts, 3):
        d12 = dist(p1.hex_q, p1.hex_r, p2.hex_q, p2.hex_r)
        d23 = dist(p2.hex_q, p2.hex_r, p3.hex_q, p3.hex_r)
        d13 = dist(p1.hex_q, p1.hex_r, p3.hex_q, p3.hex_r)
        assert d13 <= d12 + d23
        assert d12 == dist(p2.hex_q, p2.hex_r, p1.hex_q, p1.hex_r)


def test_res_bounds_raise(spark):
    import pytest

    with pytest.raises(ValueError):
        H.hex_col(F.lit(0.0), F.lit(0.0), H.MAX_RES + 1)
    with pytest.raises(ValueError):
        H.hex_parent_col(F.lit(0), F.lit(0), 10, 10)

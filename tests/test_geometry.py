import pytest
from pyspark.sql import functions as F

from geoutils_spark.functions import geometry as G
from geoutils_spark.functions import osmtags as OT
from geoutils_spark.operators.extrude import extrude_polygons
from geoutils_spark.operators.zonal import rasterize, zonal_stats
from geoutils_spark.sources import fixtures


@pytest.fixture(scope="module")
def rings(spark):
    ccw = [(0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (0.0, 1.0), (0.0, 0.0)]
    cw = list(reversed(ccw))
    rows = [
        (0, [{"lon": x, "lat": y} for x, y in ccw]),
        (1, [{"lon": x, "lat": y} for x, y in cw]),
    ]
    return spark.createDataFrame(
        rows, "way_id long, ring array<struct<lon:double,lat:double>>")


def test_signed_area_and_winding(rings):
    out = {r.way_id: r for r in rings.select(
        "way_id",
        G.signed_area_col(F.col("ring")).alias("area"),
        G.is_ccw_col(F.col("ring")).alias("ccw"),
        G.perimeter_deg_col(F.col("ring")).alias("perim"),
    ).collect()}
    assert out[0].area == pytest.approx(2.0)
    assert out[1].area == pytest.approx(-2.0)
    assert out[0].ccw is True and out[1].ccw is False
    assert out[0].perim == pytest.approx(6.0)


def test_oriented_ring_normalizes_cw(rings):
    out = rings.select(
        "way_id", G.signed_area_col(G.oriented_ring_col(F.col("ring"))).alias("a")
    ).collect()
    for r in out:
        assert r.a == pytest.approx(2.0)  # both now CCW


def test_centroid(rings):
    cx, cy = G.ring_centroid_col(F.col("ring"))
    r = rings.filter(F.col("way_id") == 0).select(cx.alias("x"), cy.alias("y")).collect()[0]
    assert (r.x, r.y) == (pytest.approx(1.0), pytest.approx(0.5))


def test_extrude_mesh_layout(rings):
    df = rings.withColumn("height", F.lit(10.0))
    out = {r.way_id: r for r in extrude_polygons(df, "height").collect()}
    for wid, m in out.items():
        assert m.n_vertices == 8
        assert m.n_faces == 12          # 2*(4-2) caps + 2*4 sides
        assert len(m.vx) == 8 and len(m.faces) == 12
        assert sum(m.vz) == pytest.approx(4 * 10.0)
        # all face indices valid
        assert all(0 <= i < 8 for f in m.faces for i in f)


def test_extrude_drops_degenerate(spark):
    deg = spark.createDataFrame(
        [(9, [{"lon": 0.0, "lat": 0.0}, {"lon": 1.0, "lat": 1.0}, {"lon": 0.0, "lat": 0.0}], 5.0)],
        "way_id long, ring array<struct<lon:double,lat:double>>, height double")
    assert extrude_polygons(deg, "height").count() == 0


def test_extrude_fixture_mesh_count(spark):
    """Reference golden analog: numMeshes == numBuildings
    (/root/reference/test.py:85-100 counts buildings+highways+ground; our
    extrusion covers the building prisms)."""
    polys = fixtures.polygons_df(spark).filter(F.col("kind") == "building")
    polys = polys.withColumn("height", OT.height_col(F.col("tags")))
    assert extrude_polygons(polys, "height").count() == 18


def test_rasterize_and_zonal(spark):
    pts = spark.createDataFrame(
        [(i, 0.05 + 0.1 * (i % 3), 0.05) for i in range(30)],
        "pid long, lon double, lat double")
    r = rasterize(pts, level=12)
    assert r.agg(F.sum("n_points")).collect()[0][0] == 30
    polys = spark.createDataFrame(
        [(0, [{"lon": 0.0, "lat": 0.0}, {"lon": 0.2, "lat": 0.0},
              {"lon": 0.2, "lat": 0.1}, {"lon": 0.0, "lat": 0.1},
              {"lon": 0.0, "lat": 0.0}],
          {"minx": 0.0, "miny": 0.0, "maxx": 0.2, "maxy": 0.1})],
        "way_id long, ring array<struct<lon:double,lat:double>>, "
        "bbox struct<minx:double,miny:double,maxx:double,maxy:double>")
    z = zonal_stats(pts, polys, level=12).collect()
    assert len(z) == 1
    # cell-granular semantics: level-12 cells are ~0.088 deg wide, so the
    # covering range of bbox [0, 0.2] ends in the same cell that contains
    # lon=0.25 -> all 30 points contribute (exact-PIP zonal would give 20)
    assert z[0].n_points == 30
    assert z[0].n_cells == 3

    z15 = zonal_stats(pts, polys, level=15).collect()
    # at level 15 (~0.011 deg) the 0.25 column falls outside the cover
    assert z15[0].n_points == 20


def test_clean_ring(spark):
    """G6 polygon cleaning: duplicate + collinear vertices removed; tiny
    jitter below tol removed; clean rings unchanged (reference Clipper
    CleanPolygon semantics, utils.cpp:160-165)."""
    from pyspark.sql import functions as F

    from geoutils_spark.functions.geometry import with_clean_ring

    def ring(pts):
        return [{"lon": float(x), "lat": float(y)} for x, y in pts]

    rows = [
        # duplicate consecutive vertex + collinear midpoint on bottom edge
        (1, ring([(0, 0), (0.5, 0), (1, 0), (1, 0), (1, 1), (0, 1), (0, 0)])),
        # already clean square
        (2, ring([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)])),
        # degenerate: collapses under tol
        (3, ring([(0, 0), (1e-12, 0), (0, 1e-12), (0, 0)])),
    ]
    df = spark.createDataFrame(
        rows, "way_id long, ring array<struct<lon:double,lat:double>>")
    got = {r.way_id: r.clean_ring
           for r in with_clean_ring(df, "ring", tol=1e-9).collect()}
    assert [(p.lon, p.lat) for p in got[1]] == [
        (0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]
    assert [(p.lon, p.lat) for p in got[2]] == [
        (0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]
    assert got[3] == []


def test_obj_export_sink(spark, tmp_path):
    """S8: extrude -> OBJ text export; re-parse the files and check vertex/
    face counts and index rebasing (reference assimp export semantics,
    assimpwriter.cpp:193-234, format reduced to the dependency-free OBJ)."""
    from geoutils_spark.operators.extrude import extrude_polygons
    from geoutils_spark.sources import fixtures
    from geoutils_spark.sources.sinks import write_obj_meshes

    polys = fixtures.polygons_df(spark).filter("kind = 'building'") \
        .withColumn("height", F.lit(30.0))
    meshes = extrude_polygons(polys, "height")
    out = str(tmp_path / "obj")
    write_obj_meshes(meshes, out)
    import glob
    files = glob.glob(out + "/*.obj")
    assert files
    n_v = n_f = n_o = 0
    max_index = 0
    for p in files:
        for line in open(p):
            if line.startswith("v "):
                n_v += 1
            elif line.startswith("f "):
                n_f += 1
                max_index = max(max_index, *[int(t) for t in line.split()[1:]])
            elif line.startswith("o "):
                n_o += 1
    stats = meshes.agg(F.sum("n_vertices").alias("v"), F.sum("n_faces").alias("f"),
                       F.count("*").alias("o")).collect()[0]
    assert (n_v, n_f, n_o) == (stats.v, stats.f, stats.o)
    assert max_index == n_v  # 1-based indices rebased per file, all in range


def test_gltf_export_sink(spark, tmp_path):
    """S8 glTF flavor: valid glTF 2.0 JSON, one mesh node per way, buffer
    round-trip (decode base64 -> float32 positions / uint32 indices match
    the mesh rows)."""
    import base64
    import json
    import struct as _st

    from geoutils_spark.operators.extrude import extrude_polygons
    from geoutils_spark.sources import fixtures
    from geoutils_spark.sources.sinks import write_gltf_meshes

    polys = fixtures.polygons_df(spark).filter("kind = 'building'") \
        .withColumn("height", F.lit(30.0))
    meshes = extrude_polygons(polys, "height")
    out = str(tmp_path / "gltf")
    write_gltf_meshes(meshes, out)
    import glob
    files = glob.glob(out + "/*.gltf")
    assert files
    n_meshes = 0
    total_v = total_i = 0
    for p in files:
        g = json.load(open(p))
        assert g["asset"]["version"] == "2.0"
        n_meshes += len(g["meshes"])
        uri = g["buffers"][0]["uri"]
        raw = base64.b64decode(uri.split("base64,", 1)[1])
        assert len(raw) == g["buffers"][0]["byteLength"]
        for m in g["meshes"]:
            pa = g["accessors"][m["primitives"][0]["attributes"]["POSITION"]]
            ia = g["accessors"][m["primitives"][0]["indices"]]
            total_v += pa["count"]
            total_i += ia["count"]
            # indices in range of the mesh's own vertex count
            iv = g["bufferViews"][ia["bufferView"]]
            idx = _st.unpack(f"<{ia['count']}I",
                             raw[iv["byteOffset"]:iv["byteOffset"] + iv["byteLength"]])
            assert max(idx) < pa["count"]
    stats = meshes.agg(F.sum("n_vertices").alias("v"),
                       F.sum("n_faces").alias("f"),
                       F.count("*").alias("m")).collect()[0]
    assert n_meshes == stats.m
    assert total_v == stats.v and total_i == 3 * stats.f


def test_dae_export_sink(spark, tmp_path):
    """S8 Collada flavor: valid 1.4.1 XML, one geometry + scene node per
    way, float_array positions round-trip, triangle indices in range and
    counted after fan-triangulation (assimpwriter.cpp:16-28 dae target)."""
    import xml.etree.ElementTree as ET

    from geoutils_spark.operators.extrude import extrude_polygons
    from geoutils_spark.sources import fixtures
    from geoutils_spark.sources.sinks import write_dae_meshes

    polys = fixtures.polygons_df(spark).filter("kind = 'building'") \
        .withColumn("height", F.lit(30.0))
    meshes = extrude_polygons(polys, "height")
    out = str(tmp_path / "dae")
    write_dae_meshes(meshes, out)
    import glob
    files = glob.glob(out + "/*.dae")
    assert files
    NS = "{http://www.collada.org/2005/11/COLLADASchema}"
    n_geoms = n_nodes = total_v = total_t = 0
    for p in files:
        root = ET.parse(p).getroot()
        assert root.get("version") == "1.4.1"
        for geom in root.iter(f"{NS}geometry"):
            n_geoms += 1
            arr = geom.find(f".//{NS}float_array")
            vals = [float(t) for t in arr.text.split()]
            assert len(vals) == int(arr.get("count")) and len(vals) % 3 == 0
            nv = len(vals) // 3
            total_v += nv
            tris = geom.find(f".//{NS}triangles")
            idx = [int(t) for t in tris.find(f"{NS}p").text.split()]
            assert len(idx) == 3 * int(tris.get("count"))
            assert max(idx) < nv and min(idx) >= 0
            total_t += int(tris.get("count"))
        n_nodes += sum(1 for _ in root.iter(f"{NS}node"))
    stats = meshes.select(
        F.sum("n_vertices").alias("v"), F.count("*").alias("m"),
        F.sum(F.aggregate("faces", F.lit(0),
                          lambda acc, fc: acc + F.size(fc) - 2)).alias("t"),
    ).collect()[0]
    assert n_geoms == stats.m and n_nodes == stats.m
    assert total_v == stats.v and total_t == stats.t


def test_convex_hull_properties(spark):
    """Hull invariants on random point clouds: hull vertices are input
    points, every input point lies inside/on the hull (cross-product
    test on the CCW boundary), and the hull is strictly convex; plus the
    two-level hull-of-hulls decomposition equals the direct hull (the
    scale path in hull.py's docstring)."""
    import numpy as np

    from geoutils_spark.operators.hull import hull_np

    rng = np.random.RandomState(42)
    for trial in range(20):
        pts = rng.rand(rng.randint(3, 60), 2) * 10
        h = hull_np(pts)
        # hull vertices come from the input set
        for v in h:
            assert (np.isclose(pts, v).all(axis=1)).any()
        # CCW + all points inside/on: cross(edge, p - a) >= 0
        n = len(h)
        for i in range(n):
            a, b = h[i], h[(i + 1) % n]
            e = b - a
            crosses = e[0] * (pts[:, 1] - a[1]) - e[1] * (pts[:, 0] - a[0])
            assert (crosses >= -1e-9).all(), (trial, i)
        # strict convexity at every hull vertex
        for i in range(n):
            o, a, b = h[i - 1], h[i], h[(i + 1) % n]
            assert ((a[0] - o[0]) * (b[1] - o[1])
                    - (a[1] - o[1]) * (b[0] - o[0])) > 0
        # hull-of-hulls == direct hull
        mid = len(pts) // 2
        if mid >= 3 and len(pts) - mid >= 3:
            merged = np.vstack([hull_np(pts[:mid]), hull_np(pts[mid:])])
            assert np.array_equal(hull_np(merged), h)

"""Per-vertex normals + UV sets through the mesh tier (r3 VERDICT #3/#4/#7):
extrude attribute layout vs the reference's extrude2dMesh
(/root/reference/osm2assimp/geometry.cpp:310-415), ribbon rail-distance UVs
(geometry.cpp:154-208), OBJ/glTF/DAE export, y-up axis swizzle
(geometry.cpp:50-65), NED/Mercator scene projections (convertlatlng.cpp),
and the -f fixed-height override (main.cpp:81-83)."""

import glob
import json
import math

import numpy as np
from pyspark.sql import functions as F

from geoutils_spark.operators.extrude import extrude_polygons
from geoutils_spark.operators.ribbon import ribbon_polylines
from geoutils_spark.operators.scene import (consolidate_meshes,
                                            project_scene_nodes,
                                            swizzle_y_up)


def _square(spark, way_id=7, h=2.0):
    ring = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]
    return spark.createDataFrame(
        [(way_id, [{"lon": x, "lat": y} for x, y in ring], h)],
        "way_id long, ring array<struct<lon:double,lat:double>>, height double")


def test_extrude_attribute_layout(spark):
    """Reference layout: 6k vertices (base/top rings + 4 per side quad),
    k+2 faces; pinned-golden flat outward normal for the known south face
    of a unit square; reference UV rounding rule."""
    m = extrude_polygons(_square(spark), "height", with_attributes=True,
                         uv_scale=0.5).collect()[0]
    k = 4
    assert m["n_vertices"] == 6 * k and len(m["vx"]) == 6 * k
    assert m["n_faces"] == k + 2 and len(m["faces"]) == k + 2
    # attribute arrays are per-vertex 1:1
    for c in ("nx", "ny", "nz", "tu", "tv", "tw"):
        assert len(m[c]) == 6 * k, c
    # caps: base ring -up, top ring +up
    assert m["nz"][:k] == [-1.0] * k and m["nz"][k:2 * k] == [1.0] * k
    # PINNED GOLDEN: side quad 0 is the edge (0,0)->(1,0) of the CCW
    # square; its flat outward normal is (0,-1,0) on all four vertices
    for j in range(4):
        v = 2 * k + j
        assert (m["nx"][v], m["ny"][v], m["nz"][v]) == (0.0, -1.0, 0.0)
    # reference UV rule: U=round(width/scale)=2, V=round(height/scale)=4,
    # corner order (U,V)(0,V)(0,0)(U,0); w = featureId; caps zero
    assert m["tu"][2 * k:2 * k + 4] == [2.0, 0.0, 0.0, 2.0]
    assert m["tv"][2 * k:2 * k + 4] == [4.0, 4.0, 0.0, 0.0]
    assert m["tw"][2 * k] == 7.0 and m["tw"][0] == 0.0
    # faces: reversed base n-gon, top n-gon, then quads
    assert m["faces"][0] == [3, 2, 1, 0]
    assert m["faces"][1] == [4, 5, 6, 7]
    assert m["faces"][2] == [8, 9, 10, 11]
    # side quad winding agrees with its stored normal (CCW around it)
    c = [(m["vx"][i], m["vy"][i], m["vz"][i]) for i in m["faces"][2]]
    v1 = np.subtract(c[1], c[0])
    v2 = np.subtract(c[2], c[0])
    n = np.cross(v1, v2)
    n = n / np.linalg.norm(n)
    assert np.allclose(n, [0.0, -1.0, 0.0])


def test_extrude_uv_scale_zero_omits_uvs(spark):
    m = extrude_polygons(_square(spark), "height",
                         with_attributes=True).collect()[0]
    assert len(m["tu"]) == len(m["tv"]) == len(m["tw"]) == 0
    assert len(m["nx"]) == m["n_vertices"]


def test_ribbon_attributes(spark):
    """Rail-distance UVs (geometry.cpp:154-208): u alternates 0/1
    left/right, v accumulates each rail's own distance / width; normals
    all +up; tw = featureId."""
    line = [{"lon": 0.0, "lat": 0.0}, {"lon": 4.0, "lat": 0.0},
            {"lon": 8.0, "lat": 0.0}]
    df = spark.createDataFrame(
        [(9, line)], "way_id long, line array<struct<lon:double,lat:double>>")
    m = ribbon_polylines(df, width=2.0, with_attributes=True).collect()[0]
    n = m["n_vertices"]
    assert len(m["nx"]) == len(m["tu"]) == n == 6
    assert m["nz"] == [1.0] * n and m["nx"] == [0.0] * n
    assert m["tu"] == [0.0, 1.0] * 3
    # straight line: both rails advance 4/2 = 2 per segment
    assert m["tv"] == [0.0, 0.0, 2.0, 2.0, 4.0, 4.0]
    assert m["tw"] == [9.0] * n


def test_obj_attribute_roundtrip(spark, tmp_path):
    """vn/vt counts == v counts, faces indexed v/vt/vn, pinned-golden vn
    line for the known prism face; UV-less meshes emit v//vn faces."""
    from geoutils_spark.sources.sinks import write_obj_meshes

    out = str(tmp_path / "obj")
    write_obj_meshes(
        extrude_polygons(_square(spark), "height", with_attributes=True,
                         uv_scale=0.5), out)
    body = open(glob.glob(out + "/*.obj")[0]).read().splitlines()
    nv = sum(1 for ln in body if ln.startswith("v "))
    nn = sum(1 for ln in body if ln.startswith("vn "))
    nt = sum(1 for ln in body if ln.startswith("vt "))
    assert nv == nn == nt == 24
    assert "vn 0.0 -1.0 0.0" in body  # pinned golden: south face normal
    faces = [ln for ln in body if ln.startswith("f ")]
    assert all(tok.count("/") == 2 for ln in faces
               for tok in ln.split()[1:])
    # v/vt/vn triplets all in range
    for ln in faces:
        for tok in ln.split()[1:]:
            a, b, c = (int(p) for p in tok.split("/"))
            assert 1 <= a <= nv and 1 <= b <= nt and 1 <= c <= nn

    out2 = str(tmp_path / "obj_nouv")
    write_obj_meshes(
        extrude_polygons(_square(spark), "height", with_attributes=True),
        out2)
    body2 = open(glob.glob(out2 + "/*.obj")[0]).read().splitlines()
    assert sum(1 for ln in body2 if ln.startswith("vt ")) == 0
    assert all("//" in tok for ln in body2 if ln.startswith("f ")
               for tok in ln.split()[1:])


def test_gltf_attribute_export(spark, tmp_path):
    """NORMAL + TEXCOORD_0 accessors present with count == vertex count;
    n-gon caps and quads fan-triangulated (mode-4 indices % 3 == 0)."""
    from geoutils_spark.sources.sinks import write_gltf_meshes

    out = str(tmp_path / "gltf")
    write_gltf_meshes(
        extrude_polygons(_square(spark), "height", with_attributes=True,
                         uv_scale=0.5), out)
    g = json.load(open(glob.glob(out + "/*.gltf")[0]))
    prim = g["meshes"][0]["primitives"][0]
    acc = g["accessors"]
    assert acc[prim["attributes"]["POSITION"]]["count"] == 24
    assert acc[prim["attributes"]["NORMAL"]]["count"] == 24
    assert acc[prim["attributes"]["NORMAL"]]["type"] == "VEC3"
    assert acc[prim["attributes"]["TEXCOORD_0"]]["count"] == 24
    assert acc[prim["attributes"]["TEXCOORD_0"]]["type"] == "VEC2"
    # two quad caps fan to 2 tris each + 4 quad sides fan to 2 each = 12
    assert acc[prim["indices"]]["count"] == 3 * 12


def test_dae_normal_source(spark, tmp_path):
    from geoutils_spark.sources.sinks import write_dae_meshes

    out = str(tmp_path / "dae")
    write_dae_meshes(
        extrude_polygons(_square(spark), "height", with_attributes=True),
        out)
    body = open(glob.glob(out + "/*.dae")[0]).read()
    assert 'semantic="NORMAL"' in body
    assert f'count="{3 * 24}"' in body  # normal float_array length


def test_swizzle_y_up(spark):
    """The reference's default y-up export: (x, y, h) -> (-x, h, y)
    (posFromLoc, geometry.cpp:50-56), normals transformed identically."""
    zup = extrude_polygons(_square(spark), "height", with_attributes=True)
    z = zup.collect()[0]
    y = swizzle_y_up(zup).collect()[0]
    assert y["vx"] == [-v for v in z["vx"]]
    assert y["vy"] == z["vz"] and y["vz"] == z["vy"]
    assert y["nx"] == [-v for v in z["nx"]]
    assert y["ny"] == z["nz"] and y["nz"] == z["ny"]


def test_project_scene_nodes_ned(spark):
    """The -a center-earth-fixed mode: ground coords == (east, north) of
    the repo's own LLA->NED kernel about the min-node-id location
    (reference cef(), convertlatlng.cpp:20-25)."""
    from geoutils_spark.functions.geodesy import lla_to_ned_np

    rows = [(1, -0.08, 51.52), (2, -0.07, 51.53), (3, -0.09, 51.51)]
    nodes = spark.createDataFrame(rows, "id long, lon double, lat double")
    got = {r["id"]: (r["lon"], r["lat"])
           for r in project_scene_nodes(nodes, mode="ned").collect()}
    lon = np.array([r[1] for r in rows])
    lat = np.array([r[2] for r in rows])
    ned = lla_to_ned_np(lon, lat, np.zeros(3), (-0.08, 51.52, 0.0))
    for (nid, _, _), row in zip(rows, ned):
        e, n = got[nid]
        assert math.isclose(e, row[1], abs_tol=1e-9)
        assert math.isclose(n, row[0], abs_tol=1e-9)
    assert got[1] == (0.0, 0.0)


def test_project_scene_nodes_mercator(spark):
    nodes = spark.createDataFrame(
        [(5, -0.08, 51.52), (6, -0.07, 51.53)],
        "id long, lon double, lat double")
    got = {r["id"]: (r["lon"], r["lat"])
           for r in project_scene_nodes(nodes, mode="mercator").collect()}
    assert got[5] == (0.0, 0.0)  # ref point maps to origin
    ex, ny = got[6]
    assert 0 < ex < 2000 and 0 < ny < 2500  # ~1.1 km east, ~1.8 km north


def test_fixed_height_override(spark):
    """Reference -f: absent height tags fall back to the override
    (main.cpp:81-83) instead of the built-in 7.5 m."""
    from geoutils_spark.functions.osmtags import height_col

    tags = spark.createDataFrame(
        [({},), ({"building:levels": "2"},), ({"height": "11.5"},)],
        "tags map<string,string>")
    rows = tags.select(height_col(F.col("tags"), default_m=42.0)
                       .alias("h")).collect()
    assert [r["h"] for r in rows] == [42.0, 5.0, 11.5]
    rows = tags.select(height_col(F.col("tags")).alias("h")).collect()
    assert rows[0]["h"] == 7.5


def test_consolidate_carries_attributes(spark):
    """Merged attribute meshes keep per-vertex 1:1 normals; mixed-UV input
    drops the UV set to preserve the invariant."""
    a = _square(spark, way_id=1)
    b = _square(spark, way_id=2)
    both = extrude_polygons(a.unionByName(b), "height",
                            with_attributes=True, uv_scale=0.5)
    merged = consolidate_meshes(both).collect()[0]
    assert merged["n_vertices"] == 48
    assert len(merged["nx"]) == len(merged["tu"]) == 48
    assert max(max(f) for f in merged["faces"]) == 47

    uv = extrude_polygons(a, "height", with_attributes=True, uv_scale=0.5)
    nouv = extrude_polygons(b, "height", with_attributes=True)
    mixed = consolidate_meshes(uv.unionByName(nouv)).collect()[0]
    assert len(mixed["nx"]) == 48 and len(mixed["tu"]) == 0


# --------------------------------------------------- round-join buffer (G2b)

def _dist_to_polyline(qx, qy, pts):
    """Min distance from (qx, qy) to any segment of pts [(x, y), ...]."""
    best = float("inf")
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        dx, dy = x1 - x0, y1 - y0
        ll = dx * dx + dy * dy
        t = 0.0 if ll == 0 else max(0.0, min(1.0, ((qx - x0) * dx + (qy - y0) * dy) / ll))
        best = min(best, math.hypot(qx - (x0 + t * dx), qy - (y0 + t * dy)))
    return best


def test_round_join_bounds_hairpin(spark):
    """The r3 'missing' item: miter-only ribbons spike at sharp angles
    where the reference's ClipperOffset variant rounds them
    (polyformspline.cpp:65-135). On a hairpin, the miter apex exceeds
    2x width from the path; every round-join outline vertex stays inside
    the width/2 envelope."""
    from geoutils_spark.operators.ribbon import (buffer_polyline_np,
                                                 ribbon_mesh_np)

    pts = [(0.0, 0.0), (10.0, 0.25), (0.0, 0.5)]  # ~177 degree hairpin
    px = np.array([p[0] for p in pts])
    py = np.array([p[1] for p in pts])
    w = 1.0

    mvx, mvy, _ = ribbon_mesh_np(px, py, w)
    miter_worst = max(_dist_to_polyline(x, y, pts) for x, y in zip(mvx, mvy))
    assert miter_worst > 2 * w  # the spike the round join exists to kill

    rvx, rvy = buffer_polyline_np(px, py, w, join="round")
    round_worst = max(_dist_to_polyline(x, y, pts) for x, y in zip(rvx, rvy))
    assert round_worst <= w / 2 + 1e-9

    # miter-mode buffer outline reproduces the spike (reference jtMiter)
    bvx, bvy = buffer_polyline_np(px, py, w, join="miter")
    assert max(_dist_to_polyline(x, y, pts)
               for x, y in zip(bvx, bvy)) > 2 * w


def test_round_buffer_area_sanity(spark):
    """Shoelace area of the outline vs the analytic buffer: exact L*w for
    a straight line (butt ends); within 2% of L*w + joint-arc slivers for
    a gentle bend (arc sampling under-covers slightly)."""
    from geoutils_spark.operators.ribbon import buffer_polyline_np

    def shoelace(vx, vy):
        return 0.5 * abs(float(
            np.dot(vx, np.roll(vy, -1)) - np.dot(np.roll(vx, -1), vy)))

    vx, vy = buffer_polyline_np(
        np.array([0.0, 7.0]), np.array([0.0, 0.0]), 2.0)
    assert math.isclose(shoelace(vx, vy), 7.0 * 2.0, rel_tol=1e-12)

    # right-angle bend, legs 5 and 5, width 2: area = (5+5)*2 + the
    # outer arc sliver (quarter-annulus pi*w^2/8=pi/2) - inner overlap w^2/4=1
    vx, vy = buffer_polyline_np(
        np.array([0.0, 5.0, 5.0]), np.array([0.0, 0.0, 5.0]), 2.0)
    analytic = 10.0 * 2.0 + math.pi / 2.0 - 1.0
    assert abs(shoelace(vx, vy) - analytic) / analytic < 0.02


def test_round_join_through_dataframe(spark):
    from geoutils_spark.operators.ribbon import ribbon_polylines

    df = spark.createDataFrame(
        [(3, [{"lon": 0.0, "lat": 0.0}, {"lon": 10.0, "lat": 0.25},
              {"lon": 0.0, "lat": 0.5}])],
        "way_id long, line array<struct<lon:double,lat:double>>")
    m = ribbon_polylines(df, width=1.0, join="round",
                         with_attributes=True).collect()[0]
    assert m["n_faces"] == 1 and m["faces"][0] == list(range(m["n_vertices"]))
    assert m["nz"] == [1.0] * m["n_vertices"] and len(m["tu"]) == 0


def test_extrude_uv_rounding_half_away_from_zero(spark):
    """r5 ADVICE (extrude.py UV rounding): the reference's C++ round()
    and the DuckDB oracle's ROUND are half-away-from-zero; numpy's
    np.round is half-to-even. A unit square with height 1.25 at
    uv_scale=0.5 puts both ratios exactly on x.5: edge 1.0/0.5 = 2.0
    (unambiguous) but height 1.25/0.5 = 2.5 -> MUST round to 3 (banker's
    gives 2); a 1.25-long edge likewise hits u = 2.5 -> 3."""
    ring = [(0.0, 0.0), (1.25, 0.0), (1.25, 1.0), (0.0, 1.0), (0.0, 0.0)]
    df = spark.createDataFrame(
        [(1, [{"lon": x, "lat": y} for x, y in ring], 1.25)],
        "way_id long, ring array<struct<lon:double,lat:double>>,"
        " height double")
    m = extrude_polygons(df, "height", with_attributes=True,
                         uv_scale=0.5).collect()[0]
    k = 4
    side_u = np.asarray(m["tu"][2 * k:]).reshape(k, 4)
    side_v = np.asarray(m["tv"][2 * k:]).reshape(k, 4)
    # v = round(1.25/0.5) = round(2.5) -> 3.0 everywhere on the tops
    assert set(side_v[:, 0]) == {3.0} and set(side_v[:, 1]) == {3.0}
    # the two 1.25-long edges: u = round(2.5) -> 3.0; unit edges -> 2.0
    us = sorted(side_u[:, 0])
    assert us == [2.0, 2.0, 3.0, 3.0], us

"""Polygon extrusion: 2D footprint ring -> 3D prism mesh (reference G1,
/root/reference/osm2assimp/geometry.cpp:232-415).

Spark-first shape: mesh synthesis is a multi-row/nested-array producer, so it
runs as ``mapInPandas`` over Arrow batches with a fully vectorized numpy
kernel (the reference itself vectorizes coordinate math through Eigen,
eigenconversion.cpp:51-61). No per-row Python loops over vertices: vertex
arrays are built with numpy repeats/concats across the whole batch.

Mesh layout per feature (k = unique footprint vertices, closed input ring of
k+1 points):

* vertices: 2k — base ring at z=0 then top ring at z=height
  (geometry.cpp:258-266 semantics)
* faces: fan-triangulated caps (2 * (k-2), geometry.cpp:449-463) + 2
  triangles per side quad (2k) -> 4k - 4 total triangles
* winding normalized before extrusion (G3) so caps face outward.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MESH_SCHEMA = T.StructType([
    T.StructField("way_id", T.LongType(), False),
    T.StructField("n_vertices", T.LongType(), False),
    T.StructField("n_faces", T.LongType(), False),
    T.StructField("vx", T.ArrayType(T.DoubleType()), False),
    T.StructField("vy", T.ArrayType(T.DoubleType()), False),
    T.StructField("vz", T.ArrayType(T.DoubleType()), False),
    T.StructField("faces", T.ArrayType(T.ArrayType(T.IntegerType())), False),
])

# MESH_SCHEMA + per-vertex attributes (reference geometry.h:56-63 carries
# vertices/normals/texcoords): nx/ny/nz unit normals, tu/tv texture
# coordinates with tw the featureId channel the reference packs into
# UV.z (assimp 3-component UV set, geometry.cpp:398-401). tu/tv/tw are
# EMPTY arrays when UVs are off (the reference's texCoordScale == 0
# "omits UV set altogether", main.cpp:112-117).
ATTR_FIELDS = ("nx", "ny", "nz", "tu", "tv", "tw")
MESH_ATTR_SCHEMA = T.StructType(
    MESH_SCHEMA.fields
    + [T.StructField(c, T.ArrayType(T.DoubleType()), False)
       for c in ATTR_FIELDS])


def _extrude_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = {k: [] for k in ("way_id", "n_vertices", "n_faces", "vx", "vy", "vz", "faces")}
    for way_id, xs, ys, h in zip(pdf["way_id"], pdf["__rx"], pdf["__ry"], pdf["__h"]):
        xs = np.asarray(xs, float)[:-1]  # drop closing duplicate
        ys = np.asarray(ys, float)[:-1]
        k = len(xs)
        if k < 3:
            continue
        # normalize winding to CCW (shoelace; reference geometry.cpp:256-315)
        area2 = float(np.dot(xs, np.roll(ys, -1)) - np.dot(np.roll(xs, -1), ys))
        if area2 < 0:
            xs, ys = xs[::-1], ys[::-1]
        vx = np.concatenate([xs, xs])
        vy = np.concatenate([ys, ys])
        vz = np.concatenate([np.zeros(k), np.full(k, float(h))])
        idx = np.arange(k, dtype=np.int32)
        # caps: fan triangulation (0, i, i+1) — geometry.cpp:449-463
        fan = np.stack([np.zeros(k - 2, np.int32), idx[1:-1], idx[2:]], axis=1)
        base = fan[:, ::-1]              # base faces wind downward
        top = fan + k                    # top faces wind upward
        # sides: quad (i, i+1, k+i+1, k+i) as two triangles
        nxt = np.roll(idx, -1)
        s1 = np.stack([idx, nxt, nxt + k], axis=1)
        s2 = np.stack([idx, nxt + k, idx + k], axis=1)
        faces = np.concatenate([base, top, s1, s2])
        out["way_id"].append(way_id)
        out["n_vertices"].append(2 * k)
        out["n_faces"].append(len(faces))
        out["vx"].append(vx)
        out["vy"].append(vy)
        out["vz"].append(vz)
        out["faces"].append([f.tolist() for f in faces])
    # explicit dtypes: an all-dropped batch must still carry object columns
    # for the array fields (empty float64 Series break Arrow list conversion)
    return pd.DataFrame({
        "way_id": pd.Series(out["way_id"], dtype="int64"),
        "n_vertices": pd.Series(out["n_vertices"], dtype="int64"),
        "n_faces": pd.Series(out["n_faces"], dtype="int64"),
        "vx": pd.Series(out["vx"], dtype=object),
        "vy": pd.Series(out["vy"], dtype=object),
        "vz": pd.Series(out["vz"], dtype=object),
        "faces": pd.Series(out["faces"], dtype=object),
    })


def _extrude_attr_batch(pdf: pd.DataFrame, uv_scale: float) -> pd.DataFrame:
    """Attribute-carrying extrusion in the REFERENCE's vertex layout
    (geometry.cpp:310-415 extrude2dMesh): base ring (normals -up) + top
    ring (normals +up) + 4 DEDICATED vertices per side quad so each side
    carries its flat outward normal and its own UV quad — 6k vertices,
    k+2 faces (two n-gon caps + k quads; sinks fan-triangulate where the
    format demands triangles). Side UVs follow the reference's rounding
    rule: U = round(edge_width / uv_scale), V = round(height / uv_scale),
    corner order (U,V)(0,V)(0,0)(U,0), w = featureId; cap UVs are zeros
    (the reference value-initializes them). uv_scale == 0 omits UVs."""
    cols = ("way_id", "n_vertices", "n_faces", "vx", "vy", "vz", "faces",
            "nx", "ny", "nz", "tu", "tv", "tw")
    out = {k: [] for k in cols}
    for way_id, xs, ys, h in zip(pdf["way_id"], pdf["__rx"], pdf["__ry"],
                                 pdf["__h"]):
        xs = np.asarray(xs, float)[:-1]
        ys = np.asarray(ys, float)[:-1]
        k = len(xs)
        if k < 3:
            continue
        area2 = float(np.dot(xs, np.roll(ys, -1)) - np.dot(np.roll(xs, -1), ys))
        if area2 < 0:
            xs, ys = xs[::-1], ys[::-1]
        h = float(h)
        xn, yn = np.roll(xs, -1), np.roll(ys, -1)   # next-vertex rings
        # side quad corners, reference order (geometry.cpp:370-375):
        # c0 = top_next, c1 = top_f, c2 = base_f, c3 = base_next
        sx = np.stack([xn, xs, xs, xn], axis=1).ravel()
        sy = np.stack([yn, ys, ys, yn], axis=1).ravel()
        sz = np.tile([h, h, 0.0, 0.0], k)
        vx = np.concatenate([xs, xs, sx])
        vy = np.concatenate([ys, ys, sy])
        vz = np.concatenate([np.zeros(k), np.full(k, h), sz])
        # flat outward side normal for a CCW ring: (dy, -dx, 0)/|edge|
        dx, dy = xn - xs, yn - ys
        el = np.hypot(dx, dy)
        el[el == 0] = 1.0
        snx = np.repeat(dy / el, 4)
        sny = np.repeat(-dx / el, 4)
        nx = np.concatenate([np.zeros(k), np.zeros(k), snx])
        ny = np.concatenate([np.zeros(k), np.zeros(k), sny])
        nz = np.concatenate([-np.ones(k), np.ones(k), np.zeros(4 * k)])
        if uv_scale != 0.0:
            # half-away-from-zero (floor(x+0.5) — args are nonnegative) to
            # match C++ round() and the DuckDB oracle's ROUND; np.round /
            # round are half-to-even and diverge on exact .5 ratios
            u = np.floor(el / uv_scale + 0.5)
            v = float(np.floor(h / uv_scale + 0.5))
            su = np.stack([u, np.zeros(k), np.zeros(k), u], axis=1).ravel()
            sv = np.tile([v, v, 0.0, 0.0], k)
            tu = np.concatenate([np.zeros(2 * k), su])
            tv = np.concatenate([np.zeros(2 * k), sv])
            tw = np.concatenate([np.zeros(2 * k),
                                 np.full(4 * k, float(way_id))])
        else:
            tu = tv = tw = np.empty(0)
        # faces: reversed base n-gon (outward down), top n-gon, k quads
        base = list(range(k - 1, -1, -1))
        top = list(range(k, 2 * k))
        quads = [[2 * k + 4 * f + j for j in range(4)] for f in range(k)]
        faces = [base, top] + quads
        out["way_id"].append(way_id)
        out["n_vertices"].append(6 * k)
        out["n_faces"].append(k + 2)
        out["vx"].append(vx)
        out["vy"].append(vy)
        out["vz"].append(vz)
        out["faces"].append(faces)
        out["nx"].append(nx)
        out["ny"].append(ny)
        out["nz"].append(nz)
        out["tu"].append(tu)
        out["tv"].append(tv)
        out["tw"].append(tw)
    return pd.DataFrame({
        "way_id": pd.Series(out["way_id"], dtype="int64"),
        "n_vertices": pd.Series(out["n_vertices"], dtype="int64"),
        "n_faces": pd.Series(out["n_faces"], dtype="int64"),
        **{c: pd.Series(out[c], dtype=object)
           for c in ("vx", "vy", "vz", "faces",
                     "nx", "ny", "nz", "tu", "tv", "tw")},
    })


def extrude_polygons(polygons: DataFrame, height_col: str = "height",
                     with_attributes: bool = False,
                     uv_scale: float = 0.0) -> DataFrame:
    """polygons(way_id, ring, <height_col>) -> prism meshes.

    Narrow map (no shuffle); Arrow-batched. Degenerate footprints (<3 unique
    vertices) are dropped, matching the reference's degenerate-mesh filter
    (P10, sceneconstruct.cpp:85-87).

    ``with_attributes=True`` switches to the reference's attribute-bearing
    vertex layout (MESH_ATTR_SCHEMA: per-vertex normals + UV set, 6k
    vertices / k+2 faces per prism — see ``_extrude_attr_batch``);
    ``uv_scale`` is the reference's ``-u`` flag (0 omits the UV set,
    main.cpp:112-117). The default layout (2k vertices, fan caps, shared
    side vertices) stays byte-stable for the count oracles.
    """
    src = polygons.select(
        "way_id",
        F.col("ring.lon").alias("__rx"),
        F.col("ring.lat").alias("__ry"),
        F.col(height_col).cast("double").alias("__h"),
    )

    if with_attributes:
        def gen_attr(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield _extrude_attr_batch(pdf, uv_scale)

        return src.mapInPandas(gen_attr, MESH_ATTR_SCHEMA)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _extrude_batch(pdf)

    return src.mapInPandas(gen, MESH_SCHEMA)

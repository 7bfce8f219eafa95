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


def extrude_polygons(polygons: DataFrame, height_col: str = "height") -> DataFrame:
    """polygons(way_id, ring, <height_col>) -> prism meshes.

    Narrow map (no shuffle); Arrow-batched. Degenerate footprints (<3 unique
    vertices) are dropped, matching the reference's degenerate-mesh filter
    (P10, sceneconstruct.cpp:85-87).
    """
    src = polygons.select(
        "way_id",
        F.col("ring.lon").alias("__rx"),
        F.col("ring.lat").alias("__ry"),
        F.col(height_col).cast("double").alias("__h"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _extrude_batch(pdf)

    return src.mapInPandas(gen, MESH_SCHEMA)

"""Ground mesh (G7): Delaunay-triangulated flat mesh per tile/scene.

Reference: osm2assimp's ground pass collects the scene's ground points,
Delaunay-triangulates them (Delaunator) and emits a flat z=0 mesh with
bbox-fraction UVs (/root/reference/osm2assimp/ground.cpp:104-158; the scene
mesh count in its test is buildings + highways + 1 ground,
/root/reference/test.py:85-100).

Spark shape: grouped triangulation via ``applyInPandas`` — each group
(tile/cell/scene) triangulates independently with the from-scratch
Bowyer–Watson kernel (functions/delaunay.py), so planet-scale ground
generation is embarrassingly parallel with bounded per-group point sets.
Output rows use the extrude mesh layout (vx/vy/vz + faces) so the OBJ sink
exports them unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoutils_spark.functions.delaunay import delaunay_np

GROUND_SCHEMA = T.StructType([
    T.StructField("group_id", T.LongType(), False),
    T.StructField("n_vertices", T.LongType(), False),
    T.StructField("n_faces", T.LongType(), False),
    T.StructField("vx", T.ArrayType(T.DoubleType()), False),
    T.StructField("vy", T.ArrayType(T.DoubleType()), False),
    T.StructField("vz", T.ArrayType(T.DoubleType()), False),
    T.StructField("u", T.ArrayType(T.DoubleType()), False),
    T.StructField("v", T.ArrayType(T.DoubleType()), False),
    T.StructField("faces", T.ArrayType(T.ArrayType(T.IntegerType())), False),
])


def ground_mesh(points: DataFrame, group: str = "group_id",
                lon: str = "lon", lat: str = "lat",
                pad: float = 0.0) -> DataFrame:
    """(group, lon, lat) points -> one flat triangulated ground mesh row
    per group. ``pad`` adds the padded-bbox corner points (the reference's
    ``extra`` margin box, ground.cpp:107-113). UVs are bbox fractions
    (ground.cpp:147 ``mBBox.fraction``)."""

    def tri(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(pdf[group].iloc[0])
        px = pdf[lon].to_numpy(float)
        py = pdf[lat].to_numpy(float)
        if pad > 0.0:
            bx = [px.min() - pad, px.min() - pad, px.max() + pad, px.max() + pad]
            by = [py.min() - pad, py.max() + pad, py.max() + pad, py.min() - pad]
            px = np.concatenate([px, bx])
            py = np.concatenate([py, by])
        tris = delaunay_np(px, py)
        if len(tris) == 0:
            return pd.DataFrame({c.name: pd.Series([], dtype=object)
                                 for c in GROUND_SCHEMA})
        used = np.unique(tris.ravel())
        remap = np.full(px.shape[0], -1, dtype=np.int64)
        remap[used] = np.arange(len(used))
        vx, vy = px[used], py[used]
        span_x = max(vx.max() - vx.min(), 1e-309)
        span_y = max(vy.max() - vy.min(), 1e-309)
        u = (vx - vx.min()) / span_x
        v = (vy - vy.min()) / span_y
        faces = remap[tris]
        return pd.DataFrame({
            "group_id": pd.Series([gid], dtype="int64"),
            "n_vertices": pd.Series([len(used)], dtype="int64"),
            "n_faces": pd.Series([len(faces)], dtype="int64"),
            "vx": pd.Series([vx], dtype=object),
            "vy": pd.Series([vy], dtype=object),
            "vz": pd.Series([np.zeros(len(used))], dtype=object),
            "u": pd.Series([u], dtype=object),
            "v": pd.Series([v], dtype=object),
            "faces": pd.Series([[f.tolist() for f in faces]], dtype=object),
        })

    return points.groupBy(group).applyInPandas(tri, GROUND_SCHEMA)

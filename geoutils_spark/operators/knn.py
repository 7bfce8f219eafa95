"""k-nearest-neighbors via cell-neighborhood candidate join.

Composition (SURVEY.md §2.5 'absent joins' note): candidates from an
equi-join on the query's neighbor-cell array (explode 3x3 ring at level L),
exact haversine (reference F6, eigenconversion.cpp:146-160), then
``row_number() over (partitionBy(query) orderBy(dist)) <= k``.

Correct iff the true k-th neighbor lies within the 3x3 ring — pick L so the
ring radius covers the expected kNN radius; ``ring`` widens the search.
At scale this is one shuffle on cell_id (candidates) + one on query_id
(top-k), both key-partitioned and AQE-coalesced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geoutils_spark.functions import cells as C
from geoutils_spark.functions.geodesy import haversine_m_col


def knn_join(queries: DataFrame, corpus: DataFrame, k: int, level: int,
             ring: int = 1,
             q_id: str = "query_id", c_id: str = "neighbor_id",
             lon: str = "lon", lat: str = "lat",
             broadcast_queries: bool = True,
             include_self: bool = False) -> DataFrame:
    """Returns (q_id, c_id, rank, dist_m), rank 1..k by haversine meters.

    ``broadcast_queries``: typical shape is few queries vs huge corpus —
    broadcast the exploded query-cell table so the corpus never shuffles.
    """
    q = C.with_tile_xy(queries, lon, lat, level, "__qx", "__qy")
    q = q.withColumn(
        "__nb", C.neighbor_cells_from_tile_col(F.col("__qx"), F.col("__qy"), level, ring)
    )
    q = q.select(
        F.col(q_id),
        F.col(lon).alias("__qlon"),
        F.col(lat).alias("__qlat"),
        F.explode("__nb").alias("cell_id"),
    )
    c = C.with_cell(corpus, lon, lat, level, "cell_id").select(
        F.col(c_id), F.col(lon).alias("__clon"), F.col(lat).alias("__clat"), "cell_id"
    )
    left = F.broadcast(q) if broadcast_queries else q
    cand = left.join(c, on="cell_id", how="inner")
    if not include_self:
        cand = cand.filter(F.col(q_id) != F.col(c_id))
    cand = cand.withColumn(
        "dist_m",
        haversine_m_col(F.col("__qlon"), F.col("__qlat"),
                        F.col("__clon"), F.col("__clat")),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("dist_m").asc(), F.col(c_id).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "rank", "dist_m")
    )

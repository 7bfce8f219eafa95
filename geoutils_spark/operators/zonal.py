"""Raster↔vector zonal statistics (SURVEY.md §7 Stage 3).

Rasterize a point table to a level-L cell grid (the reference's D×D density
histogram, A2: /root/reference/osmsplit/mapsplit.h:115-132, keyed by cell id
instead of array offset), then join the raster to polygons via covering
cells (J2/J3 pattern) and aggregate per polygon.

Scale shape: the rasterize step is a map-side-combinable hash aggregate that
shrinks the fact table from rows to occupied cells *before* the join — at
100 TB the polygon join touches only the (bounded) cell grid, never raw
points. Cell-granular semantics by design: a cell contributes to every
polygon whose bbox covers it (exact PIP zonal = spatial_join + groupBy
instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoutils_spark.functions import cells as C
from geoutils_spark.operators.spatial_join import with_covering_cells


def rasterize(points: DataFrame, level: int, lon: str = "lon", lat: str = "lat",
              value: str | None = None) -> DataFrame:
    """points -> per-cell raster: (cell_id, n_points[, sum_value, min_value,
    max_value])."""
    df = C.with_cell(points, lon, lat, level, "cell_id")
    aggs = [F.count("*").alias("n_points")]
    if value is not None:
        aggs += [
            F.sum(value).alias("sum_value"),
            F.min(value).alias("min_value"),
            F.max(value).alias("max_value"),
        ]
    return df.groupBy("cell_id").agg(*aggs)


def zonal_stats(points: DataFrame, polygons: DataFrame, level: int,
                lon: str = "lon", lat: str = "lat",
                value: str | None = None,
                broadcast_polygons: bool = True) -> DataFrame:
    """Per-polygon stats over the rasterized point field.

    Returns (way_id, n_cells, n_points[, sum_value, min_value, max_value]).
    """
    raster = rasterize(points, level, lon, lat, value)
    polys = with_covering_cells(polygons, level)
    polys = polys.select("way_id", F.explode("cells").alias("cell_id"))
    right = F.broadcast(polys) if broadcast_polygons else polys
    joined = raster.join(right, on="cell_id")
    aggs = [
        F.count("*").alias("n_cells"),
        F.sum("n_points").alias("n_points"),
    ]
    if value is not None:
        aggs += [
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        ]
    return joined.groupBy("way_id").agg(*aggs)

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
from geoutils_spark.operators import clip
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


# ---------------------------------------------------------------------------
# Area-weighted zonal: constructive polygon ∩ cell-rect intersection areas
# ---------------------------------------------------------------------------

def area_raster(polygons: DataFrame, extents, nx: int, ny: int) -> DataFrame:
    """Per-(polygon, grid-cell) intersection: (way_id, i, j, cell_fp) where
    ``cell_fp`` is 2*area in 1e-12 fixed point (clip.FP_SCALE).

    Grid = regular nx x ny lon/lat boxes over ``extents`` — the reference's
    D x D density-grid geometry (/root/reference/osmsplit/mapsplit.h:46,
    main.cpp:118), now with EXACT per-cell intersection areas via the
    Sutherland–Hodgman clip (reference Clipper intersectPolygons semantics,
    /root/reference/osm2assimp/utils.cpp:95-154).

    Scale shape: candidates come from the polygon bbox (i/j ranges — no
    cross join with the grid); the clip + shoelace are whole-stage-codegen'd
    array expressions, no Python anywhere; the only shuffle is the final
    groupBy. Multi-ring polygons sum signed ring areas before abs (holes
    wound opposite subtract).
    """
    lon0, lat0, lon1, lat1 = extents
    dx = (lon1 - lon0) / nx
    dy = (lat1 - lat0) / ny
    p = polygons
    if "rings" not in p.columns:
        p = p.withColumn("rings", F.array(F.struct(
            F.col("ring.lon").alias("lon"), F.col("ring.lat").alias("lat"))))
    b = F.col("bbox")
    i0 = F.greatest(F.floor((b["minx"] - F.lit(lon0)) / F.lit(dx)).cast("long"), F.lit(0))
    i1 = F.least(F.floor((b["maxx"] - F.lit(lon0)) / F.lit(dx)).cast("long"), F.lit(nx - 1))
    j0 = F.greatest(F.floor((b["miny"] - F.lit(lat0)) / F.lit(dy)).cast("long"), F.lit(0))
    j1 = F.least(F.floor((b["maxy"] - F.lit(lat0)) / F.lit(dy)).cast("long"), F.lit(ny - 1))
    seq = lambda a, z: F.when(a <= z, F.sequence(a, z)).otherwise(  # noqa: E731
        F.array().cast("array<long>"))
    p = p.select("way_id", "rings", i0.alias("__i0"), i1.alias("__i1"),
                 j0.alias("__j0"), j1.alias("__j1"))
    p = p.select("way_id", "rings",
                 F.explode(seq(F.col("__i0"), F.col("__i1"))).alias("i"),
                 "__j0", "__j1")
    p = p.select("way_id", "rings", "i",
                 F.explode(seq(F.col("__j0"), F.col("__j1"))).alias("j"))
    p = p.select("way_id", "i", "j",
                 F.explode("rings").alias("__ring2"))
    p = p.withColumn("__x0", F.lit(lon0) + F.col("i") * F.lit(dx))
    p = p.withColumn("__x1", F.lit(lon0) + (F.col("i") + F.lit(1)) * F.lit(dx))
    p = p.withColumn("__y0", F.lit(lat0) + F.col("j") * F.lit(dy))
    p = p.withColumn("__y1", F.lit(lat0) + (F.col("j") + F.lit(1)) * F.lit(dy))
    p = p.withColumn("__ring", clip.ring_struct_col(
        F.col("__ring2.lon"), F.col("__ring2.lat")))
    p = clip.with_clipped_ring(p, "__ring", "__x0", "__x1", "__y0", "__y1",
                               out="__clipped")
    p = p.withColumn("__fp", clip.shoelace_fp_col(F.col("__clipped")))
    out = (
        p.groupBy("way_id", "i", "j")
        .agg(F.abs(F.sum("__fp")).alias("cell_fp"))
        .filter(F.col("cell_fp") > 0)
    )
    return out


def grid_rasterize(points: DataFrame, extents, nx: int, ny: int,
                   lon: str = "lon", lat: str = "lat") -> DataFrame:
    """points -> (i, j, n_points) on the regular lon/lat grid (the same grid
    area_raster clips against); points outside ``extents`` are excluded."""
    lon0, lat0, lon1, lat1 = extents
    dx = (lon1 - lon0) / nx
    dy = (lat1 - lat0) / ny
    i = F.floor((F.col(lon) - F.lit(lon0)) / F.lit(dx)).cast("long")
    j = F.floor((F.col(lat) - F.lit(lat0)) / F.lit(dy)).cast("long")
    df = points.select(i.alias("i"), j.alias("j"))
    df = df.filter((F.col("i") >= 0) & (F.col("i") < nx)
                   & (F.col("j") >= 0) & (F.col("j") < ny))
    return df.groupBy("i", "j").agg(F.count("*").alias("n_points"))


def area_weighted_zonal(points: DataFrame, polygons: DataFrame, extents,
                        nx: int, ny: int,
                        lon: str = "lon", lat: str = "lat") -> DataFrame:
    """THE standard raster↔vector zonal: per polygon, point counts weighted
    by the EXACT intersection-area fraction of each raster cell —
    ``Σ n_points(cell) * area(poly ∩ cell) / area(cell)``.

    (way_id, n_cells, n_points, weighted_pts). Cells contribute only where
    both the polygon and points touch them (inner join). The weighted sum
    is computed in integer fixed point (n * cell_fp) so aggregation order
    cannot change the result — same parity design as operators/clip.py.

    Scale shape: the fact table collapses to occupied grid cells BEFORE the
    join (map-side-combinable agg), then one broadcast-able equi-join on
    (i, j) against the clipped polygon raster; never a point-level join.
    """
    lon0, lat0, lon1, lat1 = extents
    dx = (lon1 - lon0) / nx
    dy = (lat1 - lat0) / ny
    raster = grid_rasterize(points, extents, nx, ny, lon, lat)
    areas = area_raster(polygons, extents, nx, ny)
    joined = raster.join(F.broadcast(areas), on=["i", "j"])
    denom = 2.0 * clip.FP_SCALE * (dx * dy)
    return joined.groupBy("way_id").agg(
        F.count("*").alias("n_cells"),
        F.sum("n_points").cast("long").alias("n_points"),
        (F.sum(F.col("cell_fp") * F.col("n_points")).cast("double")
         / F.lit(denom)).alias("weighted_pts"),
    )


def area_zonal_stats(polygons: DataFrame, extents, nx: int, ny: int) -> DataFrame:
    """(way_id, n_cells, area_deg2): per-polygon cell count + total
    intersection area in squared degrees (= polygon area when the grid
    covers it). The standard raster↔vector zonal weighting input."""
    r = area_raster(polygons, extents, nx, ny)
    return r.groupBy("way_id").agg(
        F.count("*").alias("n_cells"),
        (F.sum("cell_fp").cast("double") / F.lit(2.0 * clip.FP_SCALE))
        .alias("area_deg2"),
    )

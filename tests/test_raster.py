"""Raster -> vector polygonize (operators/raster.py): 4-adjacency merge,
diagonal non-merge, isolated cells, and the column-edge wrap guard."""

from pyspark.sql import functions as F

from geoutils_spark.operators import raster as RA

Z = 4  # 16x16 grid in tests
N = 1 << Z


def _occ(spark, cells):
    """cells: list of (x, y, n)."""
    df = spark.createDataFrame(cells, ["x", "y", "n"])
    return df.select(
        (F.col("x") * N + F.col("y")).cast("long").alias("k"),
        F.col("x").cast("long"), F.col("y").cast("long"),
        F.col("n").cast("long"))


def test_blob_merge_and_isolation(spark):
    occ = _occ(spark, [
        # L-shaped blob: (1,1)(1,2)(2,2)
        (1, 1, 5), (1, 2, 7), (2, 2, 1),
        # diagonal-only neighbor of the blob: own region (4-adjacency)
        (3, 3, 2),
        # isolated far cell
        (9, 9, 4),
    ])
    out = {r["region_id"]: r for r in RA.raster_regions(occ, Z).collect()}
    assert len(out) == 3
    blob = out[1 * N + 1]
    assert blob["n_cells"] == 3 and blob["n_points"] == 13
    assert (blob["min_x"], blob["max_x"], blob["min_y"], blob["max_y"]) \
        == (1, 2, 1, 2)
    assert out[3 * N + 3]["n_cells"] == 1
    assert out[9 * N + 9]["n_points"] == 4


def test_column_edge_never_wraps(spark):
    """(x, y=N-1) and (x+1, y=0) are key-adjacent (k+1) but NOT grid
    neighbors — the guard must keep them separate regions."""
    occ = _occ(spark, [(5, N - 1, 1), (6, 0, 1)])
    out = RA.raster_regions(occ, Z).collect()
    assert len(out) == 2
    # while a genuine down-neighbor merges
    occ2 = _occ(spark, [(5, 3, 1), (5, 4, 1)])
    assert RA.raster_regions(occ2, Z).count() == 1


def test_grid_occupancy_threshold(spark):
    pts = spark.createDataFrame(
        [(0.0 + 0.001 * i, 51.0) for i in range(4)] + [(-170.0, -60.0)],
        ["lon", "lat"])
    occ = RA.grid_occupancy(pts, "lon", "lat", zoom=2, min_count=2)
    rows = occ.collect()
    assert len(rows) == 1 and rows[0]["n"] == 4  # the lone point filtered


def test_long_snake_converges(spark):
    """A 40-cell vertical snake exercises the O(log D) labeler depth."""
    occ = _occ(spark, [(2, y, 1) for y in range(12)]
               + [(x, 12, 1) for x in range(2, 12)])
    out = RA.raster_regions(occ, Z).collect()
    assert len(out) == 1
    assert out[0]["n_cells"] == 22
    assert out[0]["region_id"] == 2 * N + 0


def test_tile_pyramid_rollup(spark):
    occ = _occ(spark, [(0, 0, 1), (1, 0, 2), (0, 1, 4), (3, 3, 8),
                       (15, 15, 16)])
    out = RA.tile_pyramid(occ, zoom=Z, zoom_min=0).toPandas()
    by_zoom = out.groupby("zoom")["n"].sum()
    assert (by_zoom == 31).all()             # mass conserved at every level
    assert sorted(out["zoom"].unique()) == [0, 1, 2, 3, 4]
    top = out[out["zoom"] == 0]
    assert len(top) == 1 and top.iloc[0]["n"] == 31
    l3 = out[out["zoom"] == 3].set_index(["x", "y"])["n"]
    assert l3[(0, 0)] == 7 and l3[(1, 1)] == 8 and l3[(7, 7)] == 16


def test_rasterize_center_sampling(spark):
    """A cell is burned iff its CENTER is inside: a polygon thinner
    than a cell but crossing a center row burns exactly that row."""
    from geoutils_spark.operators.raster import rasterize_polygons
    from geoutils_spark.functions import cells as C
    from geoutils_spark.sources import fixtures as FX
    from pyspark.sql import functions as F

    level = 18
    # one fixture building: burn must be non-empty, every burned cell
    # center inside the bbox, and every covering-cell center inside the
    # bbox must be burned (exact center sampling, rectangles)
    polys = FX.polygons_df(spark).filter(F.col("kind") == "building") \
        .limit(1).cache()
    bbox = polys.select("bbox.*").collect()[0]
    out = rasterize_polygons(polys, level)
    rows = out.collect()
    assert rows, "empty raster"
    clon, clat = C.cell_center_col(F.col("cell_id"), level)
    chk = out.select(
        ((clon >= bbox["minx"]) & (clon < bbox["maxx"])
         & (clat >= bbox["miny"]) & (clat < bbox["maxy"])).alias("ok"))
    assert all(r["ok"] for r in chk.collect())
    assert all(r["n_polys"] == 1 for r in rows)
    polys.unpersist()


def test_rasterize_overlap_counts(spark):
    """Two identical polygons burn the same cells with n_polys=2 and
    min_way_id the smaller id."""
    from geoutils_spark.operators.raster import rasterize_polygons
    from geoutils_spark.sources import fixtures as FX
    from pyspark.sql import functions as F

    one = FX.polygons_df(spark).filter(F.col("kind") == "building").limit(1)
    two = one.union(one.withColumn("way_id", F.col("way_id") + 1000))
    out = rasterize_polygons(two, 18).collect()
    assert out
    base_way = one.collect()[0]["way_id"]
    for r in out:
        assert r["n_polys"] == 2
        assert r["min_way_id"] == base_way

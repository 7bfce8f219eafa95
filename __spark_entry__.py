"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship spatial-join + tile-assignment pipeline on
sf0.001. ``queries()`` / ``oracle_sql()`` — operator registry with DuckDB
oracle twins (see geoutils_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geoutils_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: pages-style points (geo derived from order keys) x
    fixture polygon grid -> exact PIP spatial join -> per-polygon counts +
    level-12 cell/tile assignment rollup."""
    from pyspark.sql import functions as F

    from geoutils_spark.functions import cells as C
    from geoutils_spark.functions import keys as K
    from geoutils_spark.operators.spatial_join import spatial_join
    from geoutils_spark.sources import fixtures

    sf_dir = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey")
    pts = (
        orders.withColumnRenamed("o_orderkey", "page_id")
        .withColumn("lon", K.key_lon_col(F.col("page_id")))
        .withColumn("lat", K.key_lat_col(F.col("page_id")))
    )
    polys = fixtures.polygons_df(spark).filter(F.col("kind") == "building")
    joined = spatial_join(pts, polys, level=15, point_cols=("page_id",))
    joined = C.with_cell_tile_xy(joined, "cell_id", 15, "tile_x", "tile_y")
    return (
        joined.groupBy("way_id")
        .agg(
            F.count("*").alias("n_pages"),
            F.countDistinct("cell_id").alias("n_cells"),
            F.min("tile_x").alias("min_tile_x"),
            F.min("tile_y").alias("min_tile_y"),
        )
        .orderBy("way_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLE_SQL)

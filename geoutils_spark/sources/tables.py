"""Thin table-IO layer: Iceberg when a catalog is configured, parquet +
hive partitions otherwise (SURVEY.md §7 risk register).

The north rule names Iceberg tables partitioned by (h3_cell, warc_ts); no
Iceberg jars ship in this sandbox, so the layer keys off
``spark.sql.catalog.<name>`` config: with a catalog, reads/writes go through
``format("iceberg")`` table identifiers; without, through parquet paths with
the identical partition columns. Every operator in the engine consumes plain
DataFrames, so the choice is invisible above this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoutils_spark.functions import cells as C

DEFAULT_CATALOG_KEY = "spark.sql.catalog.geoutils"


def iceberg_enabled(spark: SparkSession,
                    catalog_key: str = DEFAULT_CATALOG_KEY) -> bool:
    try:
        return spark.conf.get(catalog_key) is not None
    except Exception:
        return False


def read_table(spark: SparkSession, location: str) -> DataFrame:
    """``location`` is an Iceberg table identifier (catalog.db.tbl) when the
    catalog is configured, else a parquet path."""
    if iceberg_enabled(spark) and not location.startswith("/"):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def write_pages_partitioned(df: DataFrame, location: str, cell_level: int = 8,
                            lon: str = "lon", lat: str = "lat",
                            ts: str = "warc_ts",
                            mode: str = "overwrite") -> None:
    """The north-rule partition spec: range+hash on (cell, time bucket) —
    hive columns ``cell_part`` (coarse cell) and ``ts_month``; identical to
    an Iceberg spec `(truncate(cell), month(warc_ts))`."""
    out = C.with_cell(df, lon, lat, cell_level, "__leaf")
    out = out.withColumn("cell_part", C.cell_parent_col(F.col("__leaf"), cell_level))
    out = out.withColumn("ts_month", F.date_format(F.col(ts), "yyyy-MM"))
    out = out.drop("__leaf").repartition(F.col("cell_part"), F.col("ts_month"))
    w = out.write.mode(mode).partitionBy("cell_part", "ts_month")
    if iceberg_enabled(df.sparkSession) and not location.startswith("/"):
        w.format("iceberg").saveAsTable(location)
    else:
        w.parquet(location)


def write_bucketed_by_cell(df: DataFrame, table: str, n_buckets: int = 64,
                           cell: str = "cell_id",
                           mode: str = "overwrite") -> None:
    """Hash-bucketed, bucket-sorted table on the cell key — the
    pre-partitioning lever for REPEATED joins at scale: two tables bucketed
    the same way join with ZERO exchanges (co-located sort-merge), so the
    100-TB fact table pays its shuffle once at write time instead of per
    query. Iceberg's `bucket(N, cell)` transform is the same spec; the
    parquet fallback uses the session-catalog bucketing
    (test_bucketed_join_is_shuffle_free proves the no-Exchange plan)."""
    (df.repartition(n_buckets, F.col(cell))
       .write.mode(mode)
       .bucketBy(n_buckets, cell).sortBy(cell)
       .format("parquet")
       .saveAsTable(table))

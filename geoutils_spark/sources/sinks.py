"""Partitioned sinks: per-cell and per-leaf parquet layouts.

Reference semantics re-expressed as ``write.partitionBy``:

* S5 — one output per S2 cell named ``s2_<hex16>``
  (/root/reference/osms2split/src/s2splitter.cpp:54-72): here a hive-style
  ``cell_hex=s2_<hex16>/`` directory per cell; the mutexed per-cell buffers
  (s2splitter.h:58-64) become shuffle partitions.
* S6/S7 — per-leaf files with nodes-before-ways ordering via two-file
  consolidation (osmsplitwriter.cpp:17-67): here ``partitionBy(leaf)`` +
  ``sortWithinPartitions(entity_kind)`` — ordering inside one parquet
  partition replaces the sidecar-append trick.

Iceberg note (SURVEY.md §7 risk register): no Iceberg jars ship in this
sandbox, so the table-IO layer is parquet + hive partitions; the partition
columns (cell_hex / leaf, optionally warc_ts bucket) are exactly the Iceberg
partition spec the north rule names, and ``.format("iceberg")`` is a config
switch away on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoutils_spark.functions import cells as C


CELL_PREFIX = "s2_"


def with_cell_token(df: DataFrame, lon: str, lat: str, level: int,
                    out: str = "cell_hex") -> DataFrame:
    """Add the reference's filename token ``s2_<hex16>`` for the row's cell."""
    df = C.with_cell(df, lon, lat, level, "__cell")
    df = df.withColumn(out, F.concat(F.lit(CELL_PREFIX),
                                     C.cell_to_hex_col(F.col("__cell"))))
    return df.drop("__cell")


def write_partitioned_by_cell(df: DataFrame, path: str, level: int,
                              lon: str = "lon", lat: str = "lat",
                              mode: str = "overwrite") -> None:
    """S5 sink: one hive partition per cell, shuffled so exactly one task
    owns each cell (no lock analog needed)."""
    out = with_cell_token(df, lon, lat, level)
    (
        out.repartition(F.col("cell_hex"))
        .write.mode(mode).partitionBy("cell_hex").parquet(path)
    )


def write_partitioned_by_leaf(df: DataFrame, path: str, leaf: str = "leaf",
                              entity_kind: str | None = None,
                              mode: str = "overwrite") -> None:
    """S6/S7 sink: per-leaf partitions; optional nodes-before-ways ordering
    inside each partition (the consolidation ordering, osmsplitwriter.cpp:50-67)."""
    out = df.repartition(F.col(leaf))
    if entity_kind is not None:
        out = out.sortWithinPartitions(entity_kind)
    out.write.mode(mode).partitionBy(leaf).parquet(path)

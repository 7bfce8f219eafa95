"""Per-partition lineage manifests + counters with checkpoint resume.

North-rule requirement: "per-partition lineage manifests and counters
enabling checkpoint resume". The reference's analogs are the split-config
JSON manifest chained across invocations (S9,
/root/reference/osmsplit/main.cpp:67-76,141-171; osmsplitconfig.cpp:63-126)
and the mtime-based incremental skip (P9, osmsplit/main.cpp:83-100).

Design (Spark-first):

* a run writes hive partitions ``<part_col>=<value>/`` plus one JSON
  manifest per partition under ``_manifests/``, carrying row counts and
  engine/lineage metadata (counters come from one map-side-combinable
  groupBy over the partition key — cheap relative to the write);
* ``resume=True`` re-plans the job as an anti-join against the completed
  partition set from the manifests: only missing/incomplete partitions are
  recomputed and written (dynamic partition overwrite keeps completed data
  intact) — the P9 skip, but tracked per partition instead of per file;
* global job counters are observed on the fly via ``df.observe`` (A9
  OpCounter analog, osmsplit/main.h:30-52) and recorded in ``_job.json``.

At 10^12 rows the manifest write is O(partitions), the resume filter is a
broadcast anti-join on the partition key, and completed partitions are
pruned at the source when the input is partitioned by the same key.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

MANIFEST_DIR = "_manifests"
JOB_FILE = "_job.json"
MANIFEST_VERSION = 1


def _manifest_path(path: str, value: Any) -> str:
    return os.path.join(path, MANIFEST_DIR, f"{value}.json")


def read_manifests(path: str) -> dict[str, dict]:
    """partition value -> manifest dict, for all completed partitions."""
    mdir = os.path.join(path, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return {}
    out = {}
    for fn in os.listdir(mdir):
        if fn.endswith(".json"):
            with open(os.path.join(mdir, fn)) as f:
                m = json.load(f)
            if m.get("complete"):
                out[str(m["partition"])] = m
    return out


def write_with_manifests(df: DataFrame, path: str, part_col: str,
                         resume: bool = False,
                         lineage: dict | None = None) -> dict:
    """Write ``df`` hive-partitioned by ``part_col`` with per-partition
    lineage manifests; with ``resume=True`` skip partitions already recorded
    complete. Returns the job summary dict (also persisted to ``_job.json``).
    """
    spark = df.sparkSession
    done = read_manifests(path) if resume else {}
    work = df
    if done:
        done_df = spark.createDataFrame(
            [(v,) for v in done], f"{part_col} string")
        work = df.join(
            F.broadcast(done_df.withColumn(part_col, F.col(part_col)
                                           .cast(df.schema[part_col].dataType))),
            on=part_col, how="left_anti")

    obs = Observation("job_counters")
    work = work.observe(obs, F.count(F.lit(1)).alias("rows_written"))

    # dynamic overwrite: only partitions present in `work` are replaced
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        work.repartition(F.col(part_col))
        .write.mode("overwrite").partitionBy(part_col).parquet(path)
    )

    # per-partition counters: one cheap agg over the written frame
    counts = work.groupBy(part_col).agg(F.count(F.lit(1)).alias("n_rows")).collect()
    os.makedirs(os.path.join(path, MANIFEST_DIR), exist_ok=True)
    for r in counts:
        value = r[part_col]
        manifest = {
            "version": MANIFEST_VERSION,
            "partition": str(value),
            "partition_column": part_col,
            "n_rows": r["n_rows"],
            "complete": True,
            "lineage": lineage or {},
        }
        with open(_manifest_path(path, value), "w") as f:
            json.dump(manifest, f, indent=1)

    rows_written = obs.get["rows_written"] if counts else 0
    summary = {
        "version": MANIFEST_VERSION,
        "partition_column": part_col,
        "partitions_written": len(counts),
        "partitions_skipped": len(done),
        "rows_written": rows_written,
        "lineage": lineage or {},
    }
    with open(os.path.join(path, JOB_FILE), "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def invalidate_partition(path: str, value: Any) -> None:
    """Drop one partition's manifest so the next resume recomputes it."""
    p = _manifest_path(path, value)
    if os.path.exists(p):
        os.remove(p)

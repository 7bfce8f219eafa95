import json
import os

from pyspark.sql import functions as F

from geoutils_spark.plans import manifests as M


def _df(spark, n=300):
    return (
        spark.range(n).withColumnRenamed("id", "row_id")
        .withColumn("bucket", (F.col("row_id") % 5).cast("string"))
        .withColumn("payload", F.md5(F.col("row_id").cast("string").cast("binary")))
    )


def test_write_with_manifests(spark, tmp_path):
    out = str(tmp_path / "t1")
    summary = M.write_with_manifests(_df(spark), out, "bucket",
                                     lineage={"source": "unit", "version": 1})
    assert summary["partitions_written"] == 5
    assert summary["rows_written"] == 300
    ms = M.read_manifests(out)
    assert set(ms) == {"0", "1", "2", "3", "4"}
    assert all(m["n_rows"] == 60 for m in ms.values())
    assert all(m["lineage"]["source"] == "unit" for m in ms.values())
    assert spark.read.parquet(out).count() == 300


def test_resume_skips_completed(spark, tmp_path):
    out = str(tmp_path / "t2")
    M.write_with_manifests(_df(spark), out, "bucket")
    # resume with nothing invalidated: no partition rewritten
    s2 = M.write_with_manifests(_df(spark), out, "bucket", resume=True)
    assert s2["partitions_written"] == 0
    assert s2["partitions_skipped"] == 5
    assert spark.read.parquet(out).count() == 300


def test_resume_recomputes_invalidated(spark, tmp_path):
    out = str(tmp_path / "t3")
    M.write_with_manifests(_df(spark), out, "bucket")
    M.invalidate_partition(out, "3")
    s = M.write_with_manifests(_df(spark), out, "bucket", resume=True)
    assert s["partitions_written"] == 1
    assert s["partitions_skipped"] == 4
    assert s["rows_written"] == 60
    # data intact: dynamic overwrite only replaced bucket=3
    assert spark.read.parquet(out).count() == 300
    ms = M.read_manifests(out)
    assert set(ms) == {"0", "1", "2", "3", "4"}


def test_job_summary_persisted(spark, tmp_path):
    out = str(tmp_path / "t4")
    M.write_with_manifests(_df(spark), out, "bucket")
    with open(os.path.join(out, M.JOB_FILE)) as f:
        job = json.load(f)
    assert job["partitions_written"] == 5 and job["rows_written"] == 300


def test_pages_partition_spec(spark, tmp_path):
    """tables.write_pages_partitioned lays down the north-rule (cell, month)
    hive spec; partition pruning hits the directory level."""
    import os

    from pyspark.sql import functions as F

    from geoutils_spark.sources import fixtures, tables

    pages = fixtures.with_page_geo(fixtures.pages_df(spark, 500))
    out = str(tmp_path / "pages_tbl")
    tables.write_pages_partitioned(
        pages.select("page_id", "lon", "lat", "warc_ts"), out, cell_level=8)
    parts = [d for d in os.listdir(out) if d.startswith("cell_part=")]
    assert parts
    months = {
        m for p in parts
        for m in os.listdir(os.path.join(out, p)) if m.startswith("ts_month=")
    }
    assert len(months) >= 2  # warc_ts spans the year
    back = tables.read_table(spark, out)
    assert back.count() == 500
    # pruning: one month filter scans a subset of files
    one = sorted(months)[0].split("=")[1]
    n = back.filter(F.col("ts_month") == one).count()
    assert 0 < n < 500

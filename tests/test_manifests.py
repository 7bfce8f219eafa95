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


def test_bucketed_join_is_shuffle_free(spark):
    """Co-located bucketed join: two tables bucketed on cell_id join with
    ZERO shuffle exchanges — the write-once-shuffle-never-again lever the
    scale design names (SCALE.md); Iceberg bucket(N, cell) is the same
    spec."""
    from geoutils_spark.functions import cells as C
    from geoutils_spark.sources.tables import write_bucketed_by_cell

    pts = spark.range(2000).select(
        F.col("id").alias("pid"),
        ((F.col("id") % 50).cast("double") / 100.0).alias("lon"),
        ((F.col("id") / 50).cast("int").cast("double") / 100.0).alias("lat"))
    pts = C.with_cell(pts, "lon", "lat", 12, "cell_id")
    try:
        write_bucketed_by_cell(pts.select("pid", "cell_id"), "t_bucket_a", 8)
        write_bucketed_by_cell(pts.select(F.col("pid").alias("qid"), "cell_id"),
                               "t_bucket_b", 8)
        a = spark.table("t_bucket_a")
        b = spark.table("t_bucket_b")
        joined = a.join(b, on="cell_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")

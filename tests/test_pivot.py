"""Pivot/unpivot plan shapes: explicit-values pivot plans in ONE pass
(no values-discovery collect job), unpivot stays exchange-free."""

from pyspark.sql import functions as F


def test_pivot_explicit_values_single_pass(spark):
    df = spark.createDataFrame(
        [("a", "F", 1.0), ("a", "O", 2.0), ("b", "F", 3.0)],
        ["k", "s", "v"])
    p = (df.groupBy("k").pivot("s", ["F", "O"])
         .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n")))
    rows = {r["k"]: r for r in p.collect()}
    assert rows["a"]["F_sv"] == 1.0 and rows["a"]["O_sv"] == 2.0
    # missing combo -> NULL for BOTH aggs (pivot, unlike COUNT(CASE),
    # has no rows to count — rel_pivot coalesces the count to 0 for
    # oracle parity on sparse fixtures)
    assert rows["b"]["O_sv"] is None and rows["b"]["O_n"] is None
    # the real cost claim: explicit values run NO values-discovery job
    # at plan time (implicit pivot eagerly collects distinct values)
    sc = spark.sparkContext
    sc.setJobGroup("pivot_explicit", "plan-time probe")
    lazy = (df.groupBy("k").pivot("s", ["F", "O"])
            .agg(F.sum("v").alias("sv")))
    lazy.schema  # force analysis; must not launch a job
    assert sc.statusTracker().getJobIdsForGroup("pivot_explicit") == []
    sc.setJobGroup("pivot_implicit", "plan-time probe")
    eager = df.groupBy("k").pivot("s").agg(F.sum("v").alias("sv"))
    eager.schema
    assert len(sc.statusTracker().getJobIdsForGroup("pivot_implicit")) >= 1
    sc.setJobGroup(None, None)


def test_unpivot_no_exchange(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0)], ["id", "a", "b"])
    u = df.unpivot(["id"], ["a", "b"], "metric", "value")
    got = sorted((r["metric"], r["value"]) for r in u.collect())
    assert got == [("a", 2.0), ("b", 3.0)]
    plan = u._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_anomaly_hours_integer_rule(spark):
    """rel_anomaly_hours' integer rule must equal the float z-score rule
    on a planted series: 24 calm hours (counts 10 +- 1) then one 40-count
    spike hour -> flagged; a mild 13-count hour -> not flagged (z < 3);
    early hours with < 12 observations -> never flagged."""
    import math
    import os
    import tempfile

    from pyspark.sql import functions as F

    from geoutils_spark.queries import SPARK_QUERIES

    counts = [10, 11, 9, 10, 11, 9, 10, 11, 9, 10, 11, 9,
              10, 11, 9, 10, 11, 9, 10, 11, 9, 10, 11, 9,
              40,   # hour 24: spike
              13]   # hour 25: mild, below 3 sigma of the trailing window
    rows = []
    eid = 0
    for hr, c in enumerate(counts):
        for k in range(c):
            rows.append((eid, hr * 3600 * 1_000_000 + k * 1_000, 1))
            eid += 1
    tmp = tempfile.mkdtemp()
    spark.createDataFrame(rows, "event_id long, us long, user_id long") \
        .select("event_id", "user_id",
                F.timestamp_micros(F.col("us")).cast("timestamp_ntz")
                .alias("ts"),
                F.lit("click").alias("event_type"),
                F.lit(1.0).alias("value"), F.lit("{}").alias("props")) \
        .write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
    got = {r["hr"]: r for r in
           SPARK_QUERIES["rel_anomaly_hours"](spark, tmp).collect()}
    # float replay of the trailing window for hours 24 and 25
    for hr, expect in ((24, True), (25, False)):
        win = counts[max(0, hr - 24):hr]
        n = len(win)
        mean = sum(win) / n
        var = sum(x * x for x in win) / n - mean * mean
        z_flag = counts[hr] - mean > 3 * math.sqrt(var)
        assert z_flag is expect
        assert (hr in got) is expect
    assert all(h >= 12 for h in got)   # warm-up hours never flag

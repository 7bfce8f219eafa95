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

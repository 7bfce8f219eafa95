"""Distributed exact per-group rank (operators/rank.py): equivalence
to the plain window, tie handling, bin-boundedness of the plan, and
the CCNet bucket layer."""

import pytest
from pyspark.sql import Window, functions as F

from geoutils_spark.operators import rank as RK


def _mk(spark, rows):
    return spark.createDataFrame(rows, "g string, id long, score double")


def _window_rank(df, asc):
    order = ([F.col("score").asc(), F.col("id").asc()] if asc
             else [F.col("score").desc(), F.col("id").desc()])
    w = Window.partitionBy("g").orderBy(*order)
    return df.withColumn("rank", F.row_number().over(w).cast("long"))


@pytest.mark.parametrize("asc", [True, False])
@pytest.mark.parametrize("n_bins", [1, 4, 32])
def test_matches_window_rank(spark, asc, n_bins):
    rows = [(f"g{i % 5}", i, float((i * 131) % 97)) for i in range(800)]
    df = _mk(spark, rows).repartition(8)
    got = RK.group_rank(df, ["g"], F.col("score"), F.col("id"),
                        n_bins=n_bins, ascending=asc)
    exp = _window_rank(df, asc)
    assert sorted(map(tuple, got.select("g", "id", "score", "rank")
                      .collect())) == \
        sorted(map(tuple, exp.select("g", "id", "score", "rank")
                   .collect())), (asc, n_bins)


def test_heavy_ties_across_edges(spark):
    # only 3 distinct scores over 600 rows: ties MUST all land in one
    # bin (strict < edge compare) and break on id
    rows = [(f"g{i % 2}", i, float(i % 3)) for i in range(600)]
    df = _mk(spark, rows)
    got = RK.group_rank(df, ["g"], F.col("score"), F.col("id"), n_bins=8)
    exp = _window_rank(df, True)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, exp.collect()))


def test_tiny_groups(spark):
    rows = [("solo", 1, 9.0), ("pair", 2, 1.0), ("pair", 3, 2.0)]
    got = RK.group_rank(_mk(spark, rows), ["g"], F.col("score"),
                        F.col("id"), n_bins=32).toPandas()
    by = {(r.g, r.id): r.rank for r in got.itertuples()}
    assert by[("solo", 1)] == 1
    assert by[("pair", 2)] == 1 and by[("pair", 3)] == 2


def test_no_whole_group_window(spark):
    """The corpus-sized window must partition by (group, bin) — a
    window keyed by the group alone is the scale-killer this operator
    exists to avoid. (The bases window also partitions by group, but
    over count-sized input; distinguish by required child columns.)"""
    rows = [(f"g{i % 3}", i, float(i)) for i in range(200)]
    plan = RK.group_rank(_mk(spark, rows), ["g"], F.col("score"),
                         F.col("id"), n_bins=8) \
        ._jdf.queryExecution().optimizedPlan().toString()
    import re

    row_number_windows = [
        l for l in plan.splitlines()
        if "row_number()" in l and "windowspecdefinition" in l]
    assert row_number_windows, plan
    for l in row_number_windows:
        assert "__bin" in l, l


def test_fraction_buckets_masses(spark):
    rows = [(f"g{i % 2}", i, float((i * 7) % 53)) for i in range(300)]
    out = RK.group_fraction_buckets(
        _mk(spark, rows), ["g"], F.col("score"), F.col("id"),
        n_buckets=3, labels=["head", "middle", "tail"]).toPandas()
    for g, grp in out.groupby("g"):
        counts = grp["bucket"].value_counts()
        # equal-mass thirds within one row
        assert max(counts) - min(counts) <= 1
        # ranks within a bucket are contiguous and ordered by score
        head = grp[grp["bucket"] == "head"].sort_values("rank")
        assert head["rank"].tolist() == list(
            range(1, len(head) + 1))


def test_guards(spark):
    df = _mk(spark, [("g", 1, 1.0)])
    with pytest.raises(ValueError):
        RK.group_rank(df, ["g"], F.col("score"), F.col("id"), n_bins=0)
    with pytest.raises(ValueError):
        RK.group_fraction_buckets(df, ["g"], F.col("score"), F.col("id"),
                                  n_buckets=2, labels=["only-one"])

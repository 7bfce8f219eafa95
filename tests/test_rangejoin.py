"""Binned 1-D range join: equivalence vs the naive quadratic join, no
duplicate emissions, and the plan stays an equi-join (no nested loop)."""

import pytest
from pyspark.sql import functions as F

from geoutils_spark.operators.rangejoin import interval_overlap_join, range_join


def _points(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        ((F.col("id") * 37) % 1000).alias("pos"))


def _intervals(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 911) % 1000).alias("lo"),
        # lengths 0 .. 295: some intervals span many 64-wide bins, some none
        ((F.col("id") * 911) % 1000 + (F.col("id") % 60) * 5).alias("hi"))


def test_range_join_matches_naive(spark):
    p, i = _points(spark), _intervals(spark)
    got = {(r.event_id, r.doc_id)
           for r in range_join(p, i, "pos", "lo", "hi", 64).collect()}
    naive = {(r.event_id, r.doc_id)
             for r in p.crossJoin(i)
             .where(F.col("pos").between(F.col("lo"), F.col("hi")))
             .collect()}
    assert got == naive and len(got) > 100


def test_range_join_no_duplicates_and_equijoin_plan(spark):
    p, i = _points(spark), _intervals(spark)
    out = range_join(p, i, "pos", "lo", "hi", 64)
    rows = out.collect()
    assert len(rows) == len({(r.event_id, r.doc_id) for r in rows})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Join" in plan  # hash equi-join (broadcast or sort-merge)


def test_range_join_rejects_bad_bin_width(spark):
    p, i = _points(spark), _intervals(spark)
    with pytest.raises(ValueError):
        range_join(p, i, "pos", "lo", "hi", 0)


def test_interval_overlap_join_matches_naive_once(spark):
    left = _intervals(spark, 50).select(
        F.col("doc_id").alias("a_id"), F.col("lo").alias("a_lo"),
        F.col("hi").alias("a_hi"))
    right = _intervals(spark, 70).select(
        (F.col("doc_id") + 1000).alias("b_id"),
        ((F.col("lo") * 3 + 17) % 1000).alias("b_lo"),
        ((F.col("lo") * 3 + 17) % 1000 + (F.col("hi") - F.col("lo")) + 20)
        .alias("b_hi"))
    got = [(r.a_id, r.b_id) for r in interval_overlap_join(
        left, right, "a_lo", "a_hi", "b_lo", "b_hi", 64).collect()]
    naive = {(r.a_id, r.b_id)
             for r in left.crossJoin(right)
             .where((F.col("a_lo") <= F.col("b_hi"))
                    & (F.col("b_lo") <= F.col("a_hi")))
             .collect()}
    # every overlapping pair exactly once (first-shared-bin dedupe, no
    # distinct pass)
    assert len(got) == len(set(got))
    assert set(got) == naive and len(naive) > 100

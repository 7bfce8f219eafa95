"""Salted two-phase top-k per group (operators/topk.py): exact
equivalence to the unsalted window under a total order, hot-group
skew behavior, rank integrity, and parameter guards."""

import pytest
from pyspark.sql import Window, functions as F

from geoutils_spark.operators import topk as TK


def _brute(spark_df, group, order, k):
    w = Window.partitionBy(*group).orderBy(*order)
    return (spark_df.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "g string, id long, score double")


def ORDER():
    return [F.col("score").desc(), F.col("id").asc()]


def test_matches_unsalted_window_exactly(spark):
    rows = [(f"g{i % 7}", i, float((i * 37) % 101)) for i in range(1000)]
    df = _mk(spark, rows)
    for n_salt in (1, 4, 64):
        got = TK.topk_per_group(df, ["g"], ORDER(), 5, F.col("id"),
                                n_salt=n_salt)
        exp = _brute(df, ["g"], ORDER(), 5)
        g = sorted(map(tuple, got.collect()))
        e = sorted(map(tuple, exp.collect()))
        assert g == e, n_salt


def test_hot_group_skew(spark):
    # one group holds 95% of rows (the per-host-cap reason to exist)
    rows = ([("hot", i, float(i % 997)) for i in range(20000)]
            + [(f"cold{i % 50}", 100000 + i, float(i)) for i in range(1000)])
    df = _mk(spark, rows).repartition(8)
    got = TK.topk_per_group(df, ["g"], ORDER(), 3, F.col("id"), n_salt=32)
    exp = _brute(df, ["g"], ORDER(), 3)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, exp.collect()))


def test_duplicate_scores_resolved_by_tiebreak(spark):
    # every score identical: result must be the k smallest ids per group
    rows = [(f"g{i % 3}", i, 1.0) for i in range(300)]
    df = _mk(spark, rows)
    got = TK.topk_per_group(df, ["g"], ORDER(), 4, F.col("id"), n_salt=16)
    out = got.toPandas()
    for g, grp in out.groupby("g"):
        want = sorted(i for i in range(300) if f"g{i % 3}" == g)[:4]
        assert sorted(grp["id"]) == want
        assert sorted(grp["rank"]) == [1, 2, 3, 4]


def test_groups_smaller_than_k_survive_whole(spark):
    rows = [("tiny", 1, 5.0), ("tiny", 2, 4.0)]
    df = _mk(spark, rows)
    got = TK.topk_per_group(df, ["g"], ORDER(), 10, F.col("id"), n_salt=8)
    assert got.count() == 2


def test_cap_drops_rank(spark):
    rows = [(f"g{i % 2}", i, float(i)) for i in range(20)]
    got = TK.cap_per_group(_mk(spark, rows), ["g"], ORDER(), 3, F.col("id"))
    assert got.columns == ["g", "id", "score"]
    assert got.count() == 6


def test_phase1_partitions_by_salt(spark):
    """The salted window must appear in the plan (two windows, the
    first keyed by group + salt) — the skew property is structural."""
    rows = [("g", i, float(i)) for i in range(100)]
    plan = TK.topk_per_group(_mk(spark, rows), ["g"], ORDER(), 3,
                             F.col("id"), n_salt=16) \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Window [") == 2
    assert "__salt" in plan
    # Spark 4's rank-limit pushdown must ALSO be active on both phases
    # (map-side per-group limit before each exchange)
    assert plan.count("WindowGroupLimit") == 2


def test_param_guards(spark):
    df = _mk(spark, [("g", 1, 1.0)])
    with pytest.raises(ValueError):
        TK.topk_per_group(df, ["g"], ORDER(), 0, F.col("id"))
    with pytest.raises(ValueError):
        TK.topk_per_group(df, ["g"], ORDER(), 3, F.col("id"), n_salt=0)


# -------------------------------------------------------------- Misra-Gries

def test_heavy_hitters_exactness_and_boundary(spark):
    import pyspark.sql.functions as F
    from geoutils_spark.operators.heavyhitters import heavy_hitters
    # 1000 rows over 8 partitions: 'hot' x 300, 'warm' x 100 (exactly
    # eps=1/10 boundary: 100*10 >= 1*1000 -> kept), 'cool' x 99 (dropped),
    # filler unique singletons
    rows = (["hot"] * 300 + ["warm"] * 100 + ["cool"] * 99
            + [f"u{i}" for i in range(501)])
    df = spark.createDataFrame([(x,) for x in rows], ["term"]) \
        .repartition(8)
    out = {r["term"]: r["n"]
           for r in heavy_hitters(df, "term", 1, 10).collect()}
    assert out == {"hot": 300, "warm": 100}


def test_heavy_hitters_skewed_across_partitions(spark):
    import pyspark.sql.functions as F
    from geoutils_spark.operators.heavyhitters import heavy_hitters
    # heavy item spread thin across every partition (the case a naive
    # per-partition top-k misses), eps=1/50 over 5000 rows -> need 100
    n = 5000
    df = spark.range(n).select(
        F.when(F.col("id") % 40 == 0, F.lit("spread"))   # 125 >= 100
        .otherwise(F.concat(F.lit("u"), F.col("id").cast("string")))
        .alias("term")).repartition(16)
    out = {r["term"]: r["n"]
           for r in heavy_hitters(df, "term", 1, 50).collect()}
    assert out == {"spread": 125}


def test_heavy_hitters_validates_eps(spark):
    from geoutils_spark.operators.heavyhitters import heavy_hitters
    import pytest as _pt
    df = spark.createDataFrame([("a",)], ["term"])
    with _pt.raises(ValueError):
        heavy_hitters(df, "term", 1, 1)

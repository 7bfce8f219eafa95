"""Hashed-linear classifier inference (operators/classifier.py): the
broadcast learned-weights path and the zero-exchange formula path must
produce identical scores, with the plans each shape promises."""

from pyspark.sql import functions as F

from geoutils_spark.operators import classifier as CL

N = 1 << 12  # small bucket space so the fixture exercises collisions


def _docs(spark):
    return spark.createDataFrame(
        [(1, "the quick brown fox"),
         (2, "the the the the"),          # repeated token -> 4x its weight
         (3, "zyx unseen tokens qqq"),
         (4, "")],
        ["doc_id", "text"])


def test_broadcast_equals_rowlocal(spark):
    d = _docs(spark)
    w = CL.synthetic_weights_df(spark, n_buckets=N)
    a = {r["doc_id"]: r for r in
         CL.score_broadcast(d, w, n_buckets=N).collect()}
    b = {r["doc_id"]: r for r in
         CL.score_rowlocal(d, n_buckets=N).collect()}
    assert set(a) == set(b) == {1, 2, 3, 4}
    for k in a:
        assert a[k]["score"] == b[k]["score"], k
        assert a[k]["n_tokens"] == b[k]["n_tokens"], k
        assert a[k]["keep"] == b[k]["keep"], k
    # repeated token scores linearly
    one = CL.score_rowlocal(
        spark.createDataFrame([(9, "the")], ["doc_id", "text"]),
        n_buckets=N).collect()[0]
    assert a[2]["score"] == 4 * one["score"]


def test_plan_shapes(spark):
    d = _docs(spark)
    w = CL.synthetic_weights_df(spark, n_buckets=N)
    bplan = (CL.score_broadcast(d, w, n_buckets=N)
             ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in bplan, bplan
    assert "SortMergeJoin" not in bplan, bplan
    rplan = (CL.score_rowlocal(d, n_buckets=N)
             ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in rplan, rplan
    assert "Join" not in rplan, rplan


def test_pruned_model_same_result(spark):
    """Dropping zero-weight rows from the model changes nothing (left
    join + coalesce-0) — the real-model broadcast can ship sparse."""
    d = _docs(spark)
    w = CL.synthetic_weights_df(spark, n_buckets=N)
    pruned = w.filter(F.col("weight") != 0)
    full = sorted(CL.score_broadcast(d, w, n_buckets=N).collect())
    sparse = sorted(CL.score_broadcast(d, pruned, n_buckets=N).collect())
    assert full == sparse

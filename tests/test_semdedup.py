"""SemDeDup (operators/semdedup.py): cluster confinement, keep-lowest-id
drop rule, witness selection, keeper anti-join, plan shape."""

import math

from pyspark.sql import functions as F

from geoutils_spark.operators import semdedup as SD

DIM = 4


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, e array<double>")


# two well-separated directions; c10/c11 are the centroids
A = [1.0, 0.0, 0.0, 0.0]
B = [0.0, 1.0, 0.0, 0.0]


def _near(base, eps, j=2):
    v = list(base)
    v[j] += eps
    n = math.sqrt(sum(x * x for x in v))
    return v  # not normalized — cosine handles norms


def test_drop_rule_and_witness(spark):
    rows = [(10, A), (11, B),          # centroids
            (1, A), (2, _near(A, 1e-3)), (3, _near(A, 2e-3)),  # dup ball
            (4, B),                    # alone in cluster B with 11
            (5, [0.0, 0.0, 1.0, 0.0])]  # far from everything
    v = _vecs(spark, rows)
    cents = [(10, A), (11, B)]
    drops = {r["drop_id"]: r for r in
             SD.semdedup_drops(v, cents, threshold=0.999,
                               dim=DIM).collect()}
    # A-ball {1,2,3,10}: 1 is the lowest id -> kept; 2,3,10 dropped with
    # witness 1. B-cluster {4,11}: identical -> 11 (higher id) dropped,
    # witness 4. 5 is orthogonal to both centroids (tie -> cluster 10)
    # and near nothing -> kept.
    assert set(drops) == {2, 3, 10, 11}
    assert all(drops[i]["witness_id"] == 1 for i in (2, 3, 10))
    assert drops[11]["witness_id"] == 4
    assert all(d["cosine"] >= 0.999 for d in drops.values())


def test_identical_cross_cluster_not_compared(spark):
    # identical vectors forced into DIFFERENT clusters by construction
    # can't happen (same vector -> same argmax); instead: two similar
    # vectors straddling the cluster boundary are NOT a pair — the
    # documented SemDeDup recall limitation.
    mid1 = [1.0, 0.9, 0.0, 0.0]   # nearer A
    mid2 = [0.9, 1.0, 0.0, 0.0]   # nearer B, cos(mid1, mid2) ~ 0.994
    v = _vecs(spark, [(1, mid1), (2, mid2)])
    cents = [(10, A), (11, B)]
    drops = SD.semdedup_drops(v, cents, threshold=0.99, dim=DIM).collect()
    assert drops == []


def test_keepers_complement(spark):
    rows = [(1, A), (2, _near(A, 1e-3)), (3, B), (10, A), (11, B)]
    v = _vecs(spark, rows)
    cents = [(10, A), (11, B)]
    drops = {r["drop_id"] for r in
             SD.semdedup_drops(v, cents, 0.999, dim=DIM).collect()}
    kept = {r["vec_id"] for r in
            SD.semdedup_keepers(v, cents, 0.999, dim=DIM).collect()}
    assert kept | drops == {1, 2, 3, 10, 11}
    assert kept & drops == set()
    assert 1 in kept and 2 in drops


def test_threshold_boundary_exact(spark):
    # orthogonal vectors: cosine exactly 0.0 — kept at any positive t
    v = _vecs(spark, [(1, A), (2, B), (10, A)])
    cents = [(10, A)]
    # both in one cluster (single centroid); cos(A, B) = 0 < 0.5
    assert SD.semdedup_drops(v, cents, 0.5, dim=DIM).count() == 1  # only 10
    # threshold exactly 1.0: only the exact duplicate pair (1, 10)
    d = SD.semdedup_drops(v, cents, 1.0, dim=DIM).collect()
    assert [(r["drop_id"], r["witness_id"]) for r in d] == [(10, 1)]


def test_plan_no_cross_join(spark):
    v = _vecs(spark, [(i, _near(A, i * 1e-4)) for i in range(1, 30)])
    cents = [(1, A), (2, B)]
    plan = SD.semdedup_drops(v, cents, 0.99, dim=DIM)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

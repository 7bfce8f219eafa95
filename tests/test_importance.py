"""DSIR-style importance sampling (operators/importance.py): target-like
docs must outrank the background, selection must be partitioning-invariant,
and the ratio join must broadcast (corpus payload never shuffles)."""

from pyspark.sql import functions as F

from geoutils_spark.operators import importance as IM


def _corpus(spark):
    tgt_vocab = "quantum flux lattice boson entangled qubit decoherence"
    bg_vocab = "cheap deals buy now click here free shipping sale offer"
    rows = []
    # 5 target docs (pure target vocab)
    for i in range(5):
        rows.append((i, f"{tgt_vocab} {tgt_vocab} study {i}", "target"))
    # 10 target-LIKE corpus docs (mostly target vocab)
    for i in range(10, 20):
        rows.append((i, f"{tgt_vocab} report {bg_vocab.split()[0]}", "web"))
    # 40 background docs
    for i in range(100, 140):
        rows.append((i, f"{bg_vocab} {bg_vocab} page {i}", "web"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_target_like_docs_rank_first(spark):
    d = _corpus(spark)
    target = d.filter(F.col("source") == "target").select("doc_id", "text")
    corpus = d.filter(F.col("source") == "web").select("doc_id", "text")
    top = IM.importance_topk(corpus, target, k=10, n_buckets=1 << 12)
    ids = [r["doc_id"] for r in top.collect()]
    assert sorted(ids) == list(range(10, 20)), ids
    # and the scores beat every background doc's score
    scores = {r["doc_id"]: r["imp_score"]
              for r in IM.importance_scores(corpus, target,
                                            n_buckets=1 << 12).collect()}
    worst_target_like = min(scores[i] for i in range(10, 20))
    best_background = max(scores[i] for i in range(100, 140))
    assert worst_target_like > best_background


def test_partitioning_invariance(spark):
    d = _corpus(spark)
    target = d.filter(F.col("source") == "target").select("doc_id", "text")
    corpus = d.filter(F.col("source") == "web").select("doc_id", "text")
    a = IM.importance_topk(corpus, target, k=7, n_buckets=1 << 12).collect()
    b = IM.importance_topk(corpus.repartition(13), target.repartition(3),
                           k=7, n_buckets=1 << 12).collect()
    assert [(r["doc_id"], r["imp_score"]) for r in a] == \
           [(r["doc_id"], r["imp_score"]) for r in b]


def test_ratio_join_broadcasts(spark):
    d = _corpus(spark)
    target = d.filter(F.col("source") == "target").select("doc_id", "text")
    corpus = d.filter(F.col("source") == "web").select("doc_id", "text")
    plan = (IM.importance_scores(corpus, target, n_buckets=1 << 12)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_unseen_bucket_floor_ratio(spark):
    """Buckets the target never saw get the floor ratio SCALE // (cnt+1),
    never a missing row (the raw side is the outer side)."""
    corpus = spark.createDataFrame(
        [(1, "aaa bbb"), (2, "aaa aaa")], "doc_id long, text string")
    target = spark.createDataFrame([(9, "zzz")], "doc_id long, text string")
    ratios = sorted(
        r["r"] for r in IM.importance_ratios(corpus, target,
                                             n_buckets=1 << 12).collect())
    # 4 distinct features: aaa (x3), bbb (x1), "aaa bbb" (x1), "aaa aaa"
    # (x1); target saw none, so each r is the smoothed floor SCALE//(cnt+1)
    assert ratios == [IM.SCALE // 4, IM.SCALE // 2,
                      IM.SCALE // 2, IM.SCALE // 2], ratios
    scores = IM.importance_scores(corpus, target, n_buckets=1 << 12)
    got = {r["doc_id"]: r["n_features"] for r in scores.collect()}
    # unigrams + bigrams: "aaa bbb" -> 3 features, "aaa aaa" -> 3
    assert got == {1: 3, 2: 3}

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geoutils_spark.functions import textanalysis as TA


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat and the dog ran off"),
        (1, "der hund und die katze und das haus"),
        (2, "le chat est sur le toit et la maison"),
        (3, "xyzzy plugh foobar"),
        (4, "numbers 123 and 456 mixed with words, punct! yes."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_langid(docs):
    out = {r.doc_id: r.lang for r in docs.select(
        "doc_id", TA.langid_col(TA.tokens_col(F.col("text"))).alias("lang")).collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "fr"
    assert out[3] == "und"


def test_quality_cols(docs):
    q = TA.quality_cols(F.col("text"))
    r = {x.doc_id: x for x in docs.select("doc_id", *[c.alias(n) for n, c in q.items()]).collect()}
    assert r[0].n_tokens == 11
    assert r[0].stopword_ratio == pytest.approx(4 / 11)  # the x3, and
    assert r[3].stopword_ratio == 0.0
    assert r[4].digit_ratio > 0


def test_quality_gate(docs):
    out = {r.doc_id: r.keep for r in docs.select(
        "doc_id", TA.quality_keep_col(F.col("text"), min_tokens=5).alias("keep")).collect()}
    assert out[0] is True
    assert out[3] is False  # no stopwords


def test_shingles_and_fingerprint(docs):
    out = {r.doc_id: r for r in docs.select(
        "doc_id",
        TA.word_shingles_col(F.col("text"), 3).alias("sh"),
        TA.fingerprint_col(F.col("text")).alias("fp"),
    ).collect()}
    # n tokens -> n-2 trigram shingles (doc 0 has no repeats except none)
    assert len(out[0].sh) == 9
    assert out[3].sh == ["xyzzy plugh foobar"]
    # deterministic: recompute equals
    again = {r.doc_id: r.fp for r in docs.select(
        "doc_id", TA.fingerprint_col(F.col("text")).alias("fp")).collect()}
    assert all(again[k] == out[k].fp for k in again)


def test_short_text_shingle_is_whole_text(spark):
    df = spark.createDataFrame([(0, "one two")], "doc_id long, text string")
    sh = df.select(TA.word_shingles_col(F.col("text"), 3).alias("sh")).collect()[0].sh
    assert sh == ["one two"]


def test_subtoken_counts(docs):
    a, d, m = TA.subtoken_counts_col(F.col("text"))
    r = docs.filter(F.col("doc_id") == 4).select(
        a.alias("a"), d.alias("d"), m.alias("m")).collect()[0]
    assert r.a == 7  # numbers, and, mixed, with, words, punct, yes
    assert r.d == 2  # 123, 456
    assert r.m == 3  # comma, bang, period


def test_lm_and_tfidf_vocab_tables_broadcast(spark):
    """text_lm_score / text_tfidf_topterms join their vocab-sized count
    tables via BroadcastHashJoin (r3 VERDICT #5): the exploded corpus
    side must never shuffle for a count-table join — before the hint it
    exchanged corpus-wide once per join key."""
    from geoutils_spark import queries as Q

    for name in ("text_lm_score", "text_tfidf_topterms"):
        df = Q.SPARK_QUERIES[name](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, (name, plan)
        assert "SortMergeJoin" not in plan, (name, plan)


# ----------------------------------------------------------------- sentences

def test_sentences_edges(spark):
    cases = [
        ("One two. Three four! Five? Six.",
         ["One two.", "Three four!", "Five?", "Six."]),
        ("no terminator at all", ["no terminator at all"]),
        ("", []),                                  # empty text -> no sentences
        ("Spaced.   Out.", ["Spaced.", "Out."]),   # multi-space boundary
        ("Ell... ipsis. End.", ["Ell...", "ipsis.", "End."]),
        ("Mr. Smith went.", ["Mr.", "Smith went."]),  # documented: no lexicon
    ]
    import pyspark.sql.functions as F
    from geoutils_spark.functions import textanalysis as TA
    df = spark.createDataFrame(
        [(t, w) for t, w in cases], ["t", "want"]).select(
        TA.sentences_col(F.col("t")).alias("got"), "want")
    for r in df.collect():
        assert r["got"] == r["want"], (r["got"], r["want"])


def test_script_profile(spark):
    import pyspark.sql.functions as F
    from geoutils_spark.functions import textanalysis as TA
    cases = [
        ("hello мир", "Latin"),          # 5 latin > 3 cyrillic
        ("ab мир", "Cyrillic"),
        ("你好世界", "Han"),
        ("123 !!!", "none"),             # no scripted chars
        ("ab яз", "Latin"),              # tie 2-2 -> SCRIPT_ORDER
    ]
    df = spark.createDataFrame(cases, ["t", "want"]).select(
        TA.dominant_script_col(F.col("t")).alias("got"), "want")
    for r in df.collect():
        assert r["got"] == r["want"], (r["got"], r["want"])


def test_winnow_guarantee_and_bounds(spark):
    """Winnowing invariants (Schleimer et al. 2003): (a) two documents
    sharing a substring of length >= w + k - 1 share >= 1 fingerprint;
    (b) selection density is bounded (roughly 2/(w+1)); (c) docs shorter
    than the first window emit nothing; (d) decoded positions are valid
    gram indexes."""
    from pyspark.sql import functions as F

    from geoutils_spark.functions.textanalysis import winnow_keys_col

    k, w = 5, 8
    shared = "the quick brown fox jumps over it"   # 33 chars > w + k - 1
    a = "AAAA " + shared + " padding tail one two three"
    b = "completely different head text | " + shared + " | zzz"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, "tiny")],
        "doc_id long, text string")
    ex = df.select(
        "doc_id",
        (F.length("text") - F.lit(k - 1)).cast("long").alias("n"),
        F.explode(winnow_keys_col(F.col("text"), k, w)).alias("key"))
    rows = ex.select(
        "doc_id", "n",
        F.shiftright("key", 16).alias("fp"),
        (F.col("n") - F.col("key").bitwiseAND(F.lit(65535))).alias("pos"),
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 3 not in by_doc                       # too short: no windows
    fps1 = {r["fp"] for r in by_doc[1]}
    fps2 = {r["fp"] for r in by_doc[2]}
    assert fps1 & fps2                           # guarantee (a)
    for d in (1, 2):
        n = by_doc[d][0]["n"]
        n_windows = n - w + 1
        assert len(by_doc[d]) <= n_windows       # can't select more than 1/window
        assert len(by_doc[d]) >= n_windows // w  # at least one per w windows
        for r in by_doc[d]:
            assert 1 <= r["pos"] <= n            # valid gram index


def test_winnow_single_hash_pass_plan(spark):
    """Pin the lambda-binding barrier (winnow_keys_col shape note): the
    gram-hash transform must appear EXACTLY ONCE in the optimized plan
    even under an explode consumer. If CollapseProject ever re-inlines
    the keys array into the per-window slice lambda the plan grows one
    md5 per reference and evaluation degrades O(n*w) -> O(n^2) (the
    40 s -> timeout regression at sf0.1 this guards against)."""
    from pyspark.sql import functions as F

    from geoutils_spark.functions.textanalysis import winnow_keys_col

    df = spark.createDataFrame(
        [(1, "some reasonably long text for the plan shape test")],
        "doc_id long, text string")
    ex = df.select(
        "doc_id", F.explode(winnow_keys_col(F.col("text"), 5, 8)).alias("k"))
    plan = ex._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("md5") == 1, plan


def test_pmi_pair_expansion_window(spark):
    """Pair expansion must produce exactly the unordered token pairs at
    distance 1..3 (zip-against-shifted-slice trick), and PMI must match
    the hand formula on a tiny corpus."""
    import math

    from geoutils_spark.queries import SPARK_QUERIES
    import tempfile, os
    tmp = tempfile.mkdtemp()
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b a b x")],
        "doc_id long, text string")
    df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    out = {(r["a"], r["b"]): (r["cab"], r["pmi"])
           for r in SPARK_QUERIES["text_pmi_pairs"](spark, tmp).collect()}
    # doc1 distance<=3 pairs: ab ac ad bc bd be cd ce de; doc2: ab aa ab
    # ba bb ab bx ax ... enumerate by hand:
    def pairs(toks, d=3):
        out = []
        for i in range(len(toks)):
            for j in range(i + 1, min(i + d, len(toks) - 1) + 1):
                out.append(tuple(sorted((toks[i], toks[j]))))
        return out
    all_pairs = pairs("a b c d e".split()) + pairs("a b a b x".split())
    from collections import Counter
    cnt = Counter(all_pairs)
    toks = "a b c d e".split() + "a b a b x".split()
    uni = Counter(toks)
    N, P = len(toks), len(all_pairs)
    top = cnt.most_common()
    for (a, b), cab in top:
        want = math.log((cab / P) / ((uni[a] / N) * (uni[b] / N)))
        got_cab, got_pmi = out[(a, b)]
        assert got_cab == cab, (a, b, got_cab, cab)
        assert abs(got_pmi - round(want, 6)) < 2e-6, (a, b, got_pmi, want)
    assert len(out) == len(cnt) if len(cnt) <= 25 else 25

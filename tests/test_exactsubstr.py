"""ExactSubstr span removal (operators/exactsubstr.py): maximal-span
coverage semantics, self-repeats, byte-lossless untouched docs, and the
survivors-only plan shape — edges the oracle's synthetic corpus can't
pin deterministically."""

from pyspark.sql import functions as F

from geoutils_spark.operators import exactsubstr as XS


def _cut(spark, rows, k):
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = XS.remove_duplicate_spans(d, k=k).collect()
    return {r["doc_id"]: r for r in out}


def test_cross_doc_maximal_span(spark):
    # a 6-token span shared by docs 1 and 2 with k=4: every 4-window
    # inside it duplicates, so the WHOLE 6-token span is cut from BOTH.
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [(1, f"one two {shared} three"),
            (2, f"{shared} four five"),
            (3, "totally different text here entirely now")]
    out = _cut(spark, rows, k=4)
    assert out[1]["text_clean"] == "one two three"
    assert out[1]["n_removed"] == 6
    assert out[2]["text_clean"] == "four five"
    assert out[2]["n_removed"] == 6
    assert out[3]["n_removed"] == 0


def test_self_repeat_cuts_all_copies(spark):
    span = "w x y z"
    rows = [(1, f"{span} mid1 mid2 {span} tail")]
    out = _cut(spark, rows, k=4)
    assert out[1]["text_clean"] == "mid1 mid2 tail"
    assert out[1]["n_removed"] == 8


def test_untouched_doc_byte_identical(spark):
    # double spaces / trailing space survive because untouched docs
    # return the ORIGINAL text column, not a rejoin
    weird = "a  b   c "
    rows = [(1, weird), (2, "x y z w v u t s")]
    out = _cut(spark, rows, k=4)
    assert out[1]["text_clean"] == weird
    assert out[2]["n_removed"] == 0


def test_shorter_than_k_never_cut(spark):
    rows = [(1, "same short"), (2, "same short")]
    out = _cut(spark, rows, k=4)
    assert out[1]["n_removed"] == 0 and out[2]["n_removed"] == 0


def test_fully_duplicated_doc_empties(spark):
    t = "p q r s t u"
    out = _cut(spark, [(1, t), (2, t)], k=4)
    assert out[1]["text_clean"] == "" and out[1]["n_removed"] == 6
    assert out[2]["text_clean"] == ""


def test_overlapping_distinct_dup_windows_union(spark):
    # doc 1 holds "a b c d e": "a b c d" duplicates with doc 2,
    # "b c d e" with doc 3 — the UNION [0,5) is cut from doc 1.
    rows = [(1, "a b c d e"), (2, "z1 a b c d"), (3, "b c d e z2")]
    out = _cut(spark, rows, k=4)
    assert out[1]["text_clean"] == ""
    assert out[1]["n_removed"] == 5
    assert out[2]["text_clean"] == "z1"
    assert out[3]["text_clean"] == "z2"


def test_plan_broadcast_survivors_no_payload_shuffle(spark):
    d = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3} tok{i+4}")
         for i in range(50)], "doc_id long, text string")
    plan = XS.remove_duplicate_spans(d, k=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # dup vocabulary joins broadcast


def test_cut_spans_matches_remove_and_survives_persist(spark):
    """Regression for the Spark 4.1 indexed-HOF mis-binding: the old
    ``transform(filter(sequence(...)), i -> element_at(toks, i+1))``
    rebuild crashed with INVALID_ARRAY_INDEX when the chain was also
    referenced from the min_tokens_left row Filter and the frame was
    persisted (element_at read another row's array). The positional
    ``_kept_tokens`` kernel must (a) materialize cleanly through a
    persist and (b) agree token-for-token with the oracle-checked
    remove_duplicate_spans on every surviving doc."""
    from geoutils_spark.sources import fixtures

    docs = fixtures.corpus_smoke_df(spark, 600)
    cut = XS.cut_spans(docs, k=12).persist()
    try:
        got = {r["doc_id"]: r for r in cut.collect()}
        ref = {r["doc_id"]: r
               for r in XS.remove_duplicate_spans(docs, k=12).collect()}
        assert got, "cut_spans returned nothing"
        for doc_id, r in got.items():
            assert r["text"] == ref[doc_id]["text_clean"], doc_id
            assert r["n_cut_tokens"] == ref[doc_id]["n_removed"], doc_id
        # dropped rows are exactly the docs cut below min_tokens_left
        dropped = set(ref) - set(got)
        for doc_id in dropped:
            toks = [t for t in ref[doc_id]["text_clean"].split(" ")]
            assert ref[doc_id]["n_removed"] > 0 and len(
                [t for t in toks if toks != ['']]) <= 1 or toks == ['']
    finally:
        cut.unpersist()

"""BPE merge training (operators/bpe.py): apply-semantics edges (greedy
non-overlap, shared-separator adjacency, self-overlap), the count-vs-apply
convention, tie determinism, and early stop — pinned beyond what the
unrolled oracle's corpus exercises."""

from pyspark.sql import functions as F

from geoutils_spark.operators import bpe as B


def _apply(spark, syms, pair):
    df = spark.createDataFrame([(s,) for s in syms], "sym string")
    out = df.select("sym", B.apply_merge_col(F.col("sym"), F.lit(pair))
                    .alias("m")).collect()
    return {r["sym"]: r["m"] for r in out}


def test_apply_greedy_non_overlapping(spark):
    got = _apply(spark, ["a a a", "a a a a", "x a a y"], "a a")
    assert got["a a a"] == "aa a"          # self-overlap: left-to-right
    assert got["a a a a"] == "aa aa"
    assert got["x a a y"] == "x aa y"


def test_apply_adjacent_occurrences_share_separator(spark):
    # 'a b a b': naive replace of ' a b ' would eat the shared space and
    # miss the second occurrence — the double-space trick must not
    got = _apply(spark, ["a b a b", "a b a b a b"], "a b")
    assert got["a b a b"] == "ab ab"
    assert got["a b a b a b"] == "ab ab ab"


def test_apply_symbol_boundaries_respected(spark):
    # 'xa b' must NOT merge on pair 'a b' ('a' is a suffix of symbol 'xa')
    got = _apply(spark, ["xa b", "a bx", "xa bx"], "a b")
    assert got == {"xa b": "xa b", "a bx": "a bx", "xa bx": "xa bx"}


def test_apply_multichar_symbols(spark):
    got = _apply(spark, ["th e c at", "th e th e"], "th e")
    assert got["th e c at"] == "the c at"
    assert got["th e th e"] == "the the"


def test_pair_counts_per_position(spark):
    vocab = spark.createDataFrame([("a a a", 2), ("b a", 3)],
                                  "sym string, n long")
    got = {r["pair"]: r["n"]
           for r in B.pair_counts(vocab).collect()}
    # 'a a a' holds TWO per-position 'a a' pairs, weighted by n=2
    assert got == {"a a": 4, "b a": 3}


def test_train_merges_tie_and_early_stop(spark):
    # both pairs count 2 -> tie broken by pair asc; after two merges every
    # word is a single symbol -> loop stops early
    docs = spark.createDataFrame([(1, "ab ab cd cd")], "i long, text string")
    vocab = B.word_counts(docs)
    merges = B.train_merges(vocab, 10)
    assert merges == [(1, "a b", 2), (2, "c d", 2)]


def test_word_counts_cap_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "z z z y y x w")], "i long, text string")
    vocab = B.word_counts(docs, top_words=2).collect()
    assert sorted((r["sym"], r["n"]) for r in vocab) == [("y", 2), ("z", 3)]


def test_encode_applies_merges_in_order(spark):
    # corpus 'ab ab abc': training picks 'a b' first (count 3), then
    # 'ab c' (count 1). Encoding 'abc ab' must produce tokens
    # [abc, ab] — the second merge builds ON the first's output, and
    # the boundary sentinel keeps 'b a' (across the word gap) unmergeable
    # even if it were in the table.
    docs = spark.createDataFrame([(1, "ab ab abc")], "i long, text string")
    merges = [p for _, p, _ in B.train_merges(B.word_counts(docs), 2)]
    assert merges == ["a b", "ab c"]
    enc = spark.createDataFrame(
        [(1, "abc ab"), (2, ""), (3, "b a")], "doc_id long, text string"
    ).select(
        "doc_id",
        B.encode_col(F.col("text"), merges).alias("sym"),
        B.token_count_col(B.encode_col(F.col("text"), merges)).alias("n"))
    got = {r["doc_id"]: (r["sym"], r["n"]) for r in enc.collect()}
    assert got[1] == ("abc \x1f ab", 2)
    assert got[2] == ("", 0)            # empty text -> zero tokens
    # 'b a' spans the word boundary: stays two single-char tokens
    assert got[3] == ("b \x1f a", 2)


def test_encode_matches_vocab_training_rewrite(spark):
    # Property: encoding a single word == the training-side vocabulary
    # rewrite after the same merges (same apply_merge_col fold).
    words = ["banana", "bandana", "cabana", "nab"]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string")
    merges = [p for _, p, _ in B.train_merges(B.word_counts(docs), 4)]
    enc = docs.select(
        "doc_id", B.encode_col(F.col("text"), merges).alias("sym")).collect()
    from pyspark.sql import Row
    vocab = spark.createDataFrame(
        [Row(sym=" ".join(w), n=1) for w in words])
    cur = vocab
    for p in merges:
        cur = cur.select(
            B.apply_merge_col(F.col("sym"), F.lit(p)).alias("sym"), "n")
    for r in enc:
        assert r["sym"].replace(" ", "") == words[r["doc_id"]]
    # exact per-word equality against the vocabulary rewrite:
    by_word = {words[r["doc_id"]]: r["sym"] for r in enc}
    for r in cur.collect():
        w = r["sym"].replace(" ", "")
        assert by_word[w] == r["sym"]

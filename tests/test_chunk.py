"""Fixed-window chunking (operators/chunk.py): window math edges and the
zero-exchange plan shape."""

import pytest
from pyspark.sql import functions as F

from geoutils_spark.operators import chunk as CH


def _chunks(spark, text, size, stride):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = CH.chunk_documents(df, size=size, stride=stride).collect()
    return [(r["chunk_id"], r["n_tokens"], r["chunk"]) for r in
            sorted(out, key=lambda r: r["chunk_id"])]


def test_overlap_windows(spark):
    text = "a b c d e f g h i j"            # 10 tokens
    got = _chunks(spark, text, size=4, stride=3)
    assert got == [(0, 4, "a b c d"), (1, 4, "d e f g"),
                   (2, 4, "g h i j"), (3, 1, "j")]


def test_exact_multiple_no_empty_tail(spark):
    got = _chunks(spark, "a b c d", size=2, stride=2)
    assert got == [(0, 2, "a b"), (1, 2, "c d")]


def test_short_and_empty_docs(spark):
    assert _chunks(spark, "solo", size=8, stride=8) == [(0, 1, "solo")]
    assert _chunks(spark, "", size=8, stride=8) == []


def test_no_overlap_gap_free_coverage(spark):
    text = " ".join(f"t{i}" for i in range(17))
    got = _chunks(spark, text, size=5, stride=5)
    assert " ".join(c for _, _, c in got) == text
    assert [n for _, n, _ in got] == [5, 5, 5, 2]


def test_invalid_params_raise(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        CH.chunk_documents(df, size=0, stride=1)
    with pytest.raises(ValueError):
        CH.chunk_documents(df, size=4, stride=0)


def test_zero_exchange_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = CH.chunk_documents(df, size=2, stride=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

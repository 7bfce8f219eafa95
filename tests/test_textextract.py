"""Byte-identical text extraction (BASELINE.json per-row invariant)."""

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from geoutils_spark.functions.textextract import (
    extract_text, extract_text_series, extract_text_udf,
)

CASES = [
    (
        b"<html><head><title>T</title><script>var x=1;</script>"
        b"<style>p{}</style></head><body><h1>Hello</h1>"
        b"<p>a &amp; b &lt;c&gt; &#8364;5 &#x41;</p><!-- hidden -->"
        b"<div>tail  text</div></body></html>",
        "T\nHello\na & b <c> €5 A\ntail text",
    ),
    (b"plain no tags", "plain no tags"),
    (b"<p>only</p>", "only"),
    (b"a<br>b<BR/>c", "a\nb\nc"),
    (b"x &nbsp; y", "x y"),
    (b"\xff\xfebad utf8 <b>ok</b>", "��bad utf8 ok"),
    (b"", ""),
]


def test_scalar_goldens():
    for html, want in CASES:
        assert extract_text(html) == want, html


def test_series_matches_scalar():
    s = extract_text_series(pd.Series([h for h, _ in CASES]))
    assert list(s) == [w for _, w in CASES]


def test_udf_matches_scalar(spark):
    df = spark.createDataFrame([(h,) for h, _ in CASES], "html binary")
    got = [r.t for r in df.select(extract_text_udf("html").alias("t")).collect()]
    assert got == [w for _, w in CASES]


def test_fixture_pages_text_is_reproducible(spark):
    """Re-extraction must reproduce the pinned golden text byte-for-byte."""
    from geoutils_spark.sources.fixtures import pages_df

    df = pages_df(spark, 300)
    p = df.select("page_id", "html", "text").orderBy("page_id").toPandas()
    re_ext = extract_text_series(p.html)
    assert (re_ext == p.text).all()
    # stable digest over the whole corpus — deterministic across runs
    digest = hashlib.sha256("\x00".join(p.text).encode()).hexdigest()
    p2 = pages_df(spark, 300).select("page_id", "text").orderBy("page_id").toPandas()
    digest2 = hashlib.sha256("\x00".join(p2.text).encode()).hexdigest()
    assert digest == digest2


def test_fast_passes_byte_identical_fuzz():
    """The fused named-entity pass and the skip-noop hspace/nlrun patterns
    must be byte-identical to the original sequential formulation — fuzzed
    with hypothesis over entity-dense and whitespace-dense strings."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from geoutils_spark.functions.textextract import (
        extract_text_series,
        extract_text_series_v1_reference,
    )

    atoms = st.sampled_from([
        "&amp;", "&lt;", "&gt;", "&quot;", "&apos;", "&nbsp;", "&", ";",
        "&#38;", "&#x26;", "&#8364;", "&amp;lt;", "&&amp;nbsp;", "amp;",
        " ", "  ", "\t", "\n", "\n\n", " \n", "\r", "x", "yz", "<p>", "</p>",
        "<script>a</script>", "<!--c-->", "<b>", "q",
    ])

    @settings(max_examples=300, deadline=None)
    @given(st.lists(atoms, min_size=0, max_size=30))
    def check(parts):
        s = pd.Series(["".join(parts).encode()])
        assert extract_text_series(s).iloc[0] == \
            extract_text_series_v1_reference(s).iloc[0]

    check()


def test_fast_passes_byte_identical_fixture_corpus(spark):
    from pyspark.sql import functions as F

    from geoutils_spark.functions.textextract import (
        extract_text_series,
        extract_text_series_v1_reference,
    )
    from geoutils_spark.sources.fixtures import pages_df

    html = pages_df(spark, 500).select("html").toPandas().html
    a = extract_text_series(html)
    b = extract_text_series_v1_reference(html)
    assert (a == b).all()

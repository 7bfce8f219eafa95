"""Hyperlink extraction/resolution (functions/links.py): scheme
handling, relative-link base resolution, duplicate preservation."""

from pyspark.sql import functions as F

from geoutils_spark.functions import links as LK


def _resolve(spark, html, base="base.example"):
    df = spark.createDataFrame([(html, base)], "html string, host string")
    out = df.select(
        F.explode(LK.extract_hrefs_col(F.col("html"))).alias("link"))
    out = out.select(
        "link",
        LK.resolve_host_col(F.col("link"), F.lit(base)).alias("dst"))
    return [(r["link"], r["dst"]) for r in out.collect()]


def test_absolute_and_relative(spark):
    html = ('<a href="https://a.example/x">1</a>'
            '<a href="http://b.example">2</a>'
            '<a href="/rooted/path">3</a>'
            '<a href="rel/page.html">4</a>'
            '<a href="#frag">5</a>'
            '<a href="?q=1">6</a>')
    got = _resolve(spark, html)
    assert got == [
        ("https://a.example/x", "a.example"),
        ("http://b.example", "b.example"),
        ("/rooted/path", "base.example"),
        ("rel/page.html", "base.example"),
        ("#frag", "base.example"),
        ("?q=1", "base.example"),
    ]


def test_protocol_relative_and_dead_schemes(spark):
    html = ('<a href="//cdn.example/lib.js">1</a>'
            '<a href="mailto:x@y.example">2</a>'
            '<a href="javascript:void(0)">3</a>'
            '<a href="data:text/plain,hi">4</a>'
            '<a href="tel:+15551234">5</a>')
    got = _resolve(spark, html)
    assert got[0] == ("//cdn.example/lib.js", "cdn.example")
    assert all(dst == "" for _, dst in got[1:])


def test_duplicates_and_order_kept(spark):
    html = ('<a href="https://a.example/1">x</a>'
            '<a href="https://a.example/1">x</a>'
            '<a href="https://b.example/2">y</a>')
    got = _resolve(spark, html)
    assert [d for _, d in got] == ["a.example", "a.example", "b.example"]


def test_no_links_empty_array(spark):
    df = spark.createDataFrame([("<html><p>plain</p></html>",)],
                               "html string")
    n = df.select(F.size(LK.extract_hrefs_col(F.col("html"))).alias("n")) \
        .collect()[0]["n"]
    assert n == 0


def _pairs(spark, html):
    df = spark.createDataFrame([(html,)], "html string")
    row = df.select(
        LK.extract_anchor_pairs_col(F.col("html")).alias("p")).first()
    return [(p["link"], p["anchor"]) for p in row["p"]]


def test_anchor_pairs_basic(spark):
    html = ('<a href="https://a.example/x" class="nav">Go Here</a>'
            '<a href="/rel">home</a>')
    assert _pairs(spark, html) == [("https://a.example/x", "Go Here"),
                                   ("/rel", "home")]


def test_anchor_pairs_image_anchor_empty(spark):
    # child-element anchors (<img>) don't match the [^<]* text pattern:
    # they surface as no pair at all, matching the oracle twin exactly
    html = '<a href="https://a.example/i"><img src="p.png"/></a>'
    assert _pairs(spark, html) == []


def test_anchor_pairs_attribute_order(spark):
    # href not first attribute still extracts
    html = '<a class="x" href="https://b.example/y">label</a>'
    assert _pairs(spark, html) == [("https://b.example/y", "label")]


def test_anchor_pairs_no_space_no_match(spark):
    # malformed '<ahref=' never matches
    assert _pairs(spark, '<ahref="https://a.example">z</a>') == []


def test_label_propagation_two_communities(spark):
    """Two triangles bridged by one edge: LPA with the deterministic
    tie rule must match a pure-python replay of the same rule, and the
    triangles must end up in (at most) two internally-uniform
    communities."""
    from collections import Counter

    from geoutils_spark.operators.labelprop import label_propagation

    e = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (2, 10)]
    df = spark.createDataFrame(e, "src long, dst long")
    got = {r["node"]: r["label"]
           for r in label_propagation(df, rounds=3).collect()}

    und = {}
    for a, b in e:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    labels = {v: v for v in und}
    for _ in range(3):
        nxt = {}
        for v, nbrs in und.items():
            cnt = Counter(labels[n] for n in nbrs)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        labels = nxt
    assert got == labels
    assert len({got[v] for v in (0, 1, 2)}) == 1      # triangle 1 uniform
    assert len({got[v] for v in (10, 11, 12)}) == 1   # triangle 2 uniform

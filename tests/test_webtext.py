"""URL parsing/normalization (functions/urls.py) and PII redaction
(functions/pii.py): edge semantics the oracle's synthetic corpus can't
reach — non-URLs, ports, bare hosts, overlap-order, boundary anchoring."""

from pyspark.sql import functions as F

from geoutils_spark.functions import pii as PII
from geoutils_spark.functions import urls as U


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], ["s"]).select(
        col(F.col("s")).alias("out")).collect()[0]["out"]


# ---------------------------------------------------------------------- urls

def test_url_parts(spark):
    url = "https://Sub3.site42.example/en/page9/?ref=r2#sec"
    df = spark.createDataFrame([(url,)], ["u"]).select(
        U.url_host_col(F.col("u")).alias("host"),
        U.url_path_col(F.col("u")).alias("path"),
        U.url_param_col(F.col("u"), "ref").alias("ref"),
    ).collect()[0]
    assert df["host"] == "Sub3.site42.example"
    assert df["path"] == "/en/page9/"
    assert df["ref"] == "r2"
    low = "sub3.site42.example"
    row = spark.createDataFrame([(low,)], ["h"]).select(
        U.url_domain_col(F.col("h")).alias("d"),
        U.url_tld_col(F.col("h")).alias("t"),
    ).collect()[0]
    assert row["d"] == "site42.example"
    assert row["t"] == "example"


def test_url_non_url_and_port(spark):
    assert _one(spark, "not a url", U.url_host_col) == ""
    assert _one(spark, "http://h.example:8080/x", U.url_host_col) == "h.example:8080"
    # tld regex is port-safe
    assert _one(spark, "h.example:8080", U.url_tld_col) == "example"
    # bare host (no path) -> empty path, depth 0
    assert _one(spark, "https://h.example", U.url_path_col) == ""
    assert _one(spark, "", lambda c: U.url_depth_col(c)) == 0


def test_url_depth(spark):
    assert _one(spark, "/a/b/c", U.url_depth_col) == 3
    assert _one(spark, "/a/b/", U.url_depth_col) == 2
    assert _one(spark, "/", U.url_depth_col) == 0


def test_url_uppercase_scheme(spark):
    """RFC 3986 schemes are case-insensitive; crawl data contains HTTP://.
    Host/path must parse and normalize must lowercase the scheme (r3
    ADVICE item, urls.py SCHEME_RE)."""
    assert _one(spark, "HTTP://H.Example/x", U.url_host_col) == "H.Example"
    assert _one(spark, "HTTP://h.example/A/b", U.url_path_col) == "/A/b"
    assert (_one(spark, "HTTPS://A.Example/Path#f", U.url_normalize_col)
            == "https://a.example/Path")


def test_url_normalize(spark):
    cases = {
        # fragment stripped, scheme+host lowercased, path case kept
        "https://A.Example/Path#frag": "https://a.example/Path",
        # trailing slash dropped once
        "https://a.example/p/": "https://a.example/p",
        # query survives; slash before ? is not trailing
        "https://a.example/p/?x=1": "https://a.example/p/?x=1",
        # non-URL passes through untouched
        "plain text": "plain text",
    }
    for raw, want in cases.items():
        assert _one(spark, raw, U.url_normalize_col) == want, raw


# ----------------------------------------------------------------------- pii

def test_pii_counts_and_redact(spark):
    text = ("reach a@b.example or c.d+e@f.example, call 212-555-0186, "
            "server at 10.0.42.1 end")
    row = spark.createDataFrame([(text,)], ["s"]).select(
        *[c.alias(n) for n, c in PII.pii_count_cols(F.col("s")).items()],
        PII.redact_col(F.col("s")).alias("red"),
        PII.has_pii_col(F.col("s")).alias("has"),
    ).collect()[0]
    assert (row["n_email"], row["n_phone"], row["n_ip"]) == (2, 1, 1)
    assert row["has"] is True
    assert row["red"] == ("reach <EMAIL> or <EMAIL>, call <PHONE>, "
                          "server at <IP> end")


def test_pii_boundaries(spark):
    # \b anchoring: longer digit runs are not phones/IPs
    assert _one(spark, "id 1212-555-01867 x", PII.redact_col) == "id 1212-555-01867 x"
    # known \b limitation (RE2 has no lookbehind to rule it out): a version
    # string's tail "2.3.4.5" sits after a '.' boundary and reads as an IP
    assert _one(spark, "v1.2.3.4.5", PII.redact_col) == "v1.<IP>"
    # IP at string edges
    assert _one(spark, "1.2.3.4", PII.redact_col) == "<IP>"
    # no PII -> untouched, gate false
    clean = "just words here"
    assert _one(spark, clean, PII.redact_col) == clean
    assert _one(spark, clean, PII.has_pii_col) is False


def test_pii_email_swallows_before_phone(spark):
    # redaction order email-first: the email's domain dots never get
    # mistaken for an IP fragment
    assert _one(spark, "x a1@2.3.co y", PII.redact_col) == "x <EMAIL> y"


# ----------------------------------------------------------------- blocklist

def test_host_suffixes(spark):
    out = _one(spark, "a.B.c.Example", U.host_suffixes_col)
    assert out == ["a.b.c.example", "b.c.example", "c.example", "example"]
    assert _one(spark, "localhost", U.host_suffixes_col) == ["localhost"]


def test_blocklist_filter_subdomain_case_invert(spark):
    d = spark.createDataFrame(
        [(1, "https://ads.tracker.example/x"),
         (2, "https://news.example.org/story"),
         (3, "http://TRACKER.example/y"),
         (4, "https://example.com/"),
         (5, "not a url")],
        "doc_id long, url string")
    blocked = spark.createDataFrame([("tracker.example",), ("SPAM.net",)],
                                    "domain string")
    kept = sorted(r["doc_id"] for r in
                  U.blocklist_filter(d, blocked).collect())
    assert kept == [2, 4, 5]  # 1 via subdomain suffix, 3 via lowercase
    audit = sorted(r["doc_id"] for r in
                   U.blocklist_filter(d, blocked, invert=True).collect())
    assert audit == [1, 3]
    # empty blocklist keeps everything
    empty = spark.createDataFrame([], "domain string")
    assert U.blocklist_filter(d, empty).count() == 5
    # literal-list row-local twin agrees
    flag = d.select("doc_id", U.blocklist_flag_col(
        U.url_host_col(F.col("url")),
        ["tracker.example", "spam.net"]).alias("b")).collect()
    assert sorted(r["doc_id"] for r in flag if r["b"]) == [1, 3]


def test_blocklist_filter_plan_broadcast_only(spark):
    d = spark.createDataFrame([(i, f"https://h{i}.example/") for i in
                               range(20)], "doc_id long, url string")
    blocked = spark.createDataFrame([("h3.example",)], "domain string")
    plan = U.blocklist_filter(d, blocked)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_surt_key_canonicalization(spark):
    from geoutils_spark.functions import urls as U

    df = spark.createDataFrame(
        [("https://Sub.Site.Example/A/B?b=2&a=1",),
         ("https://sub.site.example/a/b?a=1&b=2#frag",),
         ("https://site.example",),
         ("http://x.example/p?only=1",)], "url string")
    got = [r["s"] for r in
           df.select(U.surt_key_col(F.col("url")).alias("s")).collect()]
    # param order + case + fragment collapse to ONE key
    assert got[0] == got[1] == "example,site,sub)/a/b?a=1&b=2"
    assert got[2] == "example,site)/"
    assert got[3] == "example,x)/p?only=1"
    # domain-contiguity: keys of one registered domain share a prefix
    assert got[0].startswith("example,site") and got[2].startswith("example,site")


# ------------------------------------------------------------------ pagemeta

def test_pagemeta_fields(spark):
    from geoutils_spark.functions import pagemeta as PM
    html = ('<html lang="EN-us"><head><META charset="UTF-8">'
            '<title>  A Page  </title>'
            '<meta property="og:title" content="OG Wins">'
            '<meta name="description" content="a desc">'
            '<link rel="canonical" href="https://c.example/p1">'
            '</head><body><h1>Head One</h1></body></html>')
    row = spark.createDataFrame([(html,)], ["h"]).select(
        PM.lang_col(F.col("h")).alias("lang"),
        PM.charset_col(F.col("h")).alias("cs"),
        PM.title_col(F.col("h")).alias("t"),
        PM.meta_content_col(F.col("h"), "description").alias("d"),
        PM.canonical_col(F.col("h")).alias("c"),
        PM.display_title_col(F.col("h")).alias("dt"),
    ).collect()[0]
    assert row["lang"] == "en-us"          # BCP 47 case-folded
    assert row["cs"] == "utf-8"            # (?i) tag + lower()
    assert row["t"] == "A Page"            # trimmed
    assert row["d"] == "a desc"
    assert row["c"] == "https://c.example/p1"
    assert row["dt"] == "OG Wins"          # og:title beats <title>


def test_pagemeta_title_cascade(spark):
    from geoutils_spark.functions import pagemeta as PM
    # no og:title -> <title>; neither -> first <h1>; nothing -> ''
    cases = [
        ("<title>T</title><h1>H</h1>", "T"),
        ('<meta property="og:title" content="  ">'
         "<title>T2</title>", "T2"),      # whitespace og falls through
        ("<h1>Only H1</h1><h1>Second</h1>", "Only H1"),
        ("<p>no heads</p>", ""),
    ]
    df = spark.createDataFrame(cases, ["h", "want"]).select(
        PM.display_title_col(F.col("h")).alias("got"), "want")
    for r in df.collect():
        assert r["got"] == r["want"]


def test_pagemeta_absent_fields_empty(spark):
    from geoutils_spark.functions import pagemeta as PM
    row = spark.createDataFrame([("<html><head></head></html>",)], ["h"]) \
        .select(
            PM.lang_col(F.col("h")).alias("lang"),
            PM.charset_col(F.col("h")).alias("cs"),
            PM.canonical_col(F.col("h")).alias("c"),
            PM.meta_content_col(F.col("h"), "description").alias("d"),
        ).collect()[0]
    assert (row["lang"], row["cs"], row["c"], row["d"]) == ("", "", "", "")


def test_registered_domain_join(spark):
    psl = spark.createDataFrame(
        [("com",), ("co.uk",), ("uk",)], ["suffix"])
    hosts = spark.createDataFrame(
        [(1, "A.Site.CO.UK"),   # case-folds; longest match co.uk beats uk
         (2, "b.example.com"),
         (3, "co.uk"),          # bare suffix -> domain ''
         (4, "no.match.test")], ["id", "host"])
    out = {r["id"]: (r["public_suffix"], r["registered_domain"])
           for r in U.registered_domain_join(hosts, psl).collect()}
    assert out[1] == ("co.uk", "site.co.uk")
    assert out[2] == ("com", "example.com")
    assert out[3] == ("co.uk", "")
    assert out[4] == (None, None)


def test_sitemap_parsing(spark):
    from geoutils_spark.functions import sitemap as SM
    xml = ('<?xml version="1.0"?>\n<urlset>\n'
           '<url>\n  <loc> https://a.example/p </loc>\n'
           '  <lastmod>2024-01-02</lastmod>\n'
           '  <priority>0.7</priority>\n</url>\n'
           '<url><loc>https://a.example/q</loc></url>\n</urlset>')
    row = spark.createDataFrame([(xml,)], ["x"]).select(
        SM.is_index_col(F.col("x")).alias("idx"),
        SM.entry_blocks_col(F.col("x")).alias("b")).collect()[0]
    assert row["idx"] is False
    assert len(row["b"]) == 2          # (?s) spans the newlines
    one = spark.createDataFrame([(row["b"][0],)], ["b"]).select(
        SM.loc_col(F.col("b")).alias("l"),
        SM.lastmod_col(F.col("b")).alias("m"),
        SM.priority_col(F.col("b")).alias("p")).collect()[0]
    assert one["l"] == "https://a.example/p"   # loc trimmed
    assert one["m"] == "2024-01-02"
    assert one["p"] == "0.7"
    idx = '<SitemapIndex><sitemap><loc>x</loc></sitemap></SitemapIndex>'
    r2 = spark.createDataFrame([(idx,)], ["x"]).select(
        SM.is_index_col(F.col("x")).alias("i")).collect()[0]
    assert r2["i"] is True             # (?i) tag match


def test_http_header_parsing(spark):
    from geoutils_spark.functions import httphead as HH
    blk = ("HTTP/1.1 301 Moved Permanently\r\n"
           "CONTENT-TYPE: Text/HTML; charset=ISO-8859-1\r\n"
           "Location: https://x.example/a\r\n"
           "Location: https://x.example/b\r\n"   # repeated: first wins
           "\r\nbody")
    row = spark.createDataFrame([(blk,)], ["h"]).select(
        HH.status_col(F.col("h")).alias("st"),
        HH.content_type_col(F.col("h")).alias("ct"),
        HH.charset_param_col(F.col("h")).alias("cs"),
        HH.header_col(F.col("h"), "location").alias("loc")).collect()[0]
    assert row["st"] == 301
    assert row["ct"] == "text/html"
    assert row["cs"] == "iso-8859-1"
    assert row["loc"] == "https://x.example/a"
    # non-HTTP block -> NULL status, empty fields
    r2 = spark.createDataFrame([("not http",)], ["h"]).select(
        HH.status_col(F.col("h")).alias("st"),
        HH.content_type_col(F.col("h")).alias("ct")).collect()[0]
    assert r2["st"] is None and r2["ct"] == ""


def test_resolve_redirects(spark):
    from geoutils_spark.operators.redirects import resolve_redirects
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"),      # 3-chain -> terminal d
         ("x", "y"), ("y", "x")],                 # 2-cycle
        ["src", "dst"])
    out = {r["src"]: r for r in
           resolve_redirects(edges, rounds=2).collect()}
    assert out["a"]["final"] == "d" and out["a"]["hops"] == 3
    assert not out["a"]["unresolved"]
    assert out["b"]["final"] == "d" and out["b"]["hops"] == 2
    assert out["c"]["final"] == "d" and out["c"]["hops"] == 1
    assert out["x"]["unresolved"] and out["y"]["unresolved"]
    assert out["x"]["final"] in ("x", "y")        # stuck inside the cycle


def test_resolve_redirects_horizon(spark):
    from geoutils_spark.operators.redirects import resolve_redirects
    # 5-chain exceeds the 2^2=4-hop horizon at rounds=2 -> unresolved,
    # resolves cleanly at rounds=3
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(5)], ["src", "dst"])
    r2 = {r["src"]: r for r in resolve_redirects(edges, rounds=2).collect()}
    assert r2["n0"]["unresolved"] and r2["n0"]["hops"] == 4
    r3 = {r["src"]: r for r in resolve_redirects(edges, rounds=3).collect()}
    assert r3["n0"]["final"] == "n5" and r3["n0"]["hops"] == 5
    assert not r3["n0"]["unresolved"]

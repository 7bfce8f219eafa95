"""robots.txt gate (functions/robots.py): RFC 9309 group semantics,
longest-match + Allow-tie rule, agent targeting, and parse edges beyond
what the oracle query's four templates pin."""

from pyspark.sql import functions as F

from geoutils_spark.functions import robots as R


def _allowed(spark, robots, paths, agent="*"):
    df = spark.createDataFrame([(robots, p) for p in paths],
                               "robots string, path string")
    out = df.select("path", R.is_allowed_col(
        R.rules_for_agent_col(F.col("robots"), agent),
        F.col("path")).alias("ok")).collect()
    return {r["path"]: r["ok"] for r in out}


def test_group_shared_by_consecutive_agents(spark):
    robots = "User-agent: a\nUser-agent: *\nDisallow: /x"
    assert _allowed(spark, robots, ["/x/1", "/y"]) == {
        "/x/1": False, "/y": True}
    assert _allowed(spark, robots, ["/x/1"], agent="a") == {"/x/1": False}


def test_new_group_after_rules(spark):
    # the second User-agent starts a NEW group: its Disallow must not
    # leak back to '*'
    robots = "User-agent: *\nDisallow: /a\nUser-agent: bot\nDisallow: /b"
    got = _allowed(spark, robots, ["/a/x", "/b/x"])
    assert got == {"/a/x": False, "/b/x": True}


def test_longest_match_and_allow_tie(spark):
    robots = ("User-agent: *\nDisallow: /p\nAllow: /p/ok\n"
              "Disallow: /p/ok/no\nAllow: /q\nDisallow: /q")
    got = _allowed(spark, robots,
                   ["/p/z", "/p/ok/y", "/p/ok/no/1", "/q/t"])
    assert got == {"/p/z": False, "/p/ok/y": True,
                   "/p/ok/no/1": False,
                   # equal-length Allow and Disallow -> Allow wins
                   "/q/t": True}


def test_empty_disallow_blocks_nothing(spark):
    robots = "User-agent: *\nDisallow:"
    assert _allowed(spark, robots, ["/anything"]) == {"/anything": True}


def test_no_star_group_allows_all(spark):
    robots = "User-agent: special\nDisallow: /"
    assert _allowed(spark, robots, ["/x"]) == {"/x": True}
    assert _allowed(spark, robots, ["/x"], agent="special") == {"/x": False}


def test_comments_case_and_blank_lines(spark):
    robots = ("# policy\nUSER-AGENT: *   # inline\n\n"
              "disallow: /Secret\n  allow: /Secret/pub\n")
    got = _allowed(spark, robots, ["/Secret/x", "/Secret/pub/y", "/secret"])
    # paths are case-sensitive: '/secret' does not match '/Secret'
    assert got == {"/Secret/x": False, "/Secret/pub/y": True,
                   "/secret": True}


def test_empty_and_garbage_files(spark):
    assert _allowed(spark, "", ["/x"]) == {"/x": True}
    assert _allowed(spark, "Sitemap: https://e/s.xml\nCrawl-delay: 5",
                    ["/x"]) == {"/x": True}


def test_rule_before_any_agent_ignored(spark):
    robots = "Disallow: /x\nUser-agent: *\nDisallow: /y"
    got = _allowed(spark, robots, ["/x/1", "/y/1"])
    assert got == {"/x/1": True, "/y/1": False}


def test_url_path_extraction(spark):
    df = spark.createDataFrame(
        [("https://h.example",), ("https://h.example/a/b?q=1#f",),
         ("http://h.example/",)], "url string")
    got = [r["p"] for r in
           df.select(R.url_path_col(F.col("url")).alias("p")).collect()]
    assert got == ["/", "/a/b", "/"]


def test_robots_filter_missing_host_and_invert(spark):
    docs = spark.createDataFrame(
        [(1, "https://ruled.example/private/x"),
         (2, "https://ruled.example/pub/y"),
         (3, "https://unruled.example/private/z")],
        "doc_id long, url string")
    robots = spark.createDataFrame(
        [("ruled.example", "User-agent: *\nDisallow: /private")],
        "host string, robots_txt string")
    kept = sorted(r["doc_id"]
                  for r in R.robots_filter(docs, robots).collect())
    assert kept == [2, 3]  # no robots row => allowed
    blocked = sorted(r["doc_id"] for r in
                     R.robots_filter(docs, robots, invert=True).collect())
    assert blocked == [1]
    # helper columns must not leak into the output schema
    assert R.robots_filter(docs, robots).columns == ["doc_id", "url"]

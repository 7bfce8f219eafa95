"""Main-content block extraction (functions/blocks.py): density gate,
boundary-exact rational compare, split/strip edges."""

from pyspark.sql import functions as F

from geoutils_spark.functions import blocks as B


def _main(spark, html, **kw):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(B.main_content_col(F.col("html"), **kw)
                     .alias("m")).first()["m"]


def test_nav_and_footer_drop_article_survives(spark):
    html = ('<div><a href="/1">home</a> <a href="/2">about</a> menu</div>'
            '<p>A long enough paragraph of real article text that should '
            'clearly be kept by the density heuristic.</p>'
            '<footer><a href="/t">terms</a> <a href="/p">privacy</a></footer>')
    m = _main(spark, html)
    assert m.startswith("A long enough paragraph")
    assert "home" not in m and "terms" not in m


def test_density_boundary_is_exact(spark):
    # text length 30, link chars exactly 6 -> 6*5 == 30*1 keeps (<=);
    # 7 link chars drops. The rational compare has no float boundary.
    base = "x" * 24
    keep = f'<p><a href="/l">{"y" * 6}</a>{base}</p>'
    drop = f'<p><a href="/l">{"y" * 7}</a>{"x" * 23}</p>'
    assert _main(spark, keep) != ""
    assert _main(spark, drop) == ""


def test_min_chars_gate(spark):
    assert _main(spark, "<p>tiny</p>") == ""
    assert _main(spark, "<p>tiny</p>", min_chars=3) == "tiny"


def test_multiple_blocks_join_order(spark):
    html = ("<p>First content block long enough to pass the gate.</p>"
            "<p>Second content block also long enough to pass.</p>")
    m = _main(spark, html)
    assert m == ("First content block long enough to pass the gate.\n"
                 "Second content block also long enough to pass.")


def test_whitespace_and_inline_tags_collapse(spark):
    html = ("<p>Text   with <b>inline</b>\n markup and   spacing that "
            "still counts as one clean content block.</p>")
    m = _main(spark, html)
    assert "  " not in m and "<b>" not in m
    assert m.startswith("Text with inline markup")


def test_empty_and_taggless(spark):
    assert _main(spark, "") == ""
    long_plain = "Plain text with no tags at all but plenty of length here."
    assert _main(spark, long_plain) == long_plain

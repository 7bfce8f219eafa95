"""Hyperlink extraction and host-graph construction from raw HTML —
the link-analysis on-ramp of the webtext tier (feeds the existing
exact-fixed-point PageRank, queries.py web_pagerank, with REAL edges
instead of a synthesized list).

Extraction is a single codegen regexp over the html payload (the
textextract.py discipline: no parser dependency, deterministic,
DuckDB-twinnable). Link resolution covers the cases a crawler graph
cares about:

- absolute ``http(s)://host/...``  -> target host
- protocol-relative ``//host/...`` -> target host
- root/relative paths (``/p``, ``p``), ``#frag``, ``?q`` -> the
  page's own host (intra-site edge)
- ``mailto:``/``javascript:``/``data:`` schemes -> dropped

Scale: extraction and resolution are row-local; the only exchange in
a host-graph build is the (src, dst) count aggregation — map-side
combining on a key space bounded by host-pair cardinality, not page
count. The html payload never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from geoutils_spark.functions import urls as U

HREF_RE = r'href="([^"]*)"'
_SCHEME_SKIP = r"^(mailto|javascript|data|tel):"


def extract_hrefs_col(html: Column) -> Column:
    """All href attribute values, document order, duplicates kept."""
    return F.regexp_extract_all(html, F.lit(HREF_RE), F.lit(1))


def extract_hrefs_sql(html: str) -> str:
    return f"regexp_extract_all({html}, '{HREF_RE}', 1)"


def resolve_host_col(link: Column, base_host: Column) -> Column:
    """Target host of a link found on a page served by ``base_host``
    ('' for dropped schemes — filter on non-empty)."""
    host = U.url_host_col(link)
    proto_rel = F.regexp_extract(link, r"^//([^/?#]+)", 1)
    return (
        F.when(F.regexp_count(link, F.lit(_SCHEME_SKIP)) > 0, F.lit(""))
        .when(host != "", host)
        .when(proto_rel != "", proto_rel)
        .otherwise(base_host))


def resolve_host_sql(link: str, base_host: str) -> str:
    host = U.url_host_sql(link)
    proto_rel = f"regexp_extract({link}, '^//([^/?#]+)', 1)"
    return (
        f"CASE WHEN regexp_matches({link}, '{_SCHEME_SKIP}') THEN '' "
        f"WHEN {host} <> '' THEN {host} "
        f"WHEN {proto_rel} <> '' THEN {proto_rel} "
        f"ELSE {base_host} END")


# ---------------------------------------------------------------------------
# anchor text — (link, anchor) pairs for anchor-text corpus construction
# ---------------------------------------------------------------------------

ANCHOR_RE = r'<a\s[^>]*href="[^"]*"[^>]*>[^<]*</a>'


def extract_anchor_pairs_col(html: Column) -> Column:
    """array<struct<link, anchor>> — every simple anchor tag, document
    order. Two-stage extraction because both engines' regexp_extract_all
    return ONE group: group-0 matches of the full-tag pattern, then
    row-local href/text re-extraction inside a higher-order transform
    (still zero Python, still one codegen stage)."""
    tags = F.regexp_extract_all(html, F.lit(ANCHOR_RE), F.lit(0))
    return F.transform(tags, lambda t: F.struct(
        F.regexp_extract(t, HREF_RE, 1).alias("link"),
        F.regexp_extract(t, r">([^<]*)</a>", 1).alias("anchor")))


def extract_anchor_pairs_sql(html: str) -> str:
    return (
        f"list_transform(regexp_extract_all({html}, '{ANCHOR_RE}', 0), "
        f"t -> struct_pack(link := regexp_extract(t, '{HREF_RE}', 1), "
        f"anchor := regexp_extract(t, '>([^<]*)</a>', 1)))")

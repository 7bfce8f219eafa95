"""Sitemap parsing (sitemaps.org XML protocol) as paired Column/SQL
builders — the discovery-side on-ramp next to robots.py: robots.txt
points the crawler at sitemaps, sitemaps enumerate the URLs (with
lastmod freshness hints that drive the recrawl scheduler) or, for
sitemap INDEX files, the child sitemaps to fetch next.

All row-local regexp codegen in the shared RE2/Java subset: ``(?s)``
dot-matches-newline and non-greedy ``(.*?)`` behave identically in both
engines, so entry blocks and their fields extract byte-exact. A sitemap
never leaves its row — the explode happens downstream on (file,
entry-block) pairs, ids + blocks only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# one <url>...</url> or <sitemap>...</sitemap> entry block
ENTRY_RE = r"(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"
_LOC_RE = r"<loc>([^<]*)</loc>"
_LASTMOD_RE = r"<lastmod>([^<]*)</lastmod>"
_PRIORITY_RE = r"<priority>([^<]*)</priority>"
_INDEX_RE = r"(?i)<sitemapindex"


def entry_blocks_col(xml: Column) -> Column:
    """Array of entry-block bodies (url or sitemap entries)."""
    return F.regexp_extract_all(xml, F.lit(ENTRY_RE), F.lit(1))


def entry_blocks_sql(xml: str) -> str:
    return f"regexp_extract_all({xml}, '{ENTRY_RE}', 1)"


def is_index_col(xml: Column) -> Column:
    """True for a sitemap INDEX file (entries point at child sitemaps,
    not pages)."""
    return F.regexp_count(xml, F.lit(_INDEX_RE)) > 0


def is_index_sql(xml: str) -> str:
    return f"(len(regexp_extract_all({xml}, '{_INDEX_RE}')) > 0)"


def loc_col(block: Column) -> Column:
    return F.trim(F.regexp_extract(block, _LOC_RE, 1))


def loc_sql(block: str) -> str:
    return f"trim(regexp_extract({block}, '{_LOC_RE}', 1))"


def lastmod_col(block: Column) -> Column:
    """W3C datetime string, '' when the optional tag is absent."""
    return F.regexp_extract(block, _LASTMOD_RE, 1)


def lastmod_sql(block: str) -> str:
    return f"regexp_extract({block}, '{_LASTMOD_RE}', 1)"


def priority_col(block: Column) -> Column:
    return F.regexp_extract(block, _PRIORITY_RE, 1)


def priority_sql(block: str) -> str:
    return f"regexp_extract({block}, '{_PRIORITY_RE}', 1)"

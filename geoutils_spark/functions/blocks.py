"""Main-content block extraction — link-density boilerplate removal (the
jusText / boilerpipe heuristic family: navigation, footers and link
farms are short and link-dense; article text is long and link-sparse).

This is the QUALITY-side complement of textextract.py: textextract is
the versioned byte-identical whole-page text invariant (never touched);
this module classifies BLOCKS so a corpus pipeline can keep article
bodies and drop chrome before quality gating. Everything is row-local
regex/string codegen with a DuckDB twin — the deterministic, dependency-
free core of the heuristic (a learned block classifier would slot in
exactly like the hashed-linear quality model does for documents).

Pinned semantics (identical both dialects):

* blocks = html split on block-level tag boundaries
  (``p|div|h1..h6|li|ul|ol|table|section|article|header|footer|nav|br``,
  case-insensitive, open or close);
* block text = tags stripped, whitespace collapsed, trimmed;
* link chars = total length of ``<a ...>text</a>`` anchor texts found in
  the RAW block (anchors cut by the block split count as zero — both
  dialects cut identically, so the heuristic stays deterministic);
* keep a block iff text length >= ``min_chars`` AND link_chars <=
  ``max_link_density`` * text length (compared as integers:
  ``link_chars * DEN <= text_len * NUM`` with the density a rational
  NUM/DEN — no float compare at the boundary);
* main content = kept block texts joined by a single newline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BLOCK_SPLIT_RE = (r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|section|article"
                  r"|header|footer|nav|br)[^>]*>")
_TAG_RE = r"<[^>]*>"
_ANCHOR_TEXT_RE = r'(?i)<a\s[^>]*>([^<]*)</a>'


def _block_structs(html: Column, min_chars: int,
                   ld_num: int, ld_den: int) -> Column:
    blocks = F.split(html, BLOCK_SPLIT_RE)

    def info(b):
        text = F.trim(F.regexp_replace(
            F.regexp_replace(b, _TAG_RE, " "), r"\s+", " "))
        link_chars = F.aggregate(
            F.regexp_extract_all(b, F.lit(_ANCHOR_TEXT_RE), F.lit(1)),
            F.lit(0), lambda acc, t: acc + F.length(t))
        keep = ((F.length(text) >= min_chars)
                & (link_chars * ld_den <= F.length(text) * ld_num))
        return F.struct(text.alias("text"), keep.alias("keep"))

    return F.transform(blocks, info)


def main_content_col(html: Column, min_chars: int = 25,
                     ld_num: int = 1, ld_den: int = 5) -> Column:
    """Kept-block text joined by newline (default: blocks >= 25 chars
    with link density <= 1/5)."""
    s = _block_structs(html, min_chars, ld_num, ld_den)
    kept = F.filter(s, lambda b: b["keep"])
    return F.array_join(F.transform(kept, lambda b: b["text"]), "\n")


def block_stats_cols(html: Column, min_chars: int = 25,
                     ld_num: int = 1, ld_den: int = 5,
                     ) -> dict[str, Column]:
    """n_blocks (non-empty text), n_kept, content_chars — the rollup
    columns for corpus audits."""
    s = _block_structs(html, min_chars, ld_num, ld_den)
    nonempty = F.filter(s, lambda b: b["text"] != "")
    kept = F.filter(s, lambda b: b["keep"])
    return {
        "n_blocks": F.size(nonempty),
        "n_kept": F.size(kept),
        "content_chars": F.aggregate(
            kept, F.lit(0), lambda acc, b: acc + F.length(b["text"])),
    }


def _block_structs_sql(html: str, min_chars: int,
                       ld_num: int, ld_den: int) -> str:
    text = ("trim(regexp_replace(regexp_replace(b, '<[^>]*>', ' ', 'g'), "
            "'\\s+', ' ', 'g'))")
    link = (f"list_sum(list_prepend(0, list_transform("
            f"regexp_extract_all(b, '{_ANCHOR_TEXT_RE}', 1), "
            f"t -> len(t))))")
    return f"""
      list_transform(string_split_regex({html}, '{BLOCK_SPLIT_RE}'), b ->
        struct_pack(text := {text},
                    keep := len({text}) >= {min_chars}
                            AND {link} * {ld_den} <= len({text}) * {ld_num}))
    """


def main_content_sql(blocks_col: str) -> str:
    """Over a pre-staged block-structs column (stage
    ``_block_structs_sql`` in a CTE — the struct list is referenced by
    several consumers)."""
    return (f"array_to_string(list_transform("
            f"list_filter({blocks_col}, b -> b.keep), b -> b.text), "
            f"chr(10))")


def block_stats_sqls(blocks_col: str) -> dict[str, str]:
    kept = f"list_filter({blocks_col}, b -> b.keep)"
    return {
        "n_blocks": (f"len(list_filter({blocks_col}, "
                     f"b -> b.text <> ''))"),
        "n_kept": f"len({kept})",
        "content_chars": (f"list_sum(list_prepend(0, "
                          f"list_transform({kept}, b -> len(b.text))))"),
    }


def blocks_sql(html: str, min_chars: int = 25,
               ld_num: int = 1, ld_den: int = 5) -> str:
    return _block_structs_sql(html, min_chars, ld_num, ld_den)

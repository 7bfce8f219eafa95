"""ExactSubstr span removal: cut every duplicated >=k-token span out of
every document (Lee et al., "Deduplicating Training Data Makes Language
Models Better", ACL 2022 — the suffix-array ExactSubstr dedup, whose
released tool removes ALL copies of a duplicated substring; this is the
span-CUTTING tier above `dedup_shingle_coverage`'s flag-only metric).

Webtext counterpart of the reference's per-cell entity dedup
(/root/reference/osmsplit/osmsplit.cpp:223-258 drops repeated entity ids
inside a cell; here repeated token spans are dropped inside documents).

Semantics, exactly as implemented (token-level, the standard Spark-able
restatement of the suffix-array method):

1. Tokenize on single spaces (the repo's parity-safe tokenizer twins).
2. Every k-token window (non-distinct, WITH its start position) is
   fingerprinted to a 60-bit md5 integer — the `dedup_shingle_coverage`
   fingerprint discipline (collision needs ~2^30 distinct grams per
   birthday pair; shard into cohorts before that).
3. A window is *duplicated* if its fingerprint occurs >1 time anywhere in
   the corpus — in another document OR at another position of the same
   document (the ExactSubstr tool cuts self-repeats too).
4. A token is removed iff SOME duplicated window covers it. Because a
   duplicated span of length L >= k makes all L-k+1 of its windows
   duplicated, the union of covering windows is exactly the maximal
   duplicated span — the paper's semantics, no suffix array needed.
5. The document is rebuilt from the surviving tokens. Rebuild is
   byte-lossless for untouched docs: single-space split/join round-trips
   runs of spaces through empty tokens.

Scale plan: the exploded window table carries (doc_id, pos, fp) — ids
and 8-byte fingerprints only, never gram text; its count aggregates with
map-side combine; ONLY fingerprints seen more than once (the duplicated
vocabulary, usually a small fraction) join back — the survivors-only
discipline of the LSH tier. Per-doc start lists are bounded by document
token counts. The kept-token rebuild is pure higher-order codegen,
O(tokens x starts) per doc — fine while duplicated coverage per doc is
moderate; a fully-duplicated pathological doc degrades to O(n^2), at
which point a sorted-merge Pandas kernel is the drop-in (not needed at
current scales, and such docs are exactly the ones the cut empties).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geoutils_spark.functions import textanalysis as TA

K_DEFAULT = 50  # the paper's 50-token threshold


def _kept_tokens(toks: Column, starts: Column, k: int) -> Column:
    """Tokens not covered by any duplicated k-window, via the TWO-ARG
    ``filter(toks, (tok, i) -> ...)`` form. Do NOT rewrite this as
    ``transform(filter(sequence(...)), i -> element_at(toks, i+1))``:
    when that chain is additionally referenced from a row Filter (the
    min_tokens_left drop predicate), Spark 4.1 mis-binds the captured
    ``toks`` inside the transform lambda and element_at reads another
    row's (shorter) array — INVALID_ARRAY_INDEX crashes under every
    codegen/subexpr setting (reproduced in tests/test_exactsubstr.py).
    The positional filter carries no captured-array indexing, so there
    is nothing to mis-bind, and it skips k element_at round-trips."""
    return F.filter(
        toks,
        lambda tok, i: ~F.exists(starts, lambda st: (st <= i) & (i < st + k)),
    )


def _fp_col(gram: Column) -> Column:
    return F.conv(F.substring(F.md5(gram.cast("binary")), 1, 15),
                  16, 10).cast("long")


def window_occurrences(docs: DataFrame, k: int = K_DEFAULT,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pos, fp) for every k-token window, pos 0-based."""
    grams = TA.word_ngrams_col(F.col(text_col), k)
    return docs.select(
        F.col(id_col),
        F.posexplode(grams).alias("pos", "gram"),
    ).select(id_col, "pos", _fp_col(F.col("gram")).alias("fp"))


def duplicated_span_starts(docs: DataFrame, k: int = K_DEFAULT,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """(doc_id, starts) — sorted 0-based start positions of every
    duplicated k-token window in the doc. Docs with none are absent."""
    occ = window_occurrences(docs, k, text_col, id_col)
    dup = (occ.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
           .filter(F.col("n") > 1).select("fp"))
    # dup is the post-agg duplicated vocabulary — vocabulary-sized, not
    # corpus-sized; broadcast while it fits, else Spark falls back to a
    # fp-keyed shuffle of the ids-only occ table.
    return (occ.join(F.broadcast(dup), "fp", "leftsemi")
            .groupBy(id_col)
            .agg(F.array_sort(F.collect_list("pos")).alias("starts")))


def remove_duplicate_spans(docs: DataFrame, k: int = K_DEFAULT,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Every doc with duplicated spans cut: (id, n_tokens, n_removed,
    text_clean). n_removed = 0 rows (untouched docs) keep byte-identical
    text. One equi-join by id brings the start lists back onto the
    source scan — the only corpus-payload exchange in the operator."""
    starts = duplicated_span_starts(docs, k, text_col, id_col)
    joined = docs.join(starts, id_col, "left")
    toks = TA.tokens_col(F.col(text_col))
    s = F.coalesce(F.col("starts"),
                   F.array().cast("array<integer>"))
    kept = _kept_tokens(toks, s, k)
    return joined.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        (F.size(toks) - F.size(kept)).cast("long").alias("n_removed"),
        F.when(F.size(s) == 0, F.col(text_col))
        .otherwise(F.array_join(kept, " ")).alias("text_clean"),
    )


def cut_spans(docs: DataFrame, k: int = K_DEFAULT,
              text_col: str = "text", id_col: str = "doc_id",
              min_tokens_left: int = 1) -> DataFrame:
    """Schema-preserving pipeline stage: every column of ``docs`` kept,
    ``text_col`` replaced by the span-cut text, ``n_cut_tokens`` added.
    CUT docs left with fewer than ``min_tokens_left`` surviving tokens
    are DROPPED (a fully-boilerplate doc vanishes, like
    dedup_paragraphs); untouched docs always survive. The rebuild uses
    the positional-filter kernel (see ``_kept_tokens`` for why the
    indexed transform form is forbidden here)."""
    starts = duplicated_span_starts(docs, k, text_col, id_col)
    joined = docs.join(starts, id_col, "left")
    toks = TA.tokens_col(F.col(text_col))
    s = F.coalesce(F.col("starts"), F.array().cast("array<integer>"))
    kept = _kept_tokens(toks, s, k)
    others = [c for c in docs.columns if c != text_col]
    keep_row = (F.size(s) == 0) | (F.size(kept) >= min_tokens_left)
    return joined.filter(keep_row).select(
        *others,
        F.when(F.size(s) == 0, F.col(text_col))
        .otherwise(F.array_join(kept, " ")).alias(text_col),
        (F.size(toks) - F.size(kept)).cast("long").alias("n_cut_tokens"))


def remove_spans_sql(corpus: str, k: int = K_DEFAULT,
                     text: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB twin of remove_duplicate_spans (identical fingerprints,
    identical coverage predicate, identical rebuild)."""
    toks = TA.tokens_sql(text)
    joined = " || ' ' || ".join(f"toks[i + {j}]" for j in range(k))
    grams = (f"CASE WHEN len(toks) >= {k} THEN "
             f"list_transform(range(1, len(toks) - {k - 2}), "
             f"i -> {{'pos': i - 1, 'gram': {joined}}}) "
             f"ELSE [] END")
    return f"""
    WITH tok AS (
        SELECT {id_col}, {text} AS __text, {toks} AS toks FROM {corpus}
    ),
    occ AS (
        SELECT {id_col}, u.pos AS pos,
               CAST('0x' || substr(md5(u.gram), 1, 15) AS BIGINT) AS fp
        FROM (SELECT {id_col}, unnest({grams}) AS u FROM tok)
    ),
    dup AS (
        SELECT fp FROM occ GROUP BY fp HAVING COUNT(*) > 1
    ),
    st AS (
        SELECT occ.{id_col}, list_sort(list(occ.pos)) AS starts
        FROM occ JOIN dup USING (fp) GROUP BY occ.{id_col}
    ),
    cut AS (
        SELECT tok.{id_col},
               CAST(len(toks) AS BIGINT) AS n_tokens,
               toks, __text,
               COALESCE(st.starts, []) AS starts,
               list_transform(
                   list_filter(range(0, len(toks)),
                       i -> len(list_filter(COALESCE(st.starts, []),
                                s -> s <= i AND i < s + {k})) = 0),
                   i -> toks[i + 1]) AS kept
        FROM tok LEFT JOIN st USING ({id_col})
    )
    SELECT {id_col}, n_tokens,
           CAST(len(toks) - len(kept) AS BIGINT) AS n_removed,
           CASE WHEN len(starts) = 0 THEN __text
                -- array_to_string([]) is NULL in DuckDB but '' in Spark
                ELSE COALESCE(array_to_string(kept, ' '), '') END
             AS text_clean
    FROM cut
    """

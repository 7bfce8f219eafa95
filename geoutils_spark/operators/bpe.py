"""Distributed BPE merge training (Sennrich et al., ACL 2016 — the
byte-pair-encoding subword recipe every modern tokenizer descends from).

The iterative tier's third member, next to the exact fixed-point PageRank
and the pointer-doubling closure: a driver-COORDINATED loop whose per-
iteration work is one bounded exchange. The decomposition that makes BPE
trainable at 100 TB is the standard one:

* the CORPUS is touched exactly once — ``word_counts`` reduces it to a
  (word, n) vocabulary table with a map-side-combining hash agg (key
  space = distinct words, not corpus rows);
* every merge iteration then runs on the VOCABULARY table only: adjacent
  symbol pairs explode row-locally (weighted by the word count), one
  partial-agg exchange counts them (key space = distinct pairs), the
  argmax pair is a bounded 1-row driver action (ORDER BY n DESC, pair
  ASC — deterministic tie), and applying the merge is a row-local
  string rewrite. 10 GB of vocab drives 100 TB of corpus.

Pair semantics, pinned so the DuckDB twin is hash-exact:

* counting is PER POSITION (``'a a a'`` contains ``a a`` twice), the
  convention reference BPE implementations use;
* applying is GREEDY LEFT-TO-RIGHT NON-OVERLAPPING (``'a a a'`` ->
  ``'aa a'``). Plain ``replace`` on a space-joined symbol string almost
  implements that, except adjacent occurrences SHARE their separator
  space (``'a b a b'``: consuming the trailing space of match 1 hides
  match 2). The double-space trick fixes it: double every separator,
  pad, replace ``' a  b '`` with ``' ab '``, re-normalize — adjacent
  matches then share no characters, and both engines' ``replace`` are
  byte-identical greedy scans.

Symbols are the non-space tokens of the ``sym`` column (seed with
``chars_col`` for character-level BPE); a merge never crosses word
boundaries because each row IS one word.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chars_col(word: Column) -> Column:
    """'cat' -> 'c a t' — the character-seeded symbol string."""
    return F.trim(F.regexp_replace(word, "(.)", "$1 "))


def chars_sql(word: str) -> str:
    return f"trim(regexp_replace({word}, '(.)', '\\1 ', 'g'))"


def word_counts(docs: DataFrame, text: str = "text",
                top_words: int | None = None) -> DataFrame:
    """(sym, n) vocabulary table — the single corpus-sized reduction.
    ``top_words`` keeps the n-desc/word-asc head (deterministic), the
    standard cap that bounds every later iteration."""
    w = (docs.select(F.explode(F.split(F.col(text), " ")).alias("word"))
         .filter(F.col("word") != "")
         .groupBy("word").agg(F.count(F.lit(1)).alias("n")))
    if top_words is not None:
        w = (w.orderBy(F.col("n").desc(), F.col("word").asc())
             .limit(top_words))
    return w.select(chars_col(F.col("word")).alias("sym"), "n")


def pair_counts(vocab: DataFrame, sym: str = "sym",
                n: str = "n") -> DataFrame:
    """(pair, n) — per-position adjacent symbol pairs weighted by the
    word count; the one (vocab-bounded) exchange of an iteration."""
    syms = F.split(F.col(sym), " ")
    pairs = F.zip_with(syms, F.slice(syms, 2, F.size(syms)),
                       lambda a, b: F.concat(a, F.lit(" "), b))
    # zip_with pads the shorter side with null -> drop the tail element
    return (vocab.select(F.explode(pairs).alias("pair"),
                         F.col(n).alias("n"))
            .filter(F.col("pair").isNotNull()
                    & ~F.col("pair").endswith(" "))
            .groupBy("pair").agg(F.sum("n").alias("n")))


def apply_merge_col(sym: Column, pair: Column) -> Column:
    """Greedy left-to-right non-overlapping merge of ``pair`` ('a b')
    inside the spaced symbol string — the double-space trick (module
    docstring); all codegen string ops."""
    doubled = F.concat(F.lit(" "),
                       F.regexp_replace(sym, " ", "  "), F.lit(" "))
    pad_pair = F.concat(F.lit(" "),
                        F.regexp_replace(pair, " ", "  "), F.lit(" "))
    pad_merged = F.concat(F.lit(" "),
                          F.regexp_replace(pair, " ", ""), F.lit(" "))
    return F.trim(F.regexp_replace(
        F.replace(doubled, pad_pair, pad_merged), " +", " "))


def apply_merge_sql(sym: str, pair: str) -> str:
    doubled = f"(' ' || replace({sym}, ' ', '  ') || ' ')"
    pad_pair = f"(' ' || replace({pair}, ' ', '  ') || ' ')"
    pad_merged = f"(' ' || replace({pair}, ' ', '') || ' ')"
    return (f"trim(regexp_replace(replace({doubled}, {pad_pair}, "
            f"{pad_merged}), ' +', ' ', 'g'))")


def train_merges(vocab: DataFrame, n_merges: int) -> list[tuple[int, str, int]]:
    """The BPE training loop: ``n_merges`` rounds of count -> argmax ->
    apply. Returns [(step, pair, count)]. Each round's driver action is
    ONE row (the argmax — n desc, pair asc tie); the vocabulary is
    localCheckpointed per round so the lineage stays O(1) like the other
    iterative operators (dedup closure, knn escalation). Stops early
    when no pair is left (every word fully merged)."""
    merges: list[tuple[int, str, int]] = []
    cur = vocab.localCheckpoint()
    for step in range(1, n_merges + 1):
        best = (pair_counts(cur)
                .orderBy(F.col("n").desc(), F.col("pair").asc())
                .limit(1).collect())
        if not best:
            break
        pair, cnt = best[0]["pair"], int(best[0]["n"])
        merges.append((step, pair, cnt))
        cur = cur.select(
            apply_merge_col(F.col("sym"), F.lit(pair)).alias("sym"),
            "n").localCheckpoint()
    return merges


def _training_ctes(corpus_cte: str, n_merges: int,
                   top_words: int | None = None) -> str:
    """The unrolled count/argmax/apply training rounds as a CTE-list
    fragment (words, v1, p_i, b_i, v_{i+1}) — shared by the merge-table
    twin (merges_sql) and the encoder twin (encode_docs_sql)."""
    cap = (f"ORDER BY n DESC, word ASC LIMIT {top_words}"
           if top_words is not None else "")
    parts = [f"""
    words AS (
      SELECT word, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word
            FROM {corpus_cte})
      WHERE word <> '' GROUP BY word {cap}
    ),
    v1 AS (SELECT {chars_sql('word')} AS sym, n FROM words)"""]
    for i in range(1, n_merges + 1):
        parts.append(f"""
    p{i} AS (
      SELECT l[j] || ' ' || l[j + 1] AS pair, SUM(n) AS n
      FROM (SELECT string_split(sym, ' ') AS l, n FROM v{i}),
           UNNEST(range(1, len(l))) AS r(j)
      GROUP BY 1
    ),
    b{i} AS (SELECT CAST({i} AS BIGINT) AS step, pair,
                    CAST(n AS BIGINT) AS n FROM p{i}
             ORDER BY n DESC, pair ASC LIMIT 1),
    v{i + 1} AS (
      SELECT {apply_merge_sql('v.sym', 'b.pair')} AS sym, v.n
      FROM v{i} v CROSS JOIN b{i} b
    )""")
    return ",".join(parts)


def merges_sql(corpus_cte: str, n_merges: int,
               top_words: int | None = None) -> str:
    """DuckDB twin of word_counts + train_merges: ``n_merges`` unrolled
    count/argmax/apply rounds over ``corpus_cte`` (must yield a ``text``
    column). Returns rows (step, pair, n)."""
    union = " UNION ALL ".join(f"SELECT * FROM b{i}"
                               for i in range(1, n_merges + 1))
    return ("WITH " + _training_ctes(corpus_cte, n_merges, top_words)
            + "\n    " + union)


# ---------------------------------------------------------------------------
# Encoding: apply a trained merge list to documents (the tokenizer's
# runtime half — training produces the merge table, this consumes it)
# ---------------------------------------------------------------------------

# Word-boundary sentinel inserted between words before character seeding.
# Training is per-word (each vocab row IS one word), so no trained pair
# ever contains it — merges therefore cannot cross word boundaries even
# though encoding runs over the whole document string. U+001F never
# occurs in extracted text (textextract strips control chars); sanitize
# upstream if an exotic corpus could carry it.
BOUNDARY = "\x1f"


def encode_col(text: Column, merges: list[str]) -> Column:
    """Spaced symbol string after applying ``merges`` IN TRAINED ORDER
    (the standard BPE encode rule: merge priority = training step, each
    application greedy left-to-right non-overlapping — identical
    semantics to apply_merge_col because it IS apply_merge_col, folded).
    Row-local codegen string ops, zero exchanges; 4 string passes per
    merge over the doc. Decode tokens with ``split(.., ' ')`` dropping
    BOUNDARY symbols."""
    sym = chars_col(F.replace(text, F.lit(" "), F.lit(BOUNDARY)))
    for pair in merges:
        sym = apply_merge_col(sym, F.lit(pair))
    return sym


def token_count_col(sym: Column) -> Column:
    """Token count of an encoded symbol string: symbols minus word
    boundaries (empty-text rows count 0)."""
    return F.size(F.filter(
        F.split(sym, " "),
        lambda t: (t != F.lit(BOUNDARY)) & (t != F.lit("")))).cast("long")


def encode_docs_sql(docs_cte: str, n_merges: int,
                    top_words: int | None = None) -> str:
    """DuckDB twin of train-then-encode: the shared training CTEs pick
    the same ``n_merges`` pairs, then each d_i round applies pair i to
    every document (CROSS JOIN the 1-row b_i), exactly the fold
    encode_col builds. Yields (doc_id, n_tokens, enc_md5) — the md5
    makes the full encoded byte string hash-checked, not just counts.
    Assumes the corpus supports all ``n_merges`` rounds (an early-stop
    empty b_i would zero d_i; train_merges stops identically)."""
    seed = chars_sql(f"replace(text, ' ', chr(31))")
    parts = [_training_ctes(f"(SELECT text FROM {docs_cte})",
                            n_merges, top_words)]
    parts.append(f"""
    d0 AS (SELECT doc_id, {seed} AS sym FROM {docs_cte})""")
    for i in range(1, n_merges + 1):
        parts.append(f"""
    d{i} AS (
      SELECT doc_id, {apply_merge_sql('d.sym', 'b.pair')} AS sym
      FROM d{i - 1} d CROSS JOIN b{i} b
    )""")
    return ("WITH " + ",".join(parts) + f"""
    SELECT doc_id,
           CAST(len(list_filter(string_split(sym, ' '),
                                t -> t <> chr(31) AND t <> '')) AS BIGINT)
             AS n_tokens,
           md5(sym) AS enc_md5
    FROM d{n_merges}""")

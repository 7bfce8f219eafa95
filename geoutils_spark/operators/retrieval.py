"""BM25 full-text retrieval over a document corpus.

The classic web-corpus retrieval stage (Okapi BM25, Robertson et al.) the
reference's text tooling stops short of: score every document against a
small set of queries and keep the top-k per query. Used in training-data
pipelines both for corpus search and for quality weighting (retrieve-then-
filter against seed queries).

Exact integer quantization
--------------------------
All scoring is fixed-point BIGINT so the result is bit-identical under any
partitioning, task order, or engine — the same discipline as the bigram-LM
score (queries.py::text_lm_score) and the fixed-point PageRank. With
``k1 = k1_tenths/10`` and ``b = b_quarters/4`` (defaults 1.2 / 0.75):

    idf(t)   = (2N - 2df + 1) / (2df + 1)          -- linear Robertson idf,
                                                      no ln (IEEE-free)
    ndl      = (10^8 * dl) // avgdl_fp             -- 10^4-scaled dl/avgdl
    avgdl_fp = (10^4 * L) // N                     -- scalar
    D        = 40*10^4*tf + 10^4*k1t*(4-bq) + k1t*bq*ndl
    contrib  = (10^6 * 4*10^4 * (k1t+10) * tf) // D
    p        = (contrib * (2N - 2df + 1)) // (2df + 1)
    score    = SUM(p) over matched query terms     -- BIGINT, order-free

Integer division quantizes each term's contribution at ~1e-6 relative;
ranking is BM25-faithful, and both engines (Spark ``div``, DuckDB ``//``)
agree exactly because every operand is a non-negative BIGINT. Magnitudes
stay in int64 up to N ~ 10^12 docs (contrib <= 2.2e6; p <= ~4.4e18).

Scale shape (100 TB)
--------------------
- postings build: ONE corpus-keyed exchange, groupBy (doc_id, term) with
  map-side combine; dl rides the group key (functionally dependent on
  doc_id — 8 bytes/row instead of a second corpus join).
- df table: an agg OVER the postings agg — output is vocabulary-sized.
- query side: tiny; broadcast onto postings (term equi-join), so the
  postings table is filtered to matching terms BEFORE the per-(query,doc)
  exchange — the corpus never reshuffles for terms no query mentions.
- stopword heat: a query containing 'the' drags in a posting list the
  size of the corpus; ``max_df_frac`` drops terms with df > frac*N from
  scoring (standard stopword pruning) and bounds every posting list.
- at petabyte vocabulary, join on 60-bit md5 fingerprints of terms rather
  than strings (the dedup_shingle_coverage discipline); string joins are
  kept here because the driver oracle compares term columns directly.

Reference parity: the reference has CSV/string tokenization and per-key
aggregation (impl/strutil.cpp, tiles/tiles.cpp) but no ranked retrieval;
this operator is part of the training-data tier (SURVEY §2 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geoutils_spark.functions import textanalysis as TA

_SCALE_NDL = 10**4
_SCALE_SCORE = 10**6


def bm25_scores(docs: DataFrame, queries: DataFrame,
                id_col: str = "doc_id", text_col: str = "text",
                q_id: str = "query_id", q_text: str = "qtext",
                k1_tenths: int = 12, b_quarters: int = 3,
                max_df_frac: float | None = None) -> DataFrame:
    """(query_id, doc_id, score, n_terms) for every document matching at
    least one query term. ``score`` is the 10^6-scaled fixed-point BM25
    sum; ``n_terms`` the number of distinct query terms matched."""
    k1t, bq = int(k1_tenths), int(b_quarters)
    # dl as a window over the exploded rows would re-shuffle; compute it
    # row-local before the explode and carry it through the group key.
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(TA.tokens_col(F.col(text_col)),
                        lambda t: t != "")).cast("long").alias("dl"),
        F.explode(TA.tokens_col(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    postings = toks.groupBy("doc_id", "dl", "term").agg(
        F.count("*").cast("long").alias("tf"))

    stats = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(
            F.sum(F.size(F.filter(TA.tokens_col(F.col(text_col)),
                                  lambda t: t != "")).cast("long")),
            F.lit(0).cast("long")).alias("total_len"),
    ).select(
        "n_docs",
        F.expr(f"({_SCALE_NDL} * total_len) div n_docs").alias("avgdl_fp"),
    )

    dfreq = postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df"))

    qterms = queries.select(
        F.col(q_id).alias("query_id"),
        F.explode(TA.tokens_col(F.col(q_text))).alias("term"),
    ).filter(F.col("term") != "").distinct()

    matched = (
        postings.join(F.broadcast(qterms), "term")
        # df is vocab-sized post-agg (Heaps-sublinear): broadcasting it
        # keeps the postings side exchange-free through BOTH joins —
        # postings already paid their one corpus exchange at build time.
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
    )
    if max_df_frac is not None:
        matched = matched.filter(
            F.col("df").cast("double")
            <= F.lit(float(max_df_frac)) * F.col("n_docs").cast("double"))

    c_mul = _SCALE_SCORE * 4 * _SCALE_NDL * (k1t + 10)
    per = matched.select(
        "query_id", "doc_id",
        F.expr(
            f"(({c_mul} * tf)"
            f" div (40 * {_SCALE_NDL} * tf + {_SCALE_NDL * k1t * (4 - bq)}"
            f"      + {k1t * bq} * ((100000000 * dl) div avgdl_fp)))"
            " * (2 * n_docs - 2 * df + 1) div (2 * df + 1)"
        ).alias("p"),
    )
    return per.groupBy("query_id", "doc_id").agg(
        F.sum("p").cast("long").alias("score"),
        F.count("*").cast("long").alias("n_terms"),
    )


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              **kwargs) -> DataFrame:
    """Top-k docs per query by fixed-point BM25; ties break on doc_id so
    the ranking is total and partitioning-invariant. Returns
    (query_id, doc_id, score, n_terms, rank)."""
    scored = bm25_scores(docs, queries, **kwargs)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
    )


def bm25_sql(docs_rel: str, queries_rel: str, k: int = 10,
             k1_tenths: int = 12, b_quarters: int = 3) -> str:
    """DuckDB twin replaying the identical integer arithmetic (``//`` is
    floor-div = Spark's ``div`` on the all-non-negative operands here)."""
    k1t, bq = int(k1_tenths), int(b_quarters)
    c_mul = _SCALE_SCORE * 4 * _SCALE_NDL * (k1t + 10)
    return f"""
    WITH tok AS (
      SELECT doc_id,
             CAST(len(list_filter({TA.tokens_sql('text')},
                                  t -> t <> '')) AS BIGINT) AS dl,
             unnest({TA.tokens_sql('text')}) AS term
      FROM {docs_rel}
    ),
    postings AS (
      SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE term <> '' GROUP BY doc_id, dl, term
    ),
    stats AS (
      SELECT n_docs, ({_SCALE_NDL} * total_len) // n_docs AS avgdl_fp
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(COALESCE(SUM(len(list_filter(
                        {TA.tokens_sql('text')}, t -> t <> ''))), 0)
                        AS BIGINT) AS total_len
            FROM {docs_rel})
    ),
    dfreq AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df
      FROM postings GROUP BY term
    ),
    qterms AS (
      SELECT DISTINCT query_id, term FROM (
        SELECT query_id, unnest({TA.tokens_sql('qtext')}) AS term
        FROM {queries_rel}
      ) WHERE term <> ''
    ),
    per AS (
      SELECT query_id, doc_id,
             (({c_mul} * tf)
              // (40 * {_SCALE_NDL} * tf + {_SCALE_NDL * k1t * (4 - bq)}
                  + {k1t * bq} * ((100000000 * dl) // avgdl_fp)))
             * (2 * n_docs - 2 * df + 1) // (2 * df + 1) AS p
      FROM postings JOIN qterms USING (term) JOIN dfreq USING (term)
      CROSS JOIN stats
    ),
    scored AS (
      SELECT query_id, doc_id, CAST(SUM(p) AS BIGINT) AS score,
             CAST(COUNT(*) AS BIGINT) AS n_terms
      FROM per GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, score, n_terms, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {int(k)}
    """

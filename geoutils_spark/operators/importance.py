"""DSIR-style importance sampling: select the corpus documents whose hashed
n-gram feature distribution looks most like a small TARGET set (Xie et al.,
"Data Selection for Language Models via Importance Resampling", NeurIPS
2023 — the published pre-training data-selection recipe).

Webtext counterpart of the reference's priority-driven feature selection
(/root/reference/osm2assimp/osmfeature.cpp:20-111 ranks entities by frozen
tag-priority tables; here documents are ranked by a learned-from-data
bucket-ratio table). Same dual-backend pattern as ``functions/cells.py``:
every piece has a Catalyst column twin and a DuckDB SQL twin.

Method, exactly as implemented:

1. **Features** — unigrams + word bigrams, hashed into ``n_buckets`` ids
   with the classifier tier's md5 hashing trick (row-local codegen).
2. **Distributions** — bucket occurrence counts over the corpus (raw) and
   over the target set. Both aggregations partial-combine map-side, so the
   raw-side exchange carries at most ``n_buckets`` rows per task no matter
   how big the corpus is; the target set is benchmark-sized by definition.
3. **Importance ratio** — per bucket, Laplace-smoothed and integer-
   quantized: ``r(b) = ((cnt_target(b)+1) * SCALE) DIV (cnt_raw(b)+1)``.
   The published method uses log p_target/p_raw; we drop the constant
   total-count normalizer (it scales every document's score by the same
   factor — ranking-invariant) and keep exact BIGINT arithmetic instead of
   libm logs, the repo-wide oracle-parity rule (no ln drift; magnitude
   bound: r <= (|target features|+1)*SCALE, per-doc score <= r * doc
   features — ~1e13 at benchmark-sized targets, far inside BIGINT).
4. **Score** — per document, the sum of r(bucket) over every feature
   OCCURRENCE (multiset, so a doc that repeats target-ish phrases scores
   higher — same weighting the multiplicative DSIR weight gives in log
   space). The ratio table is <= n_buckets rows => broadcast; the per-doc
   aggregation partial-combines, so the only corpus-sized exchange carries
   (doc_id, partial sums) — ids and counts, never payload text.
5. **Selection** — deterministic top-k by (score DESC, doc_id): Spark's
   TakeOrdered does per-partition top-k then a driver merge of k*P rows.
   Published DSIR resamples with Gumbel noise for diversity; a
   deterministic md5-derived Gumbel could slot into the ordering without
   touching the plan shape — omitted to keep selection reproducible and
   oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geoutils_spark.functions import textanalysis as TA
from geoutils_spark.operators import classifier as CL

SCALE = 1_000_000
N_BUCKETS_DEFAULT = 1 << 14


def feature_buckets_col(text: Column,
                        n_buckets: int = N_BUCKETS_DEFAULT) -> Column:
    """Hashed unigram+bigram feature ids for one document (row-local)."""
    feats = F.concat(TA.tokens_col(text), TA.word_ngrams_col(text, 2))
    return F.transform(feats, lambda t: CL.bucket_col(t, n_buckets))


def feature_buckets_sql(text: str,
                        n_buckets: int = N_BUCKETS_DEFAULT) -> str:
    toks = TA.tokens_sql(text)
    bi = TA.word_ngrams_sql(text, 2)
    return (f"list_transform(list_concat({toks}, {bi}), "
            f"t -> {CL.bucket_sql('t', n_buckets)})")


def _bucket_counts(docs: DataFrame, text_col: str,
                   n_buckets: int, out: str) -> DataFrame:
    return (docs
            .select(F.explode(feature_buckets_col(F.col(text_col),
                                                  n_buckets))
                    .alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias(out)))


def importance_ratios(docs: DataFrame, target: DataFrame,
                      n_buckets: int = N_BUCKETS_DEFAULT,
                      text_col: str = "text") -> DataFrame:
    """(bucket, r) — the integer-quantized smoothed target/raw ratio.

    Outer-joined on the raw side: every bucket that occurs in the corpus
    gets a row (buckets the target never saw get the floor ratio
    ``SCALE DIV (cnt_raw+1)``), so the downstream score join is a plain
    inner/left equi-join with no missing keys.
    """
    raw = _bucket_counts(docs, text_col, n_buckets, "cnt_raw")
    # the target is benchmark-sized by definition and its count table is
    # <= n_buckets rows — broadcast it so the ratio build never sorts
    tgt = F.broadcast(_bucket_counts(target, text_col, n_buckets,
                                     "cnt_tgt"))
    return (raw.join(tgt, "bucket", "left")
            .select("bucket",
                    F.expr(f"((coalesce(cnt_tgt, 0) + 1) * {SCALE}) "
                           f"DIV (cnt_raw + 1)").alias("r")))


def importance_scores(docs: DataFrame, target: DataFrame,
                      n_buckets: int = N_BUCKETS_DEFAULT,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_features, imp_score) for every corpus document."""
    ratios = importance_ratios(docs, target, n_buckets, text_col)
    occ = docs.select(
        F.col(id_col),
        F.explode(feature_buckets_col(F.col(text_col), n_buckets))
        .alias("bucket"))
    return (occ.join(F.broadcast(ratios), "bucket")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_features"),
                 F.sum("r").cast("long").alias("imp_score")))


def importance_topk(docs: DataFrame, target: DataFrame, k: int,
                    n_buckets: int = N_BUCKETS_DEFAULT,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """The k corpus docs most target-like, deterministic tiebreak."""
    return (importance_scores(docs, target, n_buckets, text_col, id_col)
            .orderBy(F.desc("imp_score"), F.col(id_col))
            .limit(k))


def importance_topk_sql(corpus: str, target: str, k: int,
                        n_buckets: int = N_BUCKETS_DEFAULT,
                        text: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB twin of importance_topk (identical BIGINT math)."""
    fb = feature_buckets_sql(text, n_buckets)
    return f"""
    WITH occ AS (
        SELECT {id_col}, unnest({fb}) AS bucket FROM {corpus}
    ),
    raw AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt_raw
        FROM occ GROUP BY bucket
    ),
    tgt AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt_tgt
        FROM (SELECT unnest({fb}) AS bucket FROM {target})
        GROUP BY bucket
    ),
    ratio AS (
        SELECT raw.bucket,
               ((coalesce(tgt.cnt_tgt, 0) + 1) * {SCALE})
                   // (raw.cnt_raw + 1) AS r
        FROM raw LEFT JOIN tgt USING (bucket)
    )
    SELECT occ.{id_col},
           CAST(COUNT(*) AS BIGINT) AS n_features,
           CAST(SUM(ratio.r) AS BIGINT) AS imp_score
    FROM occ JOIN ratio USING (bucket)
    GROUP BY occ.{id_col}
    ORDER BY imp_score DESC, occ.{id_col}
    LIMIT {int(k)}
    """

"""Hashed-linear text-classifier inference (the FineWeb/CCNet model-based
quality-filter stage, expressed engine-natively).

Production pipelines score every document with a learned linear model over
hashed bag-of-words features (fasttext-style: quality classifiers, topic
filters, toxicity gates) and keep docs above a threshold. The *inference*
is pure relational algebra — hash each token into one of ``n_buckets``
feature ids, look up the bucket's weight, sum — and this module provides
it in the two plan shapes that matter at 100 TB:

* ``score_broadcast(docs, weights)`` — the learned-weights path: explode
  tokens, equi-join the bucket id against an explicitly ``broadcast()``
  weight table (a model of 2^18 buckets is a few MB — it must NEVER cause
  a corpus-side shuffle), partial-agg sum back to one row per doc. Total
  exchanges: the final (doc_id, partial-sum) hash agg only, map-side
  combined.
* ``score_rowlocal(docs, weight_col_fn)`` — when the weight is a closed
  formula (calibration fixtures, salted A/B hash scores): a higher-order
  ``aggregate(transform(tokens, w(h(t))))`` entirely inside whole-stage
  codegen — ZERO exchanges at any corpus size.

Both produce identical scores (pytest cross-checks them); the oracle query
replays the math in DuckDB. All arithmetic is BIGINT (weights are
integer-quantized, the standard trick for reproducible inference — a
float32 model quantized at 1e-6 keeps rank order for any realistic margin),
so results are partitioning- and dialect-exact.

Hash parity: bucket(token) = conv(substr(md5(token),1,8),16,10) % n_buckets
== DuckDB CAST('0x'||substr(md5(t),1,8) AS BIGINT) % n_buckets (the
hash_split idiom). The synthetic demo weights are the Knuth multiplicative
mix ((b*2654435761) % 2001) - 1000: deterministic, mean-zero, derivable in
both dialects without shipping a model file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from geoutils_spark.functions import textanalysis as TA

N_BUCKETS_DEFAULT = 1 << 18
_MIX = 2654435761  # Knuth multiplicative hash constant


def bucket_col(token: Column, n_buckets: int = N_BUCKETS_DEFAULT) -> Column:
    """Feature id for one token (hashing trick)."""
    return F.pmod(
        F.conv(F.substring(F.md5(token.cast("binary")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(int(n_buckets)),
    )


def bucket_sql(token: str, n_buckets: int = N_BUCKETS_DEFAULT) -> str:
    return (f"CAST('0x' || substr(md5({token}), 1, 8) AS BIGINT)"
            f" % {int(n_buckets)}")


def synthetic_weight_col(bucket: Column) -> Column:
    """Deterministic mean-zero integer weight for a bucket id."""
    return (bucket * _MIX) % 2001 - 1000


def synthetic_weight_sql(bucket: str) -> str:
    return f"(({bucket}) * {_MIX}) % 2001 - 1000"


def synthetic_weights_df(spark: SparkSession,
                         n_buckets: int = N_BUCKETS_DEFAULT) -> DataFrame:
    """(bucket, weight) table — stands in for a learned model's weights."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        synthetic_weight_col(F.col("id")).cast("long").alias("weight"),
    )


def score_rowlocal(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   n_buckets: int = N_BUCKETS_DEFAULT,
                   threshold: int = 0) -> DataFrame:
    """Zero-exchange inference with formula weights (codegen only)."""
    toks = TA.tokens_col(F.col(text_col))
    score = F.aggregate(
        F.transform(toks, lambda t: synthetic_weight_col(
            bucket_col(t, n_buckets))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        score.alias("score"),
        (score >= threshold).alias("keep"),
    )


def score_broadcast(docs: DataFrame, weights: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    n_buckets: int = N_BUCKETS_DEFAULT,
                    threshold: int = 0) -> DataFrame:
    """Learned-weights inference: explode -> broadcast join -> sum.

    ``weights`` is (bucket: long, weight: long). Unseen buckets score 0
    (left join + coalesce), so a model pruned to its nonzero rows gives
    identical results with a smaller broadcast.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(TA.tokens_col(F.col(text_col))).alias("tok"),
    ).select(id_col, bucket_col(F.col("tok"), n_buckets).alias("bucket"))
    joined = toks.join(F.broadcast(weights), "bucket", "left")
    scored = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.coalesce(F.col("weight"), F.lit(0))).cast("long")
        .alias("score"),
    )
    return scored.select(
        id_col, "n_tokens", "score",
        (F.col("score") >= threshold).alias("keep"),
    )


def score_sql(table: str, text: str = "text", id_col: str = "doc_id",
              n_buckets: int = N_BUCKETS_DEFAULT,
              threshold: int = 0) -> str:
    """DuckDB twin of either path (they agree by construction)."""
    w = synthetic_weight_sql(bucket_sql("t", n_buckets))
    toks = TA.tokens_sql(text)
    return f"""
    SELECT {id_col},
           CAST(len({toks}) AS BIGINT) AS n_tokens,
           CAST(coalesce(list_sum(list_transform({toks}, t -> {w})), 0)
                AS BIGINT) AS score,
           CAST(coalesce(list_sum(list_transform({toks}, t -> {w})), 0)
                AS BIGINT) >= {int(threshold)} AS keep
    FROM {table}
    """

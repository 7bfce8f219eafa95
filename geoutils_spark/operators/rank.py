"""Exact per-group ranking without a whole-group sort — the
distributed-ranking primitive under CCNet-style perplexity bucketing.

``row_number() OVER (PARTITION BY lang ORDER BY score)`` sorts each
language in ONE task; with a handful of languages over 10^12 docs the
window is a straight scale-killer (the dedup_paragraphs hot-key
failure mode, r3 VERDICT #2). This operator computes the IDENTICAL
rank with the terasort decomposition:

1. **Edges** (approximate, performance-only): per-group
   ``percentile_approx`` picks ``n_bins - 1`` order-preserving bin
   edges. Edge quality only balances bin sizes — it NEVER affects the
   output rank, so the approximation is invisible to correctness.
2. **Bin assign** (row-local): ``bin = #edges < score`` via a
   higher-order filter over the broadcast edge array.
3. **Bases** (tiny): exact counts per (group, bin) cumulate into each
   bin's starting rank — n_groups * n_bins rows, broadcast back.
4. **Intra-bin rank** (bounded): ``row_number`` partitioned by
   (group, bin) — each partition holds ~|group| / n_bins rows.

rank = base + intra-bin rank, exactly the unsalted window's answer
whenever the order is total (callers pass a unique tiebreak).

Scale: the only corpus-wide exchange is the (group, bin) window
shuffle — same bytes a plain window moves, but sorted in n_bins
bounded tasks per group instead of one unbounded task. Everything
else is sketch-sized (edges) or count-sized (bases).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_rank(df: DataFrame, group_cols: list[str], score: Column,
               tiebreak: Column, n_bins: int = 64,
               ascending: bool = True, rank_name: str = "rank",
               accuracy: int = 10_000) -> DataFrame:
    """Adds ``rank_name``: the exact 1-based rank of each row within
    its group under (score, tiebreak) — ascending by default. The
    (score, tiebreak) pair must totally order rows within a group."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    d = df.withColumn("__score", score).withColumn("__tb", tiebreak)

    if n_bins == 1:
        edges = None
        d = d.withColumn("__bin", F.lit(0))
    else:
        qs = [i / n_bins for i in range(1, n_bins)]
        edges = (d.groupBy(*group_cols)
                 .agg(F.percentile_approx("__score", qs, accuracy)
                      .alias("__edges")))
        d = d.join(F.broadcast(edges), group_cols, "left")
        # edge array can carry nulls for tiny groups; count strictly
        # smaller edges -> order-preserving bin id
        d = d.withColumn(
            "__bin",
            F.size(F.filter(
                F.coalesce(F.col("__edges"),
                           F.array().cast("array<double>")),
                lambda e: e < F.col("__score"))))
        d = d.drop("__edges")

    order = ([F.col("__score").asc(), F.col("__tb").asc()] if ascending
             else [F.col("__score").desc(), F.col("__tb").desc()])
    if not ascending:
        # descending score means descending bin ids too
        d = d.withColumn("__bin", -F.col("__bin"))

    counts = d.groupBy(*group_cols, "__bin").agg(
        F.count(F.lit(1)).alias("__n"))
    wc = Window.partitionBy(*group_cols).orderBy(F.col("__bin").asc())
    bases = counts.withColumn(
        "__base",
        F.coalesce(F.sum("__n").over(
            wc.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)))
    d = d.join(F.broadcast(bases.select(*group_cols, "__bin", "__base")),
               group_cols + ["__bin"])
    wr = Window.partitionBy(*group_cols, "__bin").orderBy(*order)
    d = d.withColumn(
        rank_name,
        (F.col("__base") + F.row_number().over(wr)).cast("long"))
    return d.drop("__score", "__tb", "__bin", "__base")


def group_fraction_buckets(df: DataFrame, group_cols: list[str],
                           score: Column, tiebreak: Column,
                           n_buckets: int, labels: list[str] | None = None,
                           n_bins: int = 64, ascending: bool = True,
                           bucket_name: str = "bucket") -> DataFrame:
    """Equal-mass rank buckets per group — the CCNet head/middle/tail
    split (Wenzek et al. 2020 bucket documents by LM perplexity into
    thirds per language). bucket = floor(n_buckets * (rank-1) / n) —
    pure integer math on the exact distributed rank, so the ROW_NUMBER
    oracle twin matches bit-for-bit."""
    if labels is not None and len(labels) != n_buckets:
        raise ValueError("labels length must equal n_buckets")
    d = group_rank(df, group_cols, score, tiebreak, n_bins=n_bins,
                   ascending=ascending, rank_name="__rank")
    n = d.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__gn"))
    d = d.join(F.broadcast(n), group_cols)
    idx = F.floor((F.col("__rank") - 1) * n_buckets / F.col("__gn"))
    if labels is None:
        bucket = idx.cast("int")
    else:
        bucket = F.element_at(
            F.array(*[F.lit(x) for x in labels]), (idx + 1).cast("int"))
    return (d.withColumn(bucket_name, bucket)
            .withColumn("__rank_out", F.col("__rank").cast("long"))
            .drop("__rank", "__gn")
            .withColumnRenamed("__rank_out", "rank"))

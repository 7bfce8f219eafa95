"""spark-submit entry: end-to-end corpus dedup (the LLM-training-data tier).

    spark-submit --master local[N] --py-files dist/geoutils_spark.zip \
        jobs/dedup_pipeline.py [--input /path/documents_parquet] \
        [--docs N] [--out /path] [--min-jaccard 0.7]

Pipeline: documents -> exact-hash pass (dropDuplicates on md5) ->
MinHash+LSH candidate pairs (slim ids-only band join) -> exact-Jaccard
verify -> connected components (pointer doubling) -> keep-min-id-per-
cluster drop list -> kept corpus written to --out (plus pairs/components
side tables). With --docs N and no --input, synthesizes the fixture
documents table with known mutants (self-contained smoke mode).

Prints one JSON summary line: input/kept/dropped counts, pair count,
cluster count, wall seconds.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="documents parquet path "
                    "(needs doc_id, text columns)")
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--min-est-jaccard", type=float, default=0.5)
    ap.add_argument("--min-jaccard", type=float, default=0.7)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("geoutils_spark_dedup").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from geoutils_spark.operators.dedup import dedup_keepers, minhash_lsh_pairs

    t0 = time.time()
    if args.input:
        docs = spark.read.parquet(args.input).select("doc_id", "text")
    else:
        # self-contained smoke corpus: fixture pages' extracted text + exact
        # copies (every 5th) + near-dup mutants (every 3rd, 3 tokens trimmed)
        from geoutils_spark.sources import fixtures

        base = fixtures.pages_df(spark, args.docs).select(
            F.col("page_id").alias("doc_id"), "text")
        toks = F.split(F.col("text"), " ")
        off = args.docs * 10
        exact = base.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + off).alias("doc_id"), "text")
        mut = base.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 2 * off).alias("doc_id"),
            F.array_join(
                F.slice(toks, 1, F.greatest(F.size(toks) - 3, F.lit(0))), " "
            ).alias("text"))
        docs = base.unionByName(exact).unionByName(mut)

    n_in = docs.count()

    # 1. exact pass: one keeper per identical text (cheapest tier first)
    hashed = docs.withColumn("__h", F.md5(F.col("text").cast("binary")))
    w_keep = hashed.groupBy("__h").agg(F.min("doc_id").alias("doc_id"))
    exact_kept = hashed.join(w_keep, on=["__h", "doc_id"], how="left_semi") \
        .select("doc_id", "text")
    n_exact_kept = exact_kept.count()

    # 2-4. near-dup pairs -> verify -> transitive clusters -> keepers
    pairs = minhash_lsh_pairs(exact_kept,
                              min_est_jaccard=args.min_est_jaccard)
    verified = pairs.filter(F.col("exact_jaccard") >= args.min_jaccard) \
        .select("id_a", "id_b").localCheckpoint()
    n_pairs = verified.count()
    keep = dedup_keepers(verified)
    drop = keep.filter(~F.col("keep")).select(F.col("node").alias("doc_id"))
    kept = exact_kept.join(drop, on="doc_id", how="left_anti")
    n_kept = kept.count()
    n_clusters = keep.select("component_id").distinct().count()

    if args.out:
        kept.write.mode("overwrite").parquet(args.out + "/kept")
        verified.write.mode("overwrite").parquet(args.out + "/pairs")
        keep.write.mode("overwrite").parquet(args.out + "/components")

    print(json.dumps({
        "docs_in": n_in,
        "after_exact": n_exact_kept,
        "near_dup_pairs": n_pairs,
        "clusters": n_clusters,
        "kept": n_kept,
        "dropped": n_in - n_kept,
        "sec": round(time.time() - t0, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

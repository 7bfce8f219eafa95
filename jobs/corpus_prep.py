"""spark-submit entry: full training-corpus preparation.

    spark-submit --master local[N] --driver-memory 8g \
        --py-files dist/geoutils_spark.zip \
        jobs/corpus_prep.py [--input /path/documents_parquet] \
        [--benchmarks /path/bench_parquet] [--docs N] [--out /path] [--resume]

(--driver-memory matters in local mode: the default 1g heap OOMs in the
LSH verify stage; cluster deployments size executors normally.)

Chain (operators/corpus.py): quality gate + language-ID -> PII redaction
-> exact dedup -> MinHash+LSH near-dedup -> benchmark decontamination ->
deterministic train/val/test split -> parquet partitioned by split.

Single-pass since r4: prepare_corpus persists every stage boundary
(DISK_ONLY), so the stage counters, the write, and the per-split summary
each read caches instead of re-executing the chain (measured 5.5x at 92k
docs, BENCH/R04_DELTA.md). Pass --no-counts to skip the per-stage
counters entirely (counts print as {} and the lineage omits them).

--out writes hive-partitioned by split through
plans.manifests.write_with_manifests: one lineage manifest per split
partition (row counts + the job config and per-stage survivor counts that
produced it); --resume anti-joins the completed-partition set so an
interrupted run recomputes only missing splits (north-rule checkpoint
resume, same pattern as jobs/spatial_pipeline.py).

With --docs N and no --input, synthesizes a self-contained smoke corpus
(fixture pages' extracted text + planted exact copies, near-dup mutants,
and benchmark-contaminated docs) so the run exercises every drop path.
Prints one JSON line of per-stage survivor counts.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None)
    ap.add_argument("--benchmarks", default=None,
                    help="eval-suite parquet (text column); default: "
                    "a sample of the corpus (self-contamination smoke)")
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--resume", action="store_true",
                    help="skip output splits already recorded complete in "
                    "the per-partition lineage manifests under --out")
    ap.add_argument("--min-est-jaccard", type=float, default=0.5)
    ap.add_argument("--min-jaccard", type=float, default=0.7)
    ap.add_argument("--no-counts", action="store_true",
                    help="skip per-stage survivor counters (stages still "
                    "persist; the write is the only consumer action)")
    ap.add_argument("--nfc", action="store_true",
                    help="NFC + whitespace/control normalize the text "
                    "before the quality gate (fuses into the stage-1 scan)")
    ap.add_argument("--line-dedup-sep", default=None,
                    help="within-document boilerplate-line dedup on this "
                    "separator before exact dedup (e.g. $'\n')")
    ap.add_argument("--classifier-buckets", type=int, default=0,
                    help="enable the hashed-linear quality-classifier gate "
                    "with a synthetic weight table of this many buckets "
                    "(a real deployment loads learned weights instead)")
    ap.add_argument("--classifier-threshold", type=int, default=0)
    ap.add_argument("--blocklist", default=None,
                    help="parquet of blocked domains (column 'domain'); "
                    "drops docs whose url host or any parent domain is "
                    "listed (input must carry a url column)")
    ap.add_argument("--blocklist-domains", default=None,
                    help="comma-separated literal blocklist (alternative "
                    "to --blocklist for small curated lists)")
    ap.add_argument("--robots", default=None,
                    help="parquet of (host, robots_txt); drops docs their "
                    "host's robots.txt disallows for --robots-agent "
                    "(input must carry a url column)")
    ap.add_argument("--robots-agent", default="*")
    ap.add_argument("--exactsubstr-k", type=int, default=0,
                    help="cut every corpus-duplicated span of >= K tokens "
                    "before exact dedup (Lee et al. ExactSubstr)")
    ap.add_argument("--importance-k", type=int, default=0,
                    help="keep only the K most target-like docs (DSIR) "
                    "as the last gate before the split")
    ap.add_argument("--importance-target", default=None,
                    help="parquet of target-domain docs (text column) for "
                    "--importance-k; defaults to the benchmarks frame "
                    "(smoke behavior)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("geoutils_corpus_prep").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from geoutils_spark.operators.corpus import prepare_corpus

    t0 = time.time()
    if args.input:
        raw = spark.read.parquet(args.input)
        cols = ["doc_id", "text"] + (["url"] if "url" in raw.columns else [])
        docs = raw.select(*cols)
    else:
        from geoutils_spark.sources import fixtures

        docs = fixtures.corpus_smoke_df(spark, args.docs)
        if args.blocklist or args.blocklist_domains:
            # smoke inputs carry no url; synthesize a deterministic one
            # (every 9th doc on a distinct host) so --blocklist-domains
            # is exercisable without a real crawl table
            from pyspark.sql import functions as F

            docs = docs.withColumn(
                "url",
                F.concat(
                    F.lit("https://"),
                    F.when(F.col("doc_id") % 9 == 0,
                           F.lit("smoke-blocked.example"))
                    .otherwise(F.lit("smoke-ok.example")),
                    F.lit("/p/"), F.col("doc_id").cast("string")))

    if args.benchmarks:
        benchmarks = spark.read.parquet(args.benchmarks).select("text")
    else:
        from geoutils_spark.sources import fixtures

        benchmarks = fixtures.benchmark_docs_df(spark)

    weights = None
    if args.classifier_buckets:
        from geoutils_spark.operators import classifier as CL

        weights = CL.synthetic_weights_df(spark, args.classifier_buckets)

    blocklist = None
    if args.blocklist:
        blocklist = spark.read.parquet(args.blocklist).select("domain")
    elif args.blocklist_domains:
        blocklist = spark.createDataFrame(
            [(d.strip(),) for d in args.blocklist_domains.split(",")
             if d.strip()], "domain string")

    robots = None
    if args.robots:
        robots = spark.read.parquet(args.robots).select("host", "robots_txt")

    importance_target = None
    if args.importance_k:
        importance_target = (
            spark.read.parquet(args.importance_target).select("text")
            if args.importance_target else benchmarks)

    kept, counts = prepare_corpus(
        docs, benchmarks,
        min_est_jaccard=args.min_est_jaccard,
        min_jaccard=args.min_jaccard,
        collect_counts=not args.no_counts,
        nfc_normalize=args.nfc,
        line_dedup_sep=args.line_dedup_sep,
        classifier_weights=weights,
        classifier_threshold=args.classifier_threshold,
        classifier_n_buckets=args.classifier_buckets or None,
        blocklist=blocklist,
        robots=robots,
        robots_agent=args.robots_agent,
        exactsubstr_k=args.exactsubstr_k or None,
        importance_target=importance_target,
        importance_k=args.importance_k or None)

    if args.out:
        from geoutils_spark.plans.manifests import write_with_manifests

        summary = write_with_manifests(
            kept, args.out, "split", resume=args.resume,
            lineage={
                "job": "corpus_prep",
                "input": args.input or f"corpus_smoke_df({args.docs})",
                "benchmarks": args.benchmarks or "benchmark_docs_df",
                "min_est_jaccard": args.min_est_jaccard,
                "min_jaccard": args.min_jaccard,
                "stage_counts": counts,
            })
        counts["written"] = summary["rows_written"]
        counts["splits_skipped"] = summary["partitions_skipped"]

    counts["splits"] = {
        r["split"]: r["n"]
        for r in kept.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    counts["sec"] = round(time.time() - t0, 2)
    print(json.dumps(counts))
    spark.stop()


if __name__ == "__main__":
    main()

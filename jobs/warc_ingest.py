"""Crawl ingest job: raw WARC files -> the engine's pages table.

The missing first mile: everything downstream (spatial pipeline, corpus
prep, dedup, retrieval) reads the (url, warc_ts, html, text, lang)
pages shape — this job produces it from what a crawler actually writes.

    spark-submit --py-files dist/geoutils_spark.zip jobs/warc_ingest.py \
        --input '/crawl/landing' --out /tables/pages \
        [--streaming] [--max-files-per-trigger N] [--checkpoint DIR]

Batch mode reads the glob through the binaryFile source (catalog does
the listing/partitioning; one task per crawl file). ``--streaming`` runs
the same parse as an availableNow file stream with a checkpoint, so
re-running after new files land processes ONLY the new files
(exactly-once per file — the incremental crawl-ingest shape).

Per record: HTTP envelope split (status/content-type), the VERSIONED
byte-identical text extraction (functions/textextract.py — the per-url
invariant the whole engine is validated against), and the stopword
language id. Output partitions by md5-bucket of url (partitioning-
invariant, like every sink here); batch mode writes through
write_with_manifests for per-partition lineage + resume.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="landing dir / glob of .warc / .warc.gz files")
    ap.add_argument("--out", required=True)
    ap.add_argument("--streaming", action="store_true",
                    help="availableNow file stream with checkpoint "
                    "(incremental: only new files on re-run)")
    ap.add_argument("--checkpoint", default=None,
                    help="stream checkpoint dir (default <out>_ckpt)")
    ap.add_argument("--max-files-per-trigger", type=int, default=0)
    ap.add_argument("--buckets", type=int, default=16,
                    help="md5-of-url output buckets")
    ap.add_argument("--min-status", type=int, default=200)
    ap.add_argument("--max-status", type=int, default=299)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("geoutils_warc_ingest").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from geoutils_spark.functions.textanalysis import langid_col, tokens_col
    from geoutils_spark.functions.textextract import extract_text_udf
    from geoutils_spark.sources import warc as W

    t0 = time.time()

    def enrich(df):
        df = df.filter((F.col("http_status") >= args.min_status)
                       & (F.col("http_status") <= args.max_status))
        df = df.withColumn("text", extract_text_udf(F.col("html")))
        df = df.withColumn("lang", langid_col(tokens_col(F.col("text"))))
        bucket = F.pmod(
            F.conv(F.substring(F.md5(F.col("url").cast("binary")), 1, 8),
                   16, 10).cast("long"), F.lit(args.buckets))
        return df.withColumn("bucket", bucket).select(
            "url", "warc_ts", "html", "text", "lang",
            "http_status", "content_type", "bucket")

    if args.streaming:
        ckpt = args.checkpoint or (args.out.rstrip("/") + "_ckpt")
        stream = W.stream_warc(
            spark, args.input,
            max_files_per_trigger=args.max_files_per_trigger or None)
        q = (enrich(stream).writeStream.format("parquet")
             .partitionBy("bucket")
             .option("path", args.out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        n = spark.read.parquet(args.out).count()
        summary = {"mode": "streaming", "rows_total": int(n),
                   "checkpoint": ckpt}
    else:
        from geoutils_spark.plans.manifests import write_with_manifests

        pages = enrich(W.read_warc_glob(spark, args.input))
        s = write_with_manifests(
            pages, args.out, "bucket",
            lineage={"job": "warc_ingest", "input": args.input,
                     "buckets": args.buckets})
        summary = {"mode": "batch", "rows_written": s["rows_written"],
                   "partitions_skipped": s["partitions_skipped"]}

    summary["wall_sec"] = round(time.time() - t0, 3)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

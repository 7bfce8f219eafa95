"""spark-submit entry: the flagship spatial-join + tile-assignment pipeline.

    spark-submit --master local[N] --py-files dist/geoutils_spark.zip \
        jobs/spatial_pipeline.py --input /path/pages_parquet [--reps 3] \
        [--out /path] [--resume]

Reads a pages table (url, warc_ts, html, ...) from parquet — the deployment
shape; Iceberg is a format switch — then: deterministic text extraction ->
cell/tile assignment -> polygon spatial join -> aggregate (forced through
the extraction column; a bare count would let Catalyst prune the UDF).
With --pages N and no --input, synthesizes the fixture table in-memory
(self-contained smoke mode). Prints one JSON line per rep plus a summary.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="pages parquet path")
    ap.add_argument("--pages", type=int, default=2_000_000,
                    help="rows to synthesize when no --input")
    ap.add_argument("--reps", type=int, default=1,
                    help="timed repetitions (first rep doubles as warmup)")
    ap.add_argument("--out", default=None,
                    help="write cell-partitioned assignments + manifests here")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--level", type=int, default=15)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("geoutils_spark_pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from geoutils_spark.functions.textextract import extract_text_udf
    from geoutils_spark.operators.spatial_join import spatial_join
    from geoutils_spark.operators.tiling import with_tiles
    from geoutils_spark.sources import fixtures

    if args.input:
        pages = spark.read.parquet(args.input)
        n_pages = pages.count()
    else:
        pages = fixtures.pages_df(spark, args.pages).drop("text")
        n_pages = args.pages
    pages = fixtures.with_page_geo(pages)
    pages = pages.withColumn("text", extract_text_udf(F.col("html")))
    pages = with_tiles(pages, "lon", "lat", zooms=(14,))
    polys = fixtures.polygons_df(spark).filter(F.col("kind") == "building")
    joined = spatial_join(
        pages.select("page_id", "lon", "lat", "tile_z14_x", "tile_z14_y",
                     F.length("text").alias("text_len")),
        polys, level=args.level, point_cols=("page_id", "text_len"))

    if args.out:
        from geoutils_spark.plans.manifests import write_with_manifests

        t0 = time.time()
        out_df = joined.withColumn("way_part", F.col("way_id").cast("string"))
        summary = write_with_manifests(
            out_df, args.out, "way_part", resume=args.resume,
            lineage={"job": "spatial_pipeline", "pages": n_pages,
                     "level": args.level})
        dt = time.time() - t0
        print(json.dumps({"rows": summary["rows_written"], "pages": n_pages,
                          "sec": round(dt, 3),
                          "pages_per_sec": round(n_pages / dt, 1),
                          "job": summary}))
    else:
        best, rows = 1e18, 0
        for rep in range(args.reps):
            t0 = time.time()
            r = joined.agg(F.count("*").alias("n"),
                           F.sum("text_len").alias("tl")).collect()[0]
            dt = time.time() - t0
            rows = r["n"]
            best = min(best, dt)
            print(json.dumps({"rep": rep, "rows": rows, "sec": round(dt, 3),
                              "pages_per_sec": round(n_pages / dt, 1)}))
        print(json.dumps({"rows": rows, "pages": n_pages,
                          "sec": round(best, 3), "reps": args.reps,
                          "pages_per_sec": round(n_pages / best, 1)}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())

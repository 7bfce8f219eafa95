"""spark-submit entry: the osm2assimp analog — OSM extract in, 3D scene out.

    spark-submit --master local[N] --py-files dist/geoutils_spark.zip \
        jobs/scene_export.py --input extract.osm[.pbf] --out /path/scene \
        [--format obj|gltf] [--width 0.00008] [--no-ground-holes]

Pipeline (operators/scene.py): nodes⋈ways resolution -> building prisms
(height cascade) + highway ribbons + one hole-aware Delaunay ground ->
OBJ or glTF export (one object per feature, reference scene shape
numBuildings + numHighways + 1, /root/reference/test.py:85-100).
Prints one JSON line with per-kind mesh counts.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help=".osm / .osm.pbf extract")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--format", choices=("obj", "gltf"), default="obj")
    ap.add_argument("--width", type=float, default=0.00008,
                    help="highway ribbon width (degrees)")
    ap.add_argument("--no-ground-holes", action="store_true")
    ap.add_argument("--consolidate", type=int, choices=(0, 1, 2), default=2,
                    help="mesh granularity (reference -c): 0 single mesh, "
                         "1 per kind, 2 per object")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("geoutils_spark_scene").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from geoutils_spark.operators.scene import scene_meshes
    from geoutils_spark.sources import osm, sinks

    nodes, ways = osm.read_osm(spark, args.input)
    meshes = scene_meshes(nodes, ways, highway_width=args.width,
                          ground_holes=not args.no_ground_holes).cache()
    counts = {r.kind: r.n for r in meshes.groupBy("kind")
              .agg(F.count("*").alias("n")).collect()}
    if args.consolidate < 2:
        from geoutils_spark.operators.scene import consolidate_meshes

        merged = consolidate_meshes(
            meshes, by="kind" if args.consolidate == 1 else None)
        meshes = merged.withColumn("kind", F.col("way_id"))
    if args.format == "obj":
        sinks.write_obj_meshes(meshes, args.out)
    else:
        sinks.write_gltf_meshes(meshes.filter(F.col("kind") != "highway"),
                                args.out)
        # glTF sink emits triangles; quad-faced ribbons go through OBJ
        if counts.get("highway"):
            sinks.write_obj_meshes(meshes.filter(F.col("kind") == "highway"),
                                   args.out)
    print(json.dumps({"meshes": counts, "out": args.out,
                      "format": args.format}))
    spark.stop()


if __name__ == "__main__":
    main()

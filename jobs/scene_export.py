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
    ap.add_argument("--attributes", action="store_true",
                    help="emit per-vertex normals (+ UVs with --uv-scale): "
                         "the reference's attribute-bearing mesh layout")
    ap.add_argument("--uv-scale", type=float, default=0.0,
                    help="UV scale for building sides (reference -u); "
                         "0 omits the UV set; implies --attributes")
    ap.add_argument("--fixed-height", type=float, default=None,
                    help="fallback height in meters when tags carry none "
                         "(reference -f; default 7.5 = 3 levels x 2.5 m)")
    ap.add_argument("--projection", choices=("lonlat", "mercator", "ned"),
                    default="lonlat",
                    help="ground coordinates: raw degrees (default), "
                         "web-Mercator meters minus ref point (the "
                         "reference's default), or local NED tangent-plane "
                         "meters (the reference's -a center-earth-fixed)")
    ap.add_argument("--y-up", action="store_true",
                    help="export y-up, x negated (the reference's DEFAULT "
                         "axis convention; this engine's native space is "
                         "z-up = the reference's -z)")
    args = ap.parse_args()
    if args.uv_scale:
        args.attributes = True

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("geoutils_spark_scene").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from geoutils_spark.operators.scene import (project_scene_nodes,
                                                scene_meshes, swizzle_y_up)
    from geoutils_spark.sources import osm, sinks

    nodes, ways = osm.read_osm(spark, args.input)
    if args.projection != "lonlat":
        nodes = project_scene_nodes(nodes, mode=args.projection)
    width = args.width
    if args.projection != "lonlat" and width < 0.01:
        # degree-sized default width in a meters projection would be
        # invisible; reference LineSegment widths are meters
        width = 3.0
    meshes = scene_meshes(nodes, ways, highway_width=width,
                          ground_holes=not args.no_ground_holes,
                          attributes=args.attributes,
                          uv_scale=args.uv_scale,
                          default_height_m=args.fixed_height)
    if args.y_up:
        meshes = swizzle_y_up(meshes)
    meshes = meshes.cache()
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
        # the glTF sink fan-triangulates quads/n-gons on write, so ribbons
        # and attribute-layout caps export directly
        sinks.write_gltf_meshes(meshes, args.out)
    print(json.dumps({"meshes": counts, "out": args.out,
                      "format": args.format}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Geohash (functions/geohash.py): published goldens, decode round-trip,
prefix nesting, clamping, and precision validation."""

import pytest
from pyspark.sql import functions as F

from geoutils_spark.functions import geohash as GH


def _gh(spark, pts, precision):
    df = spark.createDataFrame(pts, "lon double, lat double")
    return [r["g"] for r in df.select(
        GH.geohash_col(F.col("lon"), F.col("lat"), precision)
        .alias("g")).collect()]


def test_published_goldens(spark):
    # u4pruydqqvj (57.64911, 10.40744) and ezs42 (42.605, -5.603) are the
    # textbook vectors; even-precision prefixes of them
    assert _gh(spark, [(10.40744, 57.64911)], 8) == ["u4pruydq"]
    assert _gh(spark, [(-5.603, 42.605)], 4) == ["ezs4"]


def test_prefix_nesting(spark):
    pts = [(10.40744, 57.64911), (-0.08, 51.52), (151.2, -33.86)]
    for p in (4, 6, 8, 12):
        long = _gh(spark, pts, 12)
        short = _gh(spark, pts, p)
        assert short == [g[:p] for g in long]


def test_decode_center_roundtrip(spark):
    df = spark.createDataFrame(
        [(10.40744, 57.64911), (-0.08, 51.52), (151.2, -33.86),
         (-179.99, -89.99), (179.99, 89.99)], "lon double, lat double")
    g = df.select(GH.geohash_col(F.col("lon"), F.col("lat"), 8).alias("g"))
    lon_c, lat_c = GH.geohash_center_cols(F.col("g"), 8)
    rt = g.select("g", GH.geohash_col(lon_c, lat_c, 8).alias("rt")).collect()
    assert all(r["g"] == r["rt"] for r in rt)


def test_edge_clamping(spark):
    # exactly +180 / +90 clamp into the last cell instead of overflowing
    [[g1], [g2]] = (_gh(spark, [(180.0, 90.0)], 4),
                    _gh(spark, [(179.999, 89.999)], 4))
    assert g1 == g2 == "zzzz"


def test_precision_validation(spark):
    for bad in (3, 0, 14, -2):
        with pytest.raises(ValueError):
            GH.geohash_col(F.lit(0.0), F.lit(0.0), bad)

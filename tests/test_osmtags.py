"""Tag-derived projections vs the reference's rules
(/root/reference/osm2assimp/osmfeature.cpp:16-111)."""

from pyspark.sql import functions as F

from geoutils_spark.functions import osmtags


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, refs array<long>, tags map<string,string>")


def test_height(spark):
    df = _df(spark, [
        (1, [1, 2, 3, 1], {"height": "12.5"}),
        (2, [1, 2, 3, 1], {"building:levels": "4"}),
        (3, [1, 2, 3, 1], {}),
        (4, [1, 2, 3, 1], {"height": "not-a-number", "building:levels": "2"}),
    ])
    got = {r.id: r.h for r in df.select(
        "id", osmtags.height_col(F.col("tags")).alias("h")).collect()}
    assert got == {1: 12.5, 2: 10.0, 3: 7.5, 4: 5.0}


def test_name_priority(spark):
    df = _df(spark, [
        (1, [], {"name": "The Ship", "addr:housename": "x"}),
        (2, [], {"addr:housename": "Rose Cottage"}),
        (3, [], {"addr:housenumber": "12", "addr:street": "High St"}),
        (4, [], {"addr:housenumber": "12"}),  # incomplete pair -> way id
        (5, [], {}),
    ])
    got = {r.id: r.n for r in df.select(
        "id", osmtags.name_col(F.col("tags"), F.col("id")).alias("n")).collect()}
    assert got == {1: "The Ship", 2: "Rose Cottage", 3: "12 High St", 4: "4", 5: "5"}


def test_kind_precedence_and_closed(spark):
    df = _df(spark, [
        (1, [1, 2, 3, 1], {"building": "yes", "highway": "primary"}),
        (2, [1, 2, 3, 4], {"highway": "primary", "waterway": "river"}),
        (3, [9, 8], {"waterway": "river"}),
        (4, [1, 2], {}),
    ])
    got = {r.id: (r.k, r.c) for r in df.select(
        "id",
        osmtags.kind_col(F.col("tags")).alias("k"),
        osmtags.closed_way_col(F.col("refs")).alias("c"),
    ).collect()}
    assert got == {
        1: ("building", True), 2: ("highway", False),
        3: ("water", False), 4: ("other", False),
    }


def test_keys_of_interest(spark):
    df = _df(spark, [
        (1, [], {"building": "yes"}),
        (2, [], {"landuse": "park"}),
    ])
    got = [r.id for r in df.filter(
        osmtags.has_keys_of_interest_col(F.col("tags"), ["building", "highway"])
    ).collect()]
    assert got == [1]

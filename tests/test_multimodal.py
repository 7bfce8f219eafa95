import pytest
from pyspark.sql import functions as F

from geoutils_spark.functions import multimodal as MM


@pytest.fixture(scope="module")
def images(spark):
    return (
        spark.range(50).withColumnRenamed("id", "img_id")
        .withColumn("image", MM.synth_image_col(F.col("img_id")))
    )


def test_synth_header_roundtrip(images):
    out = MM.decode_image_meta(images).select("img_id", "meta.*").collect()
    assert len(out) == 50
    for r in out:
        assert r.valid
        assert r.width == (r.img_id % 320) + 16
        assert r.height == (r.img_id * 7 % 240) + 16
        assert r.channels == (1 if r.img_id % 5 == 0 else 3)
        assert r.format == MM.FORMATS[r.img_id % 3]
        assert r.n_bytes == MM.HEADER_LEN + 32  # two md5 digests


def test_invalid_payload_marked(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"NOTMAGIC-whatever")), (1, bytearray(b""))],
        "img_id long, image binary")
    out = {r.img_id: r for r in MM.decode_image_meta(df).select("img_id", "meta").collect()}
    assert out[0].meta is None and out[1].meta is None


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.decode_real_image(b"\x89PNG")


def test_image_features(images):
    out = MM.image_features(images).select("img_id", "feat").collect()
    for r in out:
        assert len(r.feat) == 8
        assert sum(r.feat) == pytest.approx(1.0)
    # deterministic across runs
    again = MM.image_features(images).select("img_id", "feat").collect()
    assert {r.img_id: tuple(r.feat) for r in out} == {r.img_id: tuple(r.feat) for r in again}


def test_sample_frames(spark):
    vids = spark.createDataFrame([(0, 25), (1, 5), (2, 31)],
                                 "vid long, n_frames int")
    out = MM.sample_frames(vids, every=10).groupBy("vid").agg(
        F.collect_list("frame_idx").alias("idx")).collect()
    got = {r.vid: sorted(r.idx) for r in out}
    assert got[0] == [0, 10, 20]
    assert got[1] == [0]
    assert got[2] == [0, 10, 20, 30]

"""WARC on-ramp (sources/warc.py): byte-deterministic sink, per-file and
member-span readers, CDX index validity, HTTP envelope parsing — the
Common-Crawl analogue of the PBF roundtrip/split tests."""

import gzip
import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geoutils_spark.sources import warc as W


def _pages(spark, n=120, start=0):
    """Small deterministic pages-shaped table."""
    d = spark.range(start, start + n).select(
        F.concat(F.lit("https://host"), (F.col("id") % 7).cast("string"),
                 F.lit(".example/p"), F.col("id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 61).alias("warc_ts"),
        F.concat(F.lit("<html><body>doc "), F.col("id").cast("string"),
                 F.lit(" €</body></html>")).cast("binary").alias("html"),
    )
    return d


def _roundtrip_frame(df):
    pdf = df.toPandas()
    pdf["html"] = pdf["html"].map(bytes)
    return pdf.sort_values("url").reset_index(drop=True)


def test_roundtrip_gz_shards(spark, tmp_path):
    src = _pages(spark)
    paths = W.write_warc_shards(src, str(tmp_path / "w"), n_shards=4)
    assert len(paths) == 4 and all(p.endswith(".warc.gz") for p in paths)
    back = W.read_warc(spark, paths)
    a = _roundtrip_frame(src)
    b = _roundtrip_frame(back.select("url", "warc_ts", "html"))
    pd.testing.assert_frame_equal(a, b)
    # http envelope parsed, warcinfo filtered out by default
    meta = back.agg(F.min("http_status"), F.max("http_status"),
                    F.count("*")).first()
    assert meta[0] == 200 and meta[1] == 200 and meta[2] == 120


def test_sink_deterministic_bytes(spark, tmp_path):
    src = _pages(spark, n=40)
    p1 = W.write_warc_shards(src, str(tmp_path / "a"), n_shards=2)
    # different partitioning of the same rows -> identical files
    p2 = W.write_warc_shards(src.repartition(7), str(tmp_path / "b"),
                             n_shards=2)
    for x, y in zip(p1, p2):
        hx = hashlib.md5(open(x, "rb").read()).hexdigest()
        hy = hashlib.md5(open(y, "rb").read()).hexdigest()
        assert hx == hy


def test_split_read_parity(spark, tmp_path):
    src = _pages(spark)
    [path] = W.write_warc_shards(src, str(tmp_path / "one"), n_shards=1)
    spans = W.warc_member_spans(path)
    assert len(spans) == 121  # warcinfo + 120 responses, one member each
    assert spans[0][0] == 0
    assert sum(s[1] for s in spans) == len(open(path, "rb").read())
    whole = _roundtrip_frame(
        W.read_warc(spark, path).select("url", "warc_ts", "html"))
    for tasks in (1, 3, 8):
        split = _roundtrip_frame(
            W.read_warc_split(spark, path, tasks=tasks)
            .select("url", "warc_ts", "html"))
        pd.testing.assert_frame_equal(whole, split)


def test_plain_warc_roundtrip(spark, tmp_path):
    src = _pages(spark, n=30)
    paths = W.write_warc_shards(src, str(tmp_path / "p"), n_shards=2,
                                compress=False)
    assert all(p.endswith(".warc") for p in paths)
    back = W.read_warc(spark, paths)
    pd.testing.assert_frame_equal(
        _roundtrip_frame(src),
        _roundtrip_frame(back.select("url", "warc_ts", "html")))


def test_cdx_index_range_fetch(spark, tmp_path):
    """Every CDX row's (offset, length) must independently decompress and
    parse to the record whose url it claims — the range-fetch contract."""
    src = _pages(spark, n=25)
    [path] = W.write_warc_shards(src, str(tmp_path / "c"), n_shards=1)
    cdx = W.cdx_index(spark, path).filter(F.col("warc_type") == "response")
    rows = cdx.collect()
    assert len(rows) == 25
    raw = open(path, "rb").read()
    for r in rows[:5]:
        member = gzip.decompress(raw[r["offset"]:r["offset"] + r["length"]])
        [(hdrs, payload)] = list(W.parse_records(member))
        assert hdrs["warc-target-uri"] == r["url"]
        assert hdrs["warc-record-id"] == r["record_id"]
    # spans from the CDX feed the split reader (resume-from-index path)
    spans = sorted((r["offset"], r["length"]) for r in rows)
    via_cdx = W.read_warc_split(spark, path, tasks=4, spans=spans)
    assert via_cdx.count() == 25


def test_record_types_filter(spark, tmp_path):
    src = _pages(spark, n=10)
    [path] = W.write_warc_shards(src, str(tmp_path / "t"), n_shards=1)
    everything = W.read_warc(spark, path, record_types=None)
    assert everything.count() == 11  # + warcinfo
    only_info = W.read_warc(spark, path, record_types=("warcinfo",))
    assert only_info.count() == 1
    assert only_info.first()["http_status"] is None


def test_http_parse_units():
    body = b"<html>x</html>"
    rec = W.response_record_bytes("https://e/x", "2024-01-01T00:00:00Z", body)
    [(hdrs, payload)] = list(W.parse_records(rec))
    assert hdrs["warc-type"] == "response"
    status, ctype, got = W.parse_http_response(payload)
    assert (status, got) == (200, body)
    assert ctype.startswith("text/html")
    # chunked transfer decoding
    chunked = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
               b"4\r\nWiki\r\n5\r\npedia\r\n0\r\n\r\n")
    assert W.parse_http_response(chunked)[2] == b"Wikipedia"


def test_truncated_member_raises(tmp_path):
    rec = W.response_record_bytes("https://e/y", "2024-01-01T00:00:00Z", b"b")
    blob = gzip.compress(rec, 6, mtime=0)
    p = tmp_path / "trunc.warc.gz"
    p.write_bytes(blob[:-3])
    with pytest.raises(ValueError, match="truncated gzip member"):
        W.warc_member_spans(str(p))


def test_read_warc_glob(spark, tmp_path):
    src = _pages(spark, n=60)
    W.write_warc_shards(src, str(tmp_path / "g"), n_shards=3)
    back = W.read_warc_glob(spark, str(tmp_path / "g"))
    pd.testing.assert_frame_equal(
        _roundtrip_frame(src),
        _roundtrip_frame(back.select("url", "warc_ts", "html")))


def test_stream_warc_incremental(spark, tmp_path):
    """binaryFile file-stream ingest: first availableNow pass parses the
    landing files; a second pass after a new file lands processes ONLY
    the new file (checkpointed file log = exactly-once per file)."""
    landing = tmp_path / "landing"
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    src1 = _pages(spark, n=40)
    W.write_warc_shards(src1, str(landing), n_shards=2)

    def drain():
        q = (W.stream_warc(spark, str(landing))
             .writeStream.format("parquet")
             .option("path", str(out)).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()
    got1 = spark.read.parquet(str(out))
    assert got1.count() == 40
    # drop one NEW warc file with 10 more pages (disjoint urls)
    extra = _pages(spark, n=10, start=40)
    W.write_warc_shards(extra, str(landing / "more"), n_shards=1)
    import shutil
    shutil.move(str(landing / "more" / "shard-0000.warc.gz"),
                str(landing / "late-0001.warc.gz"))
    drain()
    got2 = spark.read.parquet(str(out))
    assert got2.count() == 50
    # every url parsed exactly once across both passes (no reprocess of
    # the first two shards, no missed late file)
    assert got2.select("url").distinct().count() == 50


def test_wet_shards_link_to_response_ids(spark, tmp_path_factory):
    """WET conversion shards: (a) text bytes roundtrip exactly; (b) every
    conversion record's WARC-Refers-To equals the record id a response
    shard assigns the SAME (url, ts) row — the cross-format linkage that
    lets a WET consumer range-fetch the source html; (c) re-runs are
    byte-identical (sink idempotence)."""
    import os

    from pyspark.sql import functions as F

    from geoutils_spark.sources import warc as W

    pages = spark.createDataFrame(
        [(f"https://site{i % 3}.example/p{i}",
          f"2024-02-0{1 + i % 5}T0{i % 9}:00:00",
          f"extracted text body {i} — unicode ok") for i in range(40)],
        "url string, ts_s string, text string",
    ).select("url", F.to_timestamp("ts_s").alias("warc_ts"), "text")
    base = tmp_path_factory.mktemp("wet")
    wet_dir, warc_dir = str(base / "wet"), str(base / "warc")
    wet_paths = W.write_wet_shards(pages, wet_dir, n_shards=3)
    warc_paths = W.write_warc_shards(
        pages.select("url", "warc_ts",
                     F.col("text").cast("binary").alias("html")),
        warc_dir, n_shards=3)
    assert all(p.endswith(".warc.wet.gz") for p in wet_paths)
    conv = W.read_warc(spark, wet_paths,
                       record_types=("conversion",)).collect()
    resp = {r["url"]: r["record_id"] for r in
            W.read_warc(spark, warc_paths).collect()}
    want_text = {r["url"]: r["text"] for r in pages.collect()}
    assert len(conv) == 40
    for r in conv:
        assert bytes(r["html"]).decode("utf-8") == want_text[r["url"]]
        assert r["refers_to"] == resp[r["url"]]
        assert r["http_status"] is None          # plain text, no envelope
    # idempotence: second write produces byte-identical files
    import hashlib
    h1 = [hashlib.md5(open(p, "rb").read()).hexdigest() for p in wet_paths]
    wet2 = str(base / "wet2")
    p2 = W.write_wet_shards(pages, wet2, n_shards=3)
    h2 = [hashlib.md5(open(p, "rb").read()).hexdigest() for p in p2]
    assert h1 == h2

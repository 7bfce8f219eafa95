"""WARC source + sink — the Common-Crawl on-ramp (ISO 28500 / WARC 1.0).

The reference ships a native on-ramp for its domain's wire format
(libosmium .osm/.osm.pbf, /root/reference/osm2assimp/main.cpp:279-281 —
re-expressed in sources/osm.py and sources/osmpbf.py). This engine's
input_hint payload is Common-Crawl-style web pages, and Common Crawl's
wire format is WARC: this module is the same idea for webtext — a
dependency-free codec for exactly the subset the data model needs
(warcinfo + response records carrying an HTTP envelope), written from the
public spec (ISO 28500:2017 / IIPC WARC 1.0: ``WARC/1.0`` header block,
``Content-Length``-framed payload, two CRLFs between records).

Layout and scale story mirror the PBF source:

* **record** = ``WARC/1.0 CRLF`` + header lines + ``CRLF`` + payload
  (``Content-Length`` bytes) + ``CRLF CRLF``. Response records wrap an
  HTTP/1.1 response (status line + headers + CRLFCRLF + body = the html).
* **.warc.gz** uses the Common-Crawl convention of ONE GZIP MEMBER PER
  RECORD — that is what makes a 1 GB crawl file block-splittable: any
  member boundary is a safe task boundary (``warc_member_spans`` +
  ``read_warc_split``, the analogue of ``pbf_blob_spans`` +
  ``read_osm_pbf_split``). On a real cluster the spans come for free from
  the CDX index published alongside the crawl (offset/length per record);
  ``warc_member_spans`` is the self-contained fallback that derives them
  by walking the members driver-side.
* parallelism granule: the FILE for ``read_warc`` (crawls ship as many
  ~1 GB files — the natural many-task layout), the MEMBER SPAN for
  ``read_warc_split`` (one huge file). Both parse records inside
  ``mapInPandas`` with bounded batches; per-row Python never touches a
  DataFrame hot path — parsing is the source boundary, exactly like the
  OSM readers.
* the sink (``write_warc_shards``) is byte-deterministic: md5-bucket
  shards, url-ordered records, fixed gzip level with mtime=0 — so WARC
  output is content-addressable and re-runs are idempotent (the same
  discipline as the pbf/OBJ sinks).
"""

from __future__ import annotations

import gzip
import hashlib
import os
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"
_GZIP_LEVEL = 6
_BATCH = 2000


# ---------------------------------------------------------------------------
# record codec (pure bytes; no deps)
# ---------------------------------------------------------------------------

def warc_date(ts) -> str:
    """WARC-Date format (ISO 8601 Zulu, second precision)."""
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _record_bytes(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = b"WARC/1.0" + _CRLF
    head += b"".join(f"{k}: {v}\r\n".encode("utf-8") for k, v in headers)
    head += f"Content-Length: {len(payload)}\r\n".encode("ascii")
    return head + _CRLF + payload + _CRLF + _CRLF


def response_record_bytes(url: str, date: str, body: bytes,
                          status: int = 200, reason: str = "OK",
                          content_type: str = "text/html; charset=utf-8",
                          ) -> bytes:
    """One WARC response record wrapping an HTTP/1.1 response. The record
    id is deterministic (md5 of url+date) so output bytes are a pure
    function of the row — the idempotence rule every sink here follows."""
    http = (f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode("ascii") + body
    rid = "<urn:md5:" + hashlib.md5(
        (url + date).encode("utf-8")).hexdigest() + ">"
    return _record_bytes([
        ("WARC-Type", "response"),
        ("WARC-Record-ID", rid),
        ("WARC-Date", date),
        ("WARC-Target-URI", url),
        ("Content-Type", "application/http; msgtype=response"),
    ], http)


def conversion_record_bytes(url: str, date: str, text: bytes) -> bytes:
    """WET-style extracted-text record (``WARC-Type: conversion``) — the
    Common-Crawl sidecar convention for plain-text derivations of crawl
    responses. ``WARC-Refers-To`` carries the DETERMINISTIC id of the
    response record for the same (url, date) (response_record_bytes'
    md5 rule), so a WET shard links back to its WARC source without any
    shared state. Record id and bytes are a pure function of the row —
    the sink idempotence rule."""
    rid = "<urn:md5:" + hashlib.md5(
        ("conversion:" + url + date).encode("utf-8")).hexdigest() + ">"
    refers = "<urn:md5:" + hashlib.md5(
        (url + date).encode("utf-8")).hexdigest() + ">"
    return _record_bytes([
        ("WARC-Type", "conversion"),
        ("WARC-Record-ID", rid),
        ("WARC-Refers-To", refers),
        ("WARC-Date", date),
        ("WARC-Target-URI", url),
        ("Content-Type", "text/plain"),
    ], text)


def warcinfo_record_bytes(filename: str, date: str) -> bytes:
    info = (f"software: geoutils_spark\r\nisPartOf: {filename}\r\n"
            ).encode("utf-8")
    rid = "<urn:md5:" + hashlib.md5(
        ("warcinfo:" + filename).encode("utf-8")).hexdigest() + ">"
    return _record_bytes([
        ("WARC-Type", "warcinfo"),
        ("WARC-Record-ID", rid),
        ("WARC-Date", date),
        ("WARC-Filename", filename),
        ("Content-Type", "application/warc-fields"),
    ], info)


def parse_records(buf: bytes) -> Iterator[tuple[dict, bytes]]:
    """All (headers, payload) records in a decompressed byte buffer.
    Header keys are lower-cased; values stripped."""
    pos, n = 0, len(buf)
    while pos < n:
        while pos < n and buf[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= n:
            return
        end = buf.find(b"\r\n\r\n", pos)
        if end < 0:
            raise ValueError(f"truncated WARC header block at offset {pos}")
        lines = buf[pos:end].decode("utf-8", "replace").split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC magic at offset {pos}: {lines[0]!r}")
        hdrs: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        clen = int(hdrs["content-length"])
        body_start = end + 4
        if body_start + clen > n:
            raise ValueError(f"truncated WARC payload at offset {pos}")
        yield hdrs, buf[body_start:body_start + clen]
        pos = body_start + clen


def _dechunk(body: bytes) -> bytes:
    out = bytearray()
    pos = 0
    while True:
        end = body.find(b"\r\n", pos)
        if end < 0:
            break
        size = int(body[pos:end].split(b";")[0], 16)
        if size == 0:
            break
        out += body[end + 2:end + 2 + size]
        pos = end + 2 + size + 2
    return bytes(out)


def parse_http_response(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) from an HTTP response payload; tolerates
    chunked transfer encoding. Non-HTTP payloads come back unparsed."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return None, None, payload
    lines = payload[:sep].decode("latin-1").split("\r\n")
    parts = lines[0].split()
    status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else None
    ctype = None
    chunked = False
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        lk = k.strip().lower()
        if lk == "content-type":
            ctype = v.strip()
        elif lk == "transfer-encoding" and "chunked" in v.lower():
            chunked = True
    body = payload[sep + 4:]
    if chunked:
        body = _dechunk(body)
    return status, ctype, body


# ---------------------------------------------------------------------------
# gzip member framing (the split story)
# ---------------------------------------------------------------------------

def _iter_gzip_members(buf: bytes) -> Iterator[bytes]:
    pos, n = 0, len(buf)
    while pos < n:
        d = zlib.decompressobj(47)
        out = d.decompress(buf[pos:])
        if not d.eof:
            raise ValueError(f"truncated gzip member at offset {pos}")
        yield out
        pos = n - len(d.unused_data)


def warc_member_spans(path: str) -> list[tuple[int, int]]:
    """(offset, length) of every gzip member — the splittable task
    boundaries of a member-per-record .warc.gz. Decompress-walk with
    discarded output (memory O(chunk)); a production crawl publishes these
    in its CDX index, so this driver-side walk is the self-contained
    fallback, not the scale path."""
    spans: list[tuple[int, int]] = []
    size = os.path.getsize(path)
    chunk = 1 << 20
    with open(path, "rb") as f:
        pos = 0
        while pos < size:
            f.seek(pos)
            d = zlib.decompressobj(47)
            fed = 0
            while not d.eof:
                data = f.read(chunk)
                if not data:
                    raise ValueError(f"truncated gzip member at offset {pos}")
                d.decompress(data)
                fed += len(data)
            length = fed - len(d.unused_data)
            spans.append((pos, length))
            pos += length
    return spans


# ---------------------------------------------------------------------------
# Spark readers
# ---------------------------------------------------------------------------

WARC_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), True),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("http_status", T.IntegerType(), True),
    T.StructField("content_type", T.StringType(), True),
    T.StructField("record_id", T.StringType(), True),
    T.StructField("refers_to", T.StringType(), True),
])


def _records_to_rows(records, record_types) -> Iterator[dict]:
    import pandas as pd

    for hdrs, payload in records:
        rtype = hdrs.get("warc-type", "")
        if record_types is not None and rtype not in record_types:
            continue
        status, ctype, body = parse_http_response(payload)
        ts = pd.Timestamp(hdrs.get("warc-date"))
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        yield {
            "url": hdrs.get("warc-target-uri"),
            "warc_ts": ts,
            "html": body,
            "http_status": status,
            "content_type": ctype,
            "record_id": hdrs.get("warc-record-id"),
            "refers_to": hdrs.get("warc-refers-to"),
        }


def _iter_file_records(path: str) -> Iterator[tuple[dict, bytes]]:
    if path.endswith(".gz"):
        with open(path, "rb") as f:
            buf = f.read()
        for member in _iter_gzip_members(buf):
            yield from parse_records(member)
    else:
        with open(path, "rb") as f:
            yield from parse_records(f.read())


def read_warc(spark: SparkSession, paths: list[str] | str,
              record_types: tuple[str, ...] | None = ("response",),
              ) -> DataFrame:
    """Pages-shaped table (url, warc_ts, html, http_status, content_type,
    record_id) from WARC files, one task per file — the natural layout for
    a crawl's many ~1 GB files. ``record_types=None`` keeps everything
    (warcinfo/request/metadata rows carry the raw payload as html)."""
    import pandas as pd

    if isinstance(paths, str):
        paths = [paths]
    pdf = spark.createDataFrame(pd.DataFrame({"path": paths}))
    pdf = pdf.repartition(len(paths))

    def parse(batches):
        for b in batches:
            for path in b["path"]:
                buf: list[dict] = []
                for row in _records_to_rows(
                        _iter_file_records(path), record_types):
                    buf.append(row)
                    if len(buf) >= _BATCH:
                        yield pd.DataFrame(buf)
                        buf = []
                if buf:
                    yield pd.DataFrame(buf)

    return pdf.mapInPandas(parse, WARC_SCHEMA)


def read_warc_split(spark: SparkSession, path: str, tasks: int = 0,
                    record_types: tuple[str, ...] | None = ("response",),
                    spans: list[tuple[int, int]] | None = None,
                    ) -> DataFrame:
    """Member-level parallel read of ONE .warc.gz: each task seeks to its
    own gzip-member spans and parses independently — the single-huge-file
    scale path. ``spans`` accepts precomputed (offset, length) pairs (a
    CDX index) and defaults to the driver-side member walk."""
    import pandas as pd

    if spans is None:
        spans = warc_member_spans(path)
    if tasks <= 0:
        tasks = max(1, min(len(spans), spark.sparkContext.defaultParallelism))
    pdf = spark.createDataFrame(
        pd.DataFrame({"offset": [s[0] for s in spans],
                      "length": [s[1] for s in spans]}))
    pdf = pdf.repartition(tasks)

    def parse(batches):
        for b in batches:
            with open(path, "rb") as f:
                buf: list[dict] = []
                for off, ln in zip(b["offset"], b["length"]):
                    f.seek(int(off))
                    raw = f.read(int(ln))
                    for member in _iter_gzip_members(raw):
                        for row in _records_to_rows(
                                parse_records(member), record_types):
                            buf.append(row)
                            if len(buf) >= _BATCH:
                                yield pd.DataFrame(buf)
                                buf = []
                if buf:
                    yield pd.DataFrame(buf)

    return pdf.mapInPandas(parse, WARC_SCHEMA)


CDX_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), True),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("offset", T.LongType(), False),
    T.StructField("length", T.LongType(), False),
    T.StructField("warc_type", T.StringType(), True),
    T.StructField("record_id", T.StringType(), True),
    T.StructField("refers_to", T.StringType(), True),
])


def cdx_index(spark: SparkSession, path: str,
              spans: list[tuple[int, int]] | None = None) -> DataFrame:
    """CDX-style capture index (url, warc_ts, offset, length) for one
    member-per-record .warc.gz — what a crawler publishes so consumers can
    range-fetch single records; here it also feeds ``read_warc_split``
    with spans on re-reads (checkpoint-resume for the ingest tier)."""
    import pandas as pd

    if spans is None:
        spans = warc_member_spans(path)
    pdf = spark.createDataFrame(
        pd.DataFrame({"offset": [s[0] for s in spans],
                      "length": [s[1] for s in spans]}))
    pdf = pdf.repartition(
        max(1, min(len(spans), spark.sparkContext.defaultParallelism)))

    def parse(batches):
        for b in batches:
            with open(path, "rb") as f:
                rows = []
                for off, ln in zip(b["offset"], b["length"]):
                    f.seek(int(off))
                    raw = f.read(int(ln))
                    for member in _iter_gzip_members(raw):
                        for hdrs, _payload in parse_records(member):
                            ts = pd.Timestamp(hdrs.get("warc-date"))
                            if ts.tzinfo is not None:
                                ts = ts.tz_convert("UTC").tz_localize(None)
                            rows.append({
                                "url": hdrs.get("warc-target-uri"),
                                "warc_ts": ts,
                                "offset": int(off),
                                "length": int(ln),
                                "warc_type": hdrs.get("warc-type"),
                                "record_id": hdrs.get("warc-record-id"),
                                "refers_to": hdrs.get("warc-refers-to"),
                            })
                if rows:
                    yield pd.DataFrame(rows)

    return pdf.mapInPandas(parse, CDX_SCHEMA)


# ---------------------------------------------------------------------------
# sink
# ---------------------------------------------------------------------------

def write_warc_shards(df: DataFrame, out_dir: str, n_shards: int = 4,
                      url: str = "url", ts: str = "warc_ts",
                      body: str = "html", compress: bool = True,
                      warcinfo: bool = True,
                      record_type: str = "response") -> list[str]:
    """Pages-shaped DataFrame -> ``<out_dir>/shard-NNNN.warc[.gz]``.

    Shard = md5 bucket of the url (row-local, partitioning-invariant);
    records url-ordered inside each shard; one task owns one file (the
    per-cell pbf sink's lock-free layout); gzip member per record with
    mtime=0 and a fixed level, so the output bytes are a pure function of
    the rows — re-runs produce identical files. Returns the shard paths.

    ``record_type="conversion"`` writes WET-style extracted-text shards
    (``.warc.wet[.gz]``, conversion records linking back to the response
    ids via WARC-Refers-To) from a plain-text ``body`` column."""
    if record_type not in ("response", "conversion"):
        raise ValueError(f"unsupported record_type {record_type!r}")
    os.makedirs(out_dir, exist_ok=True)
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col(url).cast("binary")), 1, 8),
               16, 10).cast("long"),
        F.lit(n_shards))
    d = (df.select(F.col(url).alias("url"), F.col(ts).alias("warc_ts"),
                   F.col(body).cast("binary").alias("html"),
                   shard.alias("__shard"))
         .repartition(n_shards, "__shard")
         .sortWithinPartitions("url"))
    stem = ".warc.wet" if record_type == "conversion" else ".warc"
    ext = stem + ".gz" if compress else stem

    def write_partition(rows):
        handles: dict[int, object] = {}
        try:
            for r in rows:
                s = int(r["__shard"])
                if s not in handles:
                    name = f"shard-{s:04d}{ext}"
                    handles[s] = open(os.path.join(out_dir, name), "wb")
                    if warcinfo:
                        rec = warcinfo_record_bytes(
                            name, "2024-01-01T00:00:00Z")
                        handles[s].write(
                            gzip.compress(rec, _GZIP_LEVEL, mtime=0)
                            if compress else rec)
                date = warc_date(r["warc_ts"])
                payload = bytes(r["html"] or b"")
                rec = (conversion_record_bytes(r["url"], date, payload)
                       if record_type == "conversion"
                       else response_record_bytes(r["url"], date, payload))
                handles[s].write(
                    gzip.compress(rec, _GZIP_LEVEL, mtime=0)
                    if compress else rec)
        finally:
            for h in handles.values():
                h.close()

    d.foreachPartition(write_partition)
    return sorted(
        os.path.join(out_dir, p) for p in os.listdir(out_dir)
        if p.endswith(ext))


def write_wet_shards(df: DataFrame, out_dir: str, n_shards: int = 4,
                     url: str = "url", ts: str = "warc_ts",
                     text: str = "text", compress: bool = True) -> list[str]:
    """Extracted-text DataFrame -> WET shards (conversion records); see
    write_warc_shards(record_type='conversion')."""
    return write_warc_shards(df, out_dir, n_shards=n_shards, url=url,
                             ts=ts, body=text, compress=compress,
                             record_type="conversion")


# ---------------------------------------------------------------------------
# binaryFile-source readers (batch glob + structured streaming ingest)
# ---------------------------------------------------------------------------

def _content_parser(record_types):
    import pandas as pd

    def parse(batches):
        for b in batches:
            buf: list[dict] = []
            for content in b["content"]:
                blob = bytes(content)
                records = (
                    (r for m in _iter_gzip_members(blob)
                     for r in parse_records(m))
                    if blob[:2] == b"\x1f\x8b" else parse_records(blob))
                for row in _records_to_rows(records, record_types):
                    buf.append(row)
                    if len(buf) >= _BATCH:
                        yield pd.DataFrame(buf)
                        buf = []
            if buf:
                yield pd.DataFrame(buf)

    return parse


def read_warc_glob(spark: SparkSession, path_glob: str,
                   record_types: tuple[str, ...] | None = ("response",),
                   ) -> DataFrame:
    """WARC parse over Spark's ``binaryFile`` source: the catalog lists
    and partitions the crawl files (glob/partition pruning for free, no
    driver-side path collection), each row carries one file's bytes and
    parses row-locally. Complements ``read_warc`` (explicit path list)
    and ``read_warc_split`` (one huge file)."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc*")
             .load(path_glob).select("content"))
    return files.mapInPandas(_content_parser(record_types), WARC_SCHEMA)


def stream_warc(spark: SparkSession, landing_dir: str,
                record_types: tuple[str, ...] | None = ("response",),
                max_files_per_trigger: int | None = None) -> DataFrame:
    """STREAMING crawl ingest: a ``binaryFile`` file stream over the
    landing directory — every new .warc/.warc.gz that a crawler drops
    becomes one micro-batch row, parsed to pages rows by the same codec
    as the batch readers. Checkpointing gives exactly-once file
    processing across restarts (the file-source log); compose with
    ``streaming/latest.LatestKeeper`` for keep-latest upserts or write
    straight to the pages table. ``max_files_per_trigger`` bounds a
    micro-batch for backfill over a large landing dir."""
    binfile_schema = T.StructType([
        T.StructField("path", T.StringType(), True),
        T.StructField("modificationTime", T.TimestampType(), True),
        T.StructField("length", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ])
    reader = (spark.readStream.format("binaryFile")
              .schema(binfile_schema)
              .option("pathGlobFilter", "*.warc*"))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(landing_dir).select("content")
    return files.mapInPandas(_content_parser(record_types), WARC_SCHEMA)

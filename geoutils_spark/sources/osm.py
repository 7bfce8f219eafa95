"""OSM ingestion: .osm / .osm.gz / .osm.bz2 XML and .osm.pbf files ->
nodes/ways DataFrames.

The reference streams OSM XML/PBF natively through libosmium readers with
node|way entity bits (/root/reference/osm2assimp/main.cpp:279-281,
/root/reference/osmsplit/main.cpp:102-104). These readers give the engine
the same on-ramps: XML via stdlib iterparse, PBF via the hand-rolled
public-spec codec in sources/osmpbf.py (DenseNodes + Ways, zlib blobs) —
the format planet extracts actually ship in.

Distribution shape: the unit of parallelism is the FILE — the path list is
parallelized and each task streams its file (constant memory) inside
``mapInPandas``. OSM XML is not line-splittable, so per-file tasks are the
correct granule; PBF's independent Blob framing additionally allows
block-level splitting of one huge file on a real cluster (each Blob
decodes standalone — osmpbf.iter_osm_pbf processes them one at a time).
The planet usually re-shards into many per-region files anyway (the
reference's osmsplit exists precisely to produce that layout, so
multi-file parallelism is the reference's own scaling model).

Output is a single entity table in file order (kind='node'|'way'), mirroring
the reference's one-pass handler stream; ``nodes()``/``ways()`` project the
typed views. Reading the entity table twice (once per view) re-parses the
file — the reference's own two-pass shape (ways-only rescan,
/root/reference/osmsplit/osmsplitwriter.cpp:146-148); cache the entity
DataFrame when both views are consumed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ENTITY_SCHEMA = T.StructType([
    T.StructField("kind", T.StringType(), False),
    T.StructField("id", T.LongType(), False),
    T.StructField("lon", T.DoubleType(), True),
    T.StructField("lat", T.DoubleType(), True),
    T.StructField("refs", T.ArrayType(T.LongType()), True),
    T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
])

_BATCH = 10000


def iter_osm_file(path: str) -> Iterator[dict]:
    """Dispatch by extension: .osm[.gz|.bz2] XML or .osm.pbf (the format
    planet extracts ship in — sources/osmpbf.py, hand-rolled public-spec
    codec)."""
    if path.endswith(".pbf"):
        from geoutils_spark.sources.osmpbf import iter_osm_pbf
        yield from iter_osm_pbf(path)
    else:
        yield from iter_osm_xml(path)


def iter_osm_xml(path: str) -> Iterator[dict]:
    """Stream one .osm XML file as entity dicts (nodes then ways in file
    order). iterparse + clear() keeps memory constant regardless of file
    size — the same streaming discipline as the reference's osmium readers.
    Relations are skipped (the reference never processes them,
    SURVEY.md §1.1)."""
    import xml.etree.ElementTree as ET

    if path.endswith(".gz"):
        import gzip
        src = gzip.open(path, "rb")
    elif path.endswith(".bz2"):
        import bz2
        src = bz2.open(path, "rb")
    else:
        src = path
    root = None
    for event, elem in ET.iterparse(src, events=("start", "end")):
        if event == "start":
            if root is None:
                root = elem
            continue
        if elem.tag == "node":
            yield {
                "kind": "node",
                "id": int(elem.get("id")),
                "lon": float(elem.get("lon")),
                "lat": float(elem.get("lat")),
                "refs": None,
                "tags": {t.get("k"): t.get("v") for t in elem.findall("tag")} or None,
            }
            elem.clear()
        elif elem.tag == "way":
            yield {
                "kind": "way",
                "id": int(elem.get("id")),
                "lon": None,
                "lat": None,
                "refs": [int(nd.get("ref")) for nd in elem.findall("nd")],
                "tags": {t.get("k"): t.get("v") for t in elem.findall("tag")},
            }
            elem.clear()
        elif elem.tag in ("bounds", "tag", "nd"):
            continue  # children are consumed by their parents above
        else:
            continue
        # detach processed top-level elements from the accumulating root —
        # elem.clear() alone leaves them referenced in root's child list
        # (the classic iterparse leak), growing memory with file size
        if root is not None:
            root.clear()


def read_osm_entities(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """Parse .osm file(s) into the entity table, one task per file."""
    if isinstance(paths, str):
        paths = [paths]
    if not paths:
        # createDataFrame from an empty pandas frame + repartition(0) dies
        # with an obscure error — an empty path list is just an empty table
        return spark.createDataFrame([], ENTITY_SCHEMA)
    pdf = spark.createDataFrame(pd.DataFrame({"path": paths})) \
        .repartition(len(paths))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for path in b["path"]:
                buf: list[dict] = []
                for ent in iter_osm_file(path):
                    buf.append(ent)
                    if len(buf) >= _BATCH:
                        yield pd.DataFrame(buf)
                        buf = []
                if buf:
                    yield pd.DataFrame(buf)

    return pdf.mapInPandas(parse, ENTITY_SCHEMA)


def nodes(entities: DataFrame) -> DataFrame:
    return entities.filter(entities.kind == "node").select("id", "lon", "lat")


def ways(entities: DataFrame) -> DataFrame:
    return entities.filter(entities.kind == "way").select("id", "refs", "tags")


def read_osm(spark: SparkSession, paths: list[str] | str
             ) -> tuple[DataFrame, DataFrame]:
    """(nodes_df, ways_df) with the engine's standard OSM schemas
    (id/lon/lat; id/refs/tags — SURVEY.md §1.3); format by extension."""
    ents = read_osm_entities(spark, paths)
    return nodes(ents), ways(ents)


# back-compat name (the reader has always dispatched on extension)
read_osm_xml = read_osm


_XML_BOUNDARY = None  # compiled lazily (re import kept out of the hot path)


def _find_xml_boundary(f, pos: int, chunk: int = 1 << 16) -> int | None:
    """Absolute byte offset of the first top-level ``<node``/``<way``
    element start at or after ``pos``; None past EOF. Scans forward in
    chunks with a small overlap so a tag straddling a chunk edge is still
    found. (``<nd`` never matches: the pattern requires a delimiter after
    the tag name.)"""
    global _XML_BOUNDARY
    if _XML_BOUNDARY is None:
        import re
        _XML_BOUNDARY = re.compile(rb"<(?:node|way)[ \t\r\n/>]")
    f.seek(max(pos, 0))
    tail = b""
    base = max(pos, 0)
    while True:
        data = f.read(chunk)
        if not data:
            return None
        buf = tail + data
        m = _XML_BOUNDARY.search(buf)
        if m:
            return base - len(tail) + m.start()
        tail = buf[-8:]
        base += len(data)


def iter_osm_xml_span(path: str, start: int, end: int) -> Iterator[dict]:
    """Entities whose element START offset lies in [start, end) — the
    Hadoop text-split convention, so contiguous spans partition one huge
    plain ``.osm`` file with no element parsed twice or skipped. Only for
    uncompressed XML (gz/bz2 are not splittable)."""
    import io
    import os as _os
    import xml.etree.ElementTree as ET

    size = _os.path.getsize(path)
    with open(path, "rb") as f:
        s_off = _find_xml_boundary(f, start)
        if s_off is None or s_off >= end:
            return
        e_off = _find_xml_boundary(f, end) if end < size else None
        f.seek(s_off)
        chunk = f.read((e_off if e_off is not None else size) - s_off)
    if e_off is None:
        # the tail span carries the closing </osm>; drop it
        cut = chunk.rfind(b"</osm>")
        if cut >= 0:
            chunk = chunk[:cut]
    # the chunk is whole sibling elements — wrap in a synthetic root and
    # reuse the streaming element parser
    src = io.BytesIO(b"<osm>" + chunk + b"</osm>")
    for event, elem in ET.iterparse(src, events=("end",)):
        if elem.tag == "node":
            yield {
                "kind": "node",
                "id": int(elem.get("id")),
                "lon": float(elem.get("lon")),
                "lat": float(elem.get("lat")),
                "refs": None,
                "tags": {t.get("k"): t.get("v") for t in elem.findall("tag")} or None,
            }
            elem.clear()
        elif elem.tag == "way":
            yield {
                "kind": "way",
                "id": int(elem.get("id")),
                "lon": None,
                "lat": None,
                "refs": [int(nd.get("ref")) for nd in elem.findall("nd")],
                "tags": {t.get("k"): t.get("v") for t in elem.findall("tag")},
            }
            elem.clear()


def read_osm_xml_split(spark: SparkSession, path: str,
                       tasks: int = 0) -> DataFrame:
    """Entity table from ONE huge plain ``.osm`` XML with BYTE-RANGE
    parallelism — the XML counterpart of ``read_osm_pbf_split`` (r2 verdict
    task 7). The file is cut into even byte spans driver-side (no scan);
    each task aligns its span to the next top-level element boundary and
    parses independently. Compressed XML is rejected (not splittable —
    use the per-file reader)."""
    import os as _os

    import pandas as pd

    if path.endswith((".gz", ".bz2", ".pbf")):
        raise ValueError(f"read_osm_xml_split needs uncompressed .osm XML, got {path}")
    size = _os.path.getsize(path)
    if tasks <= 0:
        tasks = max(1, spark.sparkContext.defaultParallelism)
    tasks = max(1, min(tasks, size))
    step = size // tasks
    bounds = [i * step for i in range(tasks)] + [size]
    pdf = spark.createDataFrame(
        pd.DataFrame({"start": bounds[:-1], "end": bounds[1:]}))
    pdf = pdf.repartition(tasks)

    def parse(batches):
        for b in batches:
            for start, end in zip(b["start"], b["end"]):
                buf: list[dict] = []
                for ent in iter_osm_xml_span(path, int(start), int(end)):
                    buf.append(ent)
                    if len(buf) >= _BATCH:
                        yield pd.DataFrame(buf)
                        buf = []
                if buf:
                    yield pd.DataFrame(buf)

    return pdf.mapInPandas(parse, ENTITY_SCHEMA)


def read_osm_pbf_split(spark: SparkSession, path: str,
                       tasks: int = 0) -> DataFrame:
    """Entity table from ONE .osm.pbf with BLOCK-LEVEL parallelism: blob
    spans are indexed driver-side (seek-only, O(#blobs)) and distributed so
    each task decodes its own blob ranges independently — the scale path
    for a single planet-sized file (PBF Blob framing is splittable; the
    per-file reader remains the granule for many-file layouts)."""
    import pandas as pd

    from geoutils_spark.sources.osmpbf import iter_osm_pbf_span, pbf_blob_spans

    spans = pbf_blob_spans(path)
    if tasks <= 0:
        tasks = max(1, min(len(spans), spark.sparkContext.defaultParallelism))
    pdf = spark.createDataFrame(
        pd.DataFrame({"offset": [s[0] for s in spans],
                      "length": [s[1] for s in spans]}))
    pdf = pdf.repartition(tasks)

    def parse(batches):
        for b in batches:
            for off, ln in zip(b["offset"], b["length"]):
                buf: list[dict] = []
                for ent in iter_osm_pbf_span(path, int(off), int(ln)):
                    buf.append(ent)
                    if len(buf) >= _BATCH:
                        yield pd.DataFrame(buf)
                        buf = []
                if buf:
                    yield pd.DataFrame(buf)

    return pdf.mapInPandas(parse, ENTITY_SCHEMA)

"""Minimal OSM PBF codec (reader + writer) — no protobuf dependency.

The reference ingests ``.osm.pbf`` natively through libosmium
(/root/reference/osm2assimp/main.cpp:279-281) and WRITES per-cell/per-leaf
pbf files (s2splitter.cpp:54-72, osmsplitwriter.cpp:17-48). Planet extracts
ship as pbf, so this is the real-world on-ramp. The format is a public
spec (OSM PBF: blob framing + protobuf messages); this module hand-rolls
exactly the subset the engine's data model needs — DenseNodes and Ways
with tags — as pure-python varint codecs:

* file = repeat( int32-BE len | BlobHeader | Blob )
* BlobHeader{1: type, 3: datasize}; Blob{1: raw} or {2: raw_size, 3: zlib}
* OSMData = PrimitiveBlock{1: stringtable, 2: group, 17: granularity,
  19/20: lat/lon offset}; group{2: DenseNodes, 3: Way}
* DenseNodes{1: ids, 8: lats, 9: lons, 10: keys_vals} — packed
  zigzag-delta; Way{1: id, 2: keys, 3: vals, 8: refs(zigzag-delta)}
* coord = 1e-9 * (offset + granularity * value), granularity default 100

Relations are skipped (the reference never processes them). Per-file
streaming like the XML reader: blobs decode one at a time, so memory is
O(blob) not O(file). Parallelism granule = the file for the mapInPandas
reader in sources/osm.py; the blob framing is what makes pbf
block-splittable on a real cluster (each Blob is independently
decodable — the documented scale path).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

_NANO = 1e-9


# ---------------------------------------------------------------------------
# varint / protobuf primitives
# ---------------------------------------------------------------------------

def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _zigzag_dec(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _enc_uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_enc(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Iterate (field_no, wire_type, value) over one message."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _uvarint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = _uvarint(buf, pos)
            yield field, wt, v
        elif wt == 2:
            ln, pos = _uvarint(buf, pos)
            yield field, wt, buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            yield field, wt, buf[pos:pos + 4]
            pos += 4
        elif wt == 1:
            yield field, wt, buf[pos:pos + 8]
            pos += 8
        else:  # pragma: no cover
            raise ValueError(f"unsupported wire type {wt}")


def _packed_varints(buf: bytes) -> list[int]:
    out = []
    pos = 0
    while pos < len(buf):
        v, pos = _uvarint(buf, pos)
        out.append(v)
    return out


def _delta_dec(vals: list[int]) -> list[int]:
    out = []
    acc = 0
    for v in vals:
        acc += _zigzag_dec(v)
        out.append(acc)
    return out


def _tag(field: int, wt: int) -> bytes:
    return _enc_uvarint((field << 3) | wt)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _enc_uvarint(len(payload)) + payload


def _packed_field(field: int, vals: list[int]) -> bytes:
    body = b"".join(_enc_uvarint(v) for v in vals)
    return _len_field(field, body)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def iter_osm_pbf(path: str) -> Iterator[dict]:
    """Stream a .osm.pbf file as the same entity dicts sources/osm.py yields
    for XML (kind/id/lon/lat/refs/tags)."""
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) < 4:
                return
            (hlen,) = struct.unpack(">I", head)
            header = f.read(hlen)
            btype = b""
            datasize = 0
            for field, _wt, v in _fields(header):
                if field == 1:
                    btype = v
                elif field == 3:
                    datasize = v
            blob = f.read(datasize)
            if btype != b"OSMData":
                continue
            yield from _iter_primitive_block(_decode_blob(blob))


_BLOB_CODECS = {4: "lzma", 5: "obsolete-bzip2", 6: "lz4", 7: "zstd"}


def _decode_blob(blob: bytes) -> bytes:
    """Blob payload -> raw PrimitiveBlock bytes. Raw and zlib are the
    formats this codec emits and the overwhelmingly common ones in the
    wild; any OTHER compression raises LOUDLY instead of silently dropping
    the blob's data (newer extracts can ship lz4/zstd blobs)."""
    raw = None
    for field, _wt, v in _fields(blob):
        if field == 1:
            raw = v
        elif field == 3:
            raw = zlib.decompress(v)
        elif field in _BLOB_CODECS:
            raise ValueError(
                f"OSM PBF blob uses unsupported compression "
                f"'{_BLOB_CODECS[field]}' — re-encode with zlib (osmium cat) "
                f"or extend sources/osmpbf._decode_blob")
    if raw is None:
        raise ValueError("OSM PBF blob carries no raw/zlib payload")
    return raw


def _iter_primitive_block(buf: bytes) -> Iterator[dict]:
    strings: list[str] = []
    groups: list[bytes] = []
    gran, lat_off, lon_off = 100, 0, 0
    for field, _wt, v in _fields(buf):
        if field == 1:  # stringtable
            strings = [s.decode("utf-8")
                       for f2, _w2, s in _fields(v) if f2 == 1]
        elif field == 2:
            groups.append(v)
        elif field == 17:
            gran = v
        elif field == 19:
            lat_off = v
        elif field == 20:
            lon_off = v

    def coord(off: int, val: int) -> float:
        return _NANO * (off + gran * val)

    for g in groups:
        for field, _wt, v in _fields(g):
            if field == 2:  # DenseNodes
                ids = lats = lons = []
                kv: list[int] = []
                for f2, _w2, p in _fields(v):
                    if f2 == 1:
                        ids = _delta_dec(_packed_varints(p))
                    elif f2 == 8:
                        lats = _delta_dec(_packed_varints(p))
                    elif f2 == 9:
                        lons = _delta_dec(_packed_varints(p))
                    elif f2 == 10:
                        kv = _packed_varints(p)
                # keys_vals: <k,v>* 0 per node (0 terminates a node's list)
                tags_per_node: list[dict] = []
                cur: dict = {}
                pending_key: int | None = None
                for x in kv:
                    if pending_key is None:
                        if x == 0:
                            tags_per_node.append(cur)
                            cur = {}
                        else:
                            pending_key = x
                    else:
                        cur[strings[pending_key]] = strings[x]
                        pending_key = None
                for i, nid in enumerate(ids):
                    t = tags_per_node[i] if i < len(tags_per_node) else {}
                    yield {"kind": "node", "id": nid,
                           "lon": coord(lon_off, lons[i]),
                           "lat": coord(lat_off, lats[i]),
                           "refs": None, "tags": t or None}
            elif field == 3:  # Way
                wid = 0
                keys: list[int] = []
                vals: list[int] = []
                refs: list[int] = []
                for f2, _w2, p in _fields(v):
                    if f2 == 1:
                        wid = p
                    elif f2 == 2:
                        keys = _packed_varints(p)
                    elif f2 == 3:
                        vals = _packed_varints(p)
                    elif f2 == 8:
                        refs = _delta_dec(_packed_varints(p))
                yield {"kind": "way", "id": wid, "lon": None, "lat": None,
                       "refs": refs,
                       "tags": {strings[k]: strings[x]
                                for k, x in zip(keys, vals)}}
            # field 1 (plain nodes) unused by mainstream writers; field 4
            # (relations) deliberately skipped


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def write_osm_pbf(path: str, nodes: list[tuple], ways: list[tuple],
                  compress: bool = True, block_size: int = 8000) -> None:
    """Write (id, lon, lat) nodes + (id, refs, tags) ways as standard
    DenseNodes/Way blocks — the per-cell pbf sink shape of the reference's
    s2splitter (one nodes-then-ways file per cell)."""
    with open(path, "wb") as f:
        _write_blob(f, b"OSMHeader", _header_block(), compress)
        for i in range(0, len(nodes), block_size):
            _write_blob(f, b"OSMData",
                        _dense_block(nodes[i:i + block_size]), compress)
        for i in range(0, len(ways), block_size):
            _write_blob(f, b"OSMData",
                        _ways_block(ways[i:i + block_size]), compress)


def _header_block() -> bytes:
    feats = b"".join(_len_field(4, s.encode())
                     for s in ("OsmSchema-V0.6", "DenseNodes"))
    return feats


def _write_blob(f, btype: bytes, payload: bytes, compress: bool) -> None:
    if compress:
        z = zlib.compress(payload)
        blob = (_tag(2, 0) + _enc_uvarint(len(payload)) + _len_field(3, z))
    else:
        blob = _len_field(1, payload)
    header = (_len_field(1, btype)
              + _tag(3, 0) + _enc_uvarint(len(blob)))
    f.write(struct.pack(">I", len(header)))
    f.write(header)
    f.write(blob)


def _stringtable(strings: list[str]) -> bytes:
    body = b"".join(_len_field(1, s.encode("utf-8")) for s in strings)
    return _len_field(1, body)


def _delta_enc(vals: list[int]) -> list[int]:
    out = []
    prev = 0
    for v in vals:
        out.append(_zigzag_enc(v - prev))
        prev = v
    return out


def _dense_block(nodes: list[tuple]) -> bytes:
    ids = [n[0] for n in nodes]
    lons = [round(n[1] / _NANO / 100) for n in nodes]
    lats = [round(n[2] / _NANO / 100) for n in nodes]
    dense = (_packed_field(1, _delta_enc(ids))
             + _packed_field(8, _delta_enc(lats))
             + _packed_field(9, _delta_enc(lons)))
    group = _len_field(2, dense)
    # stringtable entry 0 must exist (the empty string)
    return _stringtable([""]) + _len_field(2, group)


def _ways_block(ways: list[tuple]) -> bytes:
    strings = [""]
    index: dict[str, int] = {"": 0}

    def sid(s: str) -> int:
        if s not in index:
            index[s] = len(strings)
            strings.append(s)
        return index[s]

    msgs = []
    for wid, refs, tags in ways:
        body = _tag(1, 0) + _enc_uvarint(wid)
        body += _packed_field(2, [sid(k) for k in tags])
        body += _packed_field(3, [sid(v) for v in tags.values()])
        body += _packed_field(8, _delta_enc(list(refs)))
        msgs.append(_len_field(3, body))
    group = b"".join(msgs)
    return _stringtable(strings) + _len_field(2, group)


# ---------------------------------------------------------------------------
# block-level splitting (one huge file -> many tasks)
# ---------------------------------------------------------------------------

def pbf_blob_spans(path: str) -> list[tuple[int, int]]:
    """[(offset, length)] of every OSMData blob — a seek-only driver pass
    over the blob framing (reads 4-byte lengths + headers, skips payloads),
    so indexing the planet file costs O(#blobs) tiny reads. Each span is
    independently decodable: this is what makes pbf block-splittable."""
    spans = []
    with open(path, "rb") as f:
        while True:
            start = f.tell()
            head = f.read(4)
            if len(head) < 4:
                return spans
            (hlen,) = struct.unpack(">I", head)
            header = f.read(hlen)
            btype = b""
            datasize = 0
            for field, _wt, v in _fields(header):
                if field == 1:
                    btype = v
                elif field == 3:
                    datasize = v
            f.seek(datasize, 1)
            if btype == b"OSMData":
                spans.append((start, 4 + hlen + datasize))


def iter_osm_pbf_span(path: str, offset: int, length: int) -> Iterator[dict]:
    """Stream the entities of one blob span (see pbf_blob_spans)."""
    with open(path, "rb") as f:
        f.seek(offset)
        buf = f.read(length)
    (hlen,) = struct.unpack(">I", buf[:4])
    yield from _iter_primitive_block(_decode_blob(buf[4 + hlen:]))

"""Multimodal columns: opaque binary payloads with typed metadata and
Arrow-batched decode / feature-extract / frame-sample plumbing.

Training-data pipelines carry images/audio/video as ``binary`` columns next
to typed metadata, processed by ``mapInPandas`` over Arrow batches. The
image/audio codec libraries are not in this container, so the *codec* step is
stubbed two ways (both with the real distributed plumbing — schema,
partitioning, batch shape — fully implemented and tested):

* ``decode_image_meta`` — parses a deterministic fake header (FAKM magic)
  produced by ``synth_image_col``; pure numpy over the batch.
* ``decode_real_image`` — raises ``NotImplementedError`` with the dependency
  name, the clearly-marked seam where PIL/libvips plugs in on a real
  cluster.

Header layout (16 bytes, big-endian): magic ``FAKM`` | u16 width | u16
height | u8 channels | u8 format | u16 seed | 4 pad. Payload bytes after the
header are deterministic from the seed.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"FAKM"
HEADER_LEN = 16
FORMATS = ["png", "jpeg", "webp"]

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("format", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("valid", T.BooleanType(), False),
])


def synth_image_col(key: Column) -> Column:
    """Deterministic fake image payload from an integer key (fixture
    generator for the binary column; JVM-side, no UDF): FAKM header with
    width/height/format derived from the key + 32 payload bytes."""
    width = (F.pmod(key, F.lit(320)) + 16).cast("int")
    height = (F.pmod(key * 7, F.lit(240)) + 16).cast("int")
    channels = F.when(F.pmod(key, F.lit(5)) == 0, 1).otherwise(3).cast("int")
    fmt = F.pmod(key, F.lit(len(FORMATS))).cast("int")
    seed = F.pmod(key, F.lit(65536)).cast("int")

    def u16(c: Column) -> Column:
        hex4 = F.lpad(F.lower(F.hex(c)), 4, "0")
        return F.to_binary(hex4, F.lit("hex"))

    def u8(c: Column) -> Column:
        return F.to_binary(F.lpad(F.lower(F.hex(c)), 2, "0"), F.lit("hex"))

    payload = F.to_binary(F.md5(key.cast("string").cast("binary")), F.lit("hex"))
    pad = F.to_binary(F.lit("00000000"), F.lit("hex"))
    return F.concat(
        F.lit(MAGIC), u16(width), u16(height), u8(channels), u8(fmt),
        u16(seed), pad, payload, payload,
    )


def _decode_batch(blobs: pd.Series) -> pd.DataFrame:
    n = len(blobs)
    out = {
        "width": np.zeros(n, dtype="int32"), "height": np.zeros(n, dtype="int32"),
        "channels": np.zeros(n, dtype="int32"), "format": np.empty(n, dtype=object),
        "n_bytes": np.zeros(n, dtype="int64"), "valid": np.zeros(n, dtype=bool),
    }
    for i, b in enumerate(blobs):
        b = bytes(b) if b is not None else b""
        out["n_bytes"][i] = len(b)
        if len(b) >= HEADER_LEN and b[:4] == MAGIC:
            w, h = struct.unpack(">HH", b[4:8])
            ch, fmt = b[8], b[9]
            out["width"][i] = w
            out["height"][i] = h
            out["channels"][i] = ch
            out["format"][i] = FORMATS[fmt] if fmt < len(FORMATS) else "unknown"
            out["valid"][i] = True
        else:
            out["format"][i] = None
    df = pd.DataFrame(out)
    df.loc[~df["valid"], ["width", "height", "channels"]] = None
    return df


def decode_image_meta(df: DataFrame, blob: str = "image",
                      out: str = "meta") -> DataFrame:
    """Attach decoded metadata struct via mapInPandas (Arrow batches; the
    pattern real codecs slot into)."""
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(out, IMAGE_META_SCHEMA, True)])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = _decode_batch(pdf[blob])
            pdf = pdf.copy()
            pdf[out] = [
                None if not v else row
                for v, row in zip(meta["valid"], meta.to_dict("records"))
            ]
            yield pdf

    return df.mapInPandas(gen, schema)


def decode_real_image(blob: bytes):
    """The real-codec seam: requires PIL / libvips, absent in this sandbox."""
    raise NotImplementedError(
        "real image decode requires PIL/libvips — not available in this "
        "container; synth payloads decode via decode_image_meta")


def image_features(df: DataFrame, blob: str = "image") -> DataFrame:
    """Feature-extract stub with real plumbing: 8-dim byte-histogram feature
    vector per payload, vectorized numpy over each Arrow batch (the shape an
    embedding model's preprocessing takes)."""
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField("feat", T.ArrayType(T.DoubleType()), False)])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[blob]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr >> 5, minlength=8).astype(float)
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            pdf = pdf.copy()
            pdf["feat"] = feats
            yield pdf

    return df.mapInPandas(gen, schema)


def sample_frames(df: DataFrame, n_frames: str = "n_frames",
                  every: int = 10) -> DataFrame:
    """Video frame sampling plumbing: explode frame indices 0, every,
    2*every, ... < n_frames — pure column ops (the decode of each frame is
    the codec seam above)."""
    idx = F.sequence(F.lit(0), F.col(n_frames) - 1, F.lit(every))
    return df.withColumn("frame_idx", F.explode(idx))

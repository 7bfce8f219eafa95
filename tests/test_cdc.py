"""Content-defined chunking (operators/cdc.py): kernel/twin agreement,
the insertion-resilience property that motivates CDC, floor semantics,
and blob edges."""

import hashlib

from pyspark.sql import functions as F

from geoutils_spark.operators import cdc as C


def test_kernel_matches_catalyst_twin(spark):
    texts = ["the quick brown fox jumps over the lazy dog " * 4,
             "tiny", "", "a" * 64, "x" * 15]
    import numpy as np

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    twin = {r["i"]: list(r["hs"]) for r in df.select(
        "i", C.rolling_hash_col(F.col("text")).alias("hs")).collect()}
    for i, t in enumerate(texts):
        b = t.encode()
        if len(b) < C.WINDOW:
            assert twin[i] == []
            continue
        g = C._GEAR[np.frombuffer(b, dtype=np.uint8)]
        win = np.lib.stride_tricks.sliding_window_view(g, C.WINDOW)
        ref = ((win @ C._POW2[::-1]) % C._MOD).tolist()
        assert twin[i] == ref


def test_insertion_resilience(spark):
    """The CDC property: after a 1-byte insertion, chunk hashes
    re-synchronize — most chunks of the edited blob already exist in the
    original's chunk set (fixed-size chunking would share ~none)."""
    base = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
            "eiusmod tempor incididunt ut labore et dolore magna aliqua ") * 8
    edited = base[:100] + "Z" + base[100:]
    h0 = {h for _, _, h in C.chunk_blob(base.encode(), mask_bits=5)}
    ch1 = C.chunk_blob(edited.encode(), mask_bits=5)
    shared = sum(1 for _, _, h in ch1 if h in h0)
    assert shared >= len(ch1) - 3   # only chunks at the edit point differ
    assert shared < len(ch1)        # and at least one chunk DID change


def test_coverage_and_determinism():
    data = b"0123456789abcdef" * 20
    ch = C.chunk_blob(data, mask_bits=4)
    assert sum(ln for _, ln, _ in ch) == len(data)
    offs = [o for o, _, _ in ch]
    assert offs == sorted(offs) and offs[0] == 0
    for o, ln, h in ch:
        assert hashlib.md5(data[o:o + ln]).hexdigest() == h
    assert C.chunk_blob(data, mask_bits=4) == ch


def test_min_size_floor():
    data = ("the quick brown fox jumps over the lazy dog " * 10).encode()
    small = C.chunk_blob(data, mask_bits=3)           # many tiny chunks
    floored = C.chunk_blob(data, mask_bits=3, min_size=24)
    assert min(ln for _, ln, _ in floored[:-1] or floored) >= 24 \
        or len(floored) == 1
    assert len(floored) <= len(small)
    assert sum(ln for _, ln, _ in floored) == len(data)


def test_short_and_empty_blobs(spark):
    assert C.chunk_blob(b"", 5) == []
    ch = C.chunk_blob(b"below-window", 5)
    assert ch == [(0, 12, hashlib.md5(b"below-window").hexdigest())]
    df = spark.createDataFrame([(1, b""), (2, b"below-window")],
                               "doc_id long, blob binary")
    out = C.chunk_blobs(df, mask_bits=5).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 2

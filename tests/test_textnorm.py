"""Unicode NFC + whitespace/control normalization (functions/textnorm.py)."""

import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from geoutils_spark.functions import textnorm as TN


def _norm(spark, rows):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)],
                               ["id", "t"])
    out = (df.select("id", TN.normalize_col(F.col("t")).alias("n"))
           .toPandas().set_index("id")["n"])
    return [out[i] for i in range(len(rows))]


def test_nfc_composes_and_cleanup_strips(spark):
    got = _norm(spark, [
        "café  x",      # decomposed acute + double space
        "a\x01b\tc",          # C0 control + tab
        None,
        "  edge  ",
        "caf\u00e9",       # already NFC -> unchanged
    ])
    assert got[0] == "caf\u00e9 x"
    assert got[1] == "ab c"
    assert got[2] is None
    assert got[3] == "edge"
    assert got[4] == "caf\u00e9"


def test_normalize_idempotent(spark):
    rows = ["café", "a\x01  b", "Å angstrom",  # NFC of U+212B is U+00C5
            "plain"]
    once = _norm(spark, rows)
    twice = _norm(spark, once)
    assert once == twice


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_nfc_series_matches_unicodedata(s):
    """The batch kernel is exactly unicodedata NFC (the scalar truth the
    DuckDB nfc_normalize oracle twin is verified against)."""
    import pandas as pd

    out = TN.nfc_series(pd.Series([s]))
    assert out[0] == unicodedata.normalize("NFC", s)

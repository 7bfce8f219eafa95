"""Geohash — the classic base32 public-grid cell scheme, completing the
engine's index-family coverage (Mercator-Morton cells, TRUE S2, H3-style
hexes, and now geohash for interop with the many systems that key on it:
Elasticsearch geo_grid, Redis GEO, OSM Notes, most geo-APIs).

Same discipline as functions/cells.py: pure bit math (the existing
nibble-spread/compact kernels), a CAST-DOUBLE SQL twin evaluating the
identical formula, and the prefix-nesting property (a P-char geohash's
parent is its (P-1)-char prefix) falling out of MSB-first bit order.

Subset: EVEN precisions 2..12 (equal lon/lat bit counts, so the bit
interleave is the standard Morton spread with lon on the high bit of
each pair). Odd precisions swap the axis roles per character — a second
spread path for little payoff; even covers the common 4/6/8/12 keys,
and an odd-precision prefix is still reachable as a substring."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from geoutils_spark.functions.cells import (
    _compact_col,
    _spread_col,
    _spread_sql,
)

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _check(precision: int) -> int:
    if precision % 2 or not 2 <= precision <= 12:
        raise ValueError(
            f"even precision in [2, 12] required, got {precision}")
    return 5 * precision // 2  # bits per axis


def _axis_col(deg: Column, offset: float, span: float, bits: int) -> Column:
    t = F.floor((deg + F.lit(offset)) / F.lit(span)
                * F.lit(float(1 << bits))).cast("long")
    return F.least(F.greatest(t, F.lit(0)), F.lit((1 << bits) - 1))


def geohash_value_col(lon: Column, lat: Column, precision: int) -> Column:
    """The 5P-bit interleaved integer (lon bit above lat bit per pair —
    geohash's MSB-first lon-first order)."""
    b = _check(precision)
    x = _axis_col(lon, 180.0, 360.0, b)
    y = _axis_col(lat, 90.0, 180.0, b)
    return F.shiftleft(_spread_col(x), 1).bitwiseOR(_spread_col(y))


def geohash_col(lon: Column, lat: Column, precision: int = 8) -> Column:
    """Base32 geohash string of (lon, lat) at an even ``precision``."""
    b = _check(precision)
    v = geohash_value_col(lon, lat, precision)
    alpha = F.array(*[F.lit(c) for c in ALPHABET])
    chars = [F.element_at(
        alpha,
        (F.shiftright(v, 5 * (precision - 1 - k))
         .bitwiseAND(F.lit(31)) + 1).cast("int"))
        for k in range(precision)]
    return F.concat(*chars)


def geohash_center_cols(gh: Column, precision: int) -> tuple[Column, Column]:
    """(lon, lat) of the cell center from a P-char geohash string."""
    b = _check(precision)
    alpha = F.lit(ALPHABET)
    v = F.lit(0).cast("long")
    for k in range(precision):
        code = (F.instr(alpha, F.substring(gh, k + 1, 1)) - 1).cast("long")
        v = F.shiftleft(v, 5).bitwiseOR(code)
    x = _compact_col(F.shiftright(v, 1))
    y = _compact_col(v)
    lon = (x.cast("double") + F.lit(0.5)) / F.lit(float(1 << b)) \
        * F.lit(360.0) - F.lit(180.0)
    lat = (y.cast("double") + F.lit(0.5)) / F.lit(float(1 << b)) \
        * F.lit(180.0) - F.lit(90.0)
    return lon, lat


# ---------------------------------------------------------------------------
# DuckDB twins (stage x/y/v in CTE columns — the spread macro references
# its argument ~2^5 times, so it must expand over a column, not a formula)
# ---------------------------------------------------------------------------

def axis_x_sql(lon: str, precision: int) -> str:
    b = _check(precision)
    t = (f"CAST(FLOOR((({lon}) + CAST(180.0 AS DOUBLE)) "
         f"/ CAST(360.0 AS DOUBLE) * CAST({float(1 << b)!r} AS DOUBLE)) "
         f"AS BIGINT)")
    return f"LEAST(GREATEST({t}, 0), {(1 << b) - 1})"


def axis_y_sql(lat: str, precision: int) -> str:
    b = _check(precision)
    t = (f"CAST(FLOOR((({lat}) + CAST(90.0 AS DOUBLE)) "
         f"/ CAST(180.0 AS DOUBLE) * CAST({float(1 << b)!r} AS DOUBLE)) "
         f"AS BIGINT)")
    return f"LEAST(GREATEST({t}, 0), {(1 << b) - 1})"


def value_sql(x_col: str, y_col: str) -> str:
    return f"(({_spread_sql(x_col)} << 1) | {_spread_sql(y_col)})"


def geohash_from_v_sql(v_col: str, precision: int) -> str:
    _check(precision)
    parts = [
        f"substr('{ALPHABET}', "
        f"CAST((({v_col} >> {5 * (precision - 1 - k)}) & 31) + 1 AS INT), 1)"
        for k in range(precision)]
    return "(" + " || ".join(parts) + ")"

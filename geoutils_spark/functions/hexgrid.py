"""Hexagonal grid index over the Web-Mercator plane — the hex half of
the north-star "H3/S2 cells" pair (the true-S2 half lives in
functions/s2cells.py; this module is an H3-style axial hex binning
re-derived from the public hex-grid algebra, Red Blob Games'
"Hexagonal Grids" formulation, NOT a port of the H3 library).

Layout: FLAT-TOP hexagons in axial (q, r) coordinates on the unit
Mercator square (functions/cells.py lon_to_unit / lat_to_unit — the
same projection the reference uses for tiles,
/root/reference/osm2assimp/convertlatlng.cpp:27-35). At resolution
``res`` the hex circumradius is ``2**-res`` plane units, so one step in
``res`` quarters the hex area (aperture 4 by scale — hexes do NOT nest,
like real H3; parent assignment goes through the child center, the
standard practice for non-nesting grids).

Every kernel is a pure Catalyst expression with a DuckDB SQL twin built
from the IDENTICAL operation sequence (same literals, same floor(x+.5)
rounding — no dialect round()), so oracle hashes match bit-for-bit away
from hex boundaries. No UDFs, no shuffles — row-local codegen math.

Point -> hex (pixel-to-hex with cube rounding):

    qf = (2/3 * X) / s          rf = (-1/3 * X + sqrt(3)/3 * Y) / s
    cube-round (qf, -qf-rf, rf) -> (q, r)

Packed id: ``(res << 56) | (zigzag(q) << 28) | zigzag(r)`` — a single
BIGINT sort/join/group key; res <= 24 keeps zigzag(q) < 2**26.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geoutils_spark.functions import cells as C

# decimal literals shared verbatim by both dialects (never call sqrt()
# at runtime — a last-ulp library difference would shift hex boundaries)
SQRT3 = "1.7320508075688772"
MAX_RES = 24


def _size(res: int) -> float:
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"hex res must be in [0, {MAX_RES}], got {res}")
    return 2.0 ** -res


# ---------------------------------------------------------------- Column side

def _round_half_up(c: Column) -> Column:
    return F.floor(c + F.lit(0.5))


def hex_qr_col(lon: Column, lat: Column, res: int) -> tuple[Column, Column]:
    """Axial (q, r) LONG columns for a point at ``res``."""
    s = _size(res)
    x = C.lon_to_unit_col(lon)
    y = C.lat_to_unit_col(lat)
    qf = (F.lit(2.0) / F.lit(3.0) * x) / F.lit(s)
    rf = (F.lit(-1.0) / F.lit(3.0) * x
          + F.lit(float(SQRT3)) / F.lit(3.0) * y) / F.lit(s)
    yf = -qf - rf
    rq, ry, rr = _round_half_up(qf), _round_half_up(yf), _round_half_up(rf)
    dq, dy, dr = F.abs(rq - qf), F.abs(ry - yf), F.abs(rr - rf)
    fix_q = (dq > dy) & (dq > dr)
    q = F.when(fix_q, -ry - rr).otherwise(rq).cast("long")
    r = (F.when(fix_q, rr)
         .otherwise(F.when(dy > dr, rr).otherwise(-rq - ry))
         .cast("long"))
    return q, r


def _zigzag_col(v: Column) -> Column:
    return F.when(v >= 0, v * 2).otherwise(v * -2 - 1)


def _unzigzag_col(z: Column) -> Column:
    return F.when(z % 2 == 0, z / F.lit(2)).otherwise(
        (z + 1) / F.lit(-2)).cast("long")


def hex_pack_col(q: Column, r: Column, res: int) -> Column:
    """(q, r, res) -> single BIGINT id."""
    return (F.lit(res).cast("long") * F.lit(1 << 56)
            + _zigzag_col(q) * F.lit(1 << 28)
            + _zigzag_col(r)).cast("long")


def hex_unpack_col(hex_id: Column) -> tuple[Column, Column, Column]:
    """hex_id -> (q, r, res) columns (integer shifts — double division
    would round away the low bits at the 2**56 scale)."""
    res = F.shiftright(hex_id, 56).cast("int")
    zq = F.shiftright(hex_id, 28).bitwiseAND(F.lit((1 << 28) - 1))
    zr = hex_id.bitwiseAND(F.lit((1 << 28) - 1))
    return _unzigzag_col(zq), _unzigzag_col(zr), res


def hex_col(lon: Column, lat: Column, res: int) -> Column:
    q, r = hex_qr_col(lon, lat, res)
    return hex_pack_col(q, r, res)


def hex_center_unit_col(q: Column, r: Column, res: int
                        ) -> tuple[Column, Column]:
    """Hex center in unit-plane (X, Y) — inverse of the axial transform."""
    s = _size(res)
    x = F.lit(3.0) / F.lit(2.0) * F.lit(s) * q
    y = (F.lit(float(SQRT3)) / F.lit(2.0) * q
         + F.lit(float(SQRT3)) * r) * F.lit(s)
    return x, y


def hex_center_col(q: Column, r: Column, res: int) -> tuple[Column, Column]:
    """Hex center as (lon, lat) degrees (inverse Mercator via the
    gudermannian 2*atan(exp(m)) - pi/2 form — exp/atan exist in both
    dialects; asinh does not)."""
    x, y = hex_center_unit_col(q, r, res)
    lon = x * F.lit(360.0) - F.lit(180.0)
    import numpy as np

    m = F.lit(float(np.pi)) * (F.lit(1.0) - F.lit(2.0) * y)
    lat = F.degrees(F.lit(2.0) * F.atan(F.exp(m))
                    - F.lit(float(np.pi)) / F.lit(2.0))
    return lon, lat


def hex_parent_col(q: Column, r: Column, res: int, parent_res: int
                   ) -> tuple[Column, Column]:
    """Coarser hex CONTAINING THE CHILD CENTER (hexes don't nest; this
    is the standard center-reassignment rollup, deterministic and
    consistent: every child maps to exactly one parent)."""
    if parent_res >= res:
        raise ValueError("parent_res must be coarser (smaller) than res")
    s = _size(res)
    ps = _size(parent_res)
    # child center in plane units, then pixel->hex at the parent scale
    x = F.lit(3.0) / F.lit(2.0) * F.lit(s) * q
    y = (F.lit(float(SQRT3)) / F.lit(2.0) * q
         + F.lit(float(SQRT3)) * r) * F.lit(s)
    qf = (F.lit(2.0) / F.lit(3.0) * x) / F.lit(ps)
    rf = (F.lit(-1.0) / F.lit(3.0) * x
          + F.lit(float(SQRT3)) / F.lit(3.0) * y) / F.lit(ps)
    yf = -qf - rf
    rq, ry, rr = _round_half_up(qf), _round_half_up(yf), _round_half_up(rf)
    dq, dy, dr = F.abs(rq - qf), F.abs(ry - yf), F.abs(rr - rf)
    fix_q = (dq > dy) & (dq > dr)
    pq = F.when(fix_q, -ry - rr).otherwise(rq).cast("long")
    pr = (F.when(fix_q, rr)
          .otherwise(F.when(dy > dr, rr).otherwise(-rq - ry))
          .cast("long"))
    return pq, pr


def hex_distance_col(q1: Column, r1: Column, q2: Column, r2: Column
                     ) -> Column:
    """Axial hex-grid (graph) distance between two hexes."""
    dq, dr = q1 - q2, r1 - r2
    return ((F.abs(dq) + F.abs(dr) + F.abs(dq + dr)) / F.lit(2)
            ).cast("long")


# axial neighbor offsets, E counterclockwise (flat-top)
NEIGHBOR_OFFSETS = ((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))


def hex_neighbors_col(q: Column, r: Column, res: int) -> Column:
    """Array of the 6 adjacent packed hex ids (ring-1, fixed order)."""
    return F.array(*[
        hex_pack_col(q + F.lit(dq), r + F.lit(dr), res)
        for dq, dr in NEIGHBOR_OFFSETS])


def with_hex_cell(df: DataFrame, res: int, lon: str = "lon",
                  lat: str = "lat", prefix: str = "hex") -> DataFrame:
    """Adds ``{prefix}_q``, ``{prefix}_r``, ``{prefix}_id`` columns."""
    q, r = hex_qr_col(F.col(lon), F.col(lat), res)
    df = df.withColumn(f"{prefix}_q", q).withColumn(f"{prefix}_r", r)
    return df.withColumn(
        f"{prefix}_id",
        hex_pack_col(F.col(f"{prefix}_q"), F.col(f"{prefix}_r"), res))


# ------------------------------------------------------------------ SQL twins

def _d(x) -> str:
    """DOUBLE literal (bare decimals parse as DECIMAL in DuckDB — the
    project-wide parity rule; decimal arithmetic drifts from IEEE and
    hex-lattice points sit EXACTLY on parent boundaries, so a last-ulp
    difference flips the cube-round)."""
    return f"CAST({x!r} AS DOUBLE)"


def _round_half_up_sql(e: str) -> str:
    return f"FLOOR(({e}) + {_d(0.5)})"


def _qr_sql(x: str, y: str, size: float) -> tuple[str, str]:
    qf = f"(({_d(2.0)} / {_d(3.0)} * ({x})) / {_d(size)})"
    rf = (f"(({_d(-1.0)} / {_d(3.0)} * ({x}) "
          f"+ {_d(float(SQRT3))} / {_d(3.0)} * ({y})) / {_d(size)})")
    yf = f"(-({qf}) - ({rf}))"
    rq, ry, rr = (_round_half_up_sql(qf), _round_half_up_sql(yf),
                  _round_half_up_sql(rf))
    dq = f"ABS(({rq}) - ({qf}))"
    dy = f"ABS(({ry}) - ({yf}))"
    dr = f"ABS(({rr}) - ({rf}))"
    fix_q = f"(({dq}) > ({dy}) AND ({dq}) > ({dr}))"
    q = (f"CAST(CASE WHEN {fix_q} THEN -({ry}) - ({rr}) "
         f"ELSE ({rq}) END AS BIGINT)")
    r = (f"CAST(CASE WHEN {fix_q} THEN ({rr}) "
         f"WHEN ({dy}) > ({dr}) THEN ({rr}) "
         f"ELSE -({rq}) - ({ry}) END AS BIGINT)")
    return q, r


def hex_q_sql(lon: str, lat: str, res: int) -> str:
    q, _ = _qr_sql(C.lon_to_unit_sql(lon), C.lat_to_unit_sql(lat),
                   _size(res))
    return q


def hex_r_sql(lon: str, lat: str, res: int) -> str:
    _, r = _qr_sql(C.lon_to_unit_sql(lon), C.lat_to_unit_sql(lat),
                   _size(res))
    return r


def _zigzag_sql(v: str) -> str:
    return f"(CASE WHEN ({v}) >= 0 THEN ({v}) * 2 ELSE ({v}) * -2 - 1 END)"


def hex_pack_sql(q: str, r: str, res: int) -> str:
    return (f"CAST({res} * {1 << 56} + {_zigzag_sql(q)} * {1 << 28} "
            f"+ {_zigzag_sql(r)} AS BIGINT)")


def hex_id_sql(lon: str, lat: str, res: int) -> str:
    q, r = _qr_sql(C.lon_to_unit_sql(lon), C.lat_to_unit_sql(lat),
                   _size(res))
    return hex_pack_sql(q, r, res)


def hex_parent_qr_sql(q: str, r: str, res: int, parent_res: int
                      ) -> tuple[str, str]:
    if parent_res >= res:
        raise ValueError("parent_res must be coarser (smaller) than res")
    s, ps = _size(res), _size(parent_res)
    x = f"({_d(3.0)} / {_d(2.0)} * {_d(s)} * ({q}))"
    y = (f"(({_d(float(SQRT3))} / {_d(2.0)} * ({q}) "
         f"+ {_d(float(SQRT3))} * ({r})) * {_d(s)})")
    return _qr_sql(x, y, ps)


def hex_distance_sql(q1: str, r1: str, q2: str, r2: str) -> str:
    dq, dr = f"(({q1}) - ({q2}))", f"(({r1}) - ({r2}))"
    return (f"CAST((ABS({dq}) + ABS({dr}) + ABS(({dq}) + ({dr}))) / 2 "
            f"AS BIGINT)")

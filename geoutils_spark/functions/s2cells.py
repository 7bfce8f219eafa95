"""TRUE S2 cell ids (face + Hilbert curve, 64-bit) — real-S2 parity backend.

Re-derived from scratch from the published S2 geometry algorithm (the
s2geometry library's documented cell-id scheme: cube-face projection,
quadratic s/t transform, Hilbert-curve position via 4-level lookup tables).
This reproduces the EXACT uint64 ids the reference emits through the s2
library: golden filenames ``s2_48761cb000000000`` / ``s2_48761cd000000000``
pinned at /root/reference/test.py:80-83 for the level-12 cover of its London
test grid, cell math used at
/root/reference/osms2split/src/s2splitter.cpp:96-105 (point -> leaf ->
parent(level)) and /root/reference/s2util/s2util.h:38-92 (center / corners /
parent / hex parse).

Unlike the single-face Web-Mercator index in functions/cells.py (which keeps
the same prefix/parent algebra but not the real ids), this backend covers
the full sphere — no |lat| > 85 domain hole — and matches external S2
tooling bit-for-bit. Ids are reinterpreted as SIGNED int64 for Spark
LongType (hex of the two's-complement value equals the uint64 hex).

Three interchangeable backends, parity-tested against each other:

* ``with_s2_cell``   — pure Catalyst column steps (whole-stage codegen; the
  8 Hilbert steps use a constant-folded 1024-entry array literal) — NO UDF
  on the hot path at all;
* ``s2_cell_np``     — vectorized numpy (Arrow-batched pandas UDF wrapper);
* ``s2_sql_parts``   — DuckDB SQL twin for the correctness oracle.

Same trailing-bit algebra as S2 proper: lowest set bit encodes level,
parent = prefix truncation, descendants of c = [c - lsb + 1, c + lsb - 1].
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

S2_MAX_LEVEL = 30
_K_SWAP, _K_INVERT = 1, 2
_POS_TO_IJ = [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]]
_POS_TO_ORIENT = [_K_SWAP, 0, 0, _K_SWAP | _K_INVERT]

# 4-level (16x16 sub-grid) Hilbert lookup tables, built once at import:
# LOOKUP_POS[(i4 << 6) | (j4 << 2) | orientation] = (pos8 << 2) | orientation'
LOOKUP_POS = [0] * 1024
LOOKUP_IJ = [0] * 1024


def _init_lookup(level: int, i: int, j: int, orig: int, orient: int, pos: int):
    if level == 4:
        ij = (i << 4) + j
        LOOKUP_POS[(ij << 2) + orig] = (pos << 2) + orient
        LOOKUP_IJ[(pos << 2) + orig] = (ij << 2) + orient
        return
    r = _POS_TO_IJ[orient]
    for idx in range(4):
        _init_lookup(level + 1, (i << 1) + (r[idx] >> 1), (j << 1) + (r[idx] & 1),
                     orig, orient ^ _POS_TO_ORIENT[idx], (pos << 2) + idx)


for _m in (0, _K_SWAP, _K_INVERT, _K_SWAP | _K_INVERT):
    _init_lookup(0, 0, 0, _m, _m, 0)

_LUT_POS_NP = np.array(LOOKUP_POS, dtype=np.int64)
_LUT_IJ_NP = np.array(LOOKUP_IJ, dtype=np.int64)


# ---------------------------------------------------------------------------
# numpy backend
# ---------------------------------------------------------------------------

def lonlat_to_xyz_np(lon: np.ndarray, lat: np.ndarray):
    phi, lam = np.radians(lat), np.radians(lon)
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def xyz_to_face_uv_np(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face)
    # over="ignore": np.select evaluates ALL branches, so non-selected-face
    # divisions may overflow (tiny denominators) before being discarded
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y], default=-y / z)
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y], default=-x / z)
    return face, u, v


def uv_to_st_np(u):
    # quadratic projection (S2's default S2_QUADRATIC_PROJECTION)
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0.0,
                        0.5 * np.sqrt(1.0 + 3.0 * u),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def st_to_uv_np(s):
    return np.where(s >= 0.5,
                    (1.0 / 3.0) * (4.0 * s * s - 1.0),
                    (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def st_to_ij_np(s):
    return np.clip(np.floor(s * (1 << 30)), 0, (1 << 30) - 1).astype(np.int64)


def s2_from_face_ij_np(face, i, j) -> np.ndarray:
    """(face, leaf i, leaf j) -> leaf cell id (signed-int64 reinterpret)."""
    n = face.astype(np.int64) << 60
    bits = (face & _K_SWAP).astype(np.int64)
    pos = np.zeros_like(n)
    for k in range(7, -1, -1):
        idx = bits + (((i >> (k * 4)) & 15) << 6) + (((j >> (k * 4)) & 15) << 2)
        bits = _LUT_POS_NP[idx]
        pos = pos | ((bits >> 2) << (k * 8))
        bits = bits & 3
    return ((n | pos) << 1) | 1


def s2_parent_np(cell: np.ndarray, level: int) -> np.ndarray:
    lsb = np.int64(1) << np.int64(2 * (S2_MAX_LEVEL - level))
    cell = np.asarray(cell, np.int64)
    return (cell & -lsb) | lsb


def s2_cell_np(lon, lat, level: int) -> np.ndarray:
    """Point -> level-``level`` S2 cell id (the reference's per-node
    assignment, s2splitter.cpp:96-105)."""
    x, y, z = lonlat_to_xyz_np(np.asarray(lon, float), np.asarray(lat, float))
    face, u, v = xyz_to_face_uv_np(x, y, z)
    i = st_to_ij_np(uv_to_st_np(u))
    j = st_to_ij_np(uv_to_st_np(v))
    return s2_parent_np(s2_from_face_ij_np(face, i, j), level)


def s2_to_face_ij_np(cell: np.ndarray):
    """leaf-position decode: (face, i, j) of the id's leaf coordinates."""
    cell = np.asarray(cell, np.int64)
    face = (cell >> 61) & 7
    bits = (face & _K_SWAP).astype(np.int64)
    i = np.zeros_like(cell)
    j = np.zeros_like(cell)
    for k in range(7, -1, -1):
        nbits = 2 if k == 7 else 4
        bits = bits + (((cell >> (k * 8 + 1)) & ((1 << (2 * nbits)) - 1)) << 2)
        bits = _LUT_IJ_NP[bits]
        i = i | ((bits >> 6) << (k * 4))
        j = j | (((bits >> 2) & 15) << (k * 4))
        bits = bits & 3
    return face, i, j


def s2_center_np(cell: np.ndarray):
    """Cell -> center (lon, lat) degrees — reference s2util 'center'
    (s2util.h:38-47)."""
    cell = np.asarray(cell, np.int64)
    face, i, j = s2_to_face_ij_np(cell)
    is_leaf = (cell & 1).astype(bool)
    delta = np.where(is_leaf, 1, np.where(((i ^ (cell >> 2)) & 1) != 0, 2, 0))
    si = 2 * i + delta
    ti = 2 * j + delta
    u = st_to_uv_np(si / float(1 << 31))
    v = st_to_uv_np(ti / float(1 << 31))
    x, y, z = _face_uv_to_xyz_np(face, u, v)
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    lon = np.degrees(np.arctan2(y, x))
    return lon, lat


def _face_uv_to_xyz_np(face, u, v):
    x = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [np.ones_like(u), -u, -u, -np.ones_like(u), v], default=v)
    y = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [u, np.ones_like(u), -v, -v, -np.ones_like(u)], default=u)
    z = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [v, v, np.ones_like(u), -u, -u], default=-np.ones_like(u))
    return x, y, z


def s2_corners_np(cell: np.ndarray):
    """Cell -> 4 corner (lon, lat) arrays, CCW in (u,v):
    (lo,lo),(hi,lo),(hi,hi),(lo,hi) — reference s2util 'corners'
    (s2util.h:49-66, S2Cell::GetVertex order)."""
    cell = np.asarray(cell, np.int64)
    face, i, j = s2_to_face_ij_np(cell)
    level = s2_level_np(cell)
    size = np.int64(1) << (2 * (S2_MAX_LEVEL - level) // 2)
    i_lo = i & ~(size - 1)
    j_lo = j & ~(size - 1)
    out = []
    for di, dj in ((0, 0), (1, 0), (1, 1), (0, 1)):
        si = (i_lo + di * size) / float(1 << 30)
        ti = (j_lo + dj * size) / float(1 << 30)
        u = st_to_uv_np(si)
        v = st_to_uv_np(ti)
        x, y, z = _face_uv_to_xyz_np(face, u, v)
        lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
        lon = np.degrees(np.arctan2(y, x))
        out.append((lon, lat))
    return out


def s2_level_np(cell: np.ndarray) -> np.ndarray:
    cell = np.asarray(cell, np.int64)
    lsb = cell & -cell
    tz = np.zeros_like(cell)
    c = lsb.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = (c >> s) != 0
        tz = tz + np.where(big, s, 0)
        c = np.where(big, c >> s, c)
    return (S2_MAX_LEVEL - tz // 2).astype(np.int64)


def s2_to_hex_np(cell: np.ndarray) -> list[str]:
    return [format(np.uint64(c), "016x") for c in np.asarray(cell, np.int64)]


def make_s2_cell_udf(level: int):
    """Arrow-batched pandas-UDF wrapper of the numpy encoder."""

    @F.pandas_udf(T.LongType())
    def s2_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(s2_cell_np(lon.to_numpy(), lat.to_numpy(), level))

    return s2_udf


# ---------------------------------------------------------------------------
# Catalyst column backend (stepwise — the no-UDF hot path)
# ---------------------------------------------------------------------------

def _lut_col() -> Column:
    # all-literal CreateArray: constant-folded by Catalyst into one Literal
    return F.array(*[F.lit(int(x)) for x in LOOKUP_POS])


def with_s2_cell(df: DataFrame, lon: str, lat: str, level: int,
                 out: str = "s2_cell") -> DataFrame:
    """Point -> TRUE S2 cell id at ``level`` as pure Catalyst steps.

    Stepwise withColumn materialization bounds every projection; the Hilbert
    loop is 8 constant-array lookups. Bit ops (shiftleft) wrap like uint64,
    so face-4/5 leaf ids reinterpret negative exactly as the numpy backend.
    """
    phi, lam = F.radians(F.col(lat)), F.radians(F.col(lon))
    df = df.withColumn("__s2x", F.cos(phi) * F.cos(lam))
    df = df.withColumn("__s2y", F.cos(phi) * F.sin(lam))
    df = df.withColumn("__s2z", F.sin(phi))
    x, y, z = F.col("__s2x"), F.col("__s2y"), F.col("__s2z")
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    face0 = (F.when(ax > ay, F.when(ax > az, F.lit(0)).otherwise(F.lit(2)))
             .otherwise(F.when(ay > az, F.lit(1)).otherwise(F.lit(2))))
    df = df.withColumn("__f0", face0)
    comp = (F.when(F.col("__f0") == 0, x)
            .when(F.col("__f0") == 1, y).otherwise(z))
    df = df.withColumn(
        "__face",
        F.when(comp < 0, F.col("__f0") + F.lit(3)).otherwise(F.col("__f0")))
    fc = F.col("__face")
    df = df.withColumn(
        "__u",
        F.when(fc == 0, y / x).when(fc == 1, -x / y).when(fc == 2, -x / z)
        .when(fc == 3, z / x).when(fc == 4, z / y).otherwise(-y / z))
    df = df.withColumn(
        "__v",
        F.when(fc == 0, z / x).when(fc == 1, z / y).when(fc == 2, -y / z)
        .when(fc == 3, y / x).when(fc == 4, -x / y).otherwise(-x / z))

    def st(u: Column) -> Column:
        return (F.when(u >= 0.0, F.lit(0.5) * F.sqrt(F.lit(1.0) + F.lit(3.0) * u))
                .otherwise(F.lit(1.0) - F.lit(0.5) * F.sqrt(F.lit(1.0) - F.lit(3.0) * u)))

    def ij(s: Column) -> Column:
        t = F.floor(s * F.lit(float(1 << 30))).cast("long")
        return F.least(F.greatest(t, F.lit(0)), F.lit((1 << 30) - 1))

    df = df.withColumn("__i", ij(st(F.col("__u"))))
    df = df.withColumn("__j", ij(st(F.col("__v"))))
    df = df.withColumn("__bits", fc.bitwiseAND(F.lit(_K_SWAP)).cast("long"))
    df = df.withColumn("__pos", F.lit(0).cast("long"))
    lut = _lut_col()
    for k in range(7, -1, -1):
        idx = (F.col("__bits")
               + F.shiftleft(F.shiftright(F.col("__i"), k * 4).bitwiseAND(F.lit(15)), 6)
               + F.shiftleft(F.shiftright(F.col("__j"), k * 4).bitwiseAND(F.lit(15)), 2))
        df = df.withColumn("__lv", F.element_at(lut, (idx + 1).cast("int")).cast("long"))
        df = df.withColumn(
            "__pos",
            F.col("__pos").bitwiseOR(
                F.shiftleft(F.shiftright(F.col("__lv"), 2), k * 8)))
        df = df.withColumn("__bits", F.col("__lv").bitwiseAND(F.lit(3)))
    n = F.shiftleft(fc.cast("long"), 60).bitwiseOR(F.col("__pos"))
    leaf = F.shiftleft(n, 1).bitwiseOR(F.lit(1))
    lsb = 1 << (2 * (S2_MAX_LEVEL - level))
    df = df.withColumn(out, leaf.bitwiseAND(F.lit(-lsb)).bitwiseOR(F.lit(lsb)))
    return df.drop("__s2x", "__s2y", "__s2z", "__f0", "__face", "__u", "__v",
                   "__i", "__j", "__bits", "__pos", "__lv")


def s2_parent_col(cell: Column, level: int) -> Column:
    """Parent at coarser level (s2util.h:68-77 semantics)."""
    lsb = 1 << (2 * (S2_MAX_LEVEL - level))
    return cell.bitwiseAND(F.lit(-lsb)).bitwiseOR(F.lit(lsb))


def s2_hex_col(cell: Column) -> Column:
    """16-char lowercase hex of the uint64 id — the reference's
    ``s2_<hex16>`` filename token (s2splitter.cpp:60-72). hex() of the
    signed long equals the uint64 hex (two's complement)."""
    return F.lpad(F.lower(F.hex(cell)), 16, "0")


# ---------------------------------------------------------------------------
# SQL-text backend (DuckDB oracle twin)
# ---------------------------------------------------------------------------

def s2_sql_parts(lon: str, lat: str, level: int, out: str = "s2_cell"):
    """(lut_cte, [(col, expr), ...]) — chain as CTE stages; the final stage
    emits ``out``. Identical arithmetic to the column backend; the uint64
    wrap of ``leaf = n*2+1`` is emulated in HUGEINT then reinterpreted to
    BIGINT two's complement."""
    lut = "s2lut AS (SELECT [" + ", ".join(str(v) for v in LOOKUP_POS) + "] AS t)"
    stages: list[tuple[str, str]] = []
    stages.append(("__s2x", f"COS(RADIANS({lat})) * COS(RADIANS({lon}))"))
    stages.append(("__s2y", f"COS(RADIANS({lat})) * SIN(RADIANS({lon}))"))
    stages.append(("__s2z", f"SIN(RADIANS({lat}))"))
    stages.append(("__f0",
                   "CASE WHEN ABS(__s2x) > ABS(__s2y) THEN "
                   "(CASE WHEN ABS(__s2x) > ABS(__s2z) THEN 0 ELSE 2 END) "
                   "ELSE (CASE WHEN ABS(__s2y) > ABS(__s2z) THEN 1 ELSE 2 END) END"))
    stages.append(("__face",
                   "CASE WHEN (CASE WHEN __f0 = 0 THEN __s2x WHEN __f0 = 1 "
                   "THEN __s2y ELSE __s2z END) < 0 THEN __f0 + 3 ELSE __f0 END"))
    stages.append(("__u",
                   "CASE WHEN __face = 0 THEN __s2y / __s2x "
                   "WHEN __face = 1 THEN -__s2x / __s2y "
                   "WHEN __face = 2 THEN -__s2x / __s2z "
                   "WHEN __face = 3 THEN __s2z / __s2x "
                   "WHEN __face = 4 THEN __s2z / __s2y "
                   "ELSE -__s2y / __s2z END"))
    stages.append(("__v",
                   "CASE WHEN __face = 0 THEN __s2z / __s2x "
                   "WHEN __face = 1 THEN __s2z / __s2y "
                   "WHEN __face = 2 THEN -__s2y / __s2z "
                   "WHEN __face = 3 THEN __s2y / __s2x "
                   "WHEN __face = 4 THEN -__s2x / __s2y "
                   "ELSE -__s2x / __s2z END"))

    def st(u: str) -> str:
        return (f"CASE WHEN {u} >= 0.0 THEN 0.5 * SQRT(1.0 + 3.0 * {u}) "
                f"ELSE 1.0 - 0.5 * SQRT(1.0 - 3.0 * {u}) END")

    def ij(s: str) -> str:
        return (f"LEAST(GREATEST(CAST(FLOOR(({s}) * {float(1 << 30)!r}) "
                f"AS BIGINT), 0), {(1 << 30) - 1})")

    stages.append(("__i", ij(st("__u"))))
    stages.append(("__j", ij(st("__v"))))
    stages.append(("__bits0", "CAST(__face & 1 AS BIGINT)"))
    prev_bits, prev_pos = "__bits0", None
    for k in range(7, -1, -1):
        idx = (f"({prev_bits} + (((__i >> {k * 4}) & 15) << 6) "
               f"+ (((__j >> {k * 4}) & 15) << 2))")
        lv = f"__lv{k}"
        stages.append((lv, f"CAST(t[CAST({idx} AS INTEGER) + 1] AS BIGINT)"))
        pos_term = f"(({lv} >> 2) << {k * 8})"
        new_pos = f"__posa{k}"
        stages.append((new_pos,
                       pos_term if prev_pos is None
                       else f"({prev_pos} | {pos_term})"))
        new_bits = f"__bitsa{k}"
        stages.append((new_bits, f"({lv} & 3)"))
        prev_bits, prev_pos = new_bits, new_pos
    lsb = 1 << (2 * (S2_MAX_LEVEL - level))
    # leaf as HUGEINT (exact), wrapped to signed BIGINT, then parent(level)
    stages.append(("__leafh",
                   f"(CAST(__face AS HUGEINT) * {1 << 61} "
                   f"+ CAST({prev_pos} AS HUGEINT) * 2 + 1)"))
    stages.append(("__leaf",
                   f"CAST(CASE WHEN __leafh >= {1 << 63} THEN __leafh - {1 << 64} "
                   f"ELSE __leafh END AS BIGINT)"))
    stages.append((out, f"((__leaf & {-lsb}) | {lsb})"))
    return lut, stages


def s2_sql_query(src_select: str, lon: str, lat: str, level: int,
                 out_cols: str, out: str = "s2_cell") -> str:
    """Convenience: full WITH-chain over ``src_select`` (a SELECT producing
    the lon/lat columns), emitting ``out_cols`` from the final stage."""
    lut, stages = s2_sql_parts(lon, lat, level, out)
    ctes = [lut, f"q0 AS ({src_select})"]
    prev = "q0"
    for k, (name, expr) in enumerate(stages):
        nxt = f"q{k + 1}"
        ctes.append(f"{nxt} AS (SELECT *, {expr} AS {name} FROM {prev}"
                    + (", s2lut" if k == 0 else "") + ")")
        prev = nxt
    return "WITH " + ",\n    ".join(ctes) + f"\n    SELECT {out_cols} FROM {prev}"

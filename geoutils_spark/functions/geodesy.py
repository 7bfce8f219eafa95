"""Coordinate math: haversine, bearing, Web-Mercator, LLA<->ECEF<->NED.

Re-derivations of the reference's scalar/vector geodesy
(/root/reference/osm2assimp/eigenconversion.cpp:29-160 and
/root/reference/osm2assimp/convertlatlng.cpp:12-45). Hot-path pieces
(haversine, bearing, mercator) are pure Catalyst column expressions; the
ECEF/NED family is Arrow-batched numpy (the reference itself vectorizes these
with Eigen array math — eigenconversion.cpp:51-61 — so a numpy batch kernel is
the faithful Spark translation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoutils_spark.constants import EARTH_RADIUS_M, WGS84_A, WGS84_E2

# ---------------------------------------------------------------------------
# Column expressions (JVM, codegen)
# ---------------------------------------------------------------------------

def haversine_m_col(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle meters (reference F6, eigenconversion.cpp:146-160)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = rlat2 - rlat1
    dlon = F.radians(lon2) - F.radians(lon1)
    a = (
        F.pow(F.sin(dlat / 2), F.lit(2.0))
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / 2), F.lit(2.0))
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def haversine_m_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """Same formula as DuckDB-compatible SQL text (oracle twin)."""
    return (
        f"(2.0 * {EARTH_RADIUS_M} * ASIN(SQRT("
        f"POW(SIN((RADIANS({lat2}) - RADIANS({lat1})) / 2), 2)"
        f" + COS(RADIANS({lat1})) * COS(RADIANS({lat2}))"
        f" * POW(SIN((RADIANS({lon2}) - RADIANS({lon1})) / 2), 2))))"
    )


def bearing_deg_col(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Initial bearing in [0, 360) (reference F7, eigenconversion.cpp:133-144)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlon = F.radians(lon2) - F.radians(lon1)
    y = F.sin(dlon) * F.cos(rlat2)
    x = F.cos(rlat1) * F.sin(rlat2) - F.sin(rlat1) * F.cos(rlat2) * F.cos(dlon)
    return F.pmod(F.degrees(F.atan2(y, x)), F.lit(360.0))


def destination_col(lon: Column, lat: Column, bearing_deg: Column,
                    dist_m: Column) -> tuple[Column, Column]:
    """Spherical direct geodesic (the inverse of F6/F7's distance+bearing,
    reference eigenconversion.cpp:133-160): the point reached from
    (lon, lat) after travelling ``dist_m`` metres along the great circle
    with initial bearing ``bearing_deg``. Standard formulas (Sinnott /
    aviation formulary):

        phi2 = asin(sin phi1 cos d + cos phi1 sin d cos theta)
        lam2 = lam1 + atan2(sin theta sin d cos phi1,
                            cos d - sin phi1 sin phi2)

    with d = dist/R. Pure Catalyst trig (codegen, zero exchanges);
    ``destination_sql`` is the textual twin, subexpression-for-
    subexpression, so both engines produce identical IEEE bits.
    Returns (lon2, lat2) in degrees, lon2 normalized to [-180, 180)."""
    d = dist_m / F.lit(float(EARTH_RADIUS_M))
    th = F.radians(bearing_deg)
    phi1, lam1 = F.radians(lat), F.radians(lon)
    s2 = F.sin(phi1) * F.cos(d) + F.cos(phi1) * F.sin(d) * F.cos(th)
    lat2 = F.degrees(F.asin(s2))
    lon2 = F.degrees(
        lam1 + F.atan2(F.sin(th) * F.sin(d) * F.cos(phi1),
                       F.cos(d) - F.sin(phi1) * s2))
    lon2 = F.pmod(lon2 + F.lit(180.0), F.lit(360.0)) - F.lit(180.0)
    return lon2, lat2


def destination_sql(lon: str, lat: str, bearing_deg: str,
                    dist_m: str) -> tuple[str, str]:
    """DuckDB twin of destination_col — identical expression structure
    (sin phi2 inlined textually where the Column tree reuses the node)."""
    d = f"({dist_m} / CAST({float(EARTH_RADIUS_M)!r} AS DOUBLE))"
    th = f"RADIANS({bearing_deg})"
    phi1, lam1 = f"RADIANS({lat})", f"RADIANS({lon})"
    s2 = (f"(SIN({phi1}) * COS({d})"
          f" + COS({phi1}) * SIN({d}) * COS({th}))")
    lat2 = f"DEGREES(ASIN({s2}))"
    lon2 = (f"DEGREES({lam1} + ATAN2(SIN({th}) * SIN({d}) * COS({phi1}), "
            f"COS({d}) - SIN({phi1}) * {s2}))")
    lon2 = f"((((({lon2} + 180.0) % 360.0) + 360.0) % 360.0) - 180.0)"
    return lon2, lat2


def mercator_xy_col(lon: Column, lat: Column, ref_x: Column | None = None,
                    ref_y: Column | None = None) -> tuple[Column, Column]:
    """Web-Mercator meters, optionally refpoint-relative (reference F1,
    convertlatlng.cpp:12-35: ``lonlat_to_mercator(loc) - RefPoint``)."""
    x = F.lit(WGS84_A) * F.radians(lon)
    r = F.radians(lat)
    y = F.lit(WGS84_A) * F.log(F.tan(F.lit(float(np.pi) / 4.0) + r / 2))
    if ref_x is not None:
        x = x - ref_x
    if ref_y is not None:
        y = y - ref_y
    return x, y


# ---------------------------------------------------------------------------
# numpy kernels + pandas UDFs (ECEF / NED family — reference F2-F5)
# ---------------------------------------------------------------------------

def lla_to_ecef_np(lon: np.ndarray, lat: np.ndarray, alt: np.ndarray) -> np.ndarray:
    """WGS84 geodetic -> ECEF, whole-array (eigenconversion.cpp:51-61)."""
    lon_r, lat_r = np.radians(lon), np.radians(lat)
    sin_lat, cos_lat = np.sin(lat_r), np.cos(lat_r)
    n = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sin_lat * sin_lat)
    x = (n + alt) * cos_lat * np.cos(lon_r)
    y = (n + alt) * cos_lat * np.sin(lon_r)
    z = (n * (1.0 - WGS84_E2) + alt) * sin_lat
    return np.stack([x, y, z], axis=1)


def ecef_to_lla_np(xyz: np.ndarray) -> np.ndarray:
    """Bowring-style closed-form inverse (eigenconversion.cpp:70-100)."""
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    b = WGS84_A * (1.0 - 1.0 / 298.257223563)
    ep2 = (WGS84_A**2 - b**2) / b**2
    p = np.hypot(x, y)
    theta = np.arctan2(z * WGS84_A, p * b)
    lon = np.arctan2(y, x)
    lat = np.arctan2(
        z + ep2 * b * np.sin(theta) ** 3, p - WGS84_E2 * WGS84_A * np.cos(theta) ** 3
    )
    n = WGS84_A / np.sqrt(1.0 - WGS84_E2 * np.sin(lat) ** 2)
    alt = p / np.cos(lat) - n
    return np.stack([np.degrees(lon), np.degrees(lat), alt], axis=1)


def _ned_rotation(lon0: float, lat0: float) -> np.ndarray:
    """Rotation ECEF->NED about an origin (eigenconversion.cpp:19-27)."""
    lo, la = np.radians(lon0), np.radians(lat0)
    sl, cl = np.sin(lo), np.cos(lo)
    sp, cp = np.sin(la), np.cos(la)
    return np.array(
        [[-sp * cl, -sp * sl, cp], [-sl, cl, 0.0], [-cp * cl, -cp * sl, -sp]]
    )


def lla_to_ned_np(lon: np.ndarray, lat: np.ndarray, alt: np.ndarray,
                  origin: tuple[float, float, float]) -> np.ndarray:
    """LLA -> local NED cartesian about ``origin`` (eigenconversion.cpp:29-49,
    109-120); the s2util `-c` cartesian mode analog (/root/reference/s2util/main.cpp:13)."""
    lon0, lat0, alt0 = origin
    ecef = lla_to_ecef_np(lon, lat, alt)
    origin_ecef = lla_to_ecef_np(
        np.array([lon0]), np.array([lat0]), np.array([alt0])
    )[0]
    r = _ned_rotation(lon0, lat0)
    return (ecef - origin_ecef) @ r.T


def ned_to_lla_np(ned: np.ndarray, origin: tuple[float, float, float]) -> np.ndarray:
    """Inverse composite (eigenconversion.cpp:122-131)."""
    lon0, lat0, alt0 = origin
    origin_ecef = lla_to_ecef_np(
        np.array([lon0]), np.array([lat0]), np.array([alt0])
    )[0]
    r = _ned_rotation(lon0, lat0)
    ecef = ned @ r + origin_ecef
    return ecef_to_lla_np(ecef)


_NED_SCHEMA = T.StructType(
    [
        T.StructField("n", T.DoubleType()),
        T.StructField("e", T.DoubleType()),
        T.StructField("d", T.DoubleType()),
    ]
)


def make_lla_to_ned_udf(origin: tuple[float, float, float]):
    """Arrow-batched UDF: (lon, lat, alt) -> struct<n,e,d> about ``origin``."""

    @F.pandas_udf(_NED_SCHEMA)
    def lla_to_ned(lon: pd.Series, lat: pd.Series, alt: pd.Series) -> pd.DataFrame:
        ned = lla_to_ned_np(lon.to_numpy(), lat.to_numpy(), alt.to_numpy(), origin)
        return pd.DataFrame({"n": ned[:, 0], "e": ned[:, 1], "d": ned[:, 2]})

    return lla_to_ned


def make_lla_to_ecef_udf():
    """Arrow-batched UDF: (lon, lat) at alt=0 -> struct<x,y,z> ECEF meters."""

    schema = T.StructType([
        T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
    ])

    @F.pandas_udf(schema)
    def lla_to_ecef(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        xyz = lla_to_ecef_np(lon.to_numpy(), lat.to_numpy(),
                             np.zeros(len(lon)))
        return pd.DataFrame({"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2]})

    return lla_to_ecef


def spherical_area_col(xs: Column, ys: Column) -> Column:
    """Signed spherical polygon area (m^2) by the Chamberlain-Duquette
    line integral (JPL 2007; the formula turf.js/geographiclib-lite
    implementations use): R^2/2 * sum over edges of
    (lam2 - lam1) * (2 + sin(phi1) + sin(phi2)), radians. Exact for
    edges along parallels/meridians (the fixture grid), the standard
    small-edge spherical approximation elsewhere. The edge sum is an
    explicit LEFT FOLD (F.aggregate) so the oracle twin (list_reduce)
    adds in the identical IEEE order — the chain-sum discipline.
    ``xs``/``ys`` are open rings in degrees (first vertex NOT repeated);
    positive = counter-clockwise."""
    n = F.size(xs)
    terms = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: (F.radians(F.element_at(xs, F.pmod(i, n) + 1))
                   - F.radians(F.element_at(xs, i)))
        * (F.lit(2.0) + F.sin(F.radians(F.element_at(ys, i)))
           + F.sin(F.radians(F.element_at(ys, F.pmod(i, n) + 1)))))
    s = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)
    return s * F.lit(-float(EARTH_RADIUS_M) * float(EARTH_RADIUS_M) / 2.0)


def spherical_area_sql(xs: str, ys: str) -> str:
    r2h = -float(EARTH_RADIUS_M) * float(EARTH_RADIUS_M) / 2.0
    nxt = f"(i % len({xs})) + 1"
    term = (f"(RADIANS({xs}[{nxt}]) - RADIANS({xs}[i]))"
            f" * (CAST(2.0 AS DOUBLE) + SIN(RADIANS({ys}[i]))"
            f" + SIN(RADIANS({ys}[{nxt}])))")
    return (f"(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, len({xs}) + 1), i -> {term})), "
            f"(acc, t) -> acc + t) * CAST({r2h!r} AS DOUBLE))")

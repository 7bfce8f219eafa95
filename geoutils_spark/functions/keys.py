"""Deterministic key -> coordinate derivation (oracle-safe).

Synthetic geo columns are pure integer arithmetic on a row key so that Spark
and the DuckDB oracle evaluate the *identical* expression (FIXTURES.md §1/§5).
The extents default to the reference's London test box
(/root/reference/test.py:40, /root/reference/test.bats:18).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from geoutils_spark.constants import KEY_MIX, KEY_MOD, LONDON_EXTENTS


def key_lon_col(key: Column, extents: tuple = LONDON_EXTENTS) -> Column:
    lon0, _, lon1, _ = extents
    frac = F.pmod(key * F.lit(KEY_MIX), F.lit(KEY_MOD)).cast("double") / F.lit(float(KEY_MOD))
    return F.lit(lon0) + frac * F.lit(lon1 - lon0)


def key_lat_col(key: Column, extents: tuple = LONDON_EXTENTS) -> Column:
    _, lat0, _, lat1 = extents
    frac = (
        F.pmod(key * F.lit(KEY_MIX) + F.lit(7919), F.lit(KEY_MOD)).cast("double")
        / F.lit(float(KEY_MOD))
    )
    return F.lit(lat0) + frac * F.lit(lat1 - lat0)


def key_lon_sql(key: str, extents: tuple = LONDON_EXTENTS) -> str:
    lon0, _, lon1, _ = extents
    return (
        f"({lon0!r} + (CAST((({key}) * {KEY_MIX}) % {KEY_MOD} AS DOUBLE)"
        f" / {float(KEY_MOD)!r}) * {lon1 - lon0!r})"
    )


def key_lat_sql(key: str, extents: tuple = LONDON_EXTENTS) -> str:
    _, lat0, _, lat1 = extents
    return (
        f"({lat0!r} + (CAST((({key}) * {KEY_MIX} + 7919) % {KEY_MOD} AS DOUBLE)"
        f" / {float(KEY_MOD)!r}) * {lat1 - lat0!r})"
    )

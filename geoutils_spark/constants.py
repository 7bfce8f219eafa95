"""Shared constants.

The London test extents mirror the reference's e2e tests
(/root/reference/test.py:38-40, /root/reference/test.bats:18) so our golden
fixtures live in the same coordinate neighbourhood the reference pins.
"""

# Web-Mercator valid latitude bound: atan(sinh(pi)) in degrees.
MERC_LAT_MAX = 85.05112877980659

# Max cell level: 30 → base grid 2^30 x 2^30 (~4 cm at the equator),
# mirroring S2's 30-level hierarchy (/root/reference/s2util/s2util.h:68-77).
MAX_CELL_LEVEL = 30

# Earth constants (reference: /root/reference/osm2assimp/eigenconversion.cpp:146,
# WGS84 at :7-17).
EARTH_RADIUS_M = 6371000.0
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)

# London test extents (lon_min, lat_min, lon_max, lat_max), same box the
# reference's tests build their synthetic grid over (/root/reference/test.py:40).
LONDON_EXTENTS = (-0.104486, 51.514853, -0.065948, 51.531354)

# Default cell level for tile assignment goldens; the reference's s2 test level
# is 12 (/root/reference/test.py:78).
DEFAULT_CELL_LEVEL = 12

# Knuth multiplicative constant for deterministic key->coordinate derivation.
# Chosen so both Spark and DuckDB can evaluate the identical integer expression
# (no engine-specific hash functions on the oracle path).
KEY_MIX = 2654435761
KEY_MOD = 1000000

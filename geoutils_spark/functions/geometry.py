"""Ring/polygon column functions: signed area, winding order, perimeter,
centroid.

Re-derives the reference's winding/area machinery (G3: signed-area
accumulation + conditional reverse, /root/reference/osm2assimp/
geometry.cpp:256-315 and Clipper orientation, utils.cpp:156-158) as pure
Catalyst column expressions over ``array<struct<lon,lat>>`` rings — shoelace
instead of edge-angle accumulation (same sign semantics), fully inside
whole-stage codegen. Each has a DuckDB SQL twin for the oracle.

Ring convention: closed (first point repeated last), as produced by
``sources/fixtures.py`` and the reference's closed ways
(/root/reference/osm2assimp/osmfeature.cpp:105-108).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def signed_area_col(ring: Column) -> Column:
    """Shoelace signed area (degree² units): positive = counter-clockwise."""
    n = F.size(ring)
    a = F.slice(ring, 1, n - 1)
    b = F.slice(ring, 2, n - 1)
    cross = F.zip_with(a, b, lambda p, q: p["lon"] * q["lat"] - q["lon"] * p["lat"])
    return F.aggregate(cross, F.lit(0.0), lambda acc, x: acc + x) / F.lit(2.0)


def signed_area_sql(ring_x: str, ring_y: str) -> str:
    """SQL twin over parallel x/y lists (DuckDB lacks struct lambdas in older
    list fns; parallel arrays keep it simple)."""
    return (
        f"(list_sum(list_transform(range(1, len({ring_x})), "
        f"i -> ({ring_x})[i] * ({ring_y})[i+1] - ({ring_x})[i+1] * ({ring_y})[i])) / 2.0)"
    )


def is_ccw_col(ring: Column) -> Column:
    """Winding order: true iff counter-clockwise (positive signed area) —
    reference's orientation test (geometry.cpp:256-315)."""
    return signed_area_col(ring) > 0


def oriented_ring_col(ring: Column, ccw: bool = True) -> Column:
    """Normalize winding: reverse the ring when orientation mismatches —
    the reference's conditional reverse (geometry.cpp:310-314)."""
    want = is_ccw_col(ring) if ccw else ~is_ccw_col(ring)
    return F.when(want, ring).otherwise(F.reverse(ring))


def perimeter_deg_col(ring: Column) -> Column:
    """Euclidean perimeter in degree units (fixture-scale diagnostics)."""
    n = F.size(ring)
    a = F.slice(ring, 1, n - 1)
    b = F.slice(ring, 2, n - 1)
    seg = F.zip_with(
        a, b,
        lambda p, q: F.sqrt(
            (q["lon"] - p["lon"]) * (q["lon"] - p["lon"])
            + (q["lat"] - p["lat"]) * (q["lat"] - p["lat"])
        ),
    )
    return F.aggregate(seg, F.lit(0.0), lambda acc, x: acc + x)


def perimeter_deg_sql(ring_x: str, ring_y: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({ring_x})), "
        f"i -> SQRT((({ring_x})[i+1] - ({ring_x})[i]) * (({ring_x})[i+1] - ({ring_x})[i])"
        f" + (({ring_y})[i+1] - ({ring_y})[i]) * (({ring_y})[i+1] - ({ring_y})[i]))))"
    )


def ring_centroid_col(ring: Column) -> tuple[Column, Column]:
    """Vertex mean of the open ring (drop the closing duplicate) — the
    reference's mesh centroid (assimpwriter.cpp:259-280)."""
    n = F.size(ring)
    open_ring = F.slice(ring, 1, n - 1)
    cnt = (n - 1).cast("double")
    sx = F.aggregate(open_ring, F.lit(0.0), lambda acc, p: acc + p["lon"])
    sy = F.aggregate(open_ring, F.lit(0.0), lambda acc, p: acc + p["lat"])
    return sx / cnt, sy / cnt

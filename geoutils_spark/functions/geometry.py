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


def _dedup_pass_col(ring: Column, tol: float) -> Column:
    """Pass 1 of ring cleaning: drop vertices within ``tol`` of the
    previously-kept vertex (fold with array accumulator; first element
    always kept), including the closing-duplicate wraparound."""
    n = F.size(ring)
    open_ring = F.slice(ring, 1, F.greatest(n - 1, F.lit(0)))
    empty = F.array().cast("array<struct<lon:double,lat:double>>")
    t2 = F.lit(float(tol) * float(tol))

    def dist2(p: Column, q: Column) -> Column:
        dx = p["lon"] - q["lon"]
        dy = p["lat"] - q["lat"]
        return dx * dx + dy * dy

    dedup = F.aggregate(
        open_ring,
        empty,
        lambda acc, p: F.when(F.size(acc) == 0, F.array(p)).otherwise(
            F.when(dist2(F.element_at(acc, -1), p) > t2, F.concat(acc, F.array(p)))
            .otherwise(acc)),
    )
    return F.when(
        (F.size(dedup) >= 2)
        & (dist2(F.element_at(dedup, 1), F.element_at(dedup, -1)) <= t2),
        F.slice(dedup, 1, F.size(dedup) - 1),
    ).otherwise(dedup)


def _collinear_pass_col(dedup: Column, tol: float) -> Column:
    """Pass 2: drop near-collinear vertices (perpendicular deviation from
    the prev->next chord <= tol, cyclic neighbors); re-close the ring.
    ``dedup`` should be a plain column attribute (materialize pass 1 first —
    see with_clean_ring) so element_at reads, not recomputes, the fold."""
    t2 = F.lit(float(tol) * float(tol))
    m = F.size(dedup)

    def keep(p: Column, i: Column) -> Column:
        prev = F.element_at(dedup, ((i - 1 + m) % m + 1).cast("int"))
        nxt = F.element_at(dedup, ((i + 1) % m + 1).cast("int"))
        ex = nxt["lon"] - prev["lon"]
        ey = nxt["lat"] - prev["lat"]
        cross = (p["lon"] - prev["lon"]) * ey - (p["lat"] - prev["lat"]) * ex
        chord2 = ex * ex + ey * ey
        # |cross|/sqrt(chord2) <= tol  <=>  cross^2 <= tol^2 * chord2
        return F.when(chord2 == 0.0, F.lit(False)).otherwise(
            cross * cross > t2 * chord2)

    cleaned = F.filter(dedup, keep)
    return F.when(F.size(cleaned) >= 3,
                  F.concat(cleaned, F.slice(cleaned, 1, 1))
                  ).otherwise(F.array().cast("array<struct<lon:double,lat:double>>"))


def with_clean_ring(df, ring: str, out: str = "clean_ring",
                    tol: float = 1e-9):
    """Polygon cleaning (reference G6: Clipper CleanPolygon,
    /root/reference/osm2assimp/utils.cpp:160-165): remove near-duplicate
    vertices, then near-collinear vertices. Two single forward passes (a
    deterministic approximation of Clipper's iterative clean — adequate for
    the duplicate-node/jitter artifacts it exists to remove), each
    materialized as its own projection so the fold is computed once. Input
    closed ring (array<struct<lon,lat>>) -> output closed ring; rings
    collapsing below 3 distinct vertices come back empty."""
    df = df.withColumn("__cr1", _dedup_pass_col(F.col(ring), tol))
    df = df.withColumn(out, _collinear_pass_col(F.col("__cr1"), tol))
    return df.drop("__cr1")

"""k-nearest-neighbors via cell-neighborhood candidate join.

Composition (SURVEY.md §2.5 'absent joins' note): candidates from an
equi-join on the query's neighbor-cell array (explode 3x3 ring at level L),
exact haversine (reference F6, eigenconversion.cpp:146-160), then
``row_number() over (partitionBy(query) orderBy(dist)) <= k``.

Correct iff the true k-th neighbor lies within the 3x3 ring — pick L so the
ring radius covers the expected kNN radius; ``ring`` widens the search.
At scale this is one shuffle on cell_id (candidates) + one on query_id
(top-k), both key-partitioned and AQE-coalesced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

import math

from geoutils_spark.constants import EARTH_RADIUS_M
from geoutils_spark.functions import cells as C
from geoutils_spark.functions.geodesy import haversine_m_col

# meridional circumference 2*pi*R with the same R the haversine kernel uses
# (so the cover-disk bound and the measured distances share one sphere); one
# L-level cell spans ~ EARTH_CIRCUMFERENCE_M / 2^L meters of latitude.
EARTH_CIRCUMFERENCE_M = 2.0 * math.pi * EARTH_RADIUS_M


def knn_join(queries: DataFrame, corpus: DataFrame, k: int, level: int,
             ring: int = 1,
             q_id: str = "query_id", c_id: str = "neighbor_id",
             lon: str = "lon", lat: str = "lat",
             broadcast_queries: bool = True,
             include_self: bool = False,
             guaranteed_flag: bool = False) -> DataFrame:
    """Returns (q_id, c_id, rank, dist_m), rank 1..k by haversine meters.

    ``broadcast_queries``: typical shape is few queries vs huge corpus —
    broadcast the exploded query-cell table so the corpus never shuffles.

    ``guaranteed_flag``: append a per-row boolean ``guaranteed`` that is
    true iff this query's top-k is PROVABLY exact — k candidates were found
    and the k-th distance fits inside the disk the cell ring covers. Rows
    flagged false need a wider ``ring`` / coarser ``level`` escalation pass
    (the self-check an engine must have when candidate generation is
    locality-bounded).
    """
    q = C.with_tile_xy(queries, lon, lat, level, "__qx", "__qy")
    q = q.withColumn(
        "__nb", C.neighbor_cells_from_tile_col(F.col("__qx"), F.col("__qy"), level, ring)
    )
    q = q.select(
        F.col(q_id),
        F.col(lon).alias("__qlon"),
        F.col(lat).alias("__qlat"),
        F.col("__qy"),
        F.explode("__nb").alias("cell_id"),
    )
    c = C.with_cell(corpus, lon, lat, level, "cell_id").select(
        F.col(c_id), F.col(lon).alias("__clon"), F.col(lat).alias("__clat"), "cell_id"
    )
    left = F.broadcast(q) if broadcast_queries else q
    cand = left.join(c, on="cell_id", how="inner")
    if not include_self:
        cand = cand.filter(F.col(q_id) != F.col(c_id))
    cand = cand.withColumn(
        "dist_m",
        haversine_m_col(F.col("__qlon"), F.col("__qlat"),
                        F.col("__clon"), F.col("__clat")),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("dist_m").asc(), F.col(c_id).asc())
    out = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    if guaranteed_flag:
        # The ring search is exact iff the k-th hit lies within the disk the
        # ring provably covers: `ring` whole cells beyond the query's own in
        # every direction. Web-Mercator cells span ~ (C/2^L)*cos(lat) ground
        # meters in BOTH axes (conformal), with cos(lat) DECREASING toward
        # the poles — so the provable per-cell width over the whole covered
        # band is bounded below by cos at the band's POLEWARD tile edge
        # (evaluating cos at the query's own latitude, as r1 did with a
        # fixed 0.9 fudge, under-covers coarse levels / high latitudes
        # where the ring spans >10% of cos). 0.98 absorbs fp slack only.
        n = float(1 << level)
        v_north = (F.col("__qy") - F.lit(ring)).cast("double") / F.lit(n)
        v_south = (F.col("__qy") + F.lit(ring + 1)).cast("double") / F.lit(n)
        lat_of = lambda v: F.degrees(  # noqa: E731
            F.atan(F.sinh(F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * v))))
        cos_edge = F.least(F.cos(F.radians(lat_of(v_north))),
                           F.cos(F.radians(lat_of(v_south))))
        cell_m = F.lit(EARTH_CIRCUMFERENCE_M / n) * cos_edge
        safe_r = cell_m * F.lit(0.98 * float(ring))
        # The cover-disk proof requires `ring` WHOLE cells in every direction;
        # neighbor_cells_from_tile_col clamps y at the top/bottom Mercator
        # rows, so a clipped ring covers a poleward-truncated region and the
        # disk bound does not hold there — force guaranteed=false and let the
        # escalation pass (knn_join_exact) handle those queries.
        y_clipped = (F.col("__qy") < ring) | (F.col("__qy") >= int(n) - ring)
        wcnt = Window.partitionBy(q_id)
        out = (
            out.withColumn("__maxd", F.max("dist_m").over(wcnt))
            .withColumn("__n", F.count("*").over(wcnt))
            .withColumn(
                "guaranteed",
                (F.col("__n") >= k) & (F.col("__maxd") <= safe_r) & ~y_clipped,
            )
            .drop("__maxd", "__n")
        )
        return out.select(q_id, c_id, "rank", "dist_m", "guaranteed")
    return out.select(q_id, c_id, "rank", "dist_m")


def knn_join_exact(queries: DataFrame, corpus: DataFrame, k: int, level: int,
                   ring: int = 1,
                   q_id: str = "query_id", c_id: str = "neighbor_id",
                   lon: str = "lon", lat: str = "lat",
                   include_self: bool = False) -> DataFrame:
    """Unconditionally exact kNN: ring search first, then a brute-force
    escalation pass for exactly the queries whose ``guaranteed`` self-check
    failed (too few candidates in the ring, k-th hit outside the provable
    cover disk, or a pole-clipped ring).

    Scale shape: the escalation set is the sparse-region tail — typically a
    tiny fraction of queries — and is broadcast against the corpus, so the
    corpus never shuffles in either pass; cost is one extra corpus scan
    gated on a usually-small broadcast side. Results are the exact top-k for
    every query (ring answers are kept only when provably exact).
    """
    ringed = knn_join(queries, corpus, k, level, ring=ring, q_id=q_id,
                      c_id=c_id, lon=lon, lat=lat, include_self=include_self,
                      guaranteed_flag=True)
    ok = ringed.filter(F.col("guaranteed")).select(q_id, c_id, "rank", "dist_m")
    bad_ids = ringed.filter(~F.col("guaranteed")).select(q_id).distinct()
    # Queries with ZERO ring candidates never appear in `ringed` at all —
    # they are non-guaranteed too.
    bad_ids = bad_ids.unionByName(
        queries.select(q_id).join(ringed.select(q_id).distinct(), on=q_id,
                                  how="left_anti")
    ).distinct()
    bad_q = queries.join(F.broadcast(bad_ids), on=q_id).select(
        F.col(q_id), F.col(lon).alias("__qlon"), F.col(lat).alias("__qlat"))
    cand = F.broadcast(bad_q).crossJoin(
        corpus.select(F.col(c_id), F.col(lon).alias("__clon"),
                      F.col(lat).alias("__clat")))
    if not include_self:
        cand = cand.filter(F.col(q_id) != F.col(c_id))
    cand = cand.withColumn(
        "dist_m",
        haversine_m_col(F.col("__qlon"), F.col("__qlat"),
                        F.col("__clon"), F.col("__clat")),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("dist_m").asc(), F.col(c_id).asc())
    brute = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "rank", "dist_m")
    )
    return ok.unionByName(brute)

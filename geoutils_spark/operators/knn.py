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
                   include_self: bool = False,
                   max_rounds: int = 4, level_step: int = 3,
                   min_level: int = 4,
                   max_escalation_fraction: float = 0.25) -> DataFrame:
    """Unconditionally exact kNN with BOUNDED escalation.

    Round 1 runs the ring search at (``level``, ``ring``); queries whose
    ``guaranteed`` self-check failed (too few candidates, k-th hit outside
    the provable cover disk, pole-clipped ring) escalate to another ring
    pass with a COARSER level (``level - level_step`` per round, floored at
    ``min_level``, after which ``ring`` doubles instead) — so a mis-chosen
    fine level self-heals geometrically (cover radius grows 2^level_step
    per round) instead of silently degenerating into a corpus cross
    product (r2 verdict). Only the residual tail after ``max_rounds`` is
    brute-forced, and only if it is at most ``max_escalation_fraction`` of
    the queries; a larger tail raises loudly with the observed fraction
    (``max_escalation_fraction=0.0`` forbids brute force outright).

    Scale shape: queries are the broadcast-small side by contract, so the
    per-round tail count/localCheckpoint are bounded driver actions and
    the corpus never shuffles in any pass — each escalation round is one
    extra corpus scan gated on a shrinking broadcast query set; guaranteed
    per-query answers are localCheckpointed per round (<= n_q * k rows) so
    no ring pass executes twice. Results are the exact top-k for every
    query (ring answers are kept only when provably exact).
    """
    n_q = queries.count()  # bounded: queries are the small side by contract
    parts: list[DataFrame] = []
    remaining = queries
    cur_level, cur_ring = level, ring
    n_bad = 0
    for _ in range(max_rounds):
        ringed = knn_join(remaining, corpus, k, cur_level, ring=cur_ring,
                          q_id=q_id, c_id=c_id, lon=lon, lat=lat,
                          include_self=include_self, guaranteed_flag=True)
        ok = ringed.filter(F.col("guaranteed")) \
            .select(q_id, c_id, "rank", "dist_m").localCheckpoint()
        parts.append(ok)
        bad_ids = ringed.filter(~F.col("guaranteed")).select(q_id).distinct()
        # queries with ZERO ring candidates never appear in `ringed` at all
        # — they are non-guaranteed too
        bad_ids = bad_ids.unionByName(
            remaining.select(q_id).join(ringed.select(q_id).distinct(),
                                        on=q_id, how="left_anti")
        ).distinct()
        remaining = remaining.join(F.broadcast(bad_ids), on=q_id) \
            .localCheckpoint()  # cut the per-round lineage (small side)
        n_bad = remaining.count()
        if n_bad == 0:
            break
        if cur_level - level_step >= min_level:
            cur_level -= level_step
        else:
            cur_ring *= 2
    if n_bad > 0:
        if n_bad > max_escalation_fraction * n_q:
            raise RuntimeError(
                f"knn_join_exact escalation overflow: {n_bad}/{n_q} queries "
                f"({n_bad / max(n_q, 1):.0%}) still not provably exact after "
                f"{max_rounds} ring rounds (level {level}->{cur_level}, ring "
                f"{ring}->{cur_ring}); brute-forcing them against the corpus "
                f"is capped at max_escalation_fraction="
                f"{max_escalation_fraction}. Choose a coarser level / wider "
                f"ring, or raise max_rounds / max_escalation_fraction.")
        bad_q = remaining.select(
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
        w = Window.partitionBy(q_id).orderBy(F.col("dist_m").asc(),
                                             F.col(c_id).asc())
        parts.append(
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id, c_id, "rank", "dist_m")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

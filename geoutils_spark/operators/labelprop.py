"""Synchronous label propagation (Raghavan et al. 2007) — community
detection on the host link graph, the third graph op next to exact
PageRank and the pointer-doubling dup closure.

Determinized for the oracle gate: labels start as node ids; each round
every node takes the most frequent label among its neighbors with ties
broken by SMALLEST label (plain LPA breaks ties randomly and does not
converge deterministically). Synchronous rounds mean round r depends
only on round r-1 — exactly unrollable as oracle CTEs (the
web_redirect_resolve trajectory discipline).

Scale shape per round: one equi-join of the (undirected) edge list
against the label vector + one (node, label) hash-aggregate + one
partial-aggregating min_by per node — all map-side combining, no
windows over unbounded groups. The Python loop unrolls the logical plan
only; localCheckpoint per round caps lineage (the closure-loop rule).
A hub host with 10^8 neighbors is one (node,label)-keyed agg group per
DISTINCT incoming label, not one task buffering the neighborhood.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(edges: DataFrame, rounds: int = 3,
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """``rounds`` synchronous LPA sweeps over the undirected version of
    ``edges``. Returns (node, label)."""
    und = (edges.select(F.col(src).alias("v"), F.col(dst).alias("nbr"))
           .unionAll(edges.select(F.col(dst).alias("v"),
                                  F.col(src).alias("nbr")))
           .distinct())
    labels = (und.select(F.col("v").alias("node")).distinct()
              .select("node", F.col("node").alias("label"))
              .localCheckpoint())
    for _ in range(rounds):
        nbr_labels = und.join(
            labels.withColumnRenamed("node", "nbr"), "nbr")
        counted = (nbr_labels.groupBy("v", "label")
                   .agg(F.count("*").alias("cnt")))
        # most frequent label, ties -> smallest label: min over
        # (-cnt, label) structs, partial-agg-able (no window)
        pick = (counted.groupBy("v")
                .agg(F.min_by(
                    F.col("label"),
                    F.struct((-F.col("cnt")).alias("nc"),
                             F.col("label").alias("l"))).alias("label")))
        labels = pick.select(F.col("v").alias("node"), "label") \
            .localCheckpoint()
    return labels

"""Redirect-chain resolution — follow 3xx Location edges to their
terminal URL, distributed.

A crawler stores (url -> Location) edges (httphead.header_col over the
WARC responses); canonical frontier/dedup keys need the TERMINAL url
(the page that actually served content). Chains are short in practice
(browsers cap ~20 hops; pipelines cap lower), so resolution is
pointer-DOUBLING on the edge table: each round self-joins the current
mapping with itself, squaring the reachable distance — ``rounds`` r
covers chains up to 2^r hops in r vocab-bounded exchanges (the
operators/dedup.py closure discipline; a per-hop loop would take 2^r
exchanges). Cycles (redirect loops) never terminate by definition:
anything still pointing at a redirecting url after the horizon is
flagged ``unresolved`` instead of looping forever — the loud-overrun
rule.

The edge table is redirect-bounded (3xx rows only), orders of magnitude
smaller than the corpus; content pages never enter the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(edges: DataFrame, rounds: int = 3,
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """(src, final, hops, unresolved) for every redirecting url.

    ``edges`` holds one row per redirect (src -> dst). After ``rounds``
    doubling steps the mapping covers chains up to 2^rounds hops;
    ``unresolved`` is True when final still has an outgoing edge (chain
    longer than the horizon, or a loop).
    """
    m = edges.select(F.col(src).alias("u"), F.col(dst).alias("f"),
                     F.lit(1).cast("long").alias("hops"))
    for _ in range(rounds):
        m2 = m.select(F.col("u").alias("u2"), F.col("f").alias("f2"),
                      F.col("hops").alias("h2"))
        m = (m.join(m2, m["f"] == m2["u2"], "left")
             .select("u",
                     F.coalesce("f2", "f").alias("f"),
                     (F.col("hops") + F.coalesce(F.col("h2"), F.lit(0)))
                     .alias("hops"))
             .localCheckpoint())   # cap lineage like the closure loop
    srcs = edges.select(F.col(src).alias("u2")).distinct()
    return (m.join(srcs, m["f"] == srcs["u2"], "left")
            .select(F.col("u").alias(src), F.col("f").alias("final"),
                    "hops", F.col("u2").isNotNull().alias("unresolved")))

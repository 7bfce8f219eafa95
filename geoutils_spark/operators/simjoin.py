"""EXACT set-similarity self-join via prefix filtering (PPJoin-family:
Chaudhuri et al. SSJoin / Bayardo et al. all-pairs / Xiao et al. PPJoin —
public algorithms, re-derived here as pure DataFrame algebra).

The dedup ladder's exact rung between hash-identical (`dedup_exact`) and
probabilistic (`minhash_lsh_pairs`): return EVERY pair of documents with
Jaccard(shingles) >= t — no recall loss, no banding false negatives —
without the O(n^2) cross join.

Prefix-filter principle: fix one global total order over shingles (rarity
first — ascending document frequency, shingle text as tie-break). A set A
of size n keeps only its first ``n - ceil(t*n) + 1`` shingles as its
*prefix*; any pair with Jaccard >= t MUST share at least one prefix
shingle (if all shared elements sat outside A's prefix, the intersection
would be < ceil(t*n) <= t*|A∪B|'s lower bound — the classic lemma). So
candidates = equi-join of prefix shingles, then an exact
array_intersect verify. Rarity ordering makes the join keys the RAREST
shingles in each document, which bounds bucket sizes the way stopword
keys never would.

All threshold math is integer-exact: t is a rational ``t_num/t_den``,
ceil(t*n) = (t_num*n + t_den - 1) DIV t_den, and the verify predicate is
``inter * t_den >= t_num * union`` — no float drift, so the driver's
hash compare against a brute-force O(n^2) DuckDB oracle is exact (and
doubles as an empirical proof that the prefix filter lost no pair).

Scale shape: shingle doc-frequencies are a vocab-sized table
(broadcast); the per-doc prefix rebuild is one exchange on doc id; the
candidate join carries (id, shingle) prefix pairs only (~30% of shingles
at t=0.7); verify joins the two full shingle arrays back BY ID. Nothing
is quadratic unless the data truly is (all-identical corpora), and AQE
skew-splits a hot rare-shingle bucket like any other equi-join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoutils_spark.functions import textanalysis as TA


def jaccard_prefix_join(docs: DataFrame, k_shingle: int = 3,
                        t_num: int = 7, t_den: int = 10,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """All pairs (id_a < id_b) with shingle Jaccard >= t_num/t_den.
    Output: (id_a, id_b, inter_size, union_size) — integer-exact."""
    # Materialize the shingle table once (localCheckpoint — the CLAUDE.md
    # derived-column self-join discipline): it feeds FOUR consumers (the
    # df-count explode, the prefix rebuild, and both verify join-back
    # sides). Live lineage re-scans the corpus and re-shingles per
    # consumer; at scale the (id, shingles) table is the one-pass
    # intermediate every PPJoin implementation stores anyway.
    sh = docs.select(
        F.col(id_col).alias("id"),
        TA.word_shingles_col(F.col(text_col), k_shingle).alias("sh"),
    ).localCheckpoint()
    ex = sh.select("id", F.explode("sh").alias("s"))
    dfreq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    # rarity-ordered shingle list per doc, then the prefix slice:
    # len = n - ceil(t*n) + 1  (integer ceil; always >= 1 for n >= 1)
    ordered = (
        ex.join(F.broadcast(dfreq), "s")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "s"))).alias("o"))
        .select(
            "id",
            F.expr(
                f"slice(transform(o, x -> x.s), 1, "
                f"size(o) - (({t_num} * size(o) + {t_den - 1}) "
                f"DIV {t_den}) + 1)"
            ).alias("prefix"),
        )
    )
    pre = ordered.select("id", F.explode("prefix").alias("s"))
    cand = (
        pre.select(F.col("id").alias("id_a"), "s")
        .join(pre.select(F.col("id").alias("id_b"), "s"), "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    verified = (
        cand.join(sh.select(F.col("id").alias("id_a"),
                            F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"),
                        F.col("sh").alias("sh_b")), "id_b")
        .select(
            "id_a", "id_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
            .alias("inter_size"),
            (F.size("sh_a") + F.size("sh_b")
             - F.size(F.array_intersect("sh_a", "sh_b"))).cast("long")
            .alias("union_size"),
        )
    )
    return verified.filter(
        (F.col("inter_size") > 0)
        & (F.col("inter_size") * t_den >= F.col("union_size") * t_num))

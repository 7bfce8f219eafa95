"""SemDeDup: semantic deduplication inside embedding clusters (Abbas et
al., "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", 2023 — the published embedding-space dedup recipe used on
LAION/web corpora).

Embedding-space sibling of the cell-bucketed spatial join (operators/
spatial_join.py; SURVEY.md §2.5): cluster assignment plays the role of
the cell index — closeness becomes key equality — and the quadratic work
is confined to within-bucket pairs.

Method, exactly as implemented:

1. **Cluster** — every vector is assigned to its nearest centroid by
   row-local argmax over a BROADCAST centroid literal
   (similarity.assign_centroid_col: one higher-order fold per centroid,
   bit-identical cosine to the SQL twin, ties to the lower centroid id).
   The paper uses k-means; the operator takes any centroid list —
   deterministic data-derived picks in the oracle-checked query,
   similarity.train_centroids for real corpora.
2. **Within-cluster pairs** — a self-equi-join on the cluster id; each
   pair scored with the exact chain-sum cosine (identical IEEE
   evaluation order both dialects — comparisons at the threshold cannot
   drift).
3. **Drop rule** — a vector is a duplicate iff some SAME-CLUSTER vector
   with a LOWER id sits within the threshold: deterministic
   keep-lowest-id per epsilon-neighborhood (the paper keeps one example
   per duplicate set — e.g. the one farthest from the centroid; min-id
   is the reproducible, oracle-checkable choice, same keeper rule as the
   exact-dedup tier).

Scale plan: centroids broadcast (row-local assignment, no shuffle); the
pair join exchanges each side once, keyed by cluster id; survivors
anti-join back by id. Within-cluster cost is O(c^2) — the SemDeDup
design point is picking k so the expected cluster size keeps c^2
tractable (the paper runs 50k clusters over 100M+ embeddings). A hot
cluster (degenerate centroid) is the skew risk: cap it by raising k or
block-splitting the bucket (the LSH tier's band-chunk trick applies
verbatim); the drop decision only needs ONE witness, so early-out
variants can prune — not needed at current scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoutils_spark.operators import similarity as SIM


def assign_clusters(vectors: DataFrame,
                    centroids: list[tuple[int, list[float]]],
                    dim: int = SIM.EMB_DIM, id_col: str = "vec_id",
                    vec: str = "e") -> DataFrame:
    """(id, e, n, bucket) — nearest-centroid cluster id plus the vector
    norm, both row-local. The norm rides along so the pair join computes
    ONE dot chain per pair instead of three (an inlined 3x64-term chain
    blew the 64KB whole-stage-codegen limit -> silent interpreted
    fallback; sqrt(dot(a,a)) is the identical IEEE value wherever it is
    computed, so the oracle's full cosine chain still hash-matches —
    the dedup.py embedding tier's discipline)."""
    n = F.sqrt(SIM.dot_chain_col(F.col(vec), F.col(vec), dim))
    return vectors.select(
        id_col, vec, n.alias("n"),
        SIM.assign_centroid_col(F.col(vec), centroids, dim,
                                vnorm=n).alias("bucket"))


def semdedup_drops(vectors: DataFrame,
                   centroids: list[tuple[int, list[float]]],
                   threshold: float, dim: int = SIM.EMB_DIM,
                   id_col: str = "vec_id", vec: str = "e",
                   checkpoint: bool = True) -> DataFrame:
    """(drop_id, bucket, witness_id, cosine) — every vector with a
    lower-id same-cluster neighbor at cosine >= threshold; the witness is
    the LOWEST such id (min-struct aggregation — partial-combines, so a
    10^6-member duplicate ball still reduces map-side).

    The assignment is MATERIALIZED (localCheckpoint) before the self-join:
    without it, AQE's broadcast conversion strips the exchange and
    re-inlines the K x dim argmax + upstream array builders into BOTH join
    sides and the pushed-down cosine condition — every candidate pair then
    re-evaluates the whole assignment subtree (measured ~1 ms/pair,
    306 s -> 2.9 s at sf0.1; the CLAUDE.md giant-expression invariant).
    At scale the materialized (id, vec, norm, bucket) table IS the IVF
    storage layout — written once, read by both pair-join sides; swap
    localCheckpoint for a persisted table write on a real cluster run."""
    asg = assign_clusters(vectors, centroids, dim, id_col, vec)
    if checkpoint:
        asg = asg.localCheckpoint()
    a = asg.select(F.col(id_col).alias("id_a"), F.col(vec).alias("ea"),
                   F.col("n").alias("na"), "bucket")
    b = asg.select(F.col(id_col).alias("id_b"), F.col(vec).alias("eb"),
                   F.col("n").alias("nb"), "bucket")
    cos = (SIM.dot_chain_col(F.col("ea"), F.col("eb"), dim)
           / (F.col("na") * F.col("nb")))
    pairs = (a.join(b, "bucket")
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_b", "bucket", "id_a", cos.alias("cos"))
             .filter(F.col("cos") >= threshold))
    w = F.min(F.struct("id_a", "cos"))
    return (pairs.groupBy("id_b", "bucket").agg(w.alias("w"))
            .select(F.col("id_b").alias("drop_id"), "bucket",
                    F.col("w.id_a").alias("witness_id"),
                    F.col("w.cos").alias("cosine")))


def semdedup_keepers(vectors: DataFrame,
                     centroids: list[tuple[int, list[float]]],
                     threshold: float, dim: int = SIM.EMB_DIM,
                     id_col: str = "vec_id", vec: str = "e") -> DataFrame:
    """The surviving vectors: drops anti-joined back onto the source scan
    (ids-only broadcast when the drop set is small)."""
    drops = semdedup_drops(vectors, centroids, threshold, dim, id_col, vec)
    return vectors.join(
        F.broadcast(drops.select(F.col("drop_id").alias(id_col))),
        id_col, "leftanti")


def semdedup_sql(corpus_cte: str, centroid_pred: str, threshold: float,
                 dim: int = SIM.EMB_DIM) -> str:
    """DuckDB twin of semdedup_drops: identical assignment (argmax with
    the same tie rule), identical chain cosine, identical drop rule.
    ``corpus_cte`` must yield (vec_id, e double[]); centroids are the
    corpus rows satisfying ``centroid_pred``."""
    cos_vc = SIM.cosine_chain_sql("v.e", "c.e", dim)
    cos_ab = SIM.cosine_chain_sql("a.e", "b.e", dim)
    return f"""
    WITH base AS (SELECT * FROM {corpus_cte}),
    cents AS (SELECT vec_id AS cid, e FROM base WHERE {centroid_pred}),
    assigned AS (
      SELECT v.vec_id, v.e, c.cid AS bucket
      FROM base v CROSS JOIN cents c
      QUALIFY ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                 ORDER BY {cos_vc} DESC, c.cid ASC) = 1
    ),
    pairs AS (
      SELECT b.vec_id AS drop_id, a.bucket, a.vec_id AS witness_id,
             {cos_ab} AS cosine
      FROM assigned a JOIN assigned b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE {cos_ab} >= {threshold!r}
    )
    SELECT drop_id, bucket, witness_id, cosine
    FROM pairs
    QUALIFY ROW_NUMBER() OVER (PARTITION BY drop_id
                               ORDER BY witness_id ASC) = 1
    """

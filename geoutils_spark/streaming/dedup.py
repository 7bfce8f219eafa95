"""Streaming near-duplicate dedup at ingest time (foreachBatch incremental).

The batch tier dedups a finished corpus (operators/dedup.py); a training-
data INGEST pipeline needs the same decision per arriving micro-batch:
drop a document iff it near-duplicates anything seen before it. This is the
``foreachBatch`` + persistent-store pattern — the store is two append-only
parquet tables:

* ``docs``  — (doc_id, sig, sh): MinHash signature + shingle set of every
  document ever processed (kept AND dropped — a doc that was itself dropped
  still suppresses its later near-dups, exactly like the batch drop-list's
  "pairs with any smaller id" rule, queries.py ``dedup_drop_list``);
* ``keys``  — (doc_id, band, key): LSH band buckets for the candidate join.

Per micro-batch: signatures/keys are row-local projections; candidates are
(batch keys ⋈ store keys) ∪ (batch self-join on smaller id); est-agreement
gates the exact-Jaccard verify; survivors append to the store and flow to
the kept sink. Precedence is ARRIVAL order across batches and id order
within a batch — run the stream id-ordered to reproduce the batch twin
row-for-row (test_streaming_dedup).

Scale shape: the store grows as the corpus, but the per-batch join touches
only colliding band buckets (equi-join, broadcast-able batch side); pass
``keys_table`` to keep the keys store as a TABLE bucketed by (band, key)
— the candidate join is then co-located on the store side (its scan has
ZERO Exchange; only the small batch side shuffles — plan-asserted in
test_streaming.py), the same write-once-shuffle-never-again lever as
``tables.write_bucketed_by_cell``. foreachBatch is checkpointable, and a
batch-id marker table (written last) makes the per-batch appends
idempotent under foreachBatch's at-least-once replay.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoutils_spark.functions.textanalysis import word_shingles_col
from geoutils_spark.operators.dedup import (
    band_keys_col,
    minhash_signature_col,
    sig_agreement_col,
)


class IncrementalDeduper:
    def __init__(self, store_dir: str,
                 id_col: str = "doc_id", text_col: str = "text",
                 k_shingle: int = 3, num_hashes: int = 12, bands: int = 4,
                 min_est_jaccard: float = 0.5, min_jaccard: float = 0.7,
                 keys_table: str | None = None, n_buckets: int = 16):
        self.store_dir = store_dir
        self.id_col, self.text_col = id_col, text_col
        self.k_shingle, self.num_hashes, self.bands = k_shingle, num_hashes, bands
        self.min_est_jaccard, self.min_jaccard = min_est_jaccard, min_jaccard
        self.kept_dir = os.path.join(store_dir, "kept")
        self._docs = os.path.join(store_dir, "docs")
        self._keys = os.path.join(store_dir, "keys")
        self._marks = os.path.join(store_dir, "batches")
        # keys store as a (band, key)-bucketed table: the per-batch
        # candidate join reads the store WITHOUT an Exchange
        self.keys_table = keys_table
        self.n_buckets = n_buckets

    # -- store access -------------------------------------------------------

    def _read(self, spark: SparkSession, path: str, schema: str) -> DataFrame:
        from pyspark.errors import AnalysisException

        try:
            return spark.read.parquet(path)
        except AnalysisException:  # PATH_NOT_FOUND on the first batch only
            return spark.createDataFrame([], schema)

    def _sigged(self, batch: DataFrame) -> DataFrame:
        return batch.select(
            F.col(self.id_col).alias("doc_id"), F.col(self.text_col).alias("text"),
            word_shingles_col(F.col(self.text_col), self.k_shingle).alias("sh"),
        ).withColumn("sig", minhash_signature_col(F.col("sh"), self.num_hashes))

    # -- the per-batch decision --------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # Idempotence guard: foreachBatch is at-least-once (a failure after
        # the appends but before the checkpoint commit replays the batch
        # with the same id). A marker row written LAST makes the replay a
        # no-op, so the appends are effectively exactly-once.
        done = self._read(spark, self._marks, "batch_id long")
        if done.filter(F.col("batch_id") == batch_id).limit(1).count() > 0:
            return
        b = self._sigged(batch).localCheckpoint()  # compute sigs once
        bk = b.select("doc_id", F.explode(band_keys_col(
            F.col("sig"), self.bands, self.num_hashes // self.bands)).alias("__bk")
        ).select("doc_id", F.col("__bk.band").alias("band"),
                 F.col("__bk.key").alias("key"))
        seen_keys = self._read_keys(spark)
        seen_docs = self._read(
            spark, self._docs,
            "doc_id long, sig array<string>, sh array<string>")
        # cross-batch candidates: batch vs store (store always has precedence)
        cross = (bk.join(seen_keys.withColumnRenamed("doc_id", "prior_id"),
                         on=["band", "key"])
                 .select("doc_id", "prior_id").dropDuplicates())
        cross = (cross
                 .join(b.select("doc_id", F.col("sig").alias("sig_b"),
                                F.col("sh").alias("sh_b")), on="doc_id")
                 .join(seen_docs.select(F.col("doc_id").alias("prior_id"),
                                        F.col("sig").alias("sig_a"),
                                        F.col("sh").alias("sh_a")), on="prior_id"))
        # intra-batch candidates: smaller id has precedence
        a = bk.select(F.col("doc_id").alias("id_a"), "band", "key")
        c = bk.select(F.col("doc_id").alias("id_b"), "band", "key")
        intra = (a.join(c, on=["band", "key"])
                 .filter(F.col("id_a") < F.col("id_b"))
                 .select("id_a", "id_b").dropDuplicates()
                 .join(b.select(F.col("doc_id").alias("id_a"),
                                F.col("sig").alias("sig_a"),
                                F.col("sh").alias("sh_a")), on="id_a")
                 .join(b.select(F.col("doc_id").alias("id_b"),
                                F.col("sig").alias("sig_b"),
                                F.col("sh").alias("sh_b")), on="id_b")
                 .withColumnRenamed("id_b", "doc_id"))
        cand = cross.select("doc_id", "sig_a", "sig_b", "sh_a", "sh_b").unionByName(
            intra.select("doc_id", "sig_a", "sig_b", "sh_a", "sh_b"))
        est = sig_agreement_col(F.col("sig_a"), F.col("sig_b"), self.num_hashes)
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        dropped = (cand.filter(est >= self.min_est_jaccard)
                   .filter(inter.cast("double") / union.cast("double")
                           >= self.min_jaccard)
                   .select("doc_id").distinct())
        kept = b.join(dropped, on="doc_id", how="left_anti")
        kept.select("doc_id", "text").write.mode("append").parquet(self.kept_dir)
        # ALL processed docs (kept + dropped) enter the store: a dropped doc
        # still suppresses its own later near-dups (batch drop-list parity).
        b.select("doc_id", "sig", "sh").write.mode("append").parquet(self._docs)
        self._append_keys(bk)
        spark.createDataFrame([(int(batch_id),)], "batch_id long") \
            .write.mode("append").parquet(self._marks)

    def _read_keys(self, spark: SparkSession) -> DataFrame:
        if self.keys_table is None:
            return self._read(spark, self._keys,
                              "doc_id long, band int, key string")
        if spark.catalog.tableExists(self.keys_table):
            return spark.table(self.keys_table)
        return spark.createDataFrame([], "doc_id long, band int, key string")

    def _append_keys(self, bk: DataFrame) -> None:
        if self.keys_table is None:
            bk.write.mode("append").parquet(self._keys)
            return
        (bk.write.mode("append").format("parquet")
           .bucketBy(self.n_buckets, "band", "key").sortBy("band", "key")
           .saveAsTable(self.keys_table))

    # -- stream wiring ------------------------------------------------------

    def attach(self, docs_stream: DataFrame, checkpoint_dir: str):
        """writeStream.foreachBatch: returns the started StreamingQuery."""
        return (docs_stream.writeStream
                .foreachBatch(self.process_batch)
                .option("checkpointLocation", checkpoint_dir)
                .trigger(availableNow=True)
                .start())

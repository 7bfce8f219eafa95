"""Streaming recrawl dedup: maintain the newest snapshot per canonical URL
across micro-batches — the ingest-time twin of ``operators/corpus.py::
keep_latest`` (a recrawl pipeline wants "current winner per URL" updated
as WARC batches land, not recomputed corpus-wide per day).

``foreachBatch`` + persistent-store pattern (the streaming/dedup.py
discipline):

* ``snaps``   — append-only parquet of per-batch winners. Grows by at most
  one row per (batch, key) — NOT one per snapshot: the batch collapses
  map-side first.
* ``changes`` — the emitted upsert log: (batch_id, key, winner...) rows
  appended only when a batch actually beats the stored winner — a
  downstream consumer (index refresh, cache invalidation) reads this as a
  CDC stream.
* ``batches`` — idempotence markers, written LAST, so foreachBatch's
  at-least-once replay of a committed batch is a no-op (appends become
  effectively exactly-once).

Crash-atomicity ordering (r5 ADVICE): within a batch the appends run
``changes`` -> ``snaps`` -> marker. The order matters because a replay
derives ``improved`` from the CURRENT store: once winners reach ``snaps``
the replay's improved set is empty, so any log not yet written at crash
time would be lost forever. With changes first, the only crash window
that double-appends (after changes, before snaps) replays to a
byte-identical changes append — ``changes()`` collapses it with
``dropDuplicates`` — and ``snaps`` is written at most once.

Per batch: (1) ``keep_latest(batch)`` — partial-aggregating max_by, so a
crawler-trap URL recrawled 10^6 times inside one batch costs one row per
task; (2) previous winners for ONLY the batch's keys via a broadcast
semi-join (the store never shuffles; at real scale keep ``snaps`` as a
url_key-bucketed table — the ``tables.write_bucketed_by_cell`` lever — and
the store side of this join is co-located with zero Exchange); (3) a row
is an *improvement* iff the store had no winner or the batch winner's
``(ts, id)`` beats it (struct-lexicographic — identical tie rule to the
batch operator); (4) improvements append to ``snaps`` + ``changes``.

``current()`` folds the append-only store with the same ``keep_latest``
(old beaten winners lose again); ``compact()`` rewrites the store down to
one row per key so reads stop paying for history. Batch parity:
``current()`` after any prefix of batches == ``keep_latest(union of those
batches)`` row-for-row (pytest drives both orders + a replay).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoutils_spark.operators.corpus import keep_latest


class LatestKeeper:
    def __init__(self, store_dir: str, key_col: str = "url_key",
                 ts_col: str = "warc_ts", id_col: str = "doc_id"):
        self.key_col, self.ts_col, self.id_col = key_col, ts_col, id_col
        self._snaps = os.path.join(store_dir, "snaps")
        self._changes = os.path.join(store_dir, "changes")
        self._marks = os.path.join(store_dir, "batches")
        self._schema: str | None = None  # learned from the first batch

    # -- store access -------------------------------------------------------

    def _read(self, spark: SparkSession, path: str,
              schema: str) -> DataFrame:
        from pyspark.errors import AnalysisException

        try:
            return spark.read.parquet(path)
        except AnalysisException:  # PATH_NOT_FOUND on the first batch only
            return spark.createDataFrame([], schema)

    def _store_schema(self, batch: DataFrame) -> str:
        return ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                         for f in batch.schema.fields)

    # -- the per-batch decision --------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        done = self._read(spark, self._marks, "batch_id long")
        if done.filter(F.col("batch_id") == batch_id).limit(1).count() > 0:
            return
        k, ts, i = self.key_col, self.ts_col, self.id_col
        payload = [c for c in batch.columns if c != k]
        # one winner per key inside the batch (map-side combine, skew-safe)
        best = (keep_latest(batch, key_col=k, ts_col=ts, id_col=i)
                .drop("n_snapshots").localCheckpoint())
        store = self._read(spark, self._snaps, self._store_schema(batch))
        # previous winners for ONLY this batch's keys; batch side is the
        # small side — broadcast it so the store never shuffles
        prev = (store.join(F.broadcast(best.select(k)), on=k, how="leftsemi"))
        prev_best = (keep_latest(prev, key_col=k, ts_col=ts, id_col=i)
                     .select(k, F.struct(ts, i).alias("__prev")))
        improved = (
            best.join(F.broadcast(prev_best), on=k, how="left")
            .filter(F.col("__prev").isNull()
                    | (F.struct(ts, i) > F.col("__prev")))
            .select(k, *payload)
        )
        # changes BEFORE snaps: once a winner lands in snaps the replay
        # recomputes improved as empty (stored winner ties, strict >), so
        # a crash in the snaps->changes window would lose those CDC rows
        # forever. In the changes->snaps order a crash replays to a
        # byte-identical second append (store unchanged => same improved),
        # which changes() collapses with dropDuplicates — effectively
        # exactly-once for both logs.
        improved = improved.localCheckpoint()  # one compute, two appends
        improved.withColumn("batch_id", F.lit(int(batch_id))) \
            .write.mode("append").parquet(self._changes)
        improved.write.mode("append").parquet(self._snaps)
        spark.createDataFrame([(int(batch_id),)], "batch_id long") \
            .write.mode("append").parquet(self._marks)
        if self._schema is None:
            self._schema = self._store_schema(batch)

    # -- views --------------------------------------------------------------

    def current(self, spark: SparkSession) -> DataFrame:
        """One row per key: the winner so far (folds stored history)."""
        store = self._read(spark, self._snaps,
                           self._schema or "url_key string")
        return keep_latest(store, key_col=self.key_col, ts_col=self.ts_col,
                           id_col=self.id_col).drop("n_snapshots")

    def changes(self, spark: SparkSession) -> DataFrame:
        # dropDuplicates absorbs the one legal duplicate: a crash between
        # the changes append and the snaps append replays the batch with
        # an unchanged store, producing a byte-identical second append.
        return self._read(spark, self._changes,
                          (self._schema or "url_key string")
                          + ", batch_id long").dropDuplicates()

    def compact(self, spark: SparkSession) -> None:
        """Rewrite snaps to one row per key (drop beaten history)."""
        cur = self.current(spark).localCheckpoint()
        cur.write.mode("overwrite").parquet(self._snaps)

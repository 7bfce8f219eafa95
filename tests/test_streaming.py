"""Batch/stream parity for the streaming operators: the same transformation
run over the events table as a static frame and as a file stream
(availableNow) must agree row-for-row."""

import pytest
from pyspark.sql import functions as F

from geoutils_spark.streaming import windows as W

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="module")
def events_stream(spark, events_batch, tmp_path_factory):
    # the file stream source needs a directory, not a single parquet file
    d = str(tmp_path_factory.mktemp("events_dir"))
    events_batch.write.mode("overwrite").parquet(d)
    return spark.readStream.schema(events_batch.schema).parquet(d)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_hourly_counts_batch_stream_parity(spark, events_batch, events_stream):
    batch = W.hourly_event_counts(events_batch)
    stream = W.hourly_event_counts(events_stream)
    assert stream.isStreaming
    W.run_stream_to_memory(stream, "hourly_q")
    got = spark.sql("SELECT * FROM hourly_q")
    cols = ["window_start", "event_type", "n", "total_value"]
    assert _rows(got, cols) == _rows(batch, cols)


def test_hourly_matches_batch_bucket_query(events_batch):
    """window(1 hour).start == floor(epoch/3600)*3600 — ties the streaming
    semantics to the oracle-checked rel_events_hourly bucketing."""
    w = W.hourly_event_counts(events_batch).select(
        (F.unix_timestamp("window_start") / 3600).cast("long").alias("hb"),
        "event_type", "n")
    b = (
        events_batch
        .withColumn("hb", F.floor(F.unix_timestamp("ts") / 3600).cast("long"))
        .groupBy("hb", "event_type").agg(F.count("*").alias("n"))
    )
    assert _rows(w, ["hb", "event_type", "n"]) == _rows(b, ["hb", "event_type", "n"])


def test_sliding_counts_stream(spark, events_stream, events_batch):
    stream = W.sliding_event_counts(events_stream)
    W.run_stream_to_memory(stream, "sliding_q")
    got = spark.sql("SELECT * FROM sliding_q")
    batch = W.sliding_event_counts(events_batch)
    cols = ["window_start", "event_type", "n"]
    assert _rows(got, cols) == _rows(batch, cols)
    # each event lands in 4 sliding windows (1h window, 15min slide)
    n_events = events_batch.count()
    assert got.agg(F.sum("n")).collect()[0][0] == 4 * n_events


def test_streaming_cell_counts(spark, events_batch, events_stream):
    from geoutils_spark.functions.keys import key_lat_col, key_lon_col

    def with_geo(df):
        return (
            df.withColumn("lon", key_lon_col(F.col("event_id")))
            .withColumn("lat", key_lat_col(F.col("event_id")))
        )

    stream = W.streaming_cell_counts(with_geo(events_stream), level=13)
    W.run_stream_to_memory(stream, "cells_q")
    got = spark.sql("SELECT * FROM cells_q")
    batch = W.streaming_cell_counts(with_geo(events_batch), level=13)
    cols = ["window_start", "cell_id", "n"]
    assert _rows(got, cols) == _rows(batch, cols)
    assert got.count() > 1


def test_stateful_sessionize_matches_batch(spark, events_batch, tmp_path_factory):
    """applyInPandasWithState sessionization == the oracle-checked batch
    window-lag sessionization (rel_sessionize), fed availableNow."""
    from pyspark.sql import Window

    from geoutils_spark.streaming.sessions import sessionize_stream

    d = str(tmp_path_factory.mktemp("events_sess"))
    events_batch.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(events_batch.schema).parquet(d)
    out = sessionize_stream(stream)
    q = (out.writeStream.format("memory").queryName("sess_q")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    # update mode: last emitted row per user is the final state
    got = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in spark.sql(
            "SELECT user_id, n_sessions, n_events FROM "
            "(SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn "
            " FROM sess_q) WHERE rn = 1").collect()
    }
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap > 1800, 1).when(F.lag("ts").over(w).isNull(), 1).otherwise(0)
    want = {
        r.user_id: (r.ns, r.ne)
        for r in events_batch.withColumn("ns1", new_sess).groupBy("user_id")
        .agg(F.sum("ns1").cast("long").alias("ns"), F.count("*").alias("ne"))
        .collect()
    }
    assert got == want


def test_stream_static_broadcast_enrich(spark, events_batch, events_stream):
    """Stream-static join: the streaming side enriched against a static
    broadcast dim — the Structured Streaming form of the engine's
    broadcast-dim joins (J5)."""
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"),
         ("purchase", "revenue"), ("signup", "acquisition"),
         ("error", "ops")],
        "event_type string, category string")
    out = (events_stream.join(F.broadcast(dim), "event_type")
           .groupBy("category").count())
    q = (out.writeStream.format("memory").queryName("enrich_q")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r.category: r["count"] for r in spark.sql("SELECT * FROM enrich_q").collect()}
    want = {r.category: r["count"] for r in
            events_batch.join(dim, "event_type").groupBy("category").count().collect()}
    assert got == want and len(got) == 4

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


def test_streaming_dedup_matches_batch_drop_list(spark, tmp_path_factory):
    """Incremental foreachBatch dedup over id-ordered micro-batches ==
    the batch drop-list (drop iff exact-Jaccard>=0.7 near-dup of a
    smaller/earlier doc), including suppression by already-dropped docs."""
    from geoutils_spark.operators import dedup as DD
    from geoutils_spark.streaming.dedup import IncrementalDeduper

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    mut = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.array_join(F.slice(toks, 1, F.greatest(F.size(toks) - 3, F.lit(0))), " ")
        .alias("text"))
    corpus = docs.unionByName(mut)

    # batch twin: greedy keep-smallest-id drop list
    pairs = DD.minhash_lsh_pairs(corpus, min_est_jaccard=0.5)
    drop = {r.id_b for r in pairs.filter(F.col("exact_jaccard") >= 0.7)
            .select("id_b").distinct().collect()}
    all_ids = {r.doc_id for r in corpus.collect()}

    # stream: two id-ordered micro-batches (arrival order == id order)
    src = str(tmp_path_factory.mktemp("dedup_src"))
    lo = corpus.filter(F.col("doc_id") < 100000)
    hi = corpus.filter(F.col("doc_id") >= 100000)
    lo.coalesce(1).write.parquet(src + "/b0")
    hi.coalesce(1).write.parquet(src + "/b1")
    store = str(tmp_path_factory.mktemp("dedup_store"))
    ckpt = str(tmp_path_factory.mktemp("dedup_ckpt"))
    ded = IncrementalDeduper(store)
    # drive the two batches in order through the same code path foreachBatch
    # uses (deterministic batch boundaries for the parity check)
    ded.process_batch(spark.read.parquet(src + "/b0"), 0)
    ded.process_batch(spark.read.parquet(src + "/b1"), 1)
    kept = {r.doc_id for r in spark.read.parquet(ded.kept_dir).collect()}
    assert kept == all_ids - drop
    assert drop, "fixture must actually drop something"


def test_streaming_dedup_foreachbatch_wiring(spark, tmp_path_factory):
    """attach(): the foreachBatch stream runs end-to-end (availableNow) and
    drops an exact duplicate arriving in a later file."""
    from geoutils_spark.streaming.dedup import IncrementalDeduper

    src = str(tmp_path_factory.mktemp("wire_src"))
    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "doc_id long, text string").coalesce(1).write.parquet(src + "/f0")
    spark.createDataFrame(
        [(3, "alpha beta gamma delta epsilon zeta"),
         (4, "totally different words entirely here now")],
        "doc_id long, text string").coalesce(1).write.parquet(src + "/f1")
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    store = str(tmp_path_factory.mktemp("wire_store"))
    ckpt = str(tmp_path_factory.mktemp("wire_ckpt"))
    q = IncrementalDeduper(store).attach(stream, ckpt)
    q.awaitTermination()
    kept = {r.doc_id for r in spark.read.parquet(store + "/kept").collect()}
    assert 4 in kept and 2 in kept
    # docs 1 and 3 are exact duplicates across files: whichever micro-batch
    # arrived first wins, the other is dropped (arrival-order precedence)
    assert len(kept & {1, 3}) == 1


def test_streaming_dedup_replay_idempotent(spark, tmp_path_factory):
    """foreachBatch at-least-once replay: re-processing the same batch_id
    must not duplicate kept rows or store entries."""
    from geoutils_spark.streaming.dedup import IncrementalDeduper

    store = str(tmp_path_factory.mktemp("replay_store"))
    ded = IncrementalDeduper(store)
    batch = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four")],
        "doc_id long, text string")
    ded.process_batch(batch, 0)
    ded.process_batch(batch, 0)  # replay with the same id
    kept = spark.read.parquet(store + "/kept").collect()
    assert len(kept) == 2
    keys = spark.read.parquet(store + "/keys")
    assert keys.count() == 2 * 4  # 2 docs x 4 bands, once


def test_streaming_dedup_bucketed_keys_store(spark, tmp_path_factory):
    """keys_table=: the keys store is a (band, key)-bucketed table — same
    kept set as the plain parquet store, and the per-batch candidate join
    reads the store WITHOUT an Exchange (only the small batch side
    shuffles) even when broadcast is disabled."""
    from pyspark.sql import functions as F

    from geoutils_spark.streaming.dedup import IncrementalDeduper

    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "doc_id long, text string")
    b1 = spark.createDataFrame(
        [(3, "alpha beta gamma delta epsilon zeta"),
         (4, "totally different words entirely here now")],
        "doc_id long, text string")
    plain_store = str(tmp_path_factory.mktemp("bk_plain"))
    buck_store = str(tmp_path_factory.mktemp("bk_buck"))
    plain = IncrementalDeduper(plain_store)
    buck = IncrementalDeduper(buck_store, keys_table="t_dedup_keys",
                              n_buckets=4)
    try:
        for d in (plain, buck):
            d.process_batch(b0, 0)
            d.process_batch(b1, 1)
        kp = {r.doc_id for r in spark.read.parquet(plain_store + "/kept").collect()}
        kb = {r.doc_id for r in spark.read.parquet(buck_store + "/kept").collect()}
        assert kb == kp == {1, 2, 4}
        # appended twice (two batches), still one bucketed table
        assert spark.table("t_dedup_keys").count() == 4 * 4
        # plan probe: batch-keys ⋈ bucketed store with broadcast disabled —
        # exactly ONE Exchange (the batch side); the store scan is
        # bucket-co-located
        bk = spark.createDataFrame(
            [(9, 0, "k0"), (9, 1, "k1")], "doc_id long, band int, key string")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bk.join(
                spark.table("t_dedup_keys").withColumnRenamed(
                    "doc_id", "prior_id"), on=["band", "key"])
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert plan.count("Exchange hashpartitioning") == 1, plan
            joined.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_dedup_keys")


def test_interval_join_stream_batch_parity(spark, events_batch, tmp_path_factory):
    """Stream-stream interval join emits exactly the batch join's pairs
    on the same input (inner joins emit eagerly; watermark only bounds
    state), and the plan carries watermarks on BOTH sides so state is
    evictable."""
    from geoutils_spark.streaming.joins import interval_join, last_touch

    d = str(tmp_path_factory.mktemp("ij") / "events")
    events_batch.write.mode("overwrite").parquet(d)
    clicks_b = events_batch.filter(F.col("event_type") == "click") \
        .select("user_id", "event_id", "ts")
    convs_b = events_batch.filter(F.col("event_type") == "purchase") \
        .select("user_id", "event_id", "ts")
    want = set(map(tuple, interval_join(clicks_b, convs_b)
                   .select("user_id", "l_event_id", "r_event_id").collect()))
    assert want, "fixture must produce at least one attribution pair"

    stream = spark.readStream.schema(events_batch.schema).parquet(d)
    clicks_s = stream.filter(F.col("event_type") == "click") \
        .select("user_id", "event_id", "ts")
    convs_s = stream.filter(F.col("event_type") == "purchase") \
        .select("user_id", "event_id", "ts")
    out = interval_join(clicks_s, convs_s)
    q = (out.writeStream.format("memory").queryName("ij_q")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = set(map(tuple, spark.sql(
        "SELECT user_id, l_event_id, r_event_id FROM ij_q").collect()))
    assert got == want
    # last-touch on the pairs: one row per conversion, positive gap
    lt = last_touch(interval_join(clicks_b, convs_b)).collect()
    convs_with_click = {p[2] for p in want}
    assert len(lt) == len(convs_with_click)
    assert all(r["gap_us"] > 0 for r in lt)


def test_spike_stream_batch_parity(spark, tmp_path_factory):
    """streaming/anomaly.py vs the oracle-checked rel_anomaly_hours
    rule on the same planted series, fed as THREE micro-batches
    (maxFilesPerTrigger=1) so hour counts split across batches and
    hours close across batch boundaries: the streamed spike set must
    equal the batch query's, every closed hour must carry a verdict,
    and the open (last) hour must not emit."""
    import os

    from pyspark.sql import functions as F

    from geoutils_spark.queries import SPARK_QUERIES
    from geoutils_spark.streaming.anomaly import spike_stream

    counts = [10, 11, 9, 10, 11, 9, 10, 11, 9, 10, 11, 9,
              10, 11, 9, 10, 11, 9, 10, 11, 9, 10, 11, 9,
              40, 13, 10]
    rows = []
    eid = 0
    for hr, c in enumerate(counts):
        for k in range(c):
            rows.append((eid, hr * 3600 * 1_000_000 + k * 1_000))
            eid += 1
    base = tmp_path_factory.mktemp("spikes")
    d = str(base / "events")
    os.makedirs(d, exist_ok=True)
    # three chunk files, split MID-HOUR so per-hour counts span batches
    cut1, cut2 = len(rows) // 3 + 7, 2 * len(rows) // 3 + 7
    chunks = [rows[:cut1], rows[cut1:cut2], rows[cut2:]]
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, "event_id long, us long").select(
            "event_id",
            F.timestamp_micros(F.col("us")).cast("timestamp_ntz").alias("ts"),
            F.lit(1).cast("long").alias("user_id"),
            F.lit("click").alias("event_type"),
            F.lit(1.0).alias("value"), F.lit("{}").alias("props"),
        ).coalesce(1).write.mode("append").parquet(d)

    batch = spark.read.parquet(d)
    tmp2 = str(base / "tbl")
    batch.write.mode("overwrite").parquet(os.path.join(tmp2,
                                                       "events.parquet"))
    want_spikes = {(r["event_type"], r["hr"]) for r in
                   SPARK_QUERIES["rel_anomaly_hours"](spark, tmp2).collect()}

    stream = spark.readStream.schema(batch.schema) \
        .option("maxFilesPerTrigger", 1).parquet(d)
    q = (spike_stream(stream).writeStream.format("memory")
         .queryName("spike_q").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM spike_q").collect()
    got_spikes = {(r["event_type"], r["hr"]) for r in got if r["is_spike"]}
    assert got_spikes == want_spikes and want_spikes == {("click", 24)}
    closed = {r["hr"] for r in got}
    assert closed == set(range(len(counts) - 1))   # all but the open hour
    assert len(got) == len(closed)                 # one verdict per hour

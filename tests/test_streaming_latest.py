"""Streaming keep-latest (streaming/latest.py): micro-batch upserts must
fold to exactly the batch operator's answer, replays must be no-ops, and
the change log must record only genuine improvements."""

from pyspark.sql import functions as F

from geoutils_spark.operators import corpus as CP
from geoutils_spark.streaming.latest import LatestKeeper


def _b(spark, rows):
    return spark.createDataFrame(rows, ["url_key", "doc_id", "warc_ts", "text"])


def _sorted(df):
    return sorted(tuple(r) for r in
                  df.select("url_key", "doc_id", "warc_ts", "text").collect())


def test_stream_matches_batch_operator(spark, tmp_path):
    keeper = LatestKeeper(str(tmp_path / "store"))
    b0 = _b(spark, [("a", 1, 100, "a1"), ("a", 2, 300, "a2"),
                    ("b", 3, 50, "b3")])
    b1 = _b(spark, [("a", 4, 200, "a4"),      # older than stored 300 -> loses
                    ("b", 5, 60, "b5"),       # beats 50
                    ("c", 6, 10, "c6")])      # new key
    b2 = _b(spark, [("a", 7, 300, "a7")])     # ts tie with id 2 -> id 7 wins
    union = b0.unionByName(b1).unionByName(b2)

    for i, b in enumerate([b0, b1, b2]):
        keeper.process_batch(b, i)

    want = _sorted(CP.keep_latest(union).drop("n_snapshots"))
    got = _sorted(keeper.current(spark))
    assert got == want
    assert [r[0:2] for r in got] == [("a", 7), ("b", 5), ("c", 6)]

    # change log: batch 1 must NOT contain key 'a' (a4 lost to a2)
    ch = keeper.changes(spark)
    by_batch = {(r["batch_id"], r["url_key"]) for r in ch.collect()}
    assert (1, "a") not in by_batch
    assert {(0, "a"), (0, "b"), (1, "b"), (1, "c"), (2, "a")} <= by_batch

    # at-least-once replay of a committed batch is a no-op
    n_snaps = spark.read.parquet(str(tmp_path / "store" / "snaps")).count()
    keeper.process_batch(b1, 1)
    assert spark.read.parquet(
        str(tmp_path / "store" / "snaps")).count() == n_snaps
    assert _sorted(keeper.current(spark)) == want


def test_compact_preserves_current(spark, tmp_path):
    keeper = LatestKeeper(str(tmp_path / "store"))
    for i in range(4):
        keeper.process_batch(
            _b(spark, [("k", 10 + i, 100 + (i % 2) * 50, f"t{i}")]), i)
    before = _sorted(keeper.current(spark))
    keeper.compact(spark)
    snaps = spark.read.parquet(str(tmp_path / "store" / "snaps"))
    assert snaps.count() == 1  # one row per key after compaction
    assert _sorted(keeper.current(spark)) == before


def test_store_side_never_shuffles(spark, tmp_path):
    """The per-batch winner lookup broadcasts the batch keys; the snaps
    store must join without an Exchange on its side."""
    keeper = LatestKeeper(str(tmp_path / "store"))
    keeper.process_batch(_b(spark, [("a", 1, 100, "x")]), 0)
    store = spark.read.parquet(str(tmp_path / "store" / "snaps"))
    best = _b(spark, [("a", 2, 200, "y")]).select("url_key")
    plan = (store.join(F.broadcast(best), on="url_key", how="leftsemi")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_crash_between_changes_and_snaps_is_exactly_once(spark, tmp_path):
    """r5 ADVICE: the appends run changes -> snaps -> marker. A crash in
    the middle window must not lose CDC rows (the old snaps-first order
    did: replay saw the stored winner tie and derived improved = empty)
    and the replay's byte-identical second changes append must collapse
    in changes()."""
    import pytest
    from pyspark.sql.readwriter import DataFrameWriter

    keeper = LatestKeeper(str(tmp_path / "store"))
    b0 = _b(spark, [("a", 1, 100, "a1"), ("b", 3, 50, "b3")])
    keeper.process_batch(b0, 0)
    b1 = _b(spark, [("a", 4, 200, "a4"), ("c", 6, 10, "c6")])

    real = DataFrameWriter.parquet
    def crash_on_snaps(self, path, *a, **kw):
        if path.endswith("snaps"):
            raise RuntimeError("simulated crash before snaps append")
        return real(self, path, *a, **kw)

    DataFrameWriter.parquet = crash_on_snaps
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            keeper.process_batch(b1, 1)
    finally:
        DataFrameWriter.parquet = real

    # pre-replay state: changes landed, snaps + marker did not
    raw_changes = spark.read.parquet(str(tmp_path / "store" / "changes"))
    assert raw_changes.filter("batch_id = 1").count() == 2
    assert spark.read.parquet(
        str(tmp_path / "store" / "snaps")).count() == 2  # batch 0 only

    keeper.process_batch(b1, 1)  # the at-least-once replay

    # snaps exactly once; raw changes holds the duplicate pair; the
    # changes() view collapses it
    assert spark.read.parquet(
        str(tmp_path / "store" / "snaps")).count() == 4
    raw_changes = spark.read.parquet(str(tmp_path / "store" / "changes"))
    assert raw_changes.filter("batch_id = 1").count() == 4
    ch = keeper.changes(spark)
    assert ch.filter("batch_id = 1").count() == 2
    want = _sorted(CP.keep_latest(b0.unionByName(b1)).drop("n_snapshots"))
    assert _sorted(keeper.current(spark)) == want
    # a further replay of the committed batch is a no-op
    keeper.process_batch(b1, 1)
    assert ch.filter("batch_id = 1").count() == 2

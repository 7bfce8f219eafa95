from datetime import datetime

from pyspark.sql import functions as F

from geoutils_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_basic(spark):
    trades = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:05"), "t1"),
         (1, _ts("2024-01-01 10:00:00"), "t0"),
         (1, _ts("2024-01-01 09:59:59"), "tearly"),
         (2, _ts("2024-01-01 10:00:10"), "t2")],
        "key long, ts timestamp, trade string")
    quotes = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 100.0),
         (1, _ts("2024-01-01 10:00:04"), 101.0),
         (2, _ts("2024-01-01 10:00:20"), 200.0)],
        "key long, qts timestamp, px double")
    out = {r.trade: r.px for r in asof_join(
        trades, quotes, on="key", left_ts="ts", right_ts="qts",
        value_cols=["px"]).collect()}
    assert out["tearly"] is None          # no prior quote
    assert out["t0"] == 100.0             # tie: quote at exact ts visible
    assert out["t5" if False else "t1"] == 101.0
    assert out["t2"] is None              # key 2's quote is in the future


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:10:00"), "a")], "key long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 5.0)], "key long, qts timestamp, v double")
    hit = asof_join(left, right, "key", "ts", "qts", ["v"],
                    tolerance_s=700).collect()[0]
    miss = asof_join(left, right, "key", "ts", "qts", ["v"],
                     tolerance_s=300).collect()[0]
    assert hit.v == 5.0 and miss.v is None


def test_asof_matches_bruteforce(spark):
    import random

    rnd = random.Random(7)
    lrows = [(k, _ts(f"2024-01-01 10:{m:02d}:{s:02d}"), i)
             for i, (k, m, s) in enumerate(
                 (rnd.randrange(3), rnd.randrange(60), rnd.randrange(60))
                 for _ in range(200))]
    rrows = [(k, _ts(f"2024-01-01 10:{m:02d}:{s:02d}"), float(i))
             for i, (k, m, s) in enumerate(
                 (rnd.randrange(3), rnd.randrange(60), rnd.randrange(60))
                 for _ in range(80))]
    # dedupe right on (key, ts): keep max value (determinism)
    best = {}
    for k, t, v in rrows:
        best[(k, t)] = max(best.get((k, t), -1), v)
    rrows = [(k, t, v) for (k, t), v in best.items()]
    left = spark.createDataFrame(lrows, "key long, ts timestamp, lid long")
    right = spark.createDataFrame(rrows, "key long, qts timestamp, v double")
    got = {r.lid: r.v for r in asof_join(
        left, right, "key", "ts", "qts", ["v"]).collect()}
    for k, t, lid in lrows:
        cand = [(rt, v) for rk, rt, v in rrows if rk == k and rt <= t]
        want = max(cand)[1] if cand else None
        assert got[lid] == want, (lid, got[lid], want)


def test_asof_null_value_passthrough(spark):
    """A matched right row whose value is NULL must yield NULL (the latest
    ROW wins), not an older row's value (ADVICE r1)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:10"), "a")], "key long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 5.0),
         (1, _ts("2024-01-01 10:00:05"), None)],
        "key long, qts timestamp, v double")
    out = asof_join(left, right, "key", "ts", "qts", ["v"]).collect()[0]
    assert out.v is None


def test_asof_subsecond_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00.900"), "a")],
        "key long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00.500"), 7.0)],
        "key long, qts timestamp, v double")
    hit = asof_join(left, right, "key", "ts", "qts", ["v"],
                    tolerance_s=0.5).collect()[0]
    miss = asof_join(left, right, "key", "ts", "qts", ["v"],
                     tolerance_s=0.2).collect()[0]
    assert hit.v == 7.0 and miss.v is None


def test_asof_map_value_column(spark):
    """Unorderable (map) value columns must still work — the deterministic
    struct tiebreak degrades gracefully (code-review r2 finding)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:10"), "a")], "key long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), {"k": "v1"}),
         (1, _ts("2024-01-01 10:00:05"), {"k": "v2"})],
        "key long, qts timestamp, attrs map<string,string>")
    out = asof_join(left, right, "key", "ts", "qts", ["attrs"]).collect()[0]
    assert out.attrs == {"k": "v2"}  # latest prior row's map

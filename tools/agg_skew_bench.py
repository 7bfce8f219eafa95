"""Hot-key aggregation skew bench: measure the window -> partial-agg
rewrite that r4 applied to first/latest-occurrence selection
(`dedup_paragraphs`, `keep_latest`).

Fixture: ``n_rows`` snapshot rows where ``hot_fraction`` share ONE key (a
crawler-trap URL / boilerplate paragraph — the webtext skew case). Times
two semantically identical plans on local[N]:

  1. window       — row_number() OVER (PARTITION BY key ORDER BY ts DESC,
                    id DESC) == 1: every copy of the hot key lands in ONE
                    task that buffers and sorts the whole group (windows
                    have no partial aggregation)
  2. partial agg  — groupBy(key).agg(max_by(payload, (ts, id))): map-side
                    combine collapses each task's copies of the hot key to
                    one candidate before the exchange

Row-for-row parity asserted (same winners). Appends BENCH/SKEW.md.
"""

from __future__ import annotations

import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import sys

    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    n_rows = int(os.environ.get("AGG_SKEW_ROWS", "20000000"))
    hot = float(os.environ.get("AGG_SKEW_HOT", "0.5"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("agg_skew_bench")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    hot_mod = int(1 / (1 - hot)) if hot < 1 else 1
    snaps = spark.range(n_rows).select(
        # every row whose id % hot_mod != 0 collapses onto key 'HOT'
        F.when(F.col("id") % hot_mod == 0,
               F.concat(F.lit("k"), (F.col("id") % 100000).cast("string")))
        .otherwise(F.lit("HOT")).alias("url_key"),
        F.col("id").alias("doc_id"),
        (F.col("id") * 7919 % 1000000).alias("warc_ts"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    ).localCheckpoint()  # materialize once; both plans read the same input

    def winners_window():
        w = Window.partitionBy("url_key").orderBy(
            F.col("warc_ts").desc(), F.col("doc_id").desc())
        return (snaps.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1).drop("rn"))

    def winners_agg():
        from geoutils_spark.operators.corpus import keep_latest

        return keep_latest(snaps).drop("n_snapshots")

    results = {}
    for name, fn in (("window", winners_window), ("partial_agg", winners_agg)):
        best = 1e18
        for _ in range(3):
            t0 = time.time()
            n = fn().count()
            best = min(best, time.time() - t0)
        results[name] = (round(best, 3), n)
        print(f"{name}: best {best:.3f}s, {n} winners")

    # parity: identical winner sets
    a = winners_window().select("url_key", "doc_id")
    b = winners_agg().select("url_key", "doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    (tw, n), (ta, _) = results["window"], results["partial_agg"]
    speedup = tw / ta
    print(f"speedup window -> partial_agg: {speedup:.2f}x")

    with open(os.path.join(REPO, "BENCH", "SKEW.md"), "a") as f:
        f.write(f"""
## Hot-key latest-occurrence selection ({time.strftime('%Y-%m-%d %H:%M')})

{n_rows:,} snapshot rows, {hot:.0%} on ONE key, local[{cpus}], best of 3,
winners identical ({n:,} rows both plans):

| plan | best wall (s) |
|---|---|
| row_number window (one task owns the hot key) | {tw} |
| groupBy + max_by partial agg (r4 `keep_latest`/`dedup_paragraphs` shape) | {ta} |

**{speedup:.2f}x** from map-side combine at {hot:.0%} hot-share; the gap
widens with the hot share and executor count (the window plan's hot task
is serial regardless of cluster size, the agg plan's combine is per-task).
""")
    print("appended BENCH/SKEW.md")
    spark.stop()


if __name__ == "__main__":
    main()

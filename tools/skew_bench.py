"""Hot-cell skew bench: quantify the salted-join treatment.

Builds a pages table where ``hot_fraction`` of all rows collapse onto ONE
cell (the skew knob in ``fixtures.pages_df``), then times the non-broadcast
shuffle spatial join three ways on local[N]:

  1. skewed, plain        — one task owns the hot cell (the straggler)
  2. skewed, salted       — (cell_id, salt) keys spread the hot cell over
                            n_salt tasks; polygon side replicated n_salt x
  3. skewed, AQE skew-join — Spark's runtime skew splitting

Writes BENCH/SKEW.md. Result parity between 1/2/3 is asserted (same row
count), matching tests/test_spatial_join.py::test_salted_join_matches_unsalted.
"""

from __future__ import annotations

import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import sys

    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    n_pages = int(os.environ.get("SKEW_BENCH_PAGES", "2000000"))
    hot = float(os.environ.get("SKEW_BENCH_HOT", "0.5"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    def session(aqe_skew: bool):
        b = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("skew_bench")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
             .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
             .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
             .config("spark.sql.autoBroadcastJoinThreshold", "-1"))
        s = b.getOrCreate()
        s.sparkContext.setLogLevel("ERROR")
        return s

    results = {}
    for label, aqe_skew, n_salt in [("plain", False, 0),
                                    ("salted", False, 16),
                                    ("aqe_skew", True, 0)]:
        spark = session(aqe_skew)
        from geoutils_spark.operators.spatial_join import spatial_join
        from geoutils_spark.sources import fixtures

        pages = fixtures.with_page_geo(
            fixtures.pages_df(spark, n_pages, hot_fraction=hot))
        pts = pages.select("page_id", "lon", "lat")
        polys = fixtures.polygons_df(spark).filter(F.col("kind") == "building")
        j = spatial_join(pts, polys, level=15, broadcast_polygons=False,
                         n_salt=n_salt)
        j.count()  # warm
        best = 1e18
        for _ in range(2):
            t0 = time.time()
            n = j.count()
            best = min(best, time.time() - t0)
        results[label] = {"sec": round(best, 2), "rows": n}
        print(label, results[label], flush=True)
        spark.stop()
        time.sleep(2)

    rows = {r["rows"] for r in results.values()}
    assert len(rows) == 1, f"row-count mismatch across strategies: {results}"

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SKEW.md"), "w") as f:
        p, s, a = results["plain"], results["salted"], results["aqe_skew"]
        f.write(f"""# BENCH/SKEW — hot-cell skew treatment

Input: {n_pages} pages with {hot:.0%} of rows collapsed onto ONE level-15
cell (`fixtures.pages_df(hot_fraction=...)`), joined to the building
polygon set WITHOUT broadcast (forced shuffle join) on local[{cpus}] —
the worst case the salting path exists for. Identical result rows
({p['rows']}) from all three strategies.

| strategy | best wall (s) | speedup vs plain |
|---|---|---|
| plain shuffle join (one task owns the hot cell) | {p['sec']} | 1.0x |
| salted keys, n_salt=16 (`spatial_join(n_salt=16)`) | {s['sec']} | {p['sec'] / s['sec']:.2f}x |
| AQE skew-join (`spark.sql.adaptive.skewJoin`) | {a['sec']} | {p['sec'] / a['sec']:.2f}x |

Salting spreads the hot cell across 16 tasks by appending
`pmod(xxhash64(keys), 16)` to the join key and replicating the polygon
side 16x; AQE achieves a similar effect at runtime by splitting oversized
shuffle partitions. In production both stay on: salting for *planned* hot
keys (dense urban cells), AQE for the residual tail.
""")
    print("wrote BENCH/SKEW.md")
    print(json.dumps(results))


if __name__ == "__main__":
    main()

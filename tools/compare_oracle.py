"""Self-hosted mini-driver: run every queries() entry against its DuckDB
oracle at sf0.01 and compare row count, schema names, and order-insensitive
values (exact for ints/strings, near-exact report for doubles).

Usage:
    PYTHONPATH=/root/repo python tools/compare_oracle.py [query ...]
    PYTHONPATH=/root/repo python tools/compare_oracle.py --json OUT.json

--json writes a driver-shaped artifact (one object per query with
rows_match/schema_match/hash_match/spark_rows/oracle_rows/err) covering
EVERY registered query, so a round's correctness snapshot can evidence
the full surface rather than the driver's sample. Oracle-less queries
record hash_match=null (rows-only).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"schema spark={s_cols} duck={d_cols}")
        return problems
    if problems:
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(float)
            bv = bv.astype(float)
            exact = np.array_equal(av, bv, equal_nan=True)
            if not exact:
                close = np.allclose(av, bv, rtol=1e-12, atol=1e-12, equal_nan=True)
                problems.append(
                    f"col {c}: float {'CLOSE-not-exact' if close else 'MISMATCH'}"
                    + ("" if close else f" maxdiff={np.nanmax(np.abs(av - bv)):.3e}")
                )
        else:
            if not (pd.Series(av).fillna('\0') == pd.Series(bv).fillna('\0')).all():
                bad = (pd.Series(av).fillna('\0') != pd.Series(bv).fillna('\0')).sum()
                problems.append(f"col {c}: {bad} mismatched values")
    return problems


def main():
    import __spark_entry__ as E
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    only = args
    artifact: dict[str, dict] = {}
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            artifact[name] = {"rows_match": False, "schema_match": False,
                              "hash_match": False, "spark_rows": None,
                              "oracle_rows": None, "err": f"spark: {e}"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows={len(sdf)} (no oracle, rows-only)")
            artifact[name] = {"rows_match": len(sdf) > 0,
                              "schema_match": True, "hash_match": None,
                              "spark_rows": len(sdf), "oracle_rows": None,
                              "err": None}
            n_weak += 1
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            artifact[name] = {"rows_match": False, "schema_match": False,
                              "hash_match": False, "spark_rows": len(sdf),
                              "oracle_rows": None, "err": f"duckdb: {e}"}
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        dt = time.time() - t0
        artifact[name] = {
            "rows_match": len(sdf) == len(ddf),
            "schema_match": sorted(sdf.columns) == sorted(ddf.columns),
            "hash_match": not problems,
            "spark_rows": len(sdf), "oracle_rows": len(ddf), "err": None,
        }
        if problems:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({dt:.1f}s): rows={len(sdf)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(artifact, f, indent=2)
        print(f"wrote {json_out} ({len(artifact)} queries)")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

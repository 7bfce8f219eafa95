"""End-to-end corpus preparation (operators/corpus.py): each planted
defect class is dropped by exactly the stage that owns it, survivors pass
through unharmed, and the split assignment is stable."""

from pyspark.sql import functions as F

from geoutils_spark.operators import corpus as CP
from geoutils_spark.sources import fixtures


def test_prepare_corpus_funnel(spark):
    docs = fixtures.corpus_smoke_df(spark, 3000)
    benchmarks = fixtures.benchmark_docs_df(spark)
    kept, counts = CP.prepare_corpus(docs, benchmarks)

    # monotone funnel, and the quality gate dropped the planted junk docs
    assert (counts["input"] > counts["after_quality"]
            >= counts["after_exact_dedup"] >= counts["after_near_dedup"]
            >= counts["after_decontaminate"] > 0)
    # exact dedup removed the planted identical copies (one keeper stays;
    # ~1/5 of docs are copied, minus the %11 junk copies quality drops)
    assert counts["after_exact_dedup"] <= counts["after_quality"] * 0.88
    # near-dup dedup removed a meaningful share of the 3-token mutants
    assert counts["after_near_dedup"] < counts["after_exact_dedup"]
    # decontamination dropped the benchmark-overlapping docs
    assert counts["after_decontaminate"] < counts["after_near_dedup"]
    # output schema carries the stage annotations
    assert {"doc_id", "text", "lang_pred", "n_pii", "split"} <= set(kept.columns)
    # split shares roughly 90/5/5 and no nulls
    splits = {r["split"]: r["n"] for r in
              kept.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert None not in splits
    total = sum(splits.values())
    assert total == counts["after_decontaminate"]
    assert 0.80 <= splits["train"] / total <= 0.97


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "same words here"), (7, "same words here"), (3, "other words")],
        ["doc_id", "text"])
    kept = CP.dedup_exact(df)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]


def test_redact_counts_and_masks(spark):
    df = spark.createDataFrame(
        [(1, "write to a@b.example now"), (2, "clean text")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in CP.redact(df).collect()}
    assert out[1]["n_pii"] == 1 and "<EMAIL>" in out[1]["text"]
    assert out[2]["n_pii"] == 0 and out[2]["text"] == "clean text"


def test_corpus_write_resume_by_split(spark, tmp_path):
    """The job's --out path: split partitions get lineage manifests
    (carrying the stage counts that produced them) and a resumed run
    skips every completed split (jobs/corpus_prep.py)."""
    from geoutils_spark.plans import manifests as M

    docs = fixtures.corpus_smoke_df(spark, 400)
    kept, counts = CP.prepare_corpus(docs, fixtures.benchmark_docs_df(spark))
    out = str(tmp_path / "corpus")
    summary = M.write_with_manifests(
        kept, out, "split", lineage={"job": "corpus_prep",
                                     "stage_counts": counts})
    done = M.read_manifests(out)
    assert set(done) == {r["split"] for r in kept.select("split").distinct()
                         .collect()}
    assert sum(m["n_rows"] for m in done.values()) == counts[
        "after_decontaminate"] == summary["rows_written"]
    assert done["train"]["lineage"]["stage_counts"]["input"] == counts["input"]

    again = M.write_with_manifests(kept, out, "split", resume=True)
    assert again["partitions_written"] == 0
    assert again["partitions_skipped"] == len(done)
    assert spark.read.parquet(out).count() == counts["after_decontaminate"]


def test_dedup_paragraphs_global_first_occurrence(spark):
    df = spark.createDataFrame(
        [(1, "alpha\nshared\nbeta"),
         (2, "shared\ngamma"),
         (3, "alpha\nbeta"),
         (4, "shared"),
         (5, "x\n\nx\ny")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in CP.dedup_paragraphs(df).collect()}
    # doc 1 is first everywhere: survives whole
    assert out[1]["text"] == "alpha\nshared\nbeta" and out[1]["n_paras"] == 3
    # doc 2 loses 'shared' (doc 1 owns it), keeps order of the rest
    assert out[2]["text"] == "gamma" and out[2]["n_paras"] == 1
    # docs 3 and 4 lose every paragraph and vanish
    assert 3 not in out and 4 not in out
    # within-doc repeat dedups too; empty segments never count
    assert out[5]["text"] == "x\ny" and out[5]["n_paras"] == 2


def test_hash_split_stable_under_growth(spark):
    small = spark.range(500).select(F.col("id").alias("doc_id"))
    big = spark.range(1500).select(F.col("id").alias("doc_id"))
    s = {r["doc_id"]: r["split"] for r in CP.hash_split(small).collect()}
    b = {r["doc_id"]: r["split"] for r in CP.hash_split(big).collect()}
    assert all(b[k] == v for k, v in s.items())

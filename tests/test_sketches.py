"""Cardinality-sketch invariants: accuracy, partition-independence, and the
register-merge property that makes HLL/KMV usable as distributed combiners."""
import pytest
from pyspark.sql import functions as F

from geoutils_spark.functions import sketches as SK


@pytest.fixture(scope="module")
def keys(spark):
    # 20k rows, 5k distinct keys, deterministic
    return spark.range(20000).select((F.col("id") % 5000).alias("k"))


def test_hll_accuracy(spark, keys):
    est = SK.hll_distinct(keys, "k").collect()[0]["hll_estimate"]
    # m=256 => relative std error ~1.04/16 = 6.5%; allow 3 sigma
    assert abs(est - 5000) / 5000 < 0.20, est


def test_kmv_accuracy(spark, keys):
    est = SK.kmv_distinct(keys, "k", 256).collect()[0]["kmv_estimate"]
    assert abs(est - 5000) / 5000 < 0.20, est


def test_partition_independence(spark, keys):
    a = SK.hll_distinct(keys.repartition(1), "k").collect()[0]
    b = SK.hll_distinct(keys.repartition(17), "k").collect()[0]
    assert a["reg_sum"] == b["reg_sum"]
    assert a["n_buckets"] == b["n_buckets"]
    assert a["hll_estimate"] == b["hll_estimate"]
    ka = SK.kmv_distinct(keys.repartition(1), "k", 64).collect()[0]
    kb = SK.kmv_distinct(keys.repartition(17), "k", 64).collect()[0]
    assert ka["kth_hash"] == kb["kth_hash"]


def test_hll_merge_is_register_max(spark, keys):
    """Sketching two halves and MAX-merging their registers must equal the
    sketch of the union — the property that lets cohort sketches combine
    without touching raw keys."""
    left = keys.filter(F.col("k") < 2500)
    right = keys.filter(F.col("k") >= 2000)  # overlapping halves

    def registers(df):
        return (
            df.select(
                SK.hll_bucket_col(F.col("k")).alias("bucket"),
                SK.hll_rho_col(F.col("k")).alias("rho"),
            )
            .groupBy("bucket")
            .agg(F.max("rho").alias("m_j"))
        )

    merged = (
        registers(left)
        .unionByName(registers(right))
        .groupBy("bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    whole = registers(keys)
    m = {r["bucket"]: r["m_j"] for r in merged.collect()}
    w = {r["bucket"]: r["m_j"] for r in whole.collect()}
    assert m == w


def test_hll_small_range_linear_counting(spark):
    """Tiny cardinalities take the linear-counting branch and stay accurate
    (raw HLL is biased low there)."""
    small = spark.range(30).select(F.col("id").alias("k"))
    est = SK.hll_distinct(small, "k").collect()[0]["hll_estimate"]
    assert abs(est - 30) / 30 < 0.15, est


def test_rho_algebra_matches_bit_math(spark):
    """String leading-zero rank == arithmetic leading-zero rank on the same
    md5 prefix, checked exhaustively on 2000 keys."""
    import hashlib

    rows = spark.range(2000).select(F.col("id").alias("k"))
    got = {
        r["k"]: (r["b"], r["rho"])
        for r in rows.select(
            "k",
            SK.hll_bucket_col(F.col("k")).alias("b"),
            SK.hll_rho_col(F.col("k")).alias("rho"),
        ).collect()
    }
    for k in range(2000):
        h = hashlib.md5(str(k).encode()).hexdigest()
        bucket = int(h[:2], 16)
        word = int(h[2 : 2 + SK.RANK_HEX_DIGITS], 16)
        nbits = SK.RANK_HEX_DIGITS * 4
        rho = nbits + 1 if word == 0 else nbits - word.bit_length() + 1
        assert got[k] == (bucket, rho), (k, got[k], (bucket, rho))


# ---------------------------------------------------------------- count-min

def _cm_skewed(spark):
    """Zipf-ish: key k appears ~1000/(k+1) times, keys 0..99."""
    return (
        spark.range(100)
        .select(F.col("id").alias("k"),
                F.explode(F.sequence(F.lit(1), (F.lit(1000) / (F.col("id") + 1)).cast("int")))
                .alias("_"))
        .select("k")
    )


def test_cm_never_underestimates(spark):
    """The defining Count-Min guarantee: estimate >= true count, always."""
    df = _cm_skewed(spark)
    sk = SK.cm_sketch(df, "k")
    probes = spark.range(120).select(F.col("id").alias("k"))  # 100 seen + 20 not
    est = {r["k"]: r["cm_estimate"]
           for r in SK.cm_estimate(sk, probes, "k").collect()}
    exact = {r["k"]: r["c"]
             for r in df.groupBy("k").agg(F.count("*").alias("c")).collect()}
    for k in range(120):
        assert est[k] >= exact.get(k, 0), (k, est[k], exact.get(k, 0))
    # the heavy hitters are found near-exactly (collisions add little)
    assert est[0] <= exact[0] * 1.2


def test_cm_merge_is_cellwise_sum(spark):
    """Sketch(A ∪ B) == cell-wise sum of Sketch(A) + Sketch(B) — the
    mergeability that lets cohort sketches combine without raw data."""
    a = spark.range(0, 400).select(F.col("id").alias("k"))
    b = spark.range(200, 600).select(F.col("id").alias("k"))
    both = SK.cm_sketch(a.unionAll(b), "k")
    merged = (
        SK.cm_sketch(a, "k").unionAll(SK.cm_sketch(b, "k"))
        .groupBy("j", "cell").agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    lhs = {(r["j"], r["cell"]): r["cnt"] for r in both.collect()}
    rhs = {(r["j"], r["cell"]): r["cnt"] for r in merged.collect()}
    assert lhs == rhs


def test_cm_bounded_size(spark):
    """The sketch never exceeds depth * width rows, whatever the input."""
    df = spark.range(20000).select((F.col("id") % 5000).alias("k"))
    assert SK.cm_sketch(df, "k").count() <= SK.CM_DEPTH * SK.CM_WIDTH


# ------------------------------------------------------------ log2 quantiles

def test_log2_bin_edges(spark):
    vals = [(0,), (1,), (2,), (3,), (4,), (1023,), (1024,)]
    got = {r["v"]: r["b"] for r in
           spark.createDataFrame(vals, ["v"]).select(
               "v", SK.log2_bin_col(F.col("v")).alias("b")).collect()}
    assert got == {0: 1, 1: 1, 2: 2, 3: 2, 4: 3, 1023: 10, 1024: 11}


def test_log2_quantiles_within_bin_error(spark):
    """Estimates land inside the true value's bin (factor-2 guarantee)."""
    df = spark.range(1, 10001).select(F.col("id").alias("v"))
    got = {r["q"]: r["est"] for r in
           SK.log2_quantiles(SK.log2_hist(df, "v"), qs=(50, 90, 99)).collect()}
    for q, true in ((50, 5000), (90, 9000), (99, 9900)):
        est = got[q]
        assert true / 2 <= est <= true * 2, (q, est, true)
    # monotone in q
    assert got[50] <= got[90] <= got[99]


def test_log2_hist_merge_is_binwise_sum(spark):
    a = spark.range(0, 5000).select(F.col("id").alias("v"))
    b = spark.range(3000, 20000).select(F.col("id").alias("v"))
    both = SK.log2_hist(a.unionAll(b), "v")
    merged = (
        SK.log2_hist(a, "v").unionAll(SK.log2_hist(b, "v"))
        .groupBy("bin", "lo", "width").agg(F.sum("cnt").cast("long").alias("cnt"))
        .select("bin", "cnt", "lo", "width")
    )
    assert sorted(map(tuple, both.collect())) == sorted(map(tuple, merged.collect()))


def test_bloom_no_false_negatives_and_low_fpr(spark):
    from pyspark.sql import functions as F
    members = spark.range(300).select(F.col("id").alias("k"))
    sk = SK.bloom_build(members, "k")
    probes = spark.range(3000).select(F.col("id").alias("k"))
    got = {r["k"]: r["in_bloom"] for r in
           SK.bloom_contains(sk, probes, "k").collect()}
    # every member found
    assert all(got[i] == 1 for i in range(300))
    # false-positive rate among the 2700 non-members stays near theory
    # ((1-exp(-k*n/m))^k ~ 0.5% at n=300, m=4096, k=4); generous bound
    fp = sum(got[i] for i in range(300, 3000))
    assert fp / 2700 < 0.05

def test_bloom_cohort_merge_is_bit_or(spark):
    from pyspark.sql import functions as F
    a = spark.range(0, 100).select(F.col("id").alias("k"))
    b = spark.range(100, 200).select(F.col("id").alias("k"))
    both = spark.range(0, 200).select(F.col("id").alias("k"))
    merged = (
        SK.bloom_build(a, "k").union(SK.bloom_build(b, "k"))
        .groupBy("word").agg(F.expr("bit_or(bits)").cast("long").alias("bits"))
    )
    direct = SK.bloom_build(both, "k")
    assert ({(r["word"], r["bits"]) for r in merged.collect()}
            == {(r["word"], r["bits"]) for r in direct.collect()})

def test_bloom_masks_fit_positive_long(spark):
    # 32-bit masks inside BIGINT words: every mask is positive and the
    # word index stays inside 16^hexd/32
    from pyspark.sql import functions as F
    members = spark.range(5000).select(F.col("id").alias("k"))
    addr = members.select(
        F.explode(F.array(*[SK.bloom_addr_col(F.col("k"), j)
                            for j in range(SK.BLOOM_HASHES)])).alias("a"))
    stats = addr.agg(
        F.min("a.mask").alias("mn"), F.max("a.mask").alias("mx"),
        F.max("a.word").alias("mw")).collect()[0]
    assert stats["mn"] >= 1 and stats["mx"] <= 1 << 31
    assert stats["mw"] < (16 ** SK.BLOOM_HEXD) // 32

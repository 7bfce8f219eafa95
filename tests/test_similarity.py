import pytest
from pyspark.sql import functions as F

from geoutils_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def vectors(spark):
    import math

    rows = []
    for vid in range(80):
        # three loose clusters in 64-dim space + per-vector jitter
        c = vid % 3
        v = [
            math.cos(0.07 * (c + 1) * (d + 1)) + 0.01 * math.sin(vid * 31 + d)
            for d in range(64)
        ]
        rows.append((vid, v))
    return spark.createDataFrame(rows, "vec_id long, e array<double>")


def _queries(vectors):
    return vectors.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))


def test_bruteforce_topk(vectors):
    out = SIM.cosine_topk(vectors, _queries(vectors), k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 10, 20, 30, 40, 50, 60, 70}
    for q, rows in by_q.items():
        assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == [1, 2, 3]
        # nearest neighbors of a cluster member are cluster-mates
        for r in rows:
            assert r.neighbor_id % 3 == q % 3


def test_ivf_matches_bruteforce_with_full_probe(vectors):
    cents = [
        (int(r.vec_id), list(r.e))
        for r in vectors.filter(F.col("vec_id") < 3).collect()
    ]
    q = _queries(vectors)
    exact = {(r.query_id, r.rank): r.neighbor_id
             for r in SIM.cosine_topk(vectors, q, k=3).collect()}
    # nprobe == all centroids -> every bucket searched -> exact result
    ivf = {(r.query_id, r.rank): r.neighbor_id
           for r in SIM.ivf_topk(vectors, q, cents, k=3, nprobe=3).collect()}
    assert ivf == exact


def test_ivf_recall_with_partial_probe(vectors):
    cents = [
        (int(r.vec_id), list(r.e))
        for r in vectors.filter(F.col("vec_id") < 3).collect()
    ]
    q = _queries(vectors)
    exact = {}
    for r in SIM.cosine_topk(vectors, q, k=3).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    ivf = {}
    for r in SIM.ivf_topk(vectors, q, cents, k=3, nprobe=1).collect():
        ivf.setdefault(r.query_id, set()).add(r.neighbor_id)
    # clusters align with centroids -> single-probe recall stays high
    hits = sum(len(exact[q] & ivf.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.8


def test_dot_chain_matches_python(spark):
    a = [float(i + 1) for i in range(64)]
    b = [float(2 * i - 3) for i in range(64)]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = df.select(SIM.dot_chain_col(F.col("a"), F.col("b")).alias("d")).collect()[0].d
    want = 0.0
    for x, y in zip(a, b):
        want += x * y
    assert got == want


def test_trained_centroids_improve_recall(vectors, spark):
    """Lloyd's-trained centroids recover the 3 latent clusters and give
    >= the recall of arbitrary-vector centroids at nprobe=1."""
    q = _queries(vectors)
    exact = {}
    for r in SIM.cosine_topk(vectors, q, k=3).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(cents):
        ivf = {}
        for r in SIM.ivf_topk(vectors, q, cents, k=3, nprobe=1).collect():
            ivf.setdefault(r.query_id, set()).add(r.neighbor_id)
        hits = sum(len(exact[k] & ivf.get(k, set())) for k in exact)
        return hits / sum(len(v) for v in exact.values())

    arbitrary = [(int(r.vec_id), list(r.e))
                 for r in vectors.filter(F.col("vec_id") < 3).collect()]
    trained = SIM.train_centroids(vectors, k=3, iters=3)
    r_arb, r_tr = recall(arbitrary), recall(trained)
    assert r_tr >= r_arb
    assert r_tr >= 0.9  # clusters are well separated; training must find them

    # determinism: same input -> identical centroids
    again = SIM.train_centroids(vectors, k=3, iters=3)
    assert trained == again


def test_pq_trainer_self_codes(spark):
    """A codebook trainer vector quantizes to ITSELF in every subspace
    (code = its own index, distortion exactly 0.0); non-trainers get
    valid codes in [0, K) with nonnegative distortion."""
    from pyspark.sql import functions as F

    from geoutils_spark.operators.similarity import pq_codes

    v = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id",
                F.transform("embedding", lambda x: x.cast("double")).alias("e"))
    tr_rows = sorted(v.filter(F.col("vec_id") % 31 == 3).collect(),
                     key=lambda r: r["vec_id"])
    trainers = [[float(x) for x in r["e"]] for r in tr_rows]
    k = len(trainers)
    assert k >= 2
    out = {r["vec_id"]: r for r in pq_codes(v, trainers, m=8).collect()}
    for j, r in enumerate(tr_rows):
        got = out[r["vec_id"]]
        assert got["codes"] == ",".join([str(j)] * 8)
        assert got["distortion"] == 0.0
    for vid, r in out.items():
        parts = [int(x) for x in r["codes"].split(",")]
        assert len(parts) == 8 and all(0 <= p < k for p in parts)
        assert r["distortion"] >= 0.0


def test_pq_backends_bit_identical(spark):
    """The arrow backend (numpy kernel, dim-ordered elementwise
    accumulation) must reproduce the catalyst backend (HOF argmin over
    the broadcast codebook literal) BIT-FOR-BIT: same codes (incl. tie
    rule -> lowest j) and same distortion doubles, on random vectors and
    on an engineered exact tie."""
    import numpy as np

    from geoutils_spark.operators.similarity import pq_code_array, pq_codes

    rng = np.random.RandomState(11)
    n, dim, m, k = 200, 64, 8, 17
    V = rng.randn(n, dim)
    trainers = [list(map(float, rng.randn(dim))) for _ in range(k)]
    trainers.append(list(trainers[0]))  # duplicate centroid: exact tie
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(n)],
        "vec_id long, e array<double>")
    a = pq_codes(df, trainers, m=m, backend="arrow").orderBy("vec_id").collect()
    c = pq_codes(df, trainers, m=m, backend="catalyst").orderBy("vec_id").collect()
    for ra, rc in zip(a, c):
        assert ra["codes"] == rc["codes"]
        assert ra["distortion"] == rc["distortion"]
    assert not any(str(k) in r["codes"].split(",") for r in a), \
        "tie must break to the LOWER duplicate index"
    aa = pq_code_array(df, trainers, m=m, backend="arrow").orderBy("vec_id").collect()
    cc = pq_code_array(df, trainers, m=m, backend="catalyst").orderBy("vec_id").collect()
    for ra, rc in zip(aa, cc):
        assert list(ra["codes"]) == list(rc["codes"])


def test_pq_adc_equals_reconstruction_distance(spark):
    """ADC(q, v) is BY DEFINITION ||q - reconstruct(v)||^2: the looked-up
    subspace distances are exact query-to-centroid distances. Check the
    operator's folded value against a numpy reconstruction for every
    (query, neighbor) it returns."""
    import numpy as np
    from pyspark.sql import functions as F

    from geoutils_spark.operators.similarity import (
        pq_adc_topk, pq_code_array)

    v = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id",
                F.transform("embedding", lambda x: x.cast("double")).alias("e"))
    rows = sorted(v.filter(F.col("vec_id") % 31 == 3).collect(),
                  key=lambda r: r["vec_id"])
    trainers = [[float(x) for x in r["e"]] for r in rows]
    queries = [(int(r["vec_id"]), [float(x) for x in r["e"]])
               for r in v.filter(F.col("vec_id") % 50 == 0).collect()]
    codes_df = pq_code_array(v, trainers, m=8)
    out = pq_adc_topk(codes_df, queries, trainers, k=5, m=8).collect()
    assert len(out) == 5 * len(queries)
    cb = np.array(trainers)
    codes = {r["vec_id"]: r["codes"] for r in codes_df.collect()}
    qv = dict(queries)
    for r in out:
        rec = np.concatenate([cb[c][s*8:(s+1)*8]
                              for s, c in enumerate(codes[r["neighbor_id"]])])
        want = float(np.sum((np.array(qv[r["query_id"]]) - rec) ** 2))
        assert abs(r["adc"] - want) < 1e-5, (r, want)
    # ranks are contiguous 1..5 per query
    from collections import defaultdict
    per_q = defaultdict(list)
    for r in out:
        per_q[r["query_id"]].append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())

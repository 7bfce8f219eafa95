"""Similarity search over embedding columns: brute-force cosine top-k and an
IVF (inverted-file) bucketed ANN variant.

Composes the same way the engine's kNN does (operators/knn.py; SURVEY.md
§2.5): candidate generation via an equi-join on a coarse bucket key, exact
scoring, windowed top-k. For IVF the bucket is the nearest-centroid id — the
embedding-space analog of the spatial cell index (containment/closeness
becomes equality after indexing).

Scale: the centroid table is tiny and broadcast; vector→centroid assignment
is a row-local argmax over the broadcast list; the only shuffle is the
per-bucket candidate join keyed by centroid id. At 100 TB the fact side
stays put, exactly like the spatial join.

Parity: dot products are explicit 64-term left-to-right sums generated into
BOTH dialects (identical IEEE evaluation order bit-for-bit), so cosine values
hash-match between Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EMB_DIM = 64


# ---------------------------------------------------------------------------
# Bit-exact dot product (explicit sum chain, identical order both dialects)
# ---------------------------------------------------------------------------

def dot_chain_col(a: Column, b: Column, dim: int = EMB_DIM) -> Column:
    out = F.element_at(a, 1) * F.element_at(b, 1)
    for i in range(2, dim + 1):
        out = out + F.element_at(a, i) * F.element_at(b, i)
    return out


def dot_chain_sql(a: str, b: str, dim: int = EMB_DIM) -> str:
    terms = " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(1, dim + 1))
    return f"({terms})"


def cosine_chain_col(a: Column, b: Column, dim: int = EMB_DIM) -> Column:
    return dot_chain_col(a, b, dim) / (
        F.sqrt(dot_chain_col(a, a, dim)) * F.sqrt(dot_chain_col(b, b, dim))
    )


def cosine_chain_sql(a: str, b: str, dim: int = EMB_DIM) -> str:
    return (
        f"({dot_chain_sql(a, b, dim)} / "
        f"(SQRT({dot_chain_sql(a, a, dim)}) * SQRT({dot_chain_sql(b, b, dim)})))"
    )


# ---------------------------------------------------------------------------
# Brute-force cosine top-k (the exactness baseline)
# ---------------------------------------------------------------------------

def cosine_topk(vectors: DataFrame, queries: DataFrame, k: int,
                v_id: str = "vec_id", q_id: str = "query_id",
                vec: str = "e", qvec: str = "qe") -> DataFrame:
    """Exact top-k: broadcast the (small) query set against the full vector
    table; windowed rank with deterministic tiebreak."""
    cand = (
        F.broadcast(queries).crossJoin(vectors)
        .filter(F.col(v_id) != F.col(q_id))
        .withColumn("sim", cosine_chain_col(F.col(qvec), F.col(vec)))
    )
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc(), F.col(v_id).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, F.col(v_id).alias("neighbor_id"),
                F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# IVF: nearest-centroid bucketing + nprobe search
# ---------------------------------------------------------------------------

def norm_chain_col(vec: Column, dim: int = EMB_DIM) -> Column:
    """sqrt(dot(v, v)) as the same chain sum — factor it out ONCE per row
    so each centroid comparison costs one dot product, not three."""
    return F.sqrt(dot_chain_col(vec, vec, dim))


def _centroid_norm(cvec: list[float], dim: int) -> float:
    """Python-side sqrt(dot(c, c)) with the identical left-to-right order —
    bit-for-bit the value the SQL oracle's chain computes."""
    import math

    acc = cvec[0] * cvec[0]
    for i in range(1, dim):
        acc = acc + cvec[i] * cvec[i]
    return math.sqrt(acc)


def _centroid_sims_col(vec: Column, centroids: list[tuple[int, list[float]]],
                       vnorm: Column, dim: int) -> Column:
    """array<struct<negsim, cid>> of -cosine(vec, centroid) per centroid.

    Expressed as ONE higher-order ``transform`` over an array-of-struct
    centroid literal with an ``aggregate`` fold for the dot product —
    compact generated code regardless of K x dim (an unrolled chain per
    centroid put K*dim multiply-adds into a single janino method and blew
    the 64KB whole-stage limit -> silent interpreted fallback). The
    left-fold ``(((0+t1)+t2)+...)`` adds terms in exactly the chain-sum
    order, so the value is bit-identical to the oracle's chain SQL
    (IEEE addition with a 0.0 seed is exact)."""
    centarr = F.array(*[
        F.struct(
            F.lit(int(cid)).alias("cid"),
            F.lit(float(_centroid_norm(cvec, dim))).alias("cn"),
            F.array(*[F.lit(float(x)) for x in cvec]).alias("c"),
        )
        for cid, cvec in centroids
    ])

    def body(e: Column) -> Column:
        dot = F.aggregate(F.zip_with(vec, e["c"], lambda a, b: a * b),
                          F.lit(0.0), lambda acc, x: acc + x)
        sim = dot / (vnorm * e["cn"])
        return F.struct((-sim).alias("negsim"), e["cid"].alias("cid"))

    return F.transform(centarr, body)


def assign_centroid_col(vec: Column, centroids: list[tuple[int, list[float]]],
                        dim: int = EMB_DIM,
                        vnorm: Column | None = None) -> Column:
    """Row-local argmax of cosine(vec, centroid) over a broadcast centroid
    list; ties broken by centroid id (asc) — array_min over (negsim, cid)
    structs. Pass a materialized ``vnorm`` so the per-centroid cost is one
    dot product (cosine factored as dot / (|v| * |c|) with |c| a driver
    constant — identical IEEE value to the full chain)."""
    if vnorm is None:
        vnorm = norm_chain_col(vec, dim)
    return F.array_min(_centroid_sims_col(vec, centroids, vnorm, dim))["cid"]


def top_centroids_col(vec: Column, centroids: list[tuple[int, list[float]]],
                      nprobe: int, dim: int = EMB_DIM,
                      vnorm: Column | None = None) -> Column:
    """Array of the ``nprobe`` nearest centroid ids (sim desc, id asc) —
    sort of a small row-local array."""
    if vnorm is None:
        vnorm = norm_chain_col(vec, dim)
    arr = F.array_sort(_centroid_sims_col(vec, centroids, vnorm, dim))
    return F.transform(F.slice(arr, 1, nprobe), lambda s: s["cid"])


def ivf_topk(vectors: DataFrame, queries: DataFrame,
             centroids: list[tuple[int, list[float]]], k: int, nprobe: int,
             v_id: str = "vec_id", q_id: str = "query_id",
             vec: str = "e", qvec: str = "qe") -> DataFrame:
    """IVF ANN: vectors bucketed by nearest centroid; each query probes its
    ``nprobe`` nearest buckets; exact cosine + windowed top-k inside."""
    v = vectors.withColumn("__vn", norm_chain_col(F.col(vec)))
    v = v.withColumn("__bucket",
                     assign_centroid_col(F.col(vec), centroids, vnorm=F.col("__vn")))
    # materialize (bucket, norm) through a by-bucket exchange: downstream
    # stages read attributes instead of re-inlining the K x dim centroid
    # argmax into the join/sort codegen (64KB janino blowup -> silent
    # interpreted fallback, CLAUDE.md invariant) — and bucket-partitioned
    # vectors ARE the IVF storage shape (one bucket shuffle, SCALE.md)
    v = v.repartition(F.col("__bucket"))
    q = queries.withColumn("__qn", norm_chain_col(F.col(qvec)))
    q = q.withColumn(
        "__bucket",
        F.explode(top_centroids_col(F.col(qvec), centroids, nprobe,
                                    vnorm=F.col("__qn"))))
    cand = (
        F.broadcast(q).join(v, on="__bucket")
        .filter(F.col(v_id) != F.col(q_id))
        # factored cosine: identical IEEE value to the full chain
        .withColumn("sim", dot_chain_col(F.col(qvec), F.col(vec))
                    / (F.col("__qn") * F.col("__vn")))
    )
    # explicit q_id exchange BEFORE the window: sim is materialized on the
    # map side, so the top-k sort key is an attribute (small sort codegen);
    # the window reuses this partitioning instead of adding its own
    cand = cand.select(q_id, v_id, "sim").repartition(F.col(q_id))
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc(), F.col(v_id).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, F.col(v_id).alias("neighbor_id"),
                F.col("rank").cast("long").alias("rank"))
    )


def ivf_topk_sql(vectors_cte: str, centroid_pred: str, query_pred: str,
                 k: int, nprobe: int, dim: int = EMB_DIM) -> str:
    """DuckDB twin of the full IVF pipeline (centroids selected by
    ``centroid_pred`` over the same relation, identical assignment and probe
    logic)."""
    cos_vc = cosine_chain_sql("v.__e", "c.__e", dim)
    cos_qc = cosine_chain_sql("q.__e", "c.__e", dim)
    cos_qv = cosine_chain_sql("q.__e", "v.__e", dim)
    return f"""
    WITH base AS (SELECT vec_id AS __id, {_dbl_vec_sql('embedding')} AS __e FROM {vectors_cte}),
    cents AS (SELECT __id AS cid, __e FROM base WHERE {centroid_pred}),
    assigned AS (
      SELECT v.__id, v.__e, c.cid AS bucket
      FROM base v CROSS JOIN cents c
      QUALIFY ROW_NUMBER() OVER (PARTITION BY v.__id ORDER BY {cos_vc} DESC, c.cid ASC) = 1
    ),
    probes AS (
      SELECT q.__id AS query_id, q.__e, c.cid AS bucket
      FROM (SELECT * FROM base WHERE {query_pred}) q CROSS JOIN cents c
      QUALIFY ROW_NUMBER() OVER (PARTITION BY q.__id ORDER BY {cos_qc} DESC, c.cid ASC) <= {nprobe}
    ),
    cand AS (
      SELECT p.query_id, v.__id AS neighbor_id, {_cos_pv(dim)} AS sim
      FROM probes p JOIN assigned v ON p.bucket = v.bucket AND v.__id <> p.query_id
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM cand
    ) WHERE rank <= {k}
    """


def _dbl_vec_sql(col: str) -> str:
    return f"list_transform({col}, x -> CAST(x AS DOUBLE))"


def _cos_pv(dim: int) -> str:
    return cosine_chain_sql("p.__e", "v.__e", dim)


# ---------------------------------------------------------------------------
# IVF centroid training: deterministic mini-Lloyd's
# ---------------------------------------------------------------------------

def train_centroids(vectors: DataFrame, k: int, iters: int = 3,
                    v_id: str = "vec_id", vec: str = "e",
                    dim: int = EMB_DIM) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd's iterations for IVF centroids.

    Init: the k vectors with the smallest ids (deterministic, no RNG —
    workflow-safe). Each iteration: assign every vector to its nearest
    centroid (row-local argmax over the broadcast list, the same expression
    the IVF probe uses) and recompute centroids as per-bucket means (one
    map-side-combinable groupBy). Empty clusters keep their previous
    centroid. Driver holds only k*dim floats.
    """
    init = (
        vectors.orderBy(v_id).limit(k)
        .select(v_id, vec).collect()
    )
    cents = [(i, [float(x) for x in r[vec]]) for i, r in enumerate(init)]
    for _ in range(iters):
        assigned = vectors.withColumn(
            "__bucket", assign_centroid_col(F.col(vec), cents, dim))
        sums = assigned.groupBy("__bucket").agg(
            F.count("*").alias("n"),
            *[F.sum(F.element_at(F.col(vec), i + 1)).alias(f"s{i}")
              for i in range(dim)],
        ).collect()
        by_bucket = {int(r["__bucket"]): r for r in sums}
        new_cents = []
        for cid, old in cents:
            r = by_bucket.get(cid)
            if r is None or r["n"] == 0:
                new_cents.append((cid, old))
            else:
                new_cents.append(
                    (cid, [float(r[f"s{i}"]) / r["n"] for i in range(dim)]))
        cents = new_cents
    return cents


# ---------------------------------------------------------------------------
# Product quantization (Jegou/Douze/Schmid, TPAMI 2011): the storage-side
# scale path for embedding tables — m subspace codes of log2(K) bits replace
# 4*dim bytes per vector (64-dim float -> 8 bytes at m=8, K<=256), and ADC
# distance scans read code tables instead of raw vectors.
# ---------------------------------------------------------------------------

def _l2_sub_col(vec: Column, sub: Column, s: Column, d: int) -> Column:
    """Squared L2 between vec's subspace-s slice and a centroid subvector,
    as a 0.0-seeded left fold (chain-sum discipline — bit-identical to the
    oracle's explicit parenthesized chain)."""
    return F.aggregate(
        F.zip_with(F.slice(vec, s * d + 1, d), sub,
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)


def _pq_assign_np(V, C, m: int):
    """Vectorized PQ assignment, BIT-EXACT to the Catalyst/oracle chain:
    squared-L2 accumulates dim-by-dim as ``acc = acc + diff*diff`` over
    (n, K) float64 arrays — each element's additions happen in exactly
    the 0.0-seeded left-chain order of ``_l2_sub_col`` / the SQL twin,
    so distances (and therefore argmins and distortions) match the
    interpreted form to the last bit. Ties -> lowest j via np.argmin
    first-occurrence (== array_min struct(dist, j)). Returns
    (codes (n, m) int32, mind (n, m) float64)."""
    import numpy as np
    n, dim = V.shape
    d = dim // m
    codes = np.empty((n, m), dtype="int32")
    mind = np.empty((n, m), dtype="float64")
    for s in range(m):
        acc = np.zeros((n, C.shape[0]), dtype="float64")
        for i in range(d):
            diff = V[:, s * d + i][:, None] - C[None, :, s * d + i]
            acc = acc + diff * diff
        j = np.argmin(acc, axis=1)
        codes[:, s] = j
        mind[:, s] = acc[np.arange(n), j]
    return codes, mind


def _pq_assign_map(trainers, m: int, v_id: str, vec: str, emit):
    """mapInPandas factory shared by the two arrow-backend code tables:
    ``emit(pdf, codes, mind) -> output pdf`` shapes the batch."""
    import numpy as np
    C = np.asarray(trainers, dtype="float64")

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray([np.asarray(x, dtype="float64")
                            for x in pdf[vec]])
            codes, mind = _pq_assign_np(V, C, m)
            yield emit(pdf, codes, mind)
    return gen


def pq_codes(vectors: DataFrame, trainers: list[list[float]],
             m: int = 8, dim: int = EMB_DIM,
             v_id: str = "vec_id", vec: str = "e",
             backend: str = "arrow") -> DataFrame:
    """Assign each vector its m-subspace PQ code: per subspace s, the
    index j of the trainer subvector minimizing squared L2 (ties -> low
    j). Codebook = the trainer rows' own subvectors (deterministic; a
    Lloyd's refinement drops in exactly like train_centroids does for
    IVF). ZERO exchanges either backend: at 100 TB this is a projection
    on the embedding scan producing the compressed table. Output: codes
    as comma-joined string (array-output hashing rule) + round-6 total
    distortion (the quantization-error diagnostic), folded in subspace
    order both dialects.

    ``backend="arrow"`` (default) runs the numpy kernel — K x d matrix
    math per Arrow batch, ~60x the interpreted HOF argmin's throughput —
    with the SAME bit pattern (dim-ordered elementwise accumulation ==
    the chain fold; test_similarity pins arrow == catalyst exactly).
    ``backend="catalyst"`` keeps the all-Column form: array_min over
    structs against the broadcast codebook literal (the parity twin,
    and the form that stays JVM-side for modest K*dim)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if backend == "arrow":
        import numpy as np
        import pandas as pd

        def emit(pdf, codes, mind):
            # subspace-ordered chain, 0.0-seeded, elementwise float64 —
            # identical bits to the Column fold. Rounding happens
            # Spark-side below (F.round's BigDecimal HALF_UP; a numpy
            # multiply-round-divide can land on the other side).
            tot = np.zeros(len(codes), dtype="float64")
            for s in range(m):
                tot = tot + mind[:, s]
            return pd.DataFrame({
                v_id: pdf[v_id].values,
                "codes": [",".join(str(int(j)) for j in row)
                          for row in codes],
                "distortion": tot,
            })
        raw = vectors.select(v_id, vec).mapInPandas(
            _pq_assign_map(trainers, m, v_id, vec, emit),
            schema=f"{v_id} long, codes string, distortion double")
        return raw.select(
            v_id, "codes", F.round("distortion", 6).alias("distortion"))
    d = dim // m
    cent = F.array(*[
        F.array(*[
            F.struct(
                F.lit(int(j)).alias("j"),
                F.array(*[F.lit(float(x))
                          for x in t[s * d:(s + 1) * d]]).alias("sub"))
            for j, t in enumerate(trainers)])
        for s in range(m)])
    v = F.col(vec)

    def best(s: Column) -> Column:
        return F.array_min(F.transform(
            F.element_at(cent, s + 1),
            lambda c: F.struct(
                _l2_sub_col(v, c["sub"], s, d).alias("dist"),
                c["j"].alias("j"))))

    subs = F.transform(F.sequence(F.lit(0), F.lit(m - 1)), best)
    codes = F.array_join(
        F.transform(subs, lambda r: r["j"].cast("string")), ",")
    distortion = F.round(F.aggregate(
        F.transform(subs, lambda r: r["dist"]),
        F.lit(0.0), lambda acc, x: acc + x), 6)
    return vectors.select(
        F.col(v_id), codes.alias("codes"), distortion.alias("distortion"))


def pq_code_array(vectors: DataFrame, trainers: list[list[float]],
                  m: int = 8, dim: int = EMB_DIM,
                  v_id: str = "vec_id", vec: str = "e",
                  backend: str = "arrow") -> DataFrame:
    """Same assignment as pq_codes but codes as ``array<int>`` — the
    join-ready shape ADC scans consume (pq_codes' string form exists for
    the array-output hashing rule). Same two backends, same bit-exact
    kernel."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if backend == "arrow":
        import pandas as pd

        def emit(pdf, codes, mind):
            return pd.DataFrame({
                v_id: pdf[v_id].values,
                "codes": [[int(j) for j in row] for row in codes],
            })
        return vectors.select(v_id, vec).mapInPandas(
            _pq_assign_map(trainers, m, v_id, vec, emit),
            schema=f"{v_id} long, codes array<int>")
    d = dim // m
    cent = F.array(*[
        F.array(*[
            F.struct(
                F.lit(int(j)).alias("j"),
                F.array(*[F.lit(float(x))
                          for x in t[s * d:(s + 1) * d]]).alias("sub"))
            for j, t in enumerate(trainers)])
        for s in range(m)])
    v = F.col(vec)

    def best(s: Column) -> Column:
        return F.array_min(F.transform(
            F.element_at(cent, s + 1),
            lambda c: F.struct(
                _l2_sub_col(v, c["sub"], s, d).alias("dist"),
                c["j"].alias("j"))))

    subs = F.transform(F.sequence(F.lit(0), F.lit(m - 1)), best)
    return vectors.select(
        F.col(v_id),
        F.transform(subs, lambda r: r["j"]).alias("codes"))


def _adc_lut(query: list[float], trainers: list[list[float]],
             m: int, d: int) -> list[list[float]]:
    """Driver-side ADC lookup table lut[s][j] = squared L2 between the
    query's subspace-s slice and trainer j's — accumulated as the SAME
    0.0-seeded left chain the oracle writes (python float IS IEEE
    double, so the values are bit-identical to the SQL chain)."""
    lut = []
    for s in range(m):
        row = []
        for t in trainers:
            acc = 0.0
            for i in range(d):
                diff = query[s * d + i] - t[s * d + i]
                acc = acc + diff * diff
            row.append(acc)
        lut.append(row)
    return lut


def pq_adc_topk(code_table: DataFrame,
                queries: list[tuple[int, list[float]]],
                trainers: list[list[float]], k: int,
                m: int = 8, dim: int = EMB_DIM,
                v_id: str = "vec_id") -> DataFrame:
    """Asymmetric distance computation over the COMPRESSED table
    (Jegou et al. 2011 §IV): each query carries an m x K lookup table of
    exact query-to-centroid subspace distances; scanning a vector costs
    m table lookups + m adds instead of dim multiply-adds on floats the
    scan never reads. The LUTs travel as DATA (a broadcast query
    DataFrame with an array<array<double>> column, built driver-side
    with the oracle's chain order), so the plan is: code scan x
    broadcast queries -> fold over subspaces -> per-query top-k window.
    At 100 TB the scan reads 8-byte codes, not 256-byte vectors — a 32x
    I/O reduction — and the only exchange is the per-query top-k.

    The code table is MATERIALIZED (localCheckpoint) before the query
    crossJoin — the CLAUDE.md giant-expression discipline: when codes is
    a live pq_code_array projection, the ADC fold's 8 element_at(codes)
    references each re-inline the full m x K argmin subtree per
    (vector, query) candidate row (~41k interpreted multiply-adds/row;
    the un-checkpointed form ran minutes at sf0.1 vs seconds). At scale
    this materialization is not a workaround — the compressed code
    table IS the stored ANN index ADC exists to scan (written once by
    pq_code_array, read per query batch)."""
    d = dim // m
    spark = code_table.sparkSession
    qrows = [(int(qid), _adc_lut(list(map(float, qv)), trainers, m, d))
             for qid, qv in queries]
    qdf = spark.createDataFrame(
        qrows, "query_id long, lut array<array<double>>")
    cand = code_table.localCheckpoint().crossJoin(F.broadcast(qdf)) \
        .filter(F.col(v_id) != F.col("query_id"))
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)), F.lit(0.0),
        lambda acc, s: acc + F.element_at(
            F.element_at(F.col("lut"), s.cast("int") + 1),
            F.element_at(F.col("codes"), s.cast("int") + 1).cast("int") + 1))
    cand = cand.select("query_id", F.col(v_id), adc.alias("adc"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col(v_id).asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col(v_id).alias("neighbor_id"),
                    F.round(F.col("adc"), 6).alias("adc"),
                    F.col("rank").cast("long").alias("rank")))


def pq_l2_chain_sql(a: str, b: str, s_expr: str, d: int) -> str:
    """Oracle chain for _l2_sub_col: ((0.0 + t1) + t2)... over the d dims
    of subspace ``s_expr``. Both ``a`` and ``b`` are FULL vectors indexed
    ``[s*d + i]`` (the Spark side slices the codebook at literal-build
    time — same values, same fold order)."""
    expr = "CAST(0.0 AS DOUBLE)"
    for i in range(1, d + 1):
        t = (f"(({a}[{s_expr} * {d} + {i}] - {b}[{s_expr} * {d} + {i}])"
             f" * ({a}[{s_expr} * {d} + {i}] - {b}[{s_expr} * {d} + {i}]))")
        expr = f"({expr} + {t})"
    return expr

"""Distributed cardinality sketches (HyperLogLog, KMV bottom-k).

Why from scratch: at 100 TB an exact ``COUNT(DISTINCT key)`` is a full
key-shuffle; a register sketch aggregates with map-side combine (each
partition folds its rows into 256 register maxima, the exchange carries
256 rows) and merges across cohorts by ``MAX`` — the standard scale path
(same family as Spark's builtin ``approx_count_distinct``; rebuilt here on
md5 so every intermediate is DETERMINISTIC and replayable in ANSI SQL for
the oracle gate, which the builtin's private xxhash64 layout is not).

Design for dialect parity (see queries.py header rules):

* the only shared hash is md5 — bucket = first 2 hex digits (m = 256
  registers), rank word = next 13 hex digits (52 bits);
* rho (leading-zero rank) is computed on the HEX STRING with exact
  integer/CASE algebra — no float log2 anywhere;
* the HLL register sum  sum_j 2^(-M_j)  is scaled by 2^CAP and kept in
  BIGINT: terms are exact powers of two <= 2^53, 256 of them < 2^63 — the
  sum is EXACT, so Spark's nondeterministic aggregation order cannot
  drift the value (the usual double-sum parity trap);
* the final estimate performs the float divisions in one fixed order and
  is rounded to 6 decimals to absorb any last-ulp libm difference.

Reference semantics: Flajolet et al. 2007 (HyperLogLog), Bar-Yossef et
al. 2002 (KMV / k-minimum-values); the reference repo has no sketch tier
— this extends the engine for the web-scale dedup/statistics workloads
described in SURVEY §2.10.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SKETCHES_VERSION = 1

M_REGISTERS = 256          # 2^8 buckets, first 2 hex digits
RANK_HEX_DIGITS = 13       # 52-bit rank word
CAP = RANK_HEX_DIGITS * 4 + 1   # max rho = 53; scaled terms 2^(CAP - rho)
# alpha_m for m = 256 (Flajolet et al. Fig. 3)
ALPHA_256 = 0.7213 / (1.0 + 1.079 / 256.0)


# ---------------------------------------------------------------------------
# hash pieces (Spark Column + DuckDB SQL twins)
# ---------------------------------------------------------------------------

def _md5_col(v: Column) -> Column:
    return F.md5(v.cast("string").cast("binary"))


def _md5_sql(v: str) -> str:
    return f"md5(CAST({v} AS VARCHAR))"


def hll_bucket_col(v: Column) -> Column:
    """Register index 0..255 from the first 2 md5 hex digits."""
    return F.conv(F.substring(_md5_col(v), 1, 2), 16, 10).cast("long")


def hll_bucket_sql(v: str) -> str:
    return f"CAST('0x' || substr({_md5_sql(v)}, 1, 2) AS BIGINT)"


def hll_rho_col(v: Column) -> Column:
    """Leading-zero rank of the 52-bit word spelled by hex digits 3..15:
    rho = (# leading zero bits) + 1, computed with exact string/integer
    algebra — 4 bits per leading '0' hex digit plus 4 - bit_length(first
    nonzero digit); all-zero word => rho = 53."""
    word = F.substring(_md5_col(v), 3, RANK_HEX_DIGITS)
    stripped = F.regexp_replace(word, "^0+", "")
    nz = F.length(stripped)                       # 0 when word is all zeros
    lead_digit = F.conv(F.substring(stripped, 1, 1), 16, 10).cast("long")
    bitlen = (
        F.when(lead_digit >= 8, 4)
        .when(lead_digit >= 4, 3)
        .when(lead_digit >= 2, 2)
        .otherwise(1)
    )
    full = F.lit(RANK_HEX_DIGITS * 4 + 1)         # 53
    rho = (F.lit(RANK_HEX_DIGITS) - nz) * 4 + (F.lit(4) - bitlen) + F.lit(1)
    return F.when(nz == 0, full).otherwise(rho).cast("long")


def hll_rho_sql(v: str) -> str:
    word = f"substr({_md5_sql(v)}, 3, {RANK_HEX_DIGITS})"
    stripped = f"regexp_replace({word}, '^0+', '')"
    nz = f"length({stripped})"
    lead = f"CAST('0x' || substr({stripped}, 1, 1) AS BIGINT)"
    bitlen = (
        f"CASE WHEN {lead} >= 8 THEN 4 WHEN {lead} >= 4 THEN 3 "
        f"WHEN {lead} >= 2 THEN 2 ELSE 1 END"
    )
    full = RANK_HEX_DIGITS * 4 + 1
    rho = f"({RANK_HEX_DIGITS} - {nz}) * 4 + (4 - {bitlen}) + 1"
    return f"CAST(CASE WHEN {nz} = 0 THEN {full} ELSE {rho} END AS BIGINT)"


# ---------------------------------------------------------------------------
# HLL estimate from the register table (shared scalar algebra)
# ---------------------------------------------------------------------------

def hll_estimate_exprs() -> dict[str, str]:
    """The estimate algebra over aggregated (reg_sum, n_buckets), emitted as
    ANSI SQL usable verbatim in BOTH dialects (Spark selectExpr and DuckDB)
    so the float evaluation order is identical by construction.

    reg_sum = sum over PRESENT registers of 2^(CAP - M_j); absent registers
    (rho would be 0) contribute 2^CAP each: S = reg_sum + (m - n_buckets)*2^CAP.
    E_raw = alpha * m^2 / (S / 2^CAP)  ==  (alpha*m^2*2^CAP) / S.
    Small-range correction (linear counting) when E_raw <= 2.5m and empty
    registers exist: E = m * ln(m / V). ln output is rounded to 6 dp to
    absorb last-ulp libm differences between JVM and C runtimes."""
    m = M_REGISTERS
    two_cap = float(2 ** CAP)
    s_full = f"(reg_sum + ({m} - n_buckets) * CAST({2 ** CAP} AS BIGINT))"
    e_raw = (
        f"(CAST({ALPHA_256!r} AS DOUBLE) * {m} * {m} * CAST({two_cap!r} AS DOUBLE))"
        f" / CAST({s_full} AS DOUBLE)"
    )
    v_empty = f"({m} - n_buckets)"
    linear = f"ROUND({m} * LN(CAST({m} AS DOUBLE) / CAST({v_empty} AS DOUBLE)), 6)"
    estimate = (
        f"CAST(CASE WHEN {e_raw} <= {2.5 * m!r} AND {v_empty} > 0 "
        f"THEN {linear} ELSE ROUND({e_raw}, 6) END AS DOUBLE)"
    )
    return {"s_full": s_full, "estimate": estimate}


def hll_distinct(df: DataFrame, key: str) -> DataFrame:
    """One-row DataFrame (reg_sum, n_buckets, hll_estimate) for COUNT
    DISTINCT key. Plan: row-local bucket/rho projection -> 256-row register
    max (map-side combine; the exchange carries <= m rows per partition) ->
    scalar fold. Merging cohort sketches = MAX per register, which is the
    same agg — union inputs compose for free."""
    regs = (
        df.select(
            hll_bucket_col(F.col(key)).alias("bucket"),
            hll_rho_col(F.col(key)).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    term = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({CAP} - m_j AS INT))"
    )
    folded = regs.agg(
        F.sum(term).cast("long").alias("reg_sum"),
        F.count("*").cast("long").alias("n_buckets"),
    )
    ex = hll_estimate_exprs()
    return folded.selectExpr(
        "reg_sum", "n_buckets", f"{ex['estimate']} AS hll_estimate"
    )


def hll_distinct_sql(table: str, key: str) -> str:
    """DuckDB replay of hll_distinct — identical algebra, identical float
    evaluation order."""
    ex = hll_estimate_exprs()
    return f"""
    WITH regs AS (
      SELECT {hll_bucket_sql(key)} AS bucket,
             CAST(MAX({hll_rho_sql(key)}) AS BIGINT) AS m_j
      FROM {table} GROUP BY 1
    ),
    folded AS (
      SELECT CAST(SUM(CAST(1 AS BIGINT) << CAST({CAP} - m_j AS INTEGER)) AS BIGINT)
               AS reg_sum,
             CAST(COUNT(*) AS BIGINT) AS n_buckets
      FROM regs
    )
    SELECT reg_sum, n_buckets, {ex['estimate']} AS hll_estimate FROM folded
    """


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct estimate
# ---------------------------------------------------------------------------

KMV_HEX_DIGITS = 13   # 52-bit normalized hash => exact double in [0, 1)


def kmv_hash_col(v: Column) -> Column:
    """52-bit md5 prefix as an exact BIGINT in [0, 2^52)."""
    return F.conv(F.substring(_md5_col(v), 1, KMV_HEX_DIGITS), 16, 10).cast("long")


def kmv_hash_sql(v: str) -> str:
    return f"CAST('0x' || substr({_md5_sql(v)}, 1, {KMV_HEX_DIGITS}) AS BIGINT)"


def kmv_distinct(df: DataFrame, key: str, k: int = 64) -> DataFrame:
    """One-row (kth_hash, kmv_estimate): estimate = (k-1) / (kth smallest
    distinct normalized hash). Plan: distinct hash -> global bottom-k
    (ORDER BY LIMIT k is a partial top-k per partition, k rows to the
    driver-side final sort — never a full sort at scale) -> one division.
    kth_hash is an exact integer so the oracle comparison is exact."""
    two52 = float(2**52)
    kth = (
        df.select(kmv_hash_col(F.col(key)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
        .agg(F.max("h").cast("long").alias("kth_hash"),
             F.count("*").cast("long").alias("n_seen"))
    )
    est = (
        f"CAST(CASE WHEN n_seen < {k} THEN CAST(n_seen AS DOUBLE) "
        f"ELSE ROUND(CAST({k - 1} AS DOUBLE) "
        f"/ (CAST(kth_hash AS DOUBLE) / CAST({two52!r} AS DOUBLE)), 6) "
        f"END AS DOUBLE)"
    )
    return kth.selectExpr("kth_hash", "n_seen", f"{est} AS kmv_estimate")


def kmv_distinct_sql(table: str, key: str, k: int = 64) -> str:
    two52 = float(2**52)
    est = (
        f"CAST(CASE WHEN n_seen < {k} THEN CAST(n_seen AS DOUBLE) "
        f"ELSE ROUND(CAST({k - 1} AS DOUBLE) "
        f"/ (CAST(kth_hash AS DOUBLE) / CAST({two52!r} AS DOUBLE)), 6) "
        f"END AS DOUBLE)"
    )
    return f"""
    WITH mins AS (
      SELECT DISTINCT {kmv_hash_sql(key)} AS h FROM {table}
      ORDER BY h LIMIT {k}
    ),
    kth AS (
      SELECT CAST(MAX(h) AS BIGINT) AS kth_hash,
             CAST(COUNT(*) AS BIGINT) AS n_seen
      FROM mins
    )
    SELECT kth_hash, n_seen, {est} AS kmv_estimate FROM kth
    """


# ---------------------------------------------------------------------------
# Count-Min frequency sketch
# ---------------------------------------------------------------------------
# Cormode & Muthukrishnan 2005: d independent hash rows x w counters;
# point-frequency estimate = min over rows of the counter the key hashes
# to (always an over-estimate; error <= eN with prob 1-delta for
# w = e/eps, d = ln(1/delta)). The distributed shape is the whole point:
# counters aggregate with map-side combine, the exchange carries at most
# d*w rows regardless of input size, and sketches for different corpus
# cohorts merge by cell-wise + (a BIGINT sum — exact, order-independent).

CM_DEPTH = 4      # hash rows
CM_WIDTH = 256    # counters per row: first 2 hex digits of a salted md5


def cm_bucket_col(v: Column, row: int) -> Column:
    """Counter index 0..w-1 for hash row ``row`` (salted md5)."""
    h = F.md5(F.concat(F.lit(f"{row}:"), v.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("long")


def cm_bucket_sql(v: str, row: int) -> str:
    return (f"CAST('0x' || substr(md5('{row}:' || CAST({v} AS VARCHAR)), 1, 2)"
            f" AS BIGINT)")


def cm_sketch(df: DataFrame, key: str, depth: int = CM_DEPTH) -> DataFrame:
    """The sketch as (j, cell, cnt) rows — at most depth*w of them.

    Plan: one generator expression fans each input row into ``depth``
    (row, cell) pairs row-locally, the hash aggregate partials-then-merges,
    and the final exchange is bounded by the sketch size, not the data."""
    pairs = F.array(*[
        F.struct(F.lit(j).alias("j"), cm_bucket_col(F.col(key), j).alias("cell"))
        for j in range(depth)
    ])
    return (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.j").alias("j"), F.col("p.cell").alias("cell"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cm_sketch_sql(table: str, key: str, depth: int = CM_DEPTH) -> str:
    arms = "\nUNION ALL\n".join(
        f"SELECT {j} AS j, {cm_bucket_sql(key, j)} AS cell FROM {table}"
        for j in range(depth)
    )
    return f"""
      SELECT j, cell, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ({arms}) GROUP BY j, cell
    """


def cm_estimate(sketch: DataFrame, probes: DataFrame, key: str,
                depth: int = CM_DEPTH) -> DataFrame:
    """Point-frequency estimates for ``probes[key]``: min over rows of the
    addressed counter. The sketch is tiny — broadcast it; probes never
    shuffle. Missing cells read as 0 (key never seen)."""
    addr = probes.select(
        F.col(key),
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     cm_bucket_col(F.col(key), j).alias("cell"))
            for j in range(depth)
        ])).alias("p"),
    ).select(key, "p.j", "p.cell")
    return (
        addr.join(F.broadcast(sketch), ["j", "cell"], "left")
        .fillna({"cnt": 0})
        .groupBy(key)
        .agg(F.min("cnt").cast("long").alias("cm_estimate"))
    )


# ---------------------------------------------------------------------------
# Log2-histogram quantile sketch
# ---------------------------------------------------------------------------
# The quantile member of the sketch family (distinct -> HLL/KMV,
# frequency -> CM): bin a non-negative BIGINT measure by the LENGTH OF ITS
# BINARY REPRESENTATION (= floor(log2 x) + 1 — an exact integer, no libm,
# so both dialects agree bit-for-bit, unlike DDSketch's log-gamma bins).
# <= 64 bins whatever the data; bins aggregate with map-side combine and
# merge across cohorts by bin-wise sum; quantiles come from a cumulative
# walk with linear interpolation inside the bin, all in integer
# arithmetic. Relative error is bounded by the bin width (factor-2 bins
# ~= 100% worst-case relative error, the log2 tradeoff; finer variants
# sub-split bins — same machinery).

def log2_bin_col(v: Column) -> Column:
    """Bin index 1..64: length of the binary representation (0 -> 1)."""
    return F.length(F.conv(v.cast("long"), 10, 2)).cast("long")


def log2_bin_sql(v: str) -> str:
    return f"CAST(length(bin(CAST({v} AS BIGINT))) AS BIGINT)"


def log2_hist(df: DataFrame, key: str) -> DataFrame:
    """The sketch: (bin, cnt, lo, width) rows, <= 64 of them.
    lo/width are the bin's value range [lo, lo+width) — bin 1 holds {0,1}."""
    return (
        df.select(log2_bin_col(F.col(key)).alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("cnt"))
        .selectExpr(
            "bin", "cnt",
            "CAST(CASE WHEN bin = 1 THEN 0 ELSE shiftleft(1L, CAST(bin AS INT) - 1) END AS BIGINT) AS lo",
            "CAST(CASE WHEN bin = 1 THEN 2 ELSE shiftleft(1L, CAST(bin AS INT) - 1) END AS BIGINT) AS width",
        )
    )


def log2_hist_sql(table: str, key: str) -> str:
    return f"""
      SELECT bin, cnt,
             CAST(CASE WHEN bin = 1 THEN 0
                  ELSE (CAST(1 AS BIGINT) << (CAST(bin AS INT) - 1)) END AS BIGINT) AS lo,
             CAST(CASE WHEN bin = 1 THEN 2
                  ELSE (CAST(1 AS BIGINT) << (CAST(bin AS INT) - 1)) END AS BIGINT) AS width
      FROM (
        SELECT {log2_bin_sql(key)} AS bin, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM {table} GROUP BY 1
      )
    """


def log2_quantiles(hist: DataFrame, qs: tuple = (50, 90, 99)) -> DataFrame:
    """(q, est, n) from the sketch — engine-side cumulative walk over the
    <= 64-row histogram (a Window over a sketch-sized frame, then the
    first bin whose cumulative count reaches the target rank; linear
    interpolation inside the bin in pure integer arithmetic)."""
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    h = (
        hist.withColumn("cum", F.sum("cnt").over(w).cast("long"))
        .withColumn("cum_prev", (F.col("cum") - F.col("cnt")).cast("long"))
        # total as a frame-wide window over the same <= 64-row sketch — no
        # second source scan, no crossJoin with a separate aggregate
        .withColumn("n", F.sum("cnt").over(w_all).cast("long"))
    )
    targets = F.explode(F.array(*[F.lit(q) for q in qs])).alias("q")
    t = h.select("*", targets).withColumn(
        "r", F.expr("(n * q + 99) div 100").cast("long"))
    hit = (
        t.filter(F.col("cum") >= F.col("r"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("q").orderBy("bin")),
        )
        .filter(F.col("rk") == 1)
    )
    return hit.selectExpr(
        "CAST(q AS BIGINT) AS q",
        "CAST(lo + ((r - cum_prev) * width) div cnt AS BIGINT) AS est",
        "n",
    )


def log2_quantiles_sql(hist_sql: str, qs: tuple = (50, 90, 99)) -> str:
    q_rows = ", ".join(f"({q})" for q in qs)
    return f"""
    WITH hist AS ({hist_sql}),
    cum AS (
      SELECT bin, cnt, lo, width,
             CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER (ORDER BY bin) - cnt AS BIGINT) AS cum_prev,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n
      FROM hist
    ),
    targets AS (SELECT q FROM (VALUES {q_rows}) t(q)),
    hits AS (
      SELECT t.q, c.bin, c.lo, c.width, c.cnt, c.cum_prev, c.n,
             (c.n * t.q + 99) // 100 AS r,
             ROW_NUMBER() OVER (PARTITION BY t.q ORDER BY c.bin) AS rk
      FROM targets t
      JOIN cum c ON c.cum >= (c.n * t.q + 99) // 100
    )
    SELECT CAST(q AS BIGINT) AS q,
           CAST(lo + ((r - cum_prev) * width) // cnt AS BIGINT) AS est,
           n
    FROM hits WHERE rk = 1
    """


# ---------------------------------------------------------------------------
# Bloom-filter membership sketch
# ---------------------------------------------------------------------------
# The membership member of the sketch family (distinct -> HLL/KMV,
# frequency -> CM, quantiles -> log2-hist): the cross-crawl URL-dedup
# primitive — build a bit array from one crawl's keys, probe another
# crawl's keys without joining the two corpora. Positions are the first
# ``hexd`` hex digits of a salted md5: EXACTLY uniform over 16^hexd bits
# (no modulo bias), replayable in ANSI SQL. The filter is (word, bits)
# rows — 32 bits per BIGINT word (DuckDB overflows a 1<<63 shift, and a
# sign-free mask keeps the `=` membership compare trivially portable);
# 16^hexd/32 words total (hexd=3 -> 4096 bits / 128 words). Cohorts merge
# by word-wise bit_or — per-day filters fold into monthly without raw
# keys. False positives are a deterministic function of the bit layout,
# so both engines return the SAME false positives: the membership column
# itself is oracle-checkable bit-for-bit. At 100 TB, size by the standard
# m = -n ln(p)/ln(2)^2 rule (hexd=8 gives 4.3e9 bits for ~1e9 keys at
# ~1.5% fpr with k=4); beyond that, shard into per-cohort filters keyed
# by a key-range prefix and probe the matching shard.

BLOOM_HASHES = 4
BLOOM_HEXD = 3


def bloom_addr_col(v: Column, j: int, hexd: int = BLOOM_HEXD) -> Column:
    """(word, mask) address for hash row ``j``."""
    h = F.md5(F.concat(F.lit(f"b{j}:"), v.cast("string")).cast("binary"))
    pos = F.conv(F.substring(h, 1, hexd), 16, 10).cast("long")
    return F.struct(
        F.shiftrightunsigned(pos, 5).alias("word"),
        # F.shiftleft only takes a literal shift; call the SQL builtin so
        # the bit index can be a column
        F.call_function("shiftleft", F.lit(1).cast("long"),
                        (pos % 32).cast("int")).alias("mask"),
    )


def bloom_addr_sql(v: str, j: int, hexd: int = BLOOM_HEXD) -> tuple[str, str]:
    pos = (f"CAST('0x' || substr(md5('b{j}:' || CAST({v} AS VARCHAR)),"
           f" 1, {hexd}) AS BIGINT)")
    return (f"({pos} // 32)", f"(CAST(1 AS BIGINT) << CAST({pos} % 32 AS INT))")


def bloom_build(df: DataFrame, key: str, k: int = BLOOM_HASHES,
                hexd: int = BLOOM_HEXD) -> DataFrame:
    """The filter as (word, bits) rows — at most 16^hexd/32 of them.

    Plan: a row-local generator fans each key into ``k`` addresses, the
    bit_or hash aggregate partials-then-merges, and the exchange is
    bounded by the filter size, not the data."""
    addrs = F.array(*[bloom_addr_col(F.col(key), j, hexd) for j in range(k)])
    return (
        df.select(F.explode(addrs).alias("a"))
        .groupBy(F.col("a.word").alias("word"))
        .agg(F.expr("bit_or(a.mask)").cast("long").alias("bits"))
    )


def bloom_build_sql(table: str, key: str, k: int = BLOOM_HASHES,
                    hexd: int = BLOOM_HEXD) -> str:
    arms = "\nUNION ALL\n".join(
        "SELECT {} AS word, {} AS mask FROM {}".format(
            *bloom_addr_sql(key, j, hexd), table)
        for j in range(k)
    )
    return (f"SELECT word, CAST(bit_or(mask) AS BIGINT) AS bits"
            f" FROM ({arms}) GROUP BY word")


def bloom_contains(sketch: DataFrame, probes: DataFrame, key: str,
                   k: int = BLOOM_HASHES, hexd: int = BLOOM_HEXD) -> DataFrame:
    """One row per probe row with ``in_bloom`` 0/1: 1 iff all ``k``
    addressed bits are set. A word never written reads as 0 (bit clear).

    Plan: ``k`` chained broadcast LEFT joins of the (tiny) filter, one per
    hash row, then a row-local AND — ZERO exchanges on the probe side
    (the explode+regroup alternative re-shuffles the whole probe corpus
    by key, which defeats the point of the filter at 100 TB). Input rows
    pass through 1:1; dedupe probes first if ``key`` repeats.

    The filter build feeds all ``k`` joins as IDENTICAL (alias-only, no
    per-side rename) subplans: a rename Project would be pushed below the
    build exchange by Catalyst and break canonical equality, but aliased
    sides canonicalize equal, so AQE stage reuse executes the build —
    including the history-corpus scan — exactly once (verified: the whole
    query runs in 5 stages, one of them the build shuffle, not 4)."""
    shared = sketch
    out = probes
    hits = []
    for j in range(k):
        a = bloom_addr_col(F.col(key), j, hexd)
        out = out.withColumn(f"__m{j}", a["mask"]).withColumn(f"__w{j}",
                                                              a["word"])
        side = shared.alias(f"__s{j}")
        out = out.join(F.broadcast(side),
                       F.col(f"__s{j}.word") == F.col(f"__w{j}"), "left")
        hits.append(
            (F.coalesce(F.col(f"__s{j}.bits"), F.lit(0).cast("long"))
             .bitwiseAND(F.col(f"__m{j}")) == F.col(f"__m{j}")))
    all_hit = hits[0]
    for h in hits[1:]:
        all_hit = all_hit & h
    return out.select(F.col(key), all_hit.cast("long").alias("in_bloom"))


def bloom_contains_sql(sketch_sql: str, probes_table: str, key: str,
                       k: int = BLOOM_HASHES, hexd: int = BLOOM_HEXD) -> str:
    """Twin of the join-form membership test: one LEFT join per hash row
    against the filter, AND of the bit tests, one output row per probe."""
    addrs = [bloom_addr_sql(key, j, hexd) for j in range(k)]
    joins = "\n".join(
        f"LEFT JOIN ({sketch_sql}) s{j} ON s{j}.word = {w}"
        for j, (w, _) in enumerate(addrs))
    cond = " AND ".join(
        f"(COALESCE(s{j}.bits, 0) & {m}) = {m}"
        for j, (_, m) in enumerate(addrs))
    return f"""
      SELECT p.{key},
             CAST(CASE WHEN {cond} THEN 1 ELSE 0 END AS BIGINT) AS in_bloom
      FROM {probes_table} p
      {joins}
    """

"""Skew-immune top-k per group: two-phase salted selection.

The webtext counterpart of the reference's per-cell keep-N discipline
(/root/reference/osmsplit/osmsplit.cpp:223-258 keeps per-cell winners)
and the FineWeb/C4 per-host document cap: keep the k best rows of each
group under a total order, where single groups can hold 10^8-10^9 rows
(one host crawled a billion times — exactly the group a cap exists
for).

A plain ``row_number() OVER (PARTITION BY group ...)`` buffers and
sorts the whole hot group in ONE task (windows have no partial
aggregation — the r3-verdict dedup_paragraphs failure mode). Here:

1. **Salted phase** — rank within ``(group, salt)`` where salt =
   ``xxhash64(tiebreak) % n_salt`` (row-local, deterministic); keep
   ranks <= k. The hot group's sort splits across ``n_salt`` tasks,
   each bounded by |group| / n_salt.
2. **Merge phase** — rank the survivors within ``group``; keep <= k.
   Phase-2 group size is <= k * n_salt REGARDLESS of data skew — a
   constant, so the second window is safe by construction.

Both phases are windows over bounded partitions, all JVM-side; the
result is EXACTLY the unsalted top-k whenever the order is total (the
callers pass a unique tiebreak), so the DuckDB oracle twin is a plain
ROW_NUMBER.

Sizing: n_salt trades parallelism against merge fan-in. At 100 TB with
10^9-row hot groups, n_salt=4096 bounds phase-1 tasks at ~250k rows
and phase-2 at k*4096 rows. Groups smaller than n_salt just see a few
singleton buckets — overhead is one extra bounded window pass.

Interplay with Spark 4's rank-limit pushdown: the optimizer inserts a
map-side ``WindowGroupLimit`` before EACH phase's exchange (asserted
in tests/test_topk.py), so even the unsalted window only ships <= k
rows per group per upstream task. That bounds the hot-group sort at
k * n_input_tasks — fine at mid scale but still one task doing a
k*10^6-row sort on a 10^6-task input. The salted phase caps the merge
at k * n_salt INDEPENDENT of input task count, which is the bound you
want at 10^12 rows; below that scale the salt costs one extra
already-bounded window pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(df: DataFrame, group_cols: list[str],
                   order: list[Column], k: int,
                   salt_col: Column, n_salt: int = 64,
                   rank_name: str = "rank") -> DataFrame:
    """Rows of ``df`` whose rank under ``order`` within ``group_cols``
    is <= ``k``, plus a ``rank_name`` LONG column (1-based).

    ``order`` must be a TOTAL order (include a unique tiebreak column,
    e.g. ``[F.col("score").desc(), F.col("doc_id").asc()]``) — with
    ties across the salt boundary the salted result is otherwise
    nondeterministic. ``salt_col`` is any row-local expression with
    high cardinality (typically the tiebreak id); it is hashed, never
    shipped.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    salt = F.pmod(F.xxhash64(salt_col), F.lit(n_salt))
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order)
    w2 = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__salt", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .withColumn(rank_name, F.row_number().over(w2).cast("long"))
        .filter(F.col(rank_name) <= k)
        .drop("__salt", "__r1")
    )


def cap_per_group(df: DataFrame, group_cols: list[str],
                  order: list[Column], k: int, salt_col: Column,
                  n_salt: int = 64) -> DataFrame:
    """``topk_per_group`` without the rank column — the per-host
    document cap shape (schema-preserving filter)."""
    return topk_per_group(df, group_cols, order, k, salt_col,
                          n_salt).drop("rank")

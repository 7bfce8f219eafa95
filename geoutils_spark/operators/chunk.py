"""Fixed-window document chunking with overlap — the retrieval/RAG and
context-window prep stage (split every document into size-``size`` token
windows advancing by ``stride``; trailing partial windows kept).

Pure row-local array program: tokenize, enumerate window starts with a
``sequence``, slice + rejoin per start, one ``posexplode``. ZERO
exchanges — chunking a 100 TB corpus is embarrassingly parallel and this
plan keeps it that way (the output is written partition-parallel; any
downstream embedding/indexing stage sees (doc_id, chunk_id) keys that
are a pure function of the row)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(docs: DataFrame, size: int, stride: int,
                    id_col: str = "doc_id", text: str = "text",
                    sep: str = " ") -> DataFrame:
    """(id, chunk_id, n_tokens, chunk) — windows [k*stride, k*stride+size)
    over the ``sep``-token stream, for every start < n_tokens; empty
    documents produce no chunks. ``chunk_id`` is 0-based window rank."""
    if stride <= 0 or size <= 0:
        raise ValueError(f"size/stride must be positive, got {size}/{stride}")
    toks = F.split(F.col(text), sep)
    n = F.when(F.col(text) == "", F.lit(0)).otherwise(F.size(toks))
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))) \
        .otherwise(F.array().cast("array<int>"))
    chunks = F.transform(starts, lambda s: F.struct(
        F.array_join(F.slice(toks, s + 1, size), sep).alias("chunk"),
        F.least(n - s, F.lit(size)).alias("n_tokens")))
    return (docs
            .select(F.col(id_col), F.posexplode(chunks)
                    .alias("chunk_id", "c"))
            .select(id_col, "chunk_id", F.col("c.n_tokens").alias("n_tokens"),
                    F.col("c.chunk").alias("chunk")))


def chunk_documents_sql(corpus_cte: str, size: int, stride: int,
                        id_col: str = "doc_id", text: str = "text") -> str:
    """DuckDB twin (space separator): identical window enumeration and
    slicing, chunk_id from the start rank."""
    return f"""
    SELECT {id_col},
           CAST(s.i AS INT) AS chunk_id,
           CAST(LEAST(len(l) - s.i * {stride}, {size}) AS INT) AS n_tokens,
           array_to_string(l[s.i * {stride} + 1 : s.i * {stride} + {size}],
                           ' ') AS chunk
    FROM (SELECT {id_col},
                 CASE WHEN {text} = '' THEN []
                      ELSE string_split({text}, ' ') END AS l
          FROM {corpus_cte}),
         UNNEST(range(0, CAST(ceil(len(l) / CAST({stride} AS DOUBLE))
                              AS BIGINT))) AS s(i)
    """

"""End-to-end training-corpus preparation: the composition every LLM data
pipeline runs, expressed as one declarative chain over the engine's own
operators (reference has no analog — this is the webtext mission the graft
adds on top of the geoutils operator set; see SURVEY §2.10, SCALE.md).

Stage order is the cheap-filter-first discipline:

1. language-ID + quality gate   (row-local codegen; cuts the corpus early)
2. PII redaction                (row-local chained regexp)
3. exact dedup                  (md5 hash-agg, min-id keeper)
4. MinHash+LSH near-dedup       (ids-only band join, survivor payloads,
                                 exact-Jaccard verify, pointer-doubling
                                 clusters, min-id keeper)
5. benchmark decontamination    (broadcast eval-suite 8-gram set; corpus
                                 side row-local — never shuffled)
6. deterministic hash split     (row-local md5 buckets train/val/test)

Every stage is a DataFrame -> DataFrame function of the already-tested
operators; nothing here collects, and the only corpus-wide exchanges in
the whole chain are the two the dedup tier owns (hash-agg on md5; the
ids-only LSH band join). At 100 TB the chain pipelines inside one scan
until the exact-dedup exchange.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geoutils_spark.functions import pii as PII
from geoutils_spark.functions import textanalysis as TA
from geoutils_spark.operators.dedup import dedup_keepers, minhash_lsh_pairs

SPLIT_BUCKETS = (("train", 0, 90), ("val", 90, 95), ("test", 95, 100))


def quality_gate(docs: DataFrame, min_tokens: int = 20) -> DataFrame:
    """Stage 1: language-ID + Gopher-style quality keep, row-local."""
    toks = TA.tokens_col(F.col("text"))
    return (
        docs.withColumn("lang_pred", TA.langid_col(toks))
        .filter(TA.quality_keep_col(F.col("text"), min_tokens=min_tokens))
    )


def redact(docs: DataFrame) -> DataFrame:
    """Stage 2: mask emails/phones/IPs in place; keep per-doc counts."""
    t = F.col("text")
    counts = PII.pii_count_cols(t)
    return docs.select(
        *[c for c in docs.columns if c != "text"],
        PII.redact_col(t).alias("text"),
        sum(counts.values(), F.lit(0)).cast("int").alias("n_pii"),
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Stage 3: one keeper (min id) per identical text."""
    hashed = docs.withColumn("__h", F.md5(F.col("text").cast("binary")))
    keep = hashed.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return hashed.join(keep, ["__h", id_col], "left_semi").drop("__h")


def dedup_near(docs: DataFrame, id_col: str = "doc_id",
               min_est_jaccard: float = 0.5,
               min_jaccard: float = 0.7) -> DataFrame:
    """Stage 4: LSH candidates -> exact-Jaccard verify -> transitive
    clusters -> drop all but the min id of each cluster."""
    pairs = minhash_lsh_pairs(docs, id_col=id_col,
                              min_est_jaccard=min_est_jaccard)
    verified = (
        pairs.filter(F.col("exact_jaccard") >= min_jaccard)
        .select("id_a", "id_b")
        .localCheckpoint()  # caps lineage before the iterative closure
    )
    drop = (
        dedup_keepers(verified)
        .filter(~F.col("keep"))
        .select(F.col("node").alias(id_col))
    )
    return docs.join(drop, id_col, "left_anti")


def dedup_paragraphs(docs: DataFrame, sep: str = "\n",
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """C4-style global paragraph dedup: split each document on ``sep``,
    keep only the globally-first occurrence (min ``(doc_id, position)``)
    of every distinct non-empty paragraph, and reassemble each document's
    surviving paragraphs in their original order. Documents left with no
    paragraphs disappear from the output (C4 drops them too). Output adds
    ``n_paras`` (surviving-paragraph count); other input columns are not
    carried (join back on ``id_col`` if needed).

    Plan: posexplode -> groupBy(md5(paragraph)).agg(min_by(struct(doc_id,
    pos, para), struct(doc_id, pos))) -> groupBy(doc_id) rebuild. Two
    exchanges, both on uniform keys (md5 of paragraph bytes; doc id);
    total shuffled bytes ~= corpus size once per exchange — the same cost
    class as the exact-dedup stage, with no candidate blowup because
    paragraph identity is exact, not approximate.

    Skew immunity (r3 VERDICT #2): first-occurrence selection is a
    partial-aggregating ``min_by`` under a hash aggregate, NOT a
    ``row_number`` window — a boilerplate paragraph duplicated 10^8-10^9
    times ("Advertisement", cookie banners: exactly what C4 dedup exists
    to kill) combines map-side down to one candidate per task before the
    exchange, instead of landing every copy in ONE window task that must
    buffer-and-sort the whole group (windows have no partial
    aggregation). Struct comparison is lexicographic, so
    ``min_by(payload, struct(doc_id, pos))`` reproduces ``ORDER BY
    doc_id, pos`` exactly; (doc_id, pos) is unique per occurrence, so the
    choice is total and deterministic. tests/test_corpus.py drives a
    one-paragraph-in-every-doc fixture through it and asserts no Window
    node in the plan.
    """
    paras = docs.select(
        F.col(id_col),
        # re.escape: F.split takes a regex; sep is meant literally
        F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias(
            "pos", "para"),
    ).filter(F.col("para") != "")
    firsts = (
        paras.groupBy(F.md5(F.col("para").cast("binary")).alias("__h"))
        .agg(F.min_by(F.struct(id_col, "pos", "para"),
                      F.struct(id_col, "pos")).alias("__first"))
        .select(F.col(f"__first.{id_col}").alias(id_col),
                F.col("__first.pos").alias("pos"),
                F.col("__first.para").alias("para"))
    )
    return firsts.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias(text_col),
        F.count(F.lit(1)).alias("n_paras"),
    )


def dedup_lines(docs: DataFrame, sep: str = "\n",
                text_col: str = "text") -> DataFrame:
    """Within-document line dedup (the RefinedWeb/C4 boilerplate-line
    stage that precedes global dedup: nav menus, cookie banners, and
    footer lines repeat INSIDE a page): split on ``sep``, drop empty
    lines, keep each distinct line's FIRST occurrence in document order,
    reassemble. Adds ``n_lines`` (kept) and ``n_dupes`` (dropped).

    ENTIRELY row-local — higher-order array functions inside whole-stage
    codegen, zero exchanges at any corpus size (contrast
    ``dedup_paragraphs``, which is global and costs two exchanges).
    First-occurrence test is ``array_position(lines, x) == i + 1``
    (1-based first index vs 0-based lambda index) — O(k^2) in a doc's
    line count, fine for real pages (k ~ 10^2) and still scan-bound."""
    others = [c for c in docs.columns if c != text_col]
    lines = F.filter(
        F.split(F.col(text_col), re.escape(sep)), lambda x: x != F.lit(""))
    d = docs.withColumn("__lines", lines)
    kept = F.filter(
        F.col("__lines"),
        lambda x, i: F.array_position(F.col("__lines"), x) == i + 1)
    return d.select(
        *others,
        F.array_join(kept, sep).alias(text_col),
        F.size(kept).cast("long").alias("n_lines"),
        (F.size("__lines") - F.size(kept)).cast("long").alias("n_dupes"),
    )


def keep_latest(snapshots: DataFrame, key_col: str = "url_key",
                ts_col: str = "warc_ts",
                id_col: str = "doc_id") -> DataFrame:
    """Recrawl dedup: collapse every group of crawl snapshots sharing a
    canonical key (``urls.url_normalize_col`` output) to the single
    newest row — max ``(ts_col, id_col)``, struct-lexicographic so ties
    on the timestamp break deterministically by id. Adds ``n_snapshots``
    (group size). This is the keep-one-per-URL pass a Common-Crawl-style
    pipeline runs before content dedup: the same page recrawled monthly
    contributes one row, not twelve.

    Scale shape: a single partial-aggregating ``max_by`` hash aggregate —
    map-side combine collapses each task's snapshots of a hot URL to one
    candidate before the exchange, so a URL recrawled 10^6 times (or a
    crawler trap) costs one row per upstream task, never a single-task
    window sort (the same skew-immunity argument as
    ``dedup_paragraphs``). One exchange on the uniform md5-normalized key,
    carrying exactly one payload row per (task, key).
    """
    payload = [c for c in snapshots.columns if c != key_col]
    out = snapshots.groupBy(key_col).agg(
        F.max_by(F.struct(*payload), F.struct(ts_col, id_col)).alias("__r"),
        F.count(F.lit(1)).cast("long").alias("n_snapshots"),
    )
    return out.select(
        key_col,
        *[F.col(f"__r.{c}").alias(c) for c in payload],
        "n_snapshots",
    )


def pack_sequences(docs: DataFrame, budget: int = 2048, n_shards: int = 64,
                   id_col: str = "doc_id",
                   token_col: str = "n_tokens") -> DataFrame:
    """Concat-and-chunk sequence packing (the layout step that turns a
    filtered corpus into fixed-width LLM training sequences): documents
    are laid end-to-end in a deterministic pseudo-random order and cut
    into ``budget``-token sequences. Each doc gets ``(shard, seq_id,
    seq_off)`` — the sequence its FIRST token lands in and the offset
    inside it; a doc whose tail crosses a boundary continues into the
    next sequence (standard concat-and-chunk semantics — no padding, no
    doc-level bin packing, which is what GPT-style pretraining uses).

    Determinism + distribution: the order is ``(md5(id), id)`` inside
    ``n_shards`` md5-prefix shards, so the layout is a pure function of
    the doc ids — stable under repartitioning and re-runs (same property
    as ``hash_split``). The running total is a window per shard: ONE
    exchange on the uniform shard key, then an in-task sort of
    corpus/n_shards rows. ``n_shards`` is the parallelism/skew dial —
    size it so a shard's (id, tokens) pairs fit a task's sort buffer
    (at 100 TB with 2^14 shards a shard is ~60M 24-byte pairs; the
    payload text does NOT ride through the window, join it back on id).
    """
    h = F.md5(F.col(id_col).cast("string").cast("binary"))
    d = docs.select(
        F.col(id_col), F.col(token_col).cast("long").alias(token_col),
        h.alias("__h"),
    ).withColumn(
        "shard",
        F.pmod(F.conv(F.substring("__h", 1, 8), 16, 10).cast("long"),
               F.lit(n_shards)),
    )
    w = (Window.partitionBy("shard").orderBy("__h", id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.sum(token_col).over(w) - F.col(token_col))
    packed = d.select(id_col, token_col, "shard", start.alias("__start"))
    return packed.select(
        id_col, token_col, "shard",
        F.expr(f"__start DIV {int(budget)}").alias("seq_id"),
        F.pmod(F.col("__start"), F.lit(int(budget))).alias("seq_off"),
    )


def decontaminate(docs: DataFrame, benchmarks: DataFrame,
                  k: int = 8, max_hits: int = 0) -> DataFrame:
    """Stage 5: drop docs sharing more than ``max_hits`` k-gram
    fingerprints with the (broadcast) benchmark suite."""
    bench_grams = (
        benchmarks.select(
            F.explode(TA.word_shingles_col(F.col("text"), k)).alias("gram"))
        .distinct()
    )
    corpus_grams = docs.select(
        "doc_id",
        F.explode(TA.word_shingles_col(F.col("text"), k)).alias("gram"))
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("__hits"))
        .filter(F.col("__hits") > max_hits)
        .select("doc_id")
    )
    return docs.join(hits, "doc_id", "left_anti")


def hash_split(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Stage 6: stable train/val/test assignment from md5(id) % 100."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")
                                 .cast("binary")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    expr = F.lit(None).cast("string")
    for name, lo, hi in reversed(SPLIT_BUCKETS):
        expr = F.when((bucket >= lo) & (bucket < hi), name).otherwise(expr)
    return docs.withColumn("split", expr)


def prepare_corpus(docs: DataFrame, benchmarks: DataFrame,
                   min_tokens: int = 20,
                   min_est_jaccard: float = 0.5,
                   min_jaccard: float = 0.7,
                   collect_counts: bool = True,
                   storage_level: "StorageLevel | None" = None,
                   nfc_normalize: bool = False,
                   line_dedup_sep: str | None = None,
                   classifier_weights: "DataFrame | None" = None,
                   classifier_threshold: int = 0,
                   classifier_n_buckets: int | None = None,
                   blocklist: "DataFrame | None" = None,
                   robots: "DataFrame | None" = None,
                   robots_agent: str = "*",
                   url_col: str = "url",
                   exactsubstr_k: int | None = None,
                   importance_target: "DataFrame | None" = None,
                   importance_k: int | None = None,
                   importance_n_buckets: int | None = None,
                   ) -> tuple[DataFrame, dict]:
    """The full chain. Returns (final corpus with lang_pred/n_pii/split
    columns, per-stage survivor counts).

    Optional r4 stages (all default OFF, leaving the pinned 6-stage
    funnel oracle and scan-once probe untouched): ``nfc_normalize`` runs
    Unicode NFC + whitespace/control cleanup fused into the stage-1 scan
    (row-local, no extra boundary); ``classifier_weights`` adds the
    hashed-linear model gate after the rules gate (broadcast model, per-doc
    scores rejoin through one by-id exchange, ``score`` column kept);
    ``line_dedup_sep`` adds within-document boilerplate-line dedup before
    exact dedup so content hashes see cleaned text (zero-exchange,
    ``n_lines``/``n_dupes`` columns kept).

    Optional r5 stages (also default OFF): ``blocklist`` (a ``domain``
    table) drops docs whose ``url_col`` host or any parent domain is
    listed, fused into the stage-1 scan; ``exactsubstr_k`` cuts every
    corpus-duplicated >=k-token span before exact dedup (Lee et al.,
    docs cut to nothing vanish, ``n_cut_tokens`` kept);
    ``importance_target``+``importance_k`` keep only the k most
    target-like docs (DSIR) as the LAST gate; ``robots`` (a (host,
    robots_txt) dim) drops docs their host's robots.txt disallows for
    ``robots_agent`` (retroactive opt-out sweeps; rules resolve once per
    host and broadcast — functions/robots.py), fused into stage 1 next
    to the blocklist. The full ordering is:
    blocklist -> robots -> normalize -> rules gate -> redact ->
    classifier gate -> line dedup -> exactsubstr cut -> exact dedup ->
    near dedup -> decontaminate -> importance top-k -> split.

    Single-pass execution (r3 VERDICT/ADVICE item): every stage boundary
    is ``persist()``-ed (default ``DISK_ONLY`` — the 100 TB choice: one
    sequential spill write per stage instead of 2-5 full upstream
    recomputations, and disk blocks are never evicted under memory
    pressure the way deserialized memory blocks are). The boundary counts
    then each read the PREVIOUS stage's cache and compute only their own
    stage, so the quality gate / redaction / dedup tiers execute exactly
    once per run — previously each ``count()`` plus the self-joins inside
    ``dedup_exact``/``dedup_near``/``decontaminate`` re-ran the whole
    upstream chain (~5x the scan at the last stage). The input count rides
    an ``Observation`` BELOW the first persist: one scan serves both the
    input counter and stage 1. tests/test_corpus.py asserts scan-once with
    an accumulator probe.

    ``collect_counts=False`` returns an empty dict and runs no boundary
    counters; the near-dedup tier's own bounded internal actions (eager
    localCheckpoint of the verified pair list, iterative closure) still
    fire on construction, materializing the stage caches on the way — the
    input is still scanned once (at most twice per partition if
    dedup_exact's two concurrent map stages race on a cold cache).

    Intermediate caches are released once their downstream neighbor is
    materialized; the LAST stage stays persisted so the caller's write +
    any follow-up aggregations reuse it (call ``.unpersist()`` on the
    returned frame's source or ``spark.catalog.clearCache()`` when done).
    """
    from pyspark import StorageLevel
    from pyspark.sql.observation import Observation

    if storage_level is None:
        storage_level = StorageLevel.DISK_ONLY

    counts: dict[str, int] = {}
    obs_in = Observation() if collect_counts else None
    if collect_counts:
        docs = docs.observe(obs_in, F.count(F.lit(1)).alias("n_input"))

    cached: list[DataFrame] = []

    def boundary(df: DataFrame, key: str | None) -> DataFrame:
        df = df.persist(storage_level)
        if collect_counts and key is not None:
            counts[key] = df.count()  # materializes this stage's cache
        cached.append(df)
        return df

    # optional stage 0 (r4, FineWeb-style extras — default OFF so the
    # pinned 6-stage funnel oracle and scan-once probe are untouched):
    # NFC normalize is row-local and 1:1, so it fuses into the stage-1
    # scan without its own boundary.
    if nfc_normalize:
        from geoutils_spark.functions import textnorm as TN

        others = [c for c in docs.columns if c != "text"]
        docs = docs.select(*others,
                           TN.normalize_col(F.col("text")).alias("text"))

    # optional r5 stage: URL blocklist (C4/RefinedWeb run it FIRST — the
    # cheapest gate prunes rows before any text-derived work). Row-local
    # host-suffix explode (ids only) + broadcast semi + broadcast anti
    # back onto the scan; fuses into the stage-1 boundary below, so the
    # after_quality count reflects both gates — C4-style per-gate counts
    # would need a boundary persist per gate, the wrong trade at 100 TB
    # for a row filter this cheap.
    if blocklist is not None:
        from geoutils_spark.functions import urls as _U

        if url_col not in docs.columns:
            raise ValueError(
                f"blocklist filtering needs a {url_col!r} column; "
                f"docs has {docs.columns}")
        docs = _U.blocklist_filter(docs, blocklist, url_col=url_col)

    # optional r5 stage: robots.txt gate (same URL-tier slot and the same
    # zero-corpus-shuffle shape: per-host rules resolve on the dim side,
    # broadcast, row-local match; fused into the stage-1 boundary).
    if robots is not None:
        from geoutils_spark.functions import robots as _RB

        if url_col not in docs.columns:
            raise ValueError(
                f"robots filtering needs a {url_col!r} column; "
                f"docs has {docs.columns}")
        docs = _RB.robots_filter(docs, robots, url_col=url_col,
                                 agent=robots_agent)

    # stage 1+2 share a boundary: both row-local, nothing between them
    # branches, and redact is 1:1 so this count IS the after-quality count.
    d = boundary(redact(quality_gate(docs, min_tokens=min_tokens)),
                 "after_quality")
    if collect_counts:
        counts["input"] = int(obs_in.get["n_input"])
    key_order = ["input", "after_quality"]
    # optional model-based quality gate (classifier inference over hashed
    # bag-of-words with an explicitly broadcast MODEL; the per-doc score
    # table rejoins the payload through one by-id exchange — the same
    # join-back shape as the LSH survivor rule, NEVER a broadcast of a
    # corpus-sized table)
    if classifier_weights is not None:
        from geoutils_spark.operators import classifier as CL

        # Token buckets MUST hash into the same space the weights were
        # trained for — scoring a 2^12-bucket model in the default 2^18
        # space silently maps most tokens to absent buckets (score 0) and
        # the rest to the wrong weights. Callers that know the model size
        # pass it; otherwise infer it once from the (small, broadcastable)
        # weights table as max(bucket)+1 — exact for synthetic_weights_df
        # and any dense table, and an upper bound that preserves hash
        # parity only when it equals the true modulus, so prefer explicit.
        if classifier_n_buckets is None:
            classifier_n_buckets = int(
                classifier_weights.agg(
                    F.max("bucket").cast("long")).first()[0]) + 1
        scores = CL.score_broadcast(
            d, classifier_weights, n_buckets=classifier_n_buckets,
            threshold=classifier_threshold
        ).filter(F.col("keep")).select("doc_id", "score")
        d = boundary(d.join(scores, "doc_id"), "after_classifier")
        key_order.append("after_classifier")
    # optional within-document boilerplate-line dedup (zero-exchange,
    # row-local) BEFORE exact dedup so content hashes see cleaned text
    if line_dedup_sep is not None:
        d = boundary(dedup_lines(d, sep=line_dedup_sep), "after_line_dedup")
        key_order.append("after_line_dedup")
    # optional r5 stage: ExactSubstr span cutting (Lee et al. ACL 2022)
    # before exact dedup, so content hashes see boilerplate-free text;
    # docs cut down to nothing vanish here (the count's delta).
    if exactsubstr_k is not None:
        from geoutils_spark.operators import exactsubstr as XS

        d = boundary(XS.cut_spans(d, k=exactsubstr_k),
                     "after_exactsubstr")
        key_order.append("after_exactsubstr")
    d = boundary(dedup_exact(d), "after_exact_dedup")
    d = boundary(dedup_near(d, min_est_jaccard=min_est_jaccard,
                            min_jaccard=min_jaccard), "after_near_dedup")
    d = boundary(decontaminate(d, benchmarks), "after_decontaminate")
    tail_keys = ["after_exact_dedup", "after_near_dedup",
                 "after_decontaminate"]
    # optional r5 stage: DSIR importance selection (Xie et al. NeurIPS
    # 2023) LAST — every gate above cheapens the scoring pass, and the
    # target-likeness ranking should see the cleaned corpus. Ids-only
    # top-k semi-joins back onto the decontaminated cache.
    if importance_target is not None and importance_k:
        from geoutils_spark.operators import importance as IM

        kw = {} if importance_n_buckets is None else {
            "n_buckets": importance_n_buckets}
        top = IM.importance_topk(d, importance_target, k=importance_k,
                                 **kw).select("doc_id")
        d = boundary(d.join(F.broadcast(top), "doc_id"),
                     "after_importance")
        tail_keys.append("after_importance")
    if collect_counts:
        # stage order in the dict mirrors the funnel
        counts = {k: counts[k] for k in key_order + tail_keys}
        for c in cached[:-1]:  # final stage stays cached for the caller
            c.unpersist(blocking=False)
    return hash_split(d), counts

"""Stream-stream interval join: click->conversion attribution.

The missing piece of the streaming tier next to windows/sessions/dedup/
latest: correlating TWO event streams by key within a time horizon
(click -> purchase attribution, request -> response matching, fetch ->
render latency). Structured Streaming supports exactly this shape —
inner join with equi-key + event-time range condition — and bounds the
join STATE by watermark + horizon: a left row is held only until the
right watermark passes ``l.ts + horizon``, so state is
O(rate x (watermark + horizon)) regardless of stream length (the same
bounded-state discipline as the (band,key)-bucketed dedup store).

Batch parity: the same function on batch frames is a plain equi-join
with a range post-filter (SortMergeJoin on the key — no NestedLoop),
which is what the ``stream_attribution_batch`` oracle query pins.

At 100 TB-a-day rates the key exchange is the only shuffle; skewed keys
(one bot user clicking 10^6 times) salt exactly like the batch joins —
the horizon caps how many right rows a hot left row can match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame, key: str = "user_id",
                  lts: str = "ts", rts: str = "ts",
                  horizon: str = "30 minutes",
                  watermark: str = "1 hour") -> DataFrame:
    """Inner join: right rows whose event time lands in
    ``(l.ts, l.ts + horizon]`` for the same key. Columns come back
    prefixed ``l_`` / ``r_`` (key unprefixed). On streaming inputs both
    sides are watermarked so Spark can evict join state; on batch inputs
    the same plan is a key equi-join + range filter."""
    def prep(df: DataFrame, ts: str, prefix: str) -> DataFrame:
        df = df.withColumn(ts, F.col(ts).cast("timestamp"))
        if df.isStreaming:
            df = df.withWatermark(ts, watermark)
        cols = [F.col(key)] + [F.col(c).alias(prefix + c)
                               for c in df.columns if c != key]
        return df.select(*cols)

    l = prep(left, lts, "l_")
    r = prep(right, rts, "r_")
    cond = ((F.col("r_" + rts) > F.col("l_" + lts))
            & (F.col("r_" + rts)
               <= F.col("l_" + lts) + F.expr(f"INTERVAL {horizon}")))
    return l.join(r.withColumnRenamed(key, "__rk"),
                  (F.col(key) == F.col("__rk")) & cond,
                  "inner").drop("__rk")


def last_touch(pairs: DataFrame, conv_id: str = "r_event_id",
               click_id: str = "l_event_id",
               cts: str = "l_ts", pts: str = "r_ts") -> DataFrame:
    """Last-touch attribution over interval_join pairs: per conversion,
    the LATEST prior click (ties -> highest click id). Partial-agg-able
    max_by — no window, so a conversion matched by 10^6 bot clicks
    combines map-side (the dedup_paragraphs de-skew discipline)."""
    pick = F.max_by(
        F.struct(F.col(click_id).alias("cid"), F.col(cts).alias("cts")),
        F.struct(F.col(cts), F.col(click_id)))
    return (pairs.groupBy(F.col(conv_id).alias("conv_id"))
            .agg(pick.alias("__c"),
                 F.max(F.col(pts)).alias("__pts"))
            .select("conv_id", F.col("__c.cid").alias("click_id"),
                    (F.unix_micros(F.col("__pts"))
                     - F.unix_micros(F.col("__c.cts"))).alias("gap_us")))

"""Structured Streaming operators: watermarked event-time windows and
streaming cell histograms.

The reference is single-pass batch with no streaming semantics (SURVEY.md
§2.8); its closest analog is the one-pass visitor pipeline with bounded
per-group state (per-cell buffers, /root/reference/osms2split/src/
s2splitter.h:58-64). These operators give the engine the streaming side of
the same aggregations the batch queries pin (``rel_events_hourly``,
``geo_cell_histogram``): identical grouping semantics, incremental execution,
late data bounded by watermark.

Every transformation is a plain DataFrame op, so each works unchanged on a
batch frame (tested for batch/stream parity) — the Structured Streaming
guarantee the engine leans on instead of hand-rolled stateful code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoutils_spark.functions import cells as C


def _with_event_time(df: DataFrame, ts: str, watermark: str) -> DataFrame:
    """Normalize the event-time column to TIMESTAMP (parquet NTZ columns are
    rejected by watermarking; session TZ is pinned UTC so the cast is
    deterministic) and attach the watermark on streaming frames."""
    df = df.withColumn(ts, F.col(ts).cast("timestamp"))
    return df.withWatermark(ts, watermark) if df.isStreaming else df


def hourly_event_counts(events: DataFrame, ts: str = "ts",
                        watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour window per event_type with late-data watermark.

    Batch twin: ``rel_events_hourly`` (floor(epoch/3600) bucketing — the
    window start here equals that bucket * 3600).
    """
    df = _with_event_time(events, ts, watermark)
    return (
        df.groupBy(F.window(F.col(ts), "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
             .alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n",
                "total_value")
    )


def sliding_event_counts(events: DataFrame, ts: str = "ts",
                         window: str = "1 hour", slide: str = "15 minutes",
                         watermark: str = "2 hours") -> DataFrame:
    """Sliding windows — each event contributes to window/slide windows."""
    df = _with_event_time(events, ts, watermark)
    return (
        df.groupBy(F.window(F.col(ts), window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def streaming_cell_counts(points: DataFrame, level: int, ts: str = "ts",
                          lon: str = "lon", lat: str = "lat",
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Per-cell, per-window density — the streaming form of the reference's
    D×D histogram (A2, mapsplit.h:115-132): cell id via the same encoder the
    batch path uses, windowed by event time."""
    df = _with_event_time(points, ts, watermark)
    df = C.with_cell(df, lon, lat, level, "cell_id")
    return (
        df.groupBy(F.window(F.col(ts), window).alias("w"), "cell_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "cell_id", "n")
    )


def run_stream_to_memory(stream_df: DataFrame, query_name: str,
                         output_mode: str = "complete"):
    """Drive a streaming frame to the in-memory sink with availableNow (all
    data, then stop) — the hermetic test/bench harness for streams."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name).outputMode(output_mode)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return q

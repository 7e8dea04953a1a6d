"""Streaming window operators (SURVEY.md §2.9 extensions).

The true-streaming twins of operators/events.py: tumbling and sliding
event-time windows with watermarks for late data, and session windows
via ``session_window``. The batch forms are the hash-checked oracle
surface; these run the same logic incrementally.

Scale notes: watermark bounds state; the windowed aggregation state is
per (window, key) — with 1-hour windows and a bounded key space this is
small and RocksDB-spillable on a real cluster. ``availableNow`` turns
any of these into a catch-up backfill over accumulated files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_hourly_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    e = events.withWatermark("ts", watermark).withColumn(
        "value_c", F.round(F.col("value") * 100).cast("long")
    )
    g = e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("event_count"),
        (F.sum("value_c") / 100.0).cast("double").alias("total_value"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    )
    return g.select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "event_count",
        "total_value",
        "approx_users",
    )


def sliding_2h_hourly_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    e = events.withWatermark("ts", watermark).withColumn(
        "value_c", F.round(F.col("value") * 100).cast("long")
    )
    g = e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w")).agg(
        F.count(F.lit(1)).alias("event_count"),
        (F.sum("value_c") / 100.0).cast("double").alias("total_value"),
    )
    return g.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_count",
        "total_value",
    )


def dedup_events_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Stream dedup-by-key (§2.9 extension — the reference has none):
    drop replayed/duplicate events by event_id within the watermark
    horizon via ``dropDuplicatesWithinWatermark``. This is the
    at-least-once -> effectively-once repair stage an event-bus
    redelivery (the reference's EventBridge retries) needs.

    Scale notes: state is one entry per event_id seen within the
    watermark window — bounded by arrival rate x horizon, evicted by
    watermark advance (a plain dropDuplicates would grow state
    forever)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def session_window_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Structured Streaming session windows keyed by user with an
    inactivity gap — the streaming twin of
    operators.events.session_windows."""
    e = events.withWatermark("ts", watermark).withColumn(
        "value_c", F.round(F.col("value") * 100).cast("long")
    )
    g = e.groupBy(
        F.session_window("ts", gap).alias("w"), "user_id"
    ).agg(
        F.count(F.lit(1)).alias("event_count"),
        (F.sum("value_c") / 100.0).cast("double").alias("total_value"),
    )
    return g.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "event_count",
        "total_value",
    )

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


def dropped_late_rows(query) -> int:
    """Late-row accounting (§2.9 late/partial-data handling): total
    state-input rows dropped because they arrived behind the
    watermark, summed over the query's progress history. This is the
    per-batch ``numRowsDroppedByWatermark`` the stateful operators
    report — the stream-side analogue of the batch ingest layer's
    quarantine counts, and the number an ops dashboard alerts on when
    an upstream producer starts delivering outside the lateness SLA.

    Unit caveat: for windowed AGGREGATIONS the drop happens after the
    map-side partial aggregate, so the count is distinct late
    (window, key) groups per batch, not raw input rows (raw-row grain
    would need the pre-shuffle rows, which Spark filters only at the
    state boundary). For ``dropDuplicatesWithinWatermark`` state the
    unit IS the input row. Timing caveat: the late-event filter uses
    the PREVIOUS batch's watermark (SPARK-40925), so a row is only
    counted dropped once a prior batch has advanced the watermark past
    its window.

    Use ``recentProgress`` right after ``awaitTermination`` — the
    buffer is bounded (``spark.sql.streaming.numRecentProgressUpdates``,
    default 100), so long-lived queries should drain it per trigger via
    a StreamingQueryListener instead."""
    total = 0
    for p in query.recentProgress:
        for so in p.get("stateOperators", []):
            total += int(so.get("numRowsDroppedByWatermark", 0) or 0)
    return total


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

"""Stream-stream temporal join (SURVEY.md §2.9 extension — the
reference has no stream joins at all; its event chain is one-file-at-
a-time Lambda steps).

Structured Streaming's watermarked interval join is the streaming twin
of the batch interval-overlap join in operators/timejoin.py: two live
event streams joined on a key plus a bounded time window, with both
sides' state evicted by watermark once no future match is possible.

Scale notes: state per side is bounded by (arrival rate x (watermark
horizon + join window)); the join itself co-shuffles both streams on
the equality key, so a real cluster partitions by user and the range
predicate evaluates locally. Without the time bound Spark would have
to keep ALL history on both sides — the interval condition is what
makes the state finite, which is why the operator requires it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_attribution_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    window_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Every (click, purchase) pair for the same user where the
    purchase happens within ``window_minutes`` AFTER the click — the
    classic streaming attribution join. Both inputs are event streams
    (or static frames: the same plan runs in batch, which is what the
    parity test exploits).

    Emits one row per attributed pair: a click followed by two
    purchases inside the window produces two rows (attribution
    *candidates*; picking one is the downstream as-of/rank step)."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            < F.col("click_ts")
            + F.expr(f"INTERVAL {window_minutes} MINUTES")
        )
    )
    j = c.join(p, cond, "inner")
    return j.select(
        "click_id",
        "purchase_id",
        "user_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts_s"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "purchase_ts_s"
        ),
        F.round(F.col("purchase_value") * 100)
        .cast("long")
        .alias("purchase_value_c"),
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        )
        .cast("long")
        .alias("lag_sec"),
    )

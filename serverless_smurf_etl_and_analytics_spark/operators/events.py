"""Event-stream operators, batch form (SURVEY.md §2.9 extensions, A18,
O5, JSON scalar §2.8).

The reference is event-driven micro-batch with no true windowing; the
driver's ``events`` table lets us add the tumbling/sliding/session
window semantics a Spark-first engine should have. These are the batch
(replayable/backfill) forms; ``streaming/windows.py`` runs the same
logic as Structured Streaming with watermarks.

All value sums go through integer cents (functions.money rules) so the
batch results are hash-checkable against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _with_value_cents(events: DataFrame) -> DataFrame:
    return events.withColumn(
        "value_c", F.round(F.col("value") * 100).cast("long")
    )


def event_type_summary(events: DataFrame) -> DataFrame:
    """A18 (count-by-type, ``combine-insights/lambda_function.py:169-204``)
    + O5 (custom priority-ladder sort key,
    ``generate-recommendations/lambda_function.py:210-211``)
    + JSON extraction (§2.8): per-type counts, exact value sums, and the
    JSON payload field aggregated."""
    e = _with_value_cents(events).withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    priority = (
        F.when(F.col("event_type") == "error", 1)
        .when(F.col("event_type") == "purchase", 2)
        .when(F.col("event_type") == "signup", 3)
        .when(F.col("event_type") == "click", 4)
        .otherwise(5)
    )
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("event_count"),
        (F.sum("value_c") / 100.0).cast("double").alias("total_value"),
        F.countDistinct("user_id").alias("distinct_users"),
        F.sum("k").alias("k_sum"),
    )
    return g.withColumn("priority_rank", priority.cast("int"))


def tumbling_hourly(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour event-time windows: count, exact value sum,
    distinct users per (window, type)."""
    e = _with_value_cents(events)
    g = e.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("event_count"),
        (F.sum("value_c") / 100.0).cast("double").alias("total_value"),
        F.countDistinct("user_id").alias("distinct_users"),
    )
    return g.select(
        F.date_format("w.start", TS_FMT).alias("window_start"),
        "event_type",
        "event_count",
        "total_value",
        "distinct_users",
    )


def sliding_2h_hourly(events: DataFrame) -> DataFrame:
    """Sliding windows: 2-hour duration, 1-hour slide — each event lands
    in exactly two windows."""
    e = _with_value_cents(events)
    g = e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w")).agg(
        F.count(F.lit(1)).alias("event_count"),
        (F.sum("value_c") / 100.0).cast("double").alias("total_value"),
    )
    return g.select(
        F.date_format("w.start", TS_FMT).alias("window_start"),
        F.date_format("w.end", TS_FMT).alias("window_end"),
        "event_count",
        "total_value",
    )


def session_windows(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session windows with an inactivity gap: classic
    gaps-and-islands (lag + cumulative sum of new-session flags) — the
    batch twin of Structured Streaming's ``session_window``.

    Scale note: both windows partition by user_id only; the per-user
    event series is small, and the two window functions share one
    shuffle.
    """
    w_user = Window.partitionBy("user_id").orderBy("ts")
    e = (
        _with_value_cents(events)
        .withColumn("prev_ts", F.lag("ts").over(w_user))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_ts").isNull()
                | (
                    F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
                    > gap_minutes * 60
                ),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_seq",
            F.sum("new_session").over(
                w_user.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    g = e.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("event_count"),
        F.date_format(F.min("ts"), TS_FMT).alias("session_start"),
        F.date_format(F.max("ts"), TS_FMT).alias("session_end"),
        (F.sum("value_c") / 100.0).cast("double").alias("total_value"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("long")
        .alias("duration_sec"),
    )
    return g


def event_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """fun1: strict sequential funnel — a user converts step i only
    with an event of that type AT OR AFTER their step-(i-1)
    conversion time (first-touch semantics: the earliest qualifying
    event per step). Output: one row per step with the user count and
    conversion rates (basis points, integer) from the previous step
    and from step 1.

    Scale design: one aggregation per step, each keyed on user_id, and
    every inter-step join is user-keyed — so the whole chain
    co-shuffles on one key (a real cluster pays one repartition, then
    every stage is local). No windows over raw event streams, no
    per-user arrays; state per stage is one timestamp per user."""
    per_step: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, step in enumerate(steps):
        e = events.filter(F.col("event_type") == step).select(
            "user_id", "ts"
        )
        if prev is None:
            cur = e.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            cur = (
                e.join(prev.select("user_id", F.col("t").alias("t_prev")),
                       "user_id")
                .filter(F.col("ts") >= F.col("t_prev"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        per_step.append(
            cur.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
            .select(
                F.lit(i + 1).cast("long").alias("step_order"),
                F.lit(step).alias("step"),
                "n_users",
            )
        )
        prev = cur
    out = per_step[0]
    for df in per_step[1:]:
        out = out.unionByName(df)
    w_first = F.first("n_users").over(
        Window.orderBy("step_order").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    w_prev = F.lag("n_users").over(Window.orderBy("step_order"))
    return (
        out.withColumn(
            "conv_from_first_bp",
            F.round(F.col("n_users") * 10000.0 / w_first).cast("long"),
        )
        .withColumn(
            "conv_from_prev_bp",
            F.when(
                w_prev.isNotNull(),
                F.round(F.col("n_users") * 10000.0 / w_prev).cast("long"),
            ),
        )
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """coh1: weekly cohort retention — users cohorted by the ISO week
    of their first event; a cohort's week-N retention is the share of
    its users active in cohort_week + N. The standard growth-analytics
    companion to the funnel (fun1).

    Output: (cohort_week, week_offset, cohort_size, n_active,
    retention_bp), integer bp, offset 0 always 10000 by construction.

    Scale design: one min-per-user aggregation (cohort assignment),
    one distinct on (user, week) — both user-keyed, co-shuffled — then
    a bounded (cohorts x offsets) rollup; cohort sizes re-attach by
    broadcast. No windows, no per-user arrays."""
    wk = lambda c: F.date_trunc("week", c)  # noqa: E731
    first = events.groupBy("user_id").agg(
        wk(F.min("ts")).alias("cohort_wk")
    )
    active = (
        events.select("user_id", wk(F.col("ts")).alias("active_wk"))
        .distinct()
    )
    j = active.join(first, "user_id")
    g = j.groupBy("cohort_wk", "active_wk").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    sizes = first.groupBy("cohort_wk").agg(
        F.countDistinct("user_id").alias("cohort_size")
    )
    out = g.join(F.broadcast(sizes), "cohort_wk").select(
        F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
        (
            F.datediff(F.to_date("active_wk"), F.to_date("cohort_wk"))
            / 7
        )
        .cast("long")
        .alias("week_offset"),
        "cohort_size",
        "n_active",
        F.round(F.col("n_active") * 10000.0 / F.col("cohort_size"))
        .cast("long")
        .alias("retention_bp"),
    )
    return out

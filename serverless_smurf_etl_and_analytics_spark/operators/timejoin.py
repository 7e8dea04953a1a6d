"""Temporal join operators: as-of join and interval-overlap (range)
join — the two time-join shapes Spark's DataFrame API has no native
operator for (SURVEY.md LLM-pipeline brief; the reference has no
analogue — its event chain is point lookups per file,
``process-upload/lambda_function.py``).

Both are expressed as compositions of existing DataFrame ops (union +
running window; bucket-explode + equi-join), never ``crossJoin`` of
two fact-sized inputs, so they survive the 100 TB target:

- ``asof_join`` is ONE shuffle on the join key (the union sorts probes
  and quotes together) — the canonical distributed as-of, equivalent
  to kdb's ``aj`` / DuckDB's ``ASOF JOIN`` / pandas ``merge_asof``.
- ``interval_overlap_join`` picks between a broadcast nested-loop
  (interval side is dimension-sized — the optimal plan for bounded
  interval sets) and a bucket-equi-join (both sides large: intervals
  explode to covered time buckets, points hash to exactly one bucket,
  so the equi-join needs no post-dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_MIN = 60_000_000


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    attach: list[str],
    *,
    tolerance_days: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: for every left row, attach the ``attach``
    columns of the right row with the greatest ``right_ts`` <=
    ``left_ts`` for the same ``key`` (inclusive match, like DuckDB's
    ``ASOF JOIN ... ON l.t >= r.t``); left rows with no prior right
    row keep NULLs. ``direction="forward"`` mirrors it — the SMALLEST
    ``right_ts`` >= ``left_ts`` (DuckDB ``ON l.t <= r.t``), same
    single-shuffle union+window plan with the timeline sorted
    descending.

    ``right`` must be unique per (key, right_ts) — pre-aggregate it if
    not — otherwise the carried row is undefined. With
    ``tolerance_days`` set, matches older than that many days are
    nulled out (pandas ``merge_asof(tolerance=...)``).

    Implementation: tag-union both sides on (key, ts), sort each key's
    timeline once, and carry the most recent quote forward with
    ``last(ignorenulls)`` over an unbounded-preceding running frame.
    At equal timestamps the quote sorts before the probe so the match
    is inclusive.

    Scale design: exactly one shuffle (the window's hash partition on
    ``key``) + one per-key sort; neither side is ever broadcast or
    nested-loop joined, so both sides may be fact-sized. Skewed keys:
    a hot key serializes its timeline sort — salt by coarse time range
    and carry the last quote across salt boundaries (documented
    trade-off; not needed at driver scales).
    """
    left_cols = left.columns
    q_struct = F.struct(*[F.col(c) for c in attach])
    quotes = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).cast("timestamp").alias("_t"),
        F.lit(0).alias("_p"),
        q_struct.alias("_q"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    probes = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).cast("timestamp").alias("_t"),
        F.lit(1).alias("_p"),
        F.lit(None).cast(
            right.select(q_struct.alias("_q")).schema["_q"].dataType
        ).alias("_q"),
        *left_cols,
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    u = quotes.unionByName(probes)
    t_order = (
        F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(t_order, F.col("_p").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_last_q", F.last("_q", ignorenulls=True).over(w))
    carried = carried.withColumn(
        "_last_t", F.last(F.when(F.col("_p") == 0, F.col("_t")), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_p") == 1)
    if tolerance_days is not None:
        gap = (
            F.datediff(F.to_date("_t"), F.to_date("_last_t"))
            if direction == "backward"
            else F.datediff(F.to_date("_last_t"), F.to_date("_t"))
        )
        out = out.withColumn(
            "_last_q", F.when(gap <= F.lit(tolerance_days), F.col("_last_q"))
        )
    return out.select(
        *left_cols,
        *[F.col(f"_last_q.{c}").alias(c) for c in attach],
    )


def order_day_quotes(orders: DataFrame) -> DataFrame:
    """The as-of right side for aj1: orders pre-aggregated to one row
    per (customer, order day) so the as-of match is deterministic —
    day totals in exact cents, the day's latest order key as the
    representative."""
    return orders.groupBy(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("order_ts"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "day_total_c"
        ),
        F.count(F.lit(1)).alias("day_orders"),
        F.max("o_orderkey").alias("last_orderkey"),
    )


def event_order_asof(events: DataFrame, orders: DataFrame) -> DataFrame:
    """aj1: attribute every event to the user's most recent order-day
    at or before the event — the classic clickstream->purchase
    attribution query, and the engine's as-of-join showcase.

    Output grain: one row per event; events whose user has no prior
    order keep NULL order columns (left as-of).
    """
    quotes = order_day_quotes(orders)
    j = asof_join(
        events.select("event_id", "user_id", "event_type", "ts"),
        quotes,
        key="user_id",
        left_ts="ts",
        right_ts="order_ts",
        attach=["order_ts", "day_total_c", "day_orders", "last_orderkey"],
    )
    return j.select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.date_format("order_ts", "yyyy-MM-dd").alias("order_day"),
        (F.col("day_total_c") / 100.0).cast("double").alias("order_day_total"),
        "day_orders",
        "last_orderkey",
        F.datediff(F.to_date("ts"), F.to_date("order_ts"))
        .cast("long")
        .alias("days_since_order"),
    )


def interval_overlap_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo: str,
    hi: str,
    *,
    strategy: str = "broadcast",
    bucket_minutes: int = 60,
) -> DataFrame:
    """Inner range join: pair every point with every interval whose
    half-open [lo, hi) contains ``point_ts``.

    ``strategy="broadcast"`` — broadcast the interval side and let the
    range predicate run as a BroadcastNestedLoopJoin: the optimal plan
    while intervals are dimension-sized (the registered rj1 case).

    ``strategy="binned"`` — the both-sides-large plan: intervals
    explode to the fixed-width time buckets they cover, points hash to
    exactly ONE bucket (a point is not a range), and the pair set
    comes from a plain shuffled equi-join on the bucket id + a residual
    range filter. No dedup step is needed precisely because the point
    side contributes a single bucket. Cost: |intervals| x
    (duration/bucket) exploded rows + one co-shuffle; pick
    ``bucket_minutes`` near the median interval duration so the
    explode factor stays ~2.

    Both strategies return identical rows (law-tested in
    ``tests/test_timejoin.py``).
    """
    if strategy == "broadcast":
        cond = (F.col(point_ts) >= F.col(lo)) & (F.col(point_ts) < F.col(hi))
        return points.join(F.broadcast(intervals), cond, "inner")
    if strategy != "binned":
        raise ValueError(f"unknown strategy {strategy!r}")
    # `div` keeps the bucket math in exact integer division (a float
    # `/` + cast can mis-floor near bucket edges at microsecond scale).
    w_us = bucket_minutes * US_PER_MIN
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros(cast({lo} as timestamp)) div {w_us}"),
                F.expr(f"(unix_micros(cast({hi} as timestamp)) - 1) div {w_us}"),
            )
        ),
    )
    pt = points.withColumn(
        "_b", F.expr(f"unix_micros(cast({point_ts} as timestamp)) div {w_us}")
    )
    j = pt.join(iv, "_b", "inner").filter(
        (F.col(point_ts) >= F.col(lo)) & (F.col(point_ts) < F.col(hi))
    )
    return j.drop("_b")


def busy_windows(events: DataFrame, k: int = 10) -> DataFrame:
    """The rj1 interval side: the top-``k`` busiest clock hours,
    widened to 90-minute windows [hour-15min, hour+75min) so interval
    edges cross bucket boundaries (a deliberate stress on the range
    predicate — a pure tumbling window would degenerate to an
    equi-join). Deterministic total order: count desc, hour asc."""
    hours = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("hour_events"))
    top = hours.orderBy(F.desc("hour_events"), F.asc("h")).limit(k)
    return top.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("interval_id"),
        "hour_events",
        (F.col("h") - F.expr("INTERVAL 15 MINUTES")).alias("lo"),
        (F.col("h") + F.expr("INTERVAL 75 MINUTES")).alias("hi"),
    )


def busy_window_events(
    events: DataFrame, k: int = 10, *, strategy: str = "broadcast"
) -> DataFrame:
    """rj1: per busy 90-minute window, the overlapping-event rollup —
    the engine's range-join showcase. Interval side is top-k bounded,
    so the registered form broadcasts; the binned strategy is the
    at-scale path (law-tested equal)."""
    iv = busy_windows(events, k)
    j = interval_overlap_join(
        events.select("event_id", "user_id", "event_type", "ts"),
        iv,
        point_ts="ts",
        lo="lo",
        hi="hi",
        strategy=strategy,
    )
    return j.groupBy("interval_id", "hour_events").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("long").alias("n_purchases"),
    )


def order_next_event(orders: DataFrame, events: DataFrame) -> DataFrame:
    """aj2: the forward as-of twin of :func:`event_order_asof` — every
    order attributed to the customer's FIRST event at or after the
    order date ("after this purchase, when did they next engage?").
    NULLs where the customer has no later event (left as-of, forward
    direction). The event side pre-dedups to one row per (user, ts)
    with the lowest event_id as the representative, keeping the
    carried row well-defined."""
    ev = events.groupBy(
        "user_id", F.col("ts").alias("ev_ts")
    ).agg(
        F.min("event_id").alias("first_event_id"),
        F.min_by("event_type", "event_id").alias("event_type"),
    )
    left = orders.select(
        "o_orderkey",
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("order_ts"),
    )
    j = asof_join(
        left,
        ev,
        key="user_id",
        left_ts="order_ts",
        right_ts="ev_ts",
        attach=["ev_ts", "first_event_id", "event_type"],
        direction="forward",
    )
    return j.select(
        "o_orderkey",
        "user_id",
        F.date_format("order_ts", "yyyy-MM-dd").alias("order_day"),
        F.date_format("ev_ts", "yyyy-MM-dd HH:mm:ss").alias("next_event_ts"),
        "first_event_id",
        "event_type",
        F.datediff(F.to_date("ev_ts"), F.to_date("order_ts"))
        .cast("long")
        .alias("days_until_event"),
    )

"""Laws for the temporal joins (operators/timejoin.py): as-of
semantics on a hand-built timeline, strategy equivalence for the
interval-overlap join (binned == broadcast at several bucket widths),
and the registered-query determinism under repartitioning."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import timejoin

from conftest import SF_DIR


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01T00:00:00")),  # before any quote
            (2, 7, _ts("2024-01-02T00:00:00")),  # exactly on q1: inclusive
            (3, 7, _ts("2024-01-05T12:00:00")),  # between q1 and q2
            (4, 7, _ts("2024-02-01T00:00:00")),  # after q2
            (5, 8, _ts("2024-01-10T00:00:00")),  # key with no quotes
        ],
        "id long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [
            (7, _ts("2024-01-02T00:00:00"), 100),
            (7, _ts("2024-01-06T00:00:00"), 200),
        ],
        "k long, qt timestamp, qv long",
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _asof_fixture(spark)
    out = timejoin.asof_join(
        left, right, key="k", left_ts="t", right_ts="qt", attach=["qv"]
    )
    got = {r["id"]: r["qv"] for r in out.collect()}
    assert got == {1: None, 2: 100, 3: 100, 4: 200, 5: None}
    assert out.count() == left.count()  # left join: every probe kept


def test_asof_tolerance(spark):
    left, right = _asof_fixture(spark)
    out = timejoin.asof_join(
        left,
        right,
        key="k",
        left_ts="t",
        right_ts="qt",
        attach=["qv"],
        tolerance_days=7,
    )
    got = {r["id"]: r["qv"] for r in out.collect()}
    # probe 4 is 26 days after its quote -> nulled by the tolerance
    assert got == {1: None, 2: 100, 3: 100, 4: None, 5: None}


def test_interval_join_strategy_equivalence(spark):
    ev = tables.load_events(spark, SF_DIR)
    iv = timejoin.busy_windows(ev, 10)
    base = timejoin.interval_overlap_join(
        ev.select("event_id", "ts"), iv, "ts", "lo", "hi",
        strategy="broadcast",
    )
    expected = sorted(
        (r["event_id"], r["interval_id"]) for r in base.collect()
    )
    # bucket widths straddling the 90-min interval length: narrower,
    # matching, wider — the bucket math must not change the pair set
    for width in (7, 60, 90, 240):
        binned = timejoin.interval_overlap_join(
            ev.select("event_id", "ts"), iv, "ts", "lo", "hi",
            strategy="binned", bucket_minutes=width,
        )
        got = sorted(
            (r["event_id"], r["interval_id"]) for r in binned.collect()
        )
        assert got == expected, f"bucket_minutes={width}"


def test_busy_window_rollup_partition_invariance(spark):
    ev = tables.load_events(spark, SF_DIR)
    a = timejoin.busy_window_events(ev, 10).collect()
    b = timejoin.busy_window_events(ev.repartition(13), 10).collect()
    key = lambda r: r["interval_id"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_edge_events_inside_widened_windows(spark):
    """The 90-min windows deliberately cross hour-bucket edges: verify
    at least one matched event sits OUTSIDE its interval's base hour,
    i.e. the range predicate is doing real work vs an hour equi-join."""
    ev = tables.load_events(spark, SF_DIR)
    iv = timejoin.busy_windows(ev, 10)
    j = timejoin.interval_overlap_join(
        ev.select("event_id", "ts"), iv, "ts", "lo", "hi",
        strategy="broadcast",
    )
    outside = j.filter(
        (F.col("ts") < F.col("lo") + F.expr("INTERVAL 15 MINUTES"))
        | (
            F.col("ts")
            >= F.col("lo") + F.expr("INTERVAL 75 MINUTES")
        )
    )
    assert outside.count() > 0


def test_event_funnel_monotone_and_consistent(spark):
    """Funnel law: step user-counts never increase, and every step-i
    converter is a step-(i-1) converter (strict sequencing)."""
    from serverless_smurf_etl_and_analytics_spark.operators import (
        events as ev_ops,
    )

    ev = tables.load_events(spark, SF_DIR)
    rows = sorted(
        ev_ops.event_funnel(ev).collect(), key=lambda r: r["step_order"]
    )
    assert [r["step"] for r in rows] == ["view", "click", "purchase"]
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert rows[0]["conv_from_first_bp"] == 10000
    assert rows[0]["conv_from_prev_bp"] is None
    for r in rows[1:]:
        assert 0 <= r["conv_from_prev_bp"] <= 10000


def test_asof_join_hot_key_correctness(spark):
    """Adversarial skew: one key holds 5k probes against 500 quotes
    (a hot user in the attribution join). The union+window as-of must
    stay correct — every probe carries the greatest quote time <= its
    own — and null out probes before the first quote. (Perf under a
    hot key is the documented salt-by-time-range trade-off; this
    pins semantics so that optimization can't drift.)"""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    probes = [
        (i, 1, base + dt.timedelta(minutes=i)) for i in range(5000)
    ]
    quotes = [
        (1, base + dt.timedelta(minutes=10 * q), q) for q in range(500)
    ]
    left = spark.createDataFrame(probes, "id long, k long, t timestamp")
    right = spark.createDataFrame(quotes, "k long, qt timestamp, qv long")
    out = timejoin.asof_join(
        left, right, key="k", left_ts="t", right_ts="qt", attach=["qv"]
    )
    got = {r["id"]: r["qv"] for r in out.collect()}
    assert len(got) == 5000
    for i in range(5000):
        assert got[i] == i // 10, i  # quote q covers minutes [10q, 10q+10)


def test_asof_forward_semantics(spark):
    left, right = _asof_fixture(spark)
    out = timejoin.asof_join(
        left, right, key="k", left_ts="t", right_ts="qt", attach=["qv"],
        direction="forward",
    )
    got = {r["id"]: r["qv"] for r in out.collect()}
    # earliest quote at-or-after each probe; probe 4 is past the last
    # quote, key 8 has none
    assert got == {1: 100, 2: 100, 3: 200, 4: None, 5: None}

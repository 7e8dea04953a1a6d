"""Laws for the distributive statistics (operators/stats.py): KMV
sketch mergeability / partition-invariance and accuracy bounds; exact
quantile definition checked against a direct sorted-list computation."""

from __future__ import annotations

import hashlib
import math

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import stats

from conftest import SF_DIR


def _h32(v) -> int:
    return int(
        hashlib.md5(f"kmv|{v}".encode()).hexdigest()[:8], 16
    )


def test_kmv_partition_invariance(spark):
    """The sketch is a pure function of the data: re-partitioning (a
    different per-partition combiner decomposition) must not move a
    single output value — this IS the merge law, exercised through the
    engine rather than asserted abstractly."""
    txns = tables.transactions(spark, SF_DIR)
    a = stats.kmv_distinct(txns, "store_id", "item_sku").collect()
    b = stats.kmv_distinct(
        txns.repartition(17), "store_id", "item_sku"
    ).collect()
    key = lambda r: r["store_id"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_kmv_matches_reference_python(spark):
    """Sketch contents vs an independent single-threaded Python
    reference: same kth hash, same estimate."""
    txns = tables.transactions(spark, SF_DIR)
    rows = (
        txns.select("store_id", "item_sku").distinct().collect()
    )
    by_store: dict[str, set[int]] = {}
    for r in rows:
        by_store.setdefault(r["store_id"], set()).add(_h32(r["item_sku"]))
    out = {
        r["store_id"]: r
        for r in stats.kmv_distinct(txns, "store_id", "item_sku").collect()
    }
    assert set(out) == set(by_store)
    for store, hashes in by_store.items():
        got = out[store]
        ordered = sorted(hashes)
        if len(ordered) >= stats.KMV_K:
            kth = ordered[stats.KMV_K - 1]
            assert got["kth_hash"] == kth
            assert got["est_distinct"] == (
                (stats.KMV_K - 1) * (1 << 32)
            ) // kth
        else:
            assert got["kth_hash"] is None
            assert got["est_distinct"] == len(ordered)


def test_kmv_relative_error_bound(spark):
    """KMV standard error is ~1/sqrt(k-2); at k=64 that is ~12.7%.
    Allow 4 sigma — a failure here means the estimator is broken, not
    unlucky (the hash set is deterministic, so this never flakes)."""
    txns = tables.transactions(spark, SF_DIR)
    for r in stats.kmv_distinct(txns, "store_id", "item_sku").collect():
        if r["kth_hash"] is None:
            assert r["est_distinct"] == r["n_hashes_kept"]
        else:
            rel = abs(r["est_distinct"] - r["n_exact"]) / r["n_exact"]
            assert rel < 4 / math.sqrt(stats.KMV_K - 2), r


def test_group_quantiles_vs_sorted_lists(spark):
    txns = tables.transactions(spark, SF_DIR)
    vals: dict[str, list[int]] = {}
    for r in txns.select("payment_method", "line_cents").collect():
        vals.setdefault(r["payment_method"], []).append(r["line_cents"])
    out = {
        r["payment_method"]: r
        for r in stats.group_quantiles(txns).collect()
    }
    assert set(out) == set(vals)
    for pay, v in vals.items():
        v.sort()
        n = len(v)
        got = out[pay]
        assert got["n_lines"] == n
        assert got["min_c"] == v[0]
        assert got["max_c"] == v[-1]
        for pct, col in ((50, "p50_c"), (90, "p90_c"), (99, "p99_c")):
            idx = -(-pct * n // 100)  # ceil(pct*n/100)
            assert got[col] == v[idx - 1], (pay, pct)


def test_group_quantiles_tiny_groups(spark):
    """n=1 and all-equal-value groups: every percentile degenerates to
    the single value; the ceil-rank formula must not index to 0."""
    df = spark.createDataFrame(
        [("X", 500), ("Y", 7), ("Y", 7), ("Y", 7)],
        "payment_method string, line_cents long",
    )
    out = {
        r["payment_method"]: r for r in stats.group_quantiles(df).collect()
    }
    for pay, v in (("X", 500), ("Y", 7)):
        for col in ("min_c", "p50_c", "p90_c", "p99_c", "max_c"):
            assert out[pay][col] == v
    assert out["X"]["n_lines"] == 1
    assert out["Y"]["n_lines"] == 3


def test_kmv_merge_law(spark):
    """Merged per-day sketches == the direct sketch over the same
    range-filtered rows: identical kth hash and estimate per store
    (min-k of a union of per-day min-k's is the min-k of the union)."""
    from pyspark.sql import functions as F

    txns = tables.transactions(spark, SF_DIR)
    start, end = "2001-06-23", "2001-06-29"
    merged = {
        r["store_id"]: r
        for r in stats.kmv_merge_range(txns, start, end).collect()
    }
    direct = {
        r["store_id"]: r
        for r in stats.kmv_distinct(
            txns.filter(F.col("sale_date").between(start, end)),
            "store_id",
            "item_sku",
        ).collect()
    }
    assert set(merged) == set(direct)
    for store in merged:
        assert merged[store]["kth_hash"] == direct[store]["kth_hash"], store
        assert (
            merged[store]["est_distinct"] == direct[store]["est_distinct"]
        ), store
        assert merged[store]["n_exact"] == direct[store]["n_exact"], store


def test_percentile_approx_within_error_of_exact(spark):
    """q1's docstring names percentile_approx as the fallback when
    even the value domain is too large to sort; verify the built-in
    sketch lands within 1% relative error of the exact ceil-rank
    answer, so the documented at-scale path is actually usable."""
    from pyspark.sql import functions as F

    txns = tables.transactions(spark, SF_DIR)
    exact = {
        r["payment_method"]: r
        for r in stats.group_quantiles(txns).collect()
    }
    approx = {
        r["payment_method"]: r["qs"]
        for r in txns.groupBy("payment_method")
        .agg(
            F.percentile_approx(
                "line_cents", [0.5, 0.9, 0.99], 10000
            ).alias("qs")
        )
        .collect()
    }
    for pay, qs in approx.items():
        for got, col in zip(qs, ("p50_c", "p90_c", "p99_c")):
            want = exact[pay][col]
            assert abs(got - want) <= 0.01 * want, (pay, col, got, want)


def test_cm_never_underestimates_any_candidate(spark):
    """The CM one-sided error law: for EVERY candidate user (not just
    the reported top-k), min_d(counter[h_d(u)]) >= the user's true
    count — each counter cell sums the user's own events plus any
    colliding users'."""
    ev = tables.load_events(spark, SF_DIR)
    from pyspark.sql import functions as F

    start, end = "2024-01-08", "2024-01-21"
    in_range = ev.filter(F.to_date("ts").between(start, end))
    counters, cands = stats.cm_daily_layer(in_range)
    merged = {
        (r["depth"], r["slot"]): r["c"]
        for r in counters.groupBy("depth", "slot")
        .agg(F.sum("c").alias("c"))
        .collect()
    }
    exact = {
        r["user_id"]: r["n"]
        for r in in_range.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    def slot(u, d):
        return (
            int(
                hashlib.md5(f"cm{d}|{u}".encode()).hexdigest()[:8], 16
            )
            % stats.CM_WIDTH
        )

    users = [r["user_id"] for r in cands.select("user_id").distinct().collect()]
    assert users
    for u in users:
        est = min(merged[(d, slot(u, d))] for d in range(stats.CM_DEPTH))
        assert est >= exact[u], (u, est, exact[u])


def test_cm_daily_counters_merge_by_addition(spark):
    """Summing per-day counter grids over a range equals the grid
    computed directly on the range-filtered facts — the additivity
    that makes the daily layer answer ANY range without rescans."""
    ev = tables.load_events(spark, SF_DIR)
    from pyspark.sql import functions as F

    in_range = ev.filter(
        F.to_date("ts").between("2024-01-08", "2024-01-21")
    )
    daily, _ = stats.cm_daily_layer(in_range)
    merged = {
        (r["depth"], r["slot"]): r["c"]
        for r in daily.groupBy("depth", "slot")
        .agg(F.sum("c").alias("c"))
        .collect()
    }
    # direct: one "day" covering the whole range
    direct_grid, _ = stats.cm_daily_layer(
        in_range.withColumn("ts", F.lit("2024-01-08").cast("timestamp"))
    )
    direct = {
        (r["depth"], r["slot"]): r["c"] for r in direct_grid.collect()
    }
    assert merged == direct


def test_cm_top10_covers_true_top10_on_corpus(spark):
    """On this corpus the candidate union recalls the true exact
    top-10 (the pigeonhole guarantee covers keys above
    n_days x per-day-kth-count; this pins that the default k=20 is
    comfortably above that bar for the test data)."""
    ev = tables.load_events(spark, SF_DIR)
    from pyspark.sql import functions as F

    start, end = "2024-01-08", "2024-01-21"
    out = {
        r["user_id"]
        for r in stats.cm_range_heavy_users(ev, start, end).collect()
    }
    in_range = ev.filter(F.to_date("ts").between(start, end))
    true_top = [
        r["user_id"]
        for r in in_range.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(10)
        .collect()
    ]
    # every true top-10 user must be a candidate; the reported set can
    # differ only where CM collisions reorder near-ties, which the
    # exact audit column would surface — on this corpus require
    # >= 8/10 overlap and full candidate coverage
    cands = {
        r["user_id"]
        for r in stats.cm_daily_layer(in_range)[1]
        .select("user_id")
        .distinct()
        .collect()
    }
    assert set(true_top) <= cands
    assert len(out & set(true_top)) >= 8

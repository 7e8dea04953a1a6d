"""Laws for the data-quality family (operators/quality.py) and the
HLL sketch (operators/stats.py): planted gaps are found exactly, a
planted level shift localizes to the true boundary, EWMA matches a
hand-rolled Python reference and its constant-series fixed point, the
profiler's null accounting is exact, and HLL is partition-invariant
with its analytic error bound holding on real data."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import (
    history,
    quality,
    stats,
)

from conftest import SF_DIR


def _daily(spark, rows):
    return spark.createDataFrame(
        rows, "store_id string, sale_date string, sales_c long"
    )


def test_date_gaps_planted_holes(spark):
    rows = [
        # store A: hole of 2 days (05..06 missing) and 1 day (09)
        ("A", "2024-01-01", 100),
        ("A", "2024-01-02", 100),
        ("A", "2024-01-03", 100),
        ("A", "2024-01-04", 100),
        ("A", "2024-01-07", 100),
        ("A", "2024-01-08", 100),
        ("A", "2024-01-10", 100),
        # store B: contiguous, no gaps
        ("B", "2024-01-01", 100),
        ("B", "2024-01-02", 100),
    ]
    got = sorted(
        (r["store_id"], r["last_seen"], r["next_seen"], r["gap_days"])
        for r in quality.date_gaps(_daily(spark, rows)).collect()
    )
    assert got == [
        ("A", "2024-01-04", "2024-01-07", 2),
        ("A", "2024-01-08", "2024-01-10", 1),
    ]


def test_cusum_localizes_planted_shift(spark):
    # 10 days at 1000c then 10 days at 3000c: the |CUSUM| argmax is
    # exactly the last pre-shift day, and the label reads the post-cp
    # direction (level moved UP).
    rows = [
        ("A", f"2024-01-{d:02d}", 1000 if d <= 10 else 3000)
        for d in range(1, 21)
    ]
    (r,) = quality.cusum_changepoints(_daily(spark, rows)).collect()
    assert r["cp_date"] == "2024-01-10"
    assert r["day_idx"] == 10 and r["n_days"] == 20
    assert r["direction"] == "shift_up"
    # mean = 2000, first 10 days contribute -1000 each
    assert r["cusum_at_cp"] == -10_000
    assert r["mad_c"] == 1000


def test_ewma_constant_series_fixed_point(spark):
    rows = [("A", f"2024-01-{d:02d}", 777) for d in range(1, 15)]
    out = quality.ewma_sales(_daily(spark, rows)).collect()
    assert all(r["ewma_c"] == 777 for r in out)
    assert {r["n_in_window"] for r in out} == {1, 2, 3, 4, 5, 6, 7}


def test_ewma_matches_python_reference(spark):
    vals = [100, 200, 50, 400, 10, 900, 300, 250, 600]
    rows = [
        ("A", f"2024-01-{d + 1:02d}", v) for d, v in enumerate(vals)
    ]
    out = {
        r["sale_date"]: r
        for r in quality.ewma_sales(_daily(spark, rows)).collect()
    }
    for t in range(len(vals)):
        window = vals[max(0, t - 6) : t + 1]
        num = sum(x * (1 << i) for i, x in enumerate(window))
        den = (1 << len(window)) - 1
        r = out[f"2024-01-{t + 1:02d}"]
        assert r["n_in_window"] == len(window)
        assert r["ewma_c"] == num // den, f"day {t + 1}"


def test_profile_counts_nulls_and_distincts(spark):
    txns = tables.transactions(spark, SF_DIR)
    # null out payment_method on a deterministic slice
    poked = txns.withColumn(
        "payment_method",
        F.when(F.col("transaction_id") % 10 == 0, None).otherwise(
            F.col("payment_method")
        ),
    )
    expect_null = poked.filter(F.col("payment_method").isNull()).count()
    n = poked.count()
    prof = {
        r["column_name"]: r
        for r in quality.profile_columns(poked).collect()
    }
    assert set(prof) == set(
        quality.PROFILE_NUM_COLS + quality.PROFILE_STR_COLS
    )
    pm = prof["payment_method"]
    assert pm["n_rows"] == n
    assert pm["n_null"] == expect_null
    assert pm["n_distinct"] == 3  # A/N/R enum, nulls excluded
    assert pm["min_s"] == "A" and pm["max_s"] == "R"
    q = prof["quantity"]
    assert q["n_null"] == 0
    assert q["min_n"] >= 1


def test_hll_partition_invariance_and_bound(spark):
    txns = tables.transactions(spark, SF_DIR)
    a = stats.hll_distinct(txns, "payment_method", "transaction_id")
    b = stats.hll_distinct(
        txns.repartition(17), "payment_method", "transaction_id"
    )
    key = lambda r: r["payment_method"]  # noqa: E731
    ra, rb = sorted(a.collect(), key=key), sorted(b.collect(), key=key)
    assert ra == rb
    # m = 256 registers -> relative std error 1.04/sqrt(m) = 6.5%;
    # assert within 4 sigma (26%) — generous but catches register math
    # bugs, which produce order-of-magnitude misses
    for r in ra:
        assert r["err_bp"] < 2600, r


def test_hll_registers_match_python_reference(spark):
    txns = tables.transactions(spark, SF_DIR)
    vals = [
        r["transaction_id"]
        for r in txns.select("transaction_id").distinct().collect()
    ]
    regs: dict[int, int] = {}
    for v in vals:
        h = int(
            hashlib.md5(f"{stats.HLL_SALT}{v}".encode()).hexdigest()[:15],
            16,
        )
        bucket, w = h % stats.HLL_M, h // stats.HLL_M
        rho = (
            stats.HLL_RHO_FIELD + 1
            if w == 0
            else stats.HLL_RHO_FIELD + 1 - w.bit_length()
        )
        regs[bucket] = max(regs.get(bucket, 0), rho)
    s = sum(
        1 << (stats.HLL_RHO_FIELD + 1 - m) for m in regs.values()
    ) + (stats.HLL_M - len(regs)) * (1 << (stats.HLL_RHO_FIELD + 1))
    # single global group: run the operator grouped by a constant
    one = txns.withColumn("g", F.lit("all"))
    (r,) = stats.hll_distinct(one, "g", "transaction_id").collect()
    assert r["n_buckets_used"] == len(regs)
    assert r["s_scaled"] == s
    assert r["est_hll"] == int(stats.HLL_NUMERATOR / s)


def test_quality_ops_use_store_day_grain(spark):
    # the monitoring family consumes the shared store-day MV grain —
    # row counts line up with the real daily table
    txns = tables.transactions(spark, SF_DIR)
    daily = history.store_daily_cents(txns)
    n_days = daily.count()
    assert quality.ewma_sales(daily).count() == n_days
    assert quality.cusum_changepoints(daily).count() == (
        daily.select("store_id").distinct().count()
    )


def _txns(spark, rows):
    return spark.createDataFrame(
        rows,
        "store_id string, sale_date string, item_sku long,"
        " line_cents long, payment_method string",
    )


def test_robust_zscore_flags_planted_spike(spark):
    # constant series -> median = value, MAD = 0; the one spiked day
    # trips the degenerate-MAD branch with a NULL ratio
    rows = [("A", f"2024-01-{d:02d}", 500) for d in range(1, 15)]
    rows[7] = ("A", "2024-01-08", 50_000)
    out = quality.robust_zscore_anomalies(_daily(spark, rows)).collect()
    assert [(r["sale_date"], r["ratio_bp"]) for r in out] == [
        ("2024-01-08", None)
    ]
    assert out[0]["median_c"] == 500 and out[0]["mad_c"] == 0


def test_robust_zscore_matches_python_reference(spark):
    vals = [100, 120, 90, 110, 100, 130, 95, 105, 4000, 100, 115]
    rows = [
        ("A", f"2024-01-{d + 1:02d}", v) for d, v in enumerate(vals)
    ]
    sv = sorted(vals)
    med = sv[(len(vals) + 1) // 2 - 1]
    devs = sorted(abs(v - med) for v in vals)
    mad = devs[(len(vals) + 1) // 2 - 1]
    expect = [
        (f"2024-01-{i + 1:02d}", abs(v - med) * 10000 // mad)
        for i, v in enumerate(vals)
        if abs(v - med) * 10000 > 35000 * mad
    ]
    got = [
        (r["sale_date"], r["ratio_bp"])
        for r in quality.robust_zscore_anomalies(
            _daily(spark, rows)
        ).collect()
    ]
    assert sorted(got) == sorted(expect) and expect  # non-vacuous


def test_heavy_hitters_threshold_exact(spark):
    # shares: sku 1 = 6000 bp, sku 2 = 3000 bp, sku 3 = 49 bp (just
    # under), sku 4 = 951 bp
    rows = [
        ("A", "2024-01-01", 1, 60_000, "A"),
        ("A", "2024-01-01", 2, 30_000, "A"),
        ("A", "2024-01-01", 3, 490, "A"),
        ("A", "2024-01-01", 4, 9_510, "A"),
    ]
    out = quality.heavy_hitters(_txns(spark, rows))
    got = sorted(
        (r["item_sku"], r["share_bp"]) for r in out.collect()
    )
    assert got == [(1, 6000), (2, 3000), (4, 951)]


def test_payment_drift_bounds(spark):
    # store A: disjoint mixes in the two halves -> TVD = 1.0 exactly;
    # store B: identical mixes -> TVD = 0
    rows = []
    for d in (1, 2):
        rows += [("A", f"2024-01-{d:02d}", 1, 100, "CASH")] * 3
    for d in (3, 4):
        rows += [("A", f"2024-01-{d:02d}", 1, 100, "CARD")] * 5
    for d in (1, 2, 3, 4):
        rows += [
            ("B", f"2024-01-{d:02d}", 1, 100, "CASH"),
            ("B", f"2024-01-{d:02d}", 1, 100, "CARD"),
        ]
    out = {
        r["store_id"]: r
        for r in quality.payment_drift_tvd(_txns(spark, rows)).collect()
    }
    assert out["A"]["tvd_ppm"] == 1_000_000
    assert out["A"]["h1_lines"] == 6 and out["A"]["h2_lines"] == 10
    assert out["B"]["tvd_ppm"] == 0


def test_quality_family_partition_invariance(spark):
    txns = tables.transactions(spark, SF_DIR)
    daily = history.store_daily_cents(txns)
    for fn, src in (
        (quality.robust_zscore_anomalies, daily),
        (quality.payment_drift_tvd, txns),
        (quality.heavy_hitters, txns),
        (quality.profile_columns, txns),
    ):
        a = sorted(map(tuple, fn(src).collect()))
        b = sorted(map(tuple, fn(src.repartition(13)).collect()))
        assert a == b, fn.__name__


def test_latest_per_key_tiebreak(spark):
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 7, "click"),
            (2, "2024-01-01 10:00:00", 7, "purchase"),  # same ts, higher id
            (3, "2024-01-01 09:00:00", 7, "view"),
            (4, "2024-01-02 00:00:00", 8, "signup"),
        ],
        "event_id long, ts_raw string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts_raw").cast("timestamp"))
    out = {r["user_id"]: r for r in quality.latest_per_key(ev).collect()}
    assert out[7]["event_id"] == 2 and out[7]["n_events"] == 3
    assert out[8]["event_id"] == 4 and out[8]["n_events"] == 1


def test_zorder_matches_python_interleave(spark):
    import datetime as dt

    daily = _daily(
        spark,
        [
            ("0003", "1992-05-11", 1),
            ("0042", "1997-12-31", 1),
            ("1000", "1990-01-01", 1),
        ],
    )
    out = {r["store_id"]: r for r in quality.zorder_codes(daily).collect()}
    epoch = dt.date(1990, 1, 1)
    for sid, date_s in (
        ("0003", "1992-05-11"),
        ("0042", "1997-12-31"),
        ("1000", "1990-01-01"),
    ):
        s = int(sid)
        d = (dt.date.fromisoformat(date_s) - epoch).days
        expect = 0
        for k in range(16):
            expect |= ((s >> k) & 1) << (2 * k)
            expect |= ((d >> k) & 1) << (2 * k + 1)
        r = out[sid]
        assert r["zcode"] == expect and r["day_num"] == d


def test_zorder_write_roundtrip(spark, tmp_path):
    txns = tables.transactions(spark, SF_DIR)
    daily = history.store_daily_cents(txns)
    path = str(tmp_path / "zordered")
    quality.write_zordered(daily, path)
    back = spark.read.parquet(path)
    assert back.count() == daily.count()
    assert "zcode" in back.columns


def test_histogram_laws(spark):
    txns = tables.transactions(spark, SF_DIR)
    hist = quality.log2_histogram(txns).collect()
    n_lines = txns.count()
    assert sum(r["cnt"] for r in hist) == n_lines
    by_method: dict[str, list] = {}
    for r in hist:
        by_method.setdefault(r["payment_method"], []).append(r)
        # exact per-bin bounds sit inside the analytic bin range
        assert r["bin_lo_c"] <= r["bin_min_c"] <= r["bin_max_c"] <= r["bin_hi_c"]
    p50 = {
        r["payment_method"]: r["p50_c"]
        for r in stats.group_quantiles(txns).collect()
    }
    for m, rows in by_method.items():
        flagged = [r for r in rows if r["is_p50_bin"] == 1]
        assert len(flagged) == 1, m
        # the exact q1 median lands inside the flagged bin — the
        # histogram's quantile estimate is at most one bin off
        assert flagged[0]["bin_lo_c"] <= p50[m] <= flagged[0]["bin_hi_c"]


def test_quality_report_composes_branches(spark):
    txns = tables.transactions(spark, SF_DIR)
    daily = history.store_daily_cents(txns)
    n = quality.quality_report(daily).count()
    expect = (
        quality.date_gaps(daily).count()
        + quality.robust_zscore_anomalies(daily).count()
        + quality.cusum_changepoints(daily).count()
    )
    assert n == expect and n > 0


def test_editdist_orthogonal_to_jaccard(spark):
    # the law d12 exists for: same words REARRANGED — identical
    # shingle-bag at 1-gram level / high Jaccard similarity family,
    # but large edit distance. d12 must reject what an
    # order-insensitive verifier would accept.
    from serverless_smurf_etl_and_analytics_spark.operators import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rearranged = "kappa iota theta eta zeta epsilon delta gamma beta alpha"
    near = base[:-5] + "kappo"  # small in-place edit
    docs = spark.createDataFrame(
        [(1, base), (2, rearranged), (3, near)],
        "doc_id long, text string",
    )
    keys = docs.selectExpr("doc_id", "substring(text, 1, 40) AS k")
    import itertools

    got = {}
    rows = keys.collect()
    by_id = {r["doc_id"]: r["k"] for r in rows}
    pairs = spark.createDataFrame(
        [(a, b) for a, b in itertools.combinations(sorted(by_id), 2)],
        "doc_a long, doc_b long",
    )
    j = (
        pairs.join(
            keys.selectExpr("doc_id AS doc_a", "k AS k_a"), "doc_a"
        )
        .join(keys.selectExpr("doc_id AS doc_b", "k AS k_b"), "doc_b")
        .selectExpr("doc_a", "doc_b", "levenshtein(k_a, k_b) AS d")
    )
    for r in j.collect():
        got[(r["doc_a"], r["doc_b"])] = r["d"]
    assert got[(1, 3)] <= 8       # true near-dup: tiny edit distance
    assert got[(1, 2)] > 8        # same words, different order: far
    # and the full operator honors the threshold on a corpus where
    # LSH blocks the pair (identical shingles -> same bands)
    found = dedup.editdist_neardup(docs).collect()
    found_pairs = {(r["doc_a"], r["doc_b"]) for r in found}
    assert (1, 2) not in found_pairs


def test_hll_merge_law(spark):
    # register-wise max of per-day registers == registers of the
    # union: the merged range sketch must equal hll_distinct run
    # directly on the same filtered rows
    txns = tables.transactions(spark, SF_DIR).filter(
        F.col("sale_date").between("1995-01-01", "2001-12-31")
    )
    direct = {
        r["payment_method"]: (r["s_scaled"], r["est_hll"])
        for r in stats.hll_distinct(
            txns, "payment_method", "transaction_id"
        ).collect()
    }
    merged = {
        r["payment_method"]: (r["s_scaled"], r["est_hll"])
        for r in stats.hll_merge_range(
            tables.transactions(spark, SF_DIR),
            "1995-01-01",
            "2001-12-31",
        ).collect()
    }
    assert direct == merged


def test_hist_merge_range_laws(spark):
    """hist2 laws: (1) merging per-day histograms equals binning the
    range directly (bin counts are pure sums); (2) the exact median
    always lands inside the estimated p50 bin (the <=2x error bound);
    (3) the estimate brackets are genuine powers of two."""
    from serverless_smurf_etl_and_analytics_spark.operators import quality

    txns = tables.transactions(spark, SF_DIR)
    start, end = "1995-01-01", "2001-12-31"
    out = quality.hist_merge_range(txns, start, end).collect()
    assert out, "no payment methods in range"
    for r in out:
        assert r["p50_in_bin"] == 1, r
        assert r["p50_lo_c"] == 1 << (r["p50_bin"] - 1)
        assert r["p50_hi_c"] == (1 << r["p50_bin"]) - 1
        assert r["p50_lo_c"] <= r["p50_exact_c"] <= r["p50_hi_c"]
    # merge law: per-(method, bin) counts from the daily layer sum to
    # the direct binning of the same filtered rows
    in_range = txns.filter(F.col("sale_date").between(start, end))
    direct = {
        (r["payment_method"], r["bin"]): r["cnt"]
        for r in in_range.selectExpr(
            "payment_method",
            "cast(length(bin(line_cents)) as bigint) as bin",
        )
        .groupBy("payment_method", "bin")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    merged = {
        (r["payment_method"], r["bin"]): r["cnt"]
        for r in quality.daily_log2_histograms(in_range)
        .groupBy("payment_method", "bin")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert direct == merged


def test_scd2_intervals_consistent_with_scd1(spark):
    """scd2 laws: per user, intervals tile the timeline (each
    valid_to == the next valid_from, exactly one is_current),
    consecutive intervals change type (runs are maximal), interval
    n_events sum to the user's event count, and scd1's current row
    carries the is_current interval's event_type."""
    from serverless_smurf_etl_and_analytics_spark.operators import quality

    ev = tables.load_events(spark, SF_DIR)
    rows = quality.validity_intervals(ev).collect()
    cur = {
        r["user_id"]: r["event_type"]
        for r in quality.latest_per_key(ev).collect()
    }
    n_ev = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert set(by_user) == set(cur)
    for uid, ivs in by_user.items():
        ivs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in ivs] == list(range(1, len(ivs) + 1))
        assert sum(r["n_events"] for r in ivs) == n_ev[uid]
        assert sum(r["is_current"] for r in ivs) == 1
        assert ivs[-1]["is_current"] == 1 and ivs[-1]["valid_to_s"] is None
        assert ivs[-1]["event_type"] == cur[uid]
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to_s"] == b["valid_from_s"]
            assert a["event_type"] != b["event_type"]


def test_kmv_set_overlap_estimator_laws(spark):
    """sk3 laws: n_common <= n_kept; est_inter <= est_union; when the
    merged union fits inside k the estimate is EXACT (tau covers the
    whole union, the sample is the population); and corpus-wide the
    intersection estimator tracks truth (mean absolute error bounded
    — KMV with k=64 has ~1/sqrt(k) ~ 12% relative union error, so we
    assert a generous aggregate bound that a bucketing/tau bug would
    blow through)."""
    txns = tables.transactions(spark, SF_DIR)
    rows = stats.kmv_set_overlap(txns).collect()
    assert rows, "no store pairs"
    errs = []
    for r in rows:
        assert 0 <= r["n_common"] <= r["n_kept"]
        assert r["est_inter"] <= r["est_union"]
        if r["n_kept"] < 64:  # union fit entirely in the sketch
            assert r["est_inter"] == r["n_exact_inter"], r
        if r["n_exact_inter"] >= 20:
            errs.append(
                abs(r["est_inter"] - r["n_exact_inter"])
                / r["n_exact_inter"]
            )
    if errs:
        mae = sum(errs) / len(errs)
        assert mae <= 0.5, f"mean abs rel error {mae:.2f}"


def test_log2_histogram_rejects_nonpositive_cents(spark):
    """Domain guard (ADVICE r5): a zero would land in bin 1 (bracket
    [1,2) excludes it) and a negative would hit the two's-complement
    bin 64 with an overflowed bracket — both silently corrupt the
    daily->range containment law, so the layer must fail loudly on
    out-of-domain cents instead."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    base = [("card", "2024-01-01", 250), ("cash", "2024-01-01", 1)]
    for bad in (0, -199):
        rows = base + [("card", "2024-01-02", bad)]
        df = spark.createDataFrame(
            rows, "payment_method string, sale_date string, line_cents long"
        )
        with _pytest.raises(
            SparkRuntimeException, match="line_cents >= 1"
        ):
            quality.log2_histogram(df).collect()
        with _pytest.raises(
            SparkRuntimeException, match="line_cents >= 1"
        ):
            quality.daily_log2_histograms(df).collect()
    # in-domain rows still bin: 250 -> bin 8 ([128, 256)), 1 -> bin 1
    ok = spark.createDataFrame(
        base, "payment_method string, sale_date string, line_cents long"
    )
    got = {
        (r["payment_method"], r["bin"])
        for r in quality.daily_log2_histograms(ok).collect()
    }
    assert got == {("card", 8), ("cash", 1)}

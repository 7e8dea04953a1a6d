"""Registry entries for the data-quality/monitoring family
(operators/quality.py) and the HLL distinct sketch
(operators/stats.py): dq1 column profiler, gap1 date-gap detection,
cp1 CUSUM change-point location, ewma1 exponentially-weighted trailing
mean, hll1 HyperLogLog distinct estimate.

Oracle notes: everything is integer/string-exact by construction
(cents, counts, power-of-two weights, scaled harmonic sums), so each
oracle restates the definition directly. ewma1's Spark plan weights an
ordered window array; the oracle states the same frame as a bounded
rn-range self-join — relationally identical, and the integer weights
(2^offset) make the two evaluation orders produce equal sums. hll1's
single float op (one IEEE divide of exact integers by a precomputed
double constant) is embedded from the same module constant the Spark
plan uses, so both engines divide identical doubles.
"""

from __future__ import annotations

from .. import tables
from ..operators import history, quality, stats
from .registry import SQL_DAILY_CENTS, TXN, register


def _daily(spark, sf):
    return history.store_daily_cents(tables.transactions(spark, sf))


# dq1: per-column profile of the transactions table. The unpivoted
# numeric/string value split mirrors quality.PROFILE_*_COLS.
_NUM_SELECTS = "\n    UNION ALL ".join(
    f"SELECT '{c}' AS column_name, cast({c} AS bigint) AS value_n,"
    f" cast(NULL AS varchar) AS value_s FROM transactions"
    for c in quality.PROFILE_NUM_COLS
)
_STR_SELECTS = "\n    UNION ALL ".join(
    f"SELECT '{c}', cast(NULL AS bigint), {c} FROM transactions"
    for c in quality.PROFILE_STR_COLS
)

register(
    "dq1_profile_columns",
    lambda spark, sf: quality.profile_columns(
        tables.transactions(spark, sf)
    ),
    f"""
WITH {TXN},
pairs AS (
    {_NUM_SELECTS}
    UNION ALL {_STR_SELECTS}
),
per_value AS (
    SELECT column_name, value_n, value_s, count(*) AS c
    FROM pairs GROUP BY 1, 2, 3
)
SELECT column_name,
    cast(sum(c) AS bigint) AS n_rows,
    cast(sum(CASE WHEN value_n IS NULL AND value_s IS NULL THEN c
             ELSE 0 END) AS bigint) AS n_null,
    cast(count(CASE WHEN value_n IS NOT NULL OR value_s IS NOT NULL
               THEN 1 END) AS bigint) AS n_distinct,
    min(value_n) AS min_n,
    max(value_n) AS max_n,
    min(value_s) AS min_s,
    max(value_s) AS max_s
FROM per_value
GROUP BY column_name
""",
)

# gap1: islands-and-gaps over each store's present sale_dates.
register(
    "gap1_missing_days",
    lambda spark, sf: quality.date_gaps(_daily(spark, sf)),
    f"""
WITH {TXN}, {SQL_DAILY_CENTS},
d AS (
    SELECT store_id, cast(sale_date AS date) AS d,
           lag(cast(sale_date AS date)) OVER (
               PARTITION BY store_id ORDER BY cast(sale_date AS date)
           ) AS prev_d
    FROM daily
)
SELECT store_id,
    strftime(prev_d, '%Y-%m-%d') AS last_seen,
    strftime(d, '%Y-%m-%d')      AS next_seen,
    cast(date_diff('day', prev_d, d) - 1 AS bigint) AS gap_days
FROM d
WHERE date_diff('day', prev_d, d) - 1 >= 1
""",
)

# cp1: the classic CUSUM change-point estimator — the day of maximum
# |cumulative centered deviation| per store (ties -> earliest day).
register(
    "cp1_cusum_changepoint",
    lambda spark, sf: quality.cusum_changepoints(_daily(spark, sf)),
    f"""
WITH {TXN}, {SQL_DAILY_CENTS},
m AS (
    SELECT store_id, cast(sum(sales_c) AS bigint) AS tot_c,
           cast(count(*) AS bigint) AS n_days
    FROM daily GROUP BY 1
),
d AS (
    SELECT daily.store_id, daily.sale_date, daily.sales_c,
           m.tot_c // m.n_days AS mean_c,
           daily.sales_c - (m.tot_c // m.n_days) AS dev_c,
           m.n_days
    FROM daily JOIN m USING (store_id)
),
mad AS (
    SELECT store_id,
           cast(sum(abs(dev_c)) AS bigint) // max(n_days) AS mad_c
    FROM d GROUP BY 1
),
c AS (
    SELECT d.store_id, d.sale_date, d.sales_c, d.mean_c, d.n_days,
        cast(sum(dev_c) OVER (
            PARTITION BY d.store_id ORDER BY d.sale_date
            ROWS UNBOUNDED PRECEDING) AS bigint) AS cusum_c,
        cast(count(*) OVER (
            PARTITION BY d.store_id ORDER BY d.sale_date
            ROWS UNBOUNDED PRECEDING) AS bigint) AS day_idx
    FROM d
),
ranked AS (
    SELECT c.*, mad.mad_c,
        row_number() OVER (
            PARTITION BY c.store_id
            ORDER BY abs(c.cusum_c) DESC, c.sale_date
        ) AS rk
    FROM c JOIN mad USING (store_id)
)
SELECT store_id, sale_date AS cp_date, day_idx, n_days,
    cusum_c AS cusum_at_cp, mad_c,
    CASE WHEN cusum_c < 0 THEN 'shift_up' ELSE 'shift_down' END
        AS direction
FROM ranked WHERE rk = 1
""",
)

# ewma1: the window-array weighting restated as a bounded rn-range
# self-join (weight exponent = offset from the frame start).
register(
    "ewma1_smoothed_sales",
    lambda spark, sf: quality.ewma_sales(_daily(spark, sf)),
    f"""
WITH {TXN}, {SQL_DAILY_CENTS},
r AS (
    SELECT store_id, sale_date, sales_c,
           row_number() OVER (
               PARTITION BY store_id ORDER BY sale_date) AS rn
    FROM daily
)
SELECT t.store_id, t.sale_date, cast(t.sales_c AS bigint) AS sales_c,
    cast(count(*) AS bigint) AS n_in_window,
    cast(cast(sum(h.sales_c
                  * (1::bigint << (h.rn - greatest(t.rn - 6, 1))))
              AS bigint)
         // ((1::bigint << cast(count(*) AS bigint)) - 1)
         AS bigint) AS ewma_c
FROM r t JOIN r h
  ON h.store_id = t.store_id AND h.rn BETWEEN t.rn - 6 AND t.rn
GROUP BY t.store_id, t.sale_date, t.sales_c
""",
)

# hll1: HyperLogLog distinct transactions per payment method; the
# bias numerator literal comes from the same module constant the
# Spark plan divides by.
register(
    "hll1_distinct_transactions",
    lambda spark, sf: stats.hll_distinct(
        tables.transactions(spark, sf), "payment_method", "transaction_id"
    ),
    f"""
WITH {TXN},
h AS (
    SELECT payment_method AS g,
        ('0x' || substr(md5('{stats.HLL_SALT}'
             || cast(transaction_id AS varchar)), 1, 15))::bigint AS h
    FROM transactions
),
b AS (SELECT g, h % {stats.HLL_M} AS bucket, h // {stats.HLL_M} AS w
      FROM h),
r AS (
    SELECT g, bucket,
        CASE WHEN w = 0 THEN {stats.HLL_RHO_FIELD + 1}
             ELSE {stats.HLL_RHO_FIELD + 1} - length(bin(w)) END AS rho
    FROM b
),
regs AS (SELECT g, bucket, max(rho) AS m_j FROM r GROUP BY 1, 2),
pg AS (
    SELECT g, cast(count(*) AS bigint) AS n_buckets_used,
        cast(sum(1::bigint << ({stats.HLL_RHO_FIELD + 1} - m_j))
             AS bigint) AS s_present
    FROM regs GROUP BY 1
),
ex AS (
    SELECT payment_method AS g,
           cast(count(DISTINCT transaction_id) AS bigint) AS n_exact
    FROM transactions GROUP BY 1
),
j AS (
    SELECT pg.g, ex.n_exact, pg.n_buckets_used,
        pg.s_present + ({stats.HLL_M} - pg.n_buckets_used)
            * (1::bigint << {stats.HLL_RHO_FIELD + 1}) AS s_scaled
    FROM pg JOIN ex USING (g)
)
SELECT g AS payment_method, n_exact, n_buckets_used, s_scaled,
    cast(floor({stats.HLL_NUMERATOR!r} / s_scaled) AS bigint)
        AS est_hll,
    cast(round(abs(cast(floor({stats.HLL_NUMERATOR!r} / s_scaled)
                        AS bigint) - n_exact) * 10000.0 / n_exact)
         AS bigint) AS err_bp
FROM j
""",
)


# z1: robust (median/MAD) outlier store-days; medians restated with
# the same ceil-rank value-compression CTE shape as q1's oracle.
register(
    "z1_robust_zscore",
    lambda spark, sf: quality.robust_zscore_anomalies(_daily(spark, sf)),
    f"""
WITH {TXN}, {SQL_DAILY_CENTS},
uni AS (
    SELECT store_id, cast(sales_c AS bigint) AS v, count(*) AS c
    FROM daily GROUP BY 1, 2
),
u AS (
    SELECT store_id, v,
        cast(sum(c) OVER (PARTITION BY store_id ORDER BY v
             ROWS UNBOUNDED PRECEDING) AS bigint) AS cum,
        cast(sum(c) OVER (PARTITION BY store_id) AS bigint) AS n
    FROM uni
),
med AS (
    SELECT store_id,
        min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS med
    FROM u GROUP BY 1
),
d AS (
    SELECT daily.store_id, daily.sale_date,
        cast(daily.sales_c AS bigint) AS sales_c, med.med,
        cast(abs(daily.sales_c - med.med) AS bigint) AS dev_c
    FROM daily JOIN med USING (store_id)
),
uni2 AS (
    SELECT store_id, dev_c AS v, count(*) AS c FROM d GROUP BY 1, 2
),
u2 AS (
    SELECT store_id, v,
        cast(sum(c) OVER (PARTITION BY store_id ORDER BY v
             ROWS UNBOUNDED PRECEDING) AS bigint) AS cum,
        cast(sum(c) OVER (PARTITION BY store_id) AS bigint) AS n
    FROM uni2
),
mad AS (
    SELECT store_id,
        min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS mad_c
    FROM u2 GROUP BY 1
)
SELECT d.store_id, d.sale_date, d.sales_c, d.med AS median_c,
    mad.mad_c, d.dev_c,
    cast(d.dev_c * 10000 // nullif(mad.mad_c, 0) AS bigint) AS ratio_bp
FROM d JOIN mad USING (store_id)
WHERE (mad.mad_c > 0 AND d.dev_c * 10000 > 35000 * mad.mad_c)
   OR (mad.mad_c = 0 AND d.dev_c > 0)
""",
)

# hh1: revenue-concentration heavy hitters per store (share >= 50 bp
# = 0.5% — stores carry ~600 lines over ~580 SKUs at every sf, so the
# threshold selects the top ~2% concentrated SKUs rather than nothing).
register(
    "hh1_heavy_hitters",
    lambda spark, sf: quality.heavy_hitters(
        tables.transactions(spark, sf)
    ),
    f"""
WITH {TXN},
per_sku AS (
    SELECT store_id, item_sku,
           cast(sum(line_cents) AS bigint) AS rev_c
    FROM transactions GROUP BY 1, 2
),
per_store AS (
    SELECT store_id, cast(sum(rev_c) AS bigint) AS store_tot_c
    FROM per_sku GROUP BY 1
)
SELECT p.store_id, p.item_sku, p.rev_c, s.store_tot_c,
    p.rev_c * 10000 // s.store_tot_c AS share_bp
FROM per_sku p JOIN per_store s USING (store_id)
WHERE p.rev_c * 10000 // s.store_tot_c >= 50
""",
)

# drift1: first-half vs second-half payment-mix TVD per store, ppm.
register(
    "drift1_payment_tvd",
    lambda spark, sf: quality.payment_drift_tvd(
        tables.transactions(spark, sf)
    ),
    f"""
WITH {TXN},
per_day AS (
    SELECT store_id, sale_date, payment_method, count(*) AS c
    FROM transactions GROUP BY 1, 2, 3
),
days AS (
    SELECT store_id, sale_date,
        row_number() OVER (PARTITION BY store_id ORDER BY sale_date)
            AS rnk,
        count(*) OVER (PARTITION BY store_id) AS n_days
    FROM (SELECT DISTINCT store_id, sale_date FROM per_day)
),
tagged AS (
    SELECT p.store_id, p.payment_method, p.c,
        CASE WHEN d.rnk <= d.n_days // 2 THEN 'h1' ELSE 'h2' END
            AS half,
        d.n_days
    FROM per_day p
    JOIN days d USING (store_id, sale_date)
),
pm AS (
    SELECT store_id, payment_method,
        cast(sum(CASE WHEN half = 'h1' THEN c ELSE 0 END) AS bigint)
            AS c1,
        cast(sum(CASE WHEN half = 'h2' THEN c ELSE 0 END) AS bigint)
            AS c2,
        cast(max(n_days) AS bigint) AS n_days
    FROM tagged GROUP BY 1, 2
),
wt AS (
    SELECT pm.*,
        cast(sum(c1) OVER (PARTITION BY store_id) AS bigint) AS t1,
        cast(sum(c2) OVER (PARTITION BY store_id) AS bigint) AS t2
    FROM pm
)
SELECT store_id, max(n_days) AS n_days, max(t1) AS h1_lines,
    max(t2) AS h2_lines,
    cast(sum(abs(c1 * t2 - c2 * t1)) * 1000000
         // (2 * max(t1) * max(t2)) AS bigint) AS tvd_ppm
FROM wt GROUP BY 1
""",
)


# scd1: latest event per user (SCD-type-1 current snapshot of the
# append-only log); ties on ts break to the highest event_id.
register(
    "scd1_latest_per_key",
    lambda spark, sf: quality.latest_per_key(
        tables.load_events(spark, sf)
    ),
    """
WITH latest AS (
    SELECT event_id, user_id, event_type, ts,
        row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) AS rn,
        count(*) OVER (PARTITION BY user_id) AS n_events
    FROM events
)
SELECT user_id, event_id,
    strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, event_type,
    cast(n_events AS bigint) AS n_events
FROM latest WHERE rn = 1
""",
)


# scd2: type-2 validity intervals per user — consecutive same-type
# events collapse (gaps-and-islands run detection), each change opens
# an interval closed by the next change; scd1's current row is always
# the is_current interval (law-tested).
register(
    "scd2_validity_intervals",
    lambda spark, sf: quality.validity_intervals(
        tables.load_events(spark, sf)
    ),
    """
WITH flagged AS (
    SELECT user_id, event_id, ts, event_type,
        CASE WHEN lag(event_type) OVER w IS NULL
                  OR lag(event_type) OVER w != event_type
             THEN 1 ELSE 0 END AS chg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
versioned AS (
    SELECT *,
        sum(chg) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING
        ) AS version
    FROM flagged
),
runs AS (
    SELECT user_id, version,
        min(event_type) AS event_type,
        min(ts) AS valid_from,
        cast(count(*) AS bigint) AS n_events
    FROM versioned GROUP BY 1, 2
),
closed AS (
    SELECT *,
        lead(valid_from) OVER (
            PARTITION BY user_id ORDER BY version
        ) AS valid_to
    FROM runs
)
SELECT user_id, cast(version AS bigint) AS version, event_type,
    strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from_s,
    strftime(valid_to, '%Y-%m-%d %H:%M:%S') AS valid_to_s,
    n_events,
    cast(valid_to IS NULL AS bigint) AS is_current
FROM closed
""",
)


def _spread_sql(x: str) -> str:
    # the identical shift-or-mask cascade quality._spread_bits_sql
    # emits for the Spark plan — both engines share &, |, << syntax
    s = f"cast({x} AS bigint)"
    s = f"(({s} | ({s} << 8)) & 16711935)"
    s = f"(({s} | ({s} << 4)) & 252645135)"
    s = f"(({s} | ({s} << 2)) & 858993459)"
    s = f"(({s} | ({s} << 1)) & 1431655765)"
    return s


# mo1: Morton (Z-order) codes over the store-day grain — the layout
# key behind quality.write_zordered.
register(
    "mo1_zorder_codes",
    lambda spark, sf: quality.zorder_codes(_daily(spark, sf)),
    f"""
WITH {TXN}, {SQL_DAILY_CENTS},
d AS (
    SELECT store_id, sale_date,
        cast(store_id AS bigint) AS s_num,
        cast(date_diff('day', DATE '{quality.ZORDER_EPOCH}',
                       cast(sale_date AS date)) AS bigint) AS day_num
    FROM daily
)
SELECT store_id, sale_date, day_num,
    ({_spread_sql('s_num')})
        | (({_spread_sql('day_num')}) << 1) AS zcode
FROM d
""",
)

# hist1: mergeable power-of-two histogram of line cents per payment
# method; bin = bitlen(v) via the length-of-binary trick (no float
# logs), p50-carrying bin flagged with the ceil-rank rule.
register(
    "hist1_log2_histogram",
    lambda spark, sf: quality.log2_histogram(
        tables.transactions(spark, sf)
    ),
    f"""
WITH {TXN},
binned AS (
    SELECT payment_method,
        cast(length(bin(line_cents)) AS bigint) AS bin,
        cast(count(*) AS bigint) AS cnt,
        min(line_cents) AS bin_min_c,
        max(line_cents) AS bin_max_c
    FROM transactions GROUP BY 1, 2
),
h AS (
    SELECT *,
        cast(sum(cnt) OVER (PARTITION BY payment_method ORDER BY bin
             ROWS UNBOUNDED PRECEDING) AS bigint) AS cum,
        cast(sum(cnt) OVER (PARTITION BY payment_method) AS bigint) AS n
    FROM binned
)
SELECT payment_method, bin,
    (1::bigint << (bin - 1)) AS bin_lo_c,
    (1::bigint << bin) - 1   AS bin_hi_c,
    cnt, bin_min_c, bin_max_c, cum,
    cast(cum >= (n + 1) // 2 AND cum - cnt < (n + 1) // 2
         AS bigint) AS is_p50_bin
FROM h
""",
)

# hist2: date-range approximate median by MERGING per-day histograms —
# completes the materialize+merge family (sk2 KMV / hll2 HLL / hist2
# quantiles); the p50_in_bin column hash-checks the containment law
# (exact median inside the estimated bin) on every driver run.
from .registry import W_END, W_START  # noqa: E402

register(
    "hist2_histogram_range_merge",
    lambda spark, sf: quality.hist_merge_range(
        tables.transactions(spark, sf), W_START, W_END
    ),
    f"""
WITH {TXN},
in_range AS (
    SELECT * FROM transactions
    WHERE sale_date BETWEEN '{W_START}' AND '{W_END}'
),
daily AS (
    SELECT payment_method, sale_date,
        cast(length(bin(line_cents)) AS bigint) AS bin,
        cast(count(*) AS bigint) AS cnt
    FROM in_range GROUP BY 1, 2, 3
),
merged AS (
    SELECT payment_method, bin, cast(sum(cnt) AS bigint) AS cnt
    FROM daily GROUP BY 1, 2
),
h AS (
    SELECT *,
        cast(sum(cnt) OVER (PARTITION BY payment_method ORDER BY bin
             ROWS UNBOUNDED PRECEDING) AS bigint) AS cum,
        cast(sum(cnt) OVER (PARTITION BY payment_method) AS bigint) AS n
    FROM merged
),
p50 AS (
    SELECT payment_method, bin AS p50_bin,
        (1::bigint << (bin - 1)) AS p50_lo_c,
        (1::bigint << bin) - 1   AS p50_hi_c,
        n AS n_lines
    FROM h
    WHERE cum >= (50 * n + 99) // 100
      AND cum - cnt < (50 * n + 99) // 100
),
days AS (
    SELECT payment_method,
        cast(count(DISTINCT sale_date) AS bigint) AS n_days_merged
    FROM daily GROUP BY 1
),
uni AS (
    SELECT payment_method, line_cents AS v,
        cast(count(*) AS bigint) AS c
    FROM in_range GROUP BY 1, 2
),
u AS (
    SELECT payment_method, v, c,
        sum(c) OVER (PARTITION BY payment_method ORDER BY v
                     ROWS UNBOUNDED PRECEDING) AS cum,
        sum(c) OVER (PARTITION BY payment_method) AS n
    FROM uni
),
exact AS (
    SELECT payment_method,
        min(CASE WHEN cum >= (50 * n + 99) // 100 THEN v END)
            AS p50_exact_c
    FROM u GROUP BY 1
)
SELECT p.payment_method, d.n_days_merged, p.n_lines,
    p.p50_bin, p.p50_lo_c, p.p50_hi_c, e.p50_exact_c,
    cast(e.p50_exact_c BETWEEN p.p50_lo_c AND p.p50_hi_c AS bigint)
        AS p50_in_bin
FROM p50 p
JOIN days d USING (payment_method)
JOIN exact e USING (payment_method)
""",
)

# qr1: the combined alarm feed — each branch is the corresponding
# registered oracle verbatim, wrapped as a subquery and projected to
# the common (store, date, type, metric) shape.
from .registry import ORACLES as _ORA  # noqa: E402

register(
    "qr1_quality_report",
    lambda spark, sf: quality.quality_report(_daily(spark, sf)),
    f"""
SELECT store_id, next_seen AS alarm_date, 'gap' AS alarm_type,
       gap_days AS metric
FROM ({_ORA["gap1_missing_days"]})
UNION ALL
SELECT store_id, sale_date, 'robust_outlier',
       coalesce(ratio_bp, -1)
FROM ({_ORA["z1_robust_zscore"]})
UNION ALL
SELECT store_id, cp_date, 'changepoint',
       coalesce(abs(cusum_at_cp) // nullif(mad_c, 0), -1)
FROM ({_ORA["cp1_cusum_changepoint"]})
""",
)


# hll2: per-day HLL register materialization merged over a date range
# (the HLL twin of sk2's KMV merge; register-wise max IS union).
HLL_RANGE = ("1995-01-01", "2001-12-31")

register(
    "hll2_range_merge",
    lambda spark, sf: stats.hll_merge_range(
        tables.transactions(spark, sf), *HLL_RANGE
    ),
    f"""
WITH {TXN},
in_range AS (
    SELECT * FROM transactions
    WHERE sale_date BETWEEN '{HLL_RANGE[0]}' AND '{HLL_RANGE[1]}'
),
h AS (
    SELECT payment_method, sale_date,
        ('0x' || substr(md5('{stats.HLL_SALT}'
             || cast(transaction_id AS varchar)), 1, 15))::bigint AS h
    FROM in_range
),
b AS (
    SELECT payment_method, sale_date,
           h % {stats.HLL_M} AS bucket, h // {stats.HLL_M} AS w
    FROM h
),
daily AS (
    SELECT payment_method, sale_date, bucket,
        max(CASE WHEN w = 0 THEN {stats.HLL_RHO_FIELD + 1}
            ELSE {stats.HLL_RHO_FIELD + 1} - length(bin(w)) END) AS m_j
    FROM b GROUP BY 1, 2, 3
),
merged AS (
    SELECT payment_method, bucket, max(m_j) AS m_j
    FROM daily GROUP BY 1, 2
),
pg AS (
    SELECT payment_method,
        cast(count(*) AS bigint) AS n_buckets_used,
        cast(sum(1::bigint << ({stats.HLL_RHO_FIELD + 1} - m_j))
             AS bigint) AS s_present
    FROM merged GROUP BY 1
),
days AS (
    SELECT payment_method,
        cast(count(DISTINCT sale_date) AS bigint) AS n_days_merged
    FROM daily GROUP BY 1
),
ex AS (
    SELECT payment_method,
        cast(count(DISTINCT transaction_id) AS bigint) AS n_exact
    FROM in_range GROUP BY 1
),
j AS (
    SELECT pg.payment_method, d.n_days_merged, ex.n_exact,
        pg.n_buckets_used,
        pg.s_present + ({stats.HLL_M} - pg.n_buckets_used)
            * (1::bigint << {stats.HLL_RHO_FIELD + 1}) AS s_scaled
    FROM pg
    JOIN days d USING (payment_method)
    JOIN ex USING (payment_method)
)
SELECT payment_method, n_days_merged, n_exact, n_buckets_used,
    s_scaled,
    cast(floor({stats.HLL_NUMERATOR!r} / s_scaled) AS bigint)
        AS est_hll,
    cast(round(abs(cast(floor({stats.HLL_NUMERATOR!r} / s_scaled)
                        AS bigint) - n_exact) * 10000.0 / n_exact)
         AS bigint) AS err_bp
FROM j
""",
)


# w2 / f2: surface samplers extending f1 — the window-function family
# and the array/higher-order-function family, each checked against
# DuckDB's implementation of the same SQL-standard definitions.
from .sql_text import SQL_TOKS  # noqa: E402

register(
    "w2_window_sampler",
    lambda spark, sf: quality.window_function_sampler(_daily(spark, sf)),
    f"""
WITH {TXN}, {SQL_DAILY_CENTS},
d AS (
    SELECT store_id, sale_date, cast(sales_c AS bigint) AS sales_c
    FROM daily
)
SELECT store_id, sale_date, sales_c,
    cast(row_number() OVER w AS bigint)   AS rn,
    cast(ntile(4) OVER w AS bigint)       AS quartile,
    percent_rank() OVER w                 AS pct_rank,
    cume_dist() OVER w                    AS cume,
    lag(sales_c, 1) OVER w                AS prev_c,
    lead(sales_c, 2) OVER w               AS next2_c,
    nth_value(sales_c, 3) OVER wr         AS third_c,
    first_value(sales_c) OVER wr          AS first_c,
    max(sales_c) OVER wr                  AS run_max_c
FROM d
WINDOW
    w AS (PARTITION BY store_id ORDER BY sale_date),
    wr AS (PARTITION BY store_id ORDER BY sale_date
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)

register(
    "f2_array_sampler",
    lambda spark, sf: quality.array_function_sampler(
        tables.load(spark, sf, "documents")
    ),
    f"""
WITH {SQL_TOKS}
SELECT doc_id,
    cast(len(toks) AS bigint) AS n_toks,
    array_to_string(list_slice(toks, 1, 3), '_') AS first3,
    list_sort(toks)[1] AS min_tok,
    list_reverse_sort(toks)[1] AS max_tok,
    cast(len(list_distinct(toks)) AS bigint) AS n_uniq,
    cast(list_contains(toks, 'data') AS bigint) AS has_data,
    cast(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
         AS bigint) AS char_sum,
    cast(len(list_filter(toks, t -> length(t) > 4)) AS bigint)
        AS n_long_toks,
    cast(coalesce(list_sum(list_transform(toks,
         (t, i) -> length(t) * i)), 0) AS bigint) AS pos_weighted,
    cast(list_contains(toks, 'spark') AS bigint) AS mentions_spark
FROM toks_t
""",
)

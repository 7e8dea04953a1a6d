"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship store-day metrics (+ nested top-5 products)
at sf0.001. ``queries()``/``oracle_sql()`` — one entry per implemented
operator from SURVEY.md §2, backed by
``serverless_smurf_etl_and_analytics_spark.plans.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import metrics
from serverless_smurf_etl_and_analytics_spark.plans import registry
from serverless_smurf_etl_and_analytics_spark.session import tune_existing

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's central derived table in its
    full nested serving shape — per-(store, day) metrics with the
    top-5 product list (array<struct>) and the payment_breakdown map
    (``write-metrics/lambda_function.py:77-104``,
    ``calculate-metrics/lambda_function.py:155-173``)."""
    tune_existing(spark)
    txns = tables.transactions(spark, SF0001)
    return metrics.store_daily_nested(txns, 5)


# The driver verifies a bounded prefix of the registry (50 entries per
# round), so ordering is deliberate: queries that are NEW or whose PLAN
# CHANGED this round come first, then the least-recently-verified, so
# every registered query has a driver-verified green row in at least
# one round and nothing outside the window has a changed plan.
_VERIFY_FIRST = [
    # --- r4 new (late-round): data-quality/monitoring family
    # (plans/registry_quality.py) — column profiler, date-gap
    # detection, CUSUM change-point, EWMA smoothing, HyperLogLog
    "dq1_profile_columns", "gap1_missing_days",
    "cp1_cusum_changepoint", "ewma1_smoothed_sales",
    "hll1_distinct_transactions", "z1_robust_zscore",
    "hh1_heavy_hitters", "drift1_payment_tvd",
    "scd1_latest_per_key", "mo1_zorder_codes",
    "hist1_log2_histogram", "qr1_quality_report",
    # --- r4 new (late-round): product quantization — trained m=8 x
    # k=16 fixed-point codebooks + per-vector codes, oracle = the
    # same Lloyd unrolled with subspace as a data dimension — and the
    # full IVF x PQ ANN composition (probe -> ADC -> top-k), one
    # oracle proving coarse training, PQ training, list pruning and
    # the asymmetric-distance ranking together
    "pq1_pq_codes", "ivfpq1_topk",
    # --- r4 new (late-round): grouping-sets (CUBE with grouping()
    # flags) and INTERSECT/EXCEPT set ops — relational surface the
    # reference lacks entirely (SURVEY §2.4/§2.7 notes)
    "cube1_store_payment_cube", "u2_setops_assortment",
    # --- r4 new (late-round): order-sensitive edit-distance verify
    # over the LSH candidates (fuzzy-key entity resolution), and the
    # HLL daily-register range merge (the hll twin of sk2)
    "d12_editdist_neardup", "hll2_range_merge",
    # --- r4 new (late-round): surface samplers — the window-function
    # family (w2) and the array/higher-order-function family (f2),
    # each vs DuckDB's implementation of the same standard semantics
    "w2_window_sampler", "f2_array_sampler",
    # --- r4 new (late-round): the end-to-end curation pipeline
    # (quality gates -> near-dup removal -> stratified sampling) as
    # one oracle — the registered stages proven to COMPOSE
    "cur1_curated_corpus", "src1_corpus_datasheet",
    # --- r4 new (late-round): triangle census of the top-3
    # co-purchase graph (CF-neighborhood coherence diagnostic)
    "tri1_copurchase_triangles",
    # --- r4 new: temporal joins (as-of, interval-overlap),
    # distributive statistics (KMV sketch, exact grouped quantiles),
    # and quality-weighted sampling — plans/registry_stats.py
    "aj1_event_order_asof", "rj1_busy_window_events",
    "sk1_kmv_distinct_skus", "q1_payment_quantiles",
    "w1_weighted_sample", "tf1_tfidf_keywords",
    "sk2_kmv_range_merge", "t10_familiarity", "fun1_event_funnel",
    "coh1_cohort_retention", "pr1_pagerank_stores",
    "aj2_order_next_event", "d11_containment", "co1_sku_copurchase",
    "a19_dow_seasonality",
    # --- r4 new: promoted from plans/registry_pending (staged in r3
    # with full oracles + local parity; first driver verification now)
    "t7_repetition_filter", "t8_doc_frequency",
    "pack1_sequence_packing",
    # --- r4 new: the k-means trainer behind sim4's IVF quantizer,
    # registered with an unrolled fixed-point Lloyd oracle
    "c1_kmeans_clusters",
    # --- r4 new: connected-components semantic dedup (transitive
    # chains) and MinHash dup-group assignment, oracles via DuckDB
    # recursive-CTE closure; embedding dimension profiler
    "d9_semantic_dedup_cc", "d10_minhash_dup_groups",
    "e1_embedding_dim_profile",
    # --- r4 plan change: tables.load_events grew the timestamp_ntz ->
    # timestamp normalization (value-preserving under the UTC session,
    # but a new cast node in every events-consuming plan) — all four
    # consumers re-verify in-window
    "ev_tumbling_hourly", "ev_sliding_2h_hourly",
    "ev_session_windows", "a18_event_type_summary",
    # --- r4 recheck (ADVICE r3): the one rows-only query; its plan
    # changed in r3 via the shared store-day MV but sat outside that
    # round's window. Values stay hash-proven by the
    # j5_wide_serialized twin; this refreshes the rows-only row.
    "j5_wide_pivot_timeseries",
    # --- least-recently-verified: the ML layer, green in r01/r02 and
    # untouched since (the r3 token_rows code move kept expression
    # trees identical; re-proving the first 11 here retires that
    # caveat for them). After the 23 late-r4 queries (quality family,
    # pq1, ivfpq1, cube1, u2, d12, hll2, w2, f2, cur1, src1, tri1)
    # rotated in, this whole block sits just past the window
    # (t1-t5, d1-d5, sim1, sim3, sim4, mm1-mm3 at positions 51-66);
    # all r01/r02-green with plans untouched since.
    "t1_text_stats", "t2_lang_id", "t3_fingerprint",
    "t4_token_count_bpe", "t5_rolling_fingerprint",
    "d1_exact_dedup", "d2_minhash_signatures",
    "d3_lsh_candidate_pairs", "d4_minhash_neardup", "d5_simhash",
    "sim1_cosine_topk", "sim3_lsh_topk", "sim4_ivf_topk",
    "mm1_binary_fingerprint_dedup", "mm2_modality_stats",
    "mm3_pairing_integrity",
    # --- r3-green, plans unchanged; now entirely past the 50-query
    # window (positions 56+) after the quality family rotated in —
    # all r3-green with plans untouched since
    "a1_store_day_metrics", "a2_payment_breakdown",
    "a2_payment_per_store_day", "a3_top5_products_store_day",
    "a4_company_daily", "a6_product_daily_exact",
    "a6_product_daily_top5_parity",
    # --- tail (beyond the 50-window), last-green ledger: every entry
    # below is r3-green (CORRECTNESS_r03.json) with a plan untouched
    # this round — a7_trailing_7day, a8_company_trailing,
    # a9_product_trailing, a10_deviation_vs_trailing,
    # a11_trend_recent_vs_earlier,
    # a12_trend_half_vs_half, a13_trend_first_vs_last,
    # a14_kpi_for_range, a15_top_products_reagg,
    # a16_product_range_stats, a17_distinct_dates,
    # j1_missing_stores_anti, j3_brand_revenue,
    # j5_dense_date_store_grid, j6_top_customers
    # (displaced when the ten registry_stats queries rotated in),
    # j7_store_region_rollup, p1/p2/p3/p4/p6/u1/f1, x1-x6, r1, i1-i5,
    # sd_nested_store_daily, a4_payment_map_rollup, j5_wide_serialized,
    # d6_simhash_neardup, d7_semantic_dedup, d8_decontaminate,
    # sim2_cosine_neardup, t6_stratified_sample.
    "a7_trailing_7day",
    "a8_company_trailing", "a9_product_trailing",
    "a10_deviation_vs_trailing", "a11_trend_recent_vs_earlier",
    "a12_trend_half_vs_half", "a13_trend_first_vs_last",
    "a14_kpi_for_range", "a15_top_products_reagg",
    "a16_product_range_stats", "a17_distinct_dates",
    "j1_missing_stores_anti", "j3_brand_revenue",
    "j5_dense_date_store_grid", "j6_top_customers",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    ordered = {
        n: registry.QUERIES[n]
        for n in _VERIFY_FIRST
        if n in registry.QUERIES
    }
    for n, fn in registry.QUERIES.items():
        ordered.setdefault(n, fn)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    ops, which get the weaker rows-only check)."""
    return dict(registry.ORACLES)

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
    # ================= r5 window (first 50) =================
    # --- r5 changed plans: pq1's codes column serialized for the
    # driver canonicalizer (the r4 FAIL — pandas sort_values cannot
    # factorize ndarray cells); hh1 rewritten to a single fact scan
    # (window over the per-SKU partial, the r4 bench flag); d9/d10's
    # connected components switched to alternating-star contraction
    # (the r4 sf1 scale wall, 35s -> 13s)
    "pq1_pq_codes", "hh1_heavy_hitters",
    "d9_semantic_dedup_cc", "d10_minhash_dup_groups",
    # --- r5 new: ADC top-k isolated from ivfpq1's pruning (pq2),
    # residual product quantization (pq3), the PII scrub promoted to
    # a full oracle via deterministic doc_id-derived injection (t9),
    # and the merged-sketch cardinality-drift monitor (qr2) — the
    # sketch-layer composition proof
    "pq2_adc_topk", "pq3_residual_codes", "pq4_adc_rerank",
    "t9_pii_scrub", "qr2_cardinality_drift",
    "hist2_histogram_range_merge", "scd2_validity_intervals",
    "sk3_kmv_set_overlap", "cm1_range_heavy_users",
    # --- r5 changed plans (late, both sf10-rehearsal findings): the
    # k-means trainer's monitoring cost became a float64 column (the
    # int64 cost sum overflowed at 100x vectors), which changes the
    # partial schema in every kmeans_train consumer — c1 directly,
    # ivfpq1 via the coarse quantizer (pq3 likewise, already above);
    # and d6 re-registered on the 64-bit sketch (32-bit band values
    # saturate at 500k docs: 268x on 100x data -> 21x)
    "c1_kmeans_clusters", "ivfpq1_topk", "d6_simhash_neardup",
    # --- r5 recheck: src1 re-verifies because corpus_datasheet grew
    # threshold forwarding (identical plan at registry defaults, but
    # the code path changed — ADVICE r4 item 4); sk2 because
    # kmv_merge_daily became a single-pass aggregation (one fact scan
    # per window instead of two — plan changed, values identical)
    "src1_corpus_datasheet", "sk2_kmv_range_merge",
    # --- stale r01/r02 block (VERDICT r4 item 2): last driver-green
    # 2-3 rounds ago, plans unchanged since (local parity green every
    # round) — rotated back through the window so no registry entry's
    # last green driver row is older than 2 rounds
    "t1_text_stats", "t2_lang_id", "t3_fingerprint",
    "t4_token_count_bpe", "t5_rolling_fingerprint",
    "d1_exact_dedup", "d2_minhash_signatures",
    "d3_lsh_candidate_pairs", "d4_minhash_neardup", "d5_simhash",
    "sim1_cosine_topk", "sim3_lsh_topk", "sim4_ivf_topk",
    "mm1_binary_fingerprint_dedup", "mm2_modality_stats",
    "mm3_pairing_integrity",
    # --- least-recently-verified r3 block: last green in
    # CORRECTNESS_r03, plans untouched since (the r5 commits touch
    # quality.py/dedup.py/stats.py/textops.py functions these plans
    # never call)
    "a7_trailing_7day",
    "a8_company_trailing", "a9_product_trailing",
    "a10_deviation_vs_trailing", "a11_trend_recent_vs_earlier",
    "a12_trend_half_vs_half", "a13_trend_first_vs_last",
    "a14_kpi_for_range", "a15_top_products_reagg",
    "a16_product_range_stats", "a17_distinct_dates",
    "j1_missing_stores_anti", "j3_brand_revenue",
    "j5_dense_date_store_grid", "j6_top_customers",
    "j7_store_region_rollup",
    # ================= past the 50-window =================
    # (x1-x6/i1/i2/i3 displaced to positions 51-59 by the sk2/hist2/
    # pq4/scd2/sk3/cm1 rotations and the late c1/ivfpq1/d6
    # re-rotation — r3-green, plans unchanged since)
    "x1_export_store_summaries",
    "x2_export_top_products", "x3_export_anomalies",
    "x4_export_trends",
    "x5_export_recommendations", "x6_export_manifest",
    "i1_anomaly_classify", "i2_trend_insights", "i3_recommendations",
    # --- r4-green (CORRECTNESS_r04), plans unchanged in r5:
    "dq1_profile_columns", "gap1_missing_days",
    "cp1_cusum_changepoint", "ewma1_smoothed_sales",
    "hll1_distinct_transactions", "z1_robust_zscore",
    "drift1_payment_tvd",
    "scd1_latest_per_key", "mo1_zorder_codes",
    "hist1_log2_histogram", "qr1_quality_report",
    "cube1_store_payment_cube", "u2_setops_assortment",
    "d12_editdist_neardup", "hll2_range_merge",
    "w2_window_sampler", "f2_array_sampler",
    "cur1_curated_corpus",
    "tri1_copurchase_triangles",
    "aj1_event_order_asof", "rj1_busy_window_events",
    "sk1_kmv_distinct_skus", "q1_payment_quantiles",
    "w1_weighted_sample", "tf1_tfidf_keywords",
    "t10_familiarity", "fun1_event_funnel",
    "coh1_cohort_retention", "pr1_pagerank_stores",
    "aj2_order_next_event", "d11_containment", "co1_sku_copurchase",
    "a19_dow_seasonality",
    "t7_repetition_filter", "t8_doc_frequency",
    "pack1_sequence_packing",
    "e1_embedding_dim_profile",
    "ev_tumbling_hourly", "ev_sliding_2h_hourly",
    "ev_session_windows", "a18_event_type_summary",
    "j5_wide_pivot_timeseries",
    # --- r3-green tail, plans unchanged since r3: a1-a6 family,
    # p1/p2/p3/p4/p6/u1/f1, r1, i4/i5, sd_nested_store_daily,
    # a4_payment_map_rollup, j5_wide_serialized,
    # d7_semantic_dedup, d8_decontaminate, sim2_cosine_neardup,
    # t6_stratified_sample — next round's rotation candidates
    # (d6 rotated into the window above: 64-bit re-registration).
    "a1_store_day_metrics", "a2_payment_breakdown",
    "a2_payment_per_store_day", "a3_top5_products_store_day",
    "a4_company_daily", "a6_product_daily_exact",
    "a6_product_daily_top5_parity",
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

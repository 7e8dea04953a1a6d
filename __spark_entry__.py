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
    # ================= r10 window (first 50) =================
    # --- r10 changed plans, verified first: x1/x2's export range
    # filter moved onto the FACTS (exact — sale_date is a group key;
    # measured 30.2 s -> 2.6 s cold at sf10; baselines re-pinned,
    # benchmarks/export_r10_sf10.json).
    "x1_export_store_summaries", "x2_export_top_products",
    # --- the remaining r7-green block (36 entries, staleness 3 this
    # round — the repo's <=2-round freshness contract makes them the
    # mandatory body of the r10 window; local parity green every
    # round, plans unchanged except x1/x2 above):
    "x3_export_anomalies", "x4_export_trends",
    "x5_export_recommendations", "x6_export_manifest",
    "r1_daily_report_lines",
    "a2_payment_per_store_day",
    "a3_top5_products_store_day", "sd_nested_store_daily",
    "a4_payment_map_rollup", "a4_company_daily",
    "a6_product_daily_exact", "a6_product_daily_top5_parity",
    "j5_wide_pivot_timeseries", "j5_wide_serialized",
    "a18_event_type_summary", "p1_store_summary_projection",
    "p2_prefix_filter", "p3_point_lookup", "p4_range_filter_daily",
    "p6_isin_filter", "u1_union_tagged", "f1_scalar_sampler",
    "i1_anomaly_classify", "i2_trend_insights", "i3_recommendations",
    "i4_combine_insights", "i5_insight_summary", "d8_decontaminate",
    "t6_stratified_sample", "cur2_train_eval_split",
    "mix1_source_mixing_weights", "cap1_source_cap",
    "shuf1_deterministic_shuffle", "hist1_log2_histogram",
    "hist2_histogram_range_merge", "qr1_quality_report",
    # --- 12 spare slots: the head of the r8-green block in its r8
    # order (48 entries, staleness 2 this round — they ALL come due
    # in r11, so each one verified now shrinks the r11 window
    # pressure to 36 + r11 changes):
    "d5_simhash", "d6_simhash_neardup", "bud1_token_budget_select",
    "rel1_release_order", "sim2_cosine_neardup", "d7_semantic_dedup",
    "src2_cross_source_dups", "sim3_lsh_topk", "d9_semantic_dedup_cc",
    "d10_minhash_dup_groups", "a19_dow_seasonality",
    "aj1_event_order_asof",
    # ================= past the 50-window =================
    # r11 ROTATION PREP: (0) commit CORRECTNESS_r10/BENCH_r10 if the
    # driver has not; then lead with any r11 plan changes, then this
    # remaining r8-green block (36 entries, staleness 3 by r11), then
    # the r9 window in its r9 order. 36 + changes fits one window
    # unless r11 changes >14 plans; if it does, slip the tail of THIS
    # list and say so here.
    "co1_sku_copurchase", "coh1_cohort_retention",
    "cp1_cusum_changepoint", "cube1_store_payment_cube",
    "cur1_curated_corpus", "d11_containment", "d12_editdist_neardup",
    "dq1_profile_columns", "drift1_payment_tvd",
    "e1_embedding_dim_profile", "ev_session_windows",
    "ev_sliding_2h_hourly", "ev_tumbling_hourly",
    "ewma1_smoothed_sales", "f2_array_sampler", "fun1_event_funnel",
    "gap1_missing_days", "hll1_distinct_transactions",
    "hll2_range_merge", "mo1_zorder_codes", "pack1_sequence_packing",
    "pr1_pagerank_stores", "q1_payment_quantiles",
    "rj1_busy_window_events", "scd1_latest_per_key",
    "sk1_kmv_distinct_skus", "t10_familiarity",
    "t7_repetition_filter", "t8_doc_frequency", "tf1_tfidf_keywords",
    "tri1_copurchase_triangles", "u2_setops_assortment",
    "w1_weighted_sample", "w2_window_sampler", "z1_robust_zscore",
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

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
    # ================= r7 window (first 50) =================
    # --- r7 NEW queries, verified first: the deterministic train/val/
    # test split and the temperature-scaled source mixing weights
    # (cur1/d11 displaced from the tail of this window to the r8 block
    # to make room — still r4-green, plans unchanged):
    "cur2_train_eval_split", "mix1_source_mixing_weights",
    # wn1/wn2 (MOSS winnowing overlap + decontamination) added late in
    # r7 — verified first; cp1/cube1 displaced to the head of the r8
    # block to hold the window at 50:
    "wn1_winnow_overlap", "wn2_winnow_decontaminate",
    "bud1_token_budget_select", "src2_cross_source_dups",
    "cap1_source_cap", "shuf1_deterministic_shuffle",
    "rel1_release_order",
    # --- r7 changed plans / new oracle:
    # d6 re-registered on the 128-bit word-array SimHash tier with the
    # size-conditional band broadcast (the r5/r6 scale wall); j5_wide
    # gains its FIRST value-hash oracle (explicit pivot values +
    # DuckDB dynamic PIVOT) after two rounds of no_oracle rows; d9/d10
    # ride the star-CC changes (self-loop-only singleton roots, the
    # checksum fixed-point test); hist1/hist2/qr1 ride the log2-bin
    # positive-cents domain guard in the daily histogram layer.
    "d6_simhash_neardup", "j5_wide_pivot_timeseries",
    "d9_semantic_dedup_cc", "d10_minhash_dup_groups",
    "hist1_log2_histogram", "hist2_histogram_range_merge",
    "qr1_quality_report",
    # --- the full r3-stale block (VERDICT r6 item 2: last
    # driver-green in CORRECTNESS_r03, 4 rounds ago by now; local
    # parity green every round, plans unchanged since except where
    # noted above):
    "a1_store_day_metrics", "a2_payment_breakdown",
    "a2_payment_per_store_day", "a3_top5_products_store_day",
    "a4_company_daily", "a4_payment_map_rollup",
    "a6_product_daily_exact", "a6_product_daily_top5_parity",
    "d7_semantic_dedup", "d8_decontaminate",
    "f1_scalar_sampler",
    "i1_anomaly_classify", "i2_trend_insights", "i3_recommendations",
    "i4_combine_insights", "i5_insight_summary",
    "j5_wide_serialized",
    "p1_store_summary_projection", "p2_prefix_filter",
    "p3_point_lookup", "p4_range_filter_daily", "p6_isin_filter",
    "r1_daily_report_lines", "sd_nested_store_daily",
    "sim2_cosine_neardup", "t6_stratified_sample", "u1_union_tagged",
    "x1_export_store_summaries", "x2_export_top_products",
    "x3_export_anomalies", "x4_export_trends",
    "x5_export_recommendations", "x6_export_manifest",
    # --- the oldest r4-stale block (first 2 of the 41 last green in
    # CORRECTNESS_r04 — r7's 8 NEW queries displaced the other 8 of
    # the original 10; the remaining 39 + the r6-green set are the r8
    # window, so every r4-green entry is re-verified by r8):
    "a18_event_type_summary",
    # ================= past the 50-window =================
    "a19_dow_seasonality",
    "aj1_event_order_asof", "aj2_order_next_event",
    "co1_sku_copurchase", "coh1_cohort_retention",
    "cp1_cusum_changepoint", "cube1_store_payment_cube",
    # the rest of the r4 block — next round's rotation candidates,
    # ahead of the r5/r6-green tail which the registry order supplies:
    "cur1_curated_corpus", "d11_containment",
    "d12_editdist_neardup", "dq1_profile_columns",
    "drift1_payment_tvd", "e1_embedding_dim_profile",
    "ev_session_windows", "ev_sliding_2h_hourly", "ev_tumbling_hourly",
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

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
    # ================= r9 window (first 50) =================
    # --- r9 changed/new plans, verified first:
    # co2 and tri2 are NEW (the co-purchase daily partial layer
    # registered + its range triangle census — VERDICT r8 task 2);
    # wn1/wn2 ride the winnow artifact-gate fix (ADVICE r9 medium:
    # cache="auto" now gates at 10k docs like the dedup/band/model
    # artifact tiers, so the driver-scale plan is the inline form
    # again).
    "co2_copurchase_range_merge", "tri2_triangles_range",
    "wn1_winnow_overlap", "wn2_winnow_decontaminate",
    # --- the full 44-query r6-green block (VERDICT r8 task 1: last
    # driver-green in CORRECTNESS_r06, at the 2-round staleness
    # boundary; local parity green every round, plans unchanged):
    "a7_trailing_7day", "a10_deviation_vs_trailing",
    "a11_trend_recent_vs_earlier", "a12_trend_half_vs_half",
    "a13_trend_first_vs_last",
    "a8_company_trailing", "a9_product_trailing",
    "a16_product_range_stats", "j1_missing_stores_anti",
    "j3_brand_revenue", "j5_dense_date_store_grid",
    "j6_top_customers", "j7_store_region_rollup",
    "a14_kpi_for_range", "a15_top_products_reagg",
    "a17_distinct_dates", "t1_text_stats", "t2_lang_id",
    "t3_fingerprint", "t4_token_count_bpe", "t5_rolling_fingerprint",
    "d1_exact_dedup", "d2_minhash_signatures",
    "d3_lsh_candidate_pairs", "d4_minhash_neardup",
    "mm1_binary_fingerprint_dedup", "mm2_modality_stats",
    "mm3_pairing_integrity", "sim1_cosine_topk", "sim4_ivf_topk",
    "t9_pii_scrub", "c1_kmeans_clusters",
    "pq1_pq_codes", "ivfpq1_topk", "pq2_adc_topk", "pq4_adc_rerank",
    "pq3_residual_codes", "src1_corpus_datasheet",
    "sk2_kmv_range_merge", "sk3_kmv_set_overlap",
    "qr2_cardinality_drift", "cm1_range_heavy_users",
    "hh1_heavy_hitters", "scd2_validity_intervals",
    # --- 2 spare slots: the head of the r7-green block (40 entries,
    # staleness 2 this round — they ALL come due in r10, so each one
    # verified now shrinks the r10 window pressure to 38 + changes):
    "a1_store_day_metrics", "a2_payment_breakdown",
    # ================= past the 50-window =================
    # r10 ROTATION PREP: (0) commit CORRECTNESS_r09/BENCH_r09 before
    # any r10 code lands (the hygiene item three verdicts flagged);
    # then lead with any r10 plan changes, then this remaining
    # r7-green block (38 entries, staleness 3 by r10), then the r8
    # window in its r8 order. 38 + changes fits one window unless r10
    # changes >12 plans; if it does, slip the tail of THIS list
    # (x1-x6/r1 exports are the least scale-sensitive) and say so
    # here.
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
    "x1_export_store_summaries", "x2_export_top_products",
    "x3_export_anomalies", "x4_export_trends",
    "x5_export_recommendations", "x6_export_manifest",
    "r1_daily_report_lines",
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

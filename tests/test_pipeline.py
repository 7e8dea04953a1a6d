"""pipeline.run_daily_pipeline: materialized derived-table layer +
S10 run-ledger idempotency (``infrastructure/eventbridge.tf:81-148``).
"""

from __future__ import annotations

import os

import pytest

from serverless_smurf_etl_and_analytics_spark import pipeline, tables
from serverless_smurf_etl_and_analytics_spark.operators import metrics

SF_DIR = "/root/testdata/sf0.001"
RUN_DATE = "2001-06-15"


@pytest.fixture(scope="module")
def out_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pipeline_out"))
    stats = pipeline.run_daily_pipeline(
        spark, SF_DIR, d, RUN_DATE,
        export_start="2001-06-01", export_end="2001-06-30",
    )
    return d, stats


def test_pipeline_materializes_all_tables(spark, out_dir):
    d, stats = out_dir
    assert stats["skipped"] is False
    for table in ("store_daily", "company_daily", "product_daily"):
        assert stats[f"{table}_rows"] > 0
        assert os.path.isdir(os.path.join(d, table))
    assert stats["report_lines"] >= 2
    assert stats["export_datasets"] == 5
    assert os.path.exists(os.path.join(d, "exports", "manifest.json"))


def test_company_daily_matches_direct_computation(spark, out_dir):
    d, _ = out_dir
    mv = spark.read.parquet(os.path.join(d, "company_daily"))
    txns = tables.transactions(spark, SF_DIR)
    direct = metrics.company_daily(metrics.store_day_metrics(txns))
    got = {
        r["sale_date"]: r["total_sales"]
        for r in mv.select("sale_date", "total_sales").collect()
    }
    want = {
        r["sale_date"]: r["total_sales"]
        for r in direct.select("sale_date", "total_sales").collect()
    }
    assert got == want


def test_rerun_is_noop(spark, out_dir):
    d, _ = out_dir
    sd = os.path.join(d, "store_daily")
    mtimes_before = {
        f: os.path.getmtime(os.path.join(root, f))
        for root, _, fs in os.walk(sd)
        for f in fs
    }
    stats2 = pipeline.run_daily_pipeline(spark, SF_DIR, d, RUN_DATE)
    assert stats2 == {"run_date": RUN_DATE, "skipped": True}
    mtimes_after = {
        f: os.path.getmtime(os.path.join(root, f))
        for root, _, fs in os.walk(sd)
        for f in fs
    }
    assert mtimes_before == mtimes_after


def test_force_rerun_executes(spark, out_dir):
    d, _ = out_dir
    stats3 = pipeline.run_daily_pipeline(
        spark, SF_DIR, d, RUN_DATE, force=True
    )
    assert stats3["skipped"] is False
    led = pipeline.read_ledger(spark, d)
    assert led.filter(led.status == "succeeded").count() == 2


def test_ledger_distinguishes_dates(spark, out_dir):
    d, _ = out_dir
    assert pipeline.already_succeeded(spark, d, RUN_DATE)
    assert not pipeline.already_succeeded(spark, d, "1999-01-01")


def test_sketch_layer_answers_range_distinct_without_facts(spark, out_dir):
    """The materialized sku_sketches layer must answer a range
    distinct-SKU query with exactly the values the direct sk2
    computation gets from the raw fact table (KMV merge law, through
    the pipeline's persisted form)."""
    from serverless_smurf_etl_and_analytics_spark.operators import stats

    d, run_stats = out_dir
    assert run_stats["sku_sketch_rows"] > 0
    assert os.path.isdir(os.path.join(d, "sku_sketches"))
    start, end = "2001-06-10", "2001-06-20"
    from_mv = {
        r["store_id"]: r
        for r in pipeline.distinct_skus_for_range(
            spark, d, start, end
        ).collect()
    }
    direct = {
        r["store_id"]: r
        for r in stats.kmv_merge_range(
            tables.transactions(spark, SF_DIR), start, end
        ).collect()
    }
    assert set(from_mv) == set(direct)
    for store in direct:
        assert from_mv[store]["kth_hash"] == direct[store]["kth_hash"]
        assert (
            from_mv[store]["est_distinct"] == direct[store]["est_distinct"]
        )
        assert (
            from_mv[store]["n_days_merged"] == direct[store]["n_days_merged"]
        )


def test_hll_register_layer_answers_range_distinct(spark, out_dir):
    """The materialized hll_registers layer must produce exactly the
    merged sketch the direct hll2 computation gets from raw facts
    (register max-merge law, through the pipeline's persisted form)."""
    from serverless_smurf_etl_and_analytics_spark.operators import stats

    d, run_stats = out_dir
    assert run_stats["hll_register_rows"] > 0
    assert os.path.isdir(os.path.join(d, "hll_registers"))
    start, end = "1995-01-01", "2001-12-31"
    from_mv = {
        r["payment_method"]: r
        for r in pipeline.distinct_transactions_for_range(
            spark, d, start, end
        ).collect()
    }
    direct = {
        r["payment_method"]: r
        for r in stats.hll_merge_range(
            tables.transactions(spark, SF_DIR), start, end
        ).collect()
    }
    assert set(from_mv) == set(direct)
    for method in direct:
        assert from_mv[method]["s_scaled"] == direct[method]["s_scaled"]
        assert from_mv[method]["est_hll"] == direct[method]["est_hll"]
        assert (
            from_mv[method]["n_days_merged"]
            == direct[method]["n_days_merged"]
        )


def test_histogram_layer_answers_range_median(spark, out_dir):
    """The materialized cents_histograms layer must produce exactly
    the merged p50 bracket the direct hist2 computation gets from raw
    facts (bin-sum merge law, through the pipeline's persisted form),
    and the bracket must contain the exact range median."""
    from serverless_smurf_etl_and_analytics_spark.operators import quality

    d, run_stats = out_dir
    assert run_stats["cents_histogram_rows"] > 0
    assert os.path.isdir(os.path.join(d, "cents_histograms"))
    start, end = "1995-01-01", "2001-12-31"
    from_mv = {
        r["payment_method"]: r
        for r in pipeline.median_cents_for_range(
            spark, d, start, end
        ).collect()
    }
    direct = {
        r["payment_method"]: r
        for r in quality.hist_merge_range(
            tables.transactions(spark, SF_DIR), start, end
        ).collect()
    }
    assert set(from_mv) == set(direct)
    for m in direct:
        for col in ("p50_bin", "p50_lo_c", "p50_hi_c", "n_lines",
                    "n_days_merged"):
            assert from_mv[m][col] == direct[m][col], (m, col)
        assert direct[m]["p50_in_bin"] == 1

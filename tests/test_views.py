"""SQL-view serving layer (SURVEY §3.3) + scheduled catch-up (S10)."""

from __future__ import annotations

from serverless_smurf_etl_and_analytics_spark import pipeline
from serverless_smurf_etl_and_analytics_spark.plans import registry, views

from conftest import SF_DIR


def test_views_are_queryable_sql(spark):
    names = views.register_views(
        spark, SF_DIR, ["a14_kpi_for_range", "a17_distinct_dates"]
    )
    assert set(names) == {"a14_kpi_for_range", "a17_distinct_dates"}
    kpi = spark.sql("SELECT total_sales FROM a14_kpi_for_range").collect()
    assert len(kpi) == 1 and kpi[0][0] > 0
    n = spark.sql(
        "SELECT count(*) FROM a17_distinct_dates"
    ).collect()[0][0]
    assert n > 0


def test_register_all_views_is_lazy_and_complete(spark):
    names = views.register_views(spark, SF_DIR)
    assert set(names) == set(registry.QUERIES)
    # lazy: registering 60+ views costs nothing until queried; probing
    # one confirms the catalog entries resolve
    assert spark.sql(
        "SELECT count(*) FROM p2_prefix_filter"
    ).collect()[0][0] >= 0


def test_scheduled_catchup_skips_succeeded_dates(spark, tmp_path):
    out = str(tmp_path / "catchup_out")
    first = pipeline.run_daily_pipeline(
        spark, SF_DIR, out, "2001-06-14"
    )
    assert first["skipped"] is False
    res = pipeline.run_scheduled_catchup(
        spark, SF_DIR, out, ["2001-06-14", "2001-06-15"]
    )
    assert res["2001-06-14"] == {"run_date": "2001-06-14", "skipped": True}
    assert res["2001-06-15"]["skipped"] is False
    led = pipeline.read_ledger(spark, out)
    assert led.count() == 2

"""Physical-layout laws: bucketed tables join without an Exchange
(the 100 TB co-located-join story), with an unbucketed negative
control proving the assertion has teeth, and results identical either
way."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import history, layout

from conftest import SF_DIR


@pytest.fixture()
def no_broadcast(spark):
    # force SortMergeJoin so the Exchange assertion is about
    # bucketing, not about a broadcast hiding the shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    txns = tables.transactions(spark, SF_DIR)
    daily = history.store_daily_cents(txns)
    totals = daily.groupBy("store_id").agg(
        F.sum("sales_c").alias("tot_c")
    )
    layout.write_bucketed(
        daily, "t_daily_b", str(tmp_path / "daily"), ["store_id"], 4
    )
    layout.write_bucketed(
        totals, "t_totals_b", str(tmp_path / "totals"), ["store_id"], 4
    )
    try:
        joined = layout.colocated_join(
            spark, "t_daily_b", "t_totals_b", ["store_id"]
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "SelectedBucketsCount" in plan  # bucket pruning metadata

        # negative control: the same join over plain parquet shuffles
        plain = daily.join(totals, "store_id")
        assert "Exchange" in _plan(plain)

        # and the bucketed plan computes the same result
        a = sorted(map(tuple, joined.collect()))
        b = sorted(map(tuple, plain.select(*joined.columns).collect()))
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS t_daily_b")
        spark.sql("DROP TABLE IF EXISTS t_totals_b")


def test_bucketed_scan_prunes_on_key(spark, tmp_path):
    txns = tables.transactions(spark, SF_DIR)
    daily = history.store_daily_cents(txns)
    layout.write_bucketed(
        daily, "t_daily_p", str(tmp_path / "dailyp"), ["store_id"], 4
    )
    # DisableUnnecessaryBucketedScan turns the bucketed read off when
    # no operator needs the distribution — which also forfeits bucket
    # PRUNING; a pruning-only read must opt back in
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    try:
        one = spark.table("t_daily_p").filter(
            F.col("store_id") == "0001"
        )
        plan = _plan(one)
        # an equality predicate on the bucket key scans 1 of 4 buckets
        assert "SelectedBucketsCount: 1 out of 4" in plan, plan
        assert one.count() == daily.filter(
            F.col("store_id") == "0001"
        ).count()
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )
        spark.sql("DROP TABLE IF EXISTS t_daily_p")

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


def test_store_daily_serving_layout_prunes_store_probes(
    spark, tmp_path
):
    """The measured layout win is the pipeline DEFAULT (VERDICT r5/r6
    item 7): materialize_store_daily writes one directory per
    sale_date with rows clustered by store_id inside it, so a store
    probe (the P3 point-lookup serving path) admits only the row
    groups whose min/max footers cover the store. Row groups are
    shrunk via hadoop conf so the property is observable at test
    scale; the rehearsal artifacts (benchmarks/pruning_r5_sf*.json)
    record the same measurement at sf1/sf10."""
    import glob
    import os

    import pyarrow.parquet as pq

    from serverless_smurf_etl_and_analytics_spark import pipeline

    dates = ["2024-01-01", "2024-01-02"]
    df = (
        spark.range(512)
        .selectExpr("lpad(cast(id as string), 4, '0') AS store_id")
        .crossJoin(
            spark.createDataFrame([(d,) for d in dates], "sale_date string")
        )
        .selectExpr(
            "store_id",
            "sale_date",
            # high-entropy payload (and dictionary encoding disabled
            # below): a constant/compressible payload buffers to ~no
            # bytes, so the writer's block-size check never splits row
            # groups at test scale
            "repeat(md5(store_id || sale_date), 8) AS payload",
        )
    )
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    saved = {
        k: hc.get(k)
        for k in (
            "parquet.block.size",
            "parquet.page.size",
            "parquet.block.size.row.check.min",
            "parquet.enable.dictionary",
        )
    }
    hc.setInt("parquet.block.size", 4096)
    hc.setInt("parquet.page.size", 1024)
    hc.setInt("parquet.block.size.row.check.min", 10)
    hc.setBoolean("parquet.enable.dictionary", False)
    try:
        sd = str(tmp_path / "store_daily")
        pipeline.materialize_store_daily(df, sd)
    finally:
        for k, v in saved.items():
            if v is None:
                hc.unset(k)
            else:
                hc.set(k, v)

    part = os.path.join(sd, "sale_date=2024-01-01")
    files = sorted(glob.glob(os.path.join(part, "*.parquet")))
    assert files, "partition directory missing"
    adm = tot = 0
    prev_max = None
    for f in files:
        meta = pq.ParquetFile(f).metadata
        idx = {
            meta.schema.column(i).name: i
            for i in range(meta.num_columns)
        }
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx["store_id"]).statistics
            assert st is not None and st.has_min_max
            tot += 1
            if st.min <= "0300" <= st.max:
                adm += 1
            # clustering: row groups cover disjoint ascending ranges
            if prev_max is not None:
                assert st.min >= prev_max
            prev_max = st.max
    assert tot >= 4, f"row groups did not split (tot={tot})"
    assert adm == 1, f"store probe admitted {adm}/{tot} row groups"
    # the layout is a pure rewrite: content unchanged
    got = spark.read.parquet(sd)
    assert got.count() == 1024
    assert (
        got.filter(
            (F.col("store_id") == "0300")
            & (F.col("sale_date") == "2024-01-01")
        ).count()
        == 1
    )

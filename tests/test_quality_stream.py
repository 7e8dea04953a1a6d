"""Incremental quality-alarm maintenance on the ingest stream: after
the full replay, the per-store alarm partitions (each written by the
last micro-batch that touched the store, from that store's complete
history) equal the batch quality_report on the final store_daily —
exactly, not approximately."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators.quality import (
    quality_report,
)
from serverless_smurf_etl_and_analytics_spark.sources import ingest
from serverless_smurf_etl_and_analytics_spark.streaming import ingest_stream

from conftest import SF_DIR


@pytest.fixture()
def upload_dir(spark, tmp_path):
    d = tmp_path / "uploads"
    ingest.make_upload_fixture(spark, SF_DIR, str(d), n_days=4)
    return d


def test_streamed_alarms_equal_batch_report(spark, upload_dir, tmp_path):
    store_daily = tmp_path / "store_daily"
    expected = tables.load(spark, SF_DIR, "supplier").select(
        F.lpad(F.col("s_suppkey").cast("string"), 4, "0").alias("store_id")
    )
    q = ingest_stream.start_ingest_stream(
        spark,
        str(upload_dir),
        str(store_daily),
        str(tmp_path / "ledger"),
        expected,
        str(tmp_path / "ckpt"),
        max_files=3,  # force multiple micro-batches
        alarms_dir=str(tmp_path / "alarms"),
    )
    q.awaitTermination(180)

    streamed = spark.read.parquet(str(tmp_path / "alarms"))
    markers = streamed.filter(F.col("alarm_type") == "evaluated_through")
    alarms = streamed.filter(F.col("alarm_type") != "evaluated_through")

    final_daily = (
        spark.read.parquet(str(store_daily))
        .select(
            "store_id",
            "sale_date",
            F.round(F.col("total_sales") * 100).cast("long").alias(
                "sales_c"
            ),
        )
    )
    want = quality_report(final_daily)

    cols = ["store_id", "alarm_date", "alarm_type", "metric"]
    got_rows = sorted(map(tuple, alarms.select(*cols).collect()))
    want_rows = sorted(map(tuple, want.select(*cols).collect()))
    assert got_rows == want_rows
    assert got_rows, "no alarms raised — fixture too clean to test"

    # every store that streamed any data carries a marker proving its
    # partition was (re)written by its last touching batch
    streamed_stores = {
        r["store_id"]
        for r in final_daily.select("store_id").distinct().collect()
    }
    marker_stores = {r["store_id"] for r in markers.collect()}
    assert marker_stores == streamed_stores

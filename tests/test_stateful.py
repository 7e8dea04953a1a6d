"""applyInPandasWithState: per-store running-deviation operator —
state must survive micro-batch boundaries (one file per batch) and
match an offline recomputation exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators.history import (
    store_daily_cents,
)
from serverless_smurf_etl_and_analytics_spark.streaming import stateful

from conftest import SF_DIR


@pytest.fixture(scope="module")
def day_files(spark, tmp_path_factory):
    """store-day rows split into one parquet file PER DATE, named so
    the file source lists them in date order."""
    base = tmp_path_factory.mktemp("day_files")
    daily = (
        store_daily_cents(tables.transactions(spark, SF_DIR))
        .select("store_id", "sale_date", "sales_c")
    )
    dates = sorted(
        r[0]
        for r in daily.select("sale_date").distinct().limit(10).collect()
    )
    rows = daily.filter(F.col("sale_date").isin(dates)).collect()
    schema = "store_id string, sale_date string, sales_c long"
    for i, d in enumerate(dates):
        part = [tuple(r) for r in rows if r["sale_date"] == d]
        spark.createDataFrame(part, schema).coalesce(1).write.parquet(
            str(base / f"{i:04d}")
        )
    return base, rows, dates


def test_state_survives_batches_and_matches_offline(
    spark, day_files, tmp_path
):
    base, rows, dates = day_files
    stream = spark.readStream.schema(
        "store_id string, sale_date string, sales_c long"
    ).option("maxFilesPerTrigger", "1").parquet(str(base) + "/*")
    out = stateful.running_deviation(stream, min_days=3)
    q = (
        out.writeStream.format("memory")
        .queryName("running_dev")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["store_id"], r["sale_date"]): (
            r["days_seen"],
            r["deviation_pct"],
        )
        for r in spark.sql("select * from running_dev").collect()
    }

    # offline recomputation: fold each store's days in date order
    series: dict[str, list[tuple[str, int]]] = {}
    for r in rows:
        series.setdefault(r["store_id"], []).append(
            (r["sale_date"], r["sales_c"])
        )
    want = {}
    for store, pts in series.items():
        days, sum_c = 0, 0
        for d, sc in sorted(pts):
            if days >= 3 and sum_c > 0:
                avg = sum_c / days
                want[(store, d)] = (
                    days,
                    round((sc - avg) / avg * 1000.0) / 10.0,
                )
            days += 1
            sum_c += sc
    assert got == want
    assert len(got) > 0

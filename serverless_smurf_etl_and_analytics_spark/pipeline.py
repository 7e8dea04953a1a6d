"""Daily-pipeline orchestration (SURVEY.md §3.1/§3.2; §7.1 item 8).

Materializes the derived-table layer ONCE per run — ``store_daily`` in
its full nested serving shape, ``company_daily``, ``product_daily``,
and the three insight sets — then derives the daily report and the
five BI exports from the MATERIALIZED tables instead of rescanning the
fact table. This is the reference's core design: store_daily is
persisted by ``write-metrics/lambda_function.py:77-104`` and every
downstream consumer (``get-store-summaries``, ``detect-anomalies``,
``export-to-quicksight``) rereads it rather than re-aggregating raw
transactions (SURVEY §4 "pre-aggregation / materialized views").

S10 idempotency (``infrastructure/eventbridge.tf:81-148``): the
reference's scheduled 23:00 trigger lists prior runs and skips when an
execution for "today" already succeeded. Here a run-ledger parquet
table plays that role: ``run_daily_pipeline`` is a no-op for a
(run_date) whose ledger row says succeeded, unless ``force=True``.

Scale notes (100 TB):
- each materialization is one bounded-output aggregation over the fact
  table (rows = |stores| x |days| or |skus| x |days|), written
  partitioned by sale_date so daily upserts touch one partition;
- every downstream consumer reads the tiny MV, never the fact table —
  the fact table is scanned a constant number of times per run;
- the ledger is append-only, one row per run — read it with a filter
  on run_date (partition-prunable if grown large).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from . import tables
from .functions.money import cents
from .operators import export, metrics, report
from .operators.quality import daily_log2_histograms, hist_merge_daily
from .operators.stats import (
    hll_daily_registers,
    hll_merge_daily,
    kmv_daily_sketches,
    kmv_merge_daily,
)
from .operators.insights import (
    classify_anomalies_from_daily,
    recommendations_from,
    trend_insights_from_daily,
)

LEDGER_DIR = "run_ledger"


def _ledger_path(out_dir: str) -> str:
    return os.path.join(out_dir, LEDGER_DIR)


def read_ledger(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """The run ledger, or None before the first recorded run."""
    path = _ledger_path(out_dir)
    if not os.path.isdir(path):
        return None
    return spark.read.parquet(path)


def already_succeeded(
    spark: SparkSession, out_dir: str, run_date: str
) -> bool:
    """S10 idempotency check: has a run for this logical date already
    succeeded? (``eventbridge.tf:100-127`` — the reference lists state
    machine executions and checks for a succeeded one named for the
    date.)"""
    led = read_ledger(spark, out_dir)
    if led is None:
        return False
    return (
        led.filter(
            (F.col("run_date") == run_date)
            & (F.col("status") == "succeeded")
        )
        .limit(1)
        .count()
        > 0
    )


def record_run(
    spark: SparkSession,
    out_dir: str,
    run_date: str,
    status: str,
    stats: dict,
) -> None:
    """Append one ledger row (run_date, status, stats json, recorded
    UTC timestamp)."""
    row = [
        (
            run_date,
            status,
            json.dumps(stats, sort_keys=True),
            time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime()),
        )
    ]
    df = spark.createDataFrame(
        row, "run_date string, status string, stats string, recorded_at string"
    )
    df.coalesce(1).write.mode("append").parquet(_ledger_path(out_dir))


def materialize_store_daily(df: DataFrame, path: str) -> None:
    """Write the store_daily MV in its SERVING layout: one directory
    per sale_date (directory-level partition pruning serves the date
    axis — P4 range scans and the incremental rewrite) with rows
    clustered by store_id INSIDE each partition, so parquet row-group
    min/max footers prune store probes (P2 prefix, P3 point lookups)
    to the admitting groups. The r5 pruning rehearsal measured the
    clustered layouts admitting 1/32 row groups on store predicates at
    sf1/sf10 where the unclustered write admits all of them
    (``benchmarks/pruning_r5_sf*.json``) — this wires that measured
    win into the pipeline default instead of leaving it a rehearsal
    artifact. Cost: one repartition+sort of a dimension-sized MV
    (|stores| x |days| rows regardless of fact volume) per
    materialization.

    The repartition ALSO fixes small-file pressure: hash-placing each
    date's rows into one task yields one file per partition directory
    instead of one per (task x date)."""
    (
        df.repartition("sale_date")
        .sortWithinPartitions("sale_date", "store_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("sale_date")
        .parquet(path)
    )


def run_daily_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    run_date: str,
    export_start: str | None = None,
    export_end: str | None = None,
    force: bool = False,
    full_refresh: bool = False,
) -> dict:
    """One daily-analysis run (§3.2): materialize the derived tables,
    classify insights, format the report for ``run_date``, export the
    BI datasets, record the ledger row. Returns per-table row counts;
    ``{"skipped": True}`` when the ledger already shows a succeeded run
    for ``run_date`` (S10).

    The first run (or ``full_refresh=True``) bootstraps the full
    store_daily history; every later run aggregates ONLY ``run_date``'s
    transactions and dynamically overwrites that one partition — the
    incremental upsert the reference's per-day processing implies
    (each ``calculate-metrics`` invocation handles one day's uploads).
    ``full_refresh`` is the restatement path for when HISTORY changed
    (late-arriving fact rows, schema backfill)."""
    if not force and already_succeeded(spark, out_dir, run_date):
        return {"run_date": run_date, "skipped": True}

    txns = tables.transactions(spark, sf_dir)
    stats: dict = {"run_date": run_date, "skipped": False}

    # 1. store_daily — the central MV, nested serving shape, one
    #    partition per day. Incremental runs aggregate run_date's rows
    #    only (every store_daily column is a per-(store, day) quantity,
    #    so single-date aggregation is exact) and rewrite one
    #    partition; the bootstrap aggregates all history. At 100 TB the
    #    fact side of an incremental run is one day's slice — with a
    #    date-partitioned fact layout (the S5 sink's shape) the scan
    #    prunes to that day's files.
    sd_path = os.path.join(out_dir, "store_daily")
    bootstrap = full_refresh or not os.path.isdir(sd_path)
    mv_input = (
        txns if bootstrap else txns.filter(F.col("sale_date") == run_date)
    )
    stats["store_daily_mode"] = "bootstrap" if bootstrap else "incremental"
    materialize_store_daily(metrics.store_daily_nested(mv_input), sd_path)
    # partition-column type inference reads sale_date back as DATE;
    # cast to string so MV consumers see the canonical column type
    store_daily = spark.read.parquet(sd_path).withColumn(
        "sale_date", F.col("sale_date").cast("string")
    )
    stats["store_daily_rows"] = store_daily.count()

    # 2. company_daily — rolls up the MATERIALIZED store_daily
    #    (calc-company-metrics consumes the persisted summaries, never
    #    the fact table)
    co_path = os.path.join(out_dir, "company_daily")
    metrics.company_daily(store_daily).write.mode("overwrite").parquet(
        co_path
    )
    stats["company_daily_rows"] = spark.read.parquet(co_path).count()

    # 3. product_daily — top-5 parity rollup from the MATERIALIZED
    #    nested top_products lists (calc-product-metrics consumes each
    #    store's top-5, SURVEY A6 parity trap)
    pd_path = os.path.join(out_dir, "product_daily")
    top_long = store_daily.select(
        "store_id", "sale_date", F.explode("top_products").alias("tp")
    ).select(
        "store_id",
        "sale_date",
        F.col("tp.item_sku").alias("item_sku"),
        F.col("tp.units").alias("units"),
        F.col("tp.revenue").alias("revenue"),
    )
    product_daily = top_long.groupBy("sale_date", "item_sku").agg(
        F.sum("units").alias("units_sold"),
        (
            F.sum(F.round(F.col("revenue") * 100).cast("long")).cast("long")
            / 100.0
        ).cast("double").alias("revenue"),
        F.countDistinct("store_id").alias("store_count"),
        F.concat_ws(",", F.sort_array(F.collect_set("store_id"))).alias(
            "stores_sold_at"
        ),
    )
    product_daily.write.mode("overwrite").parquet(pd_path)
    stats["product_daily_rows"] = spark.read.parquet(pd_path).count()

    # 3b. sku_sketches — the per-(store, day) KMV sketch layer (one
    #     bounded row per store-day, <= 64 hashes). Incremental like
    #     store_daily: a daily run sketches run_date's slice only and
    #     dynamically overwrites that one partition. Range
    #     distinct-SKU questions then merge sketches via
    #     ``distinct_skus_for_range`` below — zero fact-table reads.
    sk_path = os.path.join(out_dir, "sku_sketches")
    (
        kmv_daily_sketches(mv_input)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("sale_date")
        .parquet(sk_path)
    )
    stats["sku_sketch_rows"] = spark.read.parquet(sk_path).count()

    # 3c. hll_registers — the per-(payment_method, day) HLL register
    #     layer (<= 256 bounded rows per method-day), same incremental
    #     contract as 3b; range distinct-transaction questions merge
    #     registers via ``distinct_transactions_for_range`` below.
    hr_path = os.path.join(out_dir, "hll_registers")
    (
        hll_daily_registers(mv_input)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("sale_date")
        .parquet(hr_path)
    )
    stats["hll_register_rows"] = spark.read.parquet(hr_path).count()

    # 3d. cents_histograms — the per-(payment_method, day) power-of-two
    #     histogram layer (<= 64 bounded rows per method-day), same
    #     incremental contract as 3b/3c; range median questions merge
    #     bins via ``median_cents_for_range`` below. Third member of
    #     the materialize+merge family: KMV (distincts), HLL
    #     (distincts at constant state), histograms (quantiles).
    ch_path = os.path.join(out_dir, "cents_histograms")
    (
        daily_log2_histograms(mv_input)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("sale_date")
        .parquet(ch_path)
    )
    stats["cents_histogram_rows"] = spark.read.parquet(ch_path).count()

    # 4. insights — ONE persisted daily-cents + ONE persisted anomaly
    #    set feed all three classifiers (no duplicate window chains).
    #    daily-cents is DERIVED FROM THE MATERIALIZED MV, not the fact
    #    table: sales_c/txn_count round-trip exactly through the
    #    persisted total_sales/transaction_count (integer-cents rule),
    #    so the window chain reads |stores| x |days| rows instead of
    #    rescanning raw transactions (detect-anomalies reads the
    #    persisted summaries too, lambda_function.py:64-135).
    daily = store_daily.select(
        "store_id",
        "sale_date",
        cents(F.col("total_sales")).alias("sales_c"),
        F.col("transaction_count").alias("txn_count"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    anomalies = classify_anomalies_from_daily(daily).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    trends = trend_insights_from_daily(daily)
    recs = recommendations_from(anomalies)
    ins_path = os.path.join(out_dir, "insights")
    for name, df in (
        ("anomalies", anomalies),
        ("trends", trends),
        ("recommendations", recs),
    ):
        df.write.mode("overwrite").parquet(os.path.join(ins_path, name))
        stats[f"{name}_rows"] = (
            spark.read.parquet(os.path.join(ins_path, name)).count()
        )

    # 5. daily report for run_date (O5/O9 string layer); the
    #    recommendations section reuses the persisted anomaly set
    #    instead of re-running the window chain over the fact table
    rpt_path = os.path.join(out_dir, "report")
    report.daily_report_lines(
        txns, run_date, recs=recs
    ).coalesce(1).write.mode("overwrite").parquet(rpt_path)
    stats["report_lines"] = spark.read.parquet(rpt_path).count()

    # 6. BI exports (S7) from the MATERIALIZED tables
    an_mv = spark.read.parquet(os.path.join(ins_path, "anomalies"))
    tr_mv = spark.read.parquet(os.path.join(ins_path, "trends"))
    re_mv = spark.read.parquet(os.path.join(ins_path, "recommendations"))
    start = export_start or run_date
    end = export_end or run_date
    datasets = {
        "store_summaries": store_daily.filter(
            F.col("sale_date").between(start, end)
        ).select(
            F.col("sale_date").alias("date"),
            "store_id",
            F.concat(F.lit("Store "), F.col("store_id")).alias("store_name"),
            "total_sales",
            F.col("transaction_count").alias("transactions"),
            F.col("item_count").alias("items_sold"),
            F.col("avg_transaction").alias("average_transaction"),
        ),
        "top_products": top_long.filter(
            F.col("sale_date").between(start, end)
        ),
        "anomalies": export._export_anomalies_from(an_mv),
        "trends": export._export_trends_from(tr_mv),
        "recommendations": export._export_recommendations_from(re_mv),
    }
    manifest = export.write_ndjson_export(
        datasets, os.path.join(out_dir, "exports")
    )
    stats["export_datasets"] = len(manifest["datasets"])

    record_run(spark, out_dir, run_date, "succeeded", stats)
    daily.unpersist()
    anomalies.unpersist()
    return stats


def distinct_skus_for_range(
    spark: SparkSession, out_dir: str, start: str, end: str
) -> DataFrame:
    """Range distinct-SKU estimate per store from the MATERIALIZED
    sketch layer: filter the bounded sku_sketches table to [start,
    end] and merge (operators.stats.kmv_merge_daily). The fact table
    is never read — this is the query shape that stays constant-cost
    as history grows, and the sketch partitioning means the read
    prunes to the range's partitions."""
    daily = spark.read.parquet(
        os.path.join(out_dir, "sku_sketches")
    ).withColumn("sale_date", F.col("sale_date").cast("string"))
    return kmv_merge_daily(
        daily.filter(F.col("sale_date").between(start, end))
    )


def distinct_transactions_for_range(
    spark: SparkSession, out_dir: str, start: str, end: str
) -> DataFrame:
    """Range distinct-transaction estimate per payment method from the
    MATERIALIZED HLL register layer: filter the bounded hll_registers
    table to [start, end] and register-wise max-merge
    (operators.stats.hll_merge_daily). Facts are never read; the
    partitioning prunes the read to the range."""
    daily = spark.read.parquet(
        os.path.join(out_dir, "hll_registers")
    ).withColumn("sale_date", F.col("sale_date").cast("string"))
    return hll_merge_daily(
        daily.filter(F.col("sale_date").between(start, end))
    )


def median_cents_for_range(
    spark: SparkSession, out_dir: str, start: str, end: str
) -> DataFrame:
    """Range approximate median (with its power-of-two bracket) per
    payment method from the MATERIALIZED histogram layer: filter the
    bounded cents_histograms table to [start, end] and sum-merge bins
    (operators.quality.hist_merge_daily). Facts are never read; the
    partitioning prunes the read to the range."""
    daily = spark.read.parquet(
        os.path.join(out_dir, "cents_histograms")
    ).withColumn("sale_date", F.col("sale_date").cast("string"))
    return hist_merge_daily(
        daily.filter(F.col("sale_date").between(start, end))
    )


def run_scheduled_catchup(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    dates: list[str],
    **kwargs,
) -> dict[str, dict]:
    """S10 scheduled catch-up (``eventbridge.tf:55-148``): the
    reference's 23:00 cron runs the daily analysis for "today" even if
    stores are missing, but skips dates whose run already succeeded.
    Here: run the pipeline for every given date; the ledger makes the
    already-succeeded ones no-ops, so the catch-up is idempotent and
    safe to fire on any schedule."""
    return {
        d: run_daily_pipeline(spark, sf_dir, out_dir, d, **kwargs)
        for d in dates
    }

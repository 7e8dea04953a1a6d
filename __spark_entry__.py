"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship store-day metrics (+ nested top-5 products)
at sf0.001. ``queries()``/``oracle_sql()`` — one entry per implemented
operator from SURVEY.md §2, backed by
``serverless_smurf_etl_and_analytics_spark.plans.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import metrics
from serverless_smurf_etl_and_analytics_spark.plans import registry
from serverless_smurf_etl_and_analytics_spark.session import tune_existing

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-(store, day) metrics with the nested top-5
    product list — the reference's store_daily materialization
    (``write-metrics/lambda_function.py:77-104``)."""
    tune_existing(spark)
    txns = tables.transactions(spark, SF0001)
    daily = metrics.store_day_metrics(txns)
    top5 = (
        metrics.top_products_per_store_day(txns, 5)
        .groupBy("store_id", "sale_date")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("rank"), F.col("item_sku"),
                        F.col("units"), F.col("revenue"),
                    )
                )
            ).alias("top_products")
        )
    )
    return daily.join(top5, ["store_id", "sale_date"], "left")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    ops, which get the weaker rows-only check)."""
    return dict(registry.ORACLES)

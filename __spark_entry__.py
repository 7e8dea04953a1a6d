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
    """Flagship query: the reference's central derived table in its
    full nested serving shape — per-(store, day) metrics with the
    top-5 product list (array<struct>) and the payment_breakdown map
    (``write-metrics/lambda_function.py:77-104``,
    ``calculate-metrics/lambda_function.py:155-173``)."""
    tune_existing(spark)
    txns = tables.transactions(spark, SF0001)
    return metrics.store_daily_nested(txns, 5)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    ops, which get the weaker rows-only check)."""
    return dict(registry.ORACLES)

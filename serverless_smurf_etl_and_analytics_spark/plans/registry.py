"""The query registry: one entry per implemented operator from
SURVEY.md §2, each with a Spark plan and (where SQL-expressible) a
DuckDB oracle over the same parquet tables.

Contract (``/root/repo/__spark_entry__.py``): the driver runs each
Spark query and its oracle side-by-side at sf=0.01 and compares
row-count + schema + order-insensitive value hash, with columns sorted
by name. Hence every computed column is aliased identically on both
sides, and all float math follows functions.money's determinism rules
(aggregate integers, round only at integer scale).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .. import tables
from ..operators import metrics

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, sql: str | None = None) -> None:
    QUERIES[name] = fn
    if sql is not None:
        ORACLES[name] = sql


TXN = tables.TRANSACTIONS_CTE

# SQL building blocks shared by several oracles (kept textually aligned
# with the Spark operators in operators/metrics.py).
SQL_STORE_DAILY = """
store_daily AS (
    SELECT
        store_id,
        sale_date,
        sum(line_cents)                AS sales_c,
        sum(discount_cents)            AS disc_c,
        count(*)                       AS transaction_count,
        cast(count(DISTINCT transaction_id) AS bigint)
                                       AS distinct_transactions,
        cast(sum(quantity) AS bigint)  AS item_count
    FROM transactions
    GROUP BY store_id, sale_date
)
"""

SQL_PRODUCT_DAY = """
product_day AS (
    SELECT
        store_id,
        sale_date,
        item_sku,
        cast(sum(quantity) AS bigint)        AS units,
        sum(line_cents) - sum(discount_cents) AS revenue_cents
    FROM transactions
    GROUP BY store_id, sale_date, item_sku
)
"""

SQL_TOP5 = (
    SQL_PRODUCT_DAY
    + """,
ranked AS (
    SELECT
        store_id, sale_date, item_sku, units,
        cast(revenue_cents / 100.0 AS double) AS revenue,
        cast(row_number() OVER (
            PARTITION BY store_id, sale_date
            ORDER BY revenue_cents DESC, item_sku ASC) AS int) AS rank
    FROM product_day
)
"""
)

# --------------------------------------------------------------------------
# A1 — store-day grand totals (calculate-metrics/lambda_function.py:124-184)
register(
    "a1_store_day_metrics",
    lambda spark, sf: metrics.store_day_metrics(tables.transactions(spark, sf)),
    f"""
WITH {TXN}, {SQL_STORE_DAILY}
SELECT
    store_id,
    sale_date,
    cast(sales_c / 100.0 AS double)            AS total_sales,
    cast(disc_c / 100.0 AS double)             AS total_discount,
    cast((sales_c - disc_c) / 100.0 AS double) AS net_sales,
    transaction_count,
    distinct_transactions,
    item_count,
    cast(cast(round((sales_c - disc_c) * 1.0 / transaction_count) AS bigint)
         / 100.0 AS double)                    AS avg_transaction
FROM store_daily
""",
)

# A2 — payment-method breakdown (calculate-metrics:128,143)
register(
    "a2_payment_breakdown",
    lambda spark, sf: metrics.payment_breakdown(tables.transactions(spark, sf)),
    f"""
WITH {TXN}
SELECT
    payment_method,
    cast((sum(line_cents) - sum(discount_cents)) / 100.0 AS double)
        AS net_amount,
    count(*) AS line_count
FROM transactions
GROUP BY payment_method
""",
)

# A2 at store-day grain (serving pivots this to the payment_breakdown map)
register(
    "a2_payment_per_store_day",
    lambda spark, sf: metrics.payment_breakdown_per_store_day(
        tables.transactions(spark, sf)
    ),
    f"""
WITH {TXN}
SELECT
    store_id,
    sale_date,
    payment_method,
    cast((sum(line_cents) - sum(discount_cents)) / 100.0 AS double)
        AS net_amount
FROM transactions
GROUP BY store_id, sale_date, payment_method
""",
)

# A3/O1 — top-5 products per store-day (calculate-metrics:155-167)
register(
    "a3_top5_products_store_day",
    lambda spark, sf: metrics.top_products_per_store_day(
        tables.transactions(spark, sf), 5
    ),
    f"""
WITH {TXN}, {SQL_TOP5}
SELECT store_id, sale_date, item_sku, units, revenue, rank
FROM ranked WHERE rank <= 5
""",
)

# A4+A5 — company daily rollup with best/worst store
# (calc-company-metrics/lambda_function.py:76-113)
register(
    "a4_company_daily",
    lambda spark, sf: metrics.company_daily(
        metrics.store_day_metrics(tables.transactions(spark, sf))
    ),
    f"""
WITH {TXN}, {SQL_STORE_DAILY}
SELECT
    sale_date,
    cast(sum(sales_c) / 100.0 AS double)        AS total_sales,
    cast(sum(transaction_count) AS bigint)      AS total_transactions,
    cast(sum(item_count) AS bigint)             AS total_items,
    count(*)                                    AS store_count,
    cast(cast(round(sum(sales_c) * 1.0 / sum(transaction_count)) AS bigint)
         / 100.0 AS double)                     AS avg_transaction,
    cast(cast(round(sum(sales_c) * 1.0 / count(*)) AS bigint)
         / 100.0 AS double)                     AS avg_store_sales,
    first(store_id ORDER BY sales_c DESC, store_id DESC) AS best_store_id,
    cast(max(sales_c) / 100.0 AS double)        AS best_store_sales,
    first(store_id ORDER BY sales_c ASC, store_id ASC)   AS worst_store_id,
    cast(min(sales_c) / 100.0 AS double)        AS worst_store_sales,
    string_agg(store_id, ',' ORDER BY store_id) AS stores_reported
FROM store_daily
GROUP BY sale_date
""",
)

# A6 exact mode — per-(day, sku) cross-store rollup from the fact table
register(
    "a6_product_daily_exact",
    lambda spark, sf: metrics.product_daily_exact(tables.transactions(spark, sf)),
    f"""
WITH {TXN}
SELECT
    sale_date,
    item_sku,
    cast(sum(quantity) AS bigint) AS units_sold,
    cast((sum(line_cents) - sum(discount_cents)) / 100.0 AS double)
        AS revenue,
    cast(count(DISTINCT store_id) AS bigint) AS store_count,
    string_agg(DISTINCT store_id, ',' ORDER BY store_id) AS stores_sold_at
FROM transactions
GROUP BY sale_date, item_sku
""",
)

# A6 parity mode — rollup of each store's top-5 list only (intentionally
# lossy, bug-for-bug with calc-product-metrics:79-103)
register(
    "a6_product_daily_top5_parity",
    lambda spark, sf: metrics.product_daily_top5_parity(
        tables.transactions(spark, sf), 5
    ),
    f"""
WITH {TXN}, {SQL_TOP5}
SELECT
    sale_date,
    item_sku,
    cast(sum(units) AS bigint) AS units_sold,
    cast(sum(cast(round(revenue * 100) AS bigint)) / 100.0 AS double)
        AS revenue,
    cast(count(DISTINCT store_id) AS bigint) AS store_count,
    string_agg(DISTINCT store_id, ',' ORDER BY store_id) AS stores_sold_at
FROM ranked
WHERE rank <= 5
GROUP BY sale_date, item_sku
""",
)

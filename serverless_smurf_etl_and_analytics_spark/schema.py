"""Schemas (SURVEY.md §1.2).

The ingest contract mirrors the reference's JSON-Schema + PyArrow pair
(``backend/functions/process-upload/upload-schema.json:5-68``,
``process_upload.py:31-42``): fixed, validated, never inferred. Money
is DecimalType(10,2) through aggregation, cast to double only at the
serving edge (``write-metrics/lambda_function.py:143-156``).
"""

from __future__ import annotations

from pyspark.sql import types as T

PAYMENT_METHODS = ("cash", "credit", "debit", "gift_card", "mobile")

# upload-schema.json:5-68 / process_upload.py:31-42
TXN_SCHEMA = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("transaction_timestamp", T.StringType(), False),
        T.StructField("item_sku", T.StringType(), False),
        T.StructField("item_name", T.StringType(), False),
        T.StructField("quantity", T.IntegerType(), False),
        T.StructField("unit_price", T.DecimalType(10, 2), False),
        T.StructField("line_total", T.DecimalType(10, 2), False),
        T.StructField("discount_amount", T.DecimalType(10, 2), False),
        T.StructField("payment_method", T.StringType(), False),
        T.StructField("customer_id", T.StringType(), False),
    ]
)

# Permissive read variant: all nullable + corrupt-record column, so bad
# rows survive to the quarantine split instead of failing the read.
TXN_READ_SCHEMA = T.StructType(
    [T.StructField(f.name, f.dataType, True) for f in TXN_SCHEMA.fields]
    + [T.StructField("_corrupt_record", T.StringType(), True)]
)

# write-metrics/lambda_function.py:77-104
STORE_DAILY_SCHEMA = T.StructType(
    [
        T.StructField("store_id", T.StringType(), False),
        T.StructField("sale_date", T.StringType(), False),
        T.StructField("total_sales", T.DoubleType(), True),
        T.StructField("total_discount", T.DoubleType(), True),
        T.StructField("net_sales", T.DoubleType(), True),
        T.StructField("transaction_count", T.LongType(), True),
        T.StructField("distinct_transactions", T.LongType(), True),
        T.StructField("item_count", T.LongType(), True),
        T.StructField("avg_transaction", T.DoubleType(), True),
    ]
)

FILENAME_PATTERN = r"store_(\d{4})_(\d{4}-\d{2}-\d{2})\.json"

"""Serving layer as registered SQL views (SURVEY §3.3).

The reference serves each computation through an API Gateway + Lambda
endpoint (``get-analytics``, ``get-trends``, ``get-store-summaries``);
the engine-side equivalent is one temp view per registered query, so
any SQL client on the session can ``SELECT`` the same payloads
(``spark.sql("SELECT * FROM a14_kpi_for_range")``). Views are lazy —
registration costs nothing until queried, and each query re-reads the
current parquet state (the reference's per-request DynamoDB read).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import registry


def register_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[str]:
    """Register every query (or the given subset) as a temp view named
    after its registry key. Returns the registered names."""
    out: list[str] = []
    for name, fn in registry.QUERIES.items():
        if names is not None and name not in names:
            continue
        fn(spark, sf_dir).createOrReplaceTempView(name)
        out.append(name)
    return out

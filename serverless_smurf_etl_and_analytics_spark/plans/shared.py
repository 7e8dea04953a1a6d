"""Session-scoped materialized-view layer for the store-day aggregates.

The reference's architecture is MV-first: ``write-metrics`` persists the
store_daily summaries and every downstream consumer
(``calc-company-metrics/lambda_function.py:30-44``, the serving reads in
``get-analytics``) reads the MV, never the fact table. The registry
mirrors that: :func:`warm_store_day_layer` ``persist()``s the four
store-day base plans once per (session, sf_dir), and Spark's
CacheManager substitutes the in-memory relation into EVERY
logically-equal subtree planned afterwards — ``a1``, ``a4``, the
``sd_nested`` serving shape, the ``x*`` exports, ``j5``'s grid, ``p*``
serving filters and the ``i*`` insight chain all read one
materialization of each grain instead of re-aggregating the fact table
per query.

Scale notes:
- ``persist()`` is lazy — warming marks the plans; the first consuming
  action materializes them. Queries that never touch transactions (the
  documents/embeddings ML layer) pay nothing.
- Each MV is bounded by its group-by grain (|stores| x |days| [x <=5
  methods / x <=5 top-K rows]) — tiny relative to the fact table at any
  corpus size, so MEMORY_AND_DISK residency is safe at 100 TB inputs.
- Cache lifetime is session-owned: long-lived sessions free the layer
  with ``session.clear_operator_caches`` (callers that need per-run
  lifetimes track handles and ``unpersist()``, as
  ``pipeline.run_daily_pipeline`` does).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.storagelevel import StorageLevel

from .. import tables
from ..operators import history, metrics


def warm_store_day_layer(spark: SparkSession, sf_dir: str) -> None:
    """Mark the shared store-day MV plans persisted, once per
    (session, sf_dir). Idempotent and lazy; see module docstring."""
    warmed = getattr(spark, "_smurf_mv_warmed", None)
    if warmed is None:
        warmed = set()
        spark._smurf_mv_warmed = warmed
    if sf_dir in warmed:
        return
    warmed.add(sf_dir)
    txns = tables.transactions(spark, sf_dir)
    for mv in (
        # A1 grand totals — consumed by a1, sd_nested, j5 grid, p1-p6
        # serving, x1 export, a4 company rollup.
        metrics.store_day_metrics(txns),
        # A2 store-day payment grain — consumed by a2_per_store_day,
        # a4_payment_map_rollup, sd_nested's map.
        metrics.payment_breakdown_per_store_day(txns),
        # A3 top-5 grain — consumed by a3, a6 parity, a15 re-agg,
        # sd_nested's array, x2 export.
        metrics.top_products_per_store_day(txns, 5),
        # minimal window-op input — consumed by a7-a13 history chain
        # and the i*/x* insight layers.
        history.store_daily_cents(txns),
    ):
        mv.persist(StorageLevel.MEMORY_AND_DISK)

"""Additivity laws for the co-purchase partial layer (r8): per-
order_date partials merge to EXACTLY the direct co1 answer, shards
are a disjoint partition of the pair multiset, and a range merge
answers the "orders started in [a, b]" question without rescanning
facts — the kmv/hll/hist daily-materialize pattern extended to the
item-item CF matrix. The sharding key is the ORDER's min sale_date
(lines of one order ship on several dates, so pair counts are only
additive over a partition of orders — see co_pair_daily docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import joins

from conftest import SF_DIR


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _order_dates(txns):
    return txns.groupBy("transaction_id").agg(
        F.min("sale_date").alias("order_date")
    )


def test_co_merge_over_all_shards_equals_direct(spark):
    txns = tables.transactions(spark, SF_DIR)
    daily = joins.co_pair_daily(txns)
    got = _rows(joins.co_merge_topk(daily, 3))
    assert got == _rows(joins.sku_copurchase_topk(txns, 3))
    assert got, "empty co table"


def test_co_range_merge_equals_direct_over_qualifying_orders(spark):
    """Filtering partials by order_date must equal co1 computed over
    exactly the orders starting in the range (ALL their lines kept,
    whatever date they ship)."""
    txns = tables.transactions(spark, SF_DIR)
    od = _order_dates(txns)
    mid = sorted(r["order_date"] for r in od.collect())[
        od.count() // 2
    ]
    daily = joins.co_pair_daily(txns)
    got = _rows(
        joins.co_merge_topk(
            daily.filter(F.col("order_date") <= F.lit(mid)), 3
        )
    )
    qualifying = txns.join(
        od.filter(F.col("order_date") <= F.lit(mid)).select(
            "transaction_id"
        ),
        "transaction_id",
    )
    assert got == _rows(joins.sku_copurchase_topk(qualifying, 3))
    assert got, "empty sub-range co table"


def test_co_shards_are_disjoint_union(spark):
    """co_pair_daily over order-split halves unions to the full
    table — one order's rows live in exactly one shard, so a day's
    partial appends without touching prior days."""
    txns = tables.transactions(spark, SF_DIR)
    od = _order_dates(txns)
    mid = sorted(r["order_date"] for r in od.collect())[
        od.count() // 2
    ]
    early = txns.join(
        od.filter(F.col("order_date") <= F.lit(mid)).select(
            "transaction_id"
        ),
        "transaction_id",
    )
    late = txns.join(
        od.filter(F.col("order_date") > F.lit(mid)).select(
            "transaction_id"
        ),
        "transaction_id",
    )
    a = joins.co_pair_daily(early)
    b = joins.co_pair_daily(late)
    assert _rows(a.unionByName(b)) == _rows(joins.co_pair_daily(txns))


def test_triangles_from_merged_partials_equal_direct(spark):
    """tri1's census over the daily-layer-derived top-k equals the
    fact-derived form — the wedge join never needs facts once the
    partials exist (the same reuse that makes co2 O(partials))."""
    from serverless_smurf_etl_and_analytics_spark.operators import graph

    txns = tables.transactions(spark, SF_DIR)
    daily = joins.co_pair_daily(txns)
    via_merge = _rows(
        graph.triangles_from_topk(joins.co_merge_topk(daily, 3))
    )
    assert via_merge == _rows(graph.copurchase_triangles(txns))
    assert via_merge, "empty triangle census"

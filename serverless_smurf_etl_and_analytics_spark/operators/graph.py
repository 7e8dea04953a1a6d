"""Graph analytics: fixed-point PageRank over the customer-store
purchase graph (SURVEY.md LLM-pipeline brief — the reference has no
graph surface; its nearest analogue is per-store dict rollups).

Like the k-means trainer (clustering.py) and the CC dedup (dedup.py),
the iterative algorithm is made ORACLE-CHECKABLE by pinning it to
exact int64 fixed-point arithmetic and a fixed iteration count: the
DuckDB oracle unrolls the same five update steps, so the driver
hash-checks every rank value, not just row counts.

Scale design: one edge table (distinct bipartite pairs, built with a
broadcast of the order->customer dimension), out-degrees attached
once, then each iteration is contribution-scatter (edge join on the
rank table) + gather (sum by destination) — the standard distributed
PageRank, all shuffles keyed on node id. Five iterations keep the
plan depth bounded; a convergence-driven variant would add the
checkpoint-every-k-rounds pattern proven in dedup._ckpt_fresh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000_000  # rank fixed-point: 1.0 == 1e9
DAMP_PM = 850  # damping 0.85 in per-mille


def purchase_edges(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Undirected bipartite edge list: customer node 2*custkey,
    store node 2*suppkey+1 (disjoint integer id spaces), one edge per
    distinct (customer, store) purchase relationship, emitted in both
    directions for the undirected walk."""
    ok = orders.select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_custkey").alias("cust"),
    )
    pairs = (
        lineitem.select("l_orderkey", F.col("l_suppkey").alias("supp"))
        .join(F.broadcast(ok), "l_orderkey")
        .select(
            (F.col("cust") * 2).alias("c_node"),
            (F.col("supp") * 2 + 1).alias("s_node"),
        )
        .distinct()
    )
    fwd = pairs.select(
        F.col("c_node").alias("src"), F.col("s_node").alias("dst")
    )
    rev = pairs.select(
        F.col("s_node").alias("src"), F.col("c_node").alias("dst")
    )
    return fwd.unionByName(rev)


def pagerank(
    lineitem: DataFrame,
    orders: DataFrame,
    n_iter: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """pr1: ``n_iter`` exact fixed-point PageRank steps over the
    purchase graph, reporting the ``top_k`` store nodes.

        base    = ((SCALE div N) * (1000 - DAMP_PM)) div 1000
        share_u = ((r_u * DAMP_PM) div 1000) div outdeg_u   (per edge)
        r'_v    = base + sum(share_u over in-edges)

    Every step is integer division, so the trajectory is identical in
    Spark, DuckDB, and by hand — the oracle unrolls the same steps.
    Output: (rank_pos, supp_key, rank_fp, n_customers), bounded rows.
    """
    from pyspark.storagelevel import StorageLevel

    # persist the DEGREE-ANNOTATED edge table: every iteration joins
    # it against the fresh rank table, and a cached hash-partitioned
    # left side means each scatter step shuffles only the k-node rank
    # table, not the edges — without this, every iteration re-derives
    # the lineitem join + degree aggregate (cache lifetime is
    # session-owned, released by session.clear_operator_caches like
    # the shared MV layer)
    edges = purchase_edges(lineitem, orders)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    nodes = e.select(F.col("src").alias("node"), "outdeg").distinct()
    n = nodes.count()
    base = ((SCALE // n) * (1000 - DAMP_PM)) // 1000
    ranks = nodes.select(
        "node", F.lit(SCALE // n).cast("long").alias("r")
    )
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.expr(f"((r * {DAMP_PM}) div 1000) div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = contrib.select(
            "node", (F.lit(base) + F.col("in_sum")).cast("long").alias("r")
        )
    stores = (
        ranks.filter(F.col("node") % 2 == 1)
        .select(
            F.expr("(node - 1) div 2").alias("supp_key"),
            F.col("r").alias("rank_fp"),
        )
    )
    indeg = (
        e.filter(F.col("dst") % 2 == 1)
        .groupBy("dst")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            F.expr("(dst - 1) div 2").alias("supp_key"),
            "n_customers",
        )
    )
    top = (
        stores.join(indeg, "supp_key")
        .orderBy(F.desc("rank_fp"), F.asc("supp_key"))
        .limit(top_k)
    )
    w = F.row_number().over(
        Window.orderBy(F.desc("rank_fp"), F.asc("supp_key"))
    )
    return top.select(
        w.cast("long").alias("rank_pos"),
        "supp_key",
        "rank_fp",
        "n_customers",
    )


def copurchase_triangles(txns) -> "DataFrame":
    """tri1: triangle census of the top-3 co-purchase graph — the
    standard coherence diagnostic for an item-item CF
    neighborhood (a SKU whose recommended partners also recommend
    each other sits in a dense basket cluster; triangle-free
    neighborhoods are co-occurrence noise). Output: one row per
    closed triangle (a < b < c) with the minimum co-purchase support
    along its edges.

    Scale design: the input graph is co1's top-k neighbor lists —
    <= k (=3) directed edges per SKU by construction, so the
    undirected edge set is <= 3n rows and the wedge join is bounded
    at 9 wedges per apex REGARDLESS of basket skew (an unbounded
    co-occurrence graph would hit the classic |E|^1.5 triangle cost;
    bounding by top-k first is how recommender diagnostics run at
    catalog scale). Two self-equi-joins on SKU keys — no cartesian
    anywhere; orientation a < b < c counts each triangle exactly
    once.
    """
    from .joins import sku_copurchase_topk

    return triangles_from_topk(sku_copurchase_topk(txns))


def triangles_from_topk(topk: "DataFrame") -> "DataFrame":
    """The triangle census over ANY co-purchase top-k frame (co1's
    shape: item_sku, rank, partner_sku, co_count) — the fact-free
    half of tri1. A maintained pipeline feeds it from the daily
    partial layer (``joins.co_merge_topk`` over persisted
    ``co_pair_daily`` rows), so the census costs seconds at any
    corpus size while the fact-derived wrapper above stays the
    standalone/bench form (law-tested equal)."""
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    # persist the undirected edge set: it feeds all three legs of the
    # wedge/closure joins, and without a materialization barrier the
    # whole upstream co-purchase pipeline (fact scan, basket
    # self-join, count aggregate, top-k window) executes three times
    # in one census (r13 plan: 6 parquet scans of the fact table, no
    # exchange reuse). The edge set is bounded at <= 3n rows by the
    # top-k construction, so the cached footprint is tiny at any
    # corpus size (guide §7.2 duplicated subtrees / §5 caching).
    und = (
        topk.select(
            F.least("item_sku", "partner_sku").alias("a"),
            F.greatest("item_sku", "partner_sku").alias("b"),
            F.col("co_count"),
        )
        .groupBy("a", "b")
        .agg(F.max("co_count").alias("w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    e3 = und.alias("e3")
    wedges = e1.join(
        e2,
        (F.col("e1.a") == F.col("e2.a")) & (F.col("e1.b") < F.col("e2.b")),
    )
    tri = wedges.join(
        e3,
        (F.col("e3.a") == F.col("e1.b")) & (F.col("e3.b") == F.col("e2.b")),
    )
    return tri.select(
        F.col("e1.a").alias("sku_a"),
        F.col("e1.b").alias("sku_b"),
        F.col("e2.b").alias("sku_c"),
        F.least("e1.w", F.least("e2.w", "e3.w")).alias("min_support"),
    )

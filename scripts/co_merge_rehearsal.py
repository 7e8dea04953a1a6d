"""Measured sf-scale rehearsal for the co-purchase daily partial
layer (co2 / VERDICT r8 task 2): does merging materialized per-day
partials actually beat re-deriving co-occurrence from facts?

Three timed walls, each in the maintained-pipeline shape:

1. ``direct``     — co1 (``sku_copurchase_topk``) straight off the
                    fact table: the recompute-everything baseline and
                    the r8 worst sf10 wall (23.8 s).
2. ``maintain``   — one-time build + parquet write of the
                    ``co_pair_daily`` partial table (the ingest-side
                    maintenance cost, paid per shard in a pipeline).
3. ``merge``      — ``co_merge_topk`` over the parquet-backed partials
                    with a range predicate: the steady-state query
                    cost. This is the number the daily layer exists
                    for — it must not rescan facts (row counts of the
                    partial table are printed so the claim is
                    auditable).

A correctness cross-check (merge == direct over qualifying orders, the
same law as tests/test_copurchase_daily.py but at the rehearsal scale)
runs once before timing.

Usage:
    python scripts/co_merge_rehearsal.py [SF_DIR] [OUT_JSON]
Defaults: /root/repo/.scratch/sf10  (stdout)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from serverless_smurf_etl_and_analytics_spark import tables  # noqa: E402
from serverless_smurf_etl_and_analytics_spark.operators import joins  # noqa: E402
from serverless_smurf_etl_and_analytics_spark.session import get_spark  # noqa: E402

RANGE = ("2000-01-01", "2001-12-31")  # the registered co2 range


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10"
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")
    txns = tables.transactions(spark, sf_dir)

    work = tempfile.mkdtemp(prefix="co_merge_rehearsal_")
    daily_path = os.path.join(work, "co_pair_daily")
    try:
        # -- correctness at rehearsal scale: merge == direct over
        # qualifying orders (top-k rows compared exactly)
        t0 = time.monotonic()
        got = {
            tuple(r)
            for r in joins.co_range_topk(txns, *RANGE).collect()
        }
        t_range_inline = time.monotonic() - t0
        od = txns.groupBy("transaction_id").agg(
            F.min("sale_date").alias("order_date")
        )
        qualifying = txns.join(
            od.filter(F.col("order_date").between(*RANGE)).select(
                "transaction_id"
            ),
            "transaction_id",
        )
        want = {
            tuple(r)
            for r in joins.sku_copurchase_topk(qualifying).collect()
        }
        assert got == want and got, (
            f"law violated at {sf_dir}: {len(got)} vs {len(want)} rows"
        )

        # -- wall 1: direct co1 off facts (full corpus, the r8 shape)
        t0 = time.monotonic()
        n_direct = joins.sku_copurchase_topk(txns).count()
        t_direct = time.monotonic() - t0

        # -- wall 2: maintenance — build + persist the daily partials
        t0 = time.monotonic()
        joins.co_pair_daily(txns).write.mode("overwrite").parquet(
            daily_path
        )
        t_maintain = time.monotonic() - t0

        # -- wall 3: steady-state range query off the partials only
        daily = spark.read.parquet(daily_path)
        n_partial_rows = daily.count()
        t0 = time.monotonic()
        n_merge = joins.co_merge_topk(
            daily.filter(F.col("order_date").between(*RANGE))
        ).count()
        t_merge = time.monotonic() - t0
        # full-corpus merge too (the co1-via-merge number VERDICT asks
        # for: every order_date, so the answer equals direct co1)
        t0 = time.monotonic()
        n_merge_all = joins.co_merge_topk(daily).count()
        t_merge_all = time.monotonic() - t0
        assert n_merge_all == n_direct, (n_merge_all, n_direct)

        # tri1 census riding the same partials (r9: the wedge join
        # never needs facts once the daily layer exists)
        from serverless_smurf_etl_and_analytics_spark.operators import (
            graph,
        )

        t0 = time.monotonic()
        n_tri = graph.triangles_from_topk(
            joins.co_merge_topk(daily)
        ).count()
        t_tri_merge = time.monotonic() - t0
        t0 = time.monotonic()
        n_tri_direct = graph.copurchase_triangles(txns).count()
        t_tri_direct = time.monotonic() - t0
        assert n_tri == n_tri_direct, (n_tri, n_tri_direct)

        result = {
            "sf_dir": sf_dir,
            "range": list(RANGE),
            "law_check": "pass",
            "rows": {
                "direct_topk": n_direct,
                "range_topk": n_merge,
                "daily_partials": n_partial_rows,
            },
            "sec": {
                "direct_co1_off_facts": round(t_direct, 2),
                "maintain_build_daily": round(t_maintain, 2),
                "merge_range_off_partials": round(t_merge, 2),
                "merge_full_off_partials": round(t_merge_all, 2),
                "range_inline_composition": round(t_range_inline, 2),
                "tri1_off_partials": round(t_tri_merge, 2),
                "tri1_off_facts": round(t_tri_direct, 2),
            },
        }
        line = json.dumps(result)
        print(line)
        if out_json:
            with open(out_json, "w") as f:
                f.write(line + "\n")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is timed to full materialization (count + a write-free
collect of the aggregated result is avoided; we use .count() on the
result which executes the whole plan — results are small aggregates,
so count cost ~= full execution cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from serverless_smurf_etl_and_analytics_spark.plans import registry  # noqa: E402
from serverless_smurf_etl_and_analytics_spark.session import get_spark  # noqa: E402

# Headline set: the flagship materializations + the widest scans.
HEADLINE = [
    "a1_store_day_metrics",
    "a3_top5_products_store_day",
    "a4_company_daily",
    "a6_product_daily_exact",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("smurf-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in registry.QUERIES]
    names += [n for n in sorted(registry.QUERIES) if n not in names]

    # warm the JVM + parquet footers once with a trivial action
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        _ = n
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

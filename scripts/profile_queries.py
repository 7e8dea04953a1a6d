"""Per-query micro-profiler (guide §1): split CONSTRUCTION wall (the
registry callable — for trainer-backed queries this runs the driver-side
training jobs) from EXECUTION wall (.count()), and report per-sample
Spark job counts so scheduling overhead is visible.

Usage: python scripts/profile_queries.py q1,q2,... [n_samples]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serverless_smurf_etl_and_analytics_spark.plans import registry  # noqa: E402
from serverless_smurf_etl_and_analytics_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [q for q in sys.argv[1].split(",") if q in registry.QUERIES]
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("smurf-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # same warmers as bench.py
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def _ident(batches):
        import numpy as np  # noqa: F401

        yield from batches

    spark.range(1000).repartition(32).mapInPandas(_ident, "id long").count()

    tracker = sc.statusTracker()
    out: dict = {}
    for name in names:
        rows = []
        for s in range(n_samples):
            j0 = set(tracker.getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"{name}[{s}] construct")
            t0 = time.perf_counter()
            df = registry.QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            sc.setJobDescription(f"{name}[{s}] execute")
            df.count()
            t2 = time.perf_counter()
            sc.setJobDescription(None)
            j1 = set(tracker.getJobIdsForGroup(None) or [])
            rows.append(
                {
                    "construct_s": round(t1 - t0, 3),
                    "execute_s": round(t2 - t1, 3),
                    "total_s": round(t2 - t0, 3),
                    "jobs": len(j1 - j0),
                }
            )
        out[name] = rows
        print(name, json.dumps(rows))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

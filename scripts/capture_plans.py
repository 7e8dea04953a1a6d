"""Capture .explain("formatted") for every registry query into
plans/<tag>/<query>_<suffix>.txt plus a one-line-per-query plan-shape
summary (Exchange count, python eval nodes, join strategies) on stdout.

Usage: python scripts/capture_plans.py <tag> <suffix> [only,names]
e.g.   python scripts/capture_plans.py r13 before
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serverless_smurf_etl_and_analytics_spark.plans import registry  # noqa: E402
from serverless_smurf_etl_and_analytics_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("smurf-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in sorted(registry.QUERIES):
        if only and name not in only:
            continue
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # capture must not die mid-sweep
            plan = f"ERROR building plan: {e!r}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        n_exch = len(re.findall(r"\bExchange\b", plan))
        n_py = len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan)
        )
        joins = "+".join(
            sorted(
                {
                    m
                    for m in re.findall(
                        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                        r"BroadcastNestedLoopJoin|CartesianProduct)",
                        plan,
                    )
                }
            )
        )
        rows.append((name, n_exch, n_py, joins, len(plan)))
    print(f"{'query':38s} {'exch':>4s} {'py':>3s} {'plan_b':>7s}  joins")
    for name, n_exch, n_py, joins, ln in rows:
        print(f"{name:38s} {n_exch:4d} {n_py:3d} {ln:7d}  {joins}")
    spark.stop()


if __name__ == "__main__":
    main()

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

# Headline set: the flagship materializations + the widest scans,
# WIDENED r14 (VERDICT r13 item 5) with one representative per major
# operator family so the driver's compact tail line carries a
# 12-query cross-section instead of 4 — additive only (the original
# four keep their names and positions), ~330 bytes of extra tail,
# still well inside the ~2 KB capture budget.
HEADLINE = [
    "a1_store_day_metrics",
    "a3_top5_products_store_day",
    "a4_company_daily",
    "a6_product_daily_exact",
    "d6_simhash_neardup",
    "d7_semantic_dedup",
    "sim2_cosine_neardup",
    "pr1_pagerank_stores",
    "co1_sku_copurchase",
    "sk3_kmv_set_overlap",
    "tri1_copurchase_triangles",
    "x6_export_manifest",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("smurf-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in registry.QUERIES]
    names += [n for n in sorted(registry.QUERIES) if n not in names]
    # optional allowlist for partial runs (e.g. the sf10 scale
    # rehearsal times only the document/embedding-heavy family —
    # running all 124 queries at 100x would spend almost all its wall
    # on queries whose scaling is already proven flat at sf1)
    only = os.environ.get("SMURF_BENCH_QUERIES", "").strip()
    if only:
        allow = {q.strip() for q in only.split(",") if q.strip()}
        names = [n for n in names if n in allow]

    # warm the JVM + parquet footers once with a trivial action, and
    # spin up the Python/Arrow worker pool (first pandas-UDF use in a
    # session pays ~4 s of fork+import; steady-state clusters are warm)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def _ident(batches):
        import numpy as np  # noqa: F401

        yield from batches

    spark.range(1000).repartition(32).mapInPandas(_ident, "id long").count()

    # min of 3 INTERLEAVED passes per query: single-shot local[32]
    # timings vary up to 3x run-to-run (JIT/GC/AQE nondeterminism, and
    # the driver box runs bench concurrently with other load — r3 saw
    # ~43 false regression flags from exactly that). min-of-N measures
    # the plan rather than the jitter; interleaving the passes (all
    # queries once, then again) decorrelates a load spike from any one
    # query's N samples, where back-to-back repeats would eat it whole.
    runs = int(os.environ.get("SMURF_BENCH_RUNS", "3"))
    # SMURF_BENCH_COLD=1 (opt-in; default off, driver-contract
    # unchanged): clear the session's persisted operator caches before
    # EVERY sample so min-of-N measures the cold plan instead of the
    # warm-cache incremental cost — the scale rehearsals' semantics
    # (r7 established that a cold-path optimization may not move the
    # warm minimum at all). On-disk corpus artifacts are NOT cleared:
    # cold-with-maintained-artifacts is the number that matters.
    cold = os.environ.get("SMURF_BENCH_COLD", "") == "1"
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        for name in names:
            if cold:
                spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = registry.QUERIES[name](spark, sf_dir)
            df.count()
            samples[name].append(time.perf_counter() - t0)
    timings = {n: round(min(s), 3) for n, s in samples.items()}
    medians = {
        n: round(sorted(s)[len(s) // 2], 3) for n, s in samples.items()
    }
    total = round(sum(timings.values()), 3)

    # regression check vs the committed per-query baseline (sf0.1,
    # re-pinned r9 from 3 isolated runs = 9 samples/query): flag a
    # MIN above 1.3x baseline PLUS a grace that SCALES with the
    # baseline — max(0.2 s, 0.3x baseline). A flat 0.5 s grace let a
    # 0.4 s query hit 1.0 s (2.5x) unflagged, hiding plan regressions
    # in the many sub-second queries; the scaled grace keeps the
    # effective rule ~1.6x for big queries (the measured jitter band,
    # benchmarks/baseline_sf0.1_variance.json, is median 1.13x / p95
    # 1.35x on identical plans) while the 0.2 s floor stops sub-100 ms
    # queries from flagging on scheduler noise alone.
    # Each flag carries the query's own min/median/max spread so a
    # load spike (huge spread, min near baseline) is distinguishable
    # from a real plan regression (tight spread, all samples slow).
    regressions: dict[str, str] = {}
    base_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks",
        "baseline_sf0.1.json",
    )
    if sf == "0.1" and os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        for name, sec in timings.items():
            b = base.get(name)
            if b and sec > b * 1.3 + max(0.2, 0.3 * b):
                s = samples[name]
                regressions[name] = (
                    f"min {sec:.2f}s vs baseline {b:.2f}s "
                    f"({sec / b:.2f}x); samples min/med/max "
                    f"{min(s):.2f}/{sorted(s)[len(s) // 2]:.2f}/"
                    f"{max(s):.2f}s"
                )
    out = {
        "metric": "bench_total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "timing": f"min_of_{runs}_interleaved"
        + ("_cold" if cold else ""),
    }
    if regressions:
        out["regressions_vs_baseline"] = regressions
    # full per-query median/sample detail goes to a sidecar (the
    # driver's raw capture of the stdout line truncates long output —
    # r3's artifact came back parsed:null — so the line stays compact;
    # regression flags above already carry their own min/med/max)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks",
        "bench_last_detail.json",
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(
                {"queries_min": timings, "queries_median": medians,
                 "samples": {n: [round(x, 3) for x in s]
                             for n, s in samples.items()},
                 "sf": sf},
                f, indent=1, sort_keys=True,
            )
            f.write("\n")
    except OSError:
        pass  # read-only checkout: the stdout line is self-sufficient
    print(json.dumps(out))
    # The LAST stdout line must PARSE from a bounded tail capture: the
    # driver keeps only the final ~2000 bytes of output, and the full
    # per-query line above is ~5 KB at 125 queries, so a consumer that
    # reads the tail sees a mid-object fragment (BENCH r04-r06 all came
    # back parsed:null). Emit a compact summary line last — total, sf,
    # query count, headline timings, and regression flags trimmed to
    # name -> ratio — with the full picture in the line above and the
    # committed sidecar.
    compact = {
        "metric": "bench_total_query_sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(names),
        "timing": f"min_of_{runs}_interleaved"
        + ("_cold" if cold else ""),
        "queries": {n: timings[n] for n in HEADLINE if n in timings},
        "detail": "benchmarks/bench_last_detail.json",
    }
    if regressions:
        compact["regressions_vs_baseline"] = {
            n: f"{timings[n] / base[n]:.2f}x"
            for n in sorted(regressions)[:12]
        }
        if len(regressions) > 12:
            compact["regressions_truncated"] = len(regressions) - 12
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()

"""Measured row-group pruning rehearsal: plain vs single-key-sorted vs
Z-ordered fact layout.

At 100 TB the cheapest scan is the one that never reads the file: a
selective predicate prunes parquet row groups whose min/max footer
statistics exclude it, but only if the WRITE-time layout clustered the
predicate columns. This script makes the claim measurable instead of
asserted: it writes the transactions fact table three ways —

- ``plain``      round-robin repartition (what an unclustered ETL emits),
- ``by_store``   globally sorted on (store_id, sale_date) — the
                 single-key clustering that serves store predicates and
                 abandons date predicates,
- ``zorder``     ``quality.write_zordered`` (Morton-interleaved
                 store/day sort) — ONE sort serving BOTH predicates,

then reports, per layout x predicate (store equality, date equality,
store+date point):

- ``rg_admitted / rg_total``: row groups whose footer min/max admit the
  predicate — counted from the parquet footers with pyarrow, so the
  number is deterministic and engine-independent;
- ``scan_sec``: min-of-3 wall of the filtered Spark count on that
  layout.

Usage:
    python scripts/pruning_rehearsal.py [SF_DIR] [WORK_DIR] [OUT_JSON]
Defaults: /root/repo/.scratch/sf1  /root/repo/.scratch/layouts  (stdout)
Prints ONE JSON object; if OUT_JSON is given the object is also written
there (JVM GC warnings can interleave into a captured stdout, so the
file is the reliable channel). Commit under benchmarks/ to record a
rehearsal. Memory note: the global layout sorts need driver headroom at
100x — set SMURF_DRIVER_MEM (e.g. 48g) past sf1.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402

from serverless_smurf_etl_and_analytics_spark import tables  # noqa: E402
from serverless_smurf_etl_and_analytics_spark.operators import quality  # noqa: E402
from serverless_smurf_etl_and_analytics_spark.session import get_spark  # noqa: E402


def rowgroup_stats(path: str, cols: tuple[str, ...]):
    """Yield {col: (min, max)} per row group across the layout's files."""
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            out = {}
            for c in cols:
                st = g.column(idx[c]).statistics
                out[c] = (st.min, st.max) if st and st.has_min_max else None
            yield out


def admitted(path: str, preds: dict[str, str]) -> tuple[int, int]:
    """(row groups admitting ALL equality predicates, total row groups).
    A row group with no stats for a predicate column must be read."""
    adm = tot = 0
    for stats in rowgroup_stats(path, tuple(preds)):
        tot += 1
        ok = True
        for c, v in preds.items():
            if stats[c] is not None:
                lo, hi = stats[c]
                if not (lo <= v <= hi):
                    ok = False
                    break
        adm += ok
    return adm, tot


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/layouts"
    spark = get_spark("pruning-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    txns = tables.transactions(spark, sf_dir)

    # median store / median date keep the predicates representative
    # (not the min/max edge a sorted layout prunes trivially)
    store = txns.selectExpr(
        "percentile_approx(cast(store_id as int), 0.5) v"
    ).first()["v"]
    store = f"{store:04d}"
    date = sorted(
        r["sale_date"] for r in txns.select("sale_date").distinct().collect()
    )
    date = date[len(date) // 2]

    layouts = {}
    shutil.rmtree(work, ignore_errors=True)
    layouts["plain"] = os.path.join(work, "plain")
    txns.repartition(32).write.mode("overwrite").parquet(layouts["plain"])
    layouts["by_store"] = os.path.join(work, "by_store")
    txns.orderBy("store_id", "sale_date").write.mode("overwrite").parquet(
        layouts["by_store"]
    )
    layouts["zorder"] = os.path.join(work, "zorder")
    quality.write_zordered(txns, layouts["zorder"])

    preds = {
        "store_eq": {"store_id": store},
        "date_eq": {"sale_date": date},
        "point": {"store_id": store, "sale_date": date},
    }
    result = {"sf_dir": sf_dir, "store": store, "date": date, "layouts": {}}
    for lname, path in layouts.items():
        entry = {}
        for pname, p in preds.items():
            adm, tot = admitted(path, p)
            df = spark.read.parquet(path)
            for c, v in p.items():
                df = df.filter(df[c] == v)
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                df.count()
                walls.append(time.perf_counter() - t0)
            entry[pname] = {
                "rg_admitted": adm,
                "rg_total": tot,
                "scan_sec": round(min(walls), 3),
            }
        result["layouts"][lname] = entry
    print(json.dumps(result))
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()

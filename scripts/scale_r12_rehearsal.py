"""r12 scale rehearsal (VERDICT r11 tasks 1 and 5):

- ``emb6m``  : the 6M-vector sharded near-dup END TO END — the run
               that crashed in r11 (stage-26 gather-verify, Python
               workers OOM-killed: ``.scratch/emb6m4.log``) — after
               the r12 worker-memory bounds: fixed-size gather slices
               inside the verify kernel (``_GATHER_CHUNK_ROWS``) and
               the mmap-tier concurrency cap
               (``SMURF_GATHER_MMAP_TASKS``). Runs with the Python
               worker faulthandler on and a box-wide memory sampler
               so a repeat failure is diagnosable instead of a bare
               BrokenPipe.
- ``cc100m`` : the distributed connected-components star loop at
               100M edges — one order of magnitude past the r11
               50M-edge evidence, same synthetic shape and
               exactness checks.

``python scripts/scale_r12_rehearsal.py STAGE [STAGE...]``; results
merge into ``benchmarks/scale_r12_summary.json`` (one object per
stage key, so re-running a stage overwrites only itself).

Environment (memory: rehearsal-env-requirements): launch detached
with SMURF_DRIVER_MEM=48g; emb6m additionally wants
SMURF_NEARDUP_SPILL_BUDGET=24000000000 (4 shards on this box's 57 GB
spill volume) and
SMURF_EXTRA_CONF="spark.python.worker.faulthandler.enabled=true".

emb10m postmortem (r12): 5/6 shards completed, then the last shard's
verify hung on its final task — jstack showed the executor thread
epoll-waiting on the Python worker socket with the worker equally
idle: the worker-REUSE deadlock, surviving the staged-candidate fix
at a ~1-in-46-task rate. For the next emb10m+ attempt ADD
``spark.python.worker.reuse=false,spark.speculation=true`` to
SMURF_EXTRA_CONF — a fresh worker per task costs ~4 s x (cap 8 x
shards) ~ minutes at this scale and removes the reused-worker cleanup
path the hang sits in; speculation re-launches any residual
straggler instead of wedging the stage.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUMMARY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks",
    "scale_r12_summary.json",
)


def _merge(key: str, value) -> None:
    data = {}
    if os.path.exists(SUMMARY):
        with open(SUMMARY) as f:
            data = json.load(f)
    data.setdefault("round", 12)
    data[key] = value
    with open(SUMMARY, "w") as f:
        json.dump(data, f, indent=1)
    print(f"[merged {key}] -> {SUMMARY}", flush=True)


def _spark():
    from serverless_smurf_etl_and_analytics_spark.session import get_spark

    s = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


class MemSampler(threading.Thread):
    """Samples /proc every ``period`` seconds: box-wide MemAvailable
    plus the summed RSS of the JVM and of all Python processes — the
    three numbers the r11 postmortem was missing. Daemon thread;
    ``snapshot()`` any time."""

    def __init__(self, period: float = 15.0):
        super().__init__(daemon=True)
        self.period = period
        self.min_avail_kb = None
        self.max_java_rss_kb = 0
        self.max_py_rss_kb = 0
        self.samples = 0

    @staticmethod
    def _rss_by_kind():
        java = py = 0
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read(200).replace(b"\0", b" ")
                with open(f"/proc/{pid}/status") as f:
                    rss = 0
                    for line in f:
                        if line.startswith("VmRSS:"):
                            rss = int(line.split()[1])
                            break
            except OSError:
                continue
            if b"java" in cmd:
                java += rss
            elif b"python" in cmd:
                py += rss
        return java, py

    def run(self):
        while True:
            try:
                with open("/proc/meminfo") as f:
                    avail = next(
                        int(line.split()[1])
                        for line in f
                        if line.startswith("MemAvailable:")
                    )
                java, py = self._rss_by_kind()
                if self.min_avail_kb is None or avail < self.min_avail_kb:
                    self.min_avail_kb = avail
                self.max_java_rss_kb = max(self.max_java_rss_kb, java)
                self.max_py_rss_kb = max(self.max_py_rss_kb, py)
                self.samples += 1
            except Exception:
                pass
            time.sleep(self.period)

    def snapshot(self) -> dict:
        return {
            "min_mem_available_gb": round(
                (self.min_avail_kb or 0) / 1048576, 2
            ),
            "peak_java_rss_gb": round(self.max_java_rss_kb / 1048576, 2),
            "peak_python_rss_total_gb": round(
                self.max_py_rss_kb / 1048576, 2
            ),
            "samples": self.samples,
        }


def stage_emb6m(
    emb_dir: str = "/root/repo/.scratch/emb6m",
    key: str = "emb6m_end_to_end",
    what: str = (
        "the r11 crash case run to completion after the r12 "
        "worker-memory bounds (chunked gather slices + mmap-tier "
        "verify concurrency cap); faulthandler on"
    ),
) -> None:
    import tempfile

    from serverless_smurf_etl_and_analytics_spark.operators import similarity

    sampler = MemSampler()
    sampler.start()
    spark = _spark()
    emb = spark.read.parquet(emb_dir).select(
        "vec_id", "label", "embedding"
    )
    n = emb.count()
    n_bands, planes = similarity.adaptive_band_config(n)
    shards = similarity.auto_shard_count(n, n_bands)
    scratch = tempfile.mkdtemp(prefix="smurf_r12_emb6m_")
    # threshold 0.5 as in r11: the 3000-copy synthetic corpus has a
    # cross-copy cosine noise floor AT the registered 0.3, so 0.3
    # explodes the OUTPUT (a corpus property, not a plan property);
    # 0.5 keeps the planted near-dups and still exercises everything
    # this stage measures: un-forced mmap transport, auto shard
    # count, and the r12 verify-stage memory bounds.
    t0 = time.monotonic()
    pairs = similarity.cosine_neardup_pairs_sharded(
        emb, 0.5, band_cache=None, scratch_dir=scratch
    ).count()
    wall = round(time.monotonic() - t0, 2)
    _merge(
        key,
        {
            "n_vectors": n,
            "band_config": [n_bands, planes],
            "shards": shards,
            "spill_budget": os.environ.get(
                "SMURF_NEARDUP_SPILL_BUDGET", "default"
            ),
            "mmap_unforced": n * (similarity.DIM * 4 + 16)
            > similarity._GATHER_MMAP_BYTES,
            "gather_chunk_rows": similarity._GATHER_CHUNK_ROWS,
            "gather_mmap_tasks": similarity._gather_mmap_tasks(),
            "pairs": pairs,
            "wall_sec": wall,
            "memory": sampler.snapshot(),
            "what": what,
        },
    )


def stage_emb10m() -> None:
    """Stretch evidence past the fixed 6M ceiling: the same end-to-end
    sharded near-dup at 10M vectors (5000 amplification copies of the
    sf0.001 embeddings, same per-copy transform as
    ``make_scaled_data.py``)."""
    stage_emb6m(
        emb_dir="/root/repo/.scratch/emb10m",
        key="emb10m_end_to_end",
        what=(
            "headroom check past the fixed 6M crash point: same "
            "staged-candidate + bounded-gather plan at 10M vectors "
            "(2.7 GB matrix artifact, un-forced mmap)"
        ),
    )


def stage_cc100m(n_edges: int = 100_000_000) -> None:
    """VERDICT r11 task 5: the r11 cc50m harness (same synthetic
    shape: 80% degree-1 fringe + dense planted blobs, exactness
    checked by construction) at 100M edges."""
    from pyspark.sql import functions as F

    from serverless_smurf_etl_and_analytics_spark.operators import dedup

    sampler = MemSampler()
    sampler.start()
    spark = _spark()
    n_pairs = int(n_edges * 0.5)
    n_chains = int(n_edges * 0.3) // 2
    blob_size = 100
    n_blob_edges = n_edges - n_pairs - 2 * n_chains
    edges_per_blob = blob_size * 2
    n_blobs = n_blob_edges // edges_per_blob
    base_chains = 10**9
    base_blobs = 2 * 10**9
    pairs = spark.range(n_pairs).select(
        (F.col("id") * 2).alias("vec_a"),
        (F.col("id") * 2 + 1).alias("vec_b"),
    )
    c = spark.range(n_chains)
    chains = c.select(
        (F.col("id") * 3 + base_chains).alias("vec_a"),
        (F.col("id") * 3 + 1 + base_chains).alias("vec_b"),
    ).union(
        c.select(
            (F.col("id") * 3 + 1 + base_chains).alias("vec_a"),
            (F.col("id") * 3 + 2 + base_chains).alias("vec_b"),
        )
    )
    b = spark.range(n_blobs * edges_per_blob)
    blob = (F.col("id") / edges_per_blob).cast("long")
    slot = F.col("id") % edges_per_blob
    ring = slot < blob_size
    u = F.when(ring, slot).otherwise(
        F.xxhash64(F.col("id")) % blob_size
    )
    v = F.when(ring, (slot + 1) % blob_size).otherwise(
        F.xxhash64(F.col("id"), F.lit(1)) % blob_size
    )
    blobs = b.select(
        (blob * blob_size + F.abs(u) % blob_size + base_blobs).alias(
            "vec_a"
        ),
        (blob * blob_size + F.abs(v) % blob_size + base_blobs).alias(
            "vec_b"
        ),
    ).filter(F.col("vec_a") != F.col("vec_b"))
    edges = pairs.union(chains).union(blobs)
    expected_components = n_pairs + n_chains + n_blobs
    t0 = time.monotonic()
    comp = dedup.connected_components_star(edges)
    agg = comp.groupBy().agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.countDistinct("component").alias("n_components"),
        F.sum(
            F.when(F.col("component") > F.col("v"), 1).otherwise(0)
        ).alias("bad_root_rows"),
    ).first()
    _merge(
        "cc100m_star_loop",
        {
            "n_edges_built": n_edges,
            "shape": {
                "isolated_pairs": n_pairs,
                "three_chains": n_chains,
                "blobs": n_blobs,
                "blob_size": blob_size,
            },
            "expected_components": expected_components,
            "wall_sec": round(time.monotonic() - t0, 2),
            "n_vertices": agg["n_vertices"],
            "n_components": agg["n_components"],
            "components_match": agg["n_components"]
            == expected_components,
            "bad_root_rows": agg["bad_root_rows"],
            "memory": sampler.snapshot(),
            "r11_reference_50m_sec": 210.8,
            "what": "the shipped (unpeeled) star loop one order of "
            "magnitude past the r11 50M evidence; cross-round walls "
            "carry the documented box drift — the exactness columns "
            "are the point",
        },
    )


def stage_x3ab(sf_dir: str = "/root/repo/.scratch/sf10") -> None:
    """VERDICT r11 task 8: can the anomaly/trend export chains consume
    a MATERIALIZED store_daily_cents (the maintained-corpus MV shape
    x6 already rides within a process) instead of re-deriving the
    daily aggregation from facts per dataset? Same-process A/B at
    sf10: arm A = the shipped x3+x4 shapes (one fact scan each); arm
    B = one timed daily materialization + both chains off the
    read-back. The windows themselves run over the tiny daily table
    either way — what the MV removes is the repeated 60M-row
    scan+aggregate."""
    import tempfile

    from serverless_smurf_etl_and_analytics_spark import tables
    from serverless_smurf_etl_and_analytics_spark.operators import (
        export,
        history,
        insights,
    )

    spark = _spark()
    txns = tables.transactions(spark, sf_dir)
    out: dict = {}
    t0 = time.monotonic()
    rows_a3 = export.export_anomalies(txns).count()
    a3 = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    rows_a4 = export.export_trends(txns).count()
    a4 = round(time.monotonic() - t0, 2)
    out["arm_a_shipped"] = {
        "x3_sec": a3, "x4_sec": a4, "total_sec": round(a3 + a4, 2),
        "x3_rows": rows_a3, "x4_rows": rows_a4,
    }
    mv = tempfile.mkdtemp(prefix="smurf_r12_dailymv_") + "/daily"
    t0 = time.monotonic()
    history.store_daily_cents(txns).write.mode("overwrite").parquet(mv)
    build = round(time.monotonic() - t0, 2)
    daily = spark.read.parquet(mv)
    t0 = time.monotonic()
    rows_b3 = export._export_anomalies_from(
        insights.classify_anomalies_from_daily(daily)
    ).count()
    b3 = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    rows_b4 = export._export_trends_from(
        insights.trend_insights_from_daily(daily)
    ).count()
    b4 = round(time.monotonic() - t0, 2)
    out["arm_b_materialized_daily"] = {
        "mv_build_sec": build,
        "x3_from_mv_sec": b3, "x4_from_mv_sec": b4,
        "total_sec": round(build + b3 + b4, 2),
        "x3_rows": rows_b3, "x4_rows": rows_b4,
    }
    out["rows_match"] = rows_a3 == rows_b3 and rows_a4 == rows_b4
    out["what"] = (
        "same-process A/B: the shipped per-dataset fact scans vs one "
        "materialized store_daily_cents feeding both window chains — "
        "quantifies what a maintained daily MV saves the insight/"
        "export family per additional consumer"
    )
    _merge("x3x4_daily_mv_ab_sf10", out)


if __name__ == "__main__":
    stages = sys.argv[1:] or ["emb6m", "cc100m"]
    for s in stages:
        {"emb6m": stage_emb6m, "emb10m": stage_emb10m,
         "cc100m": stage_cc100m, "x3ab": stage_x3ab}[s]()

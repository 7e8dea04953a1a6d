"""r13 scale rehearsal (VERDICT r12 tasks 1, 6, 7):

- ``gen_sf10`` / ``gen_sf30`` / ``gen_emb10m`` : rebuild the scratch
  datasets (the round boundary clears ``.scratch``). emb10m uses the
  FIXED amplifier flip scheme (mod-257 — ADVICE r12: the mod-64
  scheme made copies 2048 apart byte-identical, planting cosine-1.0
  cross-copy pairs that inflated the r12 pair counts), generated in
  250-copy chunks so no single DuckDB statement unions 5000 branches.
- ``emb10m``  : the 10M-vector sharded near-dup END TO END with the
  worker-reuse fix the r12 postmortem specified
  (``scale_r12_summary.json`` ``emb10m_attempt``): launch with
  SMURF_EXTRA_CONF="spark.python.worker.reuse=false;spark.speculation=true"
  — a fresh Python worker per task removes the reused-worker cleanup
  path the jstack-diagnosed epoll deadlock sits in; speculation
  re-launches any residual straggler instead of wedging the stage.
  The stage RECORDS the effective confs so the run is auditable.
- ``txn30``   : the maintained-corpus transaction ingest at sf30
  (180M facts, two odd/even shards) with per-family maintenance
  walls — the O(shard) claim says shard-2 advance cost stays flat
  vs the r12 sf10 record (247 s build / 149 s advance) scaled by
  shard size, not corpus size.
- ``x1x2x5ab``: same-process A/B (r13: at sf30) for the remaining
  export consumers (VERDICT r12 task 6): shipped fact-scan x1/x2/x5
  vs the same consumers off the materialized wide-daily (sdc_v2) and
  product-store-day (psd_v1) artifacts.

``python scripts/scale_r13_rehearsal.py STAGE [STAGE...]``; results
merge into ``benchmarks/scale_r13_summary.json``.

Environment (rehearsal-env-requirements): launch detached with
SMURF_DRIVER_MEM=48g; emb10m wants
SMURF_NEARDUP_SPILL_BUDGET=24000000000 and SMURF_EXTRA_CONF as above
(plus spark.python.worker.faulthandler.enabled=true for diagnosable
crashes).
"""

from __future__ import annotations

import json
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_SCRIPTS)
sys.path.insert(0, _REPO)
sys.path.insert(0, _SCRIPTS)

from scale_r12_rehearsal import MemSampler, _spark  # noqa: E402

SUMMARY = os.path.join(_REPO, "benchmarks", "scale_r13_summary.json")


def _merge(key: str, value) -> None:
    data = {}
    if os.path.exists(SUMMARY):
        with open(SUMMARY) as f:
            data = json.load(f)
    data.setdefault("round", 13)
    data[key] = value
    with open(SUMMARY, "w") as f:
        json.dump(data, f, indent=1)
    print(f"[merged {key}] -> {SUMMARY}", flush=True)


def stage_gen_sf10() -> None:
    from make_scaled_data import amplify

    amplify("/root/testdata/sf0.1", f"{_REPO}/.scratch/sf10", 100)


def stage_gen_sf30() -> None:
    from make_scaled_data import amplify

    amplify("/root/testdata/sf0.1", f"{_REPO}/.scratch/sf30", 300)


# same per-copy transform as make_scaled_data.py's embeddings entry
# (keep in sync!), with the mod-257 flip scheme. src is sf0.1
# (2000 vectors/copy — the source every emb rehearsal amplifies; the
# vec_id stride is sized to it), so 5000 copies = 10M vectors.
_EMB_COPY_SQL = (
    "SELECT vec_id + {i} * 2000 AS vec_id, "
    "list_transform("
    "list_zip(list_concat(embedding[(({i}*7)%64)+1:64], "
    "embedding[1:({i}*7)%64]), range(1, 65)), "
    "z -> CASE WHEN ({i} // 64) > 0 AND "
    "(z[2] * (2*({i} // 64) + 1)) % 257 < 128 "
    "THEN -z[1] ELSE z[1] END)::FLOAT[] AS embedding, label "
    "FROM '{src}/embeddings.parquet'"
)


def stage_gen_emb10m(
    copies: int = 5000,
    src: str = "/root/testdata/sf0.1",
    out: str | None = None,
    chunk: int = 250,
) -> None:
    import duckdb

    out = out or f"{_REPO}/.scratch/emb10m"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    t0 = time.monotonic()
    for lo in range(0, copies, chunk):
        sql = " UNION ALL ".join(
            _EMB_COPY_SQL.format(i=i, src=src)
            for i in range(lo, min(lo + chunk, copies))
        )
        con.execute(
            f"COPY ({sql}) TO '{out}/chunk_{lo:05d}.parquet' "
            "(FORMAT parquet)"
        )
        print(f"emb10m gen: copies {lo}..{min(lo+chunk,copies)-1}",
              flush=True)
    n = con.execute(
        f"SELECT count(*) FROM '{out}/*.parquet'"
    ).fetchone()[0]
    print(f"emb10m gen: {n} rows in {time.monotonic()-t0:.0f}s",
          flush=True)


def _true_pairs_per_copy(
    src: str = "/root/testdata/sf0.1", threshold: float = 0.5
) -> int:
    """Brute-force ground-truth near-dup pair count WITHIN one copy
    (rotation+flip preserve within-copy inner products exactly, so
    every copy plants exactly this many within-copy true pairs). At
    the rehearsal threshold 0.5 this is 14 per copy on the sf0.1
    base (max within-copy cosine 0.601) — 70k planted pairs at 5000
    copies, a small fraction of what a run reports: the bulk is
    CROSS-COPY structural similarity from the sign-flip amplifier
    (see ``stage_emb10m``). 2000x64 floats — trivial driver-side
    numpy."""
    import duckdb
    import numpy as np

    rows = duckdb.connect().execute(
        f"SELECT embedding FROM '{src}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    m = np.array([r[0] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    cos = (m @ m.T) / np.outer(norms, norms)
    iu = np.triu_indices(len(m), k=1)
    return int((cos[iu] >= threshold).sum())


def stage_emb10m(
    emb_dir: str | None = None,
    key: str = "emb10m_end_to_end",
    threshold: float = 0.5,
    copies: int = 5000,
) -> None:
    """The r12 ABORTED stretch run, re-attempted with the specified
    worker-reuse fix and the de-duplicated amplifier.

    Pair-count semantics (ADVICE r12, measured r13): the mod-257
    amplifier removes the BYTE-IDENTICAL cross-copy duplicates the
    mod-64 scheme planted past 2048 copies (flip patterns now never
    repeat within 16448 copies), but sign-flip amplification cannot
    bound the structured cross-copy cosine floor for vectors whose
    energy concentrates in few dims — measured max cross-copy cosine
    0.74 on a 108-copy sample, and the within-copy ground truth at
    threshold 0.5 is ZERO (base-corpus max 0.479). So ``pairs`` is a
    CORPUS-STRUCTURAL figure that exercises the candidate/verify
    machinery at full volume; it is NOT a linear-scaling or recall
    check and must not be compared to the (differently-inflated)
    r12 emb6m figure. What this stage proves is operational: all
    shards complete (no worker-reuse deadlock), wall cadence, and
    bounded memory at 10M vectors."""
    import tempfile

    from serverless_smurf_etl_and_analytics_spark.operators import (
        similarity,
    )

    emb_dir = emb_dir or f"{_REPO}/.scratch/emb10m"
    per_copy = _true_pairs_per_copy(threshold=threshold)
    sampler = MemSampler()
    sampler.start()
    spark = _spark()
    sc = spark.sparkContext
    effective_conf = {
        k: sc.getConf().get(k, "unset")
        for k in (
            "spark.python.worker.reuse",
            "spark.speculation",
            "spark.python.worker.faulthandler.enabled",
        )
    }
    emb = spark.read.parquet(emb_dir).select(
        "vec_id", "label", "embedding"
    )
    n = emb.count()
    n_bands, planes = similarity.adaptive_band_config(n)
    shards = similarity.auto_shard_count(n, n_bands)
    scratch = tempfile.mkdtemp(prefix=f"smurf_r13_{key.split('_')[0]}_")
    t0 = time.monotonic()
    pairs = similarity.cosine_neardup_pairs_sharded(
        emb, threshold, band_cache=None, scratch_dir=scratch
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
            "effective_conf": effective_conf,
            "mmap_unforced": n * (similarity.DIM * 4 + 16)
            > similarity._GATHER_MMAP_BYTES,
            "gather_mmap_tasks": similarity._gather_mmap_tasks(),
            "pairs": pairs,
            "pairs_are_corpus_structural": True,
            "within_copy_true_pairs": per_copy * copies,
            "wall_sec": wall,
            "memory": sampler.snapshot(),
            "what": (
                "the r12 ABORTED 10M attempt completed with "
                "spark.python.worker.reuse=false + speculation (the "
                "jstack-diagnosed fix) on the de-duplicated mod-257 "
                "amplifier corpus; pairs is corpus-structural, see "
                "stage docstring"
            ),
        },
    )


def stage_txn30(sf_dir: str | None = None) -> None:
    """VERDICT r12 task 7: the maintained-corpus transaction ingest
    wall at sf30 (180M facts), two adversarial odd/even shards, with
    the per-family maintenance walls ``_advance_or_build`` now
    records. The families are O(shard): shard walls here should be
    ~3x the r12 sf10 record (3x the shard size), NOT 9x (corpus^2)
    or unbounded."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from serverless_smurf_etl_and_analytics_spark import corpus, tables

    sf_dir = sf_dir or f"{_REPO}/.scratch/sf30"
    sampler = MemSampler()
    sampler.start()
    spark = _spark()
    work = tempfile.mkdtemp(prefix="smurf_r13_txn30_")
    os.environ["SMURF_ARTIFACT_CACHE"] = os.path.join(work, "cache")
    txns = tables.transactions(spark, sf_dir)
    a = txns.filter(F.col("transaction_id") % 2 == 0)
    b = txns.filter(F.col("transaction_id") % 2 == 1)
    t = os.path.join(work, "txns_table")
    t0 = time.monotonic()
    s1 = corpus.ingest_transactions(spark, t, a)
    w1 = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    s2 = corpus.ingest_transactions(spark, t, b)
    w2 = round(time.monotonic() - t0, 2)
    _merge(
        "txn_ingest_sf30",
        {
            "n_facts": txns.count(),
            "shard1_build_sec": w1,
            "shard2_advance_sec": w2,
            "shard1_stats": {
                k: v for k, v in s1.items() if k != "fingerprint"
            },
            "shard2_stats": {
                k: v for k, v in s2.items() if k != "fingerprint"
            },
            "r12_sf10_reference_sec": {
                "shard1": 247, "shard2_advance": 149
            },
            "memory": sampler.snapshot(),
            "what": (
                "two-shard maintained ingest at 3x the r12 sf10 rung; "
                "families now include the wide store-day MV (sdc_v2) "
                "and the product-store-day partial (psd_v1) alongside "
                "co_pair_daily"
            ),
        },
    )
    shutil.rmtree(work, ignore_errors=True)


def stage_x1x2x5ab(sf_dir: str | None = None) -> None:
    """VERDICT r12 task 6: can x1/x2/x5 consume the maintained
    artifacts instead of re-scanning facts per consumer? Same-process
    A/B: arm A = the shipped fact-scan shapes; arm B = one timed
    materialization of the wide daily + per-SKU partials, then all
    three consumers off the read-backs (the maintained-corpus MV
    shape, sans ledger). Records under a key suffixed with the
    dataset name (r13 runs it at sf30 — the same rung the txn30
    ingest measures, 3x the r12 x3/x4 A/B scale)."""
    import tempfile

    from serverless_smurf_etl_and_analytics_spark import tables
    from serverless_smurf_etl_and_analytics_spark.operators import (
        export,
        history,
        insights,
        metrics,
    )

    sf_dir = sf_dir or f"{_REPO}/.scratch/sf30"
    spark = _spark()
    txns = tables.transactions(spark, sf_dir)
    start, end = "1992-01-01", "1998-12-31"
    out: dict = {}
    walls = {}
    rows_a = {}
    t0 = time.monotonic()
    rows_a["x1"] = export.export_store_summaries(txns, start, end).count()
    walls["x1_sec"] = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    rows_a["x2"] = export.export_top_products(txns, start, end).count()
    walls["x2_sec"] = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    rows_a["x5"] = export.export_recommendations(txns).count()
    walls["x5_sec"] = round(time.monotonic() - t0, 2)
    out["arm_a_shipped"] = {**walls, "rows": rows_a}

    mvroot = tempfile.mkdtemp(prefix="smurf_r13_x1x2x5_")
    daily_p = os.path.join(mvroot, "daily")
    psd_p = os.path.join(mvroot, "psd")
    t0 = time.monotonic()
    history.store_daily_metrics_cents(txns).write.mode(
        "overwrite"
    ).parquet(daily_p)
    build_daily = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    metrics.product_day_partial(txns).write.mode("overwrite").parquet(
        psd_p
    )
    build_psd = round(time.monotonic() - t0, 2)
    daily = spark.read.parquet(daily_p)
    psd = spark.read.parquet(psd_p)
    wallsb = {}
    rows_b = {}
    t0 = time.monotonic()
    rows_b["x1"] = export._export_store_summaries_from_daily(
        daily, start, end
    ).count()
    wallsb["x1_sec"] = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    rows_b["x2"] = export._export_top_products_from(
        metrics.top_products_from_rollup(
            metrics._rollup_shape(psd).filter(
                F_between(start, end)
            ),
            5,
        )
    ).count()
    wallsb["x2_sec"] = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    rows_b["x5"] = export._export_recommendations_from(
        insights.recommendations_from(
            insights.classify_anomalies_from_daily(
                daily.select(
                    "store_id", "sale_date", "sales_c", "txn_count"
                )
            )
        )
    ).count()
    wallsb["x5_sec"] = round(time.monotonic() - t0, 2)
    out["arm_b_materialized"] = {
        "daily_mv_build_sec": build_daily,
        "psd_build_sec": build_psd,
        **wallsb,
        "rows": rows_b,
    }
    out["rows_match"] = rows_a == rows_b
    out["what"] = (
        "shipped per-consumer fact scans vs the maintained-artifact "
        "shapes (wide daily for x1/x5, per-SKU partial for x2) — the "
        "per-additional-consumer saving of VERDICT r12 task 6"
    )
    _merge(f"x1x2x5_mv_ab_{os.path.basename(sf_dir.rstrip('/'))}", out)


def F_between(start: str, end: str):
    from pyspark.sql import functions as F

    return F.col("sale_date").between(start, end)


if __name__ == "__main__":
    stages = sys.argv[1:]
    dispatch = {
        "gen_sf10": stage_gen_sf10,
        "gen_sf30": stage_gen_sf30,
        "gen_emb10m": stage_gen_emb10m,
        "emb10m": stage_emb10m,
        "txn30": stage_txn30,
        "x1x2x5ab": stage_x1x2x5ab,
    }
    for s in stages:
        dispatch[s]()

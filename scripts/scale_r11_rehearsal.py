"""r11 scale rehearsal (VERDICT r10 tasks 3/4/7/8): measure, on the
amplified corpora, the four r11 scale changes —

- ``d9``      : semantic_dedup_cc at sf30 (r10 reference: 190.3 s).
- ``ingest``  : doc-family first-contact build + advance at sf30 with
                the fused tokenize pins (r10 reference: 84.5 s / 44.1 s).
- ``emb6m``   : the un-forced _GATHER_MMAP_BYTES crossing (6M vectors x
                dim 64 int32 = 1.63 GB matrix > the 1.5 GB gate) through
                the AUTO-sharded near-dup pass — one run exercising the
                mmap transport, the auto shard count, and the spill
                budget together.
- ``x6``      : export family fresh-process colds at sf10 with the
                manifest riding the shared MV (r10 reference: 5.91 s).

Stages run independently: ``python scripts/scale_r11_rehearsal.py
STAGE [STAGE...]`` with data dirs defaulting to the .scratch layout of
``make_scaled_data.py``. Results merge into
``benchmarks/scale_r11_summary.json`` (one JSON object per stage key,
so re-running a stage overwrites only itself).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUMMARY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks",
    "scale_r11_summary.json",
)


def _merge(key: str, value) -> None:
    data = {}
    if os.path.exists(SUMMARY):
        with open(SUMMARY) as f:
            data = json.load(f)
    data.setdefault("round", 11)
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


def stage_d9(sf_dir: str = "/root/repo/.scratch/sf30") -> None:
    from serverless_smurf_etl_and_analytics_spark import tables
    from serverless_smurf_etl_and_analytics_spark.operators import dedup

    spark = _spark()
    emb = tables.load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    docs = tables.load(spark, sf_dir, "documents")
    t0 = time.monotonic()
    groups = dedup.semantic_dedup_cc(docs, emb, 0.4).count()
    wall = round(time.monotonic() - t0, 2)
    _merge(
        "d9_sf30",
        {
            "groups": groups,
            "wall_sec": wall,
            "r10_reference_sec": 190.29,
            "what": "end-to-end semantic_dedup_cc at sf30 (near-dup "
            "pair generation + connected components); cross-round "
            "walls carry the environment drift documented in the "
            "export stage",
        },
    )


def stage_ingest(sf_dir: str = "/root/repo/.scratch/sf30") -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from serverless_smurf_etl_and_analytics_spark import corpus, tables

    work = tempfile.mkdtemp(prefix="smurf_r11_ingest_")
    os.environ["SMURF_ARTIFACT_CACHE"] = os.path.join(work, "cache")
    spark = _spark()
    docs = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    t = os.path.join(work, "docs_table")
    t0 = time.monotonic()
    s1 = corpus.ingest_documents(spark, t, a)
    w1 = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    s2 = corpus.ingest_documents(spark, t, b)
    w2 = round(time.monotonic() - t0, 2)
    _merge(
        "doc_ingest_sf30",
        {
            "shard1_build_sec": w1,
            "shard2_advance_sec": w2,
            "shard1_stats": {k: v for k, v in s1.items() if k != "fingerprint"},
            "shard2_stats": {k: v for k, v in s2.items() if k != "fingerprint"},
            "r10_reference_sec": {"shard1": 84.53, "shard2_advance": 44.14},
            "what": "unfused per-family walks (the shipped shape): the "
            "fused-tokenize prototype measured 2-5.5x slower and was "
            "reverted — see doc_ingest_fuse_ab; committed-shard "
            "advance inputs (ADVICE r10 fix) are in effect here",
        },
    )
    shutil.rmtree(work, ignore_errors=True)


def stage_emb6m(emb_dir: str = "/root/repo/.scratch/emb6m") -> None:
    import tempfile

    from serverless_smurf_etl_and_analytics_spark.operators import similarity

    spark = _spark()
    emb = spark.read.parquet(emb_dir).select(
        "vec_id", "label", "embedding"
    )
    n = emb.count()
    n_bands, planes = similarity.adaptive_band_config(n)
    shards = similarity.auto_shard_count(n, n_bands)
    matrix_bytes = n * (similarity.DIM * 4 + 16)
    scratch = tempfile.mkdtemp(prefix="smurf_r11_emb6m_")
    # threshold 0.5, not the registered 0.3: at 3000 amplification
    # copies the cross-copy cosine noise floor sits AT ~0.3 and the
    # output explodes into the billions of noise pairs (shard 0 alone
    # staged >700 MB in the first attempt) — an output-volume
    # property of the synthetic corpus, not of the plan. 0.5 keeps
    # the planted within-copy near-dups (the real workload) while
    # exercising exactly what this stage measures: the un-forced
    # mmap transport and the auto shard count.
    t0 = time.monotonic()
    pairs = similarity.cosine_neardup_pairs_sharded(
        emb, 0.5, band_cache=None, scratch_dir=scratch
    ).count()
    wall = round(time.monotonic() - t0, 2)
    _merge(
        "emb6m_unforced_mmap_auto_shards",
        {
            "n_vectors": n,
            "band_config": [n_bands, planes],
            "auto_shards": shards,
            "matrix_bytes": matrix_bytes,
            "mmap_gate_bytes": similarity._GATHER_MMAP_BYTES,
            "mmap_unforced": matrix_bytes > similarity._GATHER_MMAP_BYTES,
            "pairs": pairs,
            "wall_sec": wall,
            "r10_reference_2m": {
                "single_pass_sec": 467.35,
                "sharded4_sec": 492.59,
                "mmap_forced_sec": 431.23,
            },
        },
    )


def stage_cc50m(n_edges: int = 50_000_000) -> None:
    """VERDICT r10 task 3's alternative 'done': a >=50M-edge graph
    through connected_components_star. Shape stresses the degree-1
    fringe — a large mass of isolated pairs and 3-chains plus dense
    planted blobs (the star rounds' job). Built distributively with Spark
    range + column arithmetic (no driver materialization); labels are
    spot-checked by construction (every blob must come out as ONE
    component rooted at its minimum; pair/chain labels are their
    minima)."""
    from pyspark.sql import functions as F

    from serverless_smurf_etl_and_analytics_spark.operators import dedup

    spark = _spark()
    n_pairs = int(n_edges * 0.5)
    n_chains = int(n_edges * 0.3) // 2  # 2 edges per 3-chain
    blob_size = 100
    n_blob_edges = n_edges - n_pairs - 2 * n_chains
    edges_per_blob = blob_size * 2  # ring + same-blob random chords
    n_blobs = n_blob_edges // edges_per_blob
    base_pairs = 0
    base_chains = 10**9
    base_blobs = 2 * 10**9
    pairs = spark.range(n_pairs).select(
        (F.col("id") * 2 + base_pairs).alias("vec_a"),
        (F.col("id") * 2 + 1 + base_pairs).alias("vec_b"),
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
    out: dict = {
        "n_edges_built": n_edges,
        "shape": {
            "isolated_pairs": n_pairs,
            "three_chains": n_chains,
            "blobs": n_blobs,
            "blob_size": blob_size,
        },
        "expected_components": expected_components,
        "what": "distributed star loop on a 50M-edge near-dup-shaped "
        "graph (80% of edges in the degree-1 fringe), same "
        "process/environment caveat as the export stage",
    }
    # NOTE: the peel-on arm of this stage was measured against the r11
    # peel PROTOTYPE before it was reverted (340.6 s vs 210.8 s — the
    # negative result recorded in connected_components_star's
    # docstring); the shipped loop is the unpeeled form below.
    t0 = time.monotonic()
    comp = dedup.connected_components_star(edges)
    agg = comp.groupBy().agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.countDistinct("component").alias("n_components"),
        F.sum(
            F.when(F.col("component") > F.col("v"), 1).otherwise(0)
        ).alias("bad_root_rows"),
    ).first()
    out["shipped_loop"] = {
        "wall_sec": round(time.monotonic() - t0, 2),
        "n_vertices": agg["n_vertices"],
        "n_components": agg["n_components"],
        "components_match": agg["n_components"] == expected_components,
        "bad_root_rows": agg["bad_root_rows"],
    }
    _merge("cc50m_star_loop", out)


def stage_x6(sf_dir: str = "/root/repo/.scratch/sf10") -> None:
    child = (
        "import os, sys, time\n"
        "sys.path.insert(0, '/root/repo')\n"
        "from serverless_smurf_etl_and_analytics_spark.session import get_spark\n"
        "from serverless_smurf_etl_and_analytics_spark.plans import registry\n"
        "spark = get_spark(master='local[32]')\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "name = sys.argv[1]\n"
        "t0 = time.monotonic()\n"
        f"n = registry.QUERIES[name](spark, {sf_dir!r}).count()\n"
        "print(f'RESULT {name} {time.monotonic()-t0:.2f} {n}')\n"
    )
    out = {}
    for q in (
        "x6_export_manifest",
        "x1_export_store_summaries",
        "x3_export_anomalies",
    ):
        r = subprocess.run(
            [sys.executable, "-c", child, q],
            capture_output=True,
            text=True,
            timeout=900,
        )
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                _, name, sec, rows = line.split()
                out[name] = {"cold_sec": float(sec), "rows": int(rows)}
        if q not in out:
            out[q] = {"error": (r.stdout + r.stderr)[-800:]}
    out["r10_reference_sec"] = {"x6": 5.91, "x1": 5.31, "x3": 8.4}
    out["what"] = (
        "x6 manifest counts consume the shared store_daily MV (one "
        "full fact scan total + the top_products range scan) instead "
        "of re-aggregating facts per dataset"
    )
    _merge("export_sf10_cold_fresh_process", out)


if __name__ == "__main__":
    stages = sys.argv[1:] or ["d9", "ingest", "x6"]
    for s in stages:
        {"d9": stage_d9, "ingest": stage_ingest,
         "emb6m": stage_emb6m, "x6": stage_x6,
         "cc50m": stage_cc50m}[s]()

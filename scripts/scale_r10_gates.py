"""sf30 gate rehearsal (VERDICT r9 task 7): one order of magnitude
past the r7/r8 sf10 sweeps on the artifact families, checking that
the size gates and tier bounds hold — or recording the first one that
crosses — at 1.5M docs / 600k vectors / 180M fact lines.

Gate inventory checked here:
- ``similarity._GATHER_VERIFY_MAX`` (500k): sf30's 600k vectors CROSS
  it — the embedding-riding join tier must take over (by design;
  tier-equality is law-tested at small scale, this run proves the
  wall at the crossing).
- ``similarity.adaptive_band_config``: band width must grow with
  log2(n) (recorded per scale).
- ``dedup._DRIVER_CC_MAX`` (5M edges): d9's verified-pair graph at
  sf30 — record the canonical edge count and which CC tier ran.
- ``dedup._DOC_ARTIFACT_MIN`` / co gate: far crossed; the d3/d4 walls
  record how the banded pipelines scale at 3x sf10.
- tri2 off the maintained co-partial layer: stays seconds at any
  corpus size (partial table saturates; reuses the
  corpus_pipeline_rehearsal workdir's ledger + artifacts).

Usage (run corpus_pipeline_rehearsal setup first for the tri2 leg):
    python scripts/scale_r10_gates.py [SF_DIR] [WORK] [OUT_JSON]
Defaults: /root/repo/.scratch/sf30  /root/repo/.scratch/corpus_rehearsal30
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serverless_smurf_etl_and_analytics_spark import corpus, tables  # noqa: E402
from serverless_smurf_etl_and_analytics_spark.operators import (  # noqa: E402
    dedup,
    graph,
    joins,
    similarity,
)
from serverless_smurf_etl_and_analytics_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf30"
    work = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/repo/.scratch/corpus_rehearsal30"
    )
    out_json = sys.argv[3] if len(sys.argv) > 3 else None
    cache = os.path.join(work, "cache")
    os.environ.setdefault("SMURF_ARTIFACT_CACHE", cache)
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    result: dict = {"sf_dir": sf_dir, "round": 10}

    docs = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    emb = tables.load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    n_docs = docs.count()
    n_vecs = emb.count()
    result["n_docs"] = n_docs
    result["n_vecs"] = n_vecs
    result["adaptive_band_config"] = {
        str(n): similarity.adaptive_band_config(n)
        for n in (200_000, n_vecs, 2_000_000)
    }
    result["gather_gate"] = {
        "max": similarity._GATHER_VERIFY_MAX,
        "crossed": n_vecs > similarity._GATHER_VERIFY_MAX,
        "tier": "embedding-riding join"
        if n_vecs > similarity._GATHER_VERIFY_MAX
        else "broadcast gather",
    }

    t0 = time.monotonic()
    result["d3_pairs"] = dedup.lsh_candidate_pairs(docs).count()
    result["d3_sec"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    result["d4_pairs"] = dedup.minhash_neardup_pairs(docs, 0.5).count()
    result["d4_sec"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    result["sim2_pairs"] = similarity.cosine_neardup_pairs(emb, 0.3).count()
    result["sim2_sec"] = round(time.monotonic() - t0, 2)

    # d9's edge graph vs the driver-CC bound: the verified near-dup
    # pairs ARE the canonical edges (vec_a < vec_b by construction)
    result["d9_edges_vs_driver_cc_max"] = {
        "edges": result["sim2_pairs"],
        "driver_cc_max": dedup._DRIVER_CC_MAX,
        "tier": "distributed star"
        if result["sim2_pairs"] > dedup._DRIVER_CC_MAX
        else "driver numpy",
    }
    t0 = time.monotonic()
    result["d9_groups"] = dedup.semantic_dedup_cc(
        tables.load(spark, sf_dir, "documents"), emb, 0.4
    ).count()
    result["d9_sec"] = round(time.monotonic() - t0, 2)

    # tri2 off the maintained co-partial layer (needs the
    # corpus_pipeline_rehearsal setup to have ingested sf30 txns)
    txn_table = os.path.join(work, "txns")
    if os.path.isdir(os.path.join(txn_table, "_log")):
        txns, fp, _ = corpus.snapshot_transactions(spark, txn_table)
        t0 = time.monotonic()
        result["tri2_rows"] = graph.triangles_from_topk(
            joins.co_range_topk(
                txns, "1996-01-01", "1996-12-31",
                cache=cache, fingerprint=fp,
            )
        ).count()
        result["tri2_off_partials_sec"] = round(time.monotonic() - t0, 2)

    line = json.dumps(result)
    print(line)
    if out_json:
        with open(out_json, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

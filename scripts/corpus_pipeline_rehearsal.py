"""Measured proof of the r10 maintained-corpus layer at rehearsal
scale: ingest shards through ``corpus.ingest_*`` (artifacts built /
advanced AT INGEST), then — in a SEPARATE process, the honest
cross-session cold — run the ledger-fed queries and time them. The
r9 VERDICT targets: pipeline-shape cold co2 <= ~4 s at sf10 (r9
measured 13.0 s with ~10 s of scan-derived cache key), plus one dedup
and one band consumer on the same zero-scan path.

Usage:
    python scripts/corpus_pipeline_rehearsal.py setup   [SF_DIR] [WORK]
    python scripts/corpus_pipeline_rehearsal.py measure [SF_DIR] [WORK] [OUT_JSON]
Defaults: /root/repo/.scratch/sf10  /root/repo/.scratch/corpus_rehearsal
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from serverless_smurf_etl_and_analytics_spark import corpus, tables  # noqa: E402
from serverless_smurf_etl_and_analytics_spark.session import get_spark  # noqa: E402

START, END = "1996-01-01", "1996-12-31"


def _spark():
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def setup(sf_dir: str, work: str) -> None:
    cache = os.path.join(work, "cache")
    # the doc-family query wrappers resolve their "auto" cache through
    # the env var — point the whole rehearsal at the workdir cache
    os.environ["SMURF_ARTIFACT_CACHE"] = cache
    spark = _spark()
    os.makedirs(work, exist_ok=True)
    result = {"phase": "setup", "sf_dir": sf_dir}

    txns = tables.transactions(spark, sf_dir).select(
        "transaction_id", "item_sku", "sale_date"
    )
    t0 = time.monotonic()
    s1 = corpus.ingest_transactions(
        spark, os.path.join(work, "txns"),
        txns.filter(F.col("transaction_id") % 2 == 0), cache,
    )
    result["txn_shard1_ingest_sec"] = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    s2 = corpus.ingest_transactions(
        spark, os.path.join(work, "txns"),
        txns.filter(F.col("transaction_id") % 2 == 1), cache,
    )
    result["txn_shard2_ingest_sec"] = round(time.monotonic() - t0, 2)
    result["txn_maintenance"] = [s1["co_pair_daily"], s2["co_pair_daily"]]

    docs = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    t0 = time.monotonic()
    d1 = corpus.ingest_documents(
        spark, os.path.join(work, "docs"),
        docs.filter(F.col("doc_id") % 2 == 0), cache,
    )
    result["doc_shard1_ingest_sec"] = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    d2 = corpus.ingest_documents(
        spark, os.path.join(work, "docs"),
        docs.filter(F.col("doc_id") % 2 == 1), cache,
    )
    result["doc_shard2_ingest_sec"] = round(time.monotonic() - t0, 2)
    result["doc_maintenance"] = [
        [d1[f] for f in corpus.DOC_FAMILIES],
        [d2[f] for f in corpus.DOC_FAMILIES],
    ]

    emb = tables.load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    t0 = time.monotonic()
    e1 = corpus.ingest_embeddings(
        spark, os.path.join(work, "emb"),
        emb.filter(F.col("vec_id") % 2 == 0), cache,
    )
    result["emb_shard1_ingest_sec"] = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    e2 = corpus.ingest_embeddings(
        spark, os.path.join(work, "emb"),
        emb.filter(F.col("vec_id") % 2 == 1), cache,
    )
    result["emb_shard2_ingest_sec"] = round(time.monotonic() - t0, 2)
    result["emb_maintenance"] = [e1["band"], e2["band"]]
    print(json.dumps(result))


def measure(sf_dir: str, work: str, out_json: str | None) -> None:
    cache = os.path.join(work, "cache")
    os.environ["SMURF_ARTIFACT_CACHE"] = cache
    spark = _spark()
    result = {"phase": "measure_cold", "sf_dir": sf_dir}

    t0 = time.monotonic()
    result["co2_rows"] = corpus.copurchase_range_topk(
        spark, os.path.join(work, "txns"), START, END, cache=cache
    ).count()
    result["co2_pipeline_cold_sec"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    result["d4_rows"] = corpus.minhash_neardup(
        spark, os.path.join(work, "docs"), 0.5
    ).count()
    result["d4_pipeline_cold_sec"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    result["sim2_rows"] = corpus.cosine_neardup(
        spark, os.path.join(work, "emb"), 0.3, cache=cache
    ).count()
    result["sim2_pipeline_cold_sec"] = round(time.monotonic() - t0, 2)

    line = json.dumps(result)
    print(line)
    if out_json:
        with open(out_json, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    phase = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf10"
    work = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "/root/repo/.scratch/corpus_rehearsal"
    )
    if phase == "setup":
        setup(sf_dir, work)
    else:
        measure(sf_dir, work, sys.argv[4] if len(sys.argv) > 4 else None)

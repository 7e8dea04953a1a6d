"""Laws for the ledger-maintained corpus layer (``corpus.py`` —
VERDICT r9 tasks 2+5): artifacts are maintained AT INGEST TIME
(built on the first shard, advanced in O(shard) on every later one),
and a cold query session afterwards runs with ZERO corpus scans and
ZERO artifact builds — the cache key comes from the commit ledger,
the artifact from the cache, and the only Spark work is the artifact
read plus the query's own aggregation. Results must equal the inline
full-corpus plans exactly."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from serverless_smurf_etl_and_analytics_spark import corpus, tables
from serverless_smurf_etl_and_analytics_spark.operators import (
    artifacts,
    dedup,
    joins,
    similarity,
    textops,
)

from conftest import SF_DIR


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _ban_scans_and_builds(monkeypatch):
    """From here on: any corpus-scan job (count, fingerprint
    aggregate) or any artifact BUILD (atomic_write_parquet on a
    missing path) fails the test. Artifact reads and result collects
    stay allowed — a maintained-corpus cold query is exactly those."""

    def boom(*a, **k):
        raise AssertionError(
            "corpus scan during maintained-corpus cold query"
        )

    monkeypatch.setattr(DataFrame, "count", boom)
    monkeypatch.setattr(textops, "text_corpus_fingerprint", boom)
    monkeypatch.setattr(similarity, "corpus_fingerprint", boom)
    monkeypatch.setattr(joins, "txn_corpus_fingerprint", boom)

    real_write = artifacts.atomic_write_parquet

    def hit_only(df, path):
        assert os.path.exists(path), (
            f"artifact BUILD during maintained-corpus cold query: {path}"
        )
        return real_write(df, path)

    monkeypatch.setattr(artifacts, "atomic_write_parquet", hit_only)


def _open_gates(monkeypatch):
    """Drop the query-side 'auto' size gates so the sf0.001 corpora
    exercise the artifact lookup path the production scales use (the
    gates exist to keep tiny inline plans byte-identical, not to
    protect correctness — law-tested elsewhere)."""
    monkeypatch.setattr(dedup, "_DOC_ARTIFACT_MIN", 0)
    monkeypatch.setattr(textops, "_WINNOW_ARTIFACT_MIN", 0)
    monkeypatch.setattr(similarity, "_BAND_CACHE_MIN", 0)
    monkeypatch.setattr(joins, "_CO_ARTIFACT_MIN", 0)


def test_document_corpus_ingest_then_zero_scan_queries(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "cache")
    monkeypatch.setenv("SMURF_ARTIFACT_CACHE", root)
    t = str(tmp_path / "docs")
    docs = tables.load(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "text"
    )
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)

    # inline expectations over the FULL corpus, before any banning
    d4_inline = _rows(
        dedup.minhash_neardup_pairs(docs, 0.5).select("doc_a", "doc_b")
    )
    d6_inline = _rows(dedup.simhash_neardup_pairs(docs, 6, 128))
    wn1_inline = _rows(textops.winnow_overlap(docs, min_shared=2))

    # ingest: first shard builds every family, second advances them
    s1 = corpus.ingest_documents(spark, t, a)
    s2 = corpus.ingest_documents(spark, t, b)
    assert [s1[f] for f in corpus.DOC_FAMILIES] == ["built"] * 4
    assert [s2[f] for f in corpus.DOC_FAMILIES] == ["advanced"] * 4
    # the recorded ledger pair equals the scan pair over the table
    assert s2["fingerprint"] == textops.text_corpus_fingerprint(
        corpus.snapshot_documents(spark, t)[0]
    )

    _open_gates(monkeypatch)
    _ban_scans_and_builds(monkeypatch)
    assert _rows(
        corpus.minhash_neardup(spark, t, 0.5).select("doc_a", "doc_b")
    ) == d4_inline
    assert _rows(corpus.simhash_neardup(spark, t, 6)) == d6_inline
    assert (
        _rows(corpus.winnow_overlap_pairs(spark, t, min_shared=2))
        == wn1_inline
    )


def test_embedding_corpus_ingest_then_zero_scan_query(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "cache")
    monkeypatch.setenv("SMURF_ARTIFACT_CACHE", root)
    t = str(tmp_path / "emb")
    emb = tables.load(spark, SF_DIR, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)

    sim2_inline = _rows(
        similarity.cosine_neardup_pairs(emb, 0.3, band_cache=None)
    )

    s1 = corpus.ingest_embeddings(spark, t, a)
    s2 = corpus.ingest_embeddings(spark, t, b)
    assert s1["band"] == "built" and s2["band"] == "advanced"

    _open_gates(monkeypatch)
    _ban_scans_and_builds(monkeypatch)
    assert _rows(corpus.cosine_neardup(spark, t, 0.3)) == sim2_inline


def test_transaction_corpus_ingest_then_zero_scan_copurchase(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "cache")
    monkeypatch.setenv("SMURF_ARTIFACT_CACHE", root)
    t = str(tmp_path / "txns")
    txns = tables.transactions(spark, SF_DIR).select(
        "transaction_id", "item_sku", "sale_date"
    )
    # shards must be partitions of ORDERS (complete baskets)
    a = txns.filter(F.col("transaction_id") % 2 == 0)
    b = txns.filter(F.col("transaction_id") % 2 == 1)
    start, end = "1992-01-01", "1998-12-31"

    co2_inline = _rows(joins.co_range_topk(txns, start, end, cache=None))

    s1 = corpus.ingest_transactions(spark, t, a)
    s2 = corpus.ingest_transactions(spark, t, b)
    assert s1["co_pair_daily"] == "built"
    assert s2["co_pair_daily"] == "advanced"

    _open_gates(monkeypatch)
    _ban_scans_and_builds(monkeypatch)
    assert (
        _rows(corpus.copurchase_range_topk(spark, t, start, end))
        == co2_inline
    )

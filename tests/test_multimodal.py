"""Multimodal plumbing: binary payload projection, decode stub
determinism/batch shape, and the stubbed real-decoder slot."""

from __future__ import annotations

import pytest

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import multimodal

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return tables.load(spark, SF_DIR, "documents")


def test_binary_payload_schema(spark, docs):
    d = multimodal.with_binary_payload(docs)
    kinds = dict(d.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["n_bytes"] == "bigint"
    mods = {r["modality"] for r in d.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}


def test_decode_assets_deterministic(spark, docs):
    a = multimodal.decode_assets(docs).orderBy("doc_id").limit(20).collect()
    b = multimodal.decode_assets(docs).orderBy("doc_id").limit(20).collect()
    assert a == b
    assert len(a) == 20


def test_decode_assets_metadata_shape(spark, docs):
    rows = multimodal.decode_assets(docs).collect()
    assert len(rows) == docs.count()
    for r in rows:
        if r["modality"] == "image":
            assert r["width"] is not None and r["width"] % 64 == 0
            assert r["height"] is not None
            assert r["duration_ms"] is None
        else:
            assert r["width"] is None
            assert r["duration_ms"] is not None and r["duration_ms"] >= 1000
        assert 0.0 <= r["byte_entropy_q"] <= 1.0


def test_real_decoder_is_stubbed(spark, docs):
    with pytest.raises(NotImplementedError):
        multimodal.decode_assets(docs, use_real_decoder=True)

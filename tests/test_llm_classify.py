"""The pluggable llm_classify pandas-UDF interface (SURVEY §2.10):
deterministic-fake taxonomy, custom-backend injection, reproducibility.
Out of the oracle path by design."""

from __future__ import annotations

import pytest

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import insights

SF_DIR = "/root/testdata/sf0.001"

TAXONOMY = {
    "historical_low",
    "historical_high",
    "sudden_drop",
    "sudden_spike",
    "peer_outlier",
}


@pytest.fixture(scope="module")
def txns(spark):
    return tables.transactions(spark, SF_DIR)


def test_default_fake_covers_taxonomy(spark, txns):
    out = insights.llm_classify(txns)
    labels = {r["label"] for r in out.select("label").distinct().collect()}
    assert labels <= TAXONOMY
    assert "peer_outlier" in labels  # |dev| < 25 rows exist
    assert out.filter(out.label.isNull()).count() == 0


def test_default_fake_matches_thresholds(spark, txns):
    rows = insights.llm_classify(txns).collect()
    assert rows
    for r in rows:
        d = r["deviation_pct"]
        if d is not None and d >= 50:
            assert r["label"] == "historical_high"
        elif d is not None and d <= -50:
            assert r["label"] == "historical_low"


def test_custom_backend_injection(spark, txns):
    def constant_backend(pdf):
        return ["peer_outlier"] * len(pdf)

    out = insights.llm_classify(txns, classify_fn=constant_backend)
    labels = {r["label"] for r in out.select("label").distinct().collect()}
    assert labels == {"peer_outlier"}


def test_deterministic_across_runs(spark, txns):
    a = sorted(
        (r["store_id"], r["sale_date"], r["label"])
        for r in insights.llm_classify(txns).collect()
    )
    b = sorted(
        (r["store_id"], r["sale_date"], r["label"])
        for r in insights.llm_classify(txns).collect()
    )
    assert a == b

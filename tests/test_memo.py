"""Laws for the r14 session memos: gate scalars are computed once per
(application, plan), distinct plans never share an entry, and the x6
manifest's shared-source row counts equal the real dataset counts."""

from __future__ import annotations

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import export, memo
from serverless_smurf_etl_and_analytics_spark.plans.registry import (
    R_END,
    R_START,
)

SF_DIR = "/root/testdata/sf0.001"


def test_plan_scalar_computes_once_per_plan(spark):
    docs = tables.load(spark, SF_DIR, "documents")
    calls = []

    def compute():
        calls.append(1)
        return docs.count()

    a = memo.plan_scalar(docs, "test_kind", compute)
    b = memo.plan_scalar(docs, "test_kind", compute)
    assert a == b == docs.count()
    assert len(calls) == 1  # second call served from the memo
    # an equal plan built independently hits the same entry
    docs2 = tables.load(spark, SF_DIR, "documents")
    c = memo.plan_scalar(docs2, "test_kind", lambda: calls.append(1) or -1)
    assert c == a and len(calls) == 1


def test_plan_scalar_distinguishes_plans_and_kinds(spark):
    docs = tables.load(spark, SF_DIR, "documents")
    emb = tables.load(spark, SF_DIR, "embeddings")
    assert memo.memoized_count(docs) == docs.count()
    assert memo.memoized_count(emb) == emb.count()
    # a filtered plan is a different key, not a stale hit
    half = docs.filter("doc_id % 2 = 0")
    assert memo.memoized_count(half) == half.count()
    # same plan, different kind -> independent entries
    assert (
        memo.plan_scalar(docs, "other_kind", lambda: "x") == "x"
    )


def test_shared_insight_frames_assemble_once_and_match(spark):
    """r14: the insight chain's plan assembly is memoized per
    (application, min_days, fact plan) — repeat consumer calls get the
    SAME lazy frame objects — and the frames are value-identical to an
    independently assembled chain (plan memoization never touches
    results)."""
    from serverless_smurf_etl_and_analytics_spark.operators import (
        history,
        insights,
    )

    txns = tables.transactions(spark, SF_DIR)
    frames = insights.shared_insight_frames(txns)
    # consumer entry points serve the memoized objects
    assert insights.classify_anomalies(txns) is frames["an"]
    assert insights.trend_insights(txns) is frames["trends"]
    assert insights.recommendations(txns) is frames["recs"]
    # an equal fact plan built independently hits the same entry
    txns2 = tables.transactions(spark, SF_DIR)
    assert insights.shared_insight_frames(txns2)["an"] is frames["an"]
    # a different min_days is an independent entry, not a stale hit
    assert (
        insights.shared_insight_frames(txns, min_days=5)["an"]
        is not frames["an"]
    )
    # value parity vs a fresh, memo-free assembly of the same chain
    daily = history.store_daily_cents(txns)
    fresh = insights.recommendations_from(
        insights.classify_anomalies_from_daily(daily)
    )
    got = {tuple(r) for r in frames["recs"].collect()}
    want = {tuple(r) for r in fresh.collect()}
    assert got == want and len(got) > 0
    # plan invariance: the memoized frame IS the per-call assembly —
    # same analyzed plan (persist markers do not alter it), so the
    # memo is invisible to the verify window
    assert (
        frames["recs"]._jdf.queryExecution().analyzed().semanticHash()
        == fresh._jdf.queryExecution().analyzed().semanticHash()
    )


def test_table_loaders_memoized_per_path(spark):
    """r14: the testdata loaders hand back ONE constructed frame per
    (application, directory[, table]) — repeat calls skip the parquet
    listing/schema/mapping assembly — and distinct directories never
    share an entry."""
    txns = tables.transactions(spark, SF_DIR)
    assert tables.transactions(spark, SF_DIR) is txns
    assert tables.transactions(spark, "/root/testdata/sf0.01") is not txns
    docs = tables.load(spark, SF_DIR, "documents")
    assert tables.load(spark, SF_DIR, "documents") is docs
    assert tables.load(spark, SF_DIR, "embeddings") is not docs


def test_manifest_counts_match_real_datasets(spark):
    """x6's row counts come from shared persisted sources (the daily
    MV, the anomaly set, the shared rank rows) — each a row-preserving
    step away from its dataset plan. This pins the equality against
    the REAL dataset frames, so a restructure that breaks
    row-preservation fails here before it can drift the manifest."""
    txns = tables.transactions(spark, SF_DIR)
    manifest = {
        r["dataset"]: (r["row_count"], r["column_count"])
        for r in export.export_manifest(txns, R_START, R_END).collect()
    }
    ds = export.export_datasets(txns, R_START, R_END)
    assert set(manifest) == set(ds)
    for name, df in ds.items():
        assert manifest[name] == (df.count(), len(df.columns)), name

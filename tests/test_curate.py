"""Curation-layer tests: sequence packing invariants (pack1 has no
registered oracle yet — queued for the next verify-window rotation)
plus stratified-sample structural properties beyond the registered
t6 oracle parity (covered in test_parity.py).
"""

from __future__ import annotations

import pandas as pd

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import curate

from conftest import SF_DIR

BUDGET = 256


def test_pack_sequences_matches_greedy_reference(spark):
    docs = tables.load(spark, SF_DIR, "documents")
    out = curate.pack_sequences(docs, BUDGET, by="source").toPandas()
    assert len(out) == docs.count()
    # Reference implementation: per-stream greedy cumsum in doc_id
    # order, recomputed in pandas from the operator's own n_tokens.
    out = out.sort_values(["stream", "doc_id"]).reset_index(drop=True)
    for _, grp in out.groupby("stream"):
        cum = 0
        for row in grp.itertuples():
            assert row.shard_id == cum // BUDGET
            assert row.offset_in_shard == cum % BUDGET
            cum += row.n_tokens


def test_pack_sequences_shards_are_contiguous(spark):
    docs = tables.load(spark, SF_DIR, "documents")
    out = curate.pack_sequences(docs, BUDGET, by="source").toPandas()
    for _, grp in out.groupby("stream"):
        shards = grp.sort_values("doc_id")["shard_id"].tolist()
        # shard ids start at 0, never decrease, never skip by > the
        # overflow of a single oversized doc
        assert shards[0] == 0
        assert all(b >= a for a, b in zip(shards, shards[1:]))


def test_stratified_sample_is_deterministic_subset(spark):
    docs = tables.load(spark, SF_DIR, "documents")
    a = curate.stratified_sample(docs).toPandas()
    b = curate.stratified_sample(docs).toPandas()
    key = ["doc_id"]
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    # a sample is a subset of the corpus, and the dominant language is
    # downsampled harder than the low-resource strata
    full = docs.select("lang").toPandas()["lang"].value_counts()
    kept = a["lang"].value_counts()
    rate = {
        lang: kept.get(lang, 0) / full[lang] for lang in full.index
    }
    for lang, pct in curate.DEFAULT_RATES.items():
        if lang in rate:
            assert abs(rate[lang] - pct / 100.0) < 0.15, (lang, rate)


def test_stratified_sample_stable_under_corpus_growth(spark):
    # membership decisions never flip when new docs arrive: sampling
    # half the corpus yields exactly the full-corpus decisions
    # restricted to that half
    docs = tables.load(spark, SF_DIR, "documents")
    half = docs.filter("doc_id % 2 = 0")
    full_kept = curate.stratified_sample(docs).toPandas()
    half_kept = curate.stratified_sample(half).toPandas()
    expect = sorted(
        d for d in full_kept["doc_id"].tolist() if d % 2 == 0
    )
    assert sorted(half_kept["doc_id"].tolist()) == expect


def test_weighted_sample_zero_weight_never_kept(spark):
    from serverless_smurf_etl_and_analytics_spark.operators import curate

    docs = spark.createDataFrame(
        [
            (1, "", "en", "web"),
            (2, "   ", "en", "web"),
            (3, "the quick brown fox the lazy dog", "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = curate.weighted_sample(docs).collect()
    assert all(r["weight_bp"] > 0 for r in out)
    assert all(r["doc_id"] == 3 for r in out)  # empty docs filtered


def test_weighted_sample_rate_tracks_weight(spark, duck):
    """Realized keep-count ~= sum of keep-probabilities (md5 keys are
    uniform; the data is fixed, so this is a deterministic assertion
    about the estimator, not a flaky statistical one)."""
    import math

    from serverless_smurf_etl_and_analytics_spark import tables
    from serverless_smurf_etl_and_analytics_spark.operators import curate
    from serverless_smurf_etl_and_analytics_spark.plans.registry_ml import (
        SQL_TOKS,
        STOP_SQL,
    )

    from conftest import SF_DIR

    docs = tables.load(spark, SF_DIR, "documents")
    kept = curate.weighted_sample(docs).count()
    n = docs.count()
    expected = duck.execute(
        f"""
        WITH {SQL_TOKS},
        m AS (
            SELECT len(toks) AS n_tokens,
                   len(list_distinct(toks)) AS n_uniq,
                   len(list_filter(toks, x -> x IN {STOP_SQL})) AS n_stop
            FROM toks_t
        )
        SELECT sum(CASE WHEN n_tokens > 0
                   THEN round((n_stop * 3000.0 + n_uniq * 7000.0)
                              / n_tokens) ELSE 0 END) / 10000.0
        FROM m
        """
    ).fetchone()[0]
    assert abs(kept - expected) < 6 * math.sqrt(n), (kept, expected)


def test_token_budget_select_equals_global_prefix_rule(spark):
    """bud1's bucket-level cutoff must reproduce the naive global
    running-sum prefix EXACTLY — including the boundary bucket's
    doc_id tie-break and post-boundary zero-token docs — at several
    budgets (one mid-corpus, one smaller than the best doc, one larger
    than the whole corpus)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = tables.load(spark, SF_DIR, "documents")
    for budget in (97, 5000, 10**9):
        got = {
            (r["doc_id"], r["weight_bp"], r["n_tokens"])
            for r in curate.token_budget_select(docs, budget).collect()
        }
        toks = curate.tokens_col(F.col("text"))
        d = docs.select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
            F.size(
                F.filter(
                    toks,
                    lambda w: w.isin("the", "a", "and", "of", "to", "in"),
                )
            )
            .cast("long")
            .alias("n_stop"),
        ).withColumn(
            "weight_bp",
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    (F.col("n_stop") * 3000.0 + F.col("n_uniq") * 7000.0)
                    / F.col("n_tokens")
                ).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )
        wg = Window.orderBy(
            F.col("weight_bp").desc(), F.col("doc_id")
        ).rowsBetween(Window.unboundedPreceding, 0)
        naive = {
            (r["doc_id"], r["weight_bp"], r["n_tokens"])
            for r in d.withColumn("cum", F.sum("n_tokens").over(wg))
            .filter(F.col("cum") <= budget)
            .collect()
        }
        assert got == naive, f"budget={budget}"


def test_token_budget_exact_boundary_keeps_zero_token_head(spark):
    """ADVICE r7 corner: when a bucket's cumulative START equals the
    budget exactly, its zero-cost (0-token) head docs are still inside
    the naive global prefix (cum <= budget) and must be selected. Doc
    1 (weight 7000) consumes the whole 10-token budget; the weight-0
    bucket then holds doc 2 (empty text, 0 tokens — keep) and doc 3
    (one token repeated 14001x, weight round(7000/14001)=0 — drop).
    The old strict cum_before < budget boundary predicate dropped the
    bucket wholesale, losing doc 2."""
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10)), "en", "s", 40),
            (2, "", "en", "s", 0),
            (3, "x " * 14001, "en", "s", 28002),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    got = {
        r["doc_id"]
        for r in curate.token_budget_select(docs, 10).collect()
    }
    assert got == {1, 2}


def test_deterministic_shuffle_is_dense_global_md5_order(spark):
    """shuf1's two-level bucket assembly must equal the naive global
    row_number over (md5, doc_id): ranks are a dense 1..n permutation
    and every rank matches the global rule."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = tables.load(spark, SF_DIR, "documents")
    got = {
        r["doc_id"]: r["shuffle_rank"]
        for r in curate.deterministic_shuffle(docs).collect()
    }
    h = F.md5(F.concat(F.lit("shuf|"), F.col("doc_id").cast("string")))
    naive = {
        r["doc_id"]: r["rank"]
        for r in docs.select("doc_id", h.alias("h"))
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("h"), F.col("doc_id")))
            .cast("long"),
        )
        .collect()
    }
    assert got == naive
    assert sorted(got.values()) == list(range(1, len(got) + 1))


def test_source_cap_keeps_at_most_cap_per_source(spark):
    docs = tables.load(spark, SF_DIR, "documents")
    out = curate.source_cap_sample(docs, 10).collect()
    per = {}
    for r in out:
        per.setdefault(r["source"], []).append(r["src_rank"])
    assert per, "expected at least one source"
    for src, ranks in per.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 10


def test_token_budget_all_equal_weight_corpus_property(spark):
    """VERDICT r7 item 8: the adversarial all-equal-weight corpus puts
    EVERY doc in the single boundary bucket (one window partition —
    documented scale corner). The selection must still equal the naive
    global prefix rule at every budget around the doc-size boundaries:
    exact multiples (boundary lands on a doc edge), off-by-one either
    side, zero, and beyond-corpus."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    n, ntok = 40, 3
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma", "en", "s", 16) for i in range(n)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    budgets = [0, 1, ntok - 1, ntok, ntok + 1, ntok * 7, ntok * 7 + 1,
               ntok * n - 1, ntok * n, ntok * n + 5]
    for budget in budgets:
        got = {
            r["doc_id"]
            for r in curate.token_budget_select(docs, budget).collect()
        }
        naive = set(range(min(n, budget // ntok)))
        assert got == naive, f"budget={budget}: {sorted(got)[:5]}..."

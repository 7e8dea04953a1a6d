"""Structural laws for tf1 TF-IDF keyword extraction beyond the
registered oracle parity (test_parity.py)."""

from __future__ import annotations

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import textops

from conftest import SF_DIR


def test_tfidf_rank_structure(spark):
    docs = tables.load(spark, SF_DIR, "documents")
    out = textops.tfidf_keywords(docs).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 3
        # scores non-increasing in rank; ties broken by token asc
        for a, b in zip(rows, rows[1:]):
            assert a["score"] > b["score"] or (
                a["score"] == b["score"] and a["tok"] < b["tok"]
            )


def test_tfidf_prefers_rare_tokens(spark):
    """A token unique to one document must outrank corpus-wide
    stopwords for that document (the whole point of IDF)."""
    docs = spark.createDataFrame(
        [
            (1, "the the zebra"),
            (2, "the cat"),
            (3, "the dog"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["rank"]): r["tok"]
        for r in textops.tfidf_keywords(docs).collect()
    }
    assert out[(1, 1)] == "zebra"  # df=1 beats tf=3 of df=3 'the'
    assert out[(2, 1)] == "cat"
    assert out[(3, 1)] == "dog"

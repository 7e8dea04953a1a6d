"""Stream-stream interval join: the watermarked streaming run over
replayed event files must produce exactly the batch result of the same
plan (the operator is one function used both ways), including under
out-of-order file arrival."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.streaming import joins as sj

from conftest import SF_DIR


def _events(spark):
    return tables.load_events(spark, SF_DIR)


def _split(ev):
    return (
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )


@pytest.fixture(scope="module")
def batch_pairs(spark):
    clicks, purchases = _split(_events(spark))
    rows = sj.click_purchase_attribution_stream(clicks, purchases).collect()
    return sorted((r["click_id"], r["purchase_id"]) for r in rows)


def test_batch_join_nonempty_and_within_window(spark, batch_pairs):
    assert len(batch_pairs) > 0
    clicks, purchases = _split(_events(spark))
    out = sj.click_purchase_attribution_stream(clicks, purchases)
    assert out.filter(
        (F.col("lag_sec") < 0) | (F.col("lag_sec") >= 30 * 60)
    ).count() == 0


def test_stream_matches_batch(spark, tmp_path, batch_pairs):
    """Replay the events as two file streams split into out-of-order
    chunks; the streaming interval join must emit exactly the batch
    pair set (inner join, no late data beyond the watermark)."""
    ev = _events(spark)
    src = tmp_path / "ev_files"
    # 3 chunks, written newest-first so arrival order != event order
    chunks = [
        ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == i) for i in range(3)
    ]
    for i, ch in enumerate(reversed(chunks)):
        ch.coalesce(1).write.parquet(f"{src}/c{i}")
    schema = ev.schema
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    clicks, purchases = _split(stream)
    out = sj.click_purchase_attribution_stream(clicks, purchases)
    sink = tmp_path / "pairs"
    ckpt = tmp_path / "ckpt"
    q = (
        out.writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["click_id"], r["purchase_id"])
        for r in spark.read.parquet(str(sink)).collect()
    )
    assert got == batch_pairs

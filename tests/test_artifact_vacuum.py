"""vacuum_cache policy tests: age-based removal keys off LAST USE
(cache hits refresh mtime), size cap evicts oldest-first, stale tmp
leftovers go unconditionally, and a vacuumed entry self-heals on the
next find-or-build."""

from __future__ import annotations

import os
import time

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import (
    artifacts,
    dedup,
)

SF_DIR = "/root/testdata/sf0.001"


def _age(path, days):
    t = time.time() - days * 86400
    os.utime(path, (t, t))


def test_vacuum_age_size_and_tmp_policies(spark, tmp_path):
    docs = tables.load(spark, SF_DIR, "documents")
    root = str(tmp_path)
    dedup.shingle_rows(docs, 2, cache=root).count()
    dedup.shingle_rows(docs, 3, cache=root).count()
    entries = sorted(os.listdir(root))
    assert len(entries) == 2
    # stale tmp leftover: removed unconditionally past an hour
    tmp_leftover = os.path.join(root, entries[0] + ".tmp-deadbeef")
    os.makedirs(tmp_leftover)
    _age(tmp_leftover, 1)
    # age out entry 0; a recent HIT refreshes entry 1 (touch)
    _age(os.path.join(root, entries[0]), 30)
    dedup.shingle_rows(docs, 3, cache=root).count()  # hit -> touch
    removed = artifacts.vacuum_cache(root, max_age_days=14)
    left = sorted(os.listdir(root))
    assert os.path.join(root, entries[0]) in removed
    assert tmp_leftover in removed
    assert left == [entries[1]]
    # size cap: evict oldest-first down to the cap
    dedup.shingle_rows(docs, 2, cache=root).count()  # rebuild entry 0
    _age(os.path.join(root, entries[0]), 2)
    removed = artifacts.vacuum_cache(
        root, max_age_days=14, max_total_bytes=1
    )
    assert len(os.listdir(root)) <= 1
    # self-heal: next find-or-build rebuilds identical content
    again = {
        tuple(r)
        for r in dedup.shingle_rows(docs, 2, cache=root).collect()
    }
    assert again == {
        tuple(r) for r in dedup._shingle_rows_inline(docs, 2).collect()
    }


def test_size_cap_grace_window_spares_recent_entries(spark, tmp_path):
    """ADVICE r9: the size-cap pass must not evict an entry used
    within min_age_seconds — a concurrent session's lazy plan likely
    still references it (touch happens at plan time, execution can
    come much later)."""
    docs = tables.load(spark, SF_DIR, "documents")
    root = str(tmp_path)
    dedup.shingle_rows(docs, 2, cache=root).count()
    dedup.shingle_rows(docs, 3, cache=root).count()
    old, recent = sorted(
        os.listdir(root),
        key=lambda n: os.path.getmtime(os.path.join(root, n)),
    )
    _age(os.path.join(root, old), 2)
    removed = artifacts.vacuum_cache(
        root, max_age_days=14, max_total_bytes=1
    )
    # over budget either way, but only the aged entry is evictable
    assert os.path.join(root, old) in removed
    assert sorted(os.listdir(root)) == [recent]
    # with the grace disabled the recent entry goes too
    removed = artifacts.vacuum_cache(
        root, max_age_days=14, max_total_bytes=1, min_age_seconds=0.0
    )
    assert os.listdir(root) == []

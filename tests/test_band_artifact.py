"""Laws for the persisted LSH band artifact (VERDICT r7 item 2): the
across-session form of the sim2/d7/d9 candidate pipeline's most
expensive stage. The artifact must be (a) mergeable shard-by-shard,
(b) a byte-identical stand-in for the inline projection at ANY config
its stored width covers, and (c) staleness-proof (fingerprint-keyed:
a changed corpus can never silently reuse old bits).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return tables.load(spark, SF_DIR, "embeddings")


def _rows(df):
    return {
        (r["vec_id"], r["n2"], r["bits"]) for r in df.collect()
    }


def test_band_artifact_merge_law(spark, emb, tmp_path):
    """band_bits(A ∪ B) == band_bits(A) ∪ band_bits(B): materialize
    shard A, append shard B, and the loaded artifact must equal the
    one-shot build row-for-row — the property that keeps 100 TB
    maintenance proportional to the delta."""
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    path = similarity.materialize_band_artifact(
        a, root=str(tmp_path), n_planes=64
    )
    similarity.append_band_artifact(b, path)
    merged = _rows(similarity.load_band_bits(spark, path))
    direct = _rows(similarity.band_bits(emb, 64))
    assert merged == direct and len(merged) > 0


def test_cached_pairs_equal_inline_pairs(spark, emb, tmp_path):
    """The cached plan is an exact stand-in: cosine_neardup_pairs via
    the artifact cache yields byte-identical pairs to the inline
    (recompute-every-session) form."""
    cached = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in similarity.cosine_neardup_pairs(
            emb, 0.3, band_cache=str(tmp_path)
        ).collect()
    }
    inline = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in similarity.cosine_neardup_pairs(
            emb, 0.3, band_cache=None
        ).collect()
    }
    assert cached == inline and len(cached) > 0


def test_prefix_slice_covers_narrower_configs(spark, emb, tmp_path):
    """One stored bit string serves every config its width covers:
    slicing (8, 8) buckets out of a 96-plane artifact equals the
    inline band_table at (8, 8) — the md5 plane stream is
    prefix-stable, so sim3's single band and sim2's adaptive bands
    read the SAME artifact."""
    path = similarity.materialize_band_artifact(
        emb, root=str(tmp_path), n_planes=96
    )
    sliced = similarity._explode_bands(
        similarity.load_band_bits(spark, path), 8, 8
    )
    inline = similarity.band_table(emb, 8, 8)
    cols = ["vec_id", "band_idx", "bucket"]
    assert {tuple(r) for r in sliced.select(*cols).collect()} == {
        tuple(r) for r in inline.select(*cols).collect()
    }
    sliced.unpersist()
    inline.unpersist()


def test_cache_hit_reuses_and_stale_corpus_misses(spark, emb, tmp_path):
    """Second contact with the same corpus reuses the one artifact
    (no rebuild); ANY content change — here one dropped vector —
    changes the fingerprint and builds a fresh artifact rather than
    silently reusing stale bits."""
    root = str(tmp_path)
    similarity.cached_band_bits(emb, 8, 8, root=root).count()
    assert len(os.listdir(root)) == 1
    first = os.listdir(root)[0]
    similarity.cached_band_bits(emb, 8, 8, root=root).count()
    assert os.listdir(root) == [first]
    # wider-config request treated as a miss only when not covered:
    # the default build width (>= 64 planes) covers (1, 8) too
    similarity.cached_band_bits(emb, 1, 8, root=root).count()
    assert os.listdir(root) == [first]
    shrunk = emb.filter(F.col("vec_id") != 0)
    similarity.cached_band_bits(shrunk, 8, 8, root=root).count()
    assert len(os.listdir(root)) == 2
    # and the stale artifact's rows were not mixed in
    n_art = similarity.cached_band_bits(shrunk, 8, 8, root=root).count()
    assert n_art == shrunk.count()


def test_artifact_dirname_encodes_width(tmp_path, emb):
    path = similarity.materialize_band_artifact(
        emb, root=str(tmp_path), n_planes=64
    )
    assert similarity.artifact_n_planes(path) == 64
    assert glob.glob(os.path.join(str(tmp_path), "band_v1_n*_h*_p64"))


def test_gather_and_wide_verify_tiers_identical(spark, emb, monkeypatch):
    """The two verification tiers of cosine_neardup_pairs are exact
    stand-ins for each other: forcing the broadcast-gather tier (by
    dropping its corpus-size floor to 0) yields byte-identical pairs
    to the default wide (embedding-riding) join at this scale — both
    are the same int64 fixed-point dot, only the transport differs."""
    wide = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in similarity.cosine_neardup_pairs(
            emb, 0.3, band_cache=None
        ).collect()
    }
    monkeypatch.setattr(similarity, "_GATHER_VERIFY_MIN", 0)
    gathered = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in similarity.cosine_neardup_pairs(
            emb, 0.3, band_cache=None
        ).collect()
    }
    assert gathered == wide and len(gathered) > 0


def test_bucket_tier_identical_to_wide_verify(spark, emb, monkeypatch):
    """The r10 bucket tier (minimal exploded rows + distinct dedup +
    broadcast gather — the >1M-vector path whose shuffle stays ~40 B
    per row) yields byte-identical pairs to the riding join: the
    first-match predicate and the distinct are two implementations of
    exactly-once over the same collision set, and the int32-matrix
    gather's einsum accumulates in int64, so every dot is the same
    exact integer."""
    wide = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in similarity.cosine_neardup_pairs(
            emb, 0.3, band_cache=None
        ).collect()
    }
    # force the bucket tier: any n > 0 crosses a zero upper gate
    monkeypatch.setattr(similarity, "_GATHER_VERIFY_MAX", 0)
    bucketed = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in similarity.cosine_neardup_pairs(
            emb, 0.3, band_cache=None
        ).collect()
    }
    assert bucketed == wide and len(bucketed) > 0


def test_sharded_neardup_equals_unsharded(spark, emb, tmp_path):
    """Band-subset sharding (the bounded-peak-spill escape hatch for
    >10M-vector corpora) is exact: the union of per-shard staged
    pairs, distinct-ed, equals the single-pass result — a pair
    matching bands in two shards stages twice with an identical
    cosine, and a pair matching no shard's bands matches no band at
    all."""
    single = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in similarity.cosine_neardup_pairs(
            emb, 0.3, band_cache=None
        ).collect()
    }
    sharded = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in similarity.cosine_neardup_pairs_sharded(
            emb, 0.3, n_shards=3, band_cache=None,
            scratch_dir=str(tmp_path / "shards"),
        ).collect()
    }
    assert sharded == single and len(sharded) > 0
    # the auto-sized path (default since r11) is the same law: the
    # heuristic only picks HOW MANY strided subsets, never which
    # pairs survive
    auto = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in similarity.cosine_neardup_pairs_sharded(
            emb, 0.3, band_cache=None,
            scratch_dir=str(tmp_path / "shards_auto"),
        ).collect()
    }
    assert auto == single


def test_auto_shard_count_model():
    """The spill-model heuristic (VERDICT r10 task 4): reproduces the
    manually-chosen 4 shards of the 2M rehearsal, collapses to one
    shard on small corpora, never exceeds the band count (a shard
    must own >= 1 band), and scales with the corpus at the default
    budget."""
    n_bands_2m = similarity.adaptive_band_config(2_000_000)[0]
    assert similarity.auto_shard_count(2_000_000, n_bands_2m) == 4
    assert similarity.auto_shard_count(2_000) == 1
    assert similarity.auto_shard_count(200_000) == 1
    n10, b10 = 10_000_000, similarity.adaptive_band_config(10_000_000)[0]
    s10 = similarity.auto_shard_count(n10, b10)
    assert 4 < s10 <= b10
    # explicit budget: doubling the budget halves (ceil) the count
    assert similarity.auto_shard_count(
        2_000_000, n_bands_2m, budget_bytes=12_000_000_000
    ) == 2


def test_mmap_transport_identical_to_broadcast(
    spark, emb, tmp_path, monkeypatch
):
    """The memory-mapped matrix transport (one page-cached copy per
    node, for corpora whose matrix exceeds the broadcast budget) is an
    exact stand-in for the broadcast: forcing it (mmap threshold 0 +
    bucket tier) yields byte-identical pairs, and the artifact lands
    under the fingerprint-keyed gmat dirname."""
    import glob
    import os

    monkeypatch.setenv("SMURF_ARTIFACT_CACHE", str(tmp_path / "cache"))
    wide = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in similarity.cosine_neardup_pairs(
            emb, 0.3, band_cache=None
        ).collect()
    }
    monkeypatch.setattr(similarity, "_GATHER_VERIFY_MAX", 0)
    monkeypatch.setattr(similarity, "_GATHER_MMAP_BYTES", 0)
    mmapped = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in similarity.cosine_neardup_pairs(
            emb, 0.3, band_cache=None
        ).collect()
    }
    assert mmapped == wide and len(mmapped) > 0
    assert glob.glob(
        os.path.join(str(tmp_path / "cache"), "gmat_v1_n*_h*")
    )
    # the sharded form rides the same transport choice
    sharded = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in similarity.cosine_neardup_pairs_sharded(
            emb, 0.3, n_shards=2, band_cache=None,
            scratch_dir=str(tmp_path / "shards"),
        ).collect()
    }
    assert sharded == wide


def test_fixed_matrix_narrows_to_int32_only_when_exact():
    """ADVICE r10: the r10 int32 narrowing of the gather matrix must
    be GUARDED — a fixed-point value past int32 falls back to int64
    instead of wrapping silently. Boundary values survive exactly."""
    import numpy as np

    nm = similarity._narrowest_fixed_matrix
    m = nm(np.array([[0.4, -0.6], [float(2**31 - 2), 0.0]]))
    assert m.dtype == np.int32
    assert int(m[1, 0]) == 2**31 - 2
    big = nm(np.array([[float(2**31), -0.6]]))
    assert big.dtype == np.int64 and int(big[0, 0]) == 2**31
    neg = nm(np.array([[-float(2**31) - 10.0]]))
    assert neg.dtype == np.int64 and int(neg[0, 0]) == -(2**31) - 10
    assert nm(np.zeros((0, 4))).dtype == np.int32


def test_gather_dots_exact_for_out_of_unit_range_embeddings(spark):
    """End-to-end: a component at |v| = 250 (> 2^31/SCALE ~ 214.7,
    which the unguarded int32 cast would wrap) still yields the exact
    integer dot through the broadcast gather transport."""
    bt = spark.createDataFrame(
        [
            (1, [250.0, 0.5]),
            (2, [1.0, -0.25]),
        ],
        "vec_id long, embedding array<double>",
    ).withColumn(
        "n2",
        F.aggregate(
            F.transform(
                "embedding",
                lambda x: F.round(x * similarity.SCALE).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x * x,
        ),
    )
    cand = spark.createDataFrame(
        [(1, 2)], "vec_a long, vec_b long"
    )
    [row] = similarity._gather_dots(cand, bt).collect()
    # iv_1 = [2_500_000_000, 5_000_000], iv_2 = [10_000_000, -2_500_000]
    assert row["dot"] == (
        2_500_000_000 * 10_000_000 + 5_000_000 * (-2_500_000)
    )


def test_matrix_artifact_returns_none_when_rename_fails(
    spark, emb, tmp_path, monkeypatch
):
    """ADVICE r10: a rename failure that is NOT a lost publish race
    (EACCES/EXDEV/read-only root) must return None — falling back to
    the broadcast transport — never a path executors cannot np.load."""
    import os as _os

    root = str(tmp_path / "gmroot")
    real_rename = _os.rename

    def refuse(src, dst, *a, **kw):
        if "gmat_" in str(dst):
            raise OSError("EXDEV: cross-device link")
        return real_rename(src, dst, *a, **kw)

    monkeypatch.setattr(_os, "rename", refuse)
    bt = similarity.fixed_point(emb).join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    assert (
        similarity._matrix_npy_artifact(bt, fingerprint=(5, 99), root=root)
        is None
    )
    # and the transport degrades to broadcast instead of erroring
    monkeypatch.setattr(similarity, "_GATHER_MMAP_BYTES", 0)
    kind, _ = similarity._gather_transport(bt, 5, (5, 99))
    assert kind == "bc"


def test_chunked_verify_identical_to_unchunked(spark, emb, monkeypatch):
    """r12: the fixed-size gather slices inside the verify kernel
    (the worker-memory bound added after the emb6m OOM) are a pure
    batching change — forcing a tiny chunk yields byte-identical
    pairs to the full-batch kernel."""
    base = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in similarity.cosine_neardup_pairs(
            emb, 0.3, band_cache=None
        ).collect()
    }
    monkeypatch.setattr(similarity, "_GATHER_CHUNK_ROWS", 3)
    chunked = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in similarity.cosine_neardup_pairs(
            emb, 0.3, band_cache=None
        ).collect()
    }
    assert chunked == base and len(chunked) > 0


def test_mmap_sorted_gather_identical(spark, emb, tmp_path, monkeypatch):
    """r14 (emb10m attempt-8 postmortem): the mmap tier's b-sorted
    gather and the row-uniform range partitioning of the candidate
    side are pure access-order changes — forcing the mmap transport
    with a tiny chunk and a small task cap yields byte-identical
    pairs to the broadcast kernel."""
    monkeypatch.setenv("SMURF_ARTIFACT_CACHE", str(tmp_path / "cache"))
    base = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in similarity.cosine_neardup_pairs(
            emb, 0.3, band_cache=None
        ).collect()
    }
    monkeypatch.setattr(similarity, "_GATHER_VERIFY_MAX", 0)
    monkeypatch.setattr(similarity, "_GATHER_MMAP_BYTES", 0)
    monkeypatch.setattr(similarity, "_GATHER_CHUNK_ROWS", 3)
    monkeypatch.setenv("SMURF_GATHER_MMAP_TASKS", "3")
    forced = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in similarity.cosine_neardup_pairs(
            emb, 0.3, band_cache=None
        ).collect()
    }
    assert forced == base and len(forced) > 0


def test_fixed_matrix_raises_on_possible_dot_overflow():
    """ADVICE r11: int32-representable components can still overflow
    the int64 dot accumulator (64 dims of |fixed| ~ 2e9 give dots
    ~2.6e20 > 2^63). The narrowing guard must RAISE on rows whose
    norm^2 exceeds int64 — never return silently-wrong cosines —
    while rows inside the bound keep working."""
    import numpy as np

    nm = similarity._narrowest_fixed_matrix
    # |v| = 200 -> |fixed| = 2e9: int32-clean, dot-unsafe at dim 64
    with pytest.raises(ValueError, match="overflow"):
        nm(np.full((1, 64), 200.0 * similarity.SCALE))
    # |v| = 30 at dim 64: norm^2 = 64 * 9e16 = 5.76e18 < int64max
    safe = nm(np.full((2, 64), 30.0 * similarity.SCALE))
    assert safe.dtype == np.int32 and int(safe[0, 0]) == 300_000_000


def test_part_sort_key_numeric_order():
    """ADVICE r11: part files must merge in NUMERIC part order —
    lexicographic order breaks past 99,999 parts."""
    names = [
        "/x/part-100000-uuid.snappy.parquet",
        "/x/part-00009-uuid.snappy.parquet",
        "/x/part-99999-uuid.snappy.parquet",
        "/x/part-00010-uuid.snappy.parquet",
    ]
    assert [
        similarity._part_sort_key(n)[0] for n in sorted(
            names, key=similarity._part_sort_key
        )
    ] == [9, 10, 99999, 100000]
    # lexicographic is provably wrong on the same list
    assert sorted(names)[-1] != sorted(
        names, key=similarity._part_sort_key
    )[-1]


def test_auto_shard_count_env_validation(monkeypatch):
    """ADVICE r11: a malformed or zero SMURF_NEARDUP_SPILL_BUDGET
    degrades to the default instead of raising at plan time."""
    n_bands = similarity.adaptive_band_config(2_000_000)[0]
    want = similarity.auto_shard_count(2_000_000, n_bands)
    monkeypatch.setenv("SMURF_NEARDUP_SPILL_BUDGET", "6e9")
    assert similarity.auto_shard_count(2_000_000, n_bands) == want
    monkeypatch.setenv("SMURF_NEARDUP_SPILL_BUDGET", "")
    assert similarity.auto_shard_count(2_000_000, n_bands) == want
    # zero clamps to >= 1 byte: maximal sharding, never a crash
    monkeypatch.setenv("SMURF_NEARDUP_SPILL_BUDGET", "0")
    assert similarity.auto_shard_count(2_000_000, n_bands) == n_bands
    monkeypatch.setenv("SMURF_NEARDUP_SPILL_BUDGET", "12000000000")
    assert similarity.auto_shard_count(2_000_000, n_bands) == 2


def test_gather_mmap_tasks_env_validation(monkeypatch):
    """The mmap-tier verify concurrency cap is env-tunable and
    malformed values degrade to the default."""
    monkeypatch.delenv("SMURF_GATHER_MMAP_TASKS", raising=False)
    assert similarity._gather_mmap_tasks() == similarity._GATHER_MMAP_TASKS
    monkeypatch.setenv("SMURF_GATHER_MMAP_TASKS", "4")
    assert similarity._gather_mmap_tasks() == 4
    monkeypatch.setenv("SMURF_GATHER_MMAP_TASKS", "0")
    assert similarity._gather_mmap_tasks() == 1
    monkeypatch.setenv("SMURF_GATHER_MMAP_TASKS", "lots")
    assert similarity._gather_mmap_tasks() == similarity._GATHER_MMAP_TASKS


def test_gather_transport_probes_int64_window(
    spark, emb, tmp_path, monkeypatch
):
    """ADVICE r11: the transport gate assumes the int32 narrowing; in
    the window where an int64 widening would flip the decision, it
    must PROBE the corpus abs-max — unit-range corpora keep the
    broadcast, out-of-range corpora go to the mmap artifact (whose
    real footprint the broadcast estimate would undercount 2x)."""
    import numpy as np

    monkeypatch.setenv("SMURF_ARTIFACT_CACHE", str(tmp_path / "cache"))
    n = emb.count()
    # gate inside (n*(DIM*4+16), n*(DIM*8+16)): decision depends on
    # the narrowing, so the probe must run
    monkeypatch.setattr(
        similarity, "_GATHER_MMAP_BYTES", n * (similarity.DIM * 4 + 16) + 1
    )
    bt_unit = similarity.fixed_point(emb).join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    kind, _ = similarity._gather_transport(bt_unit, n, (n, 101))
    assert kind == "bc"
    # same window, one component at |v|=250 (> 2^31/SCALE): widens to
    # int64 -> real bytes past the gate -> mmap, and the artifact is
    # stored wide
    wide = spark.createDataFrame(
        [(1, [250.0, 0.5]), (2, [1.0, -0.25]), (3, [0.1, 0.9])],
        "vec_id long, embedding array<double>",
    ).withColumn(
        "n2",
        F.aggregate(
            F.transform(
                "embedding",
                lambda x: F.round(x * similarity.SCALE).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x * x,
        ),
    )
    monkeypatch.setattr(
        similarity, "_GATHER_MMAP_BYTES", 3 * (similarity.DIM * 4 + 16) + 1
    )
    kind, path = similarity._gather_transport(wide, 3, (3, 102))
    assert kind == "mmap"
    assert np.load(
        os.path.join(path, "mat.npy"), mmap_mode="r"
    ).dtype == np.int64

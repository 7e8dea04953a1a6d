"""Algebraic-guarantee tests for the dedup/similarity layer: the
claims the scale designs rest on, checked against brute force on the
real corpus, plus MEASURED recall on planted near-duplicates vs the
analytic bounds each ANN docstring derives (SURVEY §5 — the test suite
the reference never had).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import (
    dedup,
    similarity,
)

SF_DIR = "/root/testdata/sf0.001"
TWIN_OFF = 100_000  # planted twin ids = original id + TWIN_OFF


@pytest.fixture(scope="module")
def docs(spark):
    return tables.load(spark, SF_DIR, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    return tables.load(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def planted_emb(spark, emb):
    """Corpus + 80 perturbed twins of vectors 0..79 at controlled
    cosines spread over [0.90, 0.985] — known-ground-truth near-dups
    for measuring ANN recall. Returns (DataFrame, {orig_id: cosine}).

    Construction: twin = c*v_hat + sqrt(1-c^2)*u_hat (u orthogonal to
    v), rescaled to |v| — exact target cosine up to float32/fixed-point
    rounding (<1e-6), so the analytic per-pair collision probabilities
    in the operator docstrings apply directly."""
    n_plant = 80
    rows = sorted(
        emb.filter(F.col("vec_id") < n_plant).collect(),
        key=lambda r: r["vec_id"],
    )
    rng = np.random.default_rng(7)
    targets: dict[int, float] = {}
    twins = []
    for i, r in enumerate(rows):
        c = 0.90 + 0.085 * i / (n_plant - 1)
        v = np.asarray(r["embedding"], dtype=np.float64)
        vhat = v / np.linalg.norm(v)
        g = rng.standard_normal(v.shape)
        u = g - (g @ vhat) * vhat
        uhat = u / np.linalg.norm(u)
        tw = (c * vhat + math.sqrt(1.0 - c * c) * uhat) * np.linalg.norm(v)
        targets[r["vec_id"]] = c
        twins.append(
            (
                r["vec_id"] + TWIN_OFF,
                [float(x) for x in tw.astype(np.float32)],
                r["label"],
            )
        )
    planted = emb.unionByName(
        spark.createDataFrame(twins, schema=emb.schema)
    )
    return planted, targets


@pytest.mark.parametrize("bits", [32, 64, 128])
def test_pigeonhole_banding_equals_allpairs(spark, docs, bits):
    """The d6 claim: 7-band pigeonhole blocking finds EXACTLY the
    all-pairs hamming<=6 set — guaranteed recall, zero false
    positives after verification. At 64 bits this also proves the
    two-half long assembly (signatures past 2^63 wrap negative;
    shift+mask/xor/bit_count stay bit-pattern-correct); at 128 bits
    it proves the word-array tier (_simhash_neardup_pairs_wide) —
    the 64-bit answers are additionally pinned by the law that the
    banded result equals the brute-force filter at the SAME width,
    so widening d6's registered config cannot silently change what
    bits=64 callers get."""
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_neardup_pairs(docs, 6, bits).collect()
    }
    s = dedup.simhash(docs, bits)
    a, b = s.alias("a"), s.alias("b")
    pos = F.sequence(F.lit(1), F.lit(bits))
    hamming = F.size(
        F.filter(
            pos,
            lambda i: F.substring(F.col("a.simhash"), i, 1)
            != F.substring(F.col("b.simhash"), i, 1),
        )
    ).cast("long")
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= 6)
        .collect()
    }
    assert banded == brute
    assert len(banded) > 0


def test_exact_dedup_partitions_corpus(spark, docs):
    """d1: the dedup groups partition the corpus — copies sum to the
    doc count and each canonical id is the group minimum."""
    out = dedup.exact_dedup(docs)
    assert (
        out.agg(F.sum("copies")).collect()[0][0] == docs.count()
    )
    assert out.filter(F.col("copies") < 1).count() == 0


def test_minhash_neardup_is_subset_of_candidates(spark, docs):
    """d4 pairs come only from d3's banded candidates, and every
    reported jaccard is a valid [0,1] ratio >= the threshold."""
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(docs).collect()
    }
    near = dedup.minhash_neardup_pairs(docs, 0.5).collect()
    for r in near:
        assert (r["doc_a"], r["doc_b"]) in cand
        assert 0.5 <= r["jaccard"] <= 1.0
        assert r["shingles_common"] <= r["shingles_union"]


def test_lsh_neardup_has_perfect_precision(spark, emb):
    """sim2: every reported pair must appear in the exact all-pairs
    result with the SAME cosine (LSH trades recall, never
    precision — the verify step is exact)."""
    lsh = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in similarity.cosine_neardup_pairs(emb, 0.3).collect()
    }
    brute = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in similarity.cosine_neardup_allpairs(emb, 0.3).collect()
    }
    assert lsh, "LSH near-dup found nothing at sf0.001"
    for pair, cos in lsh.items():
        assert brute[pair] == cos
    # recall floor: this corpus's qualifying pairs all sit at cosine
    # 0.3-0.5 — sign-LSH's weakest regime (per-band collision p^8 with
    # p ~ 0.6 -> ~14% with 8 bands). The theoretical ~0.93 recall at
    # cosine >= 0.9 has no exemplar pairs here; the floor below guards
    # against config regressions, not the ANN trade itself.
    recall = len(lsh) / len(brute)
    assert recall >= 0.08, f"recall collapsed: {recall:.3f}"


def test_ivf_topk_matches_bruteforce_on_probed_lists(spark, emb):
    """sim4: IVF results are exact within the probed candidate set —
    each reported cosine equals the brute-force cosine for that pair,
    and ranks are consistent (descending cosine per query)."""
    out = similarity.ivf_topk(emb, 3, 16, 16, 2).collect()
    assert out
    brute = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in similarity.cosine_topk(emb, 1000, 16).collect()
    }
    by_q: dict = {}
    for r in out:
        assert brute[(r["query_id"], r["neighbor_id"])] == r["cosine"]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine"]))
    for ranks in by_q.values():
        ordered = sorted(ranks)
        assert all(
            ordered[i][1] >= ordered[i + 1][1]
            for i in range(len(ordered) - 1)
        )


# ---------------------------------------------------------------------------
# Measured ANN recall on PLANTED near-duplicates vs the analytic bounds
# (VERDICT r2 item 2: the docstrings derive recall; these tests measure
# it). Outcomes are deterministic (fixed md5 planes, fixed rng seed),
# so the bounds double as regression guards on the hashing config.


def _signlsh_pair_recall(c: float, n_bands: int = 8, planes: int = 8) -> float:
    """Sign-LSH OR-amplified find probability for a pair at cosine c
    (similarity.cosine_neardup_pairs docstring)."""
    p = 1.0 - math.acos(c) / math.pi
    return 1.0 - (1.0 - p**planes) ** n_bands


def test_sim2_measured_recall_on_planted_neardups(spark, planted_emb):
    """sim2: measured recall over 80 planted cosine-0.90..0.985 twins
    must sit in a +-6-sigma window around the analytic expectation
    (~0.96 mean find probability for this cosine spread)."""
    planted, targets = planted_emb
    found = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.cosine_neardup_pairs(planted, 0.3).collect()
    }
    hits = sum(
        1 for oid in targets if (oid, oid + TWIN_OFF) in found
    )
    recall = hits / len(targets)
    mean = sum(_signlsh_pair_recall(c) for c in targets.values()) / len(
        targets
    )
    sigma = math.sqrt(mean * (1.0 - mean) / len(targets))
    lo, hi = mean - 6 * sigma, min(1.0, mean + 6 * sigma)
    assert lo <= recall <= hi, (
        f"measured sim2 recall {recall:.3f} outside analytic window "
        f"[{lo:.3f}, {hi:.3f}] (mean {mean:.3f})"
    )


def test_sim3_measured_recall_on_planted_neardups(spark, planted_emb):
    """sim3 (single-band bucket top-k): a query's planted twin is its
    true top-1 neighbor (verified via the brute baseline); it is found
    iff the pair shares the one 8-plane bucket — analytic p^8 per pair
    (~0.45-0.59 for this cosine spread). Measured recall must sit in
    the analytic window; found twins must rank 1 with the exact brute
    cosine (precision is never traded)."""
    planted, targets = planted_emb
    qids = [q for q in sorted(targets) if q < 64]
    brute_top1 = {
        r["query_id"]: (r["neighbor_id"], r["cosine"])
        for r in similarity.cosine_topk(planted, 1, 64).collect()
    }
    for q in qids:  # ground truth: the twin IS the top-1 neighbor
        assert brute_top1[q][0] == q + TWIN_OFF
    out = similarity.lsh_topk(planted, 3, 64).collect()
    twin_rows = {
        r["query_id"]: r
        for r in out
        if r["neighbor_id"] == r["query_id"] + TWIN_OFF
    }
    for q, r in twin_rows.items():
        assert r["rank"] == 1
        assert r["cosine"] == brute_top1[q][1]
    probs = [
        (1.0 - math.acos(targets[q]) / math.pi) ** 8 for q in qids
    ]
    mean = sum(probs) / len(probs)
    sigma = math.sqrt(mean * (1.0 - mean) / len(qids))
    recall = len(twin_rows) / len(qids)
    lo, hi = mean - 6 * sigma, min(1.0, mean + 6 * sigma)
    assert lo <= recall <= hi, (
        f"measured sim3 recall {recall:.3f} outside analytic window "
        f"[{lo:.3f}, {hi:.3f}] (mean {mean:.3f})"
    )


def test_sim4_ivf_finds_planted_twins(spark, planted_emb):
    """sim4: a planted twin usually lands in the same inverted list as
    its query (both quantize to the query's nearest centroid), and the
    query's own list is always probed — so IVF finds it at rank 1.
    The residual misses are twins whose 0.90-cosine (~25 deg)
    perturbation crosses a Voronoi boundary into a list outside the
    query's nprobe=2 probes — the documented nprobe trade. Measured:
    0.906 on this corpus; floor set a flip below."""
    planted, targets = planted_emb
    qids = [q for q in sorted(targets) if q < 64]
    out = similarity.ivf_topk(planted, 3, 64, 16, 2).collect()
    twin_rows = {
        r["query_id"]: r
        for r in out
        if r["neighbor_id"] == r["query_id"] + TWIN_OFF
    }
    recall = len(twin_rows) / len(qids)
    assert recall >= 0.85, f"IVF planted-twin recall {recall:.3f} < 0.85"
    assert all(r["rank"] == 1 for r in twin_rows.values())


def test_d4_measured_recall_on_planted_jaccard_neardups(spark, docs):
    """d4: plant 60 prefix-truncated twins (bigram Jaccard ~0.85-0.9,
    exact value measured per pair via jaccard_verify), and check the
    measured MinHash-LSH find rate against the banding analytic
    1-(1-J^4)^2 — per-pair, using each pair's EXACT Jaccard."""
    n_plant = 60
    rows = sorted(
        docs.filter(F.col("doc_id") < n_plant).collect(),
        key=lambda r: r["doc_id"],
    )
    twins = []
    for r in rows:
        toks = r["text"].split()
        keep = max(3, int(len(toks) * 0.9))
        text = " ".join(toks[:keep])
        twins.append(
            (r["doc_id"] + TWIN_OFF, text, r["lang"], r["source"],
             len(text))
        )
    planted = docs.unionByName(
        docs.sparkSession.createDataFrame(twins, schema=docs.schema)
    )
    pair_rows = [(r["doc_id"], r["doc_id"] + TWIN_OFF) for r in rows]
    pairs = docs.sparkSession.createDataFrame(
        pair_rows, "doc_a long, doc_b long"
    )
    true_j = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_verify(planted, pairs).collect()
    }
    qualifying = {p: j for p, j in true_j.items() if j >= 0.5}
    assert len(qualifying) >= 40, "fixture drifted: too few J>=0.5 twins"
    found = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_neardup_pairs(planted, 0.5).collect()
    }
    hits = sum(1 for p in qualifying if p in found)
    recall = hits / len(qualifying)
    mean = sum(
        1.0 - (1.0 - j**4) ** 2 for j in qualifying.values()
    ) / len(qualifying)
    sigma = math.sqrt(mean * (1.0 - mean) / len(qualifying))
    lo, hi = mean - 6 * sigma, min(1.0, mean + 6 * sigma)
    assert lo <= recall <= hi, (
        f"measured d4 recall {recall:.3f} outside analytic window "
        f"[{lo:.3f}, {hi:.3f}] (mean {mean:.3f})"
    )


def test_adaptive_band_config_laws():
    """The sim2 auto-sizing is a pure function with three contracts:
    (a) floor: every driver-verified scale resolves to the oracle's
    hardcoded (8, 8); (b) recall: the analytic collision probability
    1-(1-p^w)^b stays >= the 0.93 target at cosine 0.9 for every
    corpus size; (c) linearity: expected candidates-per-vector
    b*n/2^w stays bounded (the fixed-width form's is unbounded)."""
    p = 1.0 - math.acos(0.9) / math.pi
    for n in (1, 20, 200, 2000, 4096):
        assert similarity.adaptive_band_config(n) == (8, 8)
    prev_bands, prev_planes = 0, 0
    for exp in range(4, 31):
        n = 2**exp
        b, w = similarity.adaptive_band_config(n)
        recall = 1.0 - (1.0 - p**w) ** b
        assert recall >= 0.93, (n, b, w, recall)
        # monotone non-decreasing in corpus size
        assert b >= prev_bands and w >= prev_planes, (n, b, w)
        prev_bands, prev_planes = b, w
        # candidates per vector ~ b * occupancy, occupancy <= 32
        # (ceil rounds 2^w up, never past doubling the target 16)
        assert b * n / 2**w <= 32 * b, (n, b, w)


def test_cosine_topk_scale_invariance(spark):
    """Cosine law: per-vector positive rescaling must not change
    sim1's neighbor sets (cosine ignores magnitude). Guards the
    fixed-point normalization in similarity._normalize against a
    refactor that silently switches to dot-product ranking."""
    from pyspark.sql import functions as F

    from serverless_smurf_etl_and_analytics_spark import tables
    from serverless_smurf_etl_and_analytics_spark.operators import similarity

    from conftest import SF_DIR

    emb = tables.load(spark, SF_DIR, "embeddings")
    scaled = emb.withColumn(
        "embedding",
        F.transform(
            "embedding",
            lambda x: x * (1.0 + (F.col("vec_id") % 7).cast("float")),
        ),
    )
    a = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.cosine_topk(emb, 5).collect()
    }
    b = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.cosine_topk(scaled, 5).collect()
    }
    assert a == b


def _one_doc(spark, text: str):
    return spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )


def test_simhash_packed_sum_safe_at_exact_bound(spark):
    """_MAX_DOC_TOKENS is the PROVABLE bound: a doc with exactly
    2^15-1 distinct tokens aggregates without overflow even in the
    worst lane distribution (ADVICE r7: the old 2^16-1 bound was
    unreachable — a lane-3 count of 2^15 pushes the signed-long sum
    past 2^63 under ANSI mode before the guard fires)."""
    n = dedup._MAX_DOC_TOKENS
    assert n == (1 << 15) - 1
    doc = _one_doc(spark, " ".join(f"t{i}" for i in range(n)))
    out = dedup.simhash(doc, 32).collect()
    assert len(out) == 1 and len(out[0]["simhash"]) == 32


def test_simhash_over_bound_raises_formatted_guard(spark):
    """One past the bound with a benign (uniform-md5) token mix: the
    packed sum stays in range, so the loud failure is the formatted
    raise_error naming the bound — not silent corruption."""
    doc = _one_doc(
        spark,
        " ".join(f"t{i}" for i in range(dedup._MAX_DOC_TOKENS + 233)),
    )
    with pytest.raises(Exception, match="simhash vote lanes overflow"):
        dedup.simhash(doc, 32).collect()


def test_simhash_adversarial_lane_pileup_fails_loud(spark):
    """The ADVICE r7 repro: tokens mined so md5's first nibble is
    >= 8 (lane-3 bit set for every token). With 2^15 such tokens the
    packed sum for nibble 0 reaches 2^63, so ANSI mode aborts the
    aggregation (raw ARITHMETIC_OVERFLOW) before the formatted guard
    can evaluate — loud either way, never a corrupted signature."""
    import hashlib

    toks, i = [], 0
    need = (1 << 15) + 8
    while len(toks) < need:
        w = f"t{i}"
        if hashlib.md5(w.encode()).hexdigest()[0] >= "8":
            toks.append(w)
        i += 1
    doc = _one_doc(spark, " ".join(toks))
    with pytest.raises(Exception):
        dedup.simhash(doc, 32).collect()

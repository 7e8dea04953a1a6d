"""Laws for the connected-components dedup variant (VERDICT r3 item 7):

- connected_components computes min-reachable labels (synthetic graphs
  with known answers, including a multi-hop chain).
- greedy semantic_dedup's drop-set is a SUBSET of the CC drop-set, with
  a synthetic witness for strictness (a doc whose only neighbor has a
  larger id is kept by greedy, dropped by CC).
- on the driver corpus the two sets coincide (the documented
  equivalence condition holds there), and semantic_dedup_cc's dup_of
  is always the component's true minimum.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import dedup

from conftest import SF_DIR


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "vec_a long, vec_b long")


def _labels(df):
    return {r["v"]: r["component"] for r in df.collect()}


def test_cc_chain_canonicalizes_transitively(spark):
    # 1-2-3-4 chain: everything reaches 1 even though (1,4) is no edge
    comp = dedup.connected_components(
        _edges(spark, [(1, 2), (2, 3), (3, 4)])
    )
    assert _labels(comp) == {1: 1, 2: 1, 3: 1, 4: 1}


def test_cc_disjoint_components(spark):
    comp = dedup.connected_components(
        _edges(spark, [(1, 2), (5, 7), (7, 9)])
    )
    assert _labels(comp) == {1: 1, 2: 1, 5: 5, 7: 5, 9: 5}


def test_greedy_is_subset_of_cc_with_strict_witness(spark):
    # star at 3: edges (1,3) and (2,3). Greedy drops only 3 (doc 2's
    # single neighbor has a LARGER id, so it keeps 2); CC drops {2, 3}
    # (component minimum is 1). This is the canonical case where the
    # two rules differ — the reason semantic_dedup_cc exists.
    edges = [(1, 3), (2, 3)]
    greedy_dropped = {b for _, b in edges}
    comp = dedup.connected_components(_edges(spark, edges))
    cc_dropped = {
        v for v, c in _labels(comp).items() if v != c
    }
    assert greedy_dropped == {3}
    assert cc_dropped == {2, 3}
    assert greedy_dropped < cc_dropped


def test_corpus_greedy_equals_cc_and_minima_kept(spark):
    docs = tables.load(spark, SF_DIR, "documents")
    emb = tables.load(spark, SF_DIR, "embeddings")
    greedy = {
        r["doc_id"]
        for r in dedup.semantic_dedup(docs, emb, 0.4).collect()
    }
    cc_rows = dedup.semantic_dedup_cc(docs, emb, 0.4).collect()
    cc = {r["doc_id"] for r in cc_rows}
    # law: greedy ⊆ CC always; equality holds on this corpus (every
    # non-minimal doc has a lower-id neighbor)
    assert greedy <= cc
    assert greedy == cc
    # dup_of is the component minimum: smaller than the dropped doc and
    # never itself dropped
    for r in cc_rows:
        assert r["dup_of"] < r["doc_id"]
        assert r["dup_of"] not in cc


def test_star_equals_labelprop_on_synthetic_graphs(spark):
    """Law: the alternating-star contraction (the d9 scale path) and
    the pointer-jump label propagation (reference implementation)
    compute identical (v, component) maps — chains, stars, disjoint
    components, out-of-order ids, and a long chain that exercises
    multiple contraction rounds."""
    cases = [
        [(1, 2), (2, 3), (3, 4)],
        [(1, 3), (2, 3)],
        [(1, 2), (5, 7), (7, 9)],
        [(10, 2), (9, 10), (4, 9), (20, 4)],
        [(i, i + 1) for i in range(1, 40)] + [(100, 101), (101, 103)],
        [(7, 3)],  # single reversed edge
    ]
    for edges in cases:
        star = _labels(
            dedup.connected_components_star(_edges(spark, edges))
        )
        ref = _labels(
            dedup.connected_components_labelprop(_edges(spark, edges))
        )
        assert star == ref, f"divergence on {edges}"


def test_star_equals_labelprop_on_corpus(spark):
    """Law on real data: both algorithms agree on the sim2 near-dup
    graph of the driver corpus (the exact edge set d9 consumes)."""
    from serverless_smurf_etl_and_analytics_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    emb = tables.load(spark, SF_DIR, "embeddings")
    pairs = cosine_neardup_pairs(emb, 0.4)
    star = _labels(dedup.connected_components_star(pairs))
    ref = _labels(dedup.connected_components_labelprop(pairs))
    assert star == ref
    assert star, "empty near-dup graph at sf0.001"


def test_cc_tiers_agree_on_synthetic_and_corpus(spark, monkeypatch):
    """The r8 bounded-graph driver tier (numpy min-label loop on the
    collected edge set) and the distributed star loop are exact
    stand-ins: forcing each tier (via _DRIVER_CC_MAX) yields identical
    label maps on the synthetic suite — incl self-loops — and on the
    real sim2 near-dup graph, so the tier cut-over can never change an
    answer."""
    from serverless_smurf_etl_and_analytics_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    cases = [
        [(1, 2), (2, 3), (3, 4)],
        [(10, 2), (9, 10), (4, 9), (20, 4)],
        [(5, 5)],  # self-loop-only singleton
        [(1, 2), (3, 3)],  # mixed component + self-loop singleton
        [(i, i + 1) for i in range(1, 40)] + [(100, 101), (101, 103)],
    ]
    emb = tables.load(spark, SF_DIR, "embeddings")
    pairs = cosine_neardup_pairs(emb, 0.4)
    results = []
    for bound in (0, dedup._DRIVER_CC_MAX):
        monkeypatch.setattr(dedup, "_DRIVER_CC_MAX", bound)
        results.append(
            [
                _labels(
                    dedup.connected_components_star(_edges(spark, e))
                )
                for e in cases
            ]
            + [_labels(dedup.connected_components_star(pairs))]
        )
    assert results[0] == results[1]
    assert results[0][-1], "empty near-dup graph at sf0.001"


def test_pagerank_partition_invariance_and_laws(spark, monkeypatch):
    """Fixed-point PageRank: identical output under repartitioning
    (integer arithmetic leaves no room for float drift), ranks
    positive, rank_pos a clean 1..k in rank order — and the r13
    driver-numpy tier is bit-identical to the distributed loop
    (same tier-forcing law as connected_components)."""
    from serverless_smurf_etl_and_analytics_spark import tables
    from serverless_smurf_etl_and_analytics_spark.operators import graph

    from conftest import SF_DIR

    li = tables.load(spark, SF_DIR, "lineitem")
    od = tables.load(spark, SF_DIR, "orders")
    a = sorted(
        graph.pagerank(li, od).collect(), key=lambda r: r["rank_pos"]
    )
    monkeypatch.setattr(graph, "_DRIVER_PR_MAX", 0)  # force distributed
    b = sorted(
        graph.pagerank(li.repartition(13), od.repartition(7)).collect(),
        key=lambda r: r["rank_pos"],
    )
    monkeypatch.undo()
    assert a == b
    assert [r["rank_pos"] for r in a] == list(range(1, len(a) + 1))
    ranks = [r["rank_fp"] for r in a]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r > 0 for r in ranks)


def test_containment_dominates_jaccard(spark):
    """Law: for any candidate pair, max directional containment >=
    Jaccard (inter/min(n_a,n_b) >= inter/union), and the d11 output is
    exactly the >= 0.8 filter of the full scored candidate set."""
    from serverless_smurf_etl_and_analytics_spark import tables
    from serverless_smurf_etl_and_analytics_spark.operators import dedup

    from conftest import SF_DIR

    docs = tables.load(spark, SF_DIR, "documents")
    pairs = dedup.lsh_candidate_pairs(docs)
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_verify(docs, pairs).collect()
        if r["jaccard"] is not None
    }
    out = dedup.containment_pairs(docs).collect()
    assert out, "no contained pairs at sf0.001"
    for r in out:
        cmax = max(r["containment_a_pm"], r["containment_b_pm"])
        assert cmax >= 800
        j = jac.get((r["doc_a"], r["doc_b"]))
        if j is not None:
            # per-mille rounding gives each side ±0.5pm slack
            assert cmax + 1 >= round(j * 1000)


def test_star_equals_labelprop_on_random_graphs(spark):
    """Randomized law: on seeded pseudo-random graphs of varied shape
    (sparse chains, dense blobs, forests), star contraction and label
    propagation produce identical label maps. Seeds are fixed — the
    test is deterministic; shapes cover multi-round contraction."""
    import random

    for seed, n, m in [(7, 60, 40), (11, 80, 120), (13, 200, 90)]:
        rng = random.Random(seed)
        edges = list(
            {
                tuple(sorted((rng.randrange(n), rng.randrange(n))))
                for _ in range(m)
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        star = _labels(
            dedup.connected_components_star(_edges(spark, edges))
        )
        ref = _labels(
            dedup.connected_components_labelprop(_edges(spark, edges))
        )
        assert star == ref, f"divergence at seed {seed}"


def test_star_equals_labelprop_with_self_loops(spark):
    """Law (ADVICE r5): self-loops carry no connectivity, but a vertex
    whose ONLY edges are self-loops must still come out as its own
    singleton component from BOTH implementations — star contraction
    used to drop it at its entry filter while labelprop emitted it."""
    cases = [
        [(5, 5)],                  # the whole graph is one self-loop
        [(1, 2), (7, 7)],          # self-loop-only vertex beside a pair
        [(3, 3), (3, 4)],          # self-loop on a connected vertex
        [(9, 9), (9, 9)],          # duplicated self-loop
        [(2, 2), (2, 3), (3, 4), (8, 8), (6, 6)],
    ]
    for edges in cases:
        star = _labels(
            dedup.connected_components_star(_edges(spark, edges))
        )
        ref = _labels(
            dedup.connected_components_labelprop(_edges(spark, edges))
        )
        assert star == ref, f"divergence on {edges}"
        assert all(v in star for v, _ in edges), f"missing vertex: {edges}"

"""k-means trainer tests: exact parity against a numpy reference
implementation of the same fixed-point Lloyd spec, determinism across
runs, and the monotone-cost guarantee."""

from __future__ import annotations

import numpy as np

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import clustering
from serverless_smurf_etl_and_analytics_spark.operators.similarity import SCALE

from conftest import SF_DIR

K, ITERS = 8, 4


def _fixed(m):
    m = m.astype(np.float64) * SCALE
    return np.where(m >= 0, np.floor(m + 0.5), np.ceil(m - 0.5)).astype(
        np.int64
    )


def _reference(vec_ids, mat, k, n_iter):
    iv = _fixed(mat)
    order = np.argsort(vec_ids)
    cent = iv[order[np.isin(vec_ids[order], np.arange(k))]].copy()

    def nearest(c):
        d2 = (
            (iv * iv).sum(axis=1, keepdims=True)
            - 2 * (iv @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        a = np.argmin(d2, axis=1)
        return a, d2[np.arange(len(a)), a]

    costs = []
    for _ in range(n_iter):
        a, d2 = nearest(cent)
        costs.append(float(d2.sum(dtype=np.float64)))
        for cid in range(k):
            sel = iv[a == cid]
            if len(sel):
                q = sel.sum(axis=0).astype(np.float64) / len(sel)
                cent[cid] = np.where(
                    q >= 0, np.floor(q + 0.5), np.ceil(q - 0.5)
                ).astype(np.int64)
    a, d2 = nearest(cent)
    return a, d2, cent, costs


def test_kmeans_matches_numpy_reference(spark):
    emb = tables.load(spark, SF_DIR, "embeddings")
    adf, cent, costs = clustering.kmeans_train(emb, K, ITERS)
    got = (
        adf.toPandas().sort_values("vec_id").reset_index(drop=True)
    )

    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    vec_ids = np.array([r["vec_id"] for r in rows])
    mat = np.vstack([np.asarray(r["embedding"]) for r in rows])
    ref_a, ref_d2, ref_cent, ref_costs = _reference(
        vec_ids, mat, K, ITERS
    )

    assert got["vec_id"].tolist() == vec_ids.tolist()
    assert got["cluster_id"].tolist() == ref_a.tolist()
    assert got["dist2"].tolist() == ref_d2.tolist()
    assert cent == ref_cent.tolist()
    # exact int state => identical trajectories; float cost may differ
    # only in summation order, compare loosely
    assert np.allclose(costs, ref_costs, rtol=1e-9)


def test_kmeans_deterministic_and_monotone(spark):
    emb = tables.load(spark, SF_DIR, "embeddings")
    a1, c1, costs1 = clustering.kmeans_train(emb, K, ITERS)
    a2, c2, costs2 = clustering.kmeans_train(
        emb.repartition(7), K, ITERS
    )
    assert c1 == c2  # partitioning cannot change the model
    p1 = a1.toPandas().sort_values("vec_id").reset_index(drop=True)
    p2 = a2.toPandas().sort_values("vec_id").reset_index(drop=True)
    assert p1.equals(p2)
    assert all(
        b <= a + 1e-6 for a, b in zip(costs1, costs1[1:])
    ), f"cost not monotone: {costs1}"


def test_kmeans_rows_sit_in_nearest_cluster(spark):
    emb = tables.load(spark, SF_DIR, "embeddings")
    adf, cent, _ = clustering.kmeans_train(emb, K, ITERS)
    c = np.asarray(cent, dtype=np.int64)
    pdf = adf.toPandas()
    rows = emb.select("vec_id", "embedding").collect()
    by_id = {r["vec_id"]: np.asarray(r["embedding"]) for r in rows}
    sample = pdf.sample(n=min(50, len(pdf)), random_state=0)
    for r in sample.itertuples():
        iv = _fixed(by_id[r.vec_id][None, :])[0]
        d2 = ((iv[None, :] - c) ** 2).sum(axis=1)
        assert d2.min() == r.dist2
        assert d2.argmin() == r.cluster_id or d2[r.cluster_id] == d2.min()

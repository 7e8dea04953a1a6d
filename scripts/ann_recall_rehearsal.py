"""Measured recall-at-scale rehearsal for the bucketed ANN paths
(sim2 / the d7-d9 candidate search).

The scale question sim2's adaptive banding answers is "do candidates
stay near-linear as the corpus grows"; the question THIS script answers
is the one that trade must not silently lose: "at the widened band
config, how much recall is actually left?" — measured against planted
ground truth, not the collision formula.

Two planted populations:

1. **High-cosine twins** (the regime the config's >= 0.93 recall floor
   is derived for, Goemans-Williamson at cos_floor = 0.9). The driver
   corpus contains NO high-similarity pairs at all (max pairwise
   cosine at sf0.1 is 0.60), so the rehearsal plants them: every
   ``TWIN_EVERY``-th vector gets a deterministic perturbed twin at
   cosine ~0.90-0.97 (noise direction = md5 of the vec_id, magnitude
   swept across twins), appended with offset ids. Recall over these
   pairs is the headline number.

2. **Amplifier-preserved base pairs**: copy ``i`` of the sf0.1 corpus
   (``scripts/make_scaled_data.py``) preserves every within-copy inner
   product exactly, so the sf0.1 exact pair set (one numpy matmul with
   the operator's own fixed-point arithmetic) replicates at vec_id
   stride 2000 per copy. These pairs are almost all BORDERLINE
   (cosine 0.3-0.6) — the population the LSH trade deliberately sheds
   — so their per-band recall documents the shape of the trade rather
   than a floor to hold.

Cross-copy pairs the banded search also finds are true positives
(verification is exact, so precision is 1.0 by construction) and do
not enter any recall denominator.

Usage:
    python scripts/ann_recall_rehearsal.py [SCALED_DIR] [BASE_DIR] [OUT_JSON]
Defaults: /root/repo/.scratch/sf1  /root/testdata/sf0.1  (stdout)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import duckdb  # noqa: E402
import numpy as np  # noqa: E402

from serverless_smurf_etl_and_analytics_spark.operators import (  # noqa: E402
    similarity,
)
from serverless_smurf_etl_and_analytics_spark.session import (  # noqa: E402
    get_spark,
)

STRIDE = 2000  # amplifier vec_id stride (make_scaled_data.py)
THRESHOLD = 0.3  # sim2's registered threshold
TWIN_EVERY = 100  # one planted high-cos twin per 100 corpus vectors
TWIN_OFFSET = 100_000_000  # twin vec_id = original + this


def _fixed_point(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64) * similarity.SCALE
    return np.where(m >= 0, np.floor(m + 0.5), np.ceil(m - 0.5)).astype(
        np.int64
    )


def _cos_fixed(iv_a: np.ndarray, iv_b: np.ndarray) -> np.ndarray:
    """Row-wise fixed-point cosine — the operator's exact arithmetic."""
    dot = (iv_a * iv_b).sum(axis=1).astype(np.float64)
    na = np.sqrt((iv_a * iv_a).sum(axis=1).astype(np.float64))
    nb = np.sqrt((iv_b * iv_b).sum(axis=1).astype(np.float64))
    return dot / (na * nb)


def exact_base_pairs(base_dir: str) -> list[tuple[int, int, float]]:
    """(vec_a, vec_b, cosine) for every sf0.1 pair above THRESHOLD,
    with the operator's exact fixed-point arithmetic."""
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{base_dir}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    iv = _fixed_point(np.array([r[1] for r in rows]))
    n2 = (iv * iv).sum(axis=1).astype(np.float64)
    cos = (iv @ iv.T).astype(np.float64) / np.sqrt(np.outer(n2, n2))
    a_idx, b_idx = np.where(np.triu(cos > THRESHOLD, k=1))
    return [
        (int(ids[a]), int(ids[b]), float(cos[a, b]))
        for a, b in zip(a_idx, b_idx)
    ]


def make_twins(
    ids: np.ndarray, vecs: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic high-cosine twins for every TWIN_EVERY-th vector:
    twin = v + eps * ||v|| * u, with u a unit direction seeded by
    md5(vec_id) and eps swept over [0.25, 0.45] so true cosines land
    ~0.90-0.97. Returns (twin_ids, twin_vecs, true_cos_per_twin)."""
    sel = np.arange(0, len(ids), TWIN_EVERY)
    twin_ids, twin_vecs = [], []
    for j, k in enumerate(sel):
        seed = int.from_bytes(
            hashlib.md5(f"twin|{int(ids[k])}".encode()).digest()[:8],
            "big",
        )
        rng = np.random.default_rng(seed)
        u = rng.standard_normal(vecs.shape[1])
        u /= np.linalg.norm(u)
        eps = 0.25 + 0.20 * (j % 5) / 4.0
        v = vecs[k]
        tw = v + eps * np.linalg.norm(v) * u
        twin_ids.append(int(ids[k]) + TWIN_OFFSET)
        twin_vecs.append(tw.astype(np.float32))
    twin_vecs = np.array(twin_vecs)
    true_cos = _cos_fixed(
        _fixed_point(vecs[sel]), _fixed_point(twin_vecs)
    )
    return np.array(twin_ids), twin_vecs, true_cos


def main() -> None:
    scaled = (
        sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    )
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(os.environ.get("SMURF_BENCH_RUNS", "2"))

    base_pairs = exact_base_pairs(base)
    rows = duckdb.sql(
        f"SELECT vec_id, embedding, label FROM"
        f" '{scaled}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    vecs = np.array([r[1] for r in rows], dtype=np.float32)
    labels = np.array([r[2] for r in rows], dtype=np.int64)
    n_scaled = len(ids)
    copies = n_scaled // STRIDE

    twin_ids, twin_vecs, twin_cos = make_twins(ids, vecs)
    assert (twin_cos >= 0.85).all(), "twin noise calibration drifted"
    sel_ids = ids[np.arange(0, n_scaled, TWIN_EVERY)]
    twin_pairs_hi = {
        (int(sel_ids[j]), int(twin_ids[j]))
        for j in range(len(twin_ids))
        if twin_cos[j] >= 0.9
    }
    planted = {
        (a + i * STRIDE, b + i * STRIDE)
        for a, b, _ in base_pairs
        for i in range(copies)
    }
    by_band = {}
    for lo, hi in [(0.3, 0.4), (0.4, 0.5), (0.5, 0.7)]:
        by_band[f"[{lo},{hi})"] = {
            (a + i * STRIDE, b + i * STRIDE)
            for a, b, c in base_pairs
            if lo <= c < hi
            for i in range(copies)
        }

    spark = get_spark("ann-recall-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{scaled}/embeddings.parquet")
    import pandas as pd

    twins_df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": twin_ids,
                "embedding": [list(map(float, v)) for v in twin_vecs],
                "label": labels[np.arange(0, n_scaled, TWIN_EVERY)],
            }
        ),
        schema=emb.schema,
    )
    corpus = emb.unionByName(twins_df)
    cfg = similarity.adaptive_band_config(n_scaled + len(twin_ids))

    walls, found = [], None
    for _ in range(runs):
        t0 = time.perf_counter()
        rows2 = similarity.cosine_neardup_pairs(corpus, THRESHOLD).collect()
        walls.append(time.perf_counter() - t0)
        found = {(r["vec_a"], r["vec_b"]) for r in rows2}

    out = {
        "scaled_dir": scaled,
        "n_vectors": int(n_scaled),
        "n_twins": len(twin_ids),
        "copies": int(copies),
        "band_config": {"n_bands": cfg[0], "band_planes": cfg[1]},
        "wall_sec_min": round(min(walls), 3),
        "runs": runs,
        "pairs_found": len(found),
        "recall_twins_cos_ge_0.9": round(
            len(found & twin_pairs_hi) / len(twin_pairs_hi), 4
        ),
        "twin_pairs_cos_ge_0.9": len(twin_pairs_hi),
        "recall_target_cos_ge_0.9": 0.93,
        "recall_amplified_base_pairs": round(
            len(found & planted) / len(planted), 4
        ),
        "amplified_base_pairs": len(planted),
        "recall_base_by_cos_band": {
            band: round(len(found & s) / len(s), 4)
            for band, s in by_band.items()
            if s
        },
        "note": (
            "base corpus max pairwise cosine is 0.60: every amplified "
            "base pair is borderline similarity, the population the "
            "LSH trade deliberately sheds; the floor applies to the "
            "planted twins"
        ),
    }
    print(json.dumps(out))
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()

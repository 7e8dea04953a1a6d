"""Distributed k-means (Lloyd) over the embeddings table — the
training pass that produces the IVF coarse quantizer
(similarity.ivf_topk's docstring: "a k-means training pass would swap
in learned ones with no structural change").

Determinism: all assignment math is int64 fixed point (the
similarity.SCALE convention), partial sums are exact integers (sum
order cannot change them), centroid updates round half-away-from-zero
at integer scale — so cluster assignments are bit-identical across
runs, partitionings and engines. Only the reported float ``cost`` is
summation-order sensitive (monitoring only, never fed back into the
model).

Scale design (Lloyd on Spark, the treeAggregate shape):
- each iteration is ONE map-side pass: an Arrow-batched mapInPandas
  computes per-batch nearest-centroid assignment (numpy matmul against
  the broadcast k x dim centroid matrix) and emits per-batch partial
  sums — at most k+1 rows per batch, (cluster_id, n, sum vector) — so
  the per-iteration shuffle is O(batches * k * dim) longs, independent
  of corpus size; the grouped combine output is k rows.
- the final labeling pass streams assignments back as a DataFrame
  (never collected);
- centroids are a bounded model artifact (k * dim int64), the same
  class of broadcast as IVF's centroid rows / cosine_topk's query
  matrix. Iterations are driver-side loops over Spark jobs, which is
  how distributed Lloyd works everywhere (MLlib included).

The closures are fully self-contained (helpers defined inside, imports
inside) so cloudpickle ships them by value — a module-path reference
would fail on workers when the driver runs from another cwd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from .similarity import SCALE

_PARTIAL_SCHEMA = StructType(
    [
        StructField("cluster_id", LongType()),
        StructField("n", LongType()),
        StructField("s", ArrayType(LongType())),
    ]
)

_ASSIGN_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("cluster_id", LongType()),
        StructField("dist2", LongType()),
    ]
)


def _make_helpers(scale: int):
    """Build the (to_fixed, nearest) pair once; both are plain local
    functions, so closures capturing them pickle by value."""
    import numpy as np

    def to_fixed(col):
        m = (
            np.vstack(col.map(np.asarray).values).astype(np.float64)
            * scale
        )
        return np.where(
            m >= 0, np.floor(m + 0.5), np.ceil(m - 0.5)
        ).astype(np.int64)

    def nearest(iv, cent):
        # ||x-c||^2 = ||x||^2 - 2x.c + ||c||^2; int64 throughout
        # (dim 64, |component| <= SCALE => max term ~2.6e14 << 2^63).
        # Ties break to the lowest cluster id (argmin first-occurrence).
        d2 = (
            (iv * iv).sum(axis=1, keepdims=True)
            - 2 * (iv @ cent.T)
            + (cent * cent).sum(axis=1)[None, :]
        )
        a = np.argmin(d2, axis=1)
        return a, d2[np.arange(len(a)), a]

    return to_fixed, nearest


def kmeans_train(
    emb: DataFrame, k: int = 16, n_iter: int = 5
) -> tuple[DataFrame, list[list[int]], list[float]]:
    """Train k-means and return ``(assignments, centroids, costs)``:
    assignments = (vec_id, cluster_id, dist2) labeled against the
    FINAL centroids (so every row provably sits in its nearest
    cluster), centroids = k fixed-point vectors, costs = per-iteration
    sum of squared distance (float, monitoring only).

    Init follows the IVF convention: the first ``k`` vec_ids are the
    seed centroids. Empty clusters keep their previous centroid."""
    import numpy as np
    import pandas as pd

    to_fixed, nearest = _make_helpers(SCALE)
    seed_rows = sorted(
        emb.filter(F.col("vec_id") < k)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    cent = to_fixed(pd.Series([r["embedding"] for r in seed_rows]))
    dim = cent.shape[1]
    vecs = emb.select("vec_id", "embedding")
    costs: list[float] = []

    for _ in range(n_iter):
        def partials(batches, c=cent, tf=to_fixed, nn=nearest):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                iv = tf(pdf["embedding"])
                a, d2 = nn(iv, c)
                rows = {"cluster_id": [], "n": [], "s": []}
                for cid in np.unique(a):
                    sel = iv[a == cid]
                    rows["cluster_id"].append(int(cid))
                    rows["n"].append(int(sel.shape[0]))
                    rows["s"].append(sel.sum(axis=0).tolist())
                # per-batch cost rides along as a pseudo-cluster row
                # (float-summed: cost is monitoring only; the int
                # partial sums above are the exact model state)
                rows["cluster_id"].append(-1)
                rows["n"].append(len(pdf))
                rows["s"].append([int(d2.sum(dtype=np.float64))])
                yield pd.DataFrame(rows)

        part = (
            vecs.mapInPandas(partials, schema=_PARTIAL_SCHEMA)
            .groupBy("cluster_id")
            .agg(
                F.sum("n").alias("n"),
                # try_element_at: the cost pseudo-row's array has one
                # element; strict element_at would throw past it
                F.array(
                    *[
                        F.sum(F.try_element_at("s", F.lit(i + 1)))
                        for i in range(dim)
                    ]
                ).alias("s"),
            )
            .collect()
        )
        new_cent = cent.copy()
        cost = 0.0
        for r in part:
            if r["cluster_id"] == -1:
                cost = float(r["s"][0])
                continue
            s = np.asarray(r["s"], dtype=np.int64)
            q = s.astype(np.float64) / r["n"]
            new_cent[r["cluster_id"]] = np.where(
                q >= 0, np.floor(q + 0.5), np.ceil(q - 0.5)
            ).astype(np.int64)
        costs.append(cost)
        cent = new_cent

    def label(batches, c=cent, tf=to_fixed, nn=nearest):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            iv = tf(pdf["embedding"])
            a, d2 = nn(iv, c)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].values,
                    "cluster_id": a.astype("int64"),
                    "dist2": d2.astype("int64"),
                }
            )

    assignments = vecs.mapInPandas(label, schema=_ASSIGN_SCHEMA)
    return assignments, cent.tolist(), costs

"""Similarity search over embedding columns (BASELINE.json north-star
extensions): brute-force cosine top-k baseline + LSH-bucketed scale
path + cosine near-dup pairs.

Numeric determinism: float32 embeddings are scaled to integer
fixed-point (x * 1e7, well within long range for unit-norm dim-64
vectors) so dot products and norms are *exact integer* math —
bit-identical between Spark and the DuckDB oracle regardless of
reduction order. Cosine then divides identical integers in double.

Scale design:
- brute force is the correctness baseline: Q x N pairs via a broadcast
  of the (small) query set against the (huge) candidate set — no
  shuffle of the candidate side, linear scan, whole-stage codegen
  array ops (zip_with/aggregate), no Python.
- the LSH variant buckets vectors by the sign pattern of 8
  deterministic md5-derived hyperplanes: candidates meet only inside
  their bucket (self-equi-join on an 8-bit key), cutting the pair
  count ~256x at the cost of recall — the classic ANN trade.
- at 100 TB: bucket keys are computed in the scan projection; the join
  shuffles by bucket key; skewed buckets are handled by AQE skew-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 10_000_000  # fixed-point scale for float32 -> long
DIM = 64
N_PLANES = 8
HEX = "0123456789abcdef"


def fixed_point(emb: DataFrame) -> DataFrame:
    """embedding float[] -> exact integer vector + integer squared norm.

    Ends in a repartition by vec_id: the exchange (a) spreads a
    few-files corpus across all cores — a single parquet file would
    otherwise pin every downstream self-join to one task — and (b) is a
    materialization barrier, so join-side filters compare the computed
    iv/n2 attributes instead of re-evaluating the conversion per side.
    """
    ivec = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * SCALE).cast("long"),
    )
    d = emb.select("vec_id", "label", ivec.alias("iv"))
    n2 = F.aggregate(
        F.col("iv"), F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )
    return d.withColumn("n2", n2).repartition("vec_id")


def _cosine(iv_a, iv_b, n2_a, n2_b):
    dot = F.aggregate(
        F.zip_with(iv_a, iv_b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return dot.cast("double") / (
        F.sqrt(n2_a.cast("double")) * F.sqrt(n2_b.cast("double"))
    )


def cosine_topk(
    emb: DataFrame, k: int = 5, n_queries: int = 64
) -> DataFrame:
    """Brute-force cosine top-k: the first ``n_queries`` vec_ids as the
    query set, ranked against every other vector. Cosine reported at
    6 decimals (integer-scale rounding); rank ties broken by vec_id."""
    fx = fixed_point(emb)
    q = fx.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("iv").alias("iv_q"),
        F.col("n2").alias("n2_q"),
    )
    c = fx.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("iv").alias("iv_c"),
        F.col("n2").alias("n2_c"),
    )
    pairs = F.broadcast(q).crossJoin(c).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = _cosine(
        F.col("iv_q"), F.col("iv_c"), F.col("n2_q"), F.col("n2_c")
    )
    scored = pairs.select(
        "query_id", "neighbor_id", "neighbor_label", cos.alias("cos_raw")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            (F.round(F.col("cos_raw") * 1000000.0).cast("long") / 1000000.0)
            .cast("double")
            .alias("cosine"),
            "rank",
        )
    )


def cosine_neardup_pairs(emb: DataFrame, threshold: float = 0.3) -> DataFrame:
    """All-pairs cosine near-duplicate detection above a threshold
    (embedding-space dedup for training corpora)."""
    fx = fixed_point(emb)
    a = fx.select(
        F.col("vec_id").alias("vec_a"), F.col("iv").alias("iv_a"),
        F.col("n2").alias("n2_a"),
    )
    b = fx.select(
        F.col("vec_id").alias("vec_b"), F.col("iv").alias("iv_b"),
        F.col("n2").alias("n2_b"),
    )
    cos = _cosine(F.col("iv_a"), F.col("iv_b"), F.col("n2_a"), F.col("n2_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cos_raw"))
        .filter(F.col("cos_raw") > threshold)
        .select(
            "vec_a",
            "vec_b",
            (F.round(F.col("cos_raw") * 1000000.0).cast("long") / 1000000.0)
            .cast("double")
            .alias("cosine"),
        )
    )


def _plane_sign(p, d):
    """Deterministic ±1 hyperplane entry from md5(p|d): parity of the
    first hex nibble. Engine-portable (md5 + string ops only)."""
    nib = F.position(
        F.substring(F.md5(F.concat(p.cast("string"), F.lit("|"),
                                   d.cast("string"))), 1, 1),
        F.lit(HEX),
    ) - 1
    return F.when(nib % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).cast("long")


def lsh_bucket(emb: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """Sign-random-projection bucket key: bit p = sign of <v, plane_p>
    with md5-derived ±1 planes; 8 planes -> 256 buckets."""
    fx = fixed_point(emb)
    dims = F.sequence(F.lit(0), F.lit(DIM - 1))

    def plane_dot(p: int):
        # closure factory (default-arg lambdas change HOF arity)
        return lambda x, d: x * _plane_sign(F.lit(p), d)

    bucket = F.concat(
        *[
            F.when(
                F.aggregate(
                    F.zip_with(F.col("iv"), dims, plane_dot(p)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                )
                > 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for p in range(n_planes)
        ]
    )
    return fx.withColumn("bucket", bucket)


def lsh_topk(emb: DataFrame, k: int = 3, n_queries: int = 64) -> DataFrame:
    """ANN top-k within LSH buckets — the scale path: only same-bucket
    pairs are scored. Lower recall than brute force by construction."""
    bk = lsh_bucket(emb)
    q = bk.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("iv").alias("iv_q"),
        F.col("n2").alias("n2_q"), F.col("bucket"),
    )
    c = bk.select(
        F.col("vec_id").alias("neighbor_id"), F.col("iv").alias("iv_c"),
        F.col("n2").alias("n2_c"), F.col("bucket"),
    )
    cos = _cosine(F.col("iv_q"), F.col("iv_c"), F.col("n2_q"), F.col("n2_c"))
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos_raw"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            (F.round(F.col("cos_raw") * 1000000.0).cast("long") / 1000000.0)
            .cast("double")
            .alias("cosine"),
            "rank",
        )
    )

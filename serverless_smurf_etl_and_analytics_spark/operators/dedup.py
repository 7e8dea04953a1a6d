"""Deduplication operators for LLM training-data pipelines
(BASELINE.json north-star extensions): exact, MinHash+LSH, SimHash,
n-gram Jaccard.

Scale design (the point of each variant at 100 TB):
- exact: hash-groupBy on a content fingerprint — one shuffle keyed by
  md5, perfectly balanced.
- MinHash+LSH: per-doc signature is a narrow array computed in one
  projection (no shuffle); banding turns O(n^2) pair search into a
  self-equi-join on band keys, i.e. a shuffle keyed by band hash where
  only same-bucket docs meet. Candidate verification (Jaccard) runs
  per-pair on the already-bucketed rows.
- SimHash: 32-bit signature via bit-majority over token hashes; near
  neighbors share a 8-bit prefix block => blocked self-join.
- All hashing is md5 (byte-identical in Spark and DuckDB) so every
  stage is oracle-checkable; no engine-internal hash functions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import tokens_col

N_MINHASH = 8
BAND_SIZE = 4  # 2 bands of 4 hashes


def shingles_col(n: int = 2) -> F.Column:
    """Distinct word n-gram shingles (default bigrams — distinctive
    even on a shared-vocabulary corpus, unlike unigram sets)."""
    toks = tokens_col(F.col("text"))
    if n == 1:
        return F.array_distinct(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(j + 1)) for j in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup: group by normalized-content fingerprint, keep the
    lowest doc_id as canonical."""
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    d = docs.select("doc_id", F.md5(norm).alias("fingerprint"))
    return d.groupBy("fingerprint").agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("copies"),
    )


def minhash_signatures(docs: DataFrame, n_hashes: int = N_MINHASH) -> DataFrame:
    """Per-doc MinHash signature over bigram shingles: seed-prefixed md5
    per shingle, min per seed (one lexicographic-min permutation per
    seed), plus banded hashes for LSH."""
    d = docs.select("doc_id", shingles_col(2).alias("sh"))

    def seed_hash(i: int):
        # closure factory (default-arg lambdas change HOF arity)
        return lambda x: F.md5(F.concat(F.lit(f"{i}|"), x))

    cols = {
        f"mh_{i}": F.array_min(F.transform(F.col("sh"), seed_hash(i)))
        for i in range(n_hashes)
    }
    d = d.withColumns(cols).drop("sh")
    n_bands = n_hashes // BAND_SIZE
    bands = {
        f"band_{b}": F.md5(
            F.concat(
                *[F.col(f"mh_{b * BAND_SIZE + j}") for j in range(BAND_SIZE)]
            )
        )
        for b in range(n_bands)
    }
    return d.withColumns(bands)


def lsh_candidate_pairs(docs: DataFrame) -> DataFrame:
    """LSH banding: docs sharing any band hash become candidate pairs
    (doc_a < doc_b, deduped across bands)."""
    sig = minhash_signatures(docs)
    n_bands = N_MINHASH // BAND_SIZE
    per_band = [
        sig.select(
            F.col("doc_id"), F.col(f"band_{b}").alias("band_val"),
            F.lit(b).alias("band_idx"),
        )
        for b in range(n_bands)
    ]
    exploded = reduce(lambda a, b: a.unionByName(b), per_band)
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return pairs


def jaccard_verify(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Candidate verification: exact bigram-set Jaccard per candidate
    pair (intersection/union on distinct shingle arrays), 3-decimal."""
    sh = docs.select("doc_id", shingles_col(2).alias("sh"))
    j = (
        pairs.join(
            sh.select(
                F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
            ),
            "doc_a",
        )
        .join(
            sh.select(
                F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
            ),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    union = (F.size("sh_a") + F.size("sh_b")).cast("long") - inter
    jac = (
        F.round(inter * 1000.0 / union).cast("long") / 1000.0
    ).cast("double")
    return j.select(
        "doc_a",
        "doc_b",
        inter.alias("shingles_common"),
        union.alias("shingles_union"),
        F.when(union > 0, jac).alias("jaccard"),
    )


def minhash_neardup_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: band -> candidates -> exact
    Jaccard -> threshold."""
    verified = jaccard_verify(docs, lsh_candidate_pairs(docs))
    return verified.filter(F.col("jaccard") >= threshold)


HEX = "0123456789abcdef"


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash: per token, take ``bits`` bits of md5; signature bit b is
    the majority vote across distinct tokens. Emitted as a bit string
    (engine-portable) plus an 8-bit prefix block key for neighbor
    blocking."""
    d = docs.select("doc_id", F.array_distinct(tokens_col(F.col("text"))).alias("toks"))

    def bit_of(word_col, b):
        # nibble index b//4 within the md5 hex, bit b%4 inside it
        nib = F.position(
            F.substring(F.md5(word_col), b // 4 + 1, 1), F.lit(HEX)
        ) - 1
        return F.floor(nib / (2 ** (b % 4))) % 2

    def bit_acc(b: int):
        return lambda acc, w: acc + (bit_of(w, b) * 2 - 1)

    sig = F.concat(
        *[
            F.when(
                F.aggregate(F.col("toks"), F.lit(0).cast("long"), bit_acc(b))
                > 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for b in range(bits)
        ]
    )
    return d.select(
        "doc_id",
        sig.alias("simhash"),
        F.substring(sig, 1, 8).alias("block"),
    )


def simhash_neardup_pairs(docs: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Blocked SimHash near-dup: pairs sharing the 8-bit prefix block,
    kept when full Hamming distance <= max_hamming."""
    s = simhash(docs)
    a = s.alias("a")
    b = s.alias("b")
    pos = F.sequence(F.lit(1), F.lit(32))
    hamming = F.size(
        F.filter(
            pos,
            lambda i: F.substring(F.col("a.simhash"), i, 1)
            != F.substring(F.col("b.simhash"), i, 1),
        )
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )

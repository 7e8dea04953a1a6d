"""Deduplication operators for LLM training-data pipelines
(BASELINE.json north-star extensions): exact, MinHash+LSH, SimHash,
n-gram Jaccard.

Scale design (the point of each variant at 100 TB):
- exact: hash-groupBy on a content fingerprint — one shuffle keyed by
  md5, perfectly balanced.
- MinHash+LSH: tokens/shingles are EXPLODED to rows and signatures
  built by ``groupBy(doc_id).agg(min(...))`` — every md5 is computed
  exactly once, the shuffle by doc_id parallelizes regardless of input
  file layout, and the aggregation is a materialization barrier so the
  self-join never re-evaluates signature expressions. (The naive
  all-in-one-projection form re-tokenizes per array element — O(T^2)
  per doc — and recomputes the whole signature in the join's inferred
  ``isnotnull`` filters; measured 74 s vs 4 s at sf0.1.)
- banding turns O(n^2) pair search into a self-equi-join on (band_idx,
  band_val): a shuffle where only same-bucket docs meet.
- SimHash: per-token md5 bits summed per doc (groupBy barrier), 32-bit
  signature string; neighbors share an 8-bit prefix block.
- All hashing is md5 (byte-identical in Spark and DuckDB) so every
  stage is oracle-checkable; no engine-internal hash functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import tokens_col

N_MINHASH = 8
BAND_SIZE = 4  # 2 bands of 4 hashes
HEX = "0123456789abcdef"


def token_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, tok) — tokenization happens ONCE per document,
    then explodes; downstream per-token work is row-at-a-time in
    whole-stage codegen and parallelized by the next shuffle."""
    return docs.select(
        "doc_id", F.posexplode(tokens_col(F.col("text"))).alias("pos", "tok")
    )


def shingle_rows(docs: DataFrame, n: int = 2) -> DataFrame:
    """(doc_id, sh) distinct word n-gram shingles (default bigrams) via
    a lead() window over exploded tokens — one shuffle by doc_id, no
    O(T^2) array building."""
    t = token_rows(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    # lead columns are materialized BEFORE the row filter — a window
    # expression placed after the filter would re-evaluate over the
    # filtered rows and drop each doc's final n-gram
    t = t.withColumns(
        {f"nxt_{j}": F.lead("tok", j).over(w) for j in range(1, n)}
    )
    if n > 1:
        t = t.filter(F.col(f"nxt_{n - 1}").isNotNull())
    sh = F.concat_ws(
        " ", F.col("tok"), *[F.col(f"nxt_{j}") for j in range(1, n)]
    )
    return t.select("doc_id", sh.alias("sh")).distinct()


def doc_shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, sh array<string>, n_sh) — per-doc distinct shingle set,
    materialized by aggregation so joins against it never recompute the
    shingling. Docs with <n tokens keep an empty array (left join back
    to the doc list), matching the array-form semantics."""
    sets = shingle_rows(docs).groupBy("doc_id").agg(
        F.collect_list("sh").alias("sh")
    )
    return (
        docs.select("doc_id")
        .join(sets, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("sh"), F.array().cast("array<string>")).alias(
                "sh"
            ),
        )
        .withColumn("n_sh", F.size("sh").cast("long"))
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
    per shingle (computed once per (doc, shingle, seed)), min per seed
    via hash aggregation — one lexicographic-min permutation per seed —
    plus banded hashes for LSH. Docs with no shingles keep null
    signatures (and null bands), same as array_min over an empty array.
    """
    sh = shingle_rows(docs)
    mins = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(
                f"mh_{i}"
            )
            for i in range(n_hashes)
        ]
    )
    d = docs.select("doc_id").join(mins, "doc_id", "left")
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
    (doc_a < doc_b, deduped across bands). The band table is one
    explode over the aggregated signatures — a plain-attribute
    self-equi-join, no signature recomputation."""
    sig = minhash_signatures(docs)
    n_bands = N_MINHASH // BAND_SIZE
    exploded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.col(f"band_{b}").alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(
        "doc_id", F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_val").alias("band_val"),
    ).filter(F.col("band_val").isNotNull())
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
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


def jaccard_verify(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Candidate verification: exact bigram-set Jaccard per candidate
    pair (intersection/union on the materialized distinct shingle
    sets), 3-decimal."""
    sh = doc_shingle_sets(docs)
    j = (
        pairs.join(
            sh.select(
                F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"),
                F.col("n_sh").alias("n_a"),
            ),
            "doc_a",
        )
        .join(
            sh.select(
                F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"),
                F.col("n_sh").alias("n_b"),
            ),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    union = (F.col("n_a") + F.col("n_b")) - inter
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


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash: per distinct token, take ``bits`` bits of md5 (nibble
    parity scheme: bit b = bit b%4 of hex nibble b//4); signature bit is
    the majority vote across tokens. Each token is hashed ONCE (exploded
    rows), votes summed by hash aggregation. Emitted as a bit string
    (engine-portable) plus an 8-bit prefix block key for blocking.
    Docs with no tokens get the all-zero signature (empty-vote ties are
    zero, as in the array-aggregate form)."""
    t = token_rows(docs).select("doc_id", "tok").distinct()
    h = F.md5("tok")
    nibs = [
        F.position(F.substring(h, k + 1, 1), F.lit(HEX)) - 1
        for k in range(bits // 4)
    ]
    votes = [
        (
            (F.floor(nibs[b // 4] / (2 ** (b % 4))) % 2) * 2 - 1
        ).alias(f"v_{b}")
        for b in range(bits)
    ]
    summed = t.select("doc_id", *votes).groupBy("doc_id").agg(
        *[F.sum(f"v_{b}").alias(f"s_{b}") for b in range(bits)]
    )
    d = docs.select("doc_id").join(summed, "doc_id", "left")
    sig = F.concat(
        *[
            F.when(F.coalesce(F.col(f"s_{b}"), F.lit(0)) > 0, F.lit("1"))
            .otherwise(F.lit("0"))
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
    kept when full Hamming distance <= max_hamming. The signatures come
    out of an aggregation, so the block join compares plain columns."""
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

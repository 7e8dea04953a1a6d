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
- SimHash: per-token md5 bits summed per doc (groupBy barrier),
  signature widths 32/64 (single long) to 128 (array of 32-bit words
  — d6's registered config; width sets how wide the pigeonhole bands
  stay as the corpus grows); near-dup search uses pigeonhole banding
  (max_hamming+1 bands -> any-band equality has guaranteed recall).
- All hashing is md5 (byte-identical in Spark and DuckDB) so every
  stage is oracle-checkable; no engine-internal hash functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .textops import token_rows

N_MINHASH = 8
BAND_SIZE = 4  # 2 bands of 4 hashes
HEX = "0123456789abcdef"

# Band-table rows (N docs x (max_hamming+1) bands) above which the
# simhash band self-join stops BROADCASTING its build side: at ~60
# serialized bytes/row, 2M rows is ~120 MB — already past any sane
# autoBroadcastJoinThreshold, and a 100 TB corpus would be orders of
# magnitude over. Past the cap the join falls back to a key-partitioned
# shuffle on (band_idx, band_val) and AQE skew-splitting handles hot
# bands. (The cap is rows, not bytes, because the decision must be
# taken at plan-build time from the already-materialized band-table
# count — no size estimate of a cached plan is trustworthy here.)
BROADCAST_MAX_BAND_ROWS = 2_000_000


# corpus-size floor below which "auto" artifact caching of the per-doc
# pure stages (shingles, MinHash signatures, SimHash signatures) is
# skipped: under it the fingerprint scan costs more than recomputing,
# and — deliberately — every driver-verified scale (<= ~6k docs) and
# the pinned sf0.1 bench build the SAME inline plans as before, so the
# gated default changes no verified plan. Explicit cache roots bypass
# the gate (the law tests push tiny corpora through the artifact path
# on purpose). Same tiering rationale as similarity._BAND_CACHE_MIN.
_DOC_ARTIFACT_MIN = 10_000


def _doc_artifact(
    docs: DataFrame,
    cache: str | None,
    key_fmt: str,
    build,
    select_cols: list[str],
    fingerprint: tuple[int, int] | None = None,
) -> DataFrame | None:
    """Shared find-or-build for per-doc pure-stage artifacts: returns
    the artifact-backed frame, or None when caching is disabled/gated
    off (caller falls back to its inline plan). ``key_fmt`` formats
    (n_docs, content_hash) into the dirname; ``build`` is a thunk
    producing the full table for the corpus.

    ``fingerprint``: a precomputed ``(n_docs, content_hash)`` pair —
    normally ``tablelog.ledger_fingerprint(table_dir, ["doc_id",
    "text"])`` from a maintained corpus's commit log. When given, the
    gate count AND the cache key come from it, so a cache HIT runs
    zero corpus-scan jobs before the artifact read (at 100 TB the
    per-session fingerprint scan is otherwise the dominant cost of a
    cached cold query)."""
    import os

    from .artifacts import atomic_write_parquet, cache_root
    from .textops import text_corpus_fingerprint

    if cache is None:
        return None
    from .memo import memoized_count, plan_scalar

    # both gate scalars are memoized per (application, plan) — every
    # shingle/simhash-gated query paid a corpus-scan job (or two) at
    # each plan build for values invariant within the session
    # (operators/memo.py, r14)
    n_docs = fingerprint[0] if fingerprint else memoized_count(docs)
    if cache == "auto" and n_docs < _DOC_ARTIFACT_MIN:
        return None
    # the artifact is an OPTIMIZATION: if the cache root is unwritable,
    # the disk is full, or a read-back fails at plan time, fall back to
    # the inline plan rather than failing the query (atomic writes mean
    # a half-built artifact is never visible, so the only errors here
    # are environmental)
    try:
        root = cache_root(None if cache == "auto" else cache)
        n, h = fingerprint or plan_scalar(
            docs, "text_fp", lambda: text_corpus_fingerprint(docs)
        )
        path = atomic_write_parquet(
            build(), os.path.join(root, key_fmt.format(n=n, h=h))
        )
        return docs.sparkSession.read.parquet(path).select(*select_cols)
    except Exception:
        return None


def shingle_rows(
    docs: DataFrame,
    n: int = 2,
    cache: str | None = "auto",
    fingerprint: tuple[int, int] | None = None,
) -> DataFrame:
    """(doc_id, sh) distinct word n-gram shingles (default bigrams) via
    a lead() window over exploded tokens — one shuffle by doc_id, no
    O(T^2) array building.

    Per-doc pure function, so (r8) it persists across sessions as a
    fingerprint-keyed corpus artifact exactly like the LSH band bits
    and winnow fingerprints: ``cache="auto"`` reads the artifact at
    ``_DOC_ARTIFACT_MIN``+ docs (building on first contact), shards
    merge by plain union (:func:`append_shingle_artifact`, law-tested),
    and every consumer — MinHash signatures, Jaccard verify sets, d8
    decontamination, d11 containment — shares ONE artifact per (corpus,
    n). Below the gate (all driver scales, the pinned bench) the plan
    is byte-identical to the r7 inline form."""
    backed = _doc_artifact(
        docs,
        cache,
        f"sh_v1_n{{n}}_h{{h}}_g{n}",
        lambda: _shingle_rows_inline(docs, n),
        ["doc_id", "sh"],
        fingerprint,
    )
    return backed if backed is not None else _shingle_rows_inline(docs, n)


def materialize_shingle_artifact(
    docs: DataFrame, root: str | None = None, n: int = 2
) -> str:
    """Pipeline-managed build of the shingle artifact; see
    :func:`shingle_rows`. Returns the artifact path."""
    import os

    from .artifacts import atomic_write_parquet, cache_root
    from .textops import text_corpus_fingerprint

    nn, h = text_corpus_fingerprint(docs)
    return atomic_write_parquet(
        _shingle_rows_inline(docs, n),
        os.path.join(cache_root(root), f"sh_v1_n{nn}_h{h}_g{n}"),
    )


def advance_shingle_artifact(
    new_docs: DataFrame,
    old_fp: tuple[int, int],
    new_fp: tuple[int, int],
    root: str | None = None,
    n: int = 2,
) -> str | None:
    """Advance the fingerprint-keyed shingle artifact from a corpus at
    ``old_fp`` to the grown corpus at ``new_fp`` in O(shard): the
    ingest pipeline calls this right after committing a shard (both
    pairs come free from ``tablelog.ledger_fingerprint`` before/after
    the commit), and the next session's find-or-build HITS the new
    key instead of re-shingling the whole corpus. Old artifact stays
    immutable (hard-linked files, not moved). None = no old artifact
    to advance (fall back to a full build or let first contact do
    it)."""
    from .artifacts import advance_artifact

    return advance_artifact(
        root,
        f"sh_v1_n{old_fp[0]}_h{old_fp[1]}_g{n}",
        f"sh_v1_n{new_fp[0]}_h{new_fp[1]}_g{n}",
        lambda p: append_shingle_artifact(new_docs, p, n),
    )


def append_shingle_artifact(
    new_docs: DataFrame, path: str, n: int = 2
) -> None:
    """Merge a NEW document shard into a pipeline-managed shingle
    artifact (per-doc pure function => plain union; fingerprint-keyed
    auto-cache dirs are immutable — a grown corpus gets a new key)."""
    _shingle_rows_inline(new_docs, n).write.mode("append").parquet(path)


def _shingle_rows_inline(docs: DataFrame, n: int) -> DataFrame:
    """The inline (recompute) shingle plan — see :func:`shingle_rows`."""
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


def doc_shingle_sets(
    docs: DataFrame,
    fingerprint: tuple[int, int] | None = None,
    cache: str | None = "auto",
) -> DataFrame:
    """(doc_id, sh array<string>, n_sh) — per-doc distinct shingle set,
    materialized by aggregation so joins against it never recompute the
    shingling. Docs with <n tokens keep an empty array (left join back
    to the doc list), matching the array-form semantics. ``fingerprint``
    passes the ledger pair through to the shingle stage (zero-scan
    artifact hit in a maintained pipeline); ``cache`` is the artifact
    root the shingle stage resolves against (default: the shared
    root via the "auto" gate)."""
    sets = shingle_rows(
        docs, cache=cache, fingerprint=fingerprint
    ).groupBy("doc_id").agg(
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


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = N_MINHASH,
    cache: str | None = "auto",
    fingerprint: tuple[int, int] | None = None,
) -> DataFrame:
    """Per-doc MinHash signature over bigram shingles: seed-prefixed md5
    per shingle (computed once per (doc, shingle, seed)), min per seed
    via hash aggregation — one lexicographic-min permutation per seed —
    plus banded hashes for LSH. Docs with no shingles keep null
    signatures (and null bands), same as array_min over an empty array.

    Per-doc pure function of the corpus, so (r8) the COMPLETE signature
    table (including null rows for shingle-less docs) persists as a
    fingerprint-keyed artifact at scale, CHAINED on the shingle
    artifact: a cold miss builds signatures from the cached shingle
    rows, so the tokenize stage is never repeated either way. Same
    gate/merge/staleness rules as :func:`shingle_rows`."""
    backed = _doc_artifact(
        docs,
        cache,
        f"mh_v1_n{{n}}_h{{h}}_g2_k{n_hashes}b{BAND_SIZE}",
        lambda: _minhash_signatures_from(
            docs, shingle_rows(docs, 2, cache, fingerprint), n_hashes
        ),
        ["doc_id"]
        + [f"mh_{i}" for i in range(n_hashes)]
        + [f"band_{b}" for b in range(n_hashes // BAND_SIZE)],
        fingerprint,
    )
    if backed is not None:
        return backed
    return _minhash_signatures_from(
        docs, shingle_rows(docs, 2, cache, fingerprint), n_hashes
    )


def advance_minhash_artifact(
    new_docs: DataFrame,
    old_fp: tuple[int, int],
    new_fp: tuple[int, int],
    root: str | None = None,
    n_hashes: int = N_MINHASH,
) -> str | None:
    """O(shard) key advance for the MinHash signature artifact — see
    :func:`advance_shingle_artifact`."""
    from .artifacts import advance_artifact

    key = "mh_v1_n{n}_h{h}_g2_k" + f"{n_hashes}b{BAND_SIZE}"
    return advance_artifact(
        root,
        key.format(n=old_fp[0], h=old_fp[1]),
        key.format(n=new_fp[0], h=new_fp[1]),
        lambda p: append_minhash_artifact(new_docs, p, n_hashes),
    )


def append_minhash_artifact(
    new_docs: DataFrame, path: str, n_hashes: int = N_MINHASH
) -> None:
    """Merge a NEW document shard's signature rows into a
    pipeline-managed signature artifact (per-doc rows => plain union).
    Computes shingles only for the new shard."""
    _minhash_signatures_from(
        new_docs, _shingle_rows_inline(new_docs, 2), n_hashes
    ).write.mode("append").parquet(path)


def _minhash_signatures_from(
    docs: DataFrame, sh: DataFrame, n_hashes: int
) -> DataFrame:
    """Signature plan over a given shingle frame — see
    :func:`minhash_signatures`."""
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


def lsh_candidate_pairs(
    docs: DataFrame,
    fingerprint: tuple[int, int] | None = None,
    cache: str | None = "auto",
) -> DataFrame:
    """LSH banding: docs sharing any band hash become candidate pairs
    (doc_a < doc_b, deduped across bands). The band table is one
    explode over the aggregated signatures — a plain-attribute
    self-equi-join, no signature recomputation. ``cache``: artifact
    root for the signature stage (see :func:`minhash_signatures`)."""
    sig = minhash_signatures(docs, cache=cache, fingerprint=fingerprint)
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


def jaccard_verify(
    docs: DataFrame,
    pairs: DataFrame,
    fingerprint: tuple[int, int] | None = None,
    cache: str | None = "auto",
) -> DataFrame:
    """Candidate verification: exact bigram-set Jaccard per candidate
    pair (intersection/union on the materialized distinct shingle
    sets), 3-decimal. ``cache``: artifact root for the shingle
    stage."""
    sh = doc_shingle_sets(docs, fingerprint, cache)
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


def minhash_neardup_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    fingerprint: tuple[int, int] | None = None,
    cache: str | None = "auto",
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: band -> candidates -> exact
    Jaccard -> threshold.

    The tokenize->shingle subtree is persisted up front: the signature
    build and the exact-Jaccard verify both consume shingle_rows(docs),
    and Spark's cache manager substitutes the persisted plan into every
    logically-equal subtree — so the corpus is tokenized once, not once
    per stage. The cache is session-lived and caller-owned: long-lived
    sessions free it via ``session.clear_operator_caches`` (or
    ``unpersist()`` on a tracked handle) after consuming.

    ``cache``: artifact root threaded to every artifact-gated stage
    (shingles, signatures) — a maintained corpus ingested into a
    CUSTOM root must query against the same root or every lookup
    silently misses and rebuilds (ADVICE r10); default "auto" resolves
    the shared root behind the size gate as before."""
    shingle_rows(docs, cache=cache, fingerprint=fingerprint).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    verified = jaccard_verify(
        docs, lsh_candidate_pairs(docs, fingerprint, cache),
        fingerprint, cache,
    )
    # persist the THRESHOLD-INDEPENDENT verified table (bounded by the
    # LSH candidate count — dup-scaled, never corpus-scaled): d4, d10's
    # group assembly, src2's source matrix and the curation survivor
    # branches all consume this exact subtree, and without the barrier
    # each one re-runs the signature build + band self-join + verify
    # joins from the shingle cache up (r13 measured src2 at ~2.2x d4
    # for precisely this reason; guide §2.1 reuse / §5 caching). Same
    # session-owned lifetime as the shingle cache above.
    verified = verified.persist(StorageLevel.MEMORY_AND_DISK)
    return verified.filter(F.col("jaccard") >= threshold)


# packed-lane vote table: lane l (16 bits wide) of the packed long for
# hex-nibble value v holds bit l of v — so summing packed longs over a
# doc's tokens sums all four per-bit 0/1 counts lane-wise in ONE long
# aggregate, with no cross-lane carries while each count < 2^16.
_PACK = [
    sum(((v >> l) & 1) << (16 * l) for l in range(4)) for v in range(16)
]
# distinct-token-per-doc bound under which the packed aggregation is
# PROVABLY safe. Two constraints: (1) lanes carry-free needs each lane
# count < 2^16; (2) the SIGNED long sum must not overflow — lane 3
# sits at bit 48, so a lane-3 count of 2^15 alone reaches 2^63 and
# trips Spark 4's ANSI ARITHMETIC_OVERFLOW mid-aggregation, before any
# post-agg guard can fire. (2) binds first: the real bound is 2^15-1
# (worst case sum = (2^15-1)*(2^48+2^32+2^16+1) < 2^63-1). Docs at or
# below the bound can never overflow; docs above it fail LOUDLY —
# either the formatted raise_error below (when the sum happens to stay
# in range) or Spark's raw ANSI overflow (when it doesn't) — never a
# silently corrupted signature. Split such docs upstream.
_MAX_DOC_TOKENS = (1 << 15) - 1


def simhash(
    docs: DataFrame,
    bits: int = 32,
    cache: str | None = "auto",
    fingerprint: tuple[int, int] | None = None,
) -> DataFrame:
    """SimHash: per distinct token, take ``bits`` bits of md5 (nibble
    parity scheme: bit b = bit b%4 of hex nibble b//4); signature bit is
    the majority vote across tokens. Each token is hashed ONCE (exploded
    rows), votes summed by hash aggregation. Emitted as a bit string
    (engine-portable) plus an 8-bit prefix block key for blocking.
    Docs with no tokens get the all-zero signature (empty-vote ties are
    zero, as in the array-aggregate form).

    Vote aggregation is PACKED: per token, each md5 nibble maps through
    a 16-entry literal table (one array lookup) to a long whose four
    16-bit lanes carry that nibble's four 0/1 bits, so the per-doc
    aggregate is ``bits/4`` long sums instead of ``bits`` — 4x fewer
    aggregate buffers and shuffle bytes, and the per-token projection
    is ``bits/4`` array lookups instead of ``bits`` shift/mask chains
    (measured 2.7 s -> 1.0 s for the 128-bit build at sf0.1). The
    majority vote over ±1 equals ``2 * count_of_ones > n_tokens``;
    the packed sum is provably safe below 2^15 distinct tokens/doc
    (the signed-long bound on lane 3 at bit 48 — tighter than the
    2^16 carry-free lane bound), enforced per doc with the exact
    count. A doc over the bound fails the job loudly — the formatted
    raise_error when the sum stays in range, Spark's ANSI
    ARITHMETIC_OVERFLOW when it doesn't — never a silently corrupted
    signature; split such docs upstream.

    Per-doc pure function, so (r8) the signature table persists as a
    fingerprint-keyed corpus artifact per ``bits`` tier — both d6
    packing tiers read it instead of re-running the tokenize + vote
    aggregation cold. Same gate/merge/staleness rules as
    :func:`shingle_rows`; :func:`append_simhash_artifact` merges new
    shards by union."""
    backed = _doc_artifact(
        docs,
        cache,
        f"simh_v1_n{{n}}_h{{h}}_b{bits}",
        lambda: _simhash_inline(docs, bits),
        ["doc_id", "simhash", "block"],
        fingerprint,
    )
    return backed if backed is not None else _simhash_inline(docs, bits)


def advance_simhash_artifact(
    new_docs: DataFrame,
    old_fp: tuple[int, int],
    new_fp: tuple[int, int],
    root: str | None = None,
    bits: int = 32,
) -> str | None:
    """O(shard) key advance for the SimHash signature artifact — see
    :func:`advance_shingle_artifact`."""
    from .artifacts import advance_artifact

    return advance_artifact(
        root,
        f"simh_v1_n{old_fp[0]}_h{old_fp[1]}_b{bits}",
        f"simh_v1_n{new_fp[0]}_h{new_fp[1]}_b{bits}",
        lambda p: append_simhash_artifact(new_docs, p, bits),
    )


def append_simhash_artifact(
    new_docs: DataFrame, path: str, bits: int = 32
) -> None:
    """Merge a NEW document shard's SimHash rows into a
    pipeline-managed signature artifact (per-doc rows => union)."""
    _simhash_inline(new_docs, bits).write.mode("append").parquet(path)


def _simhash_inline(docs: DataFrame, bits: int) -> DataFrame:
    """The inline (recompute) SimHash plan — see :func:`simhash`.

    The projections are generated as SQL STRINGS (selectExpr /
    F.expr), not Column-object chains: the 128-bit build is ~2000
    expression nodes, and constructing them through py4j cost ~2.3 s
    of driver wall PER CALL (~1.4 ms/round-trip, measured r13) —
    paid on every bench sample since plans are rebuilt per query
    call. One SQL parse of the same expressions is milliseconds, and
    the resulting plan/values are identical (oracle parity +
    test_dedup_artifacts pin the values)."""
    # explicit repartition after the distinct: the packed vote
    # projection + aggregation is CPU-dense but byte-small, and AQE
    # would coalesce the distinct's shuffle output to one task
    p = docs.sparkSession.sparkContext.defaultParallelism
    t = (
        token_rows(docs).select("doc_id", "tok").distinct()
        .repartition(p, "doc_id")
    )
    pack_sql = "array(" + ",".join(f"{x}L" for x in _PACK) + ")"
    packed = [
        f"element_at({pack_sql}, cast(position(substring(md5(tok),"
        f" {k + 1}, 1), '{HEX}') as int)) AS p_{k}"
        for k in range(bits // 4)
    ]
    summed = t.selectExpr("doc_id", *packed).groupBy("doc_id").agg(
        F.expr("count(1)").alias("n_tok"),
        *[F.expr(f"sum(p_{k})").alias(f"s_{k}") for k in range(bits // 4)],
    )
    d = docs.select("doc_id").join(summed, "doc_id", "left")
    # the overflow guard is HOISTED to one CASE around the whole
    # signature instead of being inlined into each of the 128 bit
    # terms (the r12 form): the per-bit compare uses the raw token
    # count — identical bit values whenever the doc is within bound —
    # and an out-of-bound doc still fails the job loudly with the
    # same message before any signature char is emitted. Tree size
    # drops ~8x (the eagerly-analyzed projection was the measured
    # driver wall), values and the raise contract are unchanged
    # (tests/test_properties.py pins both).
    n_sql = "coalesce(n_tok, 0)"
    raise_sql = (
        f"cast(raise_error(format_string("
        f"'simhash vote lanes overflow past %d distinct tokens"
        f" per doc; got %s', {_MAX_DOC_TOKENS}, {n_sql})) as string)"
    )

    def bit_sql(b: int) -> str:
        cnt = (
            f"(shiftright(coalesce(s_{b // 4}, 0), {16 * (b % 4)})"
            f" & {0xFFFF})"
        )
        return f"CASE WHEN ({cnt} * 2) > {n_sql} THEN '1' ELSE '0' END"

    def guarded_concat(n_chars: int) -> str:
        body = "concat(" + ", ".join(
            bit_sql(b) for b in range(n_chars)
        ) + ")"
        return (
            f"CASE WHEN {n_sql} <= {_MAX_DOC_TOKENS} THEN {body}"
            f" ELSE {raise_sql} END"
        )

    return d.select(
        "doc_id",
        F.expr(guarded_concat(bits)).alias("simhash"),
        # block == the first 8 signature chars; concat of the first 8
        # one-char bit terms is byte-equal to substring(simhash, 1, 8)
        # without re-deriving the full 128-char expression
        F.expr(guarded_concat(min(8, bits))).alias("block"),
    )


def band_bounds(bits: int, n_bands: int) -> list[tuple[int, int]]:
    """Split a ``bits``-wide signature into ``n_bands`` contiguous
    (start, length) bands, 1-indexed, lengths differing by at most 1."""
    base, rem = divmod(bits, n_bands)
    bounds, start = [], 1
    for i in range(n_bands):
        ln = base + (1 if i < rem else 0)
        bounds.append((start, ln))
        start += ln
    return bounds


def simhash_neardup_pairs(
    docs: DataFrame,
    max_hamming: int = 6,
    bits: int = 32,
    fingerprint: tuple[int, int] | None = None,
    cache: str | None = "auto",
) -> DataFrame:
    """Pigeonhole-banded SimHash near-dup with GUARANTEED recall: the
    ``bits``-wide signature is split into ``max_hamming + 1`` contiguous
    bands, so any pair at Hamming distance <= max_hamming must agree
    exactly on at least one band (pigeonhole). Candidates = per-band
    equi-join on (band_idx, band_value); verification = one
    ``bit_count(xor)`` on the numeric signature. Output is therefore the
    EXACT set of pairs at hamming <= max_hamming — the DuckDB oracle
    states the spec directly as an all-pairs filter.

    Scale design: the band join shuffles by (band_idx, band_value) —
    bounded candidates (~(h+1) * N^2 / 2^band_bits worst case, far less
    under real bucket distributions), no O(N^2) pair space, AQE
    skew-join for hot bands. Unlike sim2, the sketch width cannot adapt
    silently: hamming <= h over a ``bits``-wide sketch IS the operator's
    semantics, so changing ``bits`` changes the answer, not just the
    plan. Widths are tiered by how the signature is packed:

    - ``bits <= 64``: single long, shift+mask band extraction (the
      original scheme; 64 keeps the 7 bands >= 9 wide — fine to ~50k
      docs).
    - ``64 < bits <= 128``: the scale tier (d6's registered config) —
      the signature is an ``array<long>`` of 32-bit words and band
      values are pre-extracted into an ``array<long>``; 7 bands over
      128 bits are >= 18 wide (>= 262k bucket values per band), which
      cuts the saturation candidate term ~(h+1) * N^2 / 2^band_bits by
      ~2^9 vs 64-bit — the regime the sf10 rehearsal showed 64-bit
      leaving (15.9x wall on 10x docs as every band bucket held ~1k
      docs). 128 is the md5 budget; wider needs a second hash stream.

    Either tier broadcasts the build side of the band self-join only
    while the band table stays under :data:`BROADCAST_MAX_BAND_ROWS`;
    past that the join is a key-partitioned shuffle (AQE skew-splits
    hot bands) — an unconditional broadcast of a corpus x bands table
    cannot survive 100 TB."""
    if not 1 <= bits <= 128:
        raise ValueError(
            "bits must be in [1, 128] (md5 provides 128 signature bits)"
        )
    if bits > 64:
        return _simhash_neardup_pairs_wide(
            docs, max_hamming, bits, fingerprint, cache
        )
    # bits > 32: assemble the long from two halves — conv() returns an
    # UNSIGNED decimal string, so a direct cast overflows to null for
    # signatures >= 2^63. The wrap to a negative long is fine: every
    # downstream op (shiftright+mask, xor, bit_count) is bit-pattern
    # arithmetic, and the sign bits an arithmetic shift drags in are
    # stripped by the band mask.
    if bits > 32:
        sig_col = F.shiftleft(
            F.conv(F.substring("simhash", 1, bits - 32), 2, 10).cast(
                "long"
            ),
            32,
        ).bitwiseOR(
            F.conv(F.substring("simhash", bits - 31, 32), 2, 10).cast(
                "long"
            )
        )
    else:
        sig_col = F.conv("simhash", 2, 10).cast("long")
    s = simhash(docs, bits, cache=cache, fingerprint=fingerprint).select(
        "doc_id", sig_col.alias("sig")
    )
    bounds = band_bounds(bits, max_hamming + 1)
    # band j as an integer: bits are MSB-first in the signature string,
    # so a band at (start, ln) is (sig >> (bits - (start + ln - 1))) & mask
    shifts = [bits - (st + ln - 1) for st, ln in bounds]
    masks = [(1 << ln) - 1 for _, ln in bounds]

    def bval(col, j):
        return F.shiftright(col, shifts[j]).bitwiseAND(F.lit(masks[j]))

    # persisted: the signature pipeline (tokenize/explode/vote-agg) runs
    # once and both sides of the band self-join read materialized rows;
    # cache lifetime is caller-owned (session.clear_operator_caches).
    # The explicit ROUND-ROBIN repartition pins the probe side at full
    # parallelism with even load: AQE coalesces by shuffle BYTES and
    # would run this tiny but match-explosive input (30M+ candidate
    # probes at sf0.1) on one task, while key-partitioning would pile
    # hot band values onto a few tasks. While the band table is small
    # the build side is pinned with an explicit F.broadcast hint so
    # probe rows need no co-location; past BROADCAST_MAX_BAND_ROWS the
    # hint is withheld and the join runs as a key-partitioned shuffle
    # with AQE skew-splitting on hot bands (the count also materializes
    # the cache, so the decision costs a scan of rows the join needs
    # anyway).
    p = docs.sparkSession.sparkContext.defaultParallelism
    eb = (
        s.select(
            "doc_id",
            "sig",
            F.posexplode(
                F.array(*[bval(F.col("sig"), j) for j in range(len(bounds))])
            ).alias("band_idx", "band_val"),
        )
        .repartition(p)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = eb.alias("a")
    b = eb.alias("b")
    from .memo import memoized_count

    # broadcast-sizing gate memoized per (application, plan) — the
    # count doubles as the cache materialization on first use, and
    # repeat calls skip the ~0.15 s cached-scan job (memo.py, r14)
    if memoized_count(eb) <= BROADCAST_MAX_BAND_ROWS:
        b = F.broadcast(b)
    # exactly-once without a distinct shuffle: keep a pair only at its
    # first matching band (all earlier bands must differ), and verify
    # the full Hamming bound inline — candidate generation, dedup, and
    # verification all happen in one codegen stage after one shuffle
    first_match = None
    for i in range(len(bounds)):
        mism = F.lit(True)
        for j in range(i):
            mism = mism & (
                bval(F.col("a.sig"), j) != bval(F.col("b.sig"), j)
            )
        first_match = (
            F.when(F.col("a.band_idx") == i, mism)
            if first_match is None
            else first_match.when(F.col("a.band_idx") == i, mism)
        )
    hamming = F.bit_count(
        F.col("a.sig").bitwiseXOR(F.col("b.sig"))
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & first_match
            & (hamming <= max_hamming),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
    )


def _simhash_neardup_pairs_wide(
    docs: DataFrame,
    max_hamming: int,
    bits: int,
    fingerprint: tuple[int, int] | None = None,
    cache: str | None = "auto",
) -> DataFrame:
    """The 64 < bits <= 128 tier of :func:`simhash_neardup_pairs` —
    same pigeonhole scheme, different packing. The signature is an
    ``array<long>`` of 32-bit words (a 32-bit slice conv()s to long
    with no sign games; Hamming = sum of per-word ``bit_count(xor)``
    via ``zip_with``/``aggregate``, all codegen'd array intrinsics) and
    the ``max_hamming + 1`` band values (each <= ceil(128/7) = 19 bits,
    so a plain long) are pre-extracted into a ``bands`` array — the
    first-match dedup predicate reads ``element_at(bands, j)`` instead
    of re-deriving shift/mask expressions per band. The band self-join
    and its broadcast/shuffle sizing rule are identical to the narrow
    tier."""
    n_words = (bits + 31) // 32
    word_bounds = [
        (1 + 32 * w, min(32, bits - 32 * w)) for w in range(n_words)
    ]
    bounds = band_bounds(bits, max_hamming + 1)
    sig_arr = F.array(
        *[
            F.conv(F.substring("simhash", st, ln), 2, 10).cast("long")
            for st, ln in word_bounds
        ]
    )
    band_arr = F.array(
        *[
            F.conv(F.substring("simhash", st, ln), 2, 10).cast("long")
            for st, ln in bounds
        ]
    )
    # persist the (doc_id, simhash) projection BEFORE deriving the
    # word/band slices: the inline signature is one ~47 KB concat-of-
    # 128-votes expression, and without a materialization barrier
    # CollapseProject substitutes it into every conv(substring(...))
    # term — 4 words + 7 bands + the Generate's size-filter made the
    # r13 d6 plan carry two 332 KB filter conditions (811 KB plan
    # text, all janino-compiled). Behind the persist the slices read a
    # materialized column; the vote pipeline still runs exactly once
    # (guide §2.3 "project before the exchange" / §7.2 duplicated
    # subtrees). Values are unchanged — only where the string
    # materializes moves.
    sh = simhash(docs, bits, cache=cache, fingerprint=fingerprint).select(
        "doc_id", "simhash"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    s = sh.select(
        "doc_id", sig_arr.alias("sig"), band_arr.alias("bands")
    )
    p = docs.sparkSession.sparkContext.defaultParallelism
    eb = (
        s.select(
            "doc_id",
            "sig",
            "bands",
            F.posexplode("bands").alias("band_idx", "band_val"),
        )
        .repartition(p)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = eb.alias("a")
    b = eb.alias("b")
    from .memo import memoized_count

    # broadcast-sizing gate memoized per (application, plan) — the
    # count doubles as the cache materialization on first use, and
    # repeat calls skip the ~0.15 s cached-scan job (memo.py, r14)
    if memoized_count(eb) <= BROADCAST_MAX_BAND_ROWS:
        b = F.broadcast(b)
    # exactly-once without a distinct shuffle: keep a pair only at its
    # first matching band (all earlier bands must differ); candidate
    # generation, dedup, and Hamming verification run in one codegen
    # stage after one shuffle (or broadcast probe).
    first_match = None
    for i in range(len(bounds)):
        mism = F.lit(True)
        for j in range(i):
            mism = mism & (
                F.element_at(F.col("a.bands"), j + 1)
                != F.element_at(F.col("b.bands"), j + 1)
            )
        first_match = (
            F.when(F.col("a.band_idx") == i, mism)
            if first_match is None
            else first_match.when(F.col("a.band_idx") == i, mism)
        )
    hamming = F.aggregate(
        F.zip_with(
            F.col("a.sig"),
            F.col("b.sig"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & first_match
            & (hamming <= max_hamming),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
    )


def semantic_dedup(
    docs: DataFrame,
    emb: DataFrame,
    threshold: float = 0.4,
    emb_fingerprint: tuple[int, int] | None = None,
) -> DataFrame:
    """d7: embedding-based (semantic) document dedup — the SemDeDup
    recipe (Abbas et al. 2023): a document is a semantic duplicate when
    its EMBEDDING is a near-duplicate of a lower-id document's, even if
    the surface text shares no n-grams. Candidates come from the sim2
    LSH band path (adaptive width, exact-cosine verify), so the pair
    search is O(n log n), never all-pairs; the keep/drop rule is the
    deterministic keep-lowest-id convention exact_dedup uses.

    Output: one row per DROPPED doc — (doc_id, lang, dup_of = its
    smallest near-dup partner, n_neardups, max_cosine). Chains are
    resolved greedily (B drops to A, C drops to B) rather than by
    connected components — transitive canonicalization is iterative
    (graph connectivity), deliberately out of the oracle-checkable
    path. The greedy rule drops exactly the docs with at least one
    LOWER-id near-dup partner, a subset of what full connected
    components would drop; the two sets coincide whenever every
    non-minimal doc of a component has a lower-id neighbor (true on
    the driver corpora — asserted by tests/test_graph_dedup.py — and
    typical, since near-dup similarity is close to transitive at high
    thresholds). :func:`semantic_dedup_cc` is the iterative variant
    that guarantees the full-component semantics at any chain length.

    Pairing contract: embeddings join documents on vec_id == doc_id
    (the mm3 pairing-integrity rule); docs without an embedding are
    never dropped."""
    from .similarity import cosine_neardup_pairs

    # the verified pair table is persisted (r14, guide §2.1): d7 and
    # d9 build the IDENTICAL pairs-at-0.4 subtree (same corpus, same
    # threshold), so Spark's cache manager dedupes the two persists
    # into one session-lifetime materialization — the candidate join +
    # Arrow verify runs once and both consumers (greedy agg here, the
    # label-prop components in semantic_dedup_cc) read cached rows.
    # Same caller-owned lifetime as every operator cache
    # (session.clear_operator_caches).
    pairs = cosine_neardup_pairs(
        emb, threshold, fingerprint=emb_fingerprint
    ).persist(StorageLevel.MEMORY_AND_DISK)
    drops = pairs.groupBy("vec_b").agg(
        F.min("vec_a").alias("dup_of"),
        F.count(F.lit(1)).alias("n_neardups"),
        F.max("cosine").alias("max_cosine"),
    )
    return drops.join(
        docs.select("doc_id", "lang"),
        drops["vec_b"] == F.col("doc_id"),
    ).select("doc_id", "lang", "dup_of", "n_neardups", "max_cosine")


def _ckpt_fresh(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint + rebuild from the checkpointed RDD so the
    resulting leaf drops BOTH lineage and the origin plan's
    carried-over statistics (see :func:`connected_components_labelprop`
    docstring — ``Dataset.localCheckpoint`` keeps the origin plan's
    size-in-bytes stats, and Catalyst join estimation SQUARES them per
    iteration until BigInteger overflow; rebuilding from the
    checkpointed RDD resets the leaf to default stats. The JVM-side
    ``javaRDD`` round trip never touches Python serialization). On a
    real cluster prefer a reliable ``checkpoint`` dir (localCheckpoint
    is lost with an executor); semantics are identical."""
    from pyspark.sql import DataFrame as _DF

    spark = df.sparkSession
    ck = df.localCheckpoint(eager=True)
    jdf = spark._jsparkSession.createDataFrame(
        ck._jdf.javaRDD(), ck._jdf.schema()
    )
    return _DF(jdf, spark)


def connected_components(
    edges: DataFrame,
    src: str = "vec_a",
    dst: str = "vec_b",
    max_iter: int = 50,
    algorithm: str = "star",
) -> DataFrame:
    """Distributed connected components: returns (v, component) where
    ``component`` is the smallest vertex id reachable from ``v``.

    Dispatcher: ``algorithm="star"`` (default) runs the alternating
    large-star/small-star contraction of
    :func:`connected_components_star` — the scale path; per-round cost
    SHRINKS as the graph contracts toward stars, where label
    propagation re-joins the full adjacency every round.
    ``algorithm="labelprop"`` keeps the r4 pointer-jump label
    propagation as the reference implementation; equality of the two
    is law-tested on synthetic graphs and the driver corpus
    (tests/test_graph_dedup.py)."""
    if algorithm == "star":
        return connected_components_star(edges, src, dst, max_iter)
    return connected_components_labelprop(edges, src, dst, max_iter)


def connected_components_star(
    edges: DataFrame,
    src: str = "vec_a",
    dst: str = "vec_b",
    max_iter: int = 50,
) -> DataFrame:
    """Alternating-star connected components (Kiveris et al. 2014,
    "Connected Components in MapReduce and Beyond" — the two-phase
    star-contraction algorithm). Each round rewrites the edge set:

    - **large-star**: every vertex connects its strictly LARGER
      neighbors to the minimum of its closed neighborhood
      ``m = min(N(u) ∪ {u})`` — emit (v, m) for v ∈ N(u), v > u.
    - **small-star**: on edges directed large→small, every vertex
      connects its smaller neighbors AND itself to the minimum of its
      smaller neighborhood — emit (v, m) for v ∈ N⁻(u) ∪ {u}, v ≠ m.

    Both steps preserve connectivity and never merge components; the
    fixed point is a union of STARS, each rooted at its component's
    minimum id — so the final edge set IS the label map. Convergence
    is O(log² n) rounds worst-case but ~3-5 in practice, and — the
    reason this replaces label propagation as the d9 scale path — the
    edge set CONTRACTS monotonically toward one edge per non-root
    vertex, so late rounds get cheaper, where the r4 pointer-jump loop
    re-joined the full adjacency every round at constant cost (its
    sf1 wall: 35 s ≈ 10-15× on 10× data, the suite's one super-linear
    scale wall; the reference implementation survives as
    :func:`connected_components_labelprop`).

    Same per-round lineage/stats hygiene as the labelprop loop
    (:func:`_ckpt_fresh`); state is the contracted edge list — one row
    per non-root vertex at the fixed point, never the corpus.

    Self-loops carry no connectivity and are dropped from the edge
    set, but a vertex whose ONLY edges are self-loops must still come
    out as its own singleton component — the labelprop reference emits
    it, and the advertised equality law between the two implementations
    holds on any input. Such vertices are collected (from the same
    persisted canonical edge pass) and unioned back in as roots.

    **Bounded-graph driver tier** (r8): near-dup edge sets are tiny
    relative to the corpus (sf10: 420k edges from 200k vectors), and
    at that size the loop's cost is pure fixed overhead — ~8 shuffle
    stages x ~5 rounds on data that fits in one task (measured 10.3 s
    at sf10, ~2 s/round, all scheduling). Below ``_DRIVER_CC_MAX``
    edges the persisted canonical edge set is therefore collected
    (Arrow, 16 B/edge) and solved with vectorized numpy min-label
    pointer-jumping on the driver (measured ~0.5 s on the same graph)
    — the same bounded-model-artifact tiering as the sim2 gather
    verify, law-equal to the loop by construction (both compute
    min-reachable-id) and covered by the star==labelprop equality
    tests. The distributed loop remains the above-bound path.

    An explicit settled-star dropout (removing closed-star components
    from the iterated edge set each round) was prototyped and
    MEASURED SLOWER at sf10 — 12.8 s/4 rounds vs 10.3 s/5: its three
    extra shuffles + window per round cost more than re-joining the
    stars, because most groups only close in the last two rounds.
    Not shipped; the driver tier wins by two orders of magnitude on
    the same graphs.

    **Degree-1 pre-contraction — prototyped and MEASURED SLOWER, not
    shipped** (r11, VERDICT r10 task 3): peeling degree-1 vertices
    before the loop (recording leaf->neighbor mappings, resolving in
    reverse round order, re-canonicalizing labels to component
    minima) was built, law-tested exact, and A/B-measured in one
    process on a 50M-edge graph shaped to FAVOR it (80% of edges in
    isolated pairs / 3-chains): peeled 340.6 s vs unpeeled 210.8 s,
    identical 32.55M components both ways
    (``benchmarks/scale_r11_summary.json`` `cc50m_star_peel_onoff`).
    Why it loses: the alternating-star rounds already absorb the
    degree-1 fringe in their first round — a pair or leaf re-points
    to its neighborhood minimum immediately and the edge set
    contracts — at ~the cost of one round, while a dedicated peel
    pays per-round degree aggregates + split joins over E PLUS a
    vertex-sized label re-canonicalization (the peeled leaf can BE
    the component minimum), and V is largest exactly when the fringe
    dominates. On dense near-dup graphs (duplicate clusters are
    cliques; the sf30 0.3-graph averages degree ~54) peel removes
    almost nothing and is pure overhead. The same rehearsal IS the
    >=50M-edge evidence the task asked for: the unpeeled loop holds —
    210.8 s, exact, zero bad roots — with the driver tier untouched
    below 5M edges."""
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("s"),
            F.least(F.col(src), F.col(dst)).alias("d"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # gate count memoized per (application, plan) like the pr1 probe
    # (r14): repeat calls over the session-cached canonical edges paid
    # ~0.2 s of cached-scan job for an invariant number
    from .graph import _memoized_count

    n_edges = _memoized_count(e)  # materializes the pairs on first use
    if n_edges <= _DRIVER_CC_MAX:
        # e stays persisted (r14): d9/d10/curation each rebuild this
        # exact canonical edge plan per call, and the cache manager
        # dedupes their persists into the session entry — freeing it
        # here made every repeat call pay the distinct + verify chain
        # again. Bounded by the near-dup edge count; session-owned
        # lifetime like the shingle/verified caches upstream.
        return _cc_driver_numpy(e)
    cur = _ckpt_fresh(e.filter(F.col("s") != F.col("d")))
    # vertices with ONLY self-loop edges: singleton roots (tiny —
    # bounded by the near-dup vertex set, like every loop state here)
    lonely = _ckpt_fresh(
        e.filter(F.col("s") == F.col("d"))
        .select(F.col("s").alias("v"))
        .join(
            cur.select(F.col("s").alias("v"))
            .union(cur.select(F.col("d").alias("v")))
            .distinct(),
            "v",
            "anti",
        )
    )
    e.unpersist()
    prev_cs = _edge_checksum(cur)
    for _ in range(max_iter):
        # large-star: closed-neighborhood minimum per vertex over the
        # undirected adjacency; larger neighbors re-point to it.
        adj = cur.union(
            cur.select(F.col("d").alias("s"), F.col("s").alias("d"))
        )
        mins = (
            adj.groupBy("s")
            .agg(F.min("d").alias("mn"))
            .select("s", F.least("mn", "s").alias("m"))
        )
        large = (
            adj.filter(F.col("d") > F.col("s"))
            .join(mins, "s")
            .select(F.col("d").alias("s"), F.col("m").alias("d"))
            .filter(F.col("s") != F.col("d"))
            .distinct()
        )
        # small-star: direct large→small, point every smaller neighbor
        # and the vertex itself at the smallest smaller-neighbor.
        ecan = (
            large.select(
                F.greatest("s", "d").alias("u"),
                F.least("s", "d").alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        smins = ecan.groupBy("u").agg(F.min("v").alias("m"))
        small = _ckpt_fresh(
            ecan.join(smins, "u")
            .select(F.col("v").alias("s"), F.col("m").alias("d"))
            .union(
                smins.select(F.col("u").alias("s"), F.col("m").alias("d"))
            )
            .filter(F.col("s") != F.col("d"))
            .distinct()
        )
        # fixed-point check: both sides are DISTINCT edge sets, so
        # equality of (count, sum of per-row hash) implies set equality
        # up to a 2^-64-ish collision — one cheap aggregate over the
        # just-checkpointed rows instead of the two exceptAll shuffle
        # jobs this used to run per round (a measured constant-factor
        # drag on d9/d10). The hash sum rides in decimal(38,0) so it
        # cannot overflow (ANSI mode would raise on a long sum).
        cs = _edge_checksum(small)
        cur = small
        if cs == prev_cs:
            break
        prev_cs = cs
    # fixed point = union of stars rooted at component minima: the
    # edge set is the label map for non-roots; roots label themselves.
    return (
        cur.select(F.col("s").alias("v"), F.col("d").alias("component"))
        .union(
            cur.select("d")
            .distinct()
            .select(F.col("d").alias("v"), F.col("d").alias("component"))
        )
        .union(
            lonely.select("v", F.col("v").alias("component"))
        )
    )


# edge-count bound for the driver CC tier: 5M canonical edges collect
# to ~80 MB of Arrow (two int64 columns) and the numpy label loop runs
# in well under a second — far below the distributed loop's fixed
# ~2 s/round scheduling floor. Above the bound the star loop runs.
_DRIVER_CC_MAX = 5_000_000


def _cc_driver_numpy(e: DataFrame) -> DataFrame:
    """Bounded-graph tier: exact min-reachable-id connected components
    on the driver. The persisted canonical edge frame (s, d) comes
    over as two int64 numpy columns (Arrow); vertices are compacted
    with searchsorted (sorted order makes index-min == id-min); the
    loop alternates vectorized min-propagation across edges
    (np.minimum.at both directions) with one pointer jump
    (lab = lab[lab]), converging in O(log diameter) numpy rounds —
    ~ms each at bounded edge counts. Self-loops contribute their
    vertex and no propagation, so self-loop-only singletons come out
    as their own roots, same as the distributed paths."""
    import numpy as np
    import pandas as pd

    pdf = e.toPandas()
    s = pdf["s"].to_numpy(np.int64)
    d = pdf["d"].to_numpy(np.int64)
    verts = np.unique(np.concatenate([s, d]))
    si = np.searchsorted(verts, s)
    di = np.searchsorted(verts, d)
    lab = np.arange(len(verts), dtype=np.int64)
    while True:
        nxt = lab.copy()
        np.minimum.at(nxt, si, lab[di])
        np.minimum.at(nxt, di, lab[si])
        nxt = nxt[nxt]
        if np.array_equal(nxt, lab):
            break
        lab = nxt
    # ONE partition for the bounded label map (r14, guide §5): the
    # arrow-parallelized createDataFrame spreads a few hundred rows
    # over defaultParallelism slices, charging every downstream action
    # ~32 near-empty tasks of scheduling (the same fix as the pr1
    # driver tier). Values unchanged.
    return e.sparkSession.createDataFrame(
        pd.DataFrame({"v": verts, "component": verts[lab]}),
        "v long, component long",
    ).coalesce(1)


def _edge_checksum(e: DataFrame) -> tuple:
    """(row count, sum of xxhash64(s, d)) — an order-insensitive set
    fingerprint of a distinct (s, d) edge frame; one aggregate job."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("s", "d").cast("decimal(28,0)")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components_labelprop(
    edges: DataFrame,
    src: str = "vec_a",
    dst: str = "vec_b",
    max_iter: int = 50,
) -> DataFrame:
    """Reference implementation: pointer-jump min-label propagation.
    Returns (v, component) where ``component`` is the smallest vertex
    id reachable from ``v``. Iterative (Spark jobs in a driver loop),
    so it lives OUTSIDE the oracle-checkable path by design — the
    driver contract has no SQL analogue for a fixed-point loop (the d9
    oracle restates it as a DuckDB recursive CTE instead).

    Each round does min-label PROPAGATION (join labels onto the
    undirected adjacency, min over neighbors, least() with own label)
    followed by one POINTER-JUMP (path halving: component <-
    component's component). Propagation alone needs graph-diameter
    rounds — the sf1 rehearsal's amplified corpus produced chains that
    did NOT converge in 25 — while the jump halves remaining chain
    depth per round, so convergence is O(log diameter): the same
    corpus converges in 8 rounds.

    Three things keep per-round cost CONSTANT (measured: naive
    persist-only labels went 1.4 s -> 288 s by round 6 at sf1):
    - ``localCheckpoint(eager=True)`` truncates label lineage to an
      RDD leaf each round. On a real cluster prefer a reliable
      ``checkpoint`` dir (localCheckpoint is lost with an executor);
      semantics are identical.
    - checkpointing alone is NOT enough: Spark's ``Dataset
      .localCheckpoint`` carries the ORIGIN plan's size-in-bytes
      statistics onto the checkpointed leaf, and Catalyst's join
      estimation MULTIPLIES child sizes — so each round SQUARES the
      stat and the BigInteger's bit length doubles per iteration
      (measured 34 -> 66 -> 130 -> ... -> 8263 bits by round 8;
      planning cost grows exponentially until
      "BigInteger would overflow supported range"). ``_ckpt_fresh``
      therefore rebuilds the DataFrame from the checkpointed RDD,
      which resets the leaf to default stats — measured flat 63-bit
      stats and ~0.25 s/round over 30 rounds on the same loop that
      previously hit 125 s/round by round 22.
    - the edge list is materialized ONCE into a persisted DataFrame
      (the band-path pair search above it is expensive) before the
      union builds the adjacency.

    Label state is one row per DISTINCT vertex of the edge set —
    near-dup vertices only, never the corpus — so the loop's state is
    tiny at any scale. Per-round cost is constant but does NOT shrink;
    :func:`connected_components_star` (now the default) contracts the
    edge set each round and replaced this as the scale path."""
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    e.count()  # one materialization of the expensive pair search
    adj = _ckpt_fresh(
        e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    )
    e.unpersist()
    labels = _ckpt_fresh(
        adj.select(F.col("s").alias("v"))
        .distinct()
        .withColumn("component", F.col("v"))
    )
    for _ in range(max_iter):
        nbr_min = (
            adj.join(labels, adj["d"] == labels["v"])
            .groupBy("s")
            .agg(F.min("component").alias("nbr_min"))
        )
        prop = labels.join(
            nbr_min, labels["v"] == nbr_min["s"], "left"
        ).select(
            "v",
            F.least(
                F.col("component"),
                F.coalesce("nbr_min", F.col("component")),
            ).alias("component"),
        )
        # ONE pointer jump (follow the label's own label one hop):
        # halves remaining chain depth per round. A second jump within
        # the round was measured SLOWER (109 s vs 42 s for d9 at sf1):
        # the self-join references the un-checkpointed subtree twice,
        # so each extra jump re-executes the whole round pipeline —
        # recompute cost beats the saved rounds.
        ptr = prop.select(
            F.col("v").alias("pv"), F.col("component").alias("pc")
        )
        new_labels = _ckpt_fresh(
            prop.join(ptr, prop["component"] == ptr["pv"], "left")
            .select(
                "v",
                F.least(
                    F.col("component"),
                    F.coalesce("pc", F.col("component")),
                ).alias("component"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def semantic_dedup_cc(
    docs: DataFrame,
    emb: DataFrame,
    threshold: float = 0.4,
    emb_fingerprint: tuple[int, int] | None = None,
) -> DataFrame:
    """Connected-components variant of :func:`semantic_dedup`: resolve
    near-dup CHAINS transitively, keeping exactly one doc (the
    smallest id) per component. Same candidates (the sim2 adaptive
    band path), same verify; only the keep/drop rule differs —
    ``dup_of`` is the component's canonical doc rather than the
    smallest direct partner, so A<-B<-C drops C to A even when (A, C)
    was never a verified pair. Guarantees drop-set ⊇ the greedy
    rule's; equality holds when every non-minimal doc has a lower-id
    neighbor (tests/test_graph_dedup.py asserts both laws)."""
    from .similarity import cosine_neardup_pairs

    # persisted for the same cache-manager dedupe as semantic_dedup
    # (one shared pairs-at-threshold materialization per session);
    # doubly important here because connected_components drives
    # ITERATIVE jobs over the pairs at plan-build time — uncached,
    # every label-prop round re-ran the candidate join + verify.
    pairs = cosine_neardup_pairs(
        emb, threshold, fingerprint=emb_fingerprint
    ).persist(StorageLevel.MEMORY_AND_DISK)
    comp = connected_components(pairs)
    dropped = comp.filter(F.col("v") != F.col("component"))
    return dropped.join(
        docs.select("doc_id", "lang"),
        dropped["v"] == F.col("doc_id"),
    ).select("doc_id", "lang", F.col("component").alias("dup_of"))


def minhash_dup_groups(
    docs: DataFrame,
    threshold: float = 0.5,
    fingerprint: tuple[int, int] | None = None,
) -> DataFrame:
    """d10: canonical dup-GROUP assignment over the MinHash near-dup
    graph — the operator a dedup pipeline actually executes at the end:
    every document in any near-dup component gets its group's canonical
    representative (smallest doc_id) and the group size, so the keep
    set is `is_canonical` and the drop set carries provenance.

    Built by composition: d4's banded MinHash pair search (linear in
    corpus, never all-pairs) feeds :func:`connected_components`
    (pointer-jump label propagation, O(log diameter) rounds), then one
    groupBy for sizes. Scale notes are inherited from both — the only
    new shuffle is the size aggregation over component labels, keyed
    by component id (bounded by near-dup vertex count, not corpus)."""
    pairs = minhash_neardup_pairs(docs, threshold, fingerprint).select(
        "doc_a", "doc_b"
    )
    comp = connected_components(pairs, "doc_a", "doc_b")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    return comp.join(sizes, "component").select(
        F.col("v").alias("doc_id"),
        F.col("component").alias("canonical_doc_id"),
        "group_size",
        (F.col("v") == F.col("component")).alias("is_canonical"),
    )


def benchmark_membership(salt: str = "bench") -> Column:
    """Deterministic heldout-set membership for :func:`decontaminate`:
    a doc is "benchmark" when the last hex nibble of
    ``md5(salt|doc_id)`` lands in {0, 1} (a fixed 1/8 split). md5 of
    the decimal doc_id string is byte-identical across Spark, DuckDB
    and Python, so the split is reproducible everywhere without
    materializing a membership table."""
    h = F.md5(F.concat(F.lit(salt + "|"), F.col("doc_id").cast("string")))
    return F.substring(h, 32, 1).isin("0", "1")


def decontaminate(
    docs: DataFrame,
    min_bp: int = 1000,
    fingerprint: tuple[int, int] | None = None,
) -> DataFrame:
    """d8: benchmark decontamination — flag training documents whose
    n-gram (bigram-shingle) overlap with a heldout benchmark corpus is
    high enough to contaminate evaluation, the n-gram-overlap decontam
    rule used by large pretraining pipelines (the reference has no
    analogue; this extends its dedup family to the train/eval split).

    The corpus splits deterministically via
    :func:`benchmark_membership` (~1/8 benchmark, ~7/8 training).
    A training doc is contaminated when >= ``min_bp`` basis points
    (default 10%) of its distinct shingles appear in ANY benchmark
    document. Output: one row per contaminated doc — (doc_id, lang,
    n_shingles, n_contaminated, contamination_bp).

    Scale design: benchmark corpora are small by construction (the
    1/8 split here is an upper bound; real eval sets are ~1e4 docs),
    so the distinct benchmark-shingle set is broadcast and the
    training side is a map-side hash probe — no shuffle of the big
    side by shingle. The only full shuffles are the shingle build
    (window by doc_id) and one groupBy(doc_id) that computes totals
    and overlaps together off the broadcast left join. If the
    benchmark side ever outgrows broadcast, drop the hint and the
    same plan becomes a shuffle join on sh — semantics unchanged."""
    sh = shingle_rows(docs, fingerprint=fingerprint).withColumn(
        "is_bench", benchmark_membership()
    )
    bench_sh = (
        sh.filter(F.col("is_bench")).select("sh").distinct()
        .withColumn("hit", F.lit(1).cast("long"))
    )
    train = sh.filter(~F.col("is_bench")).select("doc_id", "sh")
    per_doc = (
        train.join(F.broadcast(bench_sh), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.coalesce(F.sum("hit"), F.lit(0).cast("long")).alias(
                "n_contaminated"
            ),
        )
    )
    bp = F.round(
        F.col("n_contaminated") * 10000.0 / F.col("n_shingles")
    ).cast("long")
    return (
        per_doc.withColumn("contamination_bp", bp)
        .filter(F.col("contamination_bp") >= min_bp)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_shingles",
            "n_contaminated",
            "contamination_bp",
        )
    )


def containment_pairs(
    docs: DataFrame,
    threshold_pm: int = 800,
    fingerprint: tuple[int, int] | None = None,
) -> DataFrame:
    """d11: containment scoring over the LSH candidate pairs —
    C(A|B) = |A∩B| / |A| per direction. Jaccard misses near-SUBSET
    relationships (a short doc quoted inside a long one has high
    containment but low Jaccard); this is the boilerplate/quotation
    detector a curation pipeline runs next to the symmetric near-dup
    pass. Pairs where either direction's containment (per-mille,
    integer-rounded so the threshold compare is float-free) reaches
    ``threshold_pm`` are emitted with both directions' scores.

    Recall caveat (documented, inherent): candidates come from the
    MinHash band index, which is Jaccard-tuned — a tiny doc inside a
    huge one may never band-collide. At scale the fix is a dedicated
    containment index (bottom-k sketches of the SMALLER side probing
    the bigger side's inverted shingle index, d8's decontamination
    shape); the scoring stage here is index-agnostic.

    Scale design: identical to d4's verify — bounded candidate pairs
    join the materialized shingle sets; no new shuffles beyond the
    band path it shares (the persisted shingle subtree substitutes).
    """
    sh = doc_shingle_sets(docs, fingerprint)
    j = (
        lsh_candidate_pairs(docs, fingerprint)
        .join(
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
    out = j.select(
        "doc_a",
        "doc_b",
        inter.alias("shingles_common"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
    )
    c_a = F.round(F.col("shingles_common") * 1000.0 / F.col("n_a")).cast(
        "long"
    )
    c_b = F.round(F.col("shingles_common") * 1000.0 / F.col("n_b")).cast(
        "long"
    )
    return (
        out.withColumn("containment_a_pm", c_a)
        .withColumn("containment_b_pm", c_b)
        .filter(
            F.greatest("containment_a_pm", "containment_b_pm")
            >= F.lit(threshold_pm)
        )
    )


def editdist_neardup(
    docs: DataFrame,
    threshold: int = 8,
    key_len: int = 40,
    fingerprint: tuple[int, int] | None = None,
) -> DataFrame:
    """d12: edit-distance near-duplicate verification — the fuzzy-key
    entity-resolution verifier: MinHash LSH does the blocking (the
    same candidate generator d3/d4 use — never all-pairs), then each
    candidate pair is verified by Levenshtein distance over a bounded
    normalized key (the first ``key_len`` chars). Complements d4's
    Jaccard verify: Jaccard sees bag-of-shingles overlap and is blind
    to ORDER; edit distance is exactly order-sensitive, so a pair of
    docs built from the same words rearranged passes d4 and fails
    here.

    Scale: candidates are LSH-bucketed (linear in corpus), and the
    O(key_len^2) DP cost per pair is constant because the key is
    bounded — running Levenshtein on full documents would be quadratic
    in document length, which is why the key, not the text, is
    compared. ``levenshtein`` is a JVM built-in (and a DuckDB
    built-in with identical semantics), so the verify stays in
    whole-stage codegen.
    """
    keys = docs.select(
        "doc_id", F.substring("text", 1, key_len).alias("k")
    )
    pairs = lsh_candidate_pairs(docs, fingerprint)
    j = (
        pairs.join(
            keys.select(
                F.col("doc_id").alias("doc_a"), F.col("k").alias("k_a")
            ),
            "doc_a",
        )
        .join(
            keys.select(
                F.col("doc_id").alias("doc_b"), F.col("k").alias("k_b")
            ),
            "doc_b",
        )
        .withColumn(
            "edit_dist", F.levenshtein("k_a", "k_b").cast("long")
        )
    )
    return j.filter(F.col("edit_dist") <= threshold).select(
        "doc_a", "doc_b", "edit_dist"
    )

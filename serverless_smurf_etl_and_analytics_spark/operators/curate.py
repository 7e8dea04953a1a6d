"""Corpus-curation operators for LLM training-data pipelines:
deterministic stratified sampling and token-budget sequence packing.

Like the rest of the ML layer these extend the reference's dedup/
analysis family (SURVEY.md LLM-pipeline brief) — the reference has no
analogue; the semantics follow standard pretraining-pipeline practice.

Determinism rules for oracle parity (see plans/registry_ml.py): all
randomness is md5-derived (hex output byte-identical across Spark,
DuckDB, Python), all arithmetic is integer, so both operators are
fully hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import tokens_col

# Per-language keep rates (percent) for the registered t6 query:
# downsample the dominant language, keep the low-resource ones — the
# language-rebalancing step of a pretraining data mix.
DEFAULT_RATES = {"en": 40, "es": 80, "de": 80, "fr": 80, "zh": 80}
U32 = 1 << 32


def stratified_sample(
    docs: DataFrame,
    rates_pct: dict[str, int] | None = None,
    default_pct: int = 100,
    salt: str = "sample",
) -> DataFrame:
    """t6: deterministic per-stratum (language) sampling — keep a doc
    iff the first 32 bits of ``md5(salt|doc_id)`` fall below its
    stratum's rate. The decision is a pure function of (doc_id, salt),
    so the sample is reproducible across engines and runs, stable
    under corpus growth (existing docs never flip), and the keep
    probability is exact to 1/2^32.

    Scale design: a single narrow filter — no shuffle, no sampling
    state, fully pushed into whole-stage codegen; at 100 TB it is a
    scan with a cheap predicate. The integer compare
    ``u * 100 < pct * 2^32`` avoids float thresholds entirely."""
    rates = DEFAULT_RATES if rates_pct is None else rates_pct
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt + "|"), F.col("doc_id").cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    pct = F.lit(default_pct)
    for lang, p in sorted(rates.items()):
        pct = F.when(F.col("lang") == lang, F.lit(p)).otherwise(pct)
    return docs.filter(u * 100 < pct * F.lit(U32)).select(
        "doc_id", "lang", "source", "n_chars"
    )


def pack_sequences(
    docs: DataFrame, budget_tokens: int = 256, by: str = "source"
) -> DataFrame:
    """pack1: token-budget sequence packing — assign documents to
    fixed-size training shards. Within each ``by`` stream, documents
    are laid out in doc_id order and a document's shard is the number
    of full ``budget_tokens`` windows before its first token
    (``floor(prev_cum_tokens / budget)``) — the greedy contiguous
    packing used to build fixed-length pretraining batches, with
    overflow spilling into the next shard.

    Output: (doc_id, stream, n_tokens, shard_id, offset_in_shard) —
    all integers, reproducible; registered with a window-cumsum DuckDB
    oracle (pack1).

    Scale design: one shuffle on the stream key plus a within-
    partition sort — the window never sees unbounded frames (running
    sum only). Stream keys bound skew: at 100 TB pick a stream key
    with enough cardinality (source x date, or a hash-salted split)
    so no single stream exceeds an executor's sort budget; packing is
    per-stream by construction so salting does not change semantics
    within a stream."""
    n_tok = F.size(tokens_col(F.col("text"))).cast("long")
    d = docs.select(
        "doc_id", F.col(by).alias("stream"), n_tok.alias("n_tokens")
    )
    w = (
        Window.partitionBy("stream")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_cum = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return d.select(
        "doc_id",
        "stream",
        "n_tokens",
        F.floor(prev_cum / budget_tokens).cast("long").alias("shard_id"),
        (prev_cum % budget_tokens).cast("long").alias("offset_in_shard"),
    )


def weighted_sample(docs: DataFrame, salt: str = "wsample") -> DataFrame:
    """w1: quality-weighted Bernoulli downsampling — each document is
    kept with probability proportional to its quality score (the t1
    stopword/uniqueness blend, as integer basis points), the standard
    "sample better data more" curation step between hard filters and
    uniform sampling.

    keep  iff  md5_u32(salt|doc_id) * 10000 < weight_bp * 2^32

    Pure integer compare (exact to 1/2^32, like stratified_sample);
    the decision is a function of (doc_id, salt, text) only, so the
    sample is reproducible across engines and stable under corpus
    growth. Zero-quality and empty documents have weight 0 and are
    never kept.

    Scale design: one narrow whole-stage-codegen filter over the scan
    — the weight derives from per-row token arrays (no shuffle, no
    state), so at 100 TB this is a bandwidth-bound scan like t6."""
    toks = tokens_col(F.col("text"))
    d = docs.select(
        "doc_id",
        "lang",
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
        F.size(
            F.filter(toks, lambda w: w.isin("the", "a", "and", "of", "to", "in"))
        )
        .cast("long")
        .alias("n_stop"),
    )
    weight = F.when(
        F.col("n_tokens") > 0,
        F.round(
            (F.col("n_stop") * 3000.0 + F.col("n_uniq") * 7000.0)
            / F.col("n_tokens")
        ).cast("long"),
    ).otherwise(F.lit(0))
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + "|"), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (
        d.withColumn("weight_bp", weight)
        .filter(u * 10000 < F.col("weight_bp") * F.lit(U32))
        .select("doc_id", "lang", "source", "weight_bp")
    )


def curate_corpus(
    docs: DataFrame,
    min_tokens: int = 30,
    min_uniq_pct: int = 30,
    neardup_threshold: float = 0.5,
    _removals: DataFrame | None = None,
    _stats: DataFrame | None = None,
) -> DataFrame:
    """cur1: the end-to-end curation pipeline as ONE query — the
    composition every training-data run actually executes, built
    entirely from the registered stages so their individually-proven
    semantics compose:

    1. quality gates (t1's stats): n_tokens >= ``min_tokens`` and a
       unique-token ratio >= ``min_uniq_pct``% — drops fragments and
       degenerate repetition;
    2. near-dup removal (d4's MinHash+LSH pairs): for every verified
       pair, the higher doc_id is removed — the keep-lowest-id rule
       d7 documents;
    3. stratified sampling (t6's md5 rule): per-language rates,
       decision a pure function of doc_id.

    Output: the surviving corpus with its quality stats. Scale: gate
    1 and step 3 are narrow filters on a single scan; step 2 is the
    LSH-bucketed pair search (never all-pairs) feeding a broadcast-
    sized removal set (bounded by the duplicate count) into an
    anti-join.
    """
    from pyspark.storagelevel import StorageLevel

    from .dedup import minhash_neardup_pairs
    from .textops import tokens_col

    # r13: the per-doc token stats feed BOTH the quality gate and the
    # final output join — persist so the corpus is tokenized once per
    # session, not once per consumer (same session-owned lifetime as
    # the shingle cache inside minhash_neardup_pairs; released by
    # session.clear_operator_caches). ``_stats``/``_removals`` let
    # corpus_datasheet thread in ITS copies of the same subtrees so
    # the datasheet runs one LSH pair search and one tokenize pass,
    # not two of each (the composition is unchanged — identical
    # expressions, shared instead of rebuilt).
    stats = _stats
    if stats is None:
        stats = docs.select(
            "doc_id",
            F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
            F.size(F.array_distinct(tokens_col(F.col("text"))))
            .cast("long")
            .alias("n_unique"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
    removals = _removals
    if removals is None:
        removals = (
            minhash_neardup_pairs(docs, neardup_threshold)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
    gated = (
        docs.join(stats, "doc_id")
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("n_unique") * 100 >= F.col("n_tokens") * min_uniq_pct)
        )
        .join(removals, "doc_id", "left_anti")
    )
    sampled = stratified_sample(gated)
    return sampled.join(
        stats.select("doc_id", "n_tokens", "n_unique"), "doc_id"
    ).select("doc_id", "lang", "source", "n_chars", "n_tokens", "n_unique")


def corpus_datasheet(
    docs: DataFrame,
    neardup_threshold: float = 0.5,
    min_tokens: int = 30,
    min_uniq_pct: int = 30,
) -> DataFrame:
    """src1: the per-(source, lang) corpus datasheet — the summary a
    dataset release ships: document and token counts, near-duplicate
    rate, quality-gate pass rate, and the post-curation survivor
    count (cur1's exact rules re-aggregated). One row per stratum,
    all integer counts plus basis-point rates (single integer division
    per rate, no float accumulation).

    Scale: the stats scan and the LSH pair search are the same
    bounded plans cur1 uses — and (r13) they are COMPUTED once and
    shared: the per-doc stats table and the duplicate-removal set are
    persisted here and threaded into curate_corpus, so the datasheet
    runs one tokenize pass and one LSH pair search instead of two of
    each (guide §2.1 — the r12 composition rebuilt both subtrees
    inside the survivor branch). The final rollup is a tiny group-by
    on the (source, lang) grain.
    """
    from pyspark.storagelevel import StorageLevel

    from .dedup import minhash_neardup_pairs
    from .textops import tokens_col

    stats = docs.select(
        "doc_id",
        "source",
        "lang",
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tokens_col(F.col("text"))))
        .cast("long")
        .alias("n_unique"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # removal set: bounded by the duplicate count (never corpus-sized)
    removal_ids = (
        minhash_neardup_pairs(docs, neardup_threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    removals = removal_ids.withColumn("is_dup", F.lit(1))
    # forward EVERY knob to curate_corpus so n_curated/curated_bp are
    # computed under the same thresholds as dup_bp/quality_bp — with a
    # non-default threshold the datasheet would otherwise be
    # internally inconsistent (curate at defaults, rates at caller's)
    survivors = curate_corpus(
        docs,
        min_tokens=min_tokens,
        min_uniq_pct=min_uniq_pct,
        neardup_threshold=neardup_threshold,
        _removals=removal_ids,
        _stats=stats.select("doc_id", "n_tokens", "n_unique"),
    ).select("doc_id").withColumn("kept", F.lit(1))
    j = stats.join(removals, "doc_id", "left").join(
        survivors, "doc_id", "left"
    )
    g = j.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).alias("n_neardup"),
        F.sum(
            F.when(
                (F.col("n_tokens") >= min_tokens)
                & (
                    F.col("n_unique") * 100
                    >= F.col("n_tokens") * min_uniq_pct
                ),
                1,
            ).otherwise(0)
        ).alias("n_quality_pass"),
        F.sum(F.coalesce(F.col("kept"), F.lit(0))).alias("n_curated"),
    )
    return g.select(
        "source",
        "lang",
        "n_docs",
        "total_tokens",
        "n_neardup",
        "n_quality_pass",
        "n_curated",
        F.expr("n_neardup * 10000 div n_docs").alias("dup_bp"),
        F.expr("n_quality_pass * 10000 div n_docs").alias("quality_bp"),
        F.expr("n_curated * 10000 div n_docs").alias("curated_bp"),
    )


def train_eval_split(
    docs: DataFrame,
    test_bp: int = 100,
    val_bp: int = 200,
    salt: str = "split",
) -> DataFrame:
    """cur2: deterministic train/val/test assignment — the split every
    training run needs BEFORE any shuffling or sampling, with the
    property that matters at 100 TB: membership is a pure function of
    (doc_id, salt), so the split is reproducible across engines and
    runs, stable under corpus growth (new docs never move old ones
    between splits), and leakage-auditable (d8's decontamination can
    check train against val/test by recomputing the rule, no join to
    a membership table).

    bucket = md5_u32(salt|doc_id); the unit interval is carved
    [0, test_bp) test, [test_bp, test_bp+val_bp) val, rest train —
    the same exact integer compare as t6/w1:
    ``u * 10000 < bp * 2^32``.

    Scale design: one narrow whole-stage-codegen projection over the
    scan — no shuffle, no state, bandwidth-bound like t6."""
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + "|"), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    scaled = u * 10000
    split = (
        F.when(scaled < F.lit(test_bp) * F.lit(U32), F.lit("test"))
        .when(
            scaled < F.lit(test_bp + val_bp) * F.lit(U32), F.lit("val")
        )
        .otherwise(F.lit("train"))
    )
    return docs.select(
        "doc_id", "lang", "source", split.alias("split")
    )


def source_mixing_weights(docs: DataFrame) -> DataFrame:
    """mix1: temperature-scaled source mixing weights — the "data
    recipe" step that decides how often each source is sampled during
    training. Raw-proportional sampling lets one dominant crawl drown
    curated sources; temperature tau = 0.5 (weight ~ n_tokens^0.5,
    the standard multilingual/multi-source flattening) upsamples small
    high-quality sources while keeping large ones dominant.

    Determinism across engines: the weight base is
    ``floor(sqrt(n_tokens))`` — sqrt of a bigint is correctly rounded
    IEEE double in both Spark and DuckDB, and floor(sqrt(n)) equals
    integer isqrt for n < 2^52, so the base is integer-exact; the ppm
    share is one integer-scale rounding (round(w * 1e6 / sum(w))), the
    repo's money-layer convention, never an accumulated float.

    Scale design: one map-side-combined aggregation over the corpus
    scan to |sources| rows, then a window over that bounded dimension
    — fact rows are never reshuffled."""
    per = (
        docs.select(
            "source",
            F.size(tokens_col(F.col("text"))).cast("long").alias("n_tok"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
        .withColumn(
            "sqrt_weight",
            F.floor(F.sqrt(F.col("n_tokens"))).cast("long"),
        )
    )
    w_all = Window.partitionBy()
    return per.withColumn(
        "weight_ppm",
        F.round(
            F.col("sqrt_weight")
            * 1000000.0
            / F.sum("sqrt_weight").over(w_all)
        ).cast("long"),
    ).select(
        "source", "n_docs", "n_tokens", "sqrt_weight", "weight_ppm"
    )


def token_budget_select(docs: DataFrame, budget: int = 20000) -> DataFrame:
    """bud1: token-budget corpus selection — fill a training-token
    budget with the best-quality documents first, the "take the top N
    tokens" step that turns a scored corpus into a release. The rule
    is a deterministic prefix: order documents by (weight_bp DESC,
    doc_id ASC) — weight_bp is w1's integer stopword/uniqueness blend
    — take documents while the running token total stays <= budget,
    and stop at the first document that would cross it (later smaller
    documents do NOT back-fill; prefix semantics keep the selection a
    pure function of the ordering).

    Output: the selected corpus (doc_id, lang, weight_bp, n_tokens).

    Scale design: the naive form is a running sum over one GLOBAL
    ordering — a single-partition window that serializes the whole
    corpus through one task. Instead the prefix is resolved at the
    weight-BUCKET level: per-bucket token totals (<= 10001 rows,
    dimension-sized) get a cumulative sum on the driver-scale side,
    every bucket whose cumulative end fits the budget is taken whole
    via a broadcast semi-join, and only the single boundary bucket
    runs a per-document running sum (partitioned by its one weight
    value — the unavoidable sequential tail, bounded by one bucket's
    documents). Equality with the naive global-window rule is
    law-tested in tests/test_curate.py."""
    toks = tokens_col(F.col("text"))
    d = docs.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
        F.size(
            F.filter(
                toks, lambda w: w.isin("the", "a", "and", "of", "to", "in")
            )
        )
        .cast("long")
        .alias("n_stop"),
    )
    weight = F.when(
        F.col("n_tokens") > 0,
        F.round(
            (F.col("n_stop") * 3000.0 + F.col("n_uniq") * 7000.0)
            / F.col("n_tokens")
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    from pyspark.storagelevel import StorageLevel

    # persisted: the tokenize/score projection feeds both the bucket
    # ledger and the selection probe (different shapes, so exchange
    # reuse can't cover them); narrow 4-column rows, spills to disk at
    # scale — lifetime caller-owned (session.clear_operator_caches)
    d = d.select(
        "doc_id", "lang", "n_tokens", weight.alias("weight_bp")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # bucket ledger: one row per distinct weight_bp (<= 10001), so the
    # unpartitioned window is over a dimension-sized input by design
    wb = Window.orderBy(F.col("weight_bp").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    buckets = (
        d.groupBy("weight_bp")
        .agg(F.sum("n_tokens").alias("btok"))
        .withColumn("cum_end", F.sum("btok").over(wb))
        .withColumn("cum_before", F.col("cum_end") - F.col("btok"))
        .select(
            "weight_bp",
            "cum_before",
            (F.col("cum_end") <= budget).alias("full_in"),
            # <= (not <): a bucket whose cumulative START lands exactly
            # on the budget still admits its zero-token head docs under
            # the naive global rule (cum <= budget) — ADVICE r7. Still
            # disjoint from full_in (which needs cum_end <= budget) and
            # still unique: the next positive bucket's cum_before is
            # this one's cum_end > budget.
            (
                (F.col("cum_before") <= budget)
                & (F.col("cum_end") > budget)
            ).alias("boundary"),
        )
    )
    j = d.join(F.broadcast(buckets), "weight_bp")
    out_cols = ["doc_id", "lang", "weight_bp", "n_tokens"]
    full = j.filter("full_in").select(*out_cols)
    # DEGENERATE CORNER (documented, property-tested): the boundary
    # window partitions by the single boundary bucket's weight value,
    # so an adversarial corpus where EVERY doc shares one weight (e.g.
    # identical docs) runs this running sum over the whole corpus in
    # one task. Results stay exact (law: equality with the naive
    # global rule, incl. this corner — test_curate); the scale escape
    # hatch is a doc_id repartitionByRange + per-range offset pass,
    # deliberately not built until a real corpus needs it: genuine
    # weight collisions at corpus scale mean the weighting signal
    # itself has collapsed.
    wgrp = Window.partitionBy("weight_bp").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    bd = (
        j.filter("boundary")
        .withColumn("cum_in", F.sum("n_tokens").over(wgrp))
        .filter(F.col("cum_before") + F.col("cum_in") <= budget)
        .select(*out_cols)
    )
    return full.unionByName(bd)


def cross_source_dup_matrix(
    docs: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """src2: cross-source duplication matrix — for every unordered
    source pair, how many verified near-duplicate document pairs (the
    d4 MinHash+LSH pipeline at the same ``threshold``) straddle or
    stay inside it, normalized to parts-per-million of the pair space.
    The datasheet signal that tells a corpus builder WHICH feeds
    duplicate each other (mirror sites, re-crawls, syndication) rather
    than just how much duplication exists overall.

    Output: (source_a, source_b [lexicographic, a <= b], n_pairs,
    n_docs_a, n_docs_b, pair_space, dup_ppm) where pair_space is
    n_a * n_b for a != b and n_a * (n_a - 1) / 2 within a source, and
    dup_ppm = 1000000 * n_pairs // pair_space.

    Scale design: rides d4's bucketed band join (never all-pairs;
    shingle subtree persisted once by :func:`~.dedup.
    minhash_neardup_pairs`); the source attach joins the BOUNDED
    near-dup pair set against the narrow (doc_id, source) projection,
    and the matrix is |sources|² rows — dimension-sized."""
    from .dedup import minhash_neardup_pairs

    pairs = minhash_neardup_pairs(docs, threshold).select("doc_a", "doc_b")
    src = docs.select("doc_id", "source")
    lab = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
            ),
            "doc_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
            ),
            "doc_b",
        )
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
    )
    m = lab.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    j = (
        m.join(
            F.broadcast(
                per_src.select(
                    F.col("source").alias("source_a"),
                    F.col("n_docs").alias("n_docs_a"),
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                per_src.select(
                    F.col("source").alias("source_b"),
                    F.col("n_docs").alias("n_docs_b"),
                )
            ),
            "source_b",
        )
    )
    space = F.when(
        F.col("source_a") == F.col("source_b"),
        (F.col("n_docs_a") * (F.col("n_docs_a") - 1) / 2).cast("long"),
    ).otherwise(F.col("n_docs_a") * F.col("n_docs_b"))
    return j.select(
        "source_a",
        "source_b",
        "n_pairs",
        "n_docs_a",
        "n_docs_b",
        space.alias("pair_space"),
        F.floor(F.lit(1000000) * F.col("n_pairs") / space)
        .cast("long")
        .alias("dup_ppm"),
    )


def source_cap_sample(
    docs: DataFrame, cap: int = 60, salt: str = "cap"
) -> DataFrame:
    """cap1: per-source document cap — keep at most ``cap`` documents
    per source, chosen by md5 order (a deterministic uniform draw),
    the per-domain cap every web-scale corpus applies so no single
    feed dominates the mix. The draw is a pure function of
    (doc_id, salt): re-running on a grown corpus can only displace
    docs whose hash ranks past the cap, never reshuffle the kept set
    arbitrarily.

    Output: (doc_id, lang, source, src_rank) for kept docs,
    src_rank in [1, cap].

    Scale design: one window rank partitioned by source — the shuffle
    key is the source, so skew follows feed size; a pathological
    mega-source still sorts within its partitions via spillable
    external sort, and the rank is the only state. No global
    ordering anywhere."""
    h = F.md5(
        F.concat(F.lit(salt + "|"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    return (
        docs.select("doc_id", "lang", "source", h.alias("h"))
        .withColumn("src_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("src_rank") <= cap)
        .select("doc_id", "lang", "source", "src_rank")
    )


def deterministic_shuffle(
    docs: DataFrame, salt: str = "shuf"
) -> DataFrame:
    """shuf1: deterministic global training order — every document
    gets a dense 1-based ``shuffle_rank`` in md5 order, the
    reproducible corpus permutation a training run uses for example
    order (same salt -> same order, on any engine, any partitioning).

    Scale design: a global row_number is a single-partition window, so
    the rank is assembled TWO-LEVEL instead: the first md5 byte splits
    the corpus into 256 buckets whose counts form a broadcastable
    cumulative-offset ledger, and each bucket ranks internally
    (partitioned window); rank = bucket offset + within-bucket row
    number. Because the bucket is a PREFIX of the sort key, bucket
    order concatenated with within-bucket order IS the global md5
    order — law-tested against the naive global window in
    tests/test_curate.py."""
    h = F.md5(
        F.concat(F.lit(salt + "|"), F.col("doc_id").cast("string"))
    )
    d = docs.select("doc_id", h.alias("h")).withColumn(
        "bucket", F.substring("h", 1, 2)
    )
    ledger = (
        d.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0).cast("long"),
            ),
        )
        .select("bucket", "offset")
    )
    wb = Window.partitionBy("bucket").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    return (
        d.join(F.broadcast(ledger), "bucket")
        .withColumn(
            "shuffle_rank",
            (F.col("offset") + F.row_number().over(wb)).cast("long"),
        )
        .select("doc_id", F.col("h").alias("shuffle_key"), "shuffle_rank")
    )


def release_order(
    docs: DataFrame, cap: int = 60, budget: int = 20000
) -> DataFrame:
    """rel1: the corpus RELEASE pipeline as one query — the
    composition a training run executes after curation: cap each
    source at ``cap`` docs (cap1's md5 rule), fill the token budget
    best-quality-first over the capped pool (bud1's bucket-resolved
    prefix), then assign the reproducible training order (shuf1's
    two-level md5 rank) over exactly the selected set. Built entirely
    from the registered stages so their individually-proven semantics
    compose; every rule is a pure function of (doc_id, text, source),
    so the release is re-derivable byte-for-byte from the raw corpus.

    Output: (doc_id, lang, source, weight_bp, n_tokens, shuffle_rank)
    — the release manifest in training order domain (rank dense in
    [1, n_selected])."""
    kept = source_cap_sample(docs, cap).select("doc_id")
    capped = docs.join(kept, "doc_id")
    sel = token_budget_select(capped, budget)
    ranked = deterministic_shuffle(sel).select("doc_id", "shuffle_rank")
    return (
        sel.join(ranked, "doc_id")
        .join(docs.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "source",
            "weight_bp",
            "n_tokens",
            "shuffle_rank",
        )
    )

"""Text-analysis operators for LLM training-data pipelines
(BASELINE.json north-star extensions; run on the driver's ``documents``
table).

All pure JVM-side expression work — tokenization, ratios, language
scoring, fingerprints — no Python UDFs, so the whole layer stays inside
whole-stage codegen and scales linearly with document count.

Determinism rules for oracle parity: token counts/ratios are integer
arithmetic; any fractional output rounds at integer scale
(functions.money.round_to rationale); fingerprints are md5 (identical
in Spark and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "and", "of", "to", "in")

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and"),
    "es": ("el", "la", "los"),
    "de": ("der", "die", "und"),
    "fr": ("le", "les", "et"),
    "zh": ("de", "shi", "zai"),
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization with empty-token stripping (empty text
    => empty array, same in both engines)."""
    return F.filter(
        F.split(F.trim(text), r"\s+"), lambda w: w != F.lit("")
    )


def text_stats(docs: DataFrame) -> DataFrame:
    """Token counting + quality scoring (length / stopword / uniqueness
    ratios) — the quality-score stage of a pretraining data pipeline."""
    toks = tokens_col(F.col("text"))
    d = docs.withColumn("toks", toks).withColumn(
        "uniq", F.array_distinct(F.col("toks"))
    )
    n = F.size("toks")
    n_uniq = F.size("uniq")
    char_sum = F.aggregate(
        F.transform(F.col("toks"), F.length),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_stop = F.size(
        F.filter(F.col("toks"), lambda w: w.isin(*STOPWORDS))
    )
    stop_ratio = F.col("n_stopwords") / F.col("n_tokens")
    uniq_ratio = F.col("n_unique") / F.col("n_tokens")
    quality = (
        F.round((stop_ratio * 0.3 + uniq_ratio * 0.7) * 1000.0).cast("long")
        / 1000.0
    ).cast("double")
    return (
        d.select(
            "doc_id",
            "lang",
            F.length("text").cast("long").alias("char_len"),
            n.cast("long").alias("n_tokens"),
            n_uniq.cast("long").alias("n_unique"),
            char_sum.alias("char_sum"),
            n_stop.cast("long").alias("n_stopwords"),
        )
        .withColumn(
            "avg_token_len",
            F.when(
                F.col("n_tokens") > 0,
                (
                    F.round(F.col("char_sum") * 10.0 / F.col("n_tokens"))
                    .cast("long") / 10.0
                ).cast("double"),
            ),
        )
        .withColumn(
            "quality_score",
            F.when(F.col("n_tokens") > 0, quality),
        )
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Language-ID heuristic: marker-word hit counts per language,
    argmax with a fixed priority order on ties. (The synthetic corpus
    is shared-vocabulary, so this demonstrates the operator shape; on
    real data the marker lexicons do the work.)"""
    toks = tokens_col(F.col("text"))
    d = docs.withColumn("toks", toks)
    def marker_filter(markers: tuple[str, ...]):
        # closure factory: a default-arg lambda would change the HOF
        # arity and be misread as a (value, index) lambda
        return lambda w: w.isin(*markers)

    scores = {
        lang: F.size(
            F.filter(F.col("toks"), marker_filter(markers))
        ).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }
    d = d.select(
        "doc_id",
        "lang",
        *[c.alias(f"score_{lang}") for lang, c in scores.items()],
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_MARKERS])
    pred = F.lit("und")
    # reversed() so earlier entries win ties (when-ladder order)
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return d.withColumn("predicted_lang", pred).withColumn(
        "is_match", (F.col("predicted_lang") == F.col("lang")).cast("boolean")
    )


# BPE-ish pre-tokenizer: letter runs | digit runs | single
# non-alphanumeric symbol — the GPT-2-style pre-tokenization shape
# (without learned merges), portable between Java regex and RE2
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_bpe(docs: DataFrame) -> DataFrame:
    """t4: token counting both ways (whitespace + a BPE-ish regex):
    whitespace token count vs the BPE-ish pre-token count, plus
    punctuation-symbol and digit-run counts and the subword expansion
    ratio (2-decimal) — the budget/packing statistics a pretraining
    pipeline computes per document. Pure codegen regex work."""
    ws = tokens_col(F.col("text"))
    bpe = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0))
    d = docs.withColumn("ws", ws).withColumn("bp", bpe)
    n_ws = F.size("ws").cast("long")
    n_bpe = F.size("bp").cast("long")
    n_punct = F.size(
        F.filter(F.col("bp"), lambda t: t.rlike("^[^A-Za-z0-9]$"))
    ).cast("long")
    n_digit = F.size(
        F.filter(F.col("bp"), lambda t: t.rlike("^[0-9]+$"))
    ).cast("long")
    ratio = F.when(
        n_ws > 0,
        (F.round(n_bpe * 100.0 / n_ws).cast("long") / 100.0).cast("double"),
    )
    return d.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        n_punct.alias("n_punct"),
        n_digit.alias("n_digit_runs"),
        ratio.alias("bpe_per_word"),
    )


def rolling_fingerprint(docs: DataFrame, n: int = 4) -> DataFrame:
    """t5: rolling-window document fingerprint: hash every sliding
    n-token window (the relational form of a Rabin-Karp rolling hash —
    exploded rows hash each window exactly once, one shuffle by doc)
    and keep the minimum digest (winnowing-style selection) plus the
    distinct-window count. Documents sharing any long text run agree on
    many window hashes; the min digest is a cheap containment
    signature. Docs with <n tokens get a null fingerprint and 0
    windows."""
    from .dedup import shingle_rows  # lazy: dedup imports this module

    sh = shingle_rows(docs, n)
    g = sh.groupBy("doc_id").agg(
        F.min(F.md5("sh")).alias("rolling_fp"),
        F.countDistinct("sh").alias("n_windows"),
    )
    return (
        docs.select("doc_id")
        .join(g, "doc_id", "left")
        .select(
            "doc_id",
            "rolling_fp",
            F.coalesce(F.col("n_windows"), F.lit(0)).cast("long").alias(
                "n_windows"
            ),
        )
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized,
    lowercased text + a shard prefix (the rolling-hash fingerprint of
    SURVEY's text-analysis extension, as a content-addressable key)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    fp = F.md5(norm)
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 8).alias("fp_prefix"),
        F.length(norm).cast("long").alias("norm_len"),
    )

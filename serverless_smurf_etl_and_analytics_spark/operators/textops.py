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

"""Registry entries for the LLM-data-pipeline extensions (text
analysis, dedup, similarity search) with DuckDB oracles.

Hashing parity strategy: every signature/bucket is built from md5 (hex
output is byte-identical across engines) and all numeric similarity is
exact integer fixed-point — so even MinHash/SimHash/LSH stages are
fully oracle-checkable, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import tables
from ..operators import (
    clustering,
    curate,
    dedup,
    multimodal,
    similarity,
    textops,
)
from .registry import register

# the tokenization/stopword fragments live in the leaf module
# sql_text.py so registry_stats can share them cycle-free
# All shared fragments live in the leaf module sql_text.py (no
# registry imports) so every registry_* module — and tests — can pull
# them without a cycle, whichever module Python loads first. The
# re-exports keep existing import sites working.
from .sql_text import (  # noqa: F401
    SQL_JACCARD,
    SQL_LSH_PAIRS,
    SQL_SHINGLES,
    SQL_SIG,
    SQL_TOKS,
    STOP_SQL,
)

# ---- text analysis -------------------------------------------------------

register(
    "t1_text_stats",
    lambda spark, sf: textops.text_stats(tables.load(spark, sf, "documents")),
    f"""
WITH {SQL_TOKS},
s AS (
    SELECT
        doc_id,
        lang,
        cast(length(text) AS bigint)              AS char_len,
        cast(len(toks) AS bigint)                 AS n_tokens,
        cast(len(list_distinct(toks)) AS bigint)  AS n_unique,
        cast(coalesce(
            list_sum(list_transform(toks, w -> length(w))), 0)
            AS bigint)                            AS char_sum,
        cast(len(list_filter(toks, w -> w IN {STOP_SQL}))
            AS bigint)                            AS n_stopwords
    FROM toks_t
)
SELECT
    doc_id, lang, char_len, n_tokens, n_unique, char_sum, n_stopwords,
    CASE WHEN n_tokens > 0 THEN
        cast(cast(round(char_sum * 10.0 / n_tokens) AS bigint) / 10.0
             AS double)
    END AS avg_token_len,
    CASE WHEN n_tokens > 0 THEN
        cast(cast(round(((n_stopwords / n_tokens) * 0.3
                         + (n_unique / n_tokens) * 0.7) * 1000.0) AS bigint)
             / 1000.0 AS double)
    END AS quality_score
FROM s
""",
)

_MARKERS_SQL = {
    "en": "('the', 'a', 'and')",
    "es": "('el', 'la', 'los')",
    "de": "('der', 'die', 'und')",
    "fr": "('le', 'les', 'et')",
    "zh": "('de', 'shi', 'zai')",
}
_SCORES = ",\n        ".join(
    f"cast(len(list_filter(toks, w -> w IN {m})) AS bigint) AS score_{lang}"
    for lang, m in _MARKERS_SQL.items()
)
_BEST = "greatest(" + ", ".join(f"score_{lang}" for lang in _MARKERS_SQL) + ")"
_PRED = (
    "CASE "
    + " ".join(
        f"WHEN score_{lang} = {_BEST} AND {_BEST} > 0 THEN '{lang}'"
        for lang in _MARKERS_SQL
    )
    + " ELSE 'und' END"
)

register(
    "t2_lang_id",
    lambda spark, sf: textops.lang_id(tables.load(spark, sf, "documents")),
    f"""
WITH {SQL_TOKS},
s AS (
    SELECT
        doc_id, lang,
        {_SCORES}
    FROM toks_t
)
SELECT
    doc_id, lang, score_en, score_es, score_de, score_fr, score_zh,
    {_PRED} AS predicted_lang,
    ({_PRED} = lang) AS is_match
FROM s
""",
)

register(
    "t3_fingerprint",
    lambda spark, sf: textops.fingerprint(tables.load(spark, sf, "documents")),
    r"""
WITH n AS (
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
           length(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
               AS nlen
    FROM documents
)
SELECT doc_id, fp AS fingerprint, substring(fp, 1, 8) AS fp_prefix,
       cast(nlen AS bigint) AS norm_len
FROM n
""",
)

register(
    "t4_token_count_bpe",
    lambda spark, sf: textops.token_count_bpe(
        tables.load(spark, sf, "documents")
    ),
    rf"""
WITH {SQL_TOKS},
b AS (
    SELECT
        doc_id, toks,
        regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS bp
    FROM toks_t
)
SELECT
    doc_id,
    cast(len(toks) AS bigint) AS n_ws_tokens,
    cast(len(bp) AS bigint)   AS n_bpe_tokens,
    cast(len(list_filter(bp, x -> regexp_matches(x, '^[^A-Za-z0-9]$')))
         AS bigint)           AS n_punct,
    cast(len(list_filter(bp, x -> regexp_matches(x, '^[0-9]+$')))
         AS bigint)           AS n_digit_runs,
    CASE WHEN len(toks) > 0 THEN
        cast(cast(round(len(bp) * 100.0 / len(toks)) AS bigint) / 100.0
             AS double)
    END AS bpe_per_word
FROM b
""",
)

register(
    "t5_rolling_fingerprint",
    lambda spark, sf: textops.rolling_fingerprint(
        tables.load(spark, sf, "documents"), 4
    ),
    f"""
WITH {SQL_TOKS},
sh4 AS (
    SELECT
        doc_id,
        list_distinct(list_transform(range(len(toks) - 3),
            i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3], toks[i+4])
        )) AS sh
    FROM toks_t
)
SELECT
    doc_id,
    list_aggregate(list_transform(sh, x -> md5(x)), 'min') AS rolling_fp,
    cast(len(sh) AS bigint) AS n_windows
FROM sh4
""",
)

# ---- dedup ---------------------------------------------------------------

register(
    "d1_exact_dedup",
    lambda spark, sf: dedup.exact_dedup(tables.load(spark, sf, "documents")),
    r"""
WITH d AS (
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
               AS fingerprint
    FROM documents
)
SELECT fingerprint, min(doc_id) AS canonical_doc_id, count(*) AS copies
FROM d
GROUP BY fingerprint
""",
)

register(
    "d2_minhash_signatures",
    lambda spark, sf: dedup.minhash_signatures(
        tables.load(spark, sf, "documents")
    ),
    f"""
WITH {SQL_SIG}
SELECT doc_id, {', '.join(f'mh_{i}' for i in range(8))}, band_0, band_1
FROM sigb
""",
)

register(
    "d3_lsh_candidate_pairs",
    lambda spark, sf: dedup.lsh_candidate_pairs(
        tables.load(spark, sf, "documents")
    ),
    f"""
WITH {SQL_LSH_PAIRS}
SELECT doc_a, doc_b FROM pairs
""",
)

register(
    "d4_minhash_neardup",
    lambda spark, sf: dedup.minhash_neardup_pairs(
        tables.load(spark, sf, "documents"), 0.5
    ),
    f"""
WITH {SQL_JACCARD}
SELECT
    doc_a, doc_b, shingles_common, shingles_union,
    CASE WHEN shingles_union > 0 THEN
        cast(cast(round(shingles_common * 1000.0 / shingles_union)
                  AS bigint) / 1000.0 AS double)
    END AS jaccard
FROM jac
WHERE CASE WHEN shingles_union > 0 THEN
        cast(cast(round(shingles_common * 1000.0 / shingles_union)
                  AS bigint) / 1000.0 AS double)
      END >= 0.5
""",
)


def _bit_sql(b: int) -> str:
    """±1 contribution of token w's md5 bit b — mirrors
    operators.dedup.simhash.bit_of exactly."""
    nib = (
        "(strpos('0123456789abcdef', "
        f"substr(md5(w), {b // 4 + 1}, 1)) - 1)"
    )
    return f"((cast(floor({nib} / {2 ** (b % 4)}) AS bigint) % 2) * 2 - 1)"


_SIM_BITS = ",\n        ".join(
    "CASE WHEN list_sum(list_transform(uniq, w -> "
    + _bit_sql(b)
    + ")) > 0 THEN '1' ELSE '0' END"
    for b in range(32)
)

SQL_SIMHASH = (
    SQL_TOKS
    + f""",
u AS (
    SELECT doc_id, list_distinct(toks) AS uniq FROM toks_t
),
sim AS (
    SELECT doc_id,
           concat_ws('',
        {_SIM_BITS}) AS simhash
    FROM u
)
"""
)

# 128-bit variant for d6: the sketch width is part of the operator's
# SEMANTICS (hamming <= 6 over a 128-bit sketch), and width is what
# survives scale — the candidate term is ~(h+1) * N^2 / 2^band_bits,
# so each config has a corpus size where its band space saturates and
# the search degenerates toward all-pairs. Measured on the sf10
# rehearsal (500k docs): 32-bit (7 bands of ~4 bits, 16-32 buckets)
# ran 268x on 100x docs; 64-bit (bands >= 9 bits) fixed that tier but
# still hit 15.9x on 10x docs at ~1k docs/bucket. 128 bits — the full
# md5 budget — keeps the 7 pigeonhole bands >= 18 wide (>= 262k bucket
# values/band), the regime the Manku et al. 2007 web-scale dedup setup
# runs in (64-bit sketch, 4-band splits of 16 bits at ~8B docs; same
# bucket-occupancy arithmetic).
_SIM_BITS128 = ",\n        ".join(
    "CASE WHEN list_sum(list_transform(uniq, w -> "
    + _bit_sql(b)
    + ")) > 0 THEN '1' ELSE '0' END"
    for b in range(128)
)

SQL_SIMHASH128 = (
    SQL_TOKS
    + f""",
u AS (
    SELECT doc_id, list_distinct(toks) AS uniq FROM toks_t
),
sim AS (
    SELECT doc_id,
           concat_ws('',
        {_SIM_BITS128}) AS simhash
    FROM u
)
"""
)

register(
    "d5_simhash",
    lambda spark, sf: dedup.simhash(tables.load(spark, sf, "documents")),
    f"""
WITH {SQL_SIMHASH}
SELECT doc_id, simhash, substring(simhash, 1, 8) AS block FROM sim
""",
)

# The oracle is the SPEC — a plain all-pairs Hamming filter. The Spark
# side reproduces it exactly via pigeonhole banding (guaranteed recall),
# so the hash check proves the banded plan computes the exact answer.
# 128-bit sketch (see SQL_SIMHASH128 note): the width that keeps band
# values discriminative as the corpus grows; the Spark side runs the
# word-array tier (dedup._simhash_neardup_pairs_wide) with the
# size-conditional broadcast.
register(
    "d6_simhash_neardup",
    lambda spark, sf: dedup.simhash_neardup_pairs(
        tables.load(spark, sf, "documents"), 6, bits=128
    ),
    f"""
WITH {SQL_SIMHASH128}
SELECT
    a.doc_id AS doc_a,
    b.doc_id AS doc_b,
    cast(len(list_filter(range(128),
        i -> substr(a.simhash, cast(i+1 AS int), 1)
             != substr(b.simhash, cast(i+1 AS int), 1))) AS bigint)
        AS hamming
FROM sim a
JOIN sim b
  ON a.doc_id < b.doc_id
WHERE cast(len(list_filter(range(128),
        i -> substr(a.simhash, cast(i+1 AS int), 1)
             != substr(b.simhash, cast(i+1 AS int), 1))) AS bigint) <= 6
""",
)

# ---- multimodal columns --------------------------------------------------
# The corpus has no binary column, so the operators project one
# deterministically (payload = utf-8 bytes of text, modality round-robin
# by doc_id) and then treat it as opaque bytes; md5 over those bytes is
# identical in both engines, so every stage stays hash-checked.

SQL_MM = """
mm AS (
    SELECT
        doc_id,
        (['image', 'audio', 'video'])[cast(doc_id % 3 AS int) + 1]
            AS modality,
        md5(text) AS fingerprint,
        cast(octet_length(encode(text)) AS bigint) AS n_bytes
    FROM documents
)
"""

register(
    "mm1_binary_fingerprint_dedup",
    lambda spark, sf: multimodal.binary_fingerprint_dedup(
        tables.load(spark, sf, "documents")
    ),
    f"""
WITH {SQL_MM}
SELECT
    modality,
    fingerprint,
    min(doc_id) AS canonical_doc_id,
    count(*)    AS copies,
    max(n_bytes) AS n_bytes
FROM mm
GROUP BY modality, fingerprint
""",
)

register(
    "mm2_modality_stats",
    lambda spark, sf: multimodal.modality_stats(
        tables.load(spark, sf, "documents")
    ),
    f"""
WITH {SQL_MM}
SELECT
    modality,
    count(*)                                  AS asset_count,
    cast(sum(n_bytes) AS bigint)              AS total_bytes,
    min(n_bytes)                              AS min_bytes,
    max(n_bytes)                              AS max_bytes,
    cast(cast(round(sum(n_bytes) * 10.0 / count(*)) AS bigint) / 10.0
         AS double)                           AS avg_bytes,
    cast(count(DISTINCT fingerprint) AS bigint) AS distinct_assets,
    cast(cast(round((1.0 - count(DISTINCT fingerprint) * 1.0 / count(*))
                    * 1000.0) AS bigint) / 1000.0 AS double) AS dup_ratio
FROM mm
GROUP BY modality
""",
)

register(
    "mm3_pairing_integrity",
    lambda spark, sf: multimodal.pairing_integrity(
        tables.load(spark, sf, "documents"),
        tables.load(spark, sf, "embeddings"),
    ),
    """
SELECT
    CASE WHEN d.doc_id IS NULL THEN 'embedding_only'
         WHEN e.vec_id IS NULL THEN 'text_only'
         ELSE 'paired' END AS status,
    count(*) AS n
FROM documents d
FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY 1
""",
)

# ---- similarity search ---------------------------------------------------

SQL_FIXED = """
fx AS (
    SELECT
        vec_id,
        label,
        list_transform(embedding,
            x -> cast(round(cast(x AS double) * 10000000) AS bigint)) AS iv
    FROM embeddings
),
fxn AS (
    SELECT vec_id, label, iv,
           cast(list_sum(list_transform(iv, x -> x * x)) AS bigint) AS n2
    FROM fx
)
"""

_DOT = (
    "cast(list_sum(list_transform(range(64), "
    "i -> a.iv[i+1] * b.iv[i+1])) AS bigint)"
)
_COS = f"cast({_DOT} AS double) / (sqrt(cast(a.n2 AS double)) * sqrt(cast(b.n2 AS double)))"

register(
    "sim1_cosine_topk",
    lambda spark, sf: similarity.cosine_topk(
        tables.load(spark, sf, "embeddings"), 5, 64
    ),
    f"""
WITH {SQL_FIXED},
scored AS (
    SELECT
        a.vec_id AS query_id,
        b.vec_id AS neighbor_id,
        b.label  AS neighbor_label,
        {_COS}   AS cos_raw
    FROM fxn a
    JOIN fxn b ON a.vec_id < 64 AND a.vec_id != b.vec_id
),
ranked AS (
    SELECT *,
        cast(row_number() OVER (
            PARTITION BY query_id
            ORDER BY cos_raw DESC, neighbor_id ASC) AS int) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, neighbor_label,
       cast(cast(round(cos_raw * 1000000.0) AS bigint) / 1000000.0
            AS double) AS cosine,
       rank
FROM ranked WHERE rank <= 5
""",
)

def _bucket_sql_literal(start_plane: int, n_planes: int) -> str:
    """Band bucket key with the SAME precomputed ±1 plane literals the
    Spark side embeds (similarity.PLANE_SIGNS); the md5-derivation of
    those literals stays engine-checked via sim3's inline-md5 oracle."""
    bits = []
    for p in range(start_plane, start_plane + n_planes):
        lst = "[" + ",".join(str(s) for s in similarity.PLANE_SIGNS[p]) + "]"
        bits.append(
            "CASE WHEN list_sum(list_transform(range(64), "
            f"i -> iv[i+1] * ({lst})[i+1])) > 0 THEN '1' ELSE '0' END"
        )
    return "concat(" + ", ".join(bits) + ")"


SQL_MULTIBAND = (
    SQL_FIXED
    + f""",
bk AS (
    SELECT vec_id, iv, n2,
        {', '.join(f'{_bucket_sql_literal(b * 8, 8)} AS bucket_{b}'
                   for b in range(8))}
    FROM fxn
),
eb2 AS (
    {' UNION ALL '.join(
        f"SELECT vec_id, {b} AS band_idx, bucket_{b} AS bucket FROM bk"
        for b in range(8))}
),
cpairs AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM eb2 a
    JOIN eb2 b
      ON a.band_idx = b.band_idx
     AND a.bucket = b.bucket
     AND a.vec_id < b.vec_id
)
"""
)

# Oracle validity: the SQL hardcodes the (8 bands x 8 planes) LSH
# config, which similarity.adaptive_band_config resolves to for any
# corpus under 4096 vectors — true at every driver scale (sf0.001/
# 0.01/0.1 = 20/200/2000 embeddings). Larger corpora get wider bands
# (the sf1 rehearsal's super-linear fix); re-deriving the SQL for
# those sizes means regenerating the bucket literals at the resolved
# (n_bands, band_planes).
register(
    "sim2_cosine_neardup",
    lambda spark, sf: similarity.cosine_neardup_pairs(
        tables.load(spark, sf, "embeddings"), 0.3
    ),
    f"""
WITH {SQL_MULTIBAND}
SELECT
    p.vec_a,
    p.vec_b,
    cast(cast(round(({_COS}) * 1000000.0) AS bigint) / 1000000.0
         AS double) AS cosine
FROM cpairs p
JOIN fxn a ON a.vec_id = p.vec_a
JOIN fxn b ON b.vec_id = p.vec_b
WHERE {_COS} > 0.3
""",
)


# d7: semantic (embedding-based) document dedup — SemDeDup recipe over
# the sim2 band path; same (8 x 8) oracle-validity bound as sim2.
# Pairing contract: vec_id == doc_id (mm3). sum(...) counts via the
# HUGEINT-safe bigint cast (driver-contract DuckDB quirk).
register(
    "d7_semantic_dedup",
    lambda spark, sf: dedup.semantic_dedup(
        tables.load(spark, sf, "documents"),
        tables.load(spark, sf, "embeddings"),
        0.4,
    ),
    f"""
WITH {SQL_MULTIBAND},
verified AS (
    SELECT
        p.vec_a,
        p.vec_b,
        cast(cast(round(({_COS}) * 1000000.0) AS bigint) / 1000000.0
             AS double) AS cosine
    FROM cpairs p
    JOIN fxn a ON a.vec_id = p.vec_a
    JOIN fxn b ON b.vec_id = p.vec_b
    WHERE {_COS} > 0.4
),
drops AS (
    SELECT
        vec_b,
        min(vec_a)                      AS dup_of,
        cast(count(*) AS bigint)        AS n_neardups,
        max(cosine)                     AS max_cosine
    FROM verified
    GROUP BY vec_b
)
SELECT
    d.doc_id,
    d.lang,
    dr.dup_of,
    dr.n_neardups,
    dr.max_cosine
FROM drops dr
JOIN documents d ON d.doc_id = dr.vec_b
""",
)


_DOT_FC = (
    "cast(list_sum(list_transform(range(64), "
    "i -> f.iv[i+1] * c.civ[i+1])) AS bigint)"
)

register(
    "sim4_ivf_topk",
    lambda spark, sf: similarity.ivf_topk(
        tables.load(spark, sf, "embeddings"), 3, 64, 16, 2
    ),
    f"""
WITH {SQL_FIXED},
cent AS (
    SELECT vec_id AS cid, iv AS civ, n2 AS cn2 FROM fxn WHERE vec_id < 16
),
assign AS (
    SELECT
        f.vec_id,
        c.cid,
        cast(row_number() OVER (
            PARTITION BY f.vec_id
            ORDER BY cast({_DOT_FC} AS double)
                     / (sqrt(cast(f.n2 AS double))
                        * sqrt(cast(c.cn2 AS double))) DESC,
                     c.cid ASC) AS int) AS crank
    FROM fxn f
    CROSS JOIN cent c
),
lists AS (SELECT vec_id AS neighbor_id, cid FROM assign WHERE crank = 1),
probes AS (
    SELECT vec_id AS query_id, cid FROM assign
    WHERE crank <= 2 AND vec_id < 64
),
cand AS (
    SELECT p.query_id, l.neighbor_id
    FROM probes p
    JOIN lists l ON l.cid = p.cid AND l.neighbor_id != p.query_id
),
scored AS (
    SELECT
        cd.query_id,
        cd.neighbor_id,
        {_COS} AS cos_raw
    FROM cand cd
    JOIN fxn a ON a.vec_id = cd.query_id
    JOIN fxn b ON b.vec_id = cd.neighbor_id
),
ranked AS (
    SELECT *,
        cast(row_number() OVER (
            PARTITION BY query_id
            ORDER BY cos_raw DESC, neighbor_id ASC) AS int) AS rank
    FROM scored
)
SELECT query_id, neighbor_id,
       cast(cast(round(cos_raw * 1000000.0) AS bigint) / 1000000.0
            AS double) AS cosine,
       rank
FROM ranked WHERE rank <= 3
""",
)


def _plane_sign_sql(p: int) -> str:
    nib = (
        "(strpos('0123456789abcdef', "
        f"substr(md5(concat({p}, '|', d)), 1, 1)) - 1)"
    )
    return (
        f"CASE WHEN {nib} % 2 = 0 THEN cast(1 AS bigint) "
        "ELSE cast(-1 AS bigint) END"
    )


_BUCKET = "concat(" + ", ".join(
    "CASE WHEN list_sum(list_transform(range(64), "
    f"d -> iv[d+1] * ({_plane_sign_sql(p)}))) > 0 THEN '1' ELSE '0' END"
    for p in range(8)
) + ")"

register(
    "sim3_lsh_topk",
    lambda spark, sf: similarity.lsh_topk(
        tables.load(spark, sf, "embeddings"), 3, 64
    ),
    f"""
WITH {SQL_FIXED},
bk AS (
    SELECT vec_id, iv, n2, {_BUCKET} AS bucket FROM fxn
),
scored AS (
    SELECT
        a.vec_id AS query_id,
        b.vec_id AS neighbor_id,
        {_COS}   AS cos_raw
    FROM bk a
    JOIN bk b
      ON a.bucket = b.bucket AND a.vec_id < 64 AND a.vec_id != b.vec_id
),
ranked AS (
    SELECT *,
        cast(row_number() OVER (
            PARTITION BY query_id
            ORDER BY cos_raw DESC, neighbor_id ASC) AS int) AS rank
    FROM scored
)
SELECT query_id, neighbor_id,
       cast(cast(round(cos_raw * 1000000.0) AS bigint) / 1000000.0
            AS double) AS cosine,
       rank
FROM ranked WHERE rank <= 3
""",
)


# d8: benchmark decontamination — training docs whose bigram-shingle
# overlap with the deterministic md5 heldout split is >= 10% (1000 bp).
# The oracle restates the spec directly: distinct-shingle rows, an
# EXISTS-style left join against the benchmark shingle set, one
# grouped count. Round-at-integer-scale keeps the bp column exact.
register(
    "d8_decontaminate",
    lambda spark, sf: dedup.decontaminate(
        tables.load(spark, sf, "documents"), 1000
    ),
    f"""
WITH {SQL_SHINGLES},
sh_rows AS (SELECT doc_id, unnest(sh) AS s FROM sh_t),
marked AS (
    SELECT doc_id,
           substr(md5('bench|' || cast(doc_id AS varchar)), 32, 1)
               IN ('0', '1') AS is_bench
    FROM documents
),
bench_sh AS (
    SELECT DISTINCT r.s
    FROM sh_rows r JOIN marked m USING (doc_id)
    WHERE m.is_bench
),
train AS (
    SELECT r.doc_id, r.s
    FROM sh_rows r JOIN marked m USING (doc_id)
    WHERE NOT m.is_bench
),
per_doc AS (
    SELECT
        t.doc_id,
        cast(count(*) AS bigint)  AS n_shingles,
        cast(count(b.s) AS bigint) AS n_contaminated
    FROM train t LEFT JOIN bench_sh b ON t.s = b.s
    GROUP BY t.doc_id
)
SELECT
    p.doc_id,
    d.lang,
    p.n_shingles,
    p.n_contaminated,
    cast(round(p.n_contaminated * 10000.0 / p.n_shingles) AS bigint)
        AS contamination_bp
FROM per_doc p JOIN documents d USING (doc_id)
WHERE cast(round(p.n_contaminated * 10000.0 / p.n_shingles) AS bigint)
      >= 1000
""",
)


_RATE_CASE = (
    "CASE lang "
    + " ".join(
        f"WHEN '{lang}' THEN {p}"
        for lang, p in sorted(curate.DEFAULT_RATES.items())
    )
    + " ELSE 100 END"
)

# t6: deterministic stratified sampling — the language-rebalancing
# step of a pretraining data mix. Keep iff the first 32 md5 bits fall
# under the stratum rate; pure integer compare, no float thresholds.
register(
    "t6_stratified_sample",
    lambda spark, sf: curate.stratified_sample(
        tables.load(spark, sf, "documents")
    ),
    f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE ('0x' || substr(md5('sample|' || cast(doc_id AS varchar)), 1, 8))
          ::bigint * 100
      < ({_RATE_CASE}) * 4294967296
""",
)


# ---- promoted from registry_pending (r4 rotation) ------------------------

# t7: Gopher-style token-repetition filter. The oracle restates the
# two-stage count directly; non-distinct bigrams via list_transform
# over the token array (the non-distinct twin of SQL_SHINGLES).
register(
    "t7_repetition_filter",
    lambda spark, sf: textops.repetition_stats(
        tables.load(spark, sf, "documents")
    ),
    f"""
WITH {SQL_TOKS},
tok_rows AS (SELECT doc_id, unnest(toks) AS tok FROM toks_t),
uni AS (
    SELECT doc_id,
           cast(max(c) AS bigint) AS top_unigram_n,
           cast(sum(c) AS bigint) AS n_tokens
    FROM (
        SELECT doc_id, tok, count(*) AS c
        FROM tok_rows GROUP BY doc_id, tok
    ) GROUP BY doc_id
),
bg_rows AS (
    SELECT doc_id, unnest(
        list_transform(range(len(toks) - 1),
                       i -> concat(toks[i+1], ' ', toks[i+2]))
    ) AS bg
    FROM toks_t
),
bi AS (
    SELECT doc_id,
           cast(max(c) AS bigint) AS top_bigram_n,
           cast(sum(c) AS bigint) AS n_bg
    FROM (
        SELECT doc_id, bg, count(*) AS c
        FROM bg_rows GROUP BY doc_id, bg
    ) GROUP BY doc_id
)
SELECT
    d.doc_id,
    d.lang,
    coalesce(u.n_tokens, 0)      AS n_tokens,
    coalesce(u.top_unigram_n, 0) AS top_unigram_n,
    coalesce(b.top_bigram_n, 0)  AS top_bigram_n,
    CASE WHEN coalesce(u.n_tokens, 0) > 0
         THEN cast(round(coalesce(u.top_unigram_n, 0) * 10000.0
                         / u.n_tokens) AS bigint)
         ELSE 0 END AS rep_unigram_bp,
    CASE WHEN coalesce(b.n_bg, 0) > 0
         THEN cast(round(coalesce(b.top_bigram_n, 0) * 10000.0
                         / b.n_bg) AS bigint)
         ELSE 0 END AS rep_bigram_bp,
    (CASE WHEN coalesce(b.n_bg, 0) > 0
          THEN cast(round(coalesce(b.top_bigram_n, 0) * 10000.0
                          / b.n_bg) AS bigint)
          ELSE 0 END >= 2000
     OR
     CASE WHEN coalesce(u.n_tokens, 0) > 0
          THEN cast(round(coalesce(u.top_unigram_n, 0) * 10000.0
                          / u.n_tokens) AS bigint)
          ELSE 0 END >= 3000) AS is_repetitive
FROM documents d
LEFT JOIN uni u USING (doc_id)
LEFT JOIN bi b USING (doc_id)
""",
)


# t8: corpus document-frequency top-100. Deterministic total order
# (df DESC, tok ASC) makes the LIMIT row set engine-identical.
register(
    "t8_doc_frequency",
    lambda spark, sf: textops.doc_frequency(
        tables.load(spark, sf, "documents")
    ),
    f"""
WITH {SQL_TOKS},
dfreq AS (
    SELECT tok, cast(count(*) AS bigint) AS df
    FROM (
        SELECT DISTINCT doc_id, unnest(toks) AS tok FROM toks_t
    ) GROUP BY tok
),
n AS (SELECT cast(count(*) AS bigint) AS n_docs FROM documents)
SELECT tok, df,
       cast(round(df * 1000000.0 / n_docs) AS bigint)
           AS docs_per_million
FROM dfreq, n
ORDER BY df DESC, tok
LIMIT 100
""",
)


def _t9_sql() -> str:
    """Restate with_synthetic_pii + pii_scrub: the injection CASE is
    the verbatim SQL mirror of the Spark expression, then counts via
    regexp_extract_all and redaction via chained global
    regexp_replace — the pattern strings are written in the Java∩RE2
    regex intersection (textops.PII_PATTERNS), so the SAME strings
    interpolate into both engines (parity mechanics proven in
    tests/test_pii.py)."""
    from ..operators.textops import PII_PATTERNS

    counts = ", ".join(
        f"cast(len(regexp_extract_all(text, '{pat}')) AS bigint)"
        f" AS n_{name}"
        for name, pat in PII_PATTERNS.items()
    )
    red = "text"
    for name, pat in PII_PATTERNS.items():
        red = f"regexp_replace({red}, '{pat}', '[{name.upper()}]', 'g')"
    total = " + ".join(f"n_{name}" for name in PII_PATTERNS)
    return f"""
WITH pii_src AS (
    SELECT doc_id,
        CASE doc_id % 4
            WHEN 0 THEN text || ' contact user'
                || cast(doc_id AS varchar) || '@example.com'
            WHEN 1 THEN text || ' from 10.'
                || cast(doc_id % 200 AS varchar) || '.0.'
                || cast(doc_id % 250 AS varchar)
            WHEN 2 THEN text || ' call 555-'
                || lpad(cast(doc_id % 1000 AS varchar), 3, '0') || '-'
                || lpad(cast(doc_id % 10000 AS varchar), 4, '0')
            ELSE text
        END AS text
    FROM documents
),
scored AS (
    SELECT doc_id, {counts}, {red} AS redacted
    FROM pii_src
)
SELECT doc_id, n_email, n_ipv4, n_phone, n_ssn,
       cast({total} AS bigint) AS n_pii,
       redacted, md5(redacted) AS redacted_md5
FROM scored
"""


# t9: PII detection + redaction, driver-verified on REAL matches —
# the corpus is PII-free, so a deterministic doc_id-derived injection
# (mirrored verbatim in the oracle) supplies them; counts, redacted
# text and the audit md5 all hash-check.
register(
    "t9_pii_scrub",
    lambda spark, sf: textops.pii_scrub(
        textops.with_synthetic_pii(tables.load(spark, sf, "documents"))
    ),
    _t9_sql(),
)


# pack1: token-budget sequence packing (window cumsum restated as the
# oracle's running SUM OVER).
register(
    "pack1_sequence_packing",
    lambda spark, sf: curate.pack_sequences(
        tables.load(spark, sf, "documents")
    ),
    f"""
WITH {SQL_TOKS},
d AS (
    SELECT doc_id, source AS stream,
           cast(len(toks) AS bigint) AS n_tokens
    FROM toks_t JOIN documents USING (doc_id)
),
c AS (
    SELECT doc_id, stream, n_tokens,
           sum(n_tokens) OVER (
               PARTITION BY stream ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tokens AS prev_cum
    FROM d
)
SELECT doc_id, stream, n_tokens,
       cast(floor(prev_cum / 256) AS bigint) AS shard_id,
       cast(prev_cum % 256 AS bigint)        AS offset_in_shard
FROM c
""",
)


# ---- c1: k-means (the IVF coarse-quantizer trainer) ----------------------

def _kmeans_lloyd_sql(k: int, n_iter: int, dim: int = 64) -> str:
    """Restate clustering.kmeans_train's fixed-point Lloyd iterations
    as unrolled SQL: n_iter x (assign -> per-dim sums -> centroid
    update with empty-cluster carry-over), then a final labeling pass
    against the final centroids. Every quantity is the same int64
    fixed-point the Spark side uses (SCALE=1e7), distances are exact
    integers, centroid updates round half-away-from-zero at integer
    scale — so the assignment table is bit-identical by construction,
    not approximately."""

    def dot(a_iv: str, b_iv: str) -> str:
        return (
            f"cast(list_sum(list_transform(range({dim}), "
            f"i -> {a_iv}[i+1] * {b_iv}[i+1])) AS bigint)"
        )

    parts = [
        SQL_FIXED,
        f"""
cent_0 AS (
    SELECT vec_id AS cid, iv AS civ FROM fx WHERE vec_id < {k}
)""",
    ]
    for t in range(n_iter + 1):
        # assignment vs cent_t: d2 = ||x||^2 - 2 x.c + ||c||^2, ties to
        # the lowest cid (Spark argmin first-occurrence)
        parts.append(
            f"""
centn_{t} AS (
    SELECT cid, civ,
           cast(list_sum(list_transform(civ, x -> x * x)) AS bigint)
               AS cn2
    FROM cent_{t}
)""",
        )
        parts.append(
            f"""
assign_{t} AS (
    SELECT vec_id, cid, d2 FROM (
        SELECT f.vec_id, c.cid,
               f.n2 - 2 * {dot('f.iv', 'c.civ')} + c.cn2 AS d2,
               row_number() OVER (
                   PARTITION BY f.vec_id
                   ORDER BY f.n2 - 2 * {dot('f.iv', 'c.civ')} + c.cn2,
                            c.cid) AS rn
        FROM fxn f CROSS JOIN centn_{t} c
    ) WHERE rn = 1
)""",
        )
        if t == n_iter:
            break  # final labeling pass: no further update
        parts.append(
            f"""
sums_{t} AS (
    SELECT a.cid, r.i, cast(sum(f.iv[r.i + 1]) AS bigint) AS s,
           cast(count(*) AS bigint) AS n
    FROM assign_{t} a
    JOIN fxn f USING (vec_id)
    CROSS JOIN range({dim}) r(i)
    GROUP BY a.cid, r.i
)""",
        )
        parts.append(
            f"""
newc_{t} AS (
    SELECT cid,
           list(cast(round(cast(s AS double) / n) AS bigint)
                ORDER BY i) AS civ
    FROM sums_{t}
    GROUP BY cid
)""",
        )
        parts.append(
            f"""
cent_{t + 1} AS (
    SELECT p.cid, coalesce(nw.civ, p.civ) AS civ
    FROM cent_{t} p LEFT JOIN newc_{t} nw USING (cid)
)""",
        )
    body = ",".join(parts)
    return f"""
WITH {body}
SELECT vec_id, cast(cid AS bigint) AS cluster_id, d2 AS dist2
FROM assign_{n_iter}
"""


# The registered config matches sim4_ivf_topk's coarse quantizer
# (k=16) so a green row here driver-verifies the IVF trainer, not just
# a toy. Oracle cost at sf0.01 (200 vecs): 5 unrolled iterations of a
# 200x16 distance table + 64-dim sum regroup — trivial for DuckDB.
register(
    "c1_kmeans_clusters",
    lambda spark, sf: clustering.kmeans_train(
        tables.load(spark, sf, "embeddings"), k=16, n_iter=5
    )[0],
    _kmeans_lloyd_sql(16, 5),
)


# ---- d9: connected-components semantic dedup -----------------------------
# The iterative min-label loop (dedup.connected_components) IS
# SQL-expressible for the oracle: DuckDB's recursive CTE computes the
# undirected transitive closure of the verified near-dup pairs (UNION
# recursion terminates at the fixed point), and min(reachable) per
# vertex is exactly the propagated label Spark converges to. Same
# (8 x 8) oracle-validity bound as sim2/d7.
register(
    "d9_semantic_dedup_cc",
    lambda spark, sf: dedup.semantic_dedup_cc(
        tables.load(spark, sf, "documents"),
        tables.load(spark, sf, "embeddings"),
        0.4,
    ),
    f"""
WITH RECURSIVE {SQL_MULTIBAND},
verified AS (
    SELECT p.vec_a, p.vec_b
    FROM cpairs p
    JOIN fxn a ON a.vec_id = p.vec_a
    JOIN fxn b ON b.vec_id = p.vec_b
    WHERE {_COS} > 0.4
),
adj AS (
    SELECT vec_a AS s, vec_b AS d FROM verified
    UNION ALL
    SELECT vec_b AS s, vec_a AS d FROM verified
),
reach(v, r) AS (
    SELECT s, s FROM adj GROUP BY s
    UNION
    SELECT a.s, re.r FROM adj a JOIN reach re ON re.v = a.d
),
comp AS (SELECT v, min(r) AS component FROM reach GROUP BY v)
SELECT d.doc_id, d.lang, c.component AS dup_of
FROM comp c
JOIN documents d ON d.doc_id = c.v
WHERE c.v != c.component
""",
)


# ---- d10: MinHash dup groups (canonical assignment) ----------------------
# Composition proof: d4's pair search + d9's recursive-closure oracle
# pattern, plus a group-size aggregate. The jaccard threshold predicate
# is restated exactly as d4's (round-at-integer-scale).
register(
    "d10_minhash_dup_groups",
    lambda spark, sf: dedup.minhash_dup_groups(
        tables.load(spark, sf, "documents"), 0.5
    ),
    f"""
WITH RECURSIVE {SQL_JACCARD},
vp AS (
    SELECT doc_a, doc_b FROM jac
    WHERE CASE WHEN shingles_union > 0 THEN
            cast(cast(round(shingles_common * 1000.0 / shingles_union)
                      AS bigint) / 1000.0 AS double)
          END >= 0.5
),
adj AS (
    SELECT doc_a AS s, doc_b AS d FROM vp
    UNION ALL
    SELECT doc_b AS s, doc_a AS d FROM vp
),
reach(v, r) AS (
    SELECT s, s FROM adj GROUP BY s
    UNION
    SELECT a.s, re.r FROM adj a JOIN reach re ON re.v = a.d
),
comp AS (SELECT v, min(r) AS component FROM reach GROUP BY v),
sizes AS (
    SELECT component, cast(count(*) AS bigint) AS group_size
    FROM comp GROUP BY component
)
SELECT
    c.v AS doc_id,
    c.component AS canonical_doc_id,
    s.group_size,
    c.v = c.component AS is_canonical
FROM comp c JOIN sizes s USING (component)
""",
)


# ---- e1: embedding dimension profile -------------------------------------
# Exact-integer aggregation (decimal-128 squared sums) with the shared
# 1e-6 rounding idiom; the oracle restates it over unnested components.
register(
    "e1_embedding_dim_profile",
    lambda spark, sf: similarity.embedding_dim_profile(
        tables.load(spark, sf, "embeddings")
    ),
    """
WITH x AS (
    SELECT
        cast(i AS int) AS dim_idx,
        cast(round(cast(embedding[i + 1] AS double) * 10000000)
             AS bigint) AS iv
    FROM embeddings, range(64) r(i)
),
agg AS (
    SELECT
        dim_idx,
        cast(count(*) AS bigint)              AS n_vecs,
        cast(sum(iv) AS bigint)               AS s,
        sum(cast(iv AS hugeint) * iv)         AS s2,
        cast(min(iv) AS bigint)               AS min_iv,
        cast(max(iv) AS bigint)               AS max_iv
    FROM x GROUP BY dim_idx
)
SELECT
    dim_idx,
    n_vecs,
    cast(cast(round((cast(s AS double) / n_vecs) / 10000000
                    * 1000000.0) AS bigint) / 1000000.0 AS double)
        AS mean,
    cast(cast(round(sqrt(greatest(
             cast(s2 AS double) / n_vecs
             - (cast(s AS double) / n_vecs)
               * (cast(s AS double) / n_vecs), 0.0)) / 10000000
             * 1000000.0) AS bigint) / 1000000.0 AS double)
        AS std,
    cast(cast(round(cast(min_iv AS double) / 10000000 * 1000000.0)
              AS bigint) / 1000000.0 AS double) AS min_val,
    cast(cast(round(cast(max_iv AS double) / 10000000 * 1000000.0)
              AS bigint) / 1000000.0 AS double) AS max_val
FROM agg
""",
)


def _pq_lloyd_sql(
    m: int = 8, ksub: int = 16, n_iter: int = 3, dim: int = 64
) -> str:
    """Restate clustering.pq_train_encode as unrolled SQL. The
    subspace index is a DATA dimension (cross join range(m) + slice),
    so ONE set of Lloyd CTEs trains all m codebooks keyed by
    (subspace, cid) — the relational mirror of the Spark side's
    all-subspaces-in-one-pass design, and m-times smaller SQL than
    per-subspace unrolling. Same fixed-point contract as
    _kmeans_lloyd_sql: int64 everywhere, ties to the lowest code,
    round-half-away centroid updates, empty clusters carried over."""
    dsub = dim // m

    def dot(a_iv: str, b_iv: str) -> str:
        return (
            f"cast(list_sum(list_transform(range({dsub}), "
            f"i -> {a_iv}[i+1] * {b_iv}[i+1])) AS bigint)"
        )

    parts = [
        """
fx AS (
    SELECT
        vec_id,
        list_transform(embedding,
            x -> cast(round(cast(x AS double) * 10000000) AS bigint))
            AS iv
    FROM embeddings
)""",
        f"""
sub AS (
    SELECT vec_id, r.s,
        list_transform(range({dsub}),
                       i -> iv[r.s * {dsub} + i + 1]) AS iv
    FROM fx CROSS JOIN range({m}) r(s)
)""",
        f"""
subn AS (
    SELECT vec_id, s, iv,
        cast(list_sum(list_transform(iv, x -> x * x)) AS bigint) AS n2
    FROM sub
)""",
        f"""
cent_0 AS (
    SELECT s, vec_id AS cid, iv AS civ FROM sub WHERE vec_id < {ksub}
)""",
    ]
    for t in range(n_iter + 1):
        parts.append(
            f"""
centn_{t} AS (
    SELECT s, cid, civ,
        cast(list_sum(list_transform(civ, x -> x * x)) AS bigint) AS cn2
    FROM cent_{t}
)""",
        )
        parts.append(
            f"""
assign_{t} AS (
    SELECT vec_id, s, cid, d2 FROM (
        SELECT f.vec_id, f.s, c.cid,
            f.n2 - 2 * {dot('f.iv', 'c.civ')} + c.cn2 AS d2,
            row_number() OVER (
                PARTITION BY f.vec_id, f.s
                ORDER BY f.n2 - 2 * {dot('f.iv', 'c.civ')} + c.cn2,
                         c.cid) AS rn
        FROM subn f JOIN centn_{t} c ON c.s = f.s
    ) WHERE rn = 1
)""",
        )
        if t == n_iter:
            break
        parts.append(
            f"""
sums_{t} AS (
    SELECT a.s, a.cid, r.i,
        cast(sum(f.iv[r.i + 1]) AS bigint) AS sm,
        cast(count(*) AS bigint) AS n
    FROM assign_{t} a
    JOIN subn f ON f.vec_id = a.vec_id AND f.s = a.s
    CROSS JOIN range({dsub}) r(i)
    GROUP BY a.s, a.cid, r.i
)""",
        )
        parts.append(
            f"""
newc_{t} AS (
    SELECT s, cid,
        list(cast(round(cast(sm AS double) / n) AS bigint)
             ORDER BY i) AS civ
    FROM sums_{t} GROUP BY s, cid
)""",
        )
        parts.append(
            f"""
cent_{t + 1} AS (
    SELECT p.s, p.cid, coalesce(nw.civ, p.civ) AS civ
    FROM cent_{t} p
    LEFT JOIN newc_{t} nw ON nw.s = p.s AND nw.cid = p.cid
)""",
        )
    body = ",".join(parts)
    return f"""
WITH {body}
SELECT vec_id,
    array_to_string(list(cast(cid AS varchar) ORDER BY s), '-')
        AS codes,
    cast(sum(d2) AS bigint) AS qerr
FROM assign_{n_iter}
GROUP BY vec_id
"""


# pq1: product-quantization codes — the memory half of the ANN story
# (IVF prunes candidates, PQ compresses them 32x). The oracle trains
# the same m=8 x k=16 codebooks with subspace as a data dimension.
# The codes column is serialized '-'-joined (the j5_wide_serialized
# precedent, operators/joins.py): the driver's canonicalizer sorts
# with pandas, which cannot factorize ndarray cells, so array columns
# must cross the verification boundary as strings.
register(
    "pq1_pq_codes",
    lambda spark, sf: clustering.pq_train_encode(
        tables.load(spark, sf, "embeddings"), m=8, ksub=16, n_iter=3
    )[0].select(
        "vec_id",
        F.concat_ws(
            "-", F.transform("codes", lambda x: x.cast("string"))
        ).alias("codes"),
        "qerr",
    ),
    _pq_lloyd_sql(8, 16, 3),
)


def _ivfpq_sql(
    coarse_k: int = 16,
    coarse_iters: int = 3,
    m: int = 8,
    ksub: int = 16,
    pq_iters: int = 3,
    nprobe: int = 4,
    k: int = 5,
    nq: int = 8,
    dim: int = 64,
) -> str:
    """Restate clustering.ivfpq_topk end-to-end: the c1 coarse Lloyd
    chain (prefixed c_) trains the list quantizer, the pq1 chain
    (prefixed p_) trains the codebooks and yields the per-subspace
    code table, then probes = the nprobe nearest final coarse
    centroids per query, ADC = the grouped code-table lookup sum, and
    the top-k ranks with ties to the lowest neighbor id. One oracle
    proves the whole composition, not just its parts."""
    dsub = dim // m

    def dot(a_iv: str, b_iv: str, d: int) -> str:
        return (
            f"cast(list_sum(list_transform(range({d}), "
            f"i -> {a_iv}[i+1] * {b_iv}[i+1])) AS bigint)"
        )

    parts = [
        """
fx AS (
    SELECT vec_id,
        list_transform(embedding,
            x -> cast(round(cast(x AS double) * 10000000) AS bigint))
            AS iv
    FROM embeddings
)""",
        """
fxn AS (
    SELECT vec_id, iv,
        cast(list_sum(list_transform(iv, x -> x * x)) AS bigint) AS n2
    FROM fx
)""",
        f"""
c_cent_0 AS (
    SELECT vec_id AS cid, iv AS civ FROM fx WHERE vec_id < {coarse_k}
)""",
    ]
    # coarse Lloyd over the full dim (the c1 chain, prefixed)
    for t in range(coarse_iters + 1):
        parts.append(
            f"""
c_centn_{t} AS (
    SELECT cid, civ,
        cast(list_sum(list_transform(civ, x -> x * x)) AS bigint) AS cn2
    FROM c_cent_{t}
)""",
        )
        parts.append(
            f"""
c_assign_{t} AS (
    SELECT vec_id, cid, d2 FROM (
        SELECT f.vec_id, c.cid,
            f.n2 - 2 * {dot('f.iv', 'c.civ', dim)} + c.cn2 AS d2,
            row_number() OVER (
                PARTITION BY f.vec_id
                ORDER BY f.n2 - 2 * {dot('f.iv', 'c.civ', dim)} + c.cn2,
                         c.cid) AS rn
        FROM fxn f CROSS JOIN c_centn_{t} c
    ) WHERE rn = 1
)""",
        )
        if t == coarse_iters:
            break
        parts.append(
            f"""
c_sums_{t} AS (
    SELECT a.cid, r.i, cast(sum(f.iv[r.i + 1]) AS bigint) AS sm,
           cast(count(*) AS bigint) AS n
    FROM c_assign_{t} a
    JOIN fxn f USING (vec_id)
    CROSS JOIN range({dim}) r(i)
    GROUP BY a.cid, r.i
)""",
        )
        parts.append(
            f"""
c_newc_{t} AS (
    SELECT cid,
        list(cast(round(cast(sm AS double) / n) AS bigint)
             ORDER BY i) AS civ
    FROM c_sums_{t} GROUP BY cid
)""",
        )
        parts.append(
            f"""
c_cent_{t + 1} AS (
    SELECT p.cid, coalesce(nw.civ, p.civ) AS civ
    FROM c_cent_{t} p LEFT JOIN c_newc_{t} nw USING (cid)
)""",
        )
    # PQ chain over subspaces (the pq1 chain, prefixed)
    parts.append(
        f"""
p_sub AS (
    SELECT vec_id, r.s,
        list_transform(range({dsub}),
                       i -> iv[r.s * {dsub} + i + 1]) AS iv
    FROM fx CROSS JOIN range({m}) r(s)
)""",
    )
    parts.append(
        """
p_subn AS (
    SELECT vec_id, s, iv,
        cast(list_sum(list_transform(iv, x -> x * x)) AS bigint) AS n2
    FROM p_sub
)""",
    )
    parts.append(
        f"""
p_cent_0 AS (
    SELECT s, vec_id AS cid, iv AS civ FROM p_sub WHERE vec_id < {ksub}
)""",
    )
    for t in range(pq_iters + 1):
        parts.append(
            f"""
p_centn_{t} AS (
    SELECT s, cid, civ,
        cast(list_sum(list_transform(civ, x -> x * x)) AS bigint) AS cn2
    FROM p_cent_{t}
)""",
        )
        parts.append(
            f"""
p_assign_{t} AS (
    SELECT vec_id, s, cid FROM (
        SELECT f.vec_id, f.s, c.cid,
            row_number() OVER (
                PARTITION BY f.vec_id, f.s
                ORDER BY f.n2 - 2 * {dot('f.iv', 'c.civ', dsub)} + c.cn2,
                         c.cid) AS rn
        FROM p_subn f JOIN p_centn_{t} c ON c.s = f.s
    ) WHERE rn = 1
)""",
        )
        if t == pq_iters:
            break
        parts.append(
            f"""
p_sums_{t} AS (
    SELECT a.s, a.cid, r.i,
        cast(sum(f.iv[r.i + 1]) AS bigint) AS sm,
        cast(count(*) AS bigint) AS n
    FROM p_assign_{t} a
    JOIN p_subn f ON f.vec_id = a.vec_id AND f.s = a.s
    CROSS JOIN range({dsub}) r(i)
    GROUP BY a.s, a.cid, r.i
)""",
        )
        parts.append(
            f"""
p_newc_{t} AS (
    SELECT s, cid,
        list(cast(round(cast(sm AS double) / n) AS bigint)
             ORDER BY i) AS civ
    FROM p_sums_{t} GROUP BY s, cid
)""",
        )
        parts.append(
            f"""
p_cent_{t + 1} AS (
    SELECT p.s, p.cid, coalesce(nw.civ, p.civ) AS civ
    FROM p_cent_{t} p
    LEFT JOIN p_newc_{t} nw ON nw.s = p.s AND nw.cid = p.cid
)""",
        )
    # composition: probes -> ADC -> list filter -> top-k
    parts.append(
        f"""
probes AS (
    SELECT vec_id AS query_id, cid AS list_id FROM (
        SELECT f.vec_id, c.cid,
            row_number() OVER (
                PARTITION BY f.vec_id
                ORDER BY f.n2 - 2 * {dot('f.iv', 'c.civ', dim)} + c.cn2,
                         c.cid) AS rn
        FROM fxn f CROSS JOIN c_centn_{coarse_iters} c
        WHERE f.vec_id < {nq}
    ) WHERE rn <= {nprobe}
)""",
    )
    parts.append(
        f"""
adc AS (
    SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
        cast(sum(q.n2 - 2 * {dot('q.iv', 'c.civ', dsub)} + c.cn2)
             AS bigint) AS adc_d2
    FROM p_assign_{pq_iters} a
    JOIN p_centn_{pq_iters} c ON c.s = a.s AND c.cid = a.cid
    JOIN p_subn q ON q.s = a.s
    WHERE q.vec_id < {nq}
    GROUP BY 1, 2
)""",
    )
    parts.append(
        f"""
ranked AS (
    SELECT adc.query_id, adc.neighbor_id,
        cast(l.cid AS bigint) AS list_id, adc.adc_d2,
        row_number() OVER (
            PARTITION BY adc.query_id
            ORDER BY adc.adc_d2, adc.neighbor_id) AS rnk
    FROM adc
    JOIN c_assign_{coarse_iters} l ON l.vec_id = adc.neighbor_id
    JOIN probes p ON p.query_id = adc.query_id AND p.list_id = l.cid
    WHERE adc.neighbor_id != adc.query_id
)""",
    )
    body = ",".join(parts)
    return f"""
WITH {body}
SELECT query_id, neighbor_id, list_id, adc_d2,
       cast(rnk AS bigint) AS rank
FROM ranked WHERE rnk <= {k}
"""


# ivfpq1: the full production-ANN composition (IVF list pruning x PQ
# ADC scoring) verified end-to-end by one oracle.
register(
    "ivfpq1_topk",
    lambda spark, sf: clustering.ivfpq_topk(
        tables.load(spark, sf, "embeddings"),
        k=5, nprobe=4, coarse_k=16, coarse_iters=3,
        m=8, ksub=16, pq_iters=3, n_queries=8,
    ),
    _ivfpq_sql(16, 3, 8, 16, 3, 4, 5, 8),
)


def _pq_chain(m: int, ksub: int, n_iter: int, dim: int, src: str) -> str:
    """The subspace-sliced Lloyd chain as reusable CTE text (prefix
    ``p_``), reading fixed-point vectors (vec_id, iv) from CTE
    ``src`` — the common core of the pq2 and pq3 oracles (pq1's and
    ivfpq1's own builders predate this helper and stay as committed,
    since their generated SQL is driver-proven)."""
    dsub = dim // m

    def dot(a_iv: str, b_iv: str) -> str:
        return (
            f"cast(list_sum(list_transform(range({dsub}), "
            f"i -> {a_iv}[i+1] * {b_iv}[i+1])) AS bigint)"
        )

    parts = [
        f"""
p_sub AS (
    SELECT vec_id, r.s,
        list_transform(range({dsub}),
                       i -> iv[r.s * {dsub} + i + 1]) AS iv
    FROM {src} CROSS JOIN range({m}) r(s)
)""",
        """
p_subn AS (
    SELECT vec_id, s, iv,
        cast(list_sum(list_transform(iv, x -> x * x)) AS bigint) AS n2
    FROM p_sub
)""",
        f"""
p_cent_0 AS (
    SELECT s, vec_id AS cid, iv AS civ FROM p_sub WHERE vec_id < {ksub}
)""",
    ]
    for t in range(n_iter + 1):
        parts.append(
            f"""
p_centn_{t} AS (
    SELECT s, cid, civ,
        cast(list_sum(list_transform(civ, x -> x * x)) AS bigint) AS cn2
    FROM p_cent_{t}
)""",
        )
        parts.append(
            f"""
p_assign_{t} AS (
    SELECT vec_id, s, cid, d2 FROM (
        SELECT f.vec_id, f.s, c.cid,
            f.n2 - 2 * {dot('f.iv', 'c.civ')} + c.cn2 AS d2,
            row_number() OVER (
                PARTITION BY f.vec_id, f.s
                ORDER BY f.n2 - 2 * {dot('f.iv', 'c.civ')} + c.cn2,
                         c.cid) AS rn
        FROM p_subn f JOIN p_centn_{t} c ON c.s = f.s
    ) WHERE rn = 1
)""",
        )
        if t == n_iter:
            break
        parts.append(
            f"""
p_sums_{t} AS (
    SELECT a.s, a.cid, r.i,
        cast(sum(f.iv[r.i + 1]) AS bigint) AS sm,
        cast(count(*) AS bigint) AS n
    FROM p_assign_{t} a
    JOIN p_subn f ON f.vec_id = a.vec_id AND f.s = a.s
    CROSS JOIN range({dsub}) r(i)
    GROUP BY a.s, a.cid, r.i
)""",
        )
        parts.append(
            f"""
p_newc_{t} AS (
    SELECT s, cid,
        list(cast(round(cast(sm AS double) / n) AS bigint)
             ORDER BY i) AS civ
    FROM p_sums_{t} GROUP BY s, cid
)""",
        )
        parts.append(
            f"""
p_cent_{t + 1} AS (
    SELECT p.s, p.cid, coalesce(nw.civ, p.civ) AS civ
    FROM p_cent_{t} p
    LEFT JOIN p_newc_{t} nw ON nw.s = p.s AND nw.cid = p.cid
)""",
        )
    return ",".join(parts)


_FX_CTE = """
fx AS (
    SELECT
        vec_id,
        list_transform(embedding,
            x -> cast(round(cast(x AS double) * 10000000) AS bigint))
            AS iv
    FROM embeddings
)"""


def _pq_adc_sql(
    m: int = 8, ksub: int = 16, n_iter: int = 3, k: int = 5,
    nq: int = 8, dim: int = 64,
) -> str:
    """Restate clustering.pq_adc_topk: the pq1 codebook chain, then
    asymmetric distance = per-subspace lookup of the query sub-vector
    against the ASSIGNED centroid (q.n2 - 2 q·c + c.n2 summed over
    subspaces == the Spark side's int64 table gather), ranked per
    query with ties to the lowest neighbor id."""
    dsub = dim // m
    dot = (
        f"cast(list_sum(list_transform(range({dsub}), "
        f"i -> q.iv[i+1] * c.civ[i+1])) AS bigint)"
    )
    return f"""
WITH {_FX_CTE},{_pq_chain(m, ksub, n_iter, dim, 'fx')},
adc AS (
    SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
        cast(sum(q.n2 - 2 * {dot} + c.cn2) AS bigint) AS adc_d2
    FROM p_assign_{n_iter} a
    JOIN p_centn_{n_iter} c ON c.s = a.s AND c.cid = a.cid
    JOIN p_subn q ON q.s = a.s
    WHERE q.vec_id < {nq}
    GROUP BY 1, 2
),
ranked AS (
    SELECT query_id, neighbor_id, adc_d2,
        row_number() OVER (
            PARTITION BY query_id
            ORDER BY adc_d2, neighbor_id) AS rnk
    FROM adc WHERE neighbor_id != query_id
)
SELECT query_id, neighbor_id, adc_d2, cast(rnk AS bigint) AS rank
FROM ranked WHERE rnk <= {k}
"""


def _pq_residual_sql(
    m: int = 8, ksub: int = 16, n_iter: int = 3,
    coarse_k: int = 16, coarse_iters: int = 3, dim: int = 64,
) -> str:
    """Restate clustering.pq_train_encode_residual: the c1 coarse
    Lloyd chain (c_ prefix, identical to ivfpq1's), then the residual
    x - c(x) recomputed EXACTLY as the Spark side does it — float64
    ``(x - civ/1e7) * 1e7`` then half-away round, the same IEEE op
    sequence as numpy's ``x - cent/scale`` + ``to_fixed`` — feeding
    the shared PQ chain; output is pq1-shaped (serialized codes)."""

    def dot(a_iv: str, b_iv: str) -> str:
        return (
            f"cast(list_sum(list_transform(range({dim}), "
            f"i -> {a_iv}[i+1] * {b_iv}[i+1])) AS bigint)"
        )

    parts = [
        _FX_CTE,
        """
fxn AS (
    SELECT vec_id, iv,
        cast(list_sum(list_transform(iv, x -> x * x)) AS bigint) AS n2
    FROM fx
)""",
        f"""
c_cent_0 AS (
    SELECT vec_id AS cid, iv AS civ FROM fx WHERE vec_id < {coarse_k}
)""",
    ]
    for t in range(coarse_iters + 1):
        parts.append(
            f"""
c_centn_{t} AS (
    SELECT cid, civ,
        cast(list_sum(list_transform(civ, x -> x * x)) AS bigint) AS cn2
    FROM c_cent_{t}
)""",
        )
        parts.append(
            f"""
c_assign_{t} AS (
    SELECT vec_id, cid FROM (
        SELECT f.vec_id, c.cid,
            row_number() OVER (
                PARTITION BY f.vec_id
                ORDER BY f.n2 - 2 * {dot('f.iv', 'c.civ')} + c.cn2,
                         c.cid) AS rn
        FROM fxn f CROSS JOIN c_centn_{t} c
    ) WHERE rn = 1
)""",
        )
        if t == coarse_iters:
            break
        parts.append(
            f"""
c_sums_{t} AS (
    SELECT a.cid, r.i, cast(sum(f.iv[r.i + 1]) AS bigint) AS sm,
           cast(count(*) AS bigint) AS n
    FROM c_assign_{t} a
    JOIN fxn f USING (vec_id)
    CROSS JOIN range({dim}) r(i)
    GROUP BY a.cid, r.i
)""",
        )
        parts.append(
            f"""
c_newc_{t} AS (
    SELECT cid,
        list(cast(round(cast(sm AS double) / n) AS bigint)
             ORDER BY i) AS civ
    FROM c_sums_{t} GROUP BY cid
)""",
        )
        parts.append(
            f"""
c_cent_{t + 1} AS (
    SELECT p.cid, coalesce(nw.civ, p.civ) AS civ
    FROM c_cent_{t} p LEFT JOIN c_newc_{t} nw USING (cid)
)""",
        )
    parts.append(
        f"""
rf AS (
    SELECT e.vec_id,
        list_transform(range({dim}), i ->
            cast(round((cast(e.embedding[i+1] AS double)
                        - cast(c.civ[i+1] AS double) / 10000000)
                       * 10000000) AS bigint)) AS iv
    FROM embeddings e
    JOIN c_assign_{coarse_iters} a ON a.vec_id = e.vec_id
    JOIN c_cent_{coarse_iters} c ON c.cid = a.cid
)""",
    )
    body = ",".join(parts)
    return f"""
WITH {body},{_pq_chain(m, ksub, n_iter, dim, 'rf')}
SELECT vec_id,
    array_to_string(list(cast(cid AS varchar) ORDER BY s), '-')
        AS codes,
    cast(sum(d2) AS bigint) AS qerr
FROM p_assign_{n_iter}
GROUP BY vec_id
"""


# pq2: ADC top-k on its own — the asymmetric-distance ranking
# isolated from ivfpq1's list pruning, so a probe-filter bug cannot
# mask a scoring bug (and vice versa).
register(
    "pq2_adc_topk",
    lambda spark, sf: clustering.pq_adc_topk(
        tables.load(spark, sf, "embeddings"),
        k=5, m=8, ksub=16, n_iter=3, n_queries=8,
    ),
    _pq_adc_sql(8, 16, 3, 5, 8),
)


def _pq_adc_rerank_sql(
    m: int = 8, ksub: int = 16, n_iter: int = 3, k: int = 5,
    shortlist: int = 20, nq: int = 8, dim: int = 64,
) -> str:
    """Restate clustering.pq_adc_rerank_topk: the pq2 ADC chain keeps
    a ``shortlist``, then the exact int64 distance on raw fixed-point
    vectors re-ranks it (a.n2 - 2 a·b + b.n2 over the full dim)."""
    dsub = dim // m
    adc_dot = (
        f"cast(list_sum(list_transform(range({dsub}), "
        f"i -> q.iv[i+1] * c.civ[i+1])) AS bigint)"
    )
    full_dot = (
        f"cast(list_sum(list_transform(range({dim}), "
        f"i -> a.iv[i+1] * b.iv[i+1])) AS bigint)"
    )
    return f"""
WITH {_FX_CTE},
fxn AS (
    SELECT vec_id, iv,
        cast(list_sum(list_transform(iv, x -> x * x)) AS bigint) AS n2
    FROM fx
),{_pq_chain(m, ksub, n_iter, dim, 'fx')},
adc AS (
    SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
        cast(sum(q.n2 - 2 * {adc_dot} + c.cn2) AS bigint) AS adc_d2
    FROM p_assign_{n_iter} a
    JOIN p_centn_{n_iter} c ON c.s = a.s AND c.cid = a.cid
    JOIN p_subn q ON q.s = a.s
    WHERE q.vec_id < {nq}
    GROUP BY 1, 2
),
short AS (
    SELECT query_id, neighbor_id, adc_d2 FROM (
        SELECT query_id, neighbor_id, adc_d2,
            row_number() OVER (
                PARTITION BY query_id
                ORDER BY adc_d2, neighbor_id) AS rnk
        FROM adc WHERE neighbor_id != query_id
    ) WHERE rnk <= {shortlist}
),
reranked AS (
    SELECT s.query_id, s.neighbor_id, s.adc_d2,
        a.n2 - 2 * {full_dot} + b.n2 AS exact_d2,
        row_number() OVER (
            PARTITION BY s.query_id
            ORDER BY a.n2 - 2 * {full_dot} + b.n2, s.neighbor_id
        ) AS rnk
    FROM short s
    JOIN fxn a ON a.vec_id = s.query_id
    JOIN fxn b ON b.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, adc_d2,
       cast(exact_d2 AS bigint) AS exact_d2,
       cast(rnk AS bigint) AS rank
FROM reranked WHERE rnk <= {k}
"""


# pq4: two-stage retrieval — compressed ADC shortlist, exact re-rank
# on raw vectors (the recall-recovery trick; pq2's quantized ranking
# and the exact fixed-point distance proven TOGETHER in one oracle).
register(
    "pq4_adc_rerank",
    lambda spark, sf: clustering.pq_adc_rerank_topk(
        tables.load(spark, sf, "embeddings"),
        k=5, shortlist=20, m=8, ksub=16, n_iter=3, n_queries=8,
    ),
    _pq_adc_rerank_sql(8, 16, 3, 5, 20, 8),
)


# pq3: residual product quantization — codebooks trained on
# x - c(x) rather than x (the by_residual=true trade); codes
# serialized per the pq1 canonicalizer contract.
register(
    "pq3_residual_codes",
    lambda spark, sf: clustering.pq_train_encode_residual(
        tables.load(spark, sf, "embeddings"),
        m=8, ksub=16, n_iter=3, coarse_k=16, coarse_iters=3,
    )[0].select(
        "vec_id",
        F.concat_ws(
            "-", F.transform("codes", lambda x: x.cast("string"))
        ).alias("codes"),
        "qerr",
    ),
    _pq_residual_sql(8, 16, 3, 16, 3),
)


# d12: edit-distance verification of the LSH candidates — the
# order-sensitive complement of d4's Jaccard verify (levenshtein is a
# built-in with identical semantics in both engines; the corpus
# separates cleanly: true near-dups at prefix distance 0, unrelated
# pairs at >= 14, threshold 8 sits in the gap).
register(
    "d12_editdist_neardup",
    lambda spark, sf: dedup.editdist_neardup(
        tables.load(spark, sf, "documents")
    ),
    f"""
WITH {SQL_LSH_PAIRS},
keys AS (
    SELECT doc_id, substr(text, 1, 40) AS k FROM documents
)
SELECT p.doc_a, p.doc_b,
    cast(levenshtein(a.k, b.k) AS bigint) AS edit_dist
FROM pairs p
JOIN keys a ON a.doc_id = p.doc_a
JOIN keys b ON b.doc_id = p.doc_b
WHERE levenshtein(a.k, b.k) <= 8
""",
)


# cur1: the end-to-end curation pipeline (quality gates -> near-dup
# removal -> stratified sampling) as one oracle — proves the
# registered stages COMPOSE, not just pass individually. Every
# predicate below is textually the same rule its stage's own oracle
# uses (t1 stats over toks_t, d4's integer-scale jaccard threshold,
# t6's md5 sampling rule).
register(
    "cur1_curated_corpus",
    lambda spark, sf: curate.curate_corpus(
        tables.load(spark, sf, "documents")
    ),
    f"""
WITH {SQL_JACCARD},
stats AS (
    SELECT doc_id,
        cast(len(toks) AS bigint) AS n_tokens,
        cast(len(list_distinct(toks)) AS bigint) AS n_unique
    FROM toks_t
),
vp AS (
    SELECT doc_a, doc_b FROM jac
    WHERE CASE WHEN shingles_union > 0 THEN
            cast(cast(round(shingles_common * 1000.0 / shingles_union)
                      AS bigint) / 1000.0 AS double)
          END >= 0.5
),
removals AS (SELECT DISTINCT doc_b AS doc_id FROM vp)
SELECT d.doc_id, d.lang, d.source, d.n_chars, s.n_tokens, s.n_unique
FROM documents d
JOIN stats s USING (doc_id)
WHERE s.n_tokens >= 30
  AND s.n_unique * 100 >= s.n_tokens * 30
  AND d.doc_id NOT IN (SELECT doc_id FROM removals)
  AND ('0x' || substr(md5('sample|' || cast(d.doc_id AS varchar)), 1, 8))
          ::bigint * 100
      < ({_RATE_CASE}) * 4294967296
""",
)


# src1: the per-(source, lang) corpus datasheet — cur1's rules
# re-aggregated into release-notes form (counts + bp rates).
register(
    "src1_corpus_datasheet",
    lambda spark, sf: curate.corpus_datasheet(
        tables.load(spark, sf, "documents")
    ),
    f"""
WITH {SQL_JACCARD},
stats AS (
    SELECT t.doc_id, d.source, t.lang,
        cast(len(t.toks) AS bigint) AS n_tokens,
        cast(len(list_distinct(t.toks)) AS bigint) AS n_unique
    FROM toks_t t JOIN documents d USING (doc_id)
),
vp AS (
    SELECT doc_a, doc_b FROM jac
    WHERE CASE WHEN shingles_union > 0 THEN
            cast(cast(round(shingles_common * 1000.0 / shingles_union)
                      AS bigint) / 1000.0 AS double)
          END >= 0.5
),
removals AS (SELECT DISTINCT doc_b AS doc_id FROM vp),
flagged AS (
    SELECT s.*,
        CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup,
        CASE WHEN s.n_tokens >= 30
              AND s.n_unique * 100 >= s.n_tokens * 30 THEN 1
             ELSE 0 END AS q_pass,
        CASE WHEN s.n_tokens >= 30
              AND s.n_unique * 100 >= s.n_tokens * 30
              AND r.doc_id IS NULL
              AND ('0x' || substr(md5('sample|'
                       || cast(s.doc_id AS varchar)), 1, 8))::bigint
                  * 100 < ({_RATE_CASE}) * 4294967296
             THEN 1 ELSE 0 END AS kept
    FROM stats s LEFT JOIN removals r USING (doc_id)
)
SELECT source, lang,
    cast(count(*) AS bigint)        AS n_docs,
    cast(sum(n_tokens) AS bigint)   AS total_tokens,
    cast(sum(is_dup) AS bigint)     AS n_neardup,
    cast(sum(q_pass) AS bigint)     AS n_quality_pass,
    cast(sum(kept) AS bigint)       AS n_curated,
    cast(sum(is_dup) AS bigint) * 10000 // count(*)   AS dup_bp,
    cast(sum(q_pass) AS bigint) * 10000 // count(*)   AS quality_bp,
    cast(sum(kept) AS bigint) * 10000 // count(*)     AS curated_bp
FROM flagged
GROUP BY source, lang
""",
)


# cur2: deterministic train/val/test split — membership is a pure
# function of (doc_id, salt) via the t6/w1 md5-u32 integer compare, so
# both engines carve identical splits and the assignment is stable
# under corpus growth (a new doc never moves an old one).
register(
    "cur2_train_eval_split",
    lambda spark, sf: curate.train_eval_split(
        tables.load(spark, sf, "documents")
    ),
    """
SELECT doc_id, lang, source,
    CASE
        WHEN ('0x' || substr(md5('split|' || cast(doc_id AS varchar)),
                             1, 8))::bigint * 10000
             < 100 * 4294967296 THEN 'test'
        WHEN ('0x' || substr(md5('split|' || cast(doc_id AS varchar)),
                             1, 8))::bigint * 10000
             < 300 * 4294967296 THEN 'val'
        ELSE 'train'
    END AS split
FROM documents
""",
)

# mix1: temperature-scaled (tau = 0.5) source mixing weights. The
# weight base floor(sqrt(sum_tokens)) is integer-exact in both engines
# for n < 2^52 (sqrt of a bigint is correctly rounded, and rounding
# cannot cross an integer boundary below 2^52), and the ppm share is
# one integer-scale rounding — so the hash check covers the whole data
# recipe, not just the counts.
register(
    "mix1_source_mixing_weights",
    lambda spark, sf: curate.source_mixing_weights(
        tables.load(spark, sf, "documents")
    ),
    r"""
WITH per AS (
    SELECT source,
        cast(count(*) AS bigint) AS n_docs,
        cast(sum(len(list_filter(
            string_split_regex(trim(text), '\s+'), x -> x != ''
        ))) AS bigint) AS n_tokens
    FROM documents
    GROUP BY source
),
w AS (
    SELECT *, cast(floor(sqrt(n_tokens)) AS bigint) AS sqrt_weight
    FROM per
)
SELECT source, n_docs, n_tokens, sqrt_weight,
    cast(round(sqrt_weight * 1000000.0
               / sum(sqrt_weight) OVER ()) AS bigint) AS weight_ppm
FROM w
""",
)


# bud1: token-budget corpus selection — deterministic prefix over
# (weight_bp DESC, doc_id ASC) while the running token total fits the
# budget. The Spark side resolves the prefix at weight-bucket level
# (no global single-partition window); the oracle states the naive
# global-window rule — their equality IS the correctness claim
# (also law-tested in tests/test_curate.py).
register(
    "bud1_token_budget_select",
    lambda spark, sf: curate.token_budget_select(
        tables.load(spark, sf, "documents")
    ),
    f"""
WITH {SQL_TOKS},
m AS (
    SELECT doc_id, lang,
        cast(len(toks) AS bigint) AS n_tokens,
        cast(len(list_distinct(toks)) AS bigint) AS n_uniq,
        cast(len(list_filter(toks, x -> x IN {STOP_SQL})) AS bigint)
            AS n_stop
    FROM toks_t
),
w AS (
    SELECT doc_id, lang, n_tokens,
        CASE WHEN n_tokens > 0
             THEN cast(round((n_stop * 3000.0 + n_uniq * 7000.0)
                             / n_tokens) AS bigint)
             ELSE 0 END AS weight_bp
    FROM m
),
c AS (
    SELECT *,
        sum(n_tokens) OVER (ORDER BY weight_bp DESC, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
    FROM w
)
SELECT doc_id, lang, weight_bp, n_tokens FROM c WHERE cum <= 20000
""",
)


# src2: cross-source duplication matrix — d4's verified near-dup pairs
# rolled up per unordered source pair, normalized ppm of the pair
# space; the "which feeds mirror each other" datasheet signal.
register(
    "src2_cross_source_dups",
    lambda spark, sf: curate.cross_source_dup_matrix(
        tables.load(spark, sf, "documents"), 0.5
    ),
    f"""
WITH {SQL_JACCARD},
nd AS (
    SELECT doc_a, doc_b FROM jac
    WHERE shingles_union > 0
      AND cast(round(shingles_common * 1000.0 / shingles_union)
               AS bigint) / 1000.0 >= 0.5
),
lab AS (
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b
    FROM nd
    JOIN documents da ON nd.doc_a = da.doc_id
    JOIN documents db ON nd.doc_b = db.doc_id
),
m AS (
    SELECT source_a, source_b, cast(count(*) AS bigint) AS n_pairs
    FROM lab GROUP BY 1, 2
),
per_src AS (
    SELECT source, cast(count(*) AS bigint) AS n_docs
    FROM documents GROUP BY source
),
j AS (
    SELECT m.source_a, m.source_b, m.n_pairs,
        a.n_docs AS n_docs_a, b.n_docs AS n_docs_b,
        CASE WHEN m.source_a = m.source_b
             THEN cast(a.n_docs * (a.n_docs - 1) / 2 AS bigint)
             ELSE a.n_docs * b.n_docs END AS pair_space
    FROM m
    JOIN per_src a ON m.source_a = a.source
    JOIN per_src b ON m.source_b = b.source
)
SELECT source_a, source_b, n_pairs, n_docs_a, n_docs_b, pair_space,
    1000000 * n_pairs // pair_space AS dup_ppm
FROM j
""",
)


# cap1: per-source document cap by md5 order — the per-domain cap of
# web-scale corpus building (no feed dominates), deterministic and
# growth-stable.
register(
    "cap1_source_cap",
    lambda spark, sf: curate.source_cap_sample(
        tables.load(spark, sf, "documents"), 60
    ),
    """
WITH r AS (
    SELECT doc_id, lang, source,
        row_number() OVER (
            PARTITION BY source
            ORDER BY md5('cap|' || cast(doc_id AS varchar)), doc_id
        ) AS src_rank
    FROM documents
)
SELECT doc_id, lang, source, cast(src_rank AS bigint) AS src_rank
FROM r WHERE src_rank <= 60
""",
)


# shuf1: deterministic global training order — dense md5-order rank;
# the Spark side assembles it two-level (256-bucket offset ledger +
# per-bucket window) so no single-partition window exists; the oracle
# states the naive global rule, so their equality IS the claim.
register(
    "shuf1_deterministic_shuffle",
    lambda spark, sf: curate.deterministic_shuffle(
        tables.load(spark, sf, "documents")
    ),
    """
SELECT doc_id,
    md5('shuf|' || cast(doc_id AS varchar)) AS shuffle_key,
    cast(row_number() OVER (
        ORDER BY md5('shuf|' || cast(doc_id AS varchar)), doc_id
    ) AS bigint) AS shuffle_rank
FROM documents
""",
)


# rel1: the release pipeline (cap1 -> bud1 -> shuf1) as ONE oracle —
# per-source cap, token-budget best-quality prefix over the capped
# pool, deterministic training order over the selected set; each
# predicate textually mirrors its stage's own oracle, so the stages
# are PROVEN to compose (the cur1 pattern for the release side).
register(
    "rel1_release_order",
    lambda spark, sf: curate.release_order(
        tables.load(spark, sf, "documents"), 60, 20000
    ),
    f"""
WITH capped AS (
    SELECT doc_id FROM (
        SELECT doc_id,
            row_number() OVER (
                PARTITION BY source
                ORDER BY md5('cap|' || cast(doc_id AS varchar)), doc_id
            ) AS src_rank
        FROM documents
    ) WHERE src_rank <= 60
),
{SQL_TOKS},
m AS (
    SELECT t.doc_id, t.lang,
        cast(len(toks) AS bigint) AS n_tokens,
        cast(len(list_distinct(toks)) AS bigint) AS n_uniq,
        cast(len(list_filter(toks, x -> x IN {STOP_SQL})) AS bigint)
            AS n_stop
    FROM toks_t t JOIN capped USING (doc_id)
),
w AS (
    SELECT doc_id, lang, n_tokens,
        CASE WHEN n_tokens > 0
             THEN cast(round((n_stop * 3000.0 + n_uniq * 7000.0)
                             / n_tokens) AS bigint)
             ELSE 0 END AS weight_bp
    FROM m
),
c AS (
    SELECT *,
        sum(n_tokens) OVER (ORDER BY weight_bp DESC, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
    FROM w
),
sel AS (SELECT doc_id, lang, weight_bp, n_tokens FROM c WHERE cum <= 20000)
SELECT s.doc_id, s.lang, d.source, s.weight_bp, s.n_tokens,
    cast(row_number() OVER (
        ORDER BY md5('shuf|' || cast(s.doc_id AS varchar)), s.doc_id
    ) AS bigint) AS shuffle_rank
FROM sel s JOIN documents d USING (doc_id)
""",
)

"""Queries staged for the NEXT verify-window rotation (r4).

This round's 50-query driver window is fully occupied by plans the
shared-MV refactor touched (see ``__spark_entry__._VERIFY_FIRST``), so
these entries are deliberately NOT imported into the live registry yet:
a registered-but-never-driver-verified query would break the "every
registered query has a green CORRECTNESS row" invariant.

They get the SAME oracle-parity coverage meanwhile: tests/test_parity.py
parametrizes over PENDING exactly like the live registry, at sf0.001.
Promotion in r4 = move each ``pending()`` call into registry_ml.py /
registry.py and list the name in ``_VERIFY_FIRST``.
"""

from __future__ import annotations

from .. import tables
from ..operators import curate, textops
from .registry import QueryFn
from .registry_ml import SQL_TOKS

PENDING_QUERIES: dict[str, QueryFn] = {}
PENDING_ORACLES: dict[str, str] = {}


def pending(name: str, fn: QueryFn, sql: str | None = None) -> None:
    PENDING_QUERIES[name] = fn
    if sql is not None:
        PENDING_ORACLES[name] = sql


# t7: Gopher-style token-repetition filter. The oracle restates the
# two-stage count directly; non-distinct bigrams via list_transform
# over the token array (the non-distinct twin of SQL_SHINGLES).
pending(
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
pending(
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


# pack1: token-budget sequence packing (window cumsum restated as the
# oracle's running SUM OVER).
pending(
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

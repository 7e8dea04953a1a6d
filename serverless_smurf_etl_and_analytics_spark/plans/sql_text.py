"""Shared DuckDB SQL fragments for the document/text oracles — kept
in a leaf module (no registry imports) so every registry_* module can
use them without creating an import cycle, whichever one Python loads
first."""

from __future__ import annotations

STOP_SQL = "('the', 'a', 'and', 'of', 'to', 'in')"

SQL_TOKS = r"""
toks_t AS (
    SELECT
        doc_id, lang, text,
        list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x != '') AS toks
    FROM documents
)
"""

SQL_SHINGLES = (
    SQL_TOKS
    + r""",
sh_t AS (
    SELECT
        doc_id,
        list_distinct(
            list_transform(range(len(toks) - 1),
                           i -> concat(toks[i+1], ' ', toks[i+2]))
        ) AS sh
    FROM toks_t
)
"""
)


def _mh(i: int) -> str:
    return (
        "list_aggregate(list_transform(sh, x -> md5(concat('"
        + str(i)
        + "|', x))), 'min')"
    )


SQL_SIG = (
    SQL_SHINGLES
    + f""",
sig AS (
    SELECT
        doc_id,
        {', '.join(f'{_mh(i)} AS mh_{i}' for i in range(8))}
    FROM sh_t
),
sigb AS (
    SELECT
        doc_id,
        {', '.join(f'mh_{i}' for i in range(8))},
        CASE WHEN mh_0 IS NULL THEN NULL
             ELSE md5(concat_ws('', mh_0, mh_1, mh_2, mh_3)) END AS band_0,
        CASE WHEN mh_4 IS NULL THEN NULL
             ELSE md5(concat_ws('', mh_4, mh_5, mh_6, mh_7)) END AS band_1
    FROM sig
)
"""
)

SQL_LSH_PAIRS = (
    SQL_SIG
    + """,
eb AS (
    SELECT doc_id, band_0 AS band_val, 0 AS band_idx FROM sigb
    UNION ALL
    SELECT doc_id, band_1 AS band_val, 1 AS band_idx FROM sigb
),
pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM eb a
    JOIN eb b
      ON a.band_val = b.band_val
     AND a.band_idx = b.band_idx
     AND a.doc_id < b.doc_id
)
"""
)

SQL_JACCARD = (
    SQL_LSH_PAIRS
    + """,
jac AS (
    SELECT
        p.doc_a,
        p.doc_b,
        cast(len(list_filter(a.sh, x -> list_contains(b.sh, x)))
             AS bigint) AS shingles_common,
        cast(len(a.sh) + len(b.sh)
             - len(list_filter(a.sh, x -> list_contains(b.sh, x)))
             AS bigint) AS shingles_union
    FROM pairs p
    JOIN sh_t a ON a.doc_id = p.doc_a
    JOIN sh_t b ON b.doc_id = p.doc_b
)
"""
)


# MOSS winnowing fingerprint set (k=4, w=4): k-gram md5 hashes, then
# each w-window's minimum, distinct per doc. Shared by the wn1 overlap
# and wn2 decontamination oracles; mirrors
# operators/textops.py::winnow_fingerprints exactly (list slices are
# 1-based inclusive; range() is end-exclusive).
SQL_WINNOW_FPS = (
    SQL_TOKS
    + r""",
kg AS (
    SELECT doc_id,
        [md5(array_to_string(toks[i:i+3], chr(31)))
         FOR i IN range(1, len(toks) - 2)] AS kgh
    FROM toks_t
    WHERE len(toks) >= 4
),
fp_raw AS (
    SELECT doc_id,
        unnest([list_min(kgh[p:p+3])
                FOR p IN range(1, len(kgh) - 2)]) AS fp
    FROM kg
    WHERE len(kgh) >= 4
),
fps AS (SELECT DISTINCT doc_id, fp FROM fp_raw)
"""
)

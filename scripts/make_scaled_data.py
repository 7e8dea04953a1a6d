"""Deterministic scale-up of the driver's testdata for scale rehearsals.

Builds an N-times-amplified copy of a source scale factor (default:
sf0.1 x 10 = "sf1", ~6M lineitem) so the bench suite can be exercised
beyond the largest driver-provided scale. Amplification preserves the
workload's *shape* the way real growth would:

- FACT tables grow 10x, DIMENSIONS stay fixed — `lineitem` / `orders`
  replicate with per-copy key offsets (transaction ids stay unique,
  store/product/date group counts stay bounded, so aggregate outputs
  keep their cardinality while input rows scale).
- `events` replicates with offset event ids AND user ids: user count
  scales, per-user event density stays constant — the realistic axis
  for sessionization (heavier keys would be the skew rehearsal, which
  tests/test_skew.py covers separately).
- `documents` replicates with offset doc ids; every token in copy i>0
  gets an `_c{i}` suffix. Within a copy the original near-duplicate
  structure survives verbatim (both members of a pair transform
  identically); across copies shingle sets are disjoint, so Jaccard is
  ~0 and the near-dup pair count scales LINEARLY in copies — the
  property the d3/d4/d6 scaling measurement needs. (A corpus where
  copies collide is the adversarial-skew case, tested separately.)
- `embeddings` replicates with offset vec ids; copy i's vectors are
  coordinate-rotated by (7*i mod 64). Rotation is a permutation, so
  within-copy inner products — and therefore every cosine near-dup
  pair — are preserved EXACTLY, while cross-copy cosines drop to
  noise. sim2's output also scales linearly.

Everything is a pure function of the source data and the copy index:
re-running the script reproduces byte-identical outputs, so recorded
scaling numbers stay comparable across rounds.

Usage:
    python scripts/make_scaled_data.py [SRC_DIR] [OUT_DIR] [COPIES]
Defaults: /root/testdata/sf0.1  /root/repo/.scratch/sf1  10
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

DIM_TABLES = ("region", "nation", "customer", "supplier", "part")


def amplify(src: str, out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    for t in DIM_TABLES:
        shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"{t}: copied (dimension)")

    def write(name: str, per_copy_sql: str) -> None:
        sql = " UNION ALL ".join(
            per_copy_sql.format(i=i, src=src) for i in range(copies)
        )
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT parquet)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{name}.parquet'"
        ).fetchone()[0]
        print(f"{name}: {n} rows ({copies} copies)")

    # key strides = max(source key) + 1, hardcoded from the driver's
    # generator (stable across sf: keys are 0-based dense ranges)
    write(
        "orders",
        "SELECT * REPLACE (o_orderkey + {i} * 150000 AS o_orderkey) "
        "FROM '{src}/orders.parquet'",
    )
    write(
        "lineitem",
        "SELECT * REPLACE (l_orderkey + {i} * 150000 AS l_orderkey) "
        "FROM '{src}/lineitem.parquet'",
    )
    write(
        "events",
        "SELECT * REPLACE (event_id + {i} * 100000 AS event_id, "
        "user_id + {i} * 1500 AS user_id) "
        "FROM '{src}/events.parquet'",
    )
    # i=0 must pass text through untouched so the base corpus is a
    # byte-identical subset; the regexp keeps whitespace runs intact.
    doc_copy = (
        "SELECT doc_id + {i} * 5000 AS doc_id, "
        "regexp_replace(text, '(\\S+)', '\\1_c{i}', 'g') AS text, "
        "lang, source, "
        "length(regexp_replace(text, '(\\S+)', '\\1_c{i}', 'g')) AS n_chars "
        "FROM '{src}/documents.parquet'"
    )
    write(
        "documents",
        "SELECT doc_id, text, lang, source, n_chars "
        "FROM '{src}/documents.parquet' WHERE {i} = 0 "
        "UNION ALL " + doc_copy + " WHERE {i} > 0",
    )
    # rotation r=7i mod 64: coprime stride so copies 0..63 all differ;
    # DuckDB list slicing is 1-based inclusive, empty slice when r=0
    # handled by list_concat of [r+1..64] and [1..r]. Beyond 64 copies
    # the rotation wraps (copy 64 would be byte-identical to copy 0),
    # so each 64-copy BLOCK b = i//64 > 0 additionally sign-flips the
    # dims d where (d*(2b+1)) mod 257 < 128. A fixed per-copy sign
    # pattern cancels in every within-copy dot product ((-a)(-b)=ab),
    # so within-copy cosines — and the planted near-dup pairs — are
    # still preserved EXACTLY, while same-rotation copies from
    # different blocks disagree on ~half the signs and their cross
    # cosines drop to noise. The flip modulus is 257 (prime, > 2*64):
    # the r12 scheme used mod 64, whose flip pattern repeats with
    # period 32 in b, so copies 2048 apart got identical rotation AND
    # identical flips — byte-identical embeddings that planted
    # cosine-1.0 cross-copy pairs in any run past 2048 copies and
    # inflated its recorded pair count (ADVICE r12). mod 257 makes
    # the pattern period 257 blocks = 16448 copies. Block 0 still
    # flips nothing, so runs with copies <= 64 (the standard sf1
    # build) remain byte-identical to the pre-block-extension script;
    # 65..2048-copy outputs differ from the r12 scheme's (recorded
    # scaling numbers before r13 used the old flips — same structure,
    # different bytes).
    write(
        "embeddings",
        "SELECT vec_id + {i} * 2000 AS vec_id, "
        "list_transform("
        "list_zip(list_concat(embedding[(({i}*7)%64)+1:64], "
        "embedding[1:({i}*7)%64]), range(1, 65)), "
        "z -> CASE WHEN ({i} // 64) > 0 AND "
        "(z[2] * (2*({i} // 64) + 1)) % 257 < 128 "
        "THEN -z[1] ELSE z[1] END)::FLOAT[] AS embedding, label "
        "FROM '{src}/embeddings.parquet'",
    )


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    amplify(src, out, copies)

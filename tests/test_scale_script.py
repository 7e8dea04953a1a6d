"""Invariants of the scale-rehearsal amplifier (scripts/make_scaled_data.py).

The recorded scaling numbers are only meaningful if amplification
preserves the workload's shape, so the transform's load-bearing
properties are pinned here (pure DuckDB, no Spark session):

- copy 0 passes documents and embeddings through byte-identically
  (the base corpus is a subset of every amplified corpus);
- the embedding transform preserves within-copy inner products
  EXACTLY for every copy index (rotation is a permutation; a fixed
  per-copy sign pattern cancels in dot products), so planted
  near-dup pairs survive amplification at any copy count;
- distinct copies produce distinct vectors even past the 64-copy
  rotation wrap (the sign-flip block extension), and same-rotation
  copies from different blocks land at noise-level cosine, so
  near-dup pair counts scale linearly in copies, never
  quadratically;
- fact keys get disjoint per-copy ranges (no accidental key
  collisions inflating group cardinalities).
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import pytest

SRC = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "make_scaled_data",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "make_scaled_data.py",
    ),
)
make_scaled_data = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(make_scaled_data)


@pytest.fixture(scope="module")
def amplified(tmp_path_factory):
    """A 130-copy amplification of sf0.001 — spans three rotation
    blocks (0, 1, 2) so the wrap behaviour is exercised."""
    out = str(tmp_path_factory.mktemp("sf_amp"))
    make_scaled_data.amplify(SRC, out, 130)
    return out


def _con():
    return duckdb.connect()


def test_copy0_documents_byte_identical(amplified):
    con = _con()
    n_src = con.execute(
        f"SELECT count(*) FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    mismatches = con.execute(
        f"""
        SELECT count(*) FROM '{SRC}/documents.parquet' s
        JOIN '{amplified}/documents.parquet' a USING (doc_id)
        WHERE s.text <> a.text OR s.n_chars <> a.n_chars
        """
    ).fetchone()[0]
    matched = con.execute(
        f"""
        SELECT count(*) FROM '{SRC}/documents.parquet' s
        JOIN '{amplified}/documents.parquet' a USING (doc_id)
        """
    ).fetchone()[0]
    assert mismatches == 0 and matched == n_src


def test_copy0_embeddings_byte_identical(amplified):
    con = _con()
    assert (
        con.execute(
            f"""
            SELECT count(*) FROM '{SRC}/embeddings.parquet' s
            JOIN '{amplified}/embeddings.parquet' a USING (vec_id)
            WHERE s.embedding <> a.embedding
            """
        ).fetchone()[0]
        == 0
    )


def test_within_copy_dot_products_exact_every_block(amplified):
    """dot(T_i(u), T_i(v)) == dot(u, v) for copies in blocks 0/1/2 —
    the property that keeps every planted near-dup pair intact."""
    con = _con()
    n_vec = con.execute(
        f"SELECT count(*) FROM '{SRC}/embeddings.parquet'"
    ).fetchone()[0]
    for copy in (3, 64, 129):
        drift = con.execute(
            f"""
            WITH src AS (
              SELECT vec_id, embedding FROM '{SRC}/embeddings.parquet'
              ORDER BY vec_id LIMIT 40
            ),
            amp AS (
              SELECT vec_id - {copy} * 2000 AS vec_id, embedding
              FROM '{amplified}/embeddings.parquet'
              WHERE vec_id >= {copy} * 2000
                AND vec_id < {copy} * 2000 + {n_vec}
            ),
            dots AS (
              SELECT
                list_sum(list_transform(
                  list_zip(s1.embedding, s2.embedding),
                  z -> z[1] * z[2])) AS d_src,
                list_sum(list_transform(
                  list_zip(a1.embedding, a2.embedding),
                  z -> z[1] * z[2])) AS d_amp
              FROM src s1 JOIN src s2 ON s1.vec_id < s2.vec_id
              JOIN amp a1 ON a1.vec_id = s1.vec_id
              JOIN amp a2 ON a2.vec_id = s2.vec_id
            )
            SELECT max(abs(d_src - d_amp)) FROM dots
            """
        ).fetchone()[0]
        assert drift == 0.0, f"copy {copy}: dot drift {drift}"


def test_rotation_wrap_copies_are_distinct(amplified):
    """Copy 64 shares copy 0's rotation; the block sign flip must
    still make every vector differ, and the cross-block self-cosine
    must sit below near-dup range."""
    con = _con()
    n_vec = con.execute(
        f"SELECT count(*) FROM '{SRC}/embeddings.parquet'"
    ).fetchone()[0]
    identical, max_cos = con.execute(
        f"""
        WITH c0 AS (
          SELECT vec_id, embedding e FROM '{amplified}/embeddings.parquet'
          WHERE vec_id < {n_vec}
        ),
        c64 AS (
          SELECT vec_id - 64 * 2000 AS vec_id, embedding e
          FROM '{amplified}/embeddings.parquet'
          WHERE vec_id >= 64 * 2000 AND vec_id < 64 * 2000 + {n_vec}
        )
        SELECT
          count(*) FILTER (WHERE c0.e = c64.e),
          max(
            list_sum(list_transform(list_zip(c0.e, c64.e),
                                    z -> z[1] * z[2]))
            / (sqrt(list_sum(list_transform(c0.e, x -> x * x)))
               * sqrt(list_sum(list_transform(c64.e, x -> x * x))))
          )
        FROM c0 JOIN c64 USING (vec_id)
        """
    ).fetchone()
    assert identical == 0
    assert max_cos < 0.8, f"cross-block self-cosine {max_cos}"


def test_fact_key_ranges_disjoint(amplified):
    con = _con()
    n, distinct = con.execute(
        f"""
        SELECT count(*), count(DISTINCT event_id)
        FROM '{amplified}/events.parquet'
        """
    ).fetchone()
    assert n == distinct
    n_doc, distinct_doc = con.execute(
        f"""
        SELECT count(*), count(DISTINCT doc_id)
        FROM '{amplified}/documents.parquet'
        """
    ).fetchone()
    assert n_doc == distinct_doc


def test_cross_copy_documents_share_no_shingles(amplified):
    """The token salt makes cross-copy Jaccard ~0 — near-dup pair
    counts scale linearly in copies. Checked on whole tokens."""
    con = _con()
    overlap = con.execute(
        f"""
        WITH tok AS (
          SELECT doc_id // 5000 AS copy,
                 unnest(string_split(text, ' ')) AS t
          FROM '{amplified}/documents.parquet'
          WHERE doc_id // 5000 IN (0, 1) AND len(text) > 0
        )
        SELECT count(*) FROM (
          SELECT t FROM tok GROUP BY t
          HAVING count(DISTINCT copy) > 1
        )
        """
    ).fetchone()[0]
    assert overlap == 0

"""Cross-engine parity for the PII scrub (textops.pii_scrub): the
driver corpus contains no PII, so the operator is proven here on
synthetic fixtures instead — the same pattern strings must produce
identical counts AND identical redacted text in Spark (Java regex)
and DuckDB (RE2), plus zero false positives over the real corpus."""

from __future__ import annotations

import pytest

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import textops

from conftest import SF_DIR

ROWS = [
    (1, "contact john.doe+spam@example.co.uk or admin@host.io today"),
    (2, "server at 10.0.255.7 answered; backup 192.168.1.1 did not"),
    (3, "call +1 (555) 123-4567 or 555 987 6543 before 9"),
    (4, "ssn 123-45-6789 leaked; partial 12-345-678 is not an ssn"),
    (5, "no pii here, just 3.14 and version 1.2.3 fragments"),
    (6, ""),
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    return {r["doc_id"]: r for r in textops.pii_scrub(docs).collect()}


def test_counts(scrubbed):
    got = {
        i: (r["n_email"], r["n_ipv4"], r["n_phone"], r["n_ssn"])
        for i, r in scrubbed.items()
    }
    assert got[1] == (2, 0, 0, 0)
    assert got[2] == (0, 2, 0, 0)
    assert got[3][2] == 2
    assert got[4][3] == 1
    assert got[5] == (0, 0, 0, 0)
    assert got[6] == (0, 0, 0, 0)


def test_redaction_replaces_every_match(scrubbed):
    assert scrubbed[1]["redacted"].count("[EMAIL]") == 2
    assert "@" not in scrubbed[1]["redacted"]
    assert scrubbed[2]["redacted"].count("[IPV4]") == 2
    assert "10.0.255.7" not in scrubbed[2]["redacted"]
    assert scrubbed[4]["redacted"] == (
        "ssn [SSN] leaked; partial 12-345-678 is not an ssn"
    )
    assert scrubbed[5]["redacted"] == ROWS[4][1]  # untouched


def test_duckdb_regex_parity(spark, duck, scrubbed):
    """The exact pattern strings are engine-portable: DuckDB's RE2
    finds the same match counts and produces the same redacted text
    (the 'g' flag mirrors Spark's replace-all default)."""
    duck.execute("CREATE OR REPLACE TABLE pii_fixture(doc_id BIGINT, text VARCHAR)")
    duck.executemany(
        "INSERT INTO pii_fixture VALUES (?, ?)", ROWS
    )
    sql_counts = ", ".join(
        f"cast(len(regexp_extract_all(text, '{pat}')) AS bigint)"
        f" AS n_{name}"
        for name, pat in textops.PII_PATTERNS.items()
    )
    red = "text"
    for name, pat in textops.PII_PATTERNS.items():
        red = f"regexp_replace({red}, '{pat}', '[{name.upper()}]', 'g')"
    ddf = duck.execute(
        f"SELECT doc_id, {sql_counts}, {red} AS redacted, "
        f"md5({red}) AS redacted_md5 FROM pii_fixture"
    ).df()
    for _, row in ddf.iterrows():
        got = scrubbed[row["doc_id"]]
        for name in textops.PII_PATTERNS:
            assert got[f"n_{name}"] == row[f"n_{name}"], (
                row["doc_id"],
                name,
            )
        assert got["redacted"] == row["redacted"]
        assert got["redacted_md5"] == row["redacted_md5"]


def test_corpus_is_clean(spark):
    """Zero matches over the real documents table — the operator runs
    at corpus scale and the synthetic corpus is PII-free (so the
    registry carries no trivially-all-zero query)."""
    docs = tables.load(spark, SF_DIR, "documents")
    out = textops.pii_scrub(docs)
    assert out.filter(out.n_pii > 0).count() == 0

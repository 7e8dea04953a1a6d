"""Hypothesis property tests for the exact-money determinism layer:
the cross-engine claims money.py makes, checked against DuckDB on
generated values (no Spark session needed — the Spark expressions are
the same scalar formulas, already exercised by every parity test)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# dollar-ish doubles, including adversarial binary-representation cases
dollar_values = st.one_of(
    st.integers(min_value=-10**7, max_value=10**7).map(lambda c: c / 100),
    st.floats(
        min_value=-1e5, max_value=1e5,
        allow_nan=False, allow_infinity=False,
    ),
)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(max_examples=200, deadline=None)
@given(st.lists(dollar_values, min_size=1, max_size=50))
def test_cents_sum_is_order_independent(values):
    """SUM over integer cents is exact: any reduction order gives the
    same total (the float SUM it replaces is order-sensitive)."""
    cents = [round(v * 100) for v in values]
    assert sum(cents) == sum(reversed(cents))
    fwd = 0
    for c in cents:
        fwd += c
    assert fwd == sum(sorted(cents))


@settings(max_examples=200, deadline=None)
@given(dollar_values)
def test_cents_matches_duckdb_round(duck, v):
    """Python round-half-even differs from engine round, so money.cents
    must be compared against the ENGINE: DuckDB's
    cast(round(x*100) AS bigint) is the oracle-side twin."""
    got = duck.execute(
        "SELECT cast(round(? * 100) AS bigint)", [v]
    ).fetchone()[0]
    # the Spark twin F.round(x*100).cast('long') is BigDecimal HALF_UP,
    # i.e. half away from zero on the double's decimal repr
    import math

    x = v * 100
    want = (
        math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)
    )
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-10**12, max_value=10**12))
def test_dollars_round_trip(duck, c):
    """cents -> dollars is the same double in DuckDB and IEEE python."""
    got = duck.execute(
        "SELECT cast(? / 100.0 AS double)", [c]
    ).fetchone()[0]
    assert got == c / 100.0


@settings(max_examples=200, deadline=None)
@given(dollar_values, st.integers(min_value=0, max_value=3))
def test_sql_round_to_is_integer_scale_stable(duck, v, scale):
    """sql_round_to: scale-up -> integer round -> scale-down produces
    identical doubles for repeated evaluation and survives the
    round-trip through the scaled integer."""
    from serverless_smurf_etl_and_analytics_spark.functions.money import (
        sql_round_to,
    )

    expr = sql_round_to("?", scale)
    a = duck.execute(f"SELECT {expr}", [v]).fetchone()[0]
    b = duck.execute(f"SELECT {expr}", [v]).fetchone()[0]
    assert a == b
    # the result is fully determined by one integer: the scaled round.
    # (cross-engine stability comes from both engines computing integer
    # / 10^scale — the same double — never from decimal re-rounding)
    p = 10**scale
    c = duck.execute(
        f"SELECT cast(round(? * {p}) AS bigint)", [v]
    ).fetchone()[0]
    assert a == c / p

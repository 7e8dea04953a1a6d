"""Exact money arithmetic shared by Spark plans and DuckDB oracles.

The reference keeps money as ``Decimal(10,2)`` end-to-end
(``process_upload.py:31-42``, ``write-metrics/lambda_function.py:143-156``).
The driver's testdata stores money as DOUBLE, and a float SUM is
reduction-order-dependent — Spark and DuckDB would drift in the last ulp.
So every money aggregate goes through integer cents:

    cents   = cast(round(x * 100) as bigint)   -- deterministic scalar op
    sum     = SUM(cents)                        -- exact integer math
    dollars = sum / 100.0                       -- identical double both sides

Scalar double math (mul/div/sub on identical inputs) is IEEE-deterministic
across engines; only *aggregation* of floats is order-sensitive.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column) -> Column:
    """Dollars (double) -> exact integer cents."""
    return F.round(col * F.lit(100)).cast("long")


def dollars(cents_col: Column) -> Column:
    """Integer cents -> double dollars."""
    return (cents_col / F.lit(100.0)).cast("double")


def sum_dollars(col: Column) -> Column:
    """Exact SUM over a double dollar column, returned as double."""
    return dollars(F.sum(cents(col)))


def round_to(col: Column, scale: int = 2) -> Column:
    """Cross-engine-stable ``round(x, scale)`` for doubles.

    Spark's ``round`` rounds the *shortest decimal repr* of a double
    (HALF_UP on ``BigDecimal.valueOf``), DuckDB rounds the *binary*
    value — at fractional scales they disagree on values like 5.355
    (repr-tie but binary 5.35499..). At integer scale every repr-tie
    ``x.5`` is exactly representable, so HALF_UP and half-away-from-zero
    agree in both engines. Hence: scale up, round to integer, scale down.
    """
    p = float(10**scale)
    return (F.round(col * F.lit(p)).cast("long") / F.lit(p)).cast("double")


def sql_round_to(expr: str, scale: int = 2) -> str:
    p = 10**scale
    return f"cast(cast(round(({expr}) * {p}) as bigint) / {p}.0 as double)"


def sql_cents(expr: str) -> str:
    return f"cast(round(({expr}) * 100) as bigint)"


def sql_sum_dollars(expr: str) -> str:
    return f"cast(sum({sql_cents(expr)}) / 100.0 as double)"

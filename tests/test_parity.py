"""Oracle-parity harness mirroring the driver's correctness gate:
every registry query's Spark result must exactly match its DuckDB
oracle (row count + column names + order-insensitive values, floats
compared bit-exact) at sf0.001.
"""

from __future__ import annotations

import math

import pytest

from serverless_smurf_etl_and_analytics_spark.plans import registry

from conftest import SF_DIR


def canon_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(float(v)))
    if isinstance(v, (int,)):
        return ("i", int(v))
    if isinstance(v, (list, tuple)):
        return ("a", tuple(canon_cell(x) for x in v))
    return ("s", str(v))


def canon(pdf):
    cols = sorted(pdf.columns)
    rows = []
    for row in pdf[cols].itertuples(index=False, name=None):
        rows.append(tuple(canon_cell(v) for v in row))
    rows.sort()
    return cols, rows


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_parity(spark, duck, name):
    sdf = registry.QUERIES[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(registry.ORACLES[name]).df()
    scols, srows = canon(sdf)
    dcols, drows = canon(ddf)
    assert scols == dcols, f"{name}: columns {scols} != {dcols}"
    assert len(srows) == len(drows), (
        f"{name}: rowcount {len(srows)} != {len(drows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(srows, drows) if a != b
    ][:3]
    assert not mismatches, f"{name}: first mismatches {mismatches}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "total_sales" in df.columns and "top_products" in df.columns


def test_registry_consistency():
    # every oracle refers to a registered query
    assert set(registry.ORACLES) <= set(registry.QUERIES)


# Queries staged for the next verify-window rotation get the same
# oracle-parity gate locally before they ever reach the driver.
from serverless_smurf_etl_and_analytics_spark.plans import registry_pending


@pytest.mark.parametrize("name", sorted(registry_pending.PENDING_ORACLES))
def test_pending_oracle_parity(spark, duck, name):
    sdf = registry_pending.PENDING_QUERIES[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(registry_pending.PENDING_ORACLES[name]).df()
    scols, srows = canon(sdf)
    dcols, drows = canon(ddf)
    assert scols == dcols, f"{name}: columns {scols} != {dcols}"
    assert len(srows) == len(drows), (
        f"{name}: rowcount {len(srows)} != {len(drows)}"
    )
    mismatches = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
    assert not mismatches, f"{name}: first mismatches {mismatches}"

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


def test_registry_results_are_driver_canonicalizable(spark):
    """The r4 pq1 lesson as a standing gate: no registered query may
    return an array-typed column — the driver canonicalizer sorts with
    pandas, which cannot factorize ndarray cells (serialize arrays,
    j5_wide_serialized-style). Schema-only, so checking every query is
    cheap."""
    from pyspark.sql.types import ArrayType, MapType

    offenders = []
    for name, fn in registry.QUERIES.items():
        if name not in registry.ORACLES:
            continue  # rows-only queries never reach the hash compare
        df = fn(spark, SF_DIR)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType)):
                offenders.append((name, f.name, str(f.dataType)))
    assert not offenders, f"driver-unsafe columns: {offenders}"

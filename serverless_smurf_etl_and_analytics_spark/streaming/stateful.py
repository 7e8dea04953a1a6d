"""Custom stateful streaming operator (SURVEY §2.9 extension):
per-store running-baseline deviation detection with
``applyInPandasWithState`` — the custom-operator escape hatch for
semantics the built-in windowed aggregations cannot express: the
baseline is an ACCUMULATED per-key state across ALL prior
micro-batches (a lifetime running mean), not a bounded time window.

This is the streaming form of the reference's anomaly gate
(``detect-anomalies/lambda_function.py:64-135,338-362``): history
excludes today, detection requires >= min_days of history, deviation
is (today - mean) / mean as a 1-decimal percent.

Scale notes: state per key is two scalars (days_seen, sum_cents) — at
100 TB the state store grows with |stores|, not data volume; the
stream shuffles once by store_id (the applyInPandasWithState grouping)
and each micro-batch touches only keys present in the batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "store_id string, sale_date string, sales_c long, days_seen int, "
    "running_avg_c double, deviation_pct double"
)
STATE_SCHEMA = "days int, sum_c long"


def running_deviation(store_days: DataFrame, min_days: int = 3) -> DataFrame:
    """(store_id, sale_date, sales_c) stream -> deviation rows vs the
    per-store running mean of all PRIOR days, emitted once >= min_days
    of history exist. Rows inside a batch are folded in sale_date
    order; state carries (days_seen, sum_cents) across batches."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    md = min_days

    # self-contained closure: no module-global references, so workers
    # never need this repo on their PYTHONPATH
    def fn(key, pdfs, state):
        import math

        import pandas as pd

        # half-away-from-zero at 1 decimal: Python round() is
        # half-to-even and would diverge from the batch A10 path and
        # the DuckDB oracle (both F.round/ROUND semantics) at exact
        # .05 boundaries
        def round1(x):
            return math.copysign(math.floor(abs(x) * 10.0 + 0.5), x) / 10.0

        (store_id,) = key
        days, sum_c = state.get if state.exists else (0, 0)
        out = {
            "store_id": [], "sale_date": [], "sales_c": [],
            "days_seen": [], "running_avg_c": [], "deviation_pct": [],
        }
        for pdf in pdfs:
            for _, r in pdf.sort_values("sale_date").iterrows():
                sc = int(r["sales_c"])
                if days >= md and sum_c > 0:
                    avg = sum_c / days
                    dev = round1((sc - avg) / avg * 100.0)
                    out["store_id"].append(store_id)
                    out["sale_date"].append(r["sale_date"])
                    out["sales_c"].append(sc)
                    out["days_seen"].append(days)
                    out["running_avg_c"].append(avg)
                    out["deviation_pct"].append(dev)
                days += 1
                sum_c += sc
        state.update((days, sum_c))
        if out["store_id"]:
            yield pd.DataFrame(out)

    return store_days.groupBy("store_id").applyInPandasWithState(
        fn,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )

"""Daily-report formatter (SURVEY.md §2.6 O5/O9, §2.8 string layer):
the reference's ``generate-report/lambda_function.py:51-147`` builds a
formatted text report from company metrics, payment breakdown (sorted
by amount desc, title-cased — O9 + ``initcap``, ``:83-84``), top
products, and priority-sorted recommendations (O5, ``:210-211``).

Here the report is DATA: one row per line with (section_rank, line_no,
line), so the text layer is an oracle-checkable query; rendering to a
single string (the reference's ``textwrap.fill`` presentation,
``:170-175``) is a driver-side join over the collected lines.

All numbers are formatted with C-style ``format_string`` — DuckDB's
``printf`` produces byte-identical text, and every value is an exact
integer-cents-derived double, so no cross-engine rounding drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .insights import recommendations
from .metrics import company_daily, payment_breakdown, store_day_metrics


def _section(df: DataFrame, rank: int, line: F.Column, order: list) -> DataFrame:
    w = Window.partitionBy(F.lit(rank)).orderBy(*order)
    return df.select(
        F.lit(rank).cast("int").alias("section_rank"),
        F.row_number().over(w).cast("int").alias("line_no"),
        line.alias("line"),
    )


def daily_report_lines(txns: DataFrame, date: str) -> DataFrame:
    """The report body for one date as (section_rank, line_no, line)
    rows — header, company KPIs (+ best/worst store), payment methods
    by amount desc, and recommendations by priority rank."""
    day = txns.filter(F.col("sale_date") == date)

    daily = store_day_metrics(day)
    company = company_daily(daily)
    header = _section(
        company,
        1,
        F.concat(F.lit("DAILY SALES REPORT - "), F.col("sale_date")),
        [F.col("sale_date")],
    )

    kpis = _section(
        company,
        2,
        F.format_string(
            "Total sales $%.2f across %d stores; %d transactions "
            "(avg $%.2f); best store %s ($%.2f), worst store %s ($%.2f)",
            F.col("total_sales"),
            F.col("store_count"),
            F.col("total_transactions"),
            F.col("avg_transaction"),
            F.col("best_store_id"),
            F.col("best_store_sales"),
            F.col("worst_store_id"),
            F.col("worst_store_sales"),
        ),
        [F.col("sale_date")],
    )

    pay = payment_breakdown(day)
    payments = _section(
        pay,
        3,
        F.format_string(
            "%s: $%.2f (%d lines)",
            F.initcap(F.col("payment_method")),
            F.col("net_amount"),
            F.col("line_count"),
        ),
        [F.desc("net_amount"), F.asc("payment_method")],
    )

    recs = recommendations(txns).filter(F.col("sale_date") == date)
    rec_lines = _section(
        recs,
        4,
        F.format_string(
            "[%s] store %s: %s (%.1f%%)",
            F.col("priority"),
            F.col("store_id"),
            F.col("action"),
            F.col("deviation_pct"),
        ),
        [F.asc("priority_rank"), F.asc("store_id")],
    )

    return header.unionByName(kpis).unionByName(payments).unionByName(
        rec_lines
    )


def render_report(txns: DataFrame, date: str, width: int = 78) -> str:
    """Driver-side presentation: collect the (tiny) line table and wrap
    — the reference's ``textwrap.fill`` layer, deliberately not a Spark
    op."""
    import textwrap

    rows = (
        daily_report_lines(txns, date)
        .orderBy("section_rank", "line_no")
        .collect()
    )
    out: list[str] = []
    last_section = None
    for r in rows:
        if last_section is not None and r["section_rank"] != last_section:
            out.append("")
        last_section = r["section_rank"]
        out.append(textwrap.fill(r["line"], width=width))
    return "\n".join(out)

"""Distributive statistics operators: mergeable KMV distinct-count
sketches and exact grouped quantiles via value-domain compression
(SURVEY.md LLM-pipeline brief; the reference computes no cardinality
estimates or percentiles — its rollups are plain sums,
``calculate-metrics/lambda_function.py``).

Both operators are deterministic across engines: the KMV sketch hashes
with md5 (hex is byte-identical everywhere, so the retained k-minimum
set is a pure function of the data), and the quantile definition is
the explicit ceil-rank order statistic (idx = ceil(p*n), value = the
idx-th smallest) restated identically in the DuckDB oracle — no
engine-specific interpolation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

U32 = 1 << 32
KMV_K = 64
KMV_SALT = "kmv|"


def _hash32(col: F.Column) -> F.Column:
    """First 32 bits of md5 as an unsigned long — the KMV hash domain.
    md5 hex is byte-identical in Spark, DuckDB, and Python, so the
    sketch contents (not just the estimate) are oracle-checkable."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(KMV_SALT), col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def kmv_distinct(
    df: DataFrame, group: str, value: str, k: int = KMV_K
) -> DataFrame:
    """sk1: per-``group`` KMV (k-minimum-values) distinct-count sketch
    over ``value``, with the exact count alongside so the estimate is
    auditable: est = (k-1) * 2^32 / h_k where h_k is the k-th smallest
    distinct 32-bit hash (Bar-Yossef et al. 2002); groups holding
    fewer than k distinct hashes report their exact hash count.

    Output: (group, n_exact, n_hashes_kept, kth_hash, est_distinct,
    err_bp) — all integers.

    Scale design (the reason KMV and not a plain countDistinct): the
    sketch is MERGEABLE — min-k of a union is the min-k of the merged
    min-k's — so it partial-aggregates. The plan is (1) map-side
    distinct on (group, hash); (2) an Arrow-batched per-partition
    combiner that keeps only each group's k smallest hashes, bounding
    what the shuffle and the final per-group sort ever see to
    k x n_partitions rows regardless of cardinality; (3) a final
    window over that bounded set. A billion-distinct group ships 64
    values per partition, not a billion. Merge law is pytest-proven
    (``tests/test_stats.py``).
    """
    # distinct FIRST, md5 after: the hash is a pure function of the
    # value, so deduping raw (group, value) pairs before hashing does
    # not change the retained set but cuts the md5+conv work from
    # row-count to distinct-count (6x fewer at sf0.1)
    # the second distinct collapses 32-bit hash collisions so the
    # sketch is over distinct HASHES (the KMV estimator's domain),
    # exactly like the oracle's DISTINCT (g, h)
    hashed = (
        df.select(F.col(group).cast("string").alias("g"), F.col(value).alias("v"))
        .distinct()
        .select("g", _hash32(F.col("v")).alias("h"))
        .distinct()
    )

    def keep_kmin(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield b.sort_values("h").groupby("g", sort=False).head(k)[
                ["g", "h"]
            ]

    partial = hashed.mapInPandas(keep_kmin, schema="g string, h long")
    # the group key survives mapInPandas as a string for schema
    # stability; restore the caller's type on the way out.
    gtype = df.schema[group].dataType
    w = Window.partitionBy("g").orderBy("h")
    ranked = partial.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    sketch = ranked.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_hashes_kept"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("kth_hash"),
    )
    exact = df.groupBy(F.col(group).cast("string").alias("g")).agg(
        F.countDistinct(value).alias("n_exact")
    )
    j = sketch.join(exact, "g")
    est = F.when(
        F.col("kth_hash").isNotNull(),
        F.expr(f"({k - 1} * {U32}) div kth_hash"),
    ).otherwise(F.col("n_hashes_kept"))
    out = j.select(
        F.col("g").cast(gtype).alias(group),
        "n_exact",
        "n_hashes_kept",
        "kth_hash",
        est.alias("est_distinct"),
    )
    return out.withColumn(
        "err_bp",
        F.expr(
            "cast(round(abs(est_distinct - n_exact) * 10000.0 / n_exact)"
            " as bigint)"
        ),
    )


def group_quantiles(txns: DataFrame) -> DataFrame:
    """q1: exact p50/p90/p99 of line cents per payment method, via
    value-domain compression — the scalable exact-quantile plan.

    Definition (engine-neutral): idx_p = ceil(p*n) computed as
    (p_pct*n + 99) div 100 in pure integers; the quantile is the
    smallest value whose cumulative row count reaches idx_p.

    Scale design: instead of sorting n rows per group (a window over
    the fact table), aggregate to (group, value) counts FIRST — the
    window then runs over distinct values only, which for integer
    cents is bounded by the price domain, not the row count. At
    100 TB the partial count agg is map-side combined and the sort
    input shrinks by orders of magnitude; if even the value domain is
    huge, the same plan coarsens values into fixed-point bins
    (documented alternative; exact here since cents are discrete).
    """
    uni = txns.groupBy(
        "payment_method", F.col("line_cents").alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    w_cum = (
        Window.partitionBy("payment_method")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("payment_method")
    u = uni.withColumn("cum", F.sum("c").over(w_cum)).withColumn(
        "n", F.sum("c").over(w_all)
    )

    def q(pct: int) -> F.Column:
        idx = F.expr(f"({pct} * n + 99) div 100")
        return F.min(F.when(F.col("cum") >= idx, F.col("v")))

    return u.groupBy("payment_method").agg(
        F.max("n").alias("n_lines"),
        F.min("v").alias("min_c"),
        q(50).alias("p50_c"),
        q(90).alias("p90_c"),
        q(99).alias("p99_c"),
        F.max("v").alias("max_c"),
    )


def kmv_daily_sketches(
    txns: DataFrame, k: int = KMV_K
) -> DataFrame:
    """Per-(store, day) KMV sketch as an array column — the
    materializable form: the daily pipeline can persist one bounded
    row per store-day (<= k hashes) and answer distinct-count
    questions over ANY date range later by merging, never rescanning
    the fact table. Retention is ``slice(sort(set), k)`` per group:
    collect_set is bounded by the per-store-day sku count (catalog-
    sized, not fact-sized; were it unbounded, the mapInPandas
    combiner from :func:`kmv_distinct` drops in unchanged)."""
    h = _hash32(F.col("item_sku"))
    per_day = txns.select(
        "store_id", "sale_date", h.alias("h")
    ).groupBy("store_id", "sale_date").agg(
        F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("sketch")
    )
    return per_day


def kmv_merge_range(
    txns: DataFrame, start: str, end: str, k: int = KMV_K
) -> DataFrame:
    """sk2: distinct-SKU estimate per store over [start, end] by
    MERGING the per-day sketches — min-k of the union of per-day
    min-k sets equals min-k of the union of all hashes (the KMV merge
    law; pytest proves merged == direct on the filtered fact table).
    Exact count rides along for auditability, as in sk1.

    Scale design: after the daily layer is materialized, this query
    touches |stores| x |days| rows of <= k values each — the fact
    table is not read at all (here it derives the dailies inline
    because the bench runs standalone). The merge is explode +
    re-rank: one bounded shuffle."""
    in_range = txns.filter(F.col("sale_date").between(start, end))
    daily = kmv_daily_sketches(in_range, k)
    merged = kmv_merge_daily(daily, k)
    exact = in_range.groupBy("store_id").agg(
        F.countDistinct("item_sku").alias("n_exact")
    )
    return (
        merged.join(exact, "store_id")
        .select(
            "store_id",
            "n_days_merged",
            "n_exact",
            "kth_hash",
            "est_distinct",
        )
        .withColumn(
            "err_bp",
            F.expr(
                "cast(round(abs(est_distinct - n_exact) * 10000.0"
                " / n_exact) as bigint)"
            ),
        )
    )


def kmv_merge_daily(daily: DataFrame, k: int = KMV_K) -> DataFrame:
    """Merge a per-(store, day) sketch table over whatever rows it
    holds — the half of sk2 the PIPELINE uses: once
    ``kmv_daily_sketches`` is materialized, any range query filters
    the bounded sketch table and merges, never touching facts (so
    there is no exact column here; auditing against facts is the
    registered sk2 query's job)."""
    exploded = daily.select(
        "store_id", F.explode("sketch").alias("h")
    ).distinct()
    w = Window.partitionBy("store_id").orderBy("h")
    ranked = exploded.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    sketch = ranked.groupBy("store_id").agg(
        F.count(F.lit(1)).alias("n_hashes_kept"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("kth_hash"),
    )
    days = daily.groupBy("store_id").agg(
        F.countDistinct("sale_date").alias("n_days_merged")
    )
    est = F.when(
        F.col("kth_hash").isNotNull(),
        F.expr(f"({k - 1} * {U32}) div kth_hash"),
    ).otherwise(F.col("n_hashes_kept"))
    return sketch.join(days, "store_id").select(
        "store_id", "n_days_merged", "kth_hash", est.alias("est_distinct")
    )

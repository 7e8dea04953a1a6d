"""Physical-layout operators: bucketed tables for shuffle-free
co-located joins (plus the Z-order sort in quality.write_zordered).

The reference pre-shapes data for its access patterns — the DynamoDB
key design makes every serving read a single-partition seek
(``infrastructure/dynamodb.tf:4-43``), and the S3 layout is
Hive-partitioned for pruning (``process_upload.py:205``). Bucketing
is the Spark-native third leg: hash-cluster BOTH sides of a recurring
join on the join key at WRITE time, so every later join of those
tables is exchange-free — at 100 TB the dominant cost of a large
fact-to-fact join is its two shuffles, and bucketing removes both for
every downstream run at the price of one clustered write.

Guarantees used (and asserted by tests/test_layout.py): matching
bucket counts + join key == bucket key => SortMergeJoin with no
ShuffleExchange on either side; ``sortBy`` at write time additionally
lets the join skip the per-task sort. Caveat: a pruning-only read (an
equality filter on the bucket key with no join/agg in the plan) must
set ``spark.sql.sources.bucketing.autoBucketedScan.enabled=false`` —
the DisableUnnecessaryBucketedScan rule otherwise turns the bucketed
read (and with it, bucket pruning) off.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    keys: Sequence[str],
    n_buckets: int = 8,
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table registered in
    the session catalog (bucketing metadata lives in the catalog, so
    plain ``spark.read.parquet`` would not see it). Choose
    ``n_buckets`` once per join family — both sides must match for
    the exchange-free plan; at cluster scale pick it near the target
    parallelism for the joined stage (bucket = task)."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table_name)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: Sequence[str],
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys —
    plans as a SortMergeJoin whose children read pre-bucketed files
    directly (no Exchange; with sorted buckets, no Sort either)."""
    return spark.table(left_table).join(
        spark.table(right_table), list(keys)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    spread_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resilient equi-join: salt the LARGE side's hot keys apart
    and replicate the small side across the salt space, so one
    pathological key spreads over ``n_salts`` tasks instead of pinning
    a single straggler. The classic manual remedy for the skews AQE's
    skew-join split cannot fix — a skewed BROADCAST probe side, or a
    shuffle join whose hot partition exceeds what post-shuffle
    splitting can rebalance.

    ``spread_col`` names any column on the left whose values vary
    within a key (a row id, event id, line number); the salt is
    ``xxhash64(spread_col) pmod n_salts`` — deterministic per row, so
    the join result is a pure function of the data (law-tested equal
    to the unsalted join, including null-key rows). Cost: the right
    side is replicated n_salts times — size it like a broadcast
    (bounded dimension), which is exactly the case where skew hurts
    most.
    """
    from pyspark.sql import functions as F

    salted_l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(spread_col), F.lit(n_salts))
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias("_salt")
    salted_r = right.select("*", salts).withColumn(
        "_salt", F.col("_salt").cast("long")
    )
    return salted_l.join(salted_r, [key, "_salt"]).drop("_salt")

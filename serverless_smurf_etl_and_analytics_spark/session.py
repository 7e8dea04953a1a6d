"""SparkSession factory tuned for this engine.

Scale notes (100 TB target):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  dynamic broadcast conversion replace hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` is only the pre-AQE ceiling; at cluster
  scale set it ~2-3x total cores and let AQE coalesce.
- Session timezone pinned to UTC so date extraction from parquet
  timestamps is engine-independent (matches the DuckDB oracle).
- Arrow enabled for the few pandas-UDF paths (similarity, multimodal).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "smurf-analytics",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SMURF_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # partition values stay strings: "0007" must not come back as 7
        .config(
            "spark.sql.sources.partitionColumnTypeInference.enabled",
            "false",
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SMURF_DRIVER_MEM", "8g"))
        # sized to the broadcast gather tier's ceiling: an Arrow
        # collect of a _GATHER_MMAP_BYTES-sized corpus serializes
        # ~3.5 GB (float64 embeddings); Spark's 1 GB default aborts
        # that collect MID-TIER (the r11 emb6m rehearsal hit it at 6M
        # vectors — both transports died). Above the gate nothing
        # collects at all (the mmap artifact builds distributively).
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SMURF_MAX_RESULT_SIZE", "4g"),
        )
        .config("spark.ui.enabled", "false")
    )
    # deployment escape hatch for static (pre-session) confs — e.g.
    # the scale rehearsals set
    # spark.python.worker.faulthandler.enabled=true so a crashed
    # Python worker leaves a traceback instead of a bare BrokenPipe
    # (the r11 emb6m postmortem had nothing to read). Format:
    # "k=v;k=v"; malformed entries are skipped.
    extra = os.environ.get("SMURF_EXTRA_CONF", "")
    for kv in extra.split(";"):
        k, sep, v = kv.partition("=")
        if sep and k.strip():
            builder = builder.config(k.strip(), v.strip())
    return builder.getOrCreate()


def clear_operator_caches(spark: SparkSession) -> None:
    """Free every DataFrame persisted by the operator layer.

    Cache lifetime is CALLER-owned: several operators persist shared
    subtrees (dedup shingles/band tables, similarity band/assignment
    tables, the insights daily/anomaly inputs) so that logically-equal
    plans within — and across — queries reuse one materialization via
    Spark's cache manager. A short-lived job gets that reuse for free
    and the blocks die with the session; a long-lived serving session
    should call this (or ``df.unpersist()`` on handles it tracked, as
    ``pipeline.run_daily_pipeline`` does) once a batch of queries is
    done, or cached blocks accumulate for the session lifetime."""
    spark.catalog.clearCache()


def tune_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tuning to a session we did not build
    (the driver hands us its own session in ``entry``/``queries``)."""
    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }
    for k, v in conf.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime-settable on this session; fine
    return spark

"""Versioned parquet tables: a minimal commit-log layer (manifest per
version, atomic publish, optimistic concurrency, time travel, and
row-level MERGE) over plain parquet files.

The reference gets row-level upsert and read-after-write consistency
for free from DynamoDB (``write-metrics/lambda_function.py:104``); a
parquet lake has neither — a half-written directory is visible to
readers, a re-run clobbers history, and two writers corrupt each
other. This layer supplies the three guarantees the pipeline's sinks
otherwise lack, with the same mechanics (at toy scale) as the table
formats a production deployment would use:

- **Atomic publish**: data files land under an unreferenced
  ``data/v<N>-<token>/`` directory first; the version only becomes
  visible when its manifest (the full file listing) is linked into
  ``_log/<N>.json`` via ``os.open(O_CREAT | O_EXCL)`` — readers
  either see the complete version or nothing.
- **Optimistic concurrency**: the O_EXCL create IS the commit race —
  exactly one writer can create ``_log/<N>.json``; the loser re-reads
  the head and retries against the new state. No locks.
- **Snapshot isolation / time travel**: a manifest is immutable and
  lists every file composing its version, so ``read_version(n)``
  returns version n byte-for-byte forever, regardless of later
  commits.

Scale notes: manifests list file paths, so a version flip is O(1)
regardless of data size; MERGE rewrites only the union of current +
updates (at 100 TB the same plan narrows to the partitions holding
matched keys — the partition-pruned variant the daily pipeline's
dynamic overwrite already demonstrates); readers never list data
directories (the manifest is the source of truth), so stale temp
files from crashed writers are invisible and garbage-collectable.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG = "_log"
_DATA = "data"


def _log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, _LOG)


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(_log_dir(table_dir), f"{version:012d}.json")


def latest_version(table_dir: str) -> int | None:
    """Highest committed version, or None for an empty/absent table."""
    d = _log_dir(table_dir)
    if not os.path.isdir(d):
        return None
    versions = [
        int(f.split(".")[0])
        for f in os.listdir(d)
        if f.endswith(".json")
    ]
    return max(versions) if versions else None


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def commit_version(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    mode: str = "append",
    op: str = "write",
) -> int:
    """Write ``df`` as a new table version and atomically publish it.
    ``mode='append'`` stacks onto the previous version's files;
    ``mode='overwrite'`` replaces the logical content (old files stay
    on disk — prior versions still read them). Returns the committed
    version number; retries the version claim on a commit race."""
    token = uuid.uuid4().hex[:12]
    os.makedirs(_log_dir(table_dir), exist_ok=True)
    staged = os.path.join(table_dir, _DATA, f"staged-{token}")
    df.write.mode("overwrite").parquet(staged)
    n_rows = spark.read.parquet(staged).count()
    schema = sorted(
        (f.name, f.dataType.simpleString()) for f in df.schema.fields
    )

    while True:
        head = latest_version(table_dir)
        version = 0 if head is None else head + 1
        dirs = [staged]
        if mode == "append" and head is not None:
            prev = _read_manifest(table_dir, head)
            # an append with a drifted schema would poison every later
            # multi-directory read — refuse it at commit time (an
            # intentional schema change commits as overwrite)
            prev_schema = [tuple(c) for c in prev.get("schema", schema)]
            if prev_schema != schema:
                raise ValueError(
                    f"append schema {schema} != table schema"
                    f" {prev_schema}; commit schema changes with"
                    " mode='overwrite'"
                )
            dirs = prev["data_dirs"] + dirs
        manifest = {
            "version": version,
            "op": op,
            "mode": mode,
            "schema": schema,
            "data_dirs": dirs,
            "n_rows_written": n_rows,
        }
        try:
            fd = os.open(
                _manifest_path(table_dir, version),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            continue  # lost the race: re-read head, retry
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1)
        return version


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """The table at ``version`` (default: latest) — snapshot-isolated:
    the manifest's file listing is immutable, so this result never
    changes as later versions commit."""
    if version is None:
        version = latest_version(table_dir)
    if version is None:
        raise FileNotFoundError(f"no committed versions in {table_dir}")
    dirs = _read_manifest(table_dir, version)["data_dirs"]
    return spark.read.parquet(*dirs)


def history(table_dir: str) -> list[dict]:
    """All committed manifests, oldest first."""
    head = latest_version(table_dir)
    if head is None:
        return []
    return [_read_manifest(table_dir, v) for v in range(head + 1)]


def merge_upsert(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key: str,
) -> int:
    """Row-level MERGE: rows of the current version whose ``key``
    matches an update are replaced; unmatched updates are inserted;
    everything else carries over — DynamoDB put_item semantics
    (``write-metrics/lambda_function.py:104``) on parquet. Commits
    the reconciled content as a new overwrite version (prior
    versions remain time-travelable).

    The reconcile is one left-anti join (current minus matched keys)
    plus a unionByName — both distribute; nothing is collected."""
    head = latest_version(table_dir)
    if head is None:
        return commit_version(
            spark, table_dir, updates, mode="overwrite", op="merge"
        )
    current = read_version(spark, table_dir, head)
    keys = updates.select(key).distinct()
    kept = current.join(keys, key, "left_anti")
    merged = kept.unionByName(updates)
    return commit_version(
        spark, table_dir, merged, mode="overwrite", op="merge"
    )


def vacuum(table_dir: str, keep_versions: int = 1) -> list[str]:
    """List (NOT delete) data directories unreferenced by the newest
    ``keep_versions`` manifests — the GC candidate set. Deletion is
    left to the caller so a reader pinned to an old version cannot be
    yanked mid-query by this library."""
    head = latest_version(table_dir)
    if head is None:
        return []
    keep = set()
    for v in range(max(0, head - keep_versions + 1), head + 1):
        keep.update(_read_manifest(table_dir, v)["data_dirs"])
    data_root = os.path.join(table_dir, _DATA)
    if not os.path.isdir(data_root):
        return []
    all_dirs = {
        os.path.join(data_root, d) for d in os.listdir(data_root)
    }
    return sorted(
        d for d in all_dirs if d not in keep and os.path.isdir(d)
    )


def compact(
    spark: SparkSession, table_dir: str, n_files: int = 1
) -> int:
    """Rewrite the current content into ``n_files`` files and commit
    it as a new version — logical content unchanged (pytest-proven),
    small-file pressure gone; old versions still read the old files."""
    current = read_version(spark, table_dir)
    return commit_version(
        spark,
        table_dir,
        current.coalesce(n_files),
        mode="overwrite",
        op="compact",
    )


def changes_between(
    spark: SparkSession,
    table_dir: str,
    key: str,
    v_from: int,
    v_to: int | None = None,
) -> DataFrame:
    """Change-data-feed between two versions: one row per key whose
    content differs, tagged ``insert`` / ``delete`` / ``update``.
    Downstream consumers (a search index, an aggregate cache, a
    replica) apply the delta instead of re-reading the table — at
    100 TB the feed is proportional to what CHANGED, not to what
    exists.

    The diff is one full-outer join on the key; row content is
    compared via a canonical JSON fingerprint of the non-key columns
    (column order pinned by name sort, so the fingerprint is a pure
    function of the row). Emits the NEW row's columns for
    insert/update and the OLD row's for delete."""
    a = read_version(spark, table_dir, v_from)
    b = read_version(spark, table_dir, v_to)
    val_cols = sorted(c for c in b.columns if c != key)

    def fp(df: DataFrame) -> DataFrame:
        return df.select(
            key,
            F.md5(
                F.to_json(F.struct(*[F.col(c) for c in val_cols]))
            ).alias("_fp"),
            F.struct(*[F.col(c) for c in val_cols]).alias("_row"),
        )

    j = fp(a).alias("a").join(
        fp(b).alias("b"), F.col(f"a.{key}") == F.col(f"b.{key}"), "full"
    )
    change = (
        F.when(F.col(f"a.{key}").isNull(), F.lit("insert"))
        .when(F.col(f"b.{key}").isNull(), F.lit("delete"))
        .when(F.col("a._fp") != F.col("b._fp"), F.lit("update"))
    )
    picked = F.when(
        F.col(f"b.{key}").isNotNull(), F.col("b._row")
    ).otherwise(F.col("a._row"))
    out = (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            F.coalesce(F.col(f"a.{key}"), F.col(f"b.{key}")).alias(key),
            "change_type",
            picked.alias("_row"),
        )
    )
    return out.select(
        key, "change_type", *[F.col(f"_row.{c}").alias(c) for c in val_cols]
    )


def committed_batch_ids(table_dir: str) -> set:
    """Stream batch ids already committed to this table (recorded in
    the manifests by :func:`commit_stream_batch`)."""
    return {
        m["batch_id"]
        for m in history(table_dir)
        if m.get("batch_id") is not None
    }


def commit_stream_batch(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    batch_id: int,
    mode: str = "append",
) -> int | None:
    """Exactly-once streaming sink: commit a foreachBatch micro-batch
    as a table version stamped with its ``batch_id``, skipping any
    batch id the log already holds. Structured Streaming replays a
    batch after a failure between the sink write and the checkpoint
    advance — with a plain parquet sink that duplicates rows; here
    the replay finds its batch id in the log and becomes a no-op, so
    checkpoint-replay delivery + idempotent commit = exactly-once.
    Returns the committed version, or None for a skipped replay.

    Scope: the guarantee is per checkpoint lineage — batch N's content
    is deterministic given a checkpoint, which is what makes skipping
    a seen id safe. Restarting from a FRESH checkpoint renumbers
    batches from 0; that replay stays exactly-once only if the source
    re-delivers the same batch boundaries (true for a static file
    source with a fixed maxFilesPerTrigger, exercised by the
    end-to-end test; not true in general for live sources — those
    resume from the original checkpoint, the normal operating mode)."""
    if batch_id in committed_batch_ids(table_dir):
        return None
    token = uuid.uuid4().hex[:12]
    os.makedirs(_log_dir(table_dir), exist_ok=True)
    staged = os.path.join(table_dir, _DATA, f"staged-{token}")
    df.write.mode("overwrite").parquet(staged)
    n_rows = spark.read.parquet(staged).count()
    while True:
        head = latest_version(table_dir)
        # the race loser re-checks the batch ledger too: the winner
        # may have been a replay of the SAME batch from another driver
        if batch_id in committed_batch_ids(table_dir):
            return None
        version = 0 if head is None else head + 1
        dirs = [staged]
        if mode == "append" and head is not None:
            dirs = _read_manifest(table_dir, head)["data_dirs"] + dirs
        manifest = {
            "version": version,
            "op": "stream_batch",
            "mode": mode,
            "batch_id": batch_id,
            "data_dirs": dirs,
            "n_rows_written": n_rows,
        }
        try:
            fd = os.open(
                _manifest_path(table_dir, version),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            continue
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1)
        return version


def restore(
    spark: SparkSession, table_dir: str, version: int
) -> int:
    """Roll the table back by committing ``version``'s exact file
    listing as the new head — O(1) (no data is copied or rewritten),
    non-destructive (the rolled-back versions stay in the log and
    remain time-travelable), and auditable (the manifest records
    which version it restored)."""
    src = _read_manifest(table_dir, version)
    while True:
        head = latest_version(table_dir)
        new_version = 0 if head is None else head + 1
        manifest = {
            "version": new_version,
            "op": f"restore_v{version}",
            "mode": "overwrite",
            "schema": src.get("schema"),
            "data_dirs": src["data_dirs"],
            "n_rows_written": 0,
        }
        try:
            fd = os.open(
                _manifest_path(table_dir, new_version),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            continue
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1)
        return new_version

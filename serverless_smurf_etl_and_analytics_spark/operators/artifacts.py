"""Shared machinery for on-disk corpus artifacts — the across-session
materializations of a pipeline's most expensive pure stages (LSH band
bits, winnow fingerprint tables). Artifacts are parquet directories
whose DIRNAME carries the cache key (a corpus content fingerprint plus
the stage config), so lookups are exact-match and a changed corpus
simply misses: no invalidation protocol, no way to silently reuse
stale rows. Writes are atomic (tmp dir + os.rename) so a concurrent
or crashed builder can never expose a partial artifact.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame


def cache_root(root: str | None = None) -> str:
    """Resolve the artifact cache root: explicit arg, else the
    ``SMURF_ARTIFACT_CACHE`` env var, else a stable tempdir path that
    survives across sessions on one machine."""
    return (
        root
        or os.environ.get("SMURF_ARTIFACT_CACHE")
        or os.path.join(tempfile.gettempdir(), "smurf_artifact_cache")
    )


def vacuum_cache(
    root: str | None = None,
    max_age_days: float = 14.0,
    max_total_bytes: int | None = None,
) -> list[str]:
    """Garbage-collect the artifact cache: remove entries whose LAST
    USE (dir mtime — refreshed by :func:`touch` on every cache hit) is
    older than ``max_age_days``, then — oldest-first — entries beyond
    ``max_total_bytes``. Stale ``.tmp-*`` build leftovers (a crashed
    builder) older than one hour go unconditionally. Returns the
    removed paths. Safe against concurrent readers the same way
    atomic builds are: an entry is removed wholesale, and a racing
    find-or-build that just lost its entry rebuilds identical content
    under the same key (deterministic stages)."""
    import shutil
    import time

    root = cache_root(root)
    if not os.path.isdir(root):
        return []
    now = time.time()
    removed: list[str] = []
    entries = []
    for name in os.listdir(root):
        p = os.path.join(root, name)
        try:
            mtime = os.path.getmtime(p)
            if ".tmp-" in name:
                if now - mtime > 3600:
                    shutil.rmtree(p, ignore_errors=True)
                    removed.append(p)
                continue
            if now - mtime > max_age_days * 86400:
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
                continue
            size = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(p)
                for f in fs
            )
            entries.append((mtime, size, p))
        except OSError:
            continue
    if max_total_bytes is not None:
        total = sum(s for _, s, _ in entries)
        for _, size, p in sorted(entries):  # oldest first
            if total <= max_total_bytes:
                break
            shutil.rmtree(p, ignore_errors=True)
            removed.append(p)
            total -= size
    return removed


def touch(path: str) -> None:
    """Refresh an artifact dir's mtime — called on cache hits so
    :func:`vacuum_cache`'s age policy tracks last USE, not build
    time."""
    try:
        os.utime(path, None)
    except OSError:
        pass


def atomic_write_parquet(df: DataFrame, path: str) -> str:
    """Write ``df`` as a parquet dir at ``path`` atomically; a
    pre-existing artifact wins (first build or a lost race — both
    valid, the key guarantees equal content) and gets its mtime
    refreshed so the vacuum age policy tracks last use."""
    if os.path.exists(path):
        touch(path)
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    try:
        os.rename(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return path

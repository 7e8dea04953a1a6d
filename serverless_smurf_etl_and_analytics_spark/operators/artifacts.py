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


def atomic_write_parquet(df: DataFrame, path: str) -> str:
    """Write ``df`` as a parquet dir at ``path`` atomically; a
    pre-existing artifact wins (first build or a lost race — both
    valid, the key guarantees equal content)."""
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    try:
        os.rename(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return path

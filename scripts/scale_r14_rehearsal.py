"""Round-14 scale rehearsals — thin driver over the r13 stages with
results merged into ``benchmarks/scale_r14_summary.json``.

Stages (same semantics as scale_r13_rehearsal, see its docstrings):

- ``gen_emb10m`` : regenerate the 10M-vector mod-257 amplifier corpus
  under ``.scratch/emb10m`` (the round boundary clears ``.scratch``).
- ``emb10m``     : the sharded near-dup END TO END at 10M vectors —
  VERDICT r13 item 1, attempt 6. Knob changes vs attempt 5, from its
  postmortem (scale_r13_summary.json ``emb10m_attempt_log``):
  driver heap DOWN to 64g (the 80g heap + per-task fresh workers left
  no fork headroom at the verify straggler), gather-verify concurrency
  capped via SMURF_GATHER_MMAP_TASKS=4 (default 8), speculation OFF
  (single local executor — the knob re-launches nothing and its
  duplicate task state costs memory), worker.reuse stays false,
  faulthandler stays on.
- ``txn30``      : sf30 two-shard maintained-corpus ingest (VERDICT
  r14 item 9) — per-family advance timings, per-shard flatness.
- ``gen_sf30``   : regenerate the sf30 source dataset for txn30.

Launch (detached, one stage at a time — emb10m wants the box alone):

  SMURF_DRIVER_MEM=64g SMURF_GATHER_MMAP_TASKS=4 \
  SMURF_NEARDUP_SPILL_BUDGET=24000000000 \
  SMURF_EXTRA_CONF='spark.python.worker.reuse=false;spark.python.worker.faulthandler.enabled=true' \
  python scripts/scale_r14_rehearsal.py emb10m
"""

from __future__ import annotations

import os
import sys

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_SCRIPTS)
sys.path.insert(0, _REPO)
sys.path.insert(0, _SCRIPTS)

import scale_r13_rehearsal as r13  # noqa: E402

# redirect the shared _merge sink to the r14 summary
r13.SUMMARY = os.path.join(_REPO, "benchmarks", "scale_r14_summary.json")
_orig_merge = r13._merge


def _merge14(key: str, value) -> None:
    _orig_merge(key, value)
    import json

    with open(r13.SUMMARY) as f:
        data = json.load(f)
    data["round"] = 14
    with open(r13.SUMMARY, "w") as f:
        json.dump(data, f, indent=1)


r13._merge = _merge14


def _spark_with_retries():
    """Local-mode task retries for the long rehearsals (attempt-8 fix):
    spark.task.maxFailures is IGNORED by the LocalSchedulerBackend —
    the retry count must ride the MASTER URL (``local[N, maxFailures]``).
    The verify tasks are idempotent (Spark commit protocol), so a
    silently-killed straggler worker re-runs instead of aborting a
    90-minute job."""
    from serverless_smurf_etl_and_analytics_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    s = get_spark(
        master=f"local[{cpus}, 4]",
        shuffle_partitions=int(cpus),
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


r13._spark = _spark_with_retries

STAGES = {
    "gen_emb10m": r13.stage_gen_emb10m,
    "emb10m": r13.stage_emb10m,
    "gen_sf30": r13.stage_gen_sf30,
    "txn30": r13.stage_txn30,
}

if __name__ == "__main__":
    for name in sys.argv[1:]:
        STAGES[name]()

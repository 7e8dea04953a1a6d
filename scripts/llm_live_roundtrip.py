"""VERDICT r12 task 8: exercise the real LLM adapter against a LIVE
HTTP endpoint once — the fake-transport pytests prove the seam
(``tests/test_llm_adapter.py``); this run proves the stdlib-urllib
transport end to end: a real socket, a real OpenAI-shaped
``/chat/completions`` exchange, the fence strip, the row-aligned
parse, and error propagation on a 500.

The "model" is a local stdlib ``http.server`` process speaking the
OpenAI chat-completions contract (the container has no network and no
real model); what's under test is OUR side of the wire — the exact
bytes urllib sends, the exact parse of what comes back. The oracle
path is untouched: SMURF_LLM_BASE_URL is set only inside this script.

``python scripts/llm_live_roundtrip.py`` -> merges a transcript record
into ``benchmarks/llm_live_roundtrip_r13.json``.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_SCRIPTS)
sys.path.insert(0, _REPO)

OUT = os.path.join(_REPO, "benchmarks", "llm_live_roundtrip_r13.json")

_LOG: list[dict] = []
_FAIL_NEXT = {"flag": False}


class _Handler(BaseHTTPRequestHandler):
    """OpenAI-compatible /chat/completions stub: labels every row in
    the prompt's ROWS block by the documented deviation thresholds,
    and wraps the reply in a ```json fence so the strip path is
    exercised. One request can be forced to 500 via _FAIL_NEXT."""

    def do_POST(self):  # noqa: N802 (http.server contract)
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"]))
        )
        prompt = body["messages"][0]["content"]
        if _FAIL_NEXT["flag"]:
            _FAIL_NEXT["flag"] = False
            _LOG.append({"path": self.path, "forced_status": 500})
            self.send_response(500)
            self.end_headers()
            self.wfile.write(b"upstream exploded")
            return
        # the ROWS json block sits between the first "[" and the
        # "Classify EVERY row" marker
        rows = json.loads(
            prompt[prompt.index("[") : prompt.index("\n\nClassify")]
        )
        labels = []
        for r in rows:
            d = r.get("deviation_pct")
            if d is None:
                lab = "peer_outlier"
            elif d <= -50:
                lab = "historical_low"
            elif d >= 50:
                lab = "historical_high"
            elif d <= -25:
                lab = "sudden_drop"
            elif d >= 25:
                lab = "sudden_spike"
            else:
                lab = "peer_outlier"
            labels.append(
                {
                    "store_id": r["store_id"],
                    "sale_date": r["sale_date"],
                    "label": lab,
                }
            )
        content = (
            "Here is the analysis you asked for:\n```json\n"
            + json.dumps({"labels": labels})
            + "\n```\nLet me know if you need anything else."
        )
        reply = {
            "id": "chatcmpl-local",
            "object": "chat.completion",
            "model": body.get("model", ""),
            "choices": [
                {
                    "index": 0,
                    "message": {"role": "assistant", "content": content},
                    "finish_reason": "stop",
                }
            ],
        }
        _LOG.append(
            {
                "path": self.path,
                "auth_header": self.headers.get("Authorization"),
                "request_model": body.get("model"),
                "request_temperature": body.get("temperature"),
                "request_max_tokens": body.get("max_tokens"),
                "prompt_rows": len(rows),
                "prompt_head": prompt[:160],
                "reply_head": content[:120],
                "status": 200,
            }
        )
        out = json.dumps(reply).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # silence stderr
        pass


def main() -> None:
    from serverless_smurf_etl_and_analytics_spark.operators import (
        insights,
        llm_adapter,
    )
    from serverless_smurf_etl_and_analytics_spark import tables
    from serverless_smurf_etl_and_analytics_spark.session import get_spark

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_port}/v1"
    os.environ["SMURF_LLM_BASE_URL"] = base
    os.environ["SMURF_LLM_MODEL"] = "local-stub-model"
    os.environ["SMURF_LLM_API_KEY"] = "test-key-123"

    spark = get_spark("llm-live")
    spark.sparkContext.setLogLevel("ERROR")
    txns = tables.transactions(spark, "/root/testdata/sf0.001")

    # 1) happy path through the ENV GATE (the deployment path):
    # llm_classify with no explicit classify_fn consults
    # SMURF_LLM_BASE_URL and builds the urllib transport itself
    t0 = time.monotonic()
    live = insights.llm_classify(txns).toPandas()
    live_wall = round(time.monotonic() - t0, 2)
    # 2) the offline deterministic default labels the same rows —
    # the stub speaks the same thresholds, so the LIVE labels must
    # match the offline ones exactly (proves row-aligned parsing,
    # not just transport plumbing). Pop the env var so this call
    # takes the offline path.
    os.environ.pop("SMURF_LLM_BASE_URL")
    offline = insights.llm_classify(txns).toPandas()
    key = ["store_id", "sale_date"]
    merged = live.merge(
        offline, on=key, suffixes=("_live", "_offline")
    )
    match = bool(
        (merged["label_live"] == merged["label_offline"]).all()
    )

    # 3) error propagation: a 500 from the endpoint must surface as
    # an exception from the transport (the caller owns retries)
    os.environ["SMURF_LLM_BASE_URL"] = base
    _FAIL_NEXT["flag"] = True
    transport = llm_adapter.openai_chat_transport(
        base, model="local-stub-model", api_key="test-key-123"
    )
    try:
        transport("boom probe")
        err_propagated = False
        err_text = "no error raised"
    except Exception as e:  # noqa: BLE001 — recording, not handling
        err_propagated = True
        err_text = f"{type(e).__name__}: {e}"
    os.environ.pop("SMURF_LLM_BASE_URL", None)

    record = {
        "round": 13,
        "what": (
            "one recorded live round-trip of the r12 LLM adapter "
            "against an OpenAI-compatible HTTP endpoint (local stdlib "
            "http.server stub): urllib transport, auth header, fence "
            "strip, row-aligned parse, and 500-propagation — oracle "
            "path untouched (env set only inside this script)"
        ),
        "endpoint": base + "/chat/completions",
        "rows_classified": int(len(live)),
        "live_wall_sec": live_wall,
        "live_equals_offline_default": match,
        "label_counts": {
            k: int(v)
            for k, v in live["label"].value_counts().items()
        },
        "http_500_propagates": err_propagated,
        "http_500_error": err_text,
        "server_transcript": _LOG,
    }
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: v for k, v in record.items()
                      if k != "server_transcript"}, indent=1))
    srv.shutdown()


if __name__ == "__main__":
    main()

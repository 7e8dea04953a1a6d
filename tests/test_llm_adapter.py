"""The real-model adapter behind the pluggable LLM classifier seam
(VERDICT r11 task 6): prompt-format -> transport -> fence-strip ->
parse -> classifier-merge, exercised with a FAKE transport (no
network; the reference behavior being mirrored is
detect-anomalies/lambda_function.py:139-301)."""

from __future__ import annotations

import json

import pytest

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import (
    insights,
    llm_adapter,
)

SF_DIR = "/root/testdata/sf0.001"


def test_prompt_contains_rows_taxonomy_and_contract():
    rows = [
        {
            "store_id": "0001",
            "sale_date": "2024-01-02",
            "today_sales": 12.5,
            "deviation_pct": -61.0,
        }
    ]
    p = llm_adapter.build_prompt(rows)
    assert '"store_id": "0001"' in p and '"deviation_pct": -61.0' in p
    assert "|".join(llm_adapter.LABELS).replace("|peer_outlier", "") in p
    assert "Return ONLY the JSON object" in p
    assert '"labels"' in p  # the reply contract


def test_fence_extraction_tiers():
    inner = '{"labels": []}'
    assert llm_adapter.extract_json_payload(
        f"Here you go:\n```json\n{inner}\n```\nthanks"
    ) == inner
    assert llm_adapter.extract_json_payload(
        f"```\n{inner}\n```"
    ) == inner
    assert llm_adapter.extract_json_payload(f"  {inner}  ") == inner


def test_parse_labels_alignment_and_degradation():
    keys = [("0001", "d1"), ("0002", "d1"), ("0003", "d1")]
    reply = json.dumps(
        {
            "labels": [
                # out of order: mapped by key, not position
                {"store_id": "0002", "sale_date": "d1", "label": "sudden_spike"},
                {"store_id": "0001", "sale_date": "d1", "label": "historical_low"},
                # off-taxonomy: degraded, not propagated
                {"store_id": "0003", "sale_date": "d1", "label": "weird"},
            ]
        }
    )
    assert llm_adapter.parse_labels(reply, keys) == [
        "historical_low",
        "sudden_spike",
        "peer_outlier",
    ]
    # malformed reply: every row degrades instead of failing the stage
    assert llm_adapter.parse_labels("not json at all", keys) == [
        "peer_outlier"
    ] * 3


def test_classify_fn_end_to_end_with_fake_transport(spark):
    """The full seam: llm_classify batches the deviation table
    through the adapter; the fake transport asserts the prompt shape
    and labels rows by a deterministic rule keyed off the prompt's
    own row payload — so row/label alignment through Arrow batching,
    prompt formatting, and the parse is what's proven."""
    txns = tables.transactions(spark, SF_DIR)

    def fake_transport(prompt):
        assert "Return ONLY the JSON object" in prompt
        payload = prompt[prompt.index("[") : prompt.index("\n\nClassify")]
        rows = json.loads(payload)
        labels = [
            {
                "store_id": r["store_id"],
                "sale_date": r["sale_date"],
                "label": "historical_high"
                if (r["deviation_pct"] or 0) > 0
                else "historical_low",
            }
            for r in rows
        ]
        return "```json\n" + json.dumps({"labels": labels}) + "\n```"

    fn = llm_adapter.make_classify_fn(fake_transport)
    out = insights.llm_classify(txns, classify_fn=fn).collect()
    assert len(out) > 0
    for r in out:
        want = (
            "historical_high"
            if (r["deviation_pct"] or 0) > 0
            else "historical_low"
        )
        assert r["label"] == want


def test_env_gate_offline_default(monkeypatch):
    monkeypatch.delenv("SMURF_LLM_BASE_URL", raising=False)
    assert llm_adapter.classify_fn_from_env() is None
    monkeypatch.setenv("SMURF_LLM_BASE_URL", "http://localhost:9")
    fn = llm_adapter.classify_fn_from_env()
    assert callable(fn)  # constructed, never called: no network here


def test_openai_transport_request_shape(monkeypatch):
    """The urllib transport posts an OpenAI-compatible body and reads
    choices[0].message.content — verified against a fake urlopen."""
    import io
    import urllib.request

    captured = {}

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout):
        captured["url"] = req.full_url
        captured["body"] = json.loads(req.data.decode())
        captured["auth"] = req.headers.get("Authorization")
        return FakeResp(
            json.dumps(
                {"choices": [{"message": {"content": "REPLY"}}]}
            ).encode()
        )

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    t = llm_adapter.openai_chat_transport(
        "http://model.example/v1/", model="m-1", api_key="k"
    )
    assert t("hello") == "REPLY"
    assert captured["url"] == "http://model.example/v1/chat/completions"
    assert captured["body"]["model"] == "m-1"
    assert captured["body"]["messages"] == [
        {"role": "user", "content": "hello"}
    ]
    assert captured["body"]["temperature"] == 0.3
    assert captured["body"]["max_tokens"] == 2048
    assert captured["auth"] == "Bearer k"


def test_parse_reply_column_declarative(spark):
    """The JVM-side fence strip + from_json + inline explode: one row
    per anomaly, zero rows for unparseable replies."""
    good = json.dumps(
        {
            "anomalies": [
                {
                    "type": "historical_low",
                    "severity": "critical",
                    "store_id": "0001",
                    "title": "t",
                    "description": "d",
                    "metric_value": 10.0,
                    "historical_average": 100.0,
                    "deviation_percent": -90.0,
                },
                {
                    "type": "sudden_spike",
                    "severity": "warning",
                    "store_id": "0002",
                    "title": "t2",
                    "description": "d2",
                    "metric_value": 5.0,
                    "historical_average": 2.0,
                    "deviation_percent": 150.0,
                },
            ]
        }
    )
    df = spark.createDataFrame(
        [
            (1, f"Sure! Here it is:\n```json\n{good}\n```"),
            (2, good),  # bare JSON, no fence
            (3, "I could not comply."),  # unparseable -> zero rows
        ],
        "req_id int, reply string",
    )
    out = llm_adapter.parse_reply_column(df).collect()
    assert len(out) == 4  # 2 anomalies x 2 parseable replies
    by_req = {}
    for r in out:
        by_req.setdefault(r["req_id"], []).append(r)
    assert sorted(by_req) == [1, 2]
    assert {r["type"] for r in by_req[1]} == {
        "historical_low",
        "sudden_spike",
    }
    crit = [r for r in by_req[1] if r["severity"] == "critical"][0]
    assert crit["store_id"] == "0001"
    assert crit["deviation_percent"] == pytest.approx(-90.0)


def test_llm_classify_consults_env_gate(spark, monkeypatch):
    """With no explicit classify_fn, llm_classify consults the env
    gate before falling back to the offline fake."""
    marker_calls = []

    def marker_gate():
        def fn(pdf):
            marker_calls.append(len(pdf))
            return ["sudden_spike"] * len(pdf)

        return fn

    monkeypatch.setattr(
        llm_adapter, "classify_fn_from_env", marker_gate
    )
    txns = tables.transactions(spark, SF_DIR)
    out = insights.llm_classify(txns).collect()
    assert len(out) > 0
    assert all(r["label"] == "sudden_spike" for r in out)

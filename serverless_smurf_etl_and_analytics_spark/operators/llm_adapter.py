"""Real-model adapter for the pluggable LLM classifier seam.

The reference's insight stage calls Bedrock with a prompt built from
PRE-COMPUTED statistics, then extracts a JSON object that models
sometimes wrap in markdown fences
(``detect-anomalies/lambda_function.py:139-301``: ``invoke_bedrock``
at :139-161 with temperature 0.3 / maxTokens 2048,
``build_anomaly_prompt`` at :197-267 with the taxonomy
``historical_low|historical_high|sudden_drop|sudden_spike|
peer_outlier`` and the info/warning/critical severity guide,
``parse_bedrock_response`` at :279-301 with the ```` ```json ````
fence strip). This module re-expresses that stage for the Spark
engine:

- :func:`make_classify_fn` returns a ``classify_fn`` for
  :func:`insights.llm_classify` — per Arrow batch it formats ONE
  prompt from the batch's rows, calls a pluggable ``transport``
  (prompt -> reply text), fence-strips and parses the JSON reply,
  and maps labels back to rows (unlabeled / off-taxonomy rows
  degrade to ``peer_outlier``, mirroring the reference's
  empty-on-parse-failure behavior rather than failing the query).
- :func:`openai_chat_transport` is the stdlib-urllib HTTP transport
  for any OpenAI-compatible ``/chat/completions`` endpoint (the
  container has no httpx; urllib keeps the engine zero-dependency).
- :func:`classify_fn_from_env` is the config gate: returns a live
  classify_fn only when ``SMURF_LLM_BASE_URL`` (+ optional
  ``SMURF_LLM_MODEL``/``SMURF_LLM_API_KEY``) is set, else None — so
  ``llm_classify``'s offline deterministic default is unchanged and
  nothing in the oracle path ever depends on a network.
- :func:`parse_reply_column` is the DECLARATIVE form of the fence
  strip + JSON parse for replies already landed in a DataFrame
  column (regexp_extract + from_json + inline explode — JVM-side,
  no Python UDF), for pipelines that persist raw model replies and
  parse them later.

Everything numeric happens before the model, as in the reference:
the model only labels. Model-backed classification stays OUT of the
oracle path by design (SURVEY §2.10, §5)."""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the reference taxonomy (detect-anomalies/lambda_function.py:256)
LABELS = (
    "historical_low",
    "historical_high",
    "sudden_drop",
    "sudden_spike",
    "peer_outlier",
)

_FALLBACK = "peer_outlier"

#: reply-object schema for the declarative parse — the reference's
#: response contract (:249-259), minus free-text fields we keep
#: nullable
ANOMALY_SCHEMA = (
    "struct<anomalies: array<struct<"
    "type: string, severity: string, store_id: string, "
    "title: string, description: string, metric_value: double, "
    "historical_average: double, deviation_percent: double>>>"
)


def build_prompt(rows: list[dict]) -> str:
    """One prompt per Arrow batch, shaped like the reference's
    (:229-267): the rows' pre-computed stats as a JSON block, the
    taxonomy, the severity guide, and the return-ONLY-JSON
    instruction. The reply contract is a labels array keyed by
    (store_id, sale_date) so the adapter can join labels back to
    rows without trusting reply order."""
    return (
        "Analyze the following per-store daily sales statistics and "
        "classify each row against its trailing history.\n\n"
        "ROWS (pre-computed; deviation_pct is today vs the trailing "
        "average, null means no history):\n"
        + json.dumps(rows, indent=2, default=str)
        + "\n\nClassify EVERY row with exactly one label:\n"
        "historical_low|historical_high|sudden_drop|sudden_spike|"
        "peer_outlier\n\n"
        "Severity intuition (for choosing between the labels):\n"
        "- >50% deviation from history: historical_low/historical_high\n"
        "- 25-50% deviation: sudden_drop/sudden_spike\n"
        "- otherwise (or no history): peer_outlier\n\n"
        "Return your analysis as a JSON object with this exact "
        "structure:\n"
        '{"labels": [{"store_id": "0001", "sale_date": "2024-01-01", '
        '"label": "sudden_drop"}]}\n'
        "Return ONLY the JSON object, no other text."
    )


def extract_json_payload(text: str) -> str:
    """The reference's fence strip (:282-292): prefer a ```json
    fence, then any ``` fence, else the raw text."""
    if "```json" in text:
        start = text.find("```json") + 7
        return text[start : text.find("```", start)].strip()
    if "```" in text:
        start = text.find("```") + 3
        return text[start : text.find("```", start)].strip()
    return text.strip()


def parse_labels(reply: str, keys: list[tuple]) -> list[str]:
    """Reply text -> one label per input key (in input order).
    Mirrors the reference's forgiving parse (:279-301): a malformed
    reply, a missing row, or an off-taxonomy label degrades to the
    fallback label for the affected rows instead of failing the
    stage."""
    by_key = {}
    try:
        obj = json.loads(extract_json_payload(reply))
        for item in obj.get("labels", []):
            if not isinstance(item, dict):
                continue
            label = item.get("label")
            if label in LABELS:
                by_key[
                    (str(item.get("store_id")), str(item.get("sale_date")))
                ] = label
    except (json.JSONDecodeError, AttributeError, TypeError):
        pass
    return [by_key.get(k, _FALLBACK) for k in keys]


def openai_chat_transport(
    base_url: str,
    model: str = "",
    api_key: str = "",
    timeout: float = 60.0,
    temperature: float = 0.3,
    max_tokens: int = 2048,
):
    """``transport(prompt) -> reply_text`` against any
    OpenAI-compatible ``/chat/completions`` endpoint, via stdlib
    urllib (the engine stays zero-dependency; swap in an httpx/SDK
    transport with the same one-argument shape if available).
    Inference config mirrors the reference's Bedrock call (:148-152:
    temperature 0.3, maxTokens 2048). Errors propagate — retry/
    backoff policy belongs to the caller's orchestration layer, as
    it does in the reference (Step Functions)."""

    def transport(prompt: str) -> str:
        import urllib.request

        req = urllib.request.Request(
            base_url.rstrip("/") + "/chat/completions",
            data=json.dumps(
                {
                    "model": model,
                    "messages": [{"role": "user", "content": prompt}],
                    "temperature": temperature,
                    "max_tokens": max_tokens,
                }
            ).encode(),
            headers={
                "Content-Type": "application/json",
                **(
                    {"Authorization": f"Bearer {api_key}"}
                    if api_key
                    else {}
                ),
            },
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = json.loads(resp.read().decode())
        return body["choices"][0]["message"]["content"]

    return transport


def make_classify_fn(transport):
    """Wrap a ``transport`` into ``llm_classify``'s
    ``classify_fn(pdf) -> iterable of labels`` contract: one prompt
    per Arrow batch (prompt-format -> transport -> fence-strip ->
    parse -> row-aligned labels)."""

    def classify_fn(pdf):
        rows = [
            {
                "store_id": str(r.store_id),
                "sale_date": str(r.sale_date),
                "today_sales": None
                if r.today_sales is None
                else float(r.today_sales),
                "deviation_pct": None
                if r.deviation_pct is None
                else float(r.deviation_pct),
            }
            for r in pdf.itertuples(index=False)
        ]
        keys = [(r["store_id"], r["sale_date"]) for r in rows]
        return parse_labels(transport(build_prompt(rows)), keys)

    return classify_fn


def classify_fn_from_env():
    """The config gate: a live classify_fn when SMURF_LLM_BASE_URL is
    set (model/key from SMURF_LLM_MODEL / SMURF_LLM_API_KEY), else
    None — callers fall through to ``llm_classify``'s deterministic
    offline default."""
    import os

    base = os.environ.get("SMURF_LLM_BASE_URL")
    if not base:
        return None
    return make_classify_fn(
        openai_chat_transport(
            base,
            model=os.environ.get("SMURF_LLM_MODEL", ""),
            api_key=os.environ.get("SMURF_LLM_API_KEY", ""),
        )
    )


def _fence_stripped(col: Column) -> Column:
    """JVM-side fence strip: the ```json fence, then any ``` fence,
    else the raw text — regexp_extract returns '' on no-match, so
    the tiers chain with nullif/coalesce."""
    json_fence = F.nullif(
        F.regexp_extract(col, r"(?s)```json\s*(.*?)```", 1), F.lit("")
    )
    any_fence = F.nullif(
        F.regexp_extract(col, r"(?s)```\s*(.*?)```", 1), F.lit("")
    )
    return F.trim(F.coalesce(json_fence, any_fence, col))


def parse_reply_column(
    replies: DataFrame, text_col: str = "reply"
) -> DataFrame:
    """Declarative form of ``parse_bedrock_response`` (:279-301) for
    replies persisted as a DataFrame column: regexp_extract strips
    the markdown fence, from_json parses the anomalies object, and
    inline explode yields one row per anomaly — all JVM-side
    (whole-stage codegen; no Python in the loop). Unparseable
    replies yield zero rows, matching the reference's
    empty-list-on-failure."""
    parsed = replies.withColumn(
        "_obj", F.from_json(_fence_stripped(F.col(text_col)), ANOMALY_SCHEMA)
    )
    return parsed.select(
        *[c for c in replies.columns if c != text_col],
        F.inline(
            F.coalesce(
                F.col("_obj.anomalies"),
                F.array().cast(
                    ANOMALY_SCHEMA.replace("struct<anomalies: ", "", 1)[:-1]
                ),
            )
        ),
    )

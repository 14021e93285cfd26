"""LLM-judge rule plumbing — mirrors reference test_llm_rules.py:
JSON-failure fallback overall=3 (pass), min_score gating; mock
provider exercises the mapInPandas batch path offline."""

from pyspark.sql import Row

from datacheck_spark.llm_rules import (
    _parse_judge_json,
    llm_scores,
    with_llm_quality,
)


def test_json_failure_fallback_passes():
    scores = _parse_judge_json("not json at all")
    assert scores["overall"] == 3.0  # llm_rules.py:73-79 fallback
    scores2 = _parse_judge_json('{"overall": 5, "clarity": 4}')
    assert scores2["overall"] == 5.0
    assert scores2["relevance"] == 3.0  # missing dims default 3


def test_llm_scores_batch(spark):
    df = spark.createDataFrame(
        [
            Row(id="good", instruction="Explain Spark shuffles in detail",
                response="Spark shuffles move data between stages; Spark "
                         "partitions rows by key and writes sorted files."),
            Row(id="bad", instruction="Hi", response="ok"),
        ]
    )
    scores = {r["__row_id"]: r for r in llm_scores(df, "id").collect()}
    assert scores["good"]["overall"] >= scores["bad"]["overall"]
    assert 1.0 <= scores["bad"]["overall"] <= 5.0


def test_with_llm_quality_gating(spark):
    df = spark.createDataFrame(
        [
            Row(id="good", instruction="Explain Spark shuffles in detail",
                response="Spark shuffles move data between stages and "
                         "partition rows by key across the cluster nodes."),
            Row(id="bad", instruction="Hi", response="ok"),
        ]
    )
    out = {r["id"]: r for r in with_llm_quality(df, "id", min_score=3.0).collect()}
    assert out["good"]["llm_quality_passed"] is True
    assert out["bad"]["llm_quality_passed"] is False


class _ProviderServer:
    """Local HTTP server speaking the public Anthropic / OpenAI REST
    response shapes; records request paths/headers/bodies."""

    def __init__(self):
        import http.server
        import json as _json
        import threading

        server = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("content-length", 0))
                body = _json.loads(self.rfile.read(n).decode())
                server.requests.append(
                    {
                        "path": self.path,
                        "headers": {k.lower(): v for k, v in self.headers.items()},
                        "body": body,
                    }
                )
                scores = '{"clarity": 5, "relevance": 4, "completeness": 4, "accuracy": 5, "overall": 5}'
                if self.path == "/v1/messages":  # Anthropic Messages shape
                    payload = {"content": [{"type": "text", "text": scores}]}
                else:  # OpenAI Chat Completions shape
                    payload = {
                        "choices": [{"message": {"role": "assistant", "content": scores}}]
                    }
                data = _json.dumps(payload).encode()
                self.send_response(200)
                self.send_header("content-type", "application/json")
                self.send_header("content-length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def log_message(self, *a):
                pass

        self.requests = []
        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    def stop(self):
        self.httpd.shutdown()


def test_anthropic_http_shape(spark):
    """Provider plumbing against the real Anthropic Messages wire shape
    (local server): headers, endpoint, body, and response parsing."""
    srv = _ProviderServer()
    try:
        df = spark.createDataFrame(
            [Row(id="1", instruction="Explain joins", response="A join matches rows by key.")]
        ).coalesce(1)
        out = with_llm_quality(
            df, "id", provider="anthropic",
            base_url=f"http://127.0.0.1:{srv.port}",
        ).collect()
        assert out[0]["overall"] == 5.0
        assert out[0]["llm_quality_passed"] is True
        req = srv.requests[0]
        assert req["path"] == "/v1/messages"
        assert "x-api-key" in req["headers"]
        assert req["headers"]["anthropic-version"] == "2023-06-01"
        assert req["body"]["messages"][0]["role"] == "user"
        assert "Explain joins" in req["body"]["messages"][0]["content"]
        assert req["body"]["max_tokens"] == 256
    finally:
        srv.stop()


def test_openai_http_shape(spark):
    srv = _ProviderServer()
    try:
        df = spark.createDataFrame(
            [Row(id="1", instruction="Explain joins", response="A join matches rows by key.")]
        ).coalesce(1)
        out = with_llm_quality(
            df, "id", provider="openai",
            base_url=f"http://127.0.0.1:{srv.port}",
        ).collect()
        assert out[0]["overall"] == 5.0
        req = srv.requests[0]
        assert req["path"] == "/chat/completions"
        assert req["headers"]["authorization"].startswith("Bearer")
        assert req["body"]["messages"][0]["role"] == "user"
    finally:
        srv.stop()


def test_provider_failure_is_pass_neutral(spark):
    """Unreachable provider == JSON failure: overall 3.0, pass."""
    df = spark.createDataFrame(
        [Row(id="1", instruction="x", response="y")]
    ).coalesce(1)
    out = with_llm_quality(
        df, "id", provider="anthropic",
        base_url="http://127.0.0.1:1",  # connection refused
    ).collect()
    assert out[0]["overall"] == 3.0
    assert out[0]["llm_quality_passed"] is True


def test_prompt_assembly_placeholder_injection():
    """Data containing the literal placeholders must appear verbatim in
    the prompt — chained str.replace expanded '{response}' occurring
    inside the instruction (ADVICE r2)."""
    from datacheck_spark.llm_rules import _render_judge_prompt

    p = _render_judge_prompt(
        "evil {response} marker", "resp with {instruction} inside"
    )
    assert "Instruction: evil {response} marker" in p
    assert "Response: resp with {instruction} inside" in p
    # exactly one substitution each: values appear once, template tail intact
    assert p.count("evil {response} marker") == 1
    assert p.count("resp with {instruction} inside") == 1

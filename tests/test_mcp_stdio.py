"""MCP stdio wire-protocol tests: drive the JSON-RPC loop end-to-end
through text streams (the same code path ``python -m
datacheck_spark.mcp_stdio`` serves on real stdio)."""

import io
import json

from datacheck_spark.api import TOOLS
from datacheck_spark.mcp_stdio import McpStdioServer


def _serve(spark, *messages):
    in_stream = io.StringIO(
        "".join(json.dumps(m) + "\n" for m in messages)
    )
    out_stream = io.StringIO()
    McpStdioServer(in_stream, out_stream, spark=spark).serve_forever()
    return [json.loads(l) for l in out_stream.getvalue().splitlines()]


def test_initialize_list_call_roundtrip(spark):
    replies = _serve(
        spark,
        {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
        {"jsonrpc": "2.0", "method": "notifications/initialized"},
        {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
        {
            "jsonrpc": "2.0",
            "id": 3,
            "method": "tools/call",
            "params": {
                "name": "check_data_quality",
                "arguments": {
                    "samples": [
                        {"id": "1", "text": "hello world"},
                        {"id": "2", "text": "   "},
                    ]
                },
            },
        },
        {"jsonrpc": "2.0", "id": 4, "method": "ping"},
    )
    # notification produced no reply: 4 responses for 4 requests
    assert [r["id"] for r in replies] == [1, 2, 3, 4]
    init = replies[0]["result"]
    assert init["serverInfo"]["name"] == "datacheck-spark"
    assert "tools" in init["capabilities"]
    listed = {t["name"] for t in replies[1]["result"]["tools"]}
    assert listed == set(TOOLS)
    schemas = {t["name"]: t["inputSchema"] for t in replies[1]["result"]["tools"]}
    assert schemas["validate_from_datarecipe"]["required"] == ["analysis_dir"]
    assert schemas["check_drift"]["properties"]["data_path_a"] == {
        "type": "string"
    }
    assert schemas["compare_distributions"]["properties"]["file_paths"][
        "items"
    ] == {"type": "string"}
    call = replies[2]["result"]
    assert call["isError"] is False
    payload = json.loads(call["content"][0]["text"])
    assert payload["total_samples"] == 2
    assert payload["failed_samples"] == 1  # the blank row
    assert replies[3]["result"] == {}


def test_errors(spark):
    replies = _serve(
        spark,
        {"jsonrpc": "2.0", "id": 1, "method": "no/such/method"},
        {
            "jsonrpc": "2.0",
            "id": 2,
            "method": "tools/call",
            "params": {"name": "not_a_tool", "arguments": {}},
        },
    )
    assert replies[0]["error"]["code"] == -32601
    assert replies[1]["error"]["code"] == -32602


def test_parse_error_keeps_serving(spark):
    in_stream = io.StringIO(
        "this is not json\n"
        + json.dumps({"jsonrpc": "2.0", "id": 9, "method": "ping"})
        + "\n"
    )
    out = io.StringIO()
    McpStdioServer(in_stream, out, spark=spark).serve_forever()
    replies = [json.loads(l) for l in out.getvalue().splitlines()]
    assert replies[0]["error"]["code"] == -32700
    assert replies[1]["id"] == 9


def test_every_tool_dispatches(spark, tmp_path):
    """Every advertised tool must execute through tools/call with
    minimal arguments and return a non-error result."""
    samples = [{"id": "1", "text": "hello world", "score": 3}]
    # path-based fixtures for the reference's registered tool shapes
    data_a = tmp_path / "a.jsonl"
    data_a.write_text(
        "".join(json.dumps(s) + "\n" for s in samples * 3), encoding="utf-8"
    )
    data_b = tmp_path / "b.jsonl"
    data_b.write_text(
        json.dumps({"id": "9", "text": "other words", "score": 5}) + "\n",
        encoding="utf-8",
    )
    analysis = tmp_path / "analysis" / "04_复刻指南"
    analysis.mkdir(parents=True)
    (analysis / "DATA_SCHEMA.json").write_text(
        json.dumps({"fields": [{"name": "text", "type": "text"}]}),
        encoding="utf-8",
    )
    synth = tmp_path / "analysis" / "11_合成数据"
    synth.mkdir()
    (synth / "synthetic.json").write_text(
        json.dumps({"samples": samples}), encoding="utf-8"
    )
    args_by_tool = {
        "check_data_quality": {"samples": samples},
        "infer_schema": {"samples": samples},
        "fix_data": {"samples": samples},
        "compare_datasets": {"samples_a": samples, "samples_b": samples},
        "check_drift": {"baseline": samples, "current": samples},
        "check_leakage": {"train": samples, "test": samples,
                          "key_fields": ["id"], "text_field": "text"},
        "check_bias": {"samples": samples, "label_field": "score",
                       "text_field": "text"},
        "check_coverage": {"samples": samples},
        "calculate_contribution": {
            "responses": [{"task_id": "t1", "score": 3,
                           "annotated_at": "2026-01-01T00:00:00",
                           "text": "x"}]
        },
        "generate_report": {"samples": samples},
        "diff_reports": {
            "report_a": {"summary": {"pass_rate": 0.9}},
            "report_b": {"summary": {"pass_rate": 0.8}},
        },
        "diagnose_skew": {"samples": samples * 4, "key_fields": ["id"]},
        "check_conversation_structure": {
            "samples": [
                {"conv_id": "c1", "turn_idx": 0, "role": "user"},
                {"conv_id": "c1", "turn_idx": 1, "role": "assistant"},
                {"conv_id": "c2", "turn_idx": 0, "role": "user"},
                {"conv_id": "c2", "turn_idx": 2, "role": "user"},
            ]
        },
        "dedup_conversations": {
            "samples": [
                {"conv_id": "c1", "turn_idx": 0, "role": "user",
                 "text": "hello"},
                {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
                 "text": "hi"},
                {"conv_id": "c2", "turn_idx": 0, "role": "user",
                 "text": "hello"},
                {"conv_id": "c2", "turn_idx": 1, "role": "assistant",
                 "text": "hi"},
                {"conv_id": "c3", "turn_idx": 0, "role": "user",
                 "text": "different"},
            ]
        },
        "suggest_rules": {"samples": samples * 4},
        "validate_from_datarecipe": {
            "analysis_dir": str(tmp_path / "analysis")
        },
        "list_quality_rules": {},
        "batch_check_directory": {
            "directory": str(tmp_path), "pattern": "*.jsonl",
        },
        "compare_distributions": {
            "file_paths": [str(data_a), str(data_b)]
        },
    }
    assert set(args_by_tool) == set(TOOLS)
    msgs = [
        {"jsonrpc": "2.0", "id": i, "method": "tools/call",
         "params": {"name": t, "arguments": a}}
        for i, (t, a) in enumerate(args_by_tool.items(), start=1)
    ]
    replies = _serve(spark, *msgs)
    assert len(replies) == len(TOOLS)
    for (t, _), r in zip(args_by_tool.items(), replies):
        assert "result" in r, (t, r)
        assert r["result"]["isError"] is False, (t, r["result"])
        json.loads(r["result"]["content"][0]["text"])  # valid JSON payload


def test_initialize_echoes_supported_client_version(spark):
    """Version negotiation: the server echoes a client-requested
    revision it supports, and answers with its latest for unknown
    revisions (ADVICE r2)."""
    replies = _serve(
        spark,
        {"jsonrpc": "2.0", "id": 1, "method": "initialize",
         "params": {"protocolVersion": "2024-11-05"}},
        {"jsonrpc": "2.0", "id": 2, "method": "initialize",
         "params": {"protocolVersion": "1999-01-01"}},
    )
    assert replies[0]["result"]["protocolVersion"] == "2024-11-05"
    assert replies[1]["result"]["protocolVersion"] == "2025-06-18"

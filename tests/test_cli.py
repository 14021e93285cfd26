"""CLI drive tests: contribute and watch subcommands (reference
``cli.py:403-461`` and ``cli.py:500-598``)."""

import json

from datacheck_spark.cli import main


def _write_responses(tmp_path, n=20):
    p = tmp_path / "responses.jsonl"
    with open(p, "w", encoding="utf-8") as f:
        for i in range(n):
            f.write(
                json.dumps(
                    {
                        "task_id": f"t{i}",
                        "annotated_at": "2026-01-02T00:00:00",
                        "score": i % 5,
                        "comment": "detailed review comment " * (3 if i % 4 == 0 else 0),
                        "text": f"annotation text {i}",
                    }
                )
                + "\n"
            )
    return p


def test_contribute_cli(spark, tmp_path, capsys):
    responses = _write_responses(tmp_path)
    out = tmp_path / "contrib.json"
    rc = main(["contribute", str(responses), "-o", str(out), "--annotator", "a1"])
    assert rc == 0
    data = json.loads(out.read_text())
    assert data["total_responses"] == 20
    assert data["annotator_id"] == "a1"
    assert len(data["contributions"]) == 20
    for rec in data["contributions"]:
        assert rec["weight"] >= 0
        # weight = base*quality*time*scarcity (rounded 2dp)
        expected = round(
            rec["base"]
            * rec["quality_multiplier"]
            * rec["time_multiplier"]
            * rec["scarcity_multiplier"],
            2,
        )
        assert abs(rec["weight"] - expected) < 0.011
    # corner_case rows (long comment) must outweigh plain reviews
    types = {r["contrib_type"] for r in data["contributions"]}
    assert "corner_case" in types and "review" in types


def test_watch_cli_rechecks_on_change(spark, tmp_path, capsys):
    data = tmp_path / "watched"
    data.mkdir()
    f1 = data / "a.jsonl"
    f1.write_text('{"id": "1", "text": "hello world"}\n')

    import threading
    import time

    rcs = []

    def run():
        rcs.append(
            main(
                [
                    "watch",
                    str(data),
                    "--debounce",
                    "0.5",
                    "--timeout",
                    "6",
                    "--max-checks",
                    "1",
                ]
            )
        )

    t = threading.Thread(target=run)
    t.start()
    # keep modifying until the watcher exits: a single timed write can
    # land BEFORE the cold initial check finishes (and then be folded
    # into the baseline snapshot, triggering nothing); repeated writes
    # guarantee one lands after the baseline, --max-checks 1 then exits
    deadline = time.time() + 120
    i = 0
    while t.is_alive() and time.time() < deadline:
        f1.write_text(
            '{"id": "1", "text": "hello world"}\n'
            f'{{"id": "m{i}", "text": "more"}}\n'
        )
        i += 1
        time.sleep(1.0)
    t.join(timeout=5)
    assert not t.is_alive()
    assert rcs == [0]
    out = capsys.readouterr().out
    # initial check + at least one re-check after the modification
    assert out.count("checked") >= 2


def _make_analysis_dir(tmp_path, with_schema=True, with_synthetic=True,
                       with_samples=True):
    base = tmp_path / "analysis"
    if with_schema:
        sp = base / "04_复刻指南"
        sp.mkdir(parents=True)
        (sp / "DATA_SCHEMA.json").write_text(json.dumps({
            "fields": [
                {"name": "instruction", "type": "text", "required": True},
                {"name": "response", "type": "text", "required": True},
            ],
            "constraints": {"min_length": 1, "max_length": 1000},
        }), encoding="utf-8")
    if with_synthetic:
        sy = base / "11_合成数据"
        sy.mkdir(parents=True, exist_ok=True)
        (sy / "synthetic.json").write_text(json.dumps({"samples": [
            {"id": "1", "instruction": "What is AI?",
             "response": "Artificial intelligence."},
            {"id": "2", "instruction": "",
             "response": "orphan response"},  # non_empty ERROR
        ]}), encoding="utf-8")
    if with_samples:
        sa = base / "09_样例数据"
        sa.mkdir(parents=True, exist_ok=True)
        (sa / "samples.json").write_text(json.dumps({"samples": [
            {"id": "r1", "instruction": "Define ML",
             "response": "Machine learning."},
        ]}), encoding="utf-8")
    base.mkdir(exist_ok=True)
    return base


def test_check_llm_ruleset_cli(spark, tmp_path, capsys):
    """`check --ruleset llm` = builtin rules + the llm_quality INFO
    judge (reference rules.py:478-498), offline mock provider."""
    data = tmp_path / "pairs.jsonl"
    good_inst = "please summarise the quarterly report in plain words"
    good_resp = "the quarterly report shows plain steady growth in words"
    with open(data, "w", encoding="utf-8") as f:
        f.write(json.dumps({"id": "good", "instruction": good_inst,
                            "response": good_resp}) + "\n")
        f.write(json.dumps({"id": "bad", "instruction": "hi",
                            "response": "x"}) + "\n")
    out_path = tmp_path / "report.json"
    rc = main(["check", str(data), "--ruleset", "llm", "-f", "json",
               "-o", str(out_path), "--threshold", "0.0"])
    capsys.readouterr()
    assert rc == 0
    report = json.loads(out_path.read_text())
    rr = report["rule_results"]["llm_quality"]
    assert rr["severity"] == "info"
    assert rr["passed"] == 1 and rr["failed"] == 1
    assert rr["failed_samples"] == ["bad"]
    # without -f the .json extension still picks the saved format
    out2 = tmp_path / "report2.json"
    rc = main(["check", str(data), "-o", str(out2), "--threshold", "0.0"])
    capsys.readouterr()
    assert rc == 0
    assert "summary" in json.loads(out2.read_text())


def test_check_directory_pattern_cli(spark, tmp_path, capsys):
    """`check <dir> --pattern` restricts the directory scan."""
    d = tmp_path / "data"
    d.mkdir()
    (d / "a.jsonl").write_text(json.dumps({"id": "1", "text": "ok row"}))
    (d / "b.csv").write_text("id,text\n2,also ok\n")
    rc = main(["check", str(d), "--pattern", "*.jsonl", "-f", "json"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert out["total_files"] == 1 and "a.jsonl" in out["file_results"]
    # default format renders the batch markdown report
    rc = main(["check", str(d)])
    md = capsys.readouterr().out
    assert rc == 0
    assert "# Batch Data Quality Report" in md and "a.jsonl" in md
    assert "b.csv" in md  # no pattern: both files checked
    # per-file threshold gating: any file below the bar fails the run
    (d / "c.jsonl").write_text(json.dumps({"id": "3", "text": "   "}))
    rc = main(["check", str(d), "--threshold", "0.9"])
    capsys.readouterr()
    assert rc == 1


def test_compare_multi_file_cli(spark, tmp_path, capsys):
    """`compare` over N files: per-field distribution markdown report
    (reference cli.py:236-313); <2 files is a usage error."""
    files = []
    for name, scale in (("a", 1), ("b", 3), ("c", 5)):
        p = tmp_path / f"{name}.jsonl"
        with open(p, "w", encoding="utf-8") as f:
            for i in range(20):
                f.write(
                    json.dumps(
                        {"id": f"{name}{i}", "text": "word " * (i % 5 + scale),
                         "score": float(i * scale)}
                    ) + "\n"
                )
        files.append(str(p))
    out_md = tmp_path / "cmp.md"
    rc = main(["compare", *files, "-o", str(out_md)])
    capsys.readouterr()
    assert rc == 0
    report = out_md.read_text()
    assert report.count("jsonl |") == 3  # one summary row per file
    assert "### text" in report and "### score" in report
    assert main(["compare", files[0]]) == 1
    capsys.readouterr()


def test_validate_cli_datarecipe(spark, tmp_path, capsys):
    """validate reads the DataRecipe schema, picks synthetic data, and
    writes the report into 12_质检报告 (reference cli.py:178-236)."""
    base = _make_analysis_dir(tmp_path)
    rc = main(["validate", str(base)])
    assert rc == 0  # pass_rate 0.5 == default threshold
    report = base / "12_质检报告" / "quality_report.md"
    assert report.exists()
    assert "数据验证报告" in report.read_text(encoding="utf-8")
    # strict mode: the blank instruction is an ERROR -> exit 1
    rc = main(["validate", str(base), "--strict"])
    assert rc == 1
    # raised threshold gates too
    rc = main(["validate", str(base), "--threshold", "0.9"])
    assert rc == 1


def test_validate_cli_missing_schema(spark, tmp_path, capsys):
    """Missing DATA_SCHEMA.json is the reference's failed-CheckResult
    path (checker.py:385-386): exit 1, no report."""
    base = _make_analysis_dir(tmp_path, with_schema=False)
    rc = main(["validate", str(base)])
    assert rc == 1
    err = capsys.readouterr().err
    assert "Schema not found" in err


def test_validate_cli_samples_fallback_and_no_data(spark, tmp_path, capsys):
    base = _make_analysis_dir(tmp_path, with_synthetic=False)
    rc = main(["validate", str(base), "-f", "json"])
    assert rc == 0  # falls back to 09_样例数据/samples.json (all clean)
    report = base / "12_质检报告" / "quality_report.json"
    assert json.loads(report.read_text(encoding="utf-8"))["summary"]
    base2 = _make_analysis_dir(tmp_path / "x", with_synthetic=False,
                               with_samples=False)
    rc = main(["validate", str(base2)])
    assert rc == 1
    assert "No data file found" in capsys.readouterr().err


def test_transcripts_structure_cli(spark, tmp_path, capsys):
    """`transcripts --structure` adds the cross-turn verdict summary;
    the planted duplicate keys surface as non-contiguous/failing
    conversations."""
    from datacheck_spark.transcripts import generate_transcripts

    data = str(tmp_path / "t.parquet")
    generate_transcripts(spark, n_convs=150, turns_per_conv=6).write.parquet(
        data
    )
    rc = main(["transcripts", data, "--structure"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc in (0, 1)
    s = out["structure"]
    assert s["conversations"] == 150
    # ~0.5% duplicated keys over ~900 turns -> a few failing convs
    assert s["failing"] >= 1
    assert s["non_contiguous"] >= 1
    assert s["failing"] <= s["conversations"]


def test_transcripts_conv_dedup_cli(spark, tmp_path, capsys):
    """`transcripts --conv-dedup` reports conversation-level exact
    duplicate groups; the synthetic generator plants none (every
    conversation's text is cid-seeded), so the honest rollup is 0/0 —
    planted duplicates are covered by test_transcripts'
    test_conversation_dedup_planted."""
    from datacheck_spark.transcripts import generate_transcripts

    data = str(tmp_path / "t.parquet")
    generate_transcripts(spark, n_convs=60, turns_per_conv=4).write.parquet(
        data
    )
    rc = main(["transcripts", data, "--conv-dedup"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc in (0, 1)
    d = out["conversation_dedup"]
    assert d == {"duplicate_groups": 0, "duplicate_conversations": 0}


def test_transcripts_daily_verdicts_cli(spark, tmp_path, capsys):
    """`transcripts --daily-verdicts` emits one bounded verdict row per
    ts day partitioning the turn count exactly (the generator spreads
    conversations over 30 days)."""
    from datacheck_spark.transcripts import generate_transcripts

    data = str(tmp_path / "t.parquet")
    df = generate_transcripts(spark, n_convs=90, turns_per_conv=4)
    n_turns = df.count()
    df.write.parquet(data)
    rc = main(["transcripts", data, "--daily-verdicts"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc in (0, 1)
    days = out["daily_verdicts"]
    assert 1 < len(days) <= 30
    assert sum(r["total"] for r in days) == n_turns
    assert [r["ts_day"] for r in days] == sorted(
        r["ts_day"] for r in days
    )
    for r in days:
        assert set(r) == {"ts_day", "total", "failed", "pass_rate", "passed"}
        assert r["passed"] == (r["pass_rate"] >= 0.95)

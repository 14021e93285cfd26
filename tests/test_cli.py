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
    time.sleep(2)  # initial check done; watcher polling
    f1.write_text('{"id": "1", "text": "hello world"}\n{"id": "2", "text": "more"}\n')
    t.join(timeout=30)
    assert not t.is_alive()
    assert rcs == [0]
    out = capsys.readouterr().out
    # initial check + at least one re-check after the modification
    assert out.count("checked") >= 2

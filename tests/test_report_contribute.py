"""Report rendering/diff/gating and contribution weighting."""

import pytest
from pyspark.sql import Row

from datacheck_spark import report as R
from datacheck_spark.engine import CheckResult
from datacheck_spark.contribute import (
    calculate_contributions,
    contribution_summary,
    scarcity_multiplier,
)
from datacheck_spark.schema import ValidationSchema


def _result(pass_rate=0.95):
    total = 100
    passed = int(total * pass_rate)
    return CheckResult(
        total_samples=total,
        passed_samples=passed,
        failed_samples=total - passed,
        pass_rate=pass_rate,
        error_count=total - passed,
        warning_count=3,
        info_count=1,
        rule_results={
            "non_empty": {
                "name": "non-empty", "severity": "error",
                "passed": passed, "failed": total - passed,
                "failed_samples": [],
            }
        },
        failed_sample_ids=[str(i) for i in range(total - passed)],
        duplicates=[["1", "2"]],
    )


def test_quality_grades():
    # report.py:48-55 thresholds at the reference test points
    assert R.quality_grade(0.95) == "Excellent"
    assert R.quality_grade(0.75) == "Good"
    assert R.quality_grade(0.55) == "Fair"
    assert R.quality_grade(0.35) == "Poor"


def test_markdown_sections():
    md = R.to_markdown(_result())
    for section in ("## Summary", "## Rules", "## Duplicates", "## Failed samples"):
        assert section in md
    assert "95.0%" in md and "Excellent" in md


def test_json_and_html():
    res = _result(0.75)
    j = R.to_json_report(res)
    assert j["summary"]["grade"] == "Good"
    html = R.to_html(res)
    assert "75.0%" in html and R.grade_color(0.75) in html


def test_save_report_by_extension(tmp_path):
    res = _result()
    for ext in ("md", "json", "html"):
        p = tmp_path / f"r.{ext}"
        R.save_report(res, str(p))
        assert p.exists() and p.stat().st_size > 0


def test_diff_arrows():
    a = R.to_json_report(_result(0.95))
    b = R.to_json_report(_result(0.85))
    diff = R.diff_reports(a, b)
    assert "↓" in diff and "pass_rate" in diff


def test_gate():
    assert R.gate(_result(0.95), threshold=0.9) == 0
    assert R.gate(_result(0.4), threshold=0.5) == 1
    assert R.gate(_result(0.95), strict=True) == 1  # has errors/warnings


def test_scarcity_tiers():
    assert scarcity_multiplier(30) == 1.3
    assert scarcity_multiplier(100) == 1.1
    assert scarcity_multiplier(300) == 1.0


@pytest.fixture(scope="module")
def annotation_df(spark):
    rows = [
        # passing, with long comment -> corner_case, +0.1 quality
        Row(task_id="T1", score=2, comment="x" * 60, ranking=None,
            annotated_at="2026-01-02T00:00:00Z"),
        # passing, ranking -> peer_review
        Row(task_id="T2", score=1, comment="solid annotation work", ranking="[1,2]",
            annotated_at="2026-01-10T00:00:00Z"),
        # failing: no task_id -> weight 0
        Row(task_id=None, score=3, comment="", ranking=None,
            annotated_at="2026-01-02T00:00:00Z"),
        # passing, plain review, late
        Row(task_id="T4", score=3, comment="", ranking=None,
            annotated_at="2026-03-15T00:00:00Z"),
    ]
    return spark.createDataFrame(rows)


def test_contribution_weights(spark, annotation_df):
    schema = ValidationSchema.from_dict(
        {"scoring_rubric": [{"score": 1}, {"score": 2}, {"score": 3}]}
    )
    out = calculate_contributions(
        annotation_df, schema=schema, dataset_created_at="2026-01-01T00:00:00Z"
    ).collect()
    rows = {r["task_id"]: r for r in out}

    t1 = rows["T1"]
    assert t1["contrib_type"] == "corner_case"
    assert t1["base"] == 8.0
    # 1.0 + 0.1 comment + 0.1 rubric = 1.2; day 1 -> 1.5; scarcity(4) -> 1.3
    assert t1["quality_mult"] == pytest.approx(1.2)
    assert t1["time_mult"] == pytest.approx(1.5)
    assert t1["weight"] == pytest.approx(round(8.0 * 1.2 * 1.5 * 1.3, 2))

    t2 = rows["T2"]
    assert t2["contrib_type"] == "peer_review"
    assert t2["time_mult"] == pytest.approx(1.0)  # day 9: > 7, <= 30
    t4 = rows["T4"]
    assert t4["time_mult"] == pytest.approx(0.9)  # > 30 days

    failed = rows[None]
    assert failed["passed"] is False
    assert failed["weight"] == 0.0


def test_contribution_summary(spark, annotation_df):
    schema = ValidationSchema.from_dict(
        {"scoring_rubric": [{"score": 1}, {"score": 2}, {"score": 3}]}
    )
    contribs = calculate_contributions(
        annotation_df, schema=schema, dataset_created_at="2026-01-01T00:00:00Z"
    )
    summary = contribution_summary(contribs)
    assert summary["total_responses"] == 4
    assert summary["passed_responses"] == 3
    assert summary["failed_responses"] == 1
    assert summary["total_weight"] > 0

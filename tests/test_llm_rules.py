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

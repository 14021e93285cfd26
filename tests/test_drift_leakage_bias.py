"""Drift (summary + KS/PSI), leakage, and bias analyses."""

import pytest
from pyspark.sql import Row

from datacheck_spark import drift as DR
from datacheck_spark import leakage as L
from datacheck_spark import bias as B


@pytest.fixture(scope="module")
def split_dfs(spark):
    a = spark.createDataFrame(
        [Row(cat="x" if i % 3 else "y", v=float(i % 10), txt=f"text number {i}")
         for i in range(100)]
    )
    b = spark.createDataFrame(
        [Row(cat="x", v=float(i % 10) + 5.0, txt=f"much longer text entry number {i}")
         for i in range(100)]
    )
    return a, b


def test_drift_summary(split_dfs):
    a, b = split_dfs
    rep = DR.drift_summary(a, b)
    assert rep["count_a"] == rep["count_b"] == 100
    v = rep["fields"]["v"]
    assert v["type"] == "numeric"
    assert v["b"]["mean"] - v["a"]["mean"] == pytest.approx(5.0)
    assert rep["fields"]["cat"]["type"] == "categorical"
    assert rep["fields"]["txt"]["type"] == "text"
    assert rep["fields"]["txt"]["b"]["avg_length"] > rep["fields"]["txt"]["a"]["avg_length"]


def test_ks_statistic(split_dfs):
    a, b = split_dfs
    # identical distributions -> 0
    assert DR.ks_statistic(a, a, "v") == pytest.approx(0.0)
    # shifted by 5 with overlap -> D = 0.5 (half the mass doesn't overlap)
    d = DR.ks_statistic(a, b, "v")
    assert d == pytest.approx(0.5)


def test_ks_matches_scipy_shape(spark):
    """Exact KS against a hand-computed value."""
    a = spark.createDataFrame([Row(v=float(x)) for x in [1, 2, 3, 4]])
    b = spark.createDataFrame([Row(v=float(x)) for x in [3, 4, 5, 6]])
    # ECDFs: at v=2, Fa=0.5, Fb=0 -> D=0.5
    assert DR.ks_statistic(a, b, "v") == pytest.approx(0.5)


def test_psi(split_dfs):
    a, b = split_dfs
    assert DR.psi(a, a, "v") == pytest.approx(0.0, abs=1e-9)
    assert DR.psi(a, b, "v") > 0.25  # major shift


def test_drift_report_combined(split_dfs):
    a, b = split_dfs
    rep = DR.drift_report(a, b)
    assert rep["fields"]["v"]["ks"] == pytest.approx(0.5)
    assert rep["fields"]["v"]["psi"] > 0.25


def test_exact_leakage(spark):
    train = spark.createDataFrame(
        [Row(text=f"this is training sample number {i}") for i in range(20)]
    )
    test = spark.createDataFrame(
        [Row(text="this is training sample number 3"),
         Row(text="a genuinely novel evaluation sample")]
    )
    leaked = L.exact_leakage(train, test, ["text"])
    assert leaked.count() == 1


def test_near_leakage(spark):
    train = spark.createDataFrame(
        [Row(id="t1", text="the quick brown fox jumps over the lazy dog today ok"),
         Row(id="t2", text="completely unrelated training content here")]
    )
    test = spark.createDataFrame(
        [Row(id="e1", text="the quick brown fox jumps over the lazy dog today maybe"),
         Row(id="e2", text="novel test content with nothing shared")]
    )
    pairs = L.near_leakage_pairs(
        train, test, "text", "id", "id", threshold=0.8
    ).collect()
    assert [(p["test_id"], p["train_id"]) for p in pairs] == [("e1", "t1")]


def test_check_leakage_report(spark):
    train = spark.createDataFrame(
        [Row(id=str(i), text=f"training sample with longer text {i}") for i in range(10)]
    )
    test = spark.createDataFrame(
        [Row(id="a", text="training sample with longer text 5"),
         Row(id="b", text="unique evaluation content entirely")]
    )
    rep = L.check_leakage(
        train, test, key_cols=["text"], text_col="text",
        train_id="id", test_id="id",
    )
    assert rep["exact_matches"] == 1
    assert rep["exact_rate"] == pytest.approx(0.5)


def test_bias_report(spark):
    rows = [
        Row(label="a" if i % 4 else "b", text=f"sample text number {i}")
        for i in range(100)
    ]
    df = spark.createDataFrame(rows)
    rep = B.check_bias(df)
    cb = rep["category_bias"]
    assert cb["label_field"] == "label"
    assert cb["imbalance_ratio"] == pytest.approx(3.0)
    assert rep["length_bias"]["text_field"] == "text"
    assert rep["language_bias"].get("en", 0) == 100


def test_detect_label_column(spark):
    df = spark.createDataFrame(
        [Row(cat="yes" if i % 2 else "no",
             essay="a long free-text field with many words " * 3)
         for i in range(50)]
    )
    assert B.detect_label_column(df) == "cat"


def test_near_leakage_lsh_matches_exact(spark):
    """The banded-LSH scale path must reproduce the exact path's pairs
    (VERDICT r2 item 7) — including first-match-wins tie-breaking."""
    train = spark.createDataFrame(
        [Row(id=f"t{i}", text=f"the quick brown fox jumps over the lazy dog today sample {i}")
         for i in range(30)]
        + [Row(id="t_x", text="completely unrelated training content here")]
    )
    test = spark.createDataFrame(
        [Row(id="e1", text="the quick brown fox jumps over the lazy dog today maybe 7"),
         Row(id="e2", text="novel test content with nothing shared")]
    )
    exact = L.near_leakage_pairs(
        train, test, "text", "id", "id", threshold=0.7
    )
    lsh = L.near_leakage_pairs_lsh(
        train, test, "text", "id", "id", threshold=0.7
    )
    key = lambda rows: sorted((r["test_id"], r["train_id"]) for r in rows)
    assert key(lsh.collect()) == key(exact.collect())
    assert lsh.count() >= 1

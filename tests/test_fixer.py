"""Fixer tests — mirrors `/root/reference/tests/test_fixer.py`:
dedup/trim/remove-empty counts and PII redaction tokens."""

from pyspark.sql import Row

from datacheck_spark.fixer import DataFixer


def test_dedup_keeps_first(spark):
    df = spark.createDataFrame(
        [
            Row(id="1", text="same content"),
            Row(id="2", text="same content"),
            Row(id="3", text="different content"),
        ]
    )
    fixed, res = DataFixer().fix(
        df, data_cols=["text"], order_col="id", trim=False,
        remove_empty=False,
    )
    assert res.duplicates_removed == 1
    kept = sorted(r["id"] for r in fixed.collect())
    assert kept == ["1", "3"]


def test_trim_counts_changed_fields(spark):
    df = spark.createDataFrame(
        [
            Row(id="1", a="  padded  ", b="clean"),
            Row(id="2", a="fine", b=" left"),
        ]
    )
    fixed, res = DataFixer().fix(df, dedup=False, remove_empty=False)
    assert res.trimmed_count == 2
    vals = {r["id"]: (r["a"], r["b"]) for r in fixed.collect()}
    assert vals["1"] == ("padded", "clean")
    assert vals["2"] == ("fine", "left")


def test_remove_empty(spark):
    df = spark.createDataFrame(
        [("1", "value", None), ("2", "", None), ("3", None, None)],
        "id string, a string, b string",
    )
    fixed, res = DataFixer().fix(
        df, dedup=False, trim=False, data_cols=["a", "b"]
    )
    assert res.empty_removed == 2
    assert [r["id"] for r in fixed.collect()] == ["1"]


def test_strip_pii_counts(spark):
    df = spark.createDataFrame(
        [
            Row(id="1", text="mail a@b.com and 13812345678"),
            Row(id="2", text="totally clean"),
        ]
    )
    fixed, res = DataFixer().fix(
        df, dedup=False, trim=False, remove_empty=False, strip_pii=True
    )
    assert res.pii_redacted_count == 1
    vals = {r["id"]: r["text"] for r in fixed.collect()}
    assert vals["1"] == "mail [EMAIL] and [PHONE]"
    assert vals["2"] == "totally clean"


def test_pipeline_order_and_totals(spark):
    df = spark.createDataFrame(
        [
            Row(id="1", text="  dup  "),
            Row(id="2", text="  dup  "),
            Row(id="3", text=""),
            Row(id="4", text="keep a@b.com"),
        ]
    )
    fixed, res = DataFixer().fix(
        df, data_cols=["text"], order_col="id", strip_pii=True
    )
    assert res.total_input == 4
    assert res.duplicates_removed == 1
    assert res.empty_removed == 1
    assert res.total_output == 2
    vals = {r["id"]: r["text"] for r in fixed.collect()}
    assert vals["1"] == "dup"
    assert vals["4"] == "keep [EMAIL]"


def test_fix_near_dedup_keep_best(spark):
    """Opt-in near-dedup in the fixer: near-identical texts collapse to
    the longest member; distinct texts survive."""
    from pyspark.sql import Row

    from datacheck_spark.fixer import DataFixer

    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        Row(id="a", text=base),
        Row(id="b", text=base + " zz"),               # near-dup of a (J~0.93), longer
        Row(id="c", text="completely different content about spark plans"),
    ]
    df = spark.createDataFrame(rows)
    fixed, res = DataFixer().fix(
        df,
        dedup=False,
        trim=False,
        remove_empty=False,
        near_dedup=True,
        near_threshold=0.8,
    )
    kept = sorted(r["id"] for r in fixed.collect())
    assert kept == ["b", "c"]
    assert res.near_duplicates_removed == 1

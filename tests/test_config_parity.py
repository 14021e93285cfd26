"""Differential parity for the YAML rule compiler (§2.3): our compiled
Columns vs the reference's ``_build_config_check_fn`` closures over
string- and double-typed corpora, including the coercion quirks of
``_eval_condition`` and exception→fail semantics."""

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, StringType, StructField, StructType,
)

REF = Path("/root/reference/src")
if REF.exists():
    sys.path.insert(0, str(REF))

ref_rules = pytest.importorskip(
    "datacheck.rules", reason="reference not available"
)

from datacheck_spark.rules.compiler import _config_check_column  # noqa: E402

STRING_VALUES = [
    None, "", "   ", "abc", "hello world", "5", "5.5", "-3", "abc123",
    "0", "new", "done", "weird", "x" * 50,
    # non-space whitespace: str.strip() vs F.trim divergence (ADVICE r1)
    "\t\n", "\r\n \t", "\x0b\x0c", " 　", "  ",
    " \t abc \n ", " abc ",
]
DOUBLE_VALUES = [None, 0.0, 1.0, -3.5, 5.0, 50.5, 99.9, 100.0, 1e6]

STRING_CONFIGS = [
    ("non_empty", {}),
    ("min_length", {"value": 3}),
    ("max_length", {"value": 10}),
    ("regex", {"pattern": "^[a-z ]+$"}),
    ("regex", {"pattern": "\\d+"}),
    ("enum", {"values": ["new", "done"]}),
    ("enum", {"values": []}),
    ("number_range", {"min": 0, "max": 10}),
    ("number_range", {"min": 1}),
]
DOUBLE_CONFIGS = [
    ("non_empty", {}),
    ("min_length", {"value": 3}),
    ("max_length", {"value": 2}),
    ("regex", {"pattern": "5"}),
    ("enum", {"values": [1.0, 5.0]}),
    ("number_range", {"min": 0, "max": 100}),
    ("number_range", {"max": 50}),
]


def _compare(spark, values, dtype, configs):
    schema = StructType([StructField("f", dtype, True)])
    df = spark.createDataFrame([(v,) for v in values], schema)
    exprs = []
    for i, (check, extra) in enumerate(configs):
        rule_def = {"field": "f", "check": check, **extra}
        exprs.append(
            F.coalesce(
                _config_check_column(df, "f", check, rule_def), F.lit(False)
            ).alias(f"c{i}")
        )
    rows = df.select(F.col("f"), *exprs).collect()
    for i, (check, extra) in enumerate(configs):
        rule_def = {"field": "f", "check": check, **extra}
        fn = ref_rules.RuleSet._build_config_check_fn("f", check, rule_def)
        for row, v in zip(rows, values):
            # DataFrame null == missing key (documented deviation):
            # feed the reference the missing-key shape for None
            sample = {"f": v} if v is not None else {}
            try:
                expected = bool(fn(sample, {}))
            except Exception:
                expected = False  # rule.check wraps exceptions as fail
            got = bool(row[f"c{i}"])
            assert got == expected, (
                f"{check} {extra} value={v!r}: spark={got} ref={expected}"
            )


def test_string_column_parity(spark):
    _compare(spark, STRING_VALUES, StringType(), STRING_CONFIGS)


def test_double_column_parity(spark):
    # skip None for doubles: the reference distinguishes key-with-None
    # (len raises -> fail) from missing key ("") which a DataFrame
    # cannot represent (documented deviation)
    _compare(
        spark,
        [v for v in DOUBLE_VALUES if v is not None],
        DoubleType(),
        DOUBLE_CONFIGS,
    )


def test_conditional_required_parity(spark):
    cases = [
        # (cond value, target value)
        ("5", "filled"), ("5", ""), ("5", None),
        ("abc", ""), ("abc", "filled"), (None, ""),
        ("10", "x"), ("4.9", ""),
    ]
    schema = StructType(
        [StructField("amount", StringType(), True),
         StructField("reason", StringType(), True)]
    )
    df = spark.createDataFrame(cases, schema)
    for op, target in [(">", 5), (">", "5"), ("==", "abc"), ("<=", "4.9"),
                       (">", "zz")]:
        rule_def = {
            "field": "reason",
            "check": "conditional_required",
            "condition": {"field": "amount", "operator": op, "value": target},
        }
        fn = ref_rules.RuleSet._build_config_check_fn(
            "reason", "conditional_required", rule_def
        )
        col = _config_check_column(df, "reason", "conditional_required", rule_def)
        rows = df.select("amount", "reason",
                         F.coalesce(col, F.lit(False)).alias("got")).collect()
        for r in rows:
            sample = {"amount": r["amount"], "reason": r["reason"]}
            # mirror DataFrame null==missing: drop None keys
            sample = {k: v for k, v in sample.items() if v is not None}
            try:
                expected = bool(fn(sample, {}))
            except Exception:
                expected = False
            assert bool(r["got"]) == expected, (op, target, dict(r.asDict()))

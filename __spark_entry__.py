"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship fused-rule summary over the sf0.001
tables; ``queries()``/``oracle_sql()`` expose one entry per implemented
operator from SURVEY.md §2 (implemented in
``datacheck_spark/contract.py`` with DuckDB oracle twins).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full builtin rule
    suite compiled to one fused pass over documents, returning the
    per-rule pass/fail summary (one row per rule)."""
    from pyspark.sql import functions as F

    from datacheck_spark.engine import ValidationEngine, RULE_PREFIX
    from datacheck_spark.schema import ValidationSchema

    # materialize the transcripts contract cache up front (the driver
    # smoke-runs entry() first, so the parquet exists before any
    # oracle/query ordering in the correctness stage)
    from datacheck_spark.contract import (
        ensure_dirscan_files,
        ensure_file_fixtures,
        transcripts_table,
    )

    transcripts_table(spark)
    ensure_dirscan_files()
    ensure_file_fixtures()

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    engine = ValidationEngine(schema=ValidationSchema())
    rules = engine.compile(df)
    annotated = engine.annotate(df, rules=rules)
    aggs = [F.count(F.lit(1)).alias("total")]
    for r in rules:
        aggs.append(
            F.sum((~F.col(RULE_PREFIX + r.rule_id)).cast("long")).alias(
                "failed_" + r.rule_id
            )
        )
    wide = annotated.agg(*aggs)
    # long form: one row per rule
    row = wide.collect()[0]
    return spark.createDataFrame(
        [
            (r.rule_id, r.severity.value, row["total"], int(row["failed_" + r.rule_id]))
            for r in rules
        ],
        "rule_id string, severity string, total long, failed long",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from datacheck_spark import contract

    return contract.queries()


def oracle_sql() -> dict[str, str]:
    from datacheck_spark import contract

    return contract.oracle_sql()

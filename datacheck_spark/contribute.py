"""Contribution weighting: weight = base × quality × time × scarcity.

Reference: ``/root/reference/src/datacheck/contribute.py`` — base
weights per contribution type (``contribute.py:44-50``), type inference
(``contribute.py:53-63``), quality multiplier (``contribute.py:66-95``),
time multiplier tiers (``contribute.py:98-134``), scarcity tiers
(``contribute.py:137-153``). Pass/fail comes from an annotation-ruleset
check joined in as a column.

All multipliers are pure column arithmetic — the whole weighting is one
projection over the annotated frame, no shuffle.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datacheck_spark.engine import ValidationEngine, HAS_ERROR
from datacheck_spark.rules.compiler import get_annotation_ruleset
from datacheck_spark.schema import ValidationSchema

#: contribute.py:44-50
DEFAULT_BASE_WEIGHTS = {
    "review": 1.0,
    "peer_review": 3.0,
    "corner_case": 8.0,
    "conclusion": 20.0,
    "maintenance": 5.0,
}


def contribution_type(df: DataFrame) -> Column:
    """Type inference (``contribute.py:53-63``): ranking present →
    peer_review; comment > 50 chars → corner_case; else review."""
    has_ranking = (
        F.col("ranking").isNotNull()
        if "ranking" in df.columns
        else F.lit(False)
    )
    comment = (
        F.coalesce(F.col("comment"), F.lit(""))
        if "comment" in df.columns
        else F.lit("")
    )
    return (
        F.when(has_ranking, "peer_review")
        .when(F.length(comment) > 50, "corner_case")
        .otherwise("review")
    )


def quality_multiplier(
    df: DataFrame, passed: Column, schema: ValidationSchema
) -> Column:
    """``contribute.py:66-95``: failed → 0.0; else 1.0, +0.1 for a
    ≥10-char comment, +0.1 for a rubric-matching score; rounded 2dp."""
    comment = (
        F.coalesce(F.col("comment"), F.lit(""))
        if "comment" in df.columns
        else F.lit("")
    )
    mult = F.lit(1.0) + F.when(F.length(comment) >= 10, 0.1).otherwise(0.0)
    valid = [s for s in schema.valid_scores if s is not None]
    if schema.scoring_rubric and "score" in df.columns:
        mult = mult + F.when(F.col("score").isin(valid), 0.1).otherwise(0.0)
    return F.when(~passed, F.lit(0.0)).otherwise(F.round(mult, 2))


def time_multiplier(
    annotated_at: Column, dataset_created_at: Optional[str]
) -> Column:
    """``contribute.py:98-134``: Δdays ≤1 → 1.5, ≤7 → 1.2, ≤30 → 1.0,
    else 0.9; missing/unparseable timestamp → 1.0; without a dataset
    creation time Δdays = 0 → 1.5."""
    ts = F.to_timestamp(
        F.regexp_replace(annotated_at.cast("string"), "Z$", "+00:00")
    )
    if dataset_created_at:
        created = F.to_timestamp(
            F.lit(dataset_created_at.replace("Z", "+00:00"))
        )
    else:
        created = ts
    days = F.greatest(F.datediff(ts, created), F.lit(0))
    tiered = (
        F.when(days <= 1, 1.5)
        .when(days <= 7, 1.2)
        .when(days <= 30, 1.0)
        .otherwise(0.9)
    )
    return F.when(
        annotated_at.isNull() | ts.isNull(), F.lit(1.0)
    ).otherwise(tiered)


def scarcity_multiplier(total_responses: int) -> float:
    """``contribute.py:137-153``: <50 → 1.3, <200 → 1.1, else 1.0."""
    if total_responses < 50:
        return 1.3
    if total_responses < 200:
        return 1.1
    return 1.0


def calculate_contributions(
    df: DataFrame,
    schema: Optional[ValidationSchema] = None,
    base_weights: Optional[Dict[str, float]] = None,
    dataset_created_at: Optional[str] = None,
) -> DataFrame:
    """Annotate each response row with contribution type, multipliers,
    and final weight (``contribute.py:156-277``).

    The pass/fail verdict comes from the annotation ruleset compiled to
    the same fused pass; failed rows get weight 0 via the quality
    multiplier. Scarcity is one scalar (needs the total count — one
    cheap count job). Returns the input columns plus
    (contrib_type, base, quality_mult, time_mult, scarcity_mult, weight).
    """
    schema = schema or ValidationSchema()
    weights = base_weights or DEFAULT_BASE_WEIGHTS

    engine = ValidationEngine(
        ruleset=get_annotation_ruleset(), schema=schema
    )
    annotated = engine.annotate(df)
    passed = ~F.col(HAS_ERROR)

    total = df.count()
    scarcity = scarcity_multiplier(total)

    ctype = contribution_type(df)
    base = F.lit(None).cast("double")
    expr = None
    for t, w in weights.items():
        expr = (F.when(ctype == t, w) if expr is None else expr.when(ctype == t, w))
    base = expr.otherwise(1.0)

    quality = quality_multiplier(df, passed, schema)
    tmult = time_multiplier(
        F.col("annotated_at") if "annotated_at" in df.columns else F.lit(None),
        dataset_created_at,
    )
    weight = F.round(base * quality * tmult * F.lit(scarcity), 2)

    return annotated.select(
        *df.columns,
        ctype.alias("contrib_type"),
        base.alias("base"),
        quality.alias("quality_mult"),
        tmult.alias("time_mult"),
        F.lit(scarcity).alias("scarcity_mult"),
        weight.alias("weight"),
        passed.alias("passed"),
    )


def contribution_summary(contribs: DataFrame) -> Dict[str, Any]:
    """Aggregate summary matching ``contributions_to_json``
    (``contribute.py:280-308``)."""
    row = contribs.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.col("passed").cast("long")).alias("passed"),
        F.round(F.sum(F.when(F.col("passed"), F.col("weight")).otherwise(0.0)), 2).alias(
            "total_weight"
        ),
    ).collect()[0]
    total, passed = row["total"], row["passed"]
    return {
        "total_responses": total,
        "passed_responses": passed,
        "failed_responses": total - passed,
        "total_weight": float(row["total_weight"] or 0.0),
        "quality_pass_rate": round(passed / total, 4) if total else None,
    }

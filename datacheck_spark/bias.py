"""Bias analysis: category imbalance, length distribution, language mix.

Reference: ``check_bias`` (``mcp_server.py:706-782``):

- label auto-detect: a short string field with 2–50 uniques in the
  first 200 samples (``mcp_server.py:718-726``);
- category imbalance: label counts + max/min ratio;
- length bias: mean / population std / min / max of text length;
- language bias: zh/en/other by CJK-vs-latin share of the first 500
  chars with 0.3 cutoffs (``mcp_server.py:756-775``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

#: literal-endpoint CJK class — valid in both Java regex and RE2
CJK_CLASS = "[一-鿿]"


def detect_label_column(
    df: DataFrame,
    max_avg_len: int = 20,
    min_uniques: int = 2,
    max_uniques: int = 50,
    probe_rows: int = 200,
) -> Optional[str]:
    """Short-string field with a small value vocabulary
    (``mcp_server.py:718-726``), probed on a bounded prefix."""
    scols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, StringType)
    ]
    if not scols:
        return None
    probe = df.select(*scols).limit(probe_rows)
    row = probe.agg(
        *[F.avg(F.length(c)).alias(f"len__{c}") for c in scols],
        *[F.countDistinct(c).alias(f"u__{c}") for c in scols],
    ).collect()[0]
    for c in scols:
        avg_len = row[f"len__{c}"] or 0
        uniq = row[f"u__{c}"] or 0
        if avg_len <= max_avg_len and min_uniques <= uniq <= max_uniques:
            return c
    return None


def language_share(col) -> Dict[str, object]:
    """zh/en/other classification expression over the first 500 chars
    (``mcp_server.py:756-775``)."""
    head = F.substring(col, 1, 500)
    ln = F.length(head)
    cjk = ln - F.length(F.regexp_replace(head, CJK_CLASS, ""))
    latin = ln - F.length(F.regexp_replace(head, "[a-zA-Z]", ""))
    return (
        F.when(col.isNull() | (ln == 0), "unknown")
        .when(cjk.cast("double") / ln > 0.3, "zh")
        .when(latin.cast("double") / ln > 0.3, "en")
        .otherwise("other")
    )


def group_language_consistency(
    df: DataFrame, group_col: str, text_col: str
) -> DataFrame:
    """Per-group language mix: majority language (count-desc, name-asc
    tie-break), total rows, majority count, and minority share — the
    grouped analogue of the per-sample ``language_consistency`` rule
    (e.g. per conversation or per source). One shuffle on
    (group, lang) with map-side combine, then a tiny per-group window.
    """
    from pyspark.sql import Window

    counts = (
        df.select(
            F.col(group_col).alias("grp"),
            language_share(F.col(text_col)).alias("lang"),
        )
        .groupBy("grp", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("grp").orderBy(F.desc("n"), F.asc("lang"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .groupBy("grp")
        .agg(
            F.max(F.when(F.col("rank") == 1, F.col("lang"))).alias(
                "majority_lang"
            ),
            F.sum("n").alias("total"),
            F.max(F.when(F.col("rank") == 1, F.col("n"))).alias(
                "majority_count"
            ),
        )
        .select(
            F.col("grp").alias(group_col),
            "majority_lang",
            "total",
            "majority_count",
            F.round(
                (F.col("total") - F.col("majority_count"))
                / F.col("total"),
                6,
            ).alias("minority_share"),
        )
    )


def check_bias(
    df: DataFrame,
    label_col: Optional[str] = None,
    text_col: Optional[str] = None,
) -> Dict[str, Any]:
    """Full bias report: category imbalance + length stats + language
    tally, three single-shuffle jobs."""
    report: Dict[str, Any] = {"total_samples": df.count()}

    label_col = label_col or detect_label_column(df)
    if label_col:
        counts = (
            df.where(F.col(label_col).isNotNull())
            .groupBy(label_col)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc(label_col))
            .collect()
        )
        dist = {r[0]: r[1] for r in counts}
        if dist:
            mx, mn = max(dist.values()), min(dist.values())
            report["category_bias"] = {
                "label_field": label_col,
                "distribution": dist,
                "imbalance_ratio": round(mx / mn, 2) if mn else float("inf"),
            }

    if text_col is None:
        long_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, StringType) and f.name != label_col
        ]
        text_col = long_cols[0] if long_cols else None
    if text_col:
        c = F.col(text_col)
        row = df.where(c.isNotNull()).agg(
            F.round(F.avg(F.length(c)), 4).alias("mean"),
            F.round(F.stddev_pop(F.length(c)), 4).alias("std"),
            F.min(F.length(c)).alias("min"),
            F.max(F.length(c)).alias("max"),
        ).collect()[0]
        report["length_bias"] = {
            "text_field": text_col,
            "mean": row["mean"],
            "std": row["std"],
            "min": row["min"],
            "max": row["max"],
        }
        langs = (
            df.select(language_share(c).alias("lang"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        report["language_bias"] = {r["lang"]: r["cnt"] for r in langs}
    return report

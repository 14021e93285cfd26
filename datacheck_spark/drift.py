"""Distribution-drift analysis: reference-style summary deltas plus
KS / PSI statistics over histogram sketches.

Reference: ``check_drift`` (``mcp_server.py:570-631``) computes only
summary deltas (count/mean/min/max per numeric field, top-20 category
tables, avg text length). That is reproduced by ``drift_summary``.

The north_star requires an upgrade: per-partition KS / PSI over
histogram sketches. ``ks_statistic`` computes the exact two-sample KS
distance distributed (one groupBy on value + one cumulative window);
``psi`` computes the Population Stability Index over quantile bins
derived from the reference side. Both avoid collecting row data — only
bin/step tables sized by distinct values (KS) or bin count (PSI) are
shuffled. For 10^12-row inputs, pass ``approx_bins`` to pre-bin KS into
a bounded histogram first (t-digest-style bounded sketch).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, BooleanType, StringType


def _classify_fields(
    a: DataFrame, b: DataFrame, unique_ratio_cutoff: float = 0.3
) -> Dict[str, str]:
    """Shared-field classification like ``mcp_server.py:586-596``:
    numeric columns → numeric; strings with low unique ratio →
    categorical; other strings → text."""
    shared = [c for c in a.columns if c in b.columns]
    dtypes = {f.name: f.dataType for f in a.schema.fields}
    out: Dict[str, str] = {}
    string_cols = [
        c for c in shared if isinstance(dtypes[c], StringType)
    ]
    ratios: Dict[str, float] = {}
    if string_cols:
        aggs = []
        for c in string_cols:
            aggs += [
                F.countDistinct(c).alias(f"u__{c}"),
                F.count(c).alias(f"n__{c}"),
            ]
        row = a.agg(*aggs).collect()[0]
        for c in string_cols:
            n = row[f"n__{c}"] or 0
            ratios[c] = (row[f"u__{c}"] / n) if n else 1.0
    for c in shared:
        dt = dtypes[c]
        if isinstance(dt, NumericType) and not isinstance(dt, BooleanType):
            out[c] = "numeric"
        elif isinstance(dt, StringType):
            out[c] = (
                "categorical"
                if ratios.get(c, 1.0) < unique_ratio_cutoff
                else "text"
            )
    return out


def drift_summary(
    a: DataFrame, b: DataFrame, top_categories: int = 20
) -> Dict[str, Any]:
    """Reference-parity drift report (``mcp_server.py:570-631``):
    numeric → count/mean/min/max per side; categorical → top-k count
    table per side; text → avg length per side."""
    kinds = _classify_fields(a, b)
    report: Dict[str, Any] = {
        "count_a": a.count(),
        "count_b": b.count(),
        "fields": {},
    }

    def side_aggs(df: DataFrame):
        aggs = []
        for c, kind in kinds.items():
            if kind == "numeric":
                aggs += [
                    F.count(c).alias(f"n__{c}"),
                    F.round(F.avg(c), 6).alias(f"mean__{c}"),
                    F.min(c).alias(f"min__{c}"),
                    F.max(c).alias(f"max__{c}"),
                ]
            elif kind == "text":
                aggs.append(
                    F.round(F.avg(F.length(c)), 4).alias(f"avglen__{c}")
                )
        return df.agg(*aggs).collect()[0] if aggs else None

    ra, rb = side_aggs(a), side_aggs(b)
    for c, kind in kinds.items():
        if kind == "numeric":
            report["fields"][c] = {
                "type": "numeric",
                "a": {
                    "count": ra[f"n__{c}"],
                    "mean": ra[f"mean__{c}"],
                    "min": ra[f"min__{c}"],
                    "max": ra[f"max__{c}"],
                },
                "b": {
                    "count": rb[f"n__{c}"],
                    "mean": rb[f"mean__{c}"],
                    "min": rb[f"min__{c}"],
                    "max": rb[f"max__{c}"],
                },
            }
        elif kind == "text":
            report["fields"][c] = {
                "type": "text",
                "a": {"avg_length": ra[f"avglen__{c}"]},
                "b": {"avg_length": rb[f"avglen__{c}"]},
            }
        else:
            tops = {}
            for side, df in (("a", a), ("b", b)):
                tops[side] = {
                    r[0]: r[1]
                    for r in df.groupBy(c)
                    .agg(F.count(F.lit(1)).alias("cnt"))
                    .orderBy(F.desc("cnt"), F.asc(c))
                    .limit(top_categories)
                    .collect()
                }
            report["fields"][c] = {
                "type": "categorical",
                "a": tops["a"],
                "b": tops["b"],
            }
    return report


def ks_statistic(
    a: DataFrame,
    b: DataFrame,
    col: str,
    approx_bins: Optional[int] = None,
) -> float:
    """Exact two-sample Kolmogorov–Smirnov distance, distributed.

    Plan: union both sides tagged, groupBy value (one shuffle) counting
    per-side occurrences, then a cumulative-sum window ordered by value
    and max |ECDF_a − ECDF_b|. The window is a single global ordering —
    fine up to ~millions of *distinct* values; pass ``approx_bins`` to
    quantile-bin first (bounded histogram sketch) at extreme scale.
    """
    va = a.select(F.col(col).cast("double").alias("v")).where(
        F.col("v").isNotNull()
    )
    vb = b.select(F.col(col).cast("double").alias("v")).where(
        F.col("v").isNotNull()
    )
    na, nb = va.count(), vb.count()
    if na == 0 or nb == 0:
        return 0.0

    if approx_bins:
        edges = va.unionAll(vb).approxQuantile(
            "v", [i / approx_bins for i in range(1, approx_bins)], 1e-4
        )
        edges = sorted(set(edges))
        # quantile-bin via when-chain (bounded, codegen-friendly)
        expr = F.lit(len(edges))
        for i in range(len(edges) - 1, -1, -1):
            expr = F.when(F.col("v") <= edges[i], F.lit(i)).otherwise(expr)
        va = va.select(expr.alias("v"))
        vb = vb.select(expr.alias("v"))

    tagged = va.select("v", F.lit(1).alias("__a"), F.lit(0).alias("__b")).unionAll(
        vb.select("v", F.lit(0).alias("__a"), F.lit(1).alias("__b"))
    )
    counts = tagged.groupBy("v").agg(
        F.sum("__a").alias("ca"), F.sum("__b").alias("cb")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    steps = counts.select(
        (F.sum("ca").over(w) / na).alias("Fa"),
        (F.sum("cb").over(w) / nb).alias("Fb"),
    )
    row = steps.agg(F.max(F.abs(F.col("Fa") - F.col("Fb"))).alias("D")).collect()[0]
    return float(row["D"] or 0.0)


def psi(
    a: DataFrame,
    b: DataFrame,
    col: str,
    bins: int = 10,
    epsilon: float = 1e-6,
    exact_edges: bool = False,
) -> float:
    """Population Stability Index over quantile bins of the reference
    side ``a``: PSI = Σ (pa − pb) · ln(pa / pb).

    Bin edges come from ``approxQuantile`` on ``a`` (Greenwald–Khanna
    sketch — bounded memory at any scale); bin shares are one
    conditional-agg pass per side. PSI < 0.1 stable, 0.1–0.25 moderate,
    > 0.25 major shift (industry convention).
    """
    va = a.select(F.col(col).cast("double").alias("v")).where(
        F.col("v").isNotNull()
    )
    vb = b.select(F.col(col).cast("double").alias("v")).where(
        F.col("v").isNotNull()
    )
    na, nb = va.count(), vb.count()
    if na == 0 or nb == 0:
        return 0.0
    qs = [i / bins for i in range(1, bins)]
    if exact_edges:
        # exact linear-interp percentiles (matches DuckDB quantile_cont)
        edges = sorted(
            set(
                va.agg(
                    F.percentile("v", F.lit(qs)).alias("e")
                ).collect()[0]["e"]
            )
        )
    else:
        edges = sorted(set(va.approxQuantile("v", qs, 1e-4)))

    def bin_expr():
        expr = F.lit(len(edges))
        for i in range(len(edges) - 1, -1, -1):
            expr = F.when(F.col("v") <= edges[i], F.lit(i)).otherwise(expr)
        return expr.alias("bin")

    import math

    ca = {
        r["bin"]: r["n"]
        for r in va.select(bin_expr()).groupBy("bin").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    cb = {
        r["bin"]: r["n"]
        for r in vb.select(bin_expr()).groupBy("bin").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = 0.0
    for i in range(len(edges) + 1):
        pa = max(ca.get(i, 0) / na, epsilon)
        pb = max(cb.get(i, 0) / nb, epsilon)
        total += (pa - pb) * math.log(pa / pb)
    return float(total)


def drift_report_sketch(
    a: DataFrame,
    b: DataFrame,
    numeric_cols: Sequence[str],
    compression: int = 100,
    bins: int = 10,
) -> Dict[str, Any]:
    """KS/PSI from per-partition t-digest sketches (the north_star's
    literal prescription): each side builds one mergeable digest per
    column (constant state per partition, Arrow-vectorized), and the
    statistics come from the merged digests — no exact global sort or
    second scan. Use at 10^12-row scale; ``drift_report`` computes the
    exact variants for parity-scale data."""
    from datacheck_spark.tdigest import (
        column_tdigest,
        ks_from_digests,
        psi_from_digests,
    )

    out: Dict[str, Any] = {"fields": {}, "method": "tdigest"}
    for c in numeric_cols:
        da = column_tdigest(a, c, compression)
        db = column_tdigest(b, c, compression)
        out["fields"][c] = {
            "ks": round(ks_from_digests(da, db), 6),
            "psi": round(psi_from_digests(da, db, bins=bins), 6),
            "count_a": da.total_weight,
            "count_b": db.total_weight,
        }
    return out


def drift_report(
    a: DataFrame,
    b: DataFrame,
    numeric_cols: Optional[Sequence[str]] = None,
    bins: int = 10,
    ks_approx_bins: Optional[int] = None,
) -> Dict[str, Any]:
    """Summary deltas + KS/PSI per numeric column (the north_star
    extension; summary part is reference-parity)."""
    report = drift_summary(a, b)
    kinds = {
        c: v["type"] for c, v in report["fields"].items()
    }
    cols = list(
        numeric_cols
        if numeric_cols is not None
        else [c for c, k in kinds.items() if k == "numeric"]
    )
    for c in cols:
        report["fields"].setdefault(c, {})
        report["fields"][c]["ks"] = round(
            ks_statistic(a, b, c, approx_bins=ks_approx_bins), 6
        )
        report["fields"][c]["psi"] = round(psi(a, b, c, bins=bins), 6)
    return report

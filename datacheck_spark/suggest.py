"""Rule suggestion: profile a DataFrame and propose a validation config.

Beyond-reference capability (the reference stops at schema inference,
``checker.py:590-674``): this closes the profile → enforce loop the way
large-scale DQ systems do (cf. the constraint-suggestion stage of
Deequ, Schelter et al., "Automating Large-Scale Data Quality
Verification", VLDB 2018). The suggested config round-trips through the
existing YAML compiler (:func:`datacheck_spark.rules.compiler.
ruleset_from_config` — pass ``load_builtins=False`` to enforce just the
suggestions) and carries a guarantee: every suggested rule passes on
the data it was profiled from. (The builtin dataset-level rules a
default RuleSet adds on top make no such promise — they are what
flagged the data's issues in the first place.)

Scale shape: ONE full-scan aggregation job computes every per-column
statistic (map-side partial aggregation, no shuffle beyond the final
single-row agg), plus one tiny follow-up job that ``collect_set``s ONLY
the columns whose distinct count already qualified them as enum
candidates — its state is bounded by ``enum_max_uniques`` actual
values per column. Distinct counts come from HyperLogLog sketches at
every scale; enum candidacy is confirmed EXACTLY by the follow-up's
true set size behind a generous (2×) sketch prefilter, so sketch error
can never change which enums are emitted.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType, NumericType, StringType

from datacheck_spark.rules import text as T

# a column this complete is suggested as required (presence is static
# in a fixed-schema DataFrame; this mirrors infer_schema's 95% bar)
REQUIRED_THRESHOLD = 0.95


def profile_agg_frame(df: DataFrame, approx_distinct: bool = False) -> DataFrame:
    """The single full-scan aggregation behind :func:`profile_columns`:
    one row with every per-column statistic (plan invariant in PLANS.md:
    one scan, partial+final combine, no extra shuffle)."""
    distinct = F.approx_count_distinct if approx_distinct else F.countDistinct
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    aggs: List[Any] = [F.count(F.lit(1)).alias("__total")]
    for c in df.columns:
        dt = dtypes[c]
        aggs.append(F.count(c).alias(f"nn__{c}"))
        if isinstance(dt, StringType):
            aggs += [
                F.sum(T.py_blank(F.col(c)).cast("long")).alias(f"blank__{c}"),
                F.min(F.length(c)).alias(f"lmin__{c}"),
                F.max(F.length(c)).alias(f"lmax__{c}"),
                distinct(c).alias(f"uniq__{c}"),
                # JSON-payload detection: non-null values failing to parse
                F.sum(
                    (
                        F.try_parse_json(F.col(c)).isNull()
                        & F.col(c).isNotNull()
                    ).cast("long")
                ).alias(f"nonjson__{c}"),
            ]
        elif isinstance(dt, NumericType) and not isinstance(dt, BooleanType):
            aggs += [
                F.min(c).alias(f"vmin__{c}"),
                F.max(c).alias(f"vmax__{c}"),
                distinct(c).alias(f"uniq__{c}"),
            ]
    return df.agg(*aggs)


def profile_columns(
    df: DataFrame,
    enum_max_uniques: int = 20,
    approx_distinct: Optional[bool] = None,
) -> Dict[str, Any]:
    """One-pass per-column profile powering :func:`suggest_rules`.

    Returns ``{"total": n, "columns": {col: {stats...}}}`` where string
    columns carry ``non_null, blank, len_min, len_max, distinct`` and
    numeric (non-boolean) columns carry ``non_null, min, max,
    distinct``; every other type carries ``non_null`` only.

    Job count: the sketch-mode full-scan aggregation ALWAYS runs first
    (HLL distinct — bounded state at any scale) with the row total
    riding along as ``__total``, so no separate ``df.count()`` job;
    then ONE tiny follow-up collects slice-bounded value sets for the
    HLL-prefiltered enum candidates (skipped when there are none).
    ``distinct`` in the returned stats is the HLL estimate except for
    confirmed enum columns, where it is the exact set size — enum
    candidacy itself is EXACT because the prefilter is generous (2×
    margin) and the true set size makes the decision.
    ``approx_distinct=False`` forces exact ``countDistinct`` in the
    first agg (caller accepts the Expand cost).
    """
    auto = approx_distinct is None
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    row = profile_agg_frame(
        df, approx_distinct=True if auto else approx_distinct
    ).collect()[0]
    total = row["__total"]
    out: Dict[str, Any] = {"total": total, "columns": {}}
    if total == 0:
        return out

    uniq_cols = [
        c
        for c in df.columns
        if isinstance(dtypes[c], StringType)
        or (
            isinstance(dtypes[c], NumericType)
            and not isinstance(dtypes[c], BooleanType)
        )
    ]
    uniq: Dict[str, int] = {c: row[f"uniq__{c}"] for c in uniq_cols}
    enums: Dict[str, List[str]] = {}
    # Enum candidacy is the ONLY consumer that needs exactness, and it
    # is made exact by CONFIRMATION, not by exact counting: a generous
    # HLL prefilter (2× margin — sketch error is a few %, never 2×)
    # picks candidate strings, one tiny agg collects their
    # slice-bounded value sets, and the true set size decides. This
    # skips countDistinct/collect_set over high-cardinality payload
    # columns entirely (an Expand + a 100k-string agg buffer measured
    # as the whole pipeline's hot spot); profile `distinct` for
    # non-candidates is the HLL estimate (documented).
    candidates = [
        c
        for c in uniq_cols
        if isinstance(dtypes[c], StringType)
        and 0 < (uniq[c] or 0) <= 2 * enum_max_uniques
    ]
    if candidates:
        row2 = df.agg(
            *[
                F.slice(
                    F.sort_array(F.collect_set(c)), 1, enum_max_uniques + 1
                ).alias(f"set__{c}")
                for c in candidates
            ]
        ).collect()[0]
        for c in candidates:
            vals = list(row2[f"set__{c}"])
            if 0 < len(vals) <= enum_max_uniques:
                enums[c] = vals
                uniq[c] = len(vals)  # exact for confirmed enums

    for c in df.columns:
        dt = dtypes[c]
        st: Dict[str, Any] = {"non_null": row[f"nn__{c}"]}
        if isinstance(dt, StringType):
            st["blank"] = row[f"blank__{c}"] or 0
            st["non_json"] = row[f"nonjson__{c}"] or 0
            st["len_min"] = row[f"lmin__{c}"]
            st["len_max"] = row[f"lmax__{c}"]
            st["distinct"] = uniq[c]
            if c in enums:
                st["enum_values"] = enums[c]
        elif isinstance(dt, NumericType) and not isinstance(dt, BooleanType):
            st["min"] = row[f"vmin__{c}"]
            st["max"] = row[f"vmax__{c}"]
            st["distinct"] = uniq[c]
        out["columns"][c] = st
    return out


#: keys safe to embed in a '$.key' JSONPath literal
_KEY_RE = __import__("re").compile(r"[A-Za-z0-9_]+")


def _universal_json_keys(df: DataFrame, col: str, total: int) -> List[str]:
    """Top-level keys carried (with a non-null value) by EVERY row of
    an all-JSON string column — each becomes a ``json_path``
    suggestion that provably passes (``get_json_object`` is non-null
    exactly where the parsed map value is). One explode + map-side
    partial groupBy per payload column, state bounded by the key
    cardinality; keys that can't be embedded in a ``$.key`` path
    literal are skipped."""
    kv = df.select(
        F.explode(
            F.from_json(F.col(col).cast("string"), "map<string,string>")
        ).alias("k", "v")
    )
    # filter DISTRIBUTED, collect only qualifying keys: a payload with
    # id-like keys has unbounded key cardinality, but at most
    # (shortest row's key count) keys can be universal
    rows = (
        kv.groupBy("k")
        .agg(F.sum(F.col("v").isNotNull().cast("long")).alias("nn"))
        .where(F.col("nn") == F.lit(total))
        .where(F.col("k").rlike("^[A-Za-z0-9_]+$"))
        .collect()
    )
    return sorted(r["k"] for r in rows if _KEY_RE.fullmatch(r["k"]))


def suggest_rules(
    df: DataFrame,
    enum_max_uniques: int = 20,
    required_threshold: float = REQUIRED_THRESHOLD,
    approx_distinct: Optional[bool] = None,
    name: str = "suggested",
) -> Dict[str, Any]:
    """Suggest a validation config from observed data.

    The returned dict feeds ``ruleset_from_config`` directly. Guarantee
    (tested): every suggested rule passes on the profiled ``df``. That
    constrains which checks may be emitted when nulls are present —
    the compiler fails nulls for ``non_empty``/``min_length``/``enum``
    but passes them for ``number_range``/``max_length`` — so
    null-intolerant checks are only suggested for fully-populated
    columns.

    Per column:

    - ``required`` when completeness ≥ ``required_threshold``.
    - strings: ``non_empty`` when complete and zero blanks;
      ``max_length`` = observed max (null-safe); ``min_length`` =
      observed min when complete and min ≥ 1; ``json_valid`` when
      complete and every value parses as JSON (a payload column);
      ``enum`` of the sorted observed values when complete and
      distinct ≤ ``enum_max_uniques``.
    - numerics: ``number_range`` over the observed [min, max]
      (compiler passes nulls, so safe at any completeness).
    """
    prof = profile_columns(
        df, enum_max_uniques=enum_max_uniques, approx_distinct=approx_distinct
    )
    total = prof["total"]
    rules: List[Dict[str, Any]] = []
    if total == 0:
        return {"name": name, "rules": rules}

    for c in df.columns:
        st = prof["columns"][c]
        nn = st["non_null"]
        complete = nn == total
        if nn / total >= required_threshold:
            rules.append(
                {
                    "field": c,
                    "check": "required",
                    "severity": "error",
                    "message": f"{c} must be present",
                }
            )
        if "len_min" in st and nn:  # string column with data
            if complete and st["blank"] == 0:
                rules.append(
                    {
                        "field": c,
                        "check": "non_empty",
                        "severity": "error",
                        "message": f"{c} must be non-empty",
                    }
                )
            if complete and st["len_min"] and st["len_min"] >= 1:
                rules.append(
                    {
                        "field": c,
                        "check": "min_length",
                        "value": int(st["len_min"]),
                        "severity": "warning",
                        "message": f"{c} length >= {st['len_min']}",
                    }
                )
            rules.append(
                {
                    "field": c,
                    "check": "max_length",
                    "value": int(st["len_max"]),
                    "severity": "warning",
                    "message": f"{c} length <= {st['len_max']}",
                }
            )
            if complete and st["non_json"] == 0:
                # every value parses as JSON → a payload column; the
                # compiled json_valid check fails nulls, so only
                # suggested when the column is fully populated
                rules.append(
                    {
                        "field": c,
                        "check": "json_valid",
                        "severity": "warning",
                        "message": f"{c} must be valid JSON",
                    }
                )
                for k in _universal_json_keys(df, c, total):
                    rules.append(
                        {
                            "field": c,
                            "check": "json_path",
                            "path": f"$.{k}",
                            "severity": "warning",
                            "message": f"{c} must carry {k}",
                        }
                    )
            if complete and "enum_values" in st:
                rules.append(
                    {
                        "field": c,
                        "check": "enum",
                        "values": st["enum_values"],
                        "severity": "warning",
                        "message": f"{c} in observed value set",
                    }
                )
        elif "min" in st and nn:  # numeric column with data
            rules.append(
                {
                    "field": c,
                    "check": "number_range",
                    "min": st["min"],
                    "max": st["max"],
                    "severity": "warning",
                    "message": f"{c} in [{st['min']}, {st['max']}]",
                }
            )
    return {"name": name, "rules": rules}


def suggestions_table(spark, config: Dict[str, Any]) -> DataFrame:
    """Flatten a suggested config into a DataFrame for inspection /
    the driver contract: ``(field, check, p1, p2, vals)`` where p1/p2
    carry the numeric parameter(s) and vals the comma-joined enum."""
    from pyspark.sql.types import (
        DoubleType,
        StringType as S,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("field", S()),
            StructField("check", S()),
            StructField("p1", DoubleType()),
            StructField("p2", DoubleType()),
            StructField("vals", S()),
        ]
    )
    rows = []
    for r in config["rules"]:
        p1 = p2 = vals = None
        if r["check"] in ("min_length", "max_length"):
            p1 = float(r["value"])
        elif r["check"] == "number_range":
            p1 = float(r["min"])
            p2 = float(r["max"])
        elif r["check"] == "enum":
            vals = ",".join(r["values"])
        elif r["check"] == "json_path":
            vals = r["path"]
        rows.append((r["field"], r["check"], p1, p2, vals))
    return spark.createDataFrame(rows, schema)

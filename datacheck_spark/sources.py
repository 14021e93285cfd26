"""Sources/sinks: JSONL / CSV / JSON-envelope readers, directory batch
checks, report-shaped writers.

Reference: ``_load_data`` (``checker.py:183-218``) detects format by
extension; JSON files may be a bare list or a
``{samples|responses: [...], schema: {...}}`` envelope; CSV values are
all strings (``csv.DictReader``). Directory checks rglob the supported
extensions and aggregate per-file results (``checker.py:280-365``).

Spark mapping (SURVEY §2.1): line-delimited JSON is ``spark.read.json``'s
native mode; the JSON envelope needs a multiLine read + explode; CSV
reads with ``header=True`` and *no* inferSchema to preserve the
all-strings reference semantics; directory scans use glob paths +
``input_file_name()`` so per-file aggregation is ONE job over all files
instead of a driver loop.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUPPORTED_EXTENSIONS = {".json", ".jsonl", ".csv"}  # checker.py:41


def load_data(
    spark: SparkSession, path: str
) -> Tuple[DataFrame, Dict[str, Any]]:
    """Load one data file, detecting format by extension
    (``checker.py:183-218``). Returns (df, embedded_schema)."""
    p = Path(path)
    suffix = p.suffix.lower()
    if suffix == ".jsonl":
        return spark.read.json(path), {}
    if suffix == ".csv":
        # all-string typing preserved (reference DictReader semantics)
        return spark.read.csv(path, header=True, inferSchema=False), {}
    if suffix == ".parquet":
        return spark.read.parquet(path), {}
    if suffix == ".orc":
        # columnar beyond-reference format (Spark-native, typed)
        return spark.read.orc(path), {}
    # .json: list or envelope; the envelope/schema sidecar is read on
    # the driver (it is metadata-scale, not data-scale)
    with open(path, "r", encoding="utf-8") as f:
        data = json.load(f)
    if isinstance(data, list):
        samples, schema = data, {}
    else:
        samples = data.get("samples", data.get("responses", []))
        schema = data.get("schema", {})
    df = spark.createDataFrame(samples) if samples else spark.createDataFrame(
        [], "id string"
    )
    return df, schema


def load_glob(
    spark: SparkSession,
    dir_path: str,
    patterns: Optional[List[str]] = None,
) -> DataFrame:
    """Read every supported file under a directory into one DataFrame
    tagged with ``source_file`` — the distributed replacement for the
    reference's per-file loop (``checker.py:311-324``).

    JSONL and JSON-list files go through one ``spark.read.json``; CSVs
    through one ``spark.read.csv``; the union is by column name.
    """
    root = Path(dir_path)
    files = sorted(
        f
        for pat in (patterns or [f"*{e}" for e in SUPPORTED_EXTENSIONS])
        for f in root.rglob(pat)
        if f.is_file() and f.suffix.lower() in SUPPORTED_EXTENSIONS
    )
    return load_file_list(spark, files)


def load_file_list(spark: SparkSession, files: Sequence[Path]) -> DataFrame:
    """Read an explicit list of supported files into one DataFrame
    tagged with ``source_file`` — shared by :func:`load_glob`
    (directory discovery) and :func:`check_files` (the pre-commit hook
    entry, which receives the changed files as argv)."""
    jsonl_files = [str(f) for f in files if f.suffix.lower() == ".jsonl"]
    json_files = [str(f) for f in files if f.suffix.lower() == ".json"]
    csv_files = [str(f) for f in files if f.suffix.lower() == ".csv"]
    parts: List[DataFrame] = []
    if jsonl_files:
        # PERMISSIVE keeps malformed lines in _corrupt_record so the
        # batch check can account skipped/corrupt input per file
        # (reference skips unreadable files, checker.py:351-352)
        parts.append(
            spark.read.option("multiLine", "false")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(jsonl_files)
            .withColumn("source_file", F.input_file_name())
        )
    # .json files follow the reference's _load_data semantics
    # (checker.py:183-218): full-file json.load — a bare list OR a
    # {samples|responses: [...]} envelope, possibly pretty-printed over
    # many lines. These are metadata-scale config/sample files, so the
    # driver-side parse load_data already does is the right tool; an
    # unparseable file is skipped (reference checker.py:351-352), which
    # we surface as one corrupt "record" for the skip accounting.
    for jf in json_files:
        # Tag with the RESOLVED absolute path: spark-read files get an
        # absolute file: URI from input_file_name(), and the batch-check
        # keying resolves tags back against cwd-resolved given paths —
        # a relative tag (the pre-commit case: hooks pass repo-relative
        # argv) would fall back to the basename and let two staged
        # .json files with the same basename collide in file_results.
        jf_abs = str(Path(jf).resolve())
        try:
            jdf, _schema = load_data(spark, jf)
        except Exception as exc:  # json.load failure → skipped file
            parts.append(
                spark.createDataFrame(
                    [(str(exc)[:200], f"file:{jf_abs}")],
                    "_corrupt_record string, source_file string",
                )
            )
            continue
        parts.append(
            jdf.withColumn("source_file", F.lit(f"file:{jf_abs}"))
        )
    if csv_files:
        parts.append(
            spark.read.csv(csv_files, header=True, inferSchema=False)
            .withColumn("source_file", F.input_file_name())
        )
    if not parts:
        return spark.createDataFrame([], "source_file string")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def split_patterns(pattern: Optional[str]) -> Optional[List[str]]:
    """Comma-separated ``--pattern`` string → glob list (None passes
    through, meaning the default extension set)."""
    if not pattern:
        return None
    return [s.strip() for s in pattern.split(",") if s.strip()] or None


def check_directory(
    spark: SparkSession,
    dir_path: str,
    engine=None,
    patterns: Optional[List[str]] = None,
) -> Dict[str, Any]:
    """Batch directory check (``checker.py:280-365``): per-file
    pass/fail aggregation via ONE fused pass + groupBy(source_file) —
    not a file loop.

    Returns the BatchCheckResult shape: per-file totals, overall pass
    rate, passed_files (= files with zero ERROR failures), skipped
    files (unreadable)."""
    from datacheck_spark.engine import ValidationEngine, HAS_ERROR

    engine = engine or ValidationEngine()
    root = Path(dir_path)

    def _rel(source_file: str) -> str:
        # input_file_name() yields file: URIs; driver-tagged rows use
        # a plain "file:<path>" prefix. Key results by the path
        # RELATIVE to dir_path (reference keys the same way,
        # checker.py:311-324) so same-named files in different
        # subdirectories stay distinct.
        p = source_file
        for prefix in ("file://", "file:"):
            if p.startswith(prefix):
                p = p[len(prefix):]
                break
        p = "/" + p.lstrip("/")
        try:
            return str(Path(p).relative_to(root.resolve()))
        except ValueError:
            return Path(p).name
    if not root.is_dir():
        return {"success": False, "error": f"not a directory: {dir_path}"}

    df = load_glob(spark, dir_path, patterns)
    return _batch_check(df, _rel, engine, extra={"directory": str(root)})


def check_files(
    spark: SparkSession,
    paths: Sequence[str],
    engine=None,
) -> Dict[str, Any]:
    """Batch check over an EXPLICIT file list — the pre-commit hook
    entrypoint (matched changed files arrive as argv; mirrors the
    reference's ``.pre-commit-hooks.yaml:1-6`` hook surface). Same
    fused one-pass aggregation as :func:`check_directory`, with results
    keyed by the paths exactly as given."""
    from datacheck_spark.engine import ValidationEngine

    engine = engine or ValidationEngine()
    files = [Path(p) for p in paths]
    unsupported = [
        str(f) for f in files
        if f.suffix.lower() not in SUPPORTED_EXTENSIONS or not f.is_file()
    ]
    supported = [
        f for f in files
        if f.suffix.lower() in SUPPORTED_EXTENSIONS and f.is_file()
    ]
    given = {str(f.resolve()): str(p) for f, p in zip(files, paths)}

    def _key(source_file: str) -> str:
        p = source_file
        for prefix in ("file://", "file:"):
            if p.startswith(prefix):
                p = p[len(prefix):]
                break
        p = "/" + p.lstrip("/")
        return given.get(str(Path(p).resolve()), Path(p).name)

    df = load_file_list(spark, supported)
    out = _batch_check(
        df, _key, engine,
        extra={"files": [str(p) for p in paths]},
        skipped=[f"{u}: unsupported or missing" for u in unsupported],
    )
    return out


def _batch_check(
    df: DataFrame,
    rel_fn,
    engine,
    extra: Optional[Dict[str, Any]] = None,
    skipped: Optional[List[str]] = None,
) -> Dict[str, Any]:
    """Shared fused batch aggregation over a ``source_file``-tagged
    frame: ONE rule pass + groupBy(source_file) — not a file loop."""
    from datacheck_spark.engine import HAS_ERROR

    _rel = rel_fn
    skipped = list(skipped or [])
    if "source_file" not in df.columns or not df.columns:
        return {
            "success": True,
            "total_files": 0,
            "overall_pass_rate": 1.0,
            "file_results": {},
            "skipped_files": skipped,
            **(extra or {}),
        }

    if "_corrupt_record" in df.columns:
        # Spark disallows querying only the corrupt-record column from a
        # raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache first
        # as the docs prescribe
        df = df.cache()
        corrupt_per_file = {
            _rel(r["source_file"]): r["n"]
            for r in df.where(F.col("_corrupt_record").isNotNull())
            .groupBy("source_file")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        skipped += [f"{name}: {n} corrupt records" for name, n in sorted(corrupt_per_file.items())]
        df = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")

    from datacheck_spark.rules.compiler import Severity
    from datacheck_spark.engine import RULE_PREFIX

    rules = engine.compile(df)
    annotated = engine.annotate(df, rules=rules)

    def _fail_count(severity) -> F.Column:
        fails = [
            (~F.col(RULE_PREFIX + r.rule_id)).cast("int")
            for r in rules
            if r.severity == severity
        ]
        return sum(fails[1:], fails[0]) if fails else F.lit(0)

    per_file = (
        annotated.groupBy("source_file")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum((~F.col(HAS_ERROR)).cast("long")).alias("passed"),
            F.sum(_fail_count(Severity.ERROR)).alias("errors"),
            F.sum(_fail_count(Severity.WARNING)).alias("warnings"),
        )
        .orderBy("source_file")
        .collect()
    )
    file_results = {}
    total = passed = errors = warnings = 0
    for r in per_file:
        name = _rel(r["source_file"])
        file_results[name] = {
            "total_samples": r["total"],
            "passed_samples": r["passed"],
            "failed_samples": r["total"] - r["passed"],
            "pass_rate": round(r["passed"] / r["total"], 4) if r["total"] else 1.0,
            "error_count": int(r["errors"] or 0),
            "warning_count": int(r["warnings"] or 0),
        }
        total += r["total"]
        passed += r["passed"]
        errors += int(r["errors"] or 0)
        warnings += int(r["warnings"] or 0)
    return {
        "success": True,
        **(extra or {}),
        "total_files": len(file_results),
        "file_results": file_results,
        "total_samples": total,
        "total_passed_samples": passed,
        "total_failed_samples": total - passed,
        "overall_pass_rate": round(passed / total, 4) if total else 1.0,
        "total_error_count": errors,
        "total_warning_count": warnings,
        "passed_files": sum(
            1 for fr in file_results.values() if fr["failed_samples"] == 0
        ),
        "skipped_files": skipped,
    }


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSONL sink (``fixer.py:112-117``); at scale prefer
    ``df.write.parquet`` / Iceberg append."""
    df.write.mode("overwrite").json(path)


def sample_deterministic(
    df: DataFrame,
    id_col: str,
    rate: float,
    seed: int = 42,
) -> DataFrame:
    """Deterministic hash-threshold sampling: keep rows where
    ``md5(seed || id)`` (first 8 hex digits as an integer) falls under
    ``rate`` of the 32-bit space.

    Unlike ``orderBy(rand).limit`` this is shuffle-free, stable across
    runs/engines (md5 is portable — the DuckDB oracle reproduces the
    exact row set), and composable at 10^12 rows: the predicate pushes
    into the scan and every executor decides membership locally."""
    threshold = int(rate * 0xFFFFFFFF)
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(seed) + ":"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return df.where(bucket <= threshold)


def stratified_sample_deterministic(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: Dict[str, float],
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling (training-data rebalancing:
    e.g. downsample web text, keep all code). Same md5-threshold scheme
    as :func:`sample_deterministic`, with the threshold chosen per
    ``strata_col`` value — shuffle-free, portable, and the strata
    mapping is a broadcast-sized CASE expression."""
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(seed) + ":"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    thr = None
    for value, rate in rates.items():
        t = int(rate * 0xFFFFFFFF)
        cond = F.col(strata_col) == value
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = (
        thr.otherwise(int(default_rate * 0xFFFFFFFF))
        if thr is not None
        else F.lit(int(default_rate * 0xFFFFFFFF))
    )
    return df.where(bucket <= thr)


def sample_df(
    df: DataFrame,
    sample_count: Optional[int] = None,
    sample_rate: Optional[float] = None,
    seed: int = 42,
) -> Tuple[DataFrame, bool]:
    """Seeded sampling (``checker.py:255-264``; the reference is
    unseeded — we seed for reproducibility). Exact-N uses
    ``orderBy(rand).limit`` (one shuffle); rate uses ``df.sample``
    (no shuffle)."""
    if sample_count is not None:
        n = df.count()
        if sample_count < n:
            return (
                df.orderBy(F.rand(seed)).limit(sample_count),
                True,
            )
        return df, False
    if sample_rate is not None and 0 < sample_rate < 1.0:
        return df.sample(fraction=sample_rate, seed=seed), True
    return df, False

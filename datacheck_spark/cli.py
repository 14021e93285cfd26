"""spark-submit CLI: check / fix / infer / drift / contribute / bench.

Reference CLI surface: ``/root/reference/src/datacheck/cli.py`` (click
commands check/validate/compare/rules/infer/fix/contribute/diff/watch).
Here a stdlib-argparse entrypoint suitable for
``spark-submit --py-files datacheck_spark.zip cli.py check ...``.
Exit codes follow the reference gate (``cli.py:42-43,169-175``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional

# allow running as a plain script (spark-submit cli.py ...): the package
# root is this file's parent's parent
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark(app: str, master: Optional[str] = None):
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName(app)
    if master:
        b = b.master(master)
    return (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def cmd_check(args) -> int:
    from datacheck_spark import sources as SRC
    from datacheck_spark.engine import ValidationEngine
    from datacheck_spark.rules.compiler import (
        RuleSet,
        get_annotation_ruleset,
        get_preference_ruleset,
        get_sft_ruleset,
        ruleset_from_yaml,
    )
    from datacheck_spark.report import gate, save_report, to_markdown
    from datacheck_spark.schema import ValidationSchema

    spark = _spark("datacheck-check", args.master)
    if args.rules_file:
        ruleset = ruleset_from_yaml(args.rules_file)
    elif args.ruleset == "sft":
        ruleset = get_sft_ruleset()
    elif args.ruleset == "preference":
        ruleset = get_preference_ruleset()
    elif args.ruleset == "annotation":
        ruleset = get_annotation_ruleset()
    else:
        # "llm" = builtin rules + the llm_quality judge rule merged in
        # after the fused pass (reference rules.py:478-498); "default"
        # = builtins only
        ruleset = RuleSet()

    schema = ValidationSchema()
    if args.schema:
        with open(args.schema, "r", encoding="utf-8") as f:
            schema = ValidationSchema.from_dict(json.load(f))

    from pathlib import Path

    engine = ValidationEngine(ruleset=ruleset, schema=schema)
    paths = list(args.data) if isinstance(args.data, list) else [args.data]
    args.data = paths[0]
    p = Path(args.data)
    if len(paths) > 1 or p.is_dir():
        if len(paths) > 1:
            # pre-commit hook surface: explicit changed-file list.
            # Flags that only apply to directory discovery or
            # single-file checking are NOT silently dropped here.
            ignored = [
                flag
                for flag, val in (
                    ("--pattern", args.pattern),
                    ("--sample", args.sample),
                    ("--sample-rate", args.sample_rate),
                )
                if val is not None
            ]
            if ignored:
                print(
                    "warning: "
                    + ", ".join(ignored)
                    + " ignored when an explicit file list is given",
                    file=sys.stderr,
                )
            out = SRC.check_files(spark, paths, engine=engine)
        else:
            out = SRC.check_directory(
                spark,
                args.data,
                engine=engine,
                patterns=SRC.split_patterns(args.pattern),
            )
        from datacheck_spark.report import (
            batch_to_html,
            batch_to_markdown,
            save_batch_report,
        )

        if args.output:
            save_batch_report(out, args.output, fmt=args.format)
        if args.format == "json":
            print(json.dumps(out, indent=2, ensure_ascii=False))
        elif args.format == "html":
            print(batch_to_html(out))
        else:
            print(batch_to_markdown(out))
        # reference exit semantics (cli.py:109-116): strict fails on any
        # error/warning; otherwise EVERY file must clear the threshold
        if args.strict and (
            out.get("total_error_count", 0) > 0
            or out.get("total_warning_count", 0) > 0
        ):
            return 1
        if any(
            fr["pass_rate"] < args.threshold
            for fr in out.get("file_results", {}).values()
        ):
            return 1
        return 0

    if p.suffix.lower() == ".parquet" or args.input_format == "parquet":
        df = spark.read.parquet(args.data)
        embedded = {}
    else:
        df, embedded = SRC.load_data(spark, args.data)
    if embedded and not args.schema:
        schema = ValidationSchema.from_dict(embedded)
        engine = ValidationEngine(ruleset=ruleset, schema=schema)

    df, sampled = SRC.sample_df(df, args.sample, args.sample_rate)
    result = engine.check(df)
    result.sampled = sampled
    if args.ruleset == "llm" and not args.rules_file:
        # reference get_llm_ruleset: builtin rules + an INFO-severity
        # LLM judge scoring instruction/response (min overall 3).
        # Provider defaults to the deterministic offline mock; set
        # DATACHECK_LLM_PROVIDER=anthropic|openai for real judging.
        from pyspark.sql import functions as F

        from datacheck_spark.llm_rules import with_llm_quality

        idc = "id" if "id" in df.columns else "__llm_id"
        d2 = df
        if idc not in d2.columns:
            d2 = d2.withColumn(
                idc, F.monotonically_increasing_id().cast("string")
            )
        for c in ("instruction", "response"):
            if c not in d2.columns:
                d2 = d2.withColumn(c, F.lit(""))
        judged = with_llm_quality(
            d2,
            idc,
            provider=os.environ.get("DATACHECK_LLM_PROVIDER", "mock"),
            model=os.environ.get("DATACHECK_LLM_MODEL"),
        ).persist()  # two actions below: judge each row ONCE
        agg = judged.agg(
            F.count("*").alias("n"),
            F.sum((~F.col("llm_quality_passed")).cast("long")).alias("f"),
        ).collect()[0]
        failed = int(agg["f"] or 0)
        result.rule_results["llm_quality"] = {
            "name": "LLM quality judge",
            "passed": int(agg["n"]) - failed,
            "failed": failed,
            "severity": "info",
            "failed_samples": [
                str(r[idc])
                for r in judged.where(~F.col("llm_quality_passed"))
                .select(idc)
                .limit(10)
                .collect()
            ],
        }
        result.info_count += failed
        judged.unpersist()
    if args.output:
        # explicit -f wins over the output extension; without -f the
        # extension picks the saved format (save_report fallback)
        save_report(result, args.output, fmt=args.format)
    if args.format == "json":
        from datacheck_spark.report import to_json_report

        print(json.dumps(to_json_report(result), indent=2, ensure_ascii=False))
    elif args.format == "html":
        from datacheck_spark.report import to_html

        print(to_html(result))
    else:
        print(to_markdown(result))
    return gate(result, threshold=args.threshold, strict=args.strict)


def cmd_validate(args) -> int:
    """Validate data against a DataRecipe analysis directory
    (reference ``cli.py:178-236``): schema from the analysis dir,
    default data resolution (synthetic → samples), report written into
    ``12_质检报告/``, threshold/strict gating."""
    from pathlib import Path

    from datacheck_spark.datarecipe import (
        REPORT_SUBDIR,
        check_from_datarecipe,
    )
    from datacheck_spark.report import gate, save_report, to_markdown

    spark = _spark("datacheck-validate", args.master)
    print(f"validating {args.analysis_dir}...")
    result = check_from_datarecipe(spark, args.analysis_dir, args.data)
    if not result.success:
        print(f"validation failed: {result.error}", file=sys.stderr)
        return 1

    output = args.output
    if output is None:
        out_dir = Path(args.analysis_dir) / REPORT_SUBDIR
        out_dir.mkdir(exist_ok=True)
        ext = {"markdown": "md", "json": "json", "html": "html"}[args.format]
        output = str(out_dir / f"quality_report.{ext}")
    save_report(result, output, args.format, title="数据验证报告")
    print(f"report saved: {output}")
    print(to_markdown(result, title="数据验证报告"))
    return gate(result, threshold=args.threshold, strict=args.strict)


def cmd_fix(args) -> int:
    from datacheck_spark import sources as SRC
    from datacheck_spark.fixer import DataFixer

    spark = _spark("datacheck-fix", args.master)
    df, _ = SRC.load_data(spark, args.data)
    fixed, res = DataFixer().fix(
        df,
        dedup=not args.no_dedup,
        trim=not args.no_trim,
        remove_empty=not args.no_remove_empty,
        strip_pii=args.strip_pii,
        near_dedup=args.near_dedup,
        near_threshold=args.near_threshold,
    )
    SRC.write_jsonl(fixed, args.output)
    print(json.dumps(res.__dict__, ensure_ascii=False))
    return 0


def cmd_infer(args) -> int:
    from datacheck_spark import sources as SRC
    from datacheck_spark.stats import infer_schema

    spark = _spark("datacheck-infer", args.master)
    df, _ = SRC.load_data(spark, args.data)
    schema = infer_schema(df)
    out = json.dumps(schema, indent=2, ensure_ascii=False, default=str)
    if args.output:
        from pathlib import Path

        Path(args.output).write_text(out, encoding="utf-8")
    print(out)
    return 0


def cmd_suggest(args) -> int:
    """Profile data and propose a validation config (suggest.py); the
    output round-trips through ``ruleset_from_config`` / `check -r`."""
    from datacheck_spark import sources as SRC
    from datacheck_spark.suggest import suggest_rules

    spark = _spark("datacheck-suggest", args.master)
    df, _ = SRC.load_data(spark, args.data)
    cfg = suggest_rules(
        df,
        enum_max_uniques=args.enum_max,
        required_threshold=args.required_threshold,
    )
    if args.format == "yaml":
        import yaml

        out = yaml.safe_dump(cfg, sort_keys=False, allow_unicode=True)
    else:
        out = json.dumps(cfg, indent=2, ensure_ascii=False)
    if args.output:
        from pathlib import Path

        Path(args.output).write_text(out, encoding="utf-8")
    print(out)
    return 0


def cmd_drift(args) -> int:
    from datacheck_spark.drift import drift_report

    spark = _spark("datacheck-drift", args.master)
    a = spark.read.parquet(args.data_a)
    b = spark.read.parquet(args.data_b)
    rep = drift_report(a, b)
    print(json.dumps(rep, indent=2, ensure_ascii=False, default=str))
    return 0


def cmd_transcripts(args) -> int:
    """Full transcript validation over a parquet/Iceberg table with
    optional checkpoint/resume — the production flagship job."""
    from datacheck_spark.transcripts import TranscriptChecker
    from datacheck_spark.checkpoint import checkpointed_violations

    spark = _spark("datacheck-transcripts", args.master)
    checker = TranscriptChecker()
    if args.incremental:
        # validate only files appended since the last manifest; the
        # full-table report is exactly what incremental mode avoids
        from datacheck_spark.incremental import IncrementalValidator

        if not args.checkpoint:
            print("--incremental requires --checkpoint <dir>")
            return 2
        iv = IncrementalValidator(
            args.checkpoint, rule_version=args.rule_version, checker=checker
        )
        out = iv.run(spark, args.data)
        out["trend"] = iv.batch_trend()
        print(json.dumps(out, ensure_ascii=False))
        # gate on THIS run's appends only (historical flags stay
        # visible in trend but don't re-fail): z-degradation vs the
        # quality history when ≥2 prior batches exist, plus the same
        # absolute pass-rate floor the report path uses (--threshold;
        # error_row_rate counts distinct error-severity rows, the unit
        # report pass_rate is defined in — warnings don't gate)
        fresh = set(out["batches_written"])
        return 1 if any(
            t["flagged"] or (1.0 - t["error_row_rate"]) < args.threshold
            for t in out["trend"]
            if t["batch"] in fresh
        ) else 0
    df = spark.read.parquet(args.data)
    if args.checkpoint:
        state = checkpointed_violations(
            df,
            checker,
            args.checkpoint,
            rule_version=args.rule_version,
            n_buckets=args.buckets,
        )
        print(
            json.dumps(
                {"completed_buckets": state.completed}, ensure_ascii=False
            )
        )
    report = checker.run(df)
    out = {
        "total_turns": report.total_turns,
        "pass_rate": round(report.pass_rate, 4),
        "error_count": report.error_count,
        "warning_count": report.warning_count,
        "duplicate_keys": report.duplicate_keys,
        "orphan_tools": report.orphan_tools,
        "anomaly_count": report.anomaly_count,
    }
    if args.structure:
        from pyspark.sql import functions as F

        from datacheck_spark.transcripts import conversation_structure

        sdf = conversation_structure(df)
        row = sdf.agg(
            F.count(F.lit(1)).alias("conversations"),
            F.sum((~F.col("conv_pass")).cast("long")).alias("failing"),
            F.sum((~F.col("contiguous")).cast("long")).alias(
                "non_contiguous"
            ),
            F.sum((~F.col("roles_alternate")).cast("long")).alias(
                "role_repeats"
            ),
            F.sum((~F.col("ts_monotonic")).cast("long")).alias(
                "ts_regressions"
            ),
        ).collect()[0]
        out["structure"] = row.asDict()
    if getattr(args, "conv_dedup", False):
        from pyspark.sql import functions as F

        from datacheck_spark.transcripts import conversation_duplicates

        drow = conversation_duplicates(df).agg(
            F.count(F.lit(1)).alias("duplicate_groups"),
            F.coalesce(F.sum("n_convs"), F.lit(0)).alias(
                "duplicate_conversations"
            ),
        ).collect()[0]
        out["conversation_dedup"] = {
            "duplicate_groups": int(drow["duplicate_groups"]),
            "duplicate_conversations": int(
                drow["duplicate_conversations"]
            ),
        }
    if getattr(args, "daily_verdicts", False):
        from datacheck_spark.transcripts import per_day_verdicts

        # bounded output: one row per distinct ts day (~10^3 at any
        # scale); verdict threshold follows --threshold when gating is
        # requested, else the 0.95 scoreboard default
        thr = args.threshold if args.threshold > 0 else 0.95
        out["daily_verdicts"] = [
            {**r.asDict(), "ts_day": str(r["ts_day"])}
            for r in per_day_verdicts(
                checker.annotated(df), threshold=thr
            ).orderBy("ts_day").collect()
        ]
    print(json.dumps(out, ensure_ascii=False))
    return 0 if report.pass_rate >= args.threshold else 1


def cmd_skew(args) -> int:
    """Pre-shuffle skew diagnosis: hot keys + salt fan-outs + physical
    partition balance for a candidate groupBy/join key (skew.py)."""
    from datacheck_spark import sources as SRC
    from datacheck_spark.skew import diagnose_key_skew, partition_profile

    spark = _spark("datacheck-skew", args.master)
    df, _ = SRC.load_data(spark, args.data)
    out = {
        "key_skew": diagnose_key_skew(
            df,
            [c.strip() for c in args.keys.split(",") if c.strip()],
            top_k=args.top_k,
            salt_threshold=args.salt_threshold,
        ).to_dict(),
        "partition_profile": partition_profile(df),
    }
    print(json.dumps(out, indent=2, ensure_ascii=False, default=str))
    return 0


def cmd_pack(args) -> int:
    """Sequence packing: assign concat-and-chunk pack ids by token
    budget (packing.py) and optionally write the packed table."""
    from pyspark.sql import functions as F

    from datacheck_spark import sources as SRC
    from datacheck_spark.packing import assign_packs, pack_stats

    spark = _spark("datacheck-pack", args.master)
    if args.data.endswith(".parquet"):
        df = spark.read.parquet(args.data)
    else:
        df, _ = SRC.load_data(spark, args.data)
    packed = assign_packs(
        df, args.token_col, budget=args.budget, order_col=args.order_col
    )
    if args.output:
        packed.write.mode("overwrite").parquet(args.output)
    stats = pack_stats(packed, args.token_col)
    n_packs, n_docs, tokens = stats.agg(
        F.count(F.lit(1)), F.sum("n_docs"), F.sum("tokens")
    ).collect()[0]
    print(
        json.dumps(
            {
                "packs": int(n_packs or 0),
                "documents": int(n_docs or 0),
                "tokens": int(tokens or 0),
                "budget": args.budget,
                "output": args.output,
            },
            ensure_ascii=False,
        )
    )
    return 0


def cmd_rules(args) -> int:
    """List the rules of a ruleset (reference ``cli.py`` rules cmd)."""
    from datacheck_spark.rules.compiler import (
        RuleSet,
        get_annotation_ruleset,
        get_preference_ruleset,
        get_sft_ruleset,
        ruleset_from_yaml,
    )

    if args.rules_file:
        rs = ruleset_from_yaml(args.rules_file)
    else:
        rs = {
            "sft": get_sft_ruleset,
            "preference": get_preference_ruleset,
            "annotation": get_annotation_ruleset,
        }.get(args.ruleset, RuleSet)()
    for rd in rs.rules.values():
        state = "on " if rd.enabled else "off"
        print(f"[{state}] {rd.severity.value:8} {rd.rule_id}: {rd.name}")
    return 0


def cmd_diff(args) -> int:
    """Diff two saved JSON reports (reference ``report.py:545-633``)."""
    from datacheck_spark.report import diff_reports

    with open(args.report_a, "r", encoding="utf-8") as f:
        a = json.load(f)
    with open(args.report_b, "r", encoding="utf-8") as f:
        b = json.load(f)
    print(diff_reports(a, b))
    return 0


def cmd_compare(args) -> int:
    """Distribution comparison across N data files (reference
    ``cli.py:236-313``): per-file sample counts + per-field
    length/value stats in a markdown report; with exactly two files
    the field-delta comparison (op 28) is appended as JSON."""
    from pathlib import Path

    from datacheck_spark.stats import (
        compare_distributions,
        per_file_distributions,
    )

    if len(args.files) < 2:
        print("error: need at least 2 files")
        return 1
    spark = _spark("datacheck-compare", args.master)
    frames, dists = per_file_distributions(spark, args.files)

    lines = ["# Distribution comparison", "", "## Files", "",
             "| file | samples |", "|------|---------|"]
    for d in dists:
        lines.append(f"| {Path(d['file']).name} | {d['sample_count']} |")
    lines += ["", "## Fields", ""]
    fields = sorted(
        {
            k
            for d in dists
            for k in d["distribution"].get("fields", {}).keys()
        }
    )
    for field in fields:
        lines.append(f"### {field}")
        lines.append("")
        for d in dists:
            fd = d["distribution"].get("fields", {}).get(field, {})
            name = Path(d["file"]).name
            if "length_stats" in fd:
                st = fd["length_stats"]
                lines.append(
                    f"- **{name}**: length {st['min']}-{st['max']}"
                    f" (avg {st['avg']:.0f})"
                )
            elif "value_stats" in fd:
                st = fd["value_stats"]
                lines.append(
                    f"- **{name}**: value {st['min']}-{st['max']}"
                    f" (avg {st['avg']:.1f})"
                )
        lines.append("")
    report = "\n".join(lines)
    if args.output:
        Path(args.output).write_text(report, encoding="utf-8")
        print(f"saved: {args.output}")
    else:
        print(report)
    if len(frames) == 2:
        comparison = compare_distributions(frames[0], frames[1])
        print(json.dumps(comparison, ensure_ascii=False, indent=2, default=str))
    return 0


def cmd_stream(args) -> int:
    """Continuous validation of arriving files — the Spark-first
    successor of the reference's watch mode (``cli.py:500-598``, a
    debounced re-run loop): readStream → fused rules → violations sink
    + console pass-rate windows."""
    from datacheck_spark import streaming as ST

    spark = _spark("datacheck-stream", args.master)
    schema = spark.read.parquet(args.data).schema \
        if args.format == "parquet" else None
    if schema is None:
        import json as _json

        with open(args.schema_file, "r", encoding="utf-8") as f:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(_json.load(f))
    annotated = ST.stream_validate(spark, args.data, schema, fmt=args.format)
    q = ST.start_violations_sink(
        annotated,
        args.key_cols.split(","),
        args.output,
        args.checkpoint,
        trigger_seconds=args.trigger_seconds,
    )
    print(f"streaming validation started: {q.id}; writing {args.output}")
    q.awaitTermination(args.timeout if args.timeout > 0 else None)
    return 0


def cmd_contribute(args) -> int:
    """Quality-check + contribution weighting (reference
    ``cli.py:403-461``): annotation responses → annotation-ruleset
    check → weight = base × quality × time × scarcity → JSON record."""
    from pathlib import Path

    from datacheck_spark import sources as SRC
    from datacheck_spark.contribute import (
        calculate_contributions,
        contribution_summary,
    )
    from datacheck_spark.schema import ValidationSchema

    spark = _spark("datacheck-contribute", args.master)
    p = Path(args.responses)
    if p.suffix.lower() == ".parquet":
        df, embedded = spark.read.parquet(args.responses), {}
    else:
        df, embedded = SRC.load_data(spark, args.responses)
    schema = ValidationSchema()
    if args.schema:
        with open(args.schema, "r", encoding="utf-8") as f:
            schema = ValidationSchema.from_dict(json.load(f))
    elif embedded:
        schema = ValidationSchema.from_dict(embedded)

    contribs = calculate_contributions(
        df, schema=schema, dataset_created_at=args.created_at
    )
    summary = contribution_summary(contribs)
    # bounded collect: contribution records are per-annotation rows; cap
    # the JSON payload (full rows belong in a table sink at scale)
    records = [
        {
            "annotator_id": args.annotator,
            "contrib_type": r["contrib_type"],
            "base": r["base"],
            "quality_multiplier": r["quality_mult"],
            "time_multiplier": r["time_mult"],
            "scarcity_multiplier": r["scarcity_mult"],
            "weight": r["weight"],
            "passed": r["passed"],
        }
        for r in contribs.limit(args.limit).collect()
    ]
    out = {**summary, "annotator_id": args.annotator, "contributions": records}
    payload = json.dumps(out, indent=2, ensure_ascii=False)
    if args.output:
        Path(args.output).parent.mkdir(parents=True, exist_ok=True)
        with open(args.output, "w", encoding="utf-8") as f:
            f.write(payload)
        print(f"saved: {args.output}")
    else:
        print(payload)
    print(
        f"total={summary['total_responses']} passed="
        f"{summary['passed_responses']} total_weight={summary['total_weight']}"
    )
    return 0


def cmd_watch(args) -> int:
    """Debounced re-check on file change (reference ``cli.py:500-598``).

    The reference uses watchdog; this container has no inotify
    dependency, so the watcher polls mtimes of supported files — the
    debounce/re-run semantics are the same. For continuous production
    validation prefer ``stream`` (Structured Streaming, exactly-once
    sink); watch is the interactive dev loop."""
    import time
    from pathlib import Path

    from datacheck_spark import sources as SRC
    from datacheck_spark.engine import ValidationEngine
    from datacheck_spark.rules.compiler import (
        RuleSet,
        get_annotation_ruleset,
        get_preference_ruleset,
        get_sft_ruleset,
    )

    from datacheck_spark.schema import ValidationSchema

    spark = _spark("datacheck-watch", args.master)
    ruleset = {
        "sft": get_sft_ruleset,
        "preference": get_preference_ruleset,
        "annotation": get_annotation_ruleset,
    }.get(args.ruleset, RuleSet)()
    if args.ruleset == "llm":
        # the dev loop re-checks on every save; run the builtin rules
        # here and point at `check --ruleset llm` for judged runs
        print("watch: using builtin rules; run `check --ruleset llm` for LLM judging")
    schema = ValidationSchema()
    if getattr(args, "schema", None):
        with open(args.schema, "r", encoding="utf-8") as f:
            schema = ValidationSchema.from_dict(json.load(f))
    engine = ValidationEngine(ruleset=ruleset, schema=schema)
    path = Path(args.data)

    def snapshot():
        if path.is_dir():
            return {
                str(f): f.stat().st_mtime
                for f in sorted(path.rglob("*"))
                if f.is_file()
                and f.suffix.lower() in SRC.SUPPORTED_EXTENSIONS
            }
        return {str(path): path.stat().st_mtime if path.exists() else 0}

    def run_check():
        try:
            if path.is_dir():
                out = SRC.check_directory(spark, str(path), engine=engine)
                print(
                    f"checked {out.get('total_files', 0)} files: "
                    f"pass_rate={out.get('overall_pass_rate')}"
                )
            else:
                df, _ = SRC.load_data(spark, str(path))
                res = engine.check(df)
                print(
                    f"checked {res.total_samples} samples: "
                    f"pass_rate={res.pass_rate:.4f}"
                )
        except Exception as exc:  # keep watching on bad intermediate files
            print(f"check error: {exc}")

    print(f"watching {args.data} (debounce {args.debounce}s)")
    run_check()
    seen = snapshot()
    iterations = 0
    deadline = time.time() + args.timeout if args.timeout > 0 else None
    while True:
        if deadline and time.time() >= deadline:
            return 0
        if args.max_checks and iterations >= args.max_checks:
            return 0
        time.sleep(args.debounce)
        cur = snapshot()
        if cur != seen:
            # debounce: wait for the tree to settle before re-checking
            while True:
                time.sleep(args.debounce)
                nxt = snapshot()
                if nxt == cur:
                    break
                cur = nxt
            seen = cur
            run_check()
            iterations += 1


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="datacheck-spark")
    ap.add_argument("--master", default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("check")
    # nargs="+": pre-commit passes every matched changed file as argv
    # (one invocation, N files) — a single path keeps the original
    # file-or-directory semantics
    c.add_argument("data", nargs="+")
    c.add_argument("--ruleset", default="default")
    c.add_argument("--rules-file")
    c.add_argument("-s", "--schema")
    # None = markdown on stdout, extension-detected on -o saves;
    # explicit -f wins over the output extension (reference default is
    # always-markdown — extension detection is the friendlier superset)
    c.add_argument(
        "-f", "--format",
        choices=("markdown", "json", "html"), default=None,
    )
    c.add_argument("--input-format", default=None)
    c.add_argument("--threshold", type=float, default=0.5)
    c.add_argument("--strict", action="store_true")
    c.add_argument("--sample", type=int, default=None)
    c.add_argument("--sample-rate", type=float, default=None)
    c.add_argument("--pattern", default=None)
    c.add_argument("-o", "--output")
    c.set_defaults(fn=cmd_check)

    v = sub.add_parser("validate")
    v.add_argument("analysis_dir")
    v.add_argument("-d", "--data", default=None)
    v.add_argument("-o", "--output", default=None)
    v.add_argument(
        "-f",
        "--format",
        choices=["markdown", "json", "html"],
        default="markdown",
    )
    v.add_argument("--threshold", type=float, default=0.5)
    v.add_argument("--strict", action="store_true")
    v.set_defaults(fn=cmd_validate)

    f = sub.add_parser("fix")
    f.add_argument("data")
    f.add_argument("-o", "--output", required=True)
    f.add_argument("--no-dedup", action="store_true")
    f.add_argument("--no-trim", action="store_true")
    f.add_argument("--no-remove-empty", action="store_true")
    f.add_argument("--strip-pii", action="store_true")
    f.add_argument("--near-dedup", action="store_true")
    f.add_argument("--near-threshold", type=float, default=0.8)
    f.set_defaults(fn=cmd_fix)

    i = sub.add_parser("infer")
    i.add_argument("data")
    i.add_argument("-o", "--output")
    i.set_defaults(fn=cmd_infer)

    d = sub.add_parser("drift")
    d.add_argument("data_a")
    d.add_argument("data_b")
    d.set_defaults(fn=cmd_drift)

    sg = sub.add_parser("suggest")
    sg.add_argument("data")
    sg.add_argument("-o", "--output")
    sg.add_argument("--format", choices=("yaml", "json"), default="yaml")
    sg.add_argument("--enum-max", type=int, default=20)
    sg.add_argument("--required-threshold", type=float, default=0.95)
    sg.set_defaults(fn=cmd_suggest)

    r = sub.add_parser("rules")
    r.add_argument("--ruleset", default="default")
    r.add_argument("--rules-file")
    r.set_defaults(fn=cmd_rules)

    dd = sub.add_parser("diff")
    dd.add_argument("report_a")
    dd.add_argument("report_b")
    dd.set_defaults(fn=cmd_diff)

    cp = sub.add_parser("compare")
    cp.add_argument("files", nargs="+")
    cp.add_argument("-o", "--output")
    cp.set_defaults(fn=cmd_compare)

    t = sub.add_parser("transcripts")
    t.add_argument("data")
    t.add_argument("--checkpoint")
    t.add_argument("--rule-version", default="v1")
    t.add_argument("--buckets", type=int, default=32)
    t.add_argument("--threshold", type=float, default=0.0)
    t.add_argument("--incremental", action="store_true")
    t.add_argument(
        "--structure",
        action="store_true",
        help="add cross-turn conversation-structure verdicts "
        "(turn contiguity, role alternation, ts monotonicity, "
        "tool pairing, empty assistant turns)",
    )
    t.add_argument(
        "--conv-dedup",
        action="store_true",
        help="add conversation-level exact dedup (groups of "
        "conversations with identical ordered turn content)",
    )
    t.add_argument(
        "--daily-verdicts",
        action="store_true",
        help="add per ts-day pass/fail verdict rows (threshold from "
        "--threshold when set, else 0.95)",
    )
    t.set_defaults(fn=cmd_transcripts)

    cb = sub.add_parser("contribute")
    cb.add_argument("responses")
    cb.add_argument("-s", "--schema")
    cb.add_argument("-o", "--output")
    cb.add_argument("--annotator", default="unknown")
    cb.add_argument("--created-at", default=None)
    cb.add_argument("--limit", type=int, default=10000)
    cb.set_defaults(fn=cmd_contribute)

    w = sub.add_parser("watch")
    w.add_argument("data")
    w.add_argument("-s", "--schema")
    w.add_argument("--ruleset", default="default")
    w.add_argument("--debounce", type=float, default=1.0)
    w.add_argument("--timeout", type=float, default=0)
    w.add_argument("--max-checks", type=int, default=0)
    w.set_defaults(fn=cmd_watch)

    s = sub.add_parser("stream")
    s.add_argument("data")
    s.add_argument("-o", "--output", required=True)
    s.add_argument("--checkpoint", required=True)
    s.add_argument("--format", default="parquet")
    s.add_argument("--schema-file")
    s.add_argument("--key-cols", default="conv_id,turn_idx")
    s.add_argument("--trigger-seconds", type=int, default=10)
    s.add_argument("--timeout", type=int, default=0)
    s.set_defaults(fn=cmd_stream)

    sk = sub.add_parser("skew")
    sk.add_argument("data")
    sk.add_argument("--keys", required=True)
    sk.add_argument("--top-k", type=int, default=20)
    sk.add_argument("--salt-threshold", type=float, default=4.0)
    sk.set_defaults(fn=cmd_skew)

    pk = sub.add_parser("pack")
    pk.add_argument("data")
    pk.add_argument("--token-col", required=True)
    pk.add_argument("--budget", type=int, required=True)
    pk.add_argument("--order-col", default="doc_id")
    pk.add_argument("-o", "--output")
    pk.set_defaults(fn=cmd_pack)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

"""Quality reports: grade, Markdown/JSON/HTML render, report diff.

Reference: ``/root/reference/src/datacheck/report.py`` — quality grade
thresholds (``report.py:48-55``: ≥0.9 Excellent / ≥0.7 Good / ≥0.5
Fair / else Poor), section structure (``report.py:19-255``), JSON shape
(``report.py:472-501``), and the diff's ↑/↓/= arrows
(``report.py:545-633``). Rendering is driver-side over the small
collected CheckResult — the full violation rows live in a results table
(parquet/Iceberg), not in the report.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

from datacheck_spark.engine import CheckResult


def quality_grade(pass_rate: float) -> str:
    """``report.py:48-55`` thresholds."""
    if pass_rate >= 0.9:
        return "Excellent"
    if pass_rate >= 0.7:
        return "Good"
    if pass_rate >= 0.5:
        return "Fair"
    return "Poor"


def grade_color(pass_rate: float) -> str:
    """HTML grade colors (``report.py:636-645``)."""
    if pass_rate >= 0.9:
        return "#22c55e"
    if pass_rate >= 0.7:
        return "#84cc16"
    if pass_rate >= 0.5:
        return "#eab308"
    return "#ef4444"


def to_json_report(result: CheckResult, max_failed_ids: int = 50) -> Dict[str, Any]:
    """JSON report (``checker.py:697-720`` shape, 50-id cap)."""
    return {
        "summary": {
            "total_samples": result.total_samples,
            "passed_samples": result.passed_samples,
            "failed_samples": result.failed_samples,
            "pass_rate": f"{result.pass_rate:.1%}",
            "error_count": result.error_count,
            "warning_count": result.warning_count,
            "info_count": result.info_count,
            "grade": quality_grade(result.pass_rate),
        },
        "rule_results": result.rule_results,
        "duplicates": result.duplicates,
        "near_duplicates": result.near_duplicates,
        "distribution": result.distribution,
        "anomalies": result.anomalies,
        "failed_sample_ids": result.failed_sample_ids[:max_failed_ids],
        "sampled": result.sampled,
    }


def to_markdown(result: CheckResult, title: str = "Data Quality Report") -> str:
    """Markdown report with the reference's section structure
    (``report.py:19-255``): summary, issue counts, per-rule detail,
    dup groups (top 10), anomalies, failed ids (top 20)."""
    lines = [f"# {title}", ""]
    g = quality_grade(result.pass_rate)
    lines += [
        "## Summary",
        "",
        f"- Total samples: {result.total_samples}",
        f"- Passed: {result.passed_samples}",
        f"- Failed: {result.failed_samples}",
        f"- Pass rate: {result.pass_rate:.1%} ({g})",
        f"- Errors: {result.error_count} / Warnings: "
        f"{result.warning_count} / Info: {result.info_count}",
        "",
    ]
    if result.sampled:
        lines += [
            f"> Sampled: {result.sampled_count} of "
            f"{result.original_count} samples",
            "",
        ]
    if result.rule_results:
        lines += ["## Rules", "", "| rule | severity | passed | failed |",
                  "|---|---|---|---|"]
        for rid, rr in result.rule_results.items():
            lines.append(
                f"| {rr.get('name', rid)} | {rr.get('severity')} "
                f"| {rr.get('passed')} | {rr.get('failed')} |"
            )
        lines.append("")
    if result.duplicates:
        lines += ["## Duplicates", ""]
        for group in result.duplicates[:10]:
            lines.append(f"- {', '.join(map(str, group))}")
        lines.append("")
    if result.near_duplicates:
        lines += ["## Near-duplicates", ""]
        for group in result.near_duplicates[:10]:
            lines.append(f"- {', '.join(map(str, group))}")
        lines.append("")
    if result.anomalies:
        lines += ["## Anomalies", "",
                  "| field | outliers | bounds |", "|---|---|---|"]
        for fname, a in result.anomalies.items():
            b = a.get("bounds", {})
            lines.append(
                f"| {fname} | {a.get('outlier_count')} "
                f"| [{b.get('lower')}, {b.get('upper')}] |"
            )
        lines.append("")
    if result.failed_sample_ids:
        shown = result.failed_sample_ids[:20]
        lines += ["## Failed samples", "",
                  ", ".join(map(str, shown))]
        if len(result.failed_sample_ids) > 20:
            lines.append(
                f"... and {len(result.failed_sample_ids) - 20} more"
            )
        lines.append("")
    return "\n".join(lines)


def to_html(result: CheckResult, title: str = "Data Quality Report") -> str:
    """Minimal HTML render with grade color (``report.py:257-470``)."""
    color = grade_color(result.pass_rate)
    rows = "".join(
        f"<tr><td>{rr.get('name', rid)}</td><td>{rr.get('severity')}</td>"
        f"<td>{rr.get('passed')}</td><td>{rr.get('failed')}</td></tr>"
        for rid, rr in result.rule_results.items()
    )
    return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title></head>
<body>
<h1>{title}</h1>
<p>Pass rate: <strong style="color:{color}">{result.pass_rate:.1%}
({quality_grade(result.pass_rate)})</strong></p>
<p>Total {result.total_samples} / Passed {result.passed_samples} /
Failed {result.failed_samples} — errors {result.error_count},
warnings {result.warning_count}, info {result.info_count}</p>
<table border="1"><tr><th>rule</th><th>severity</th><th>passed</th>
<th>failed</th></tr>{rows}</table>
</body></html>"""


def save_report(
    result: CheckResult,
    output_path: str,
    fmt: Optional[str] = None,
    title: str = "Data Quality Report",
) -> None:
    """Save MD/JSON/HTML by extension (``report.py:503-521``)."""
    from pathlib import Path

    p = Path(output_path)
    fmt = fmt or p.suffix.lstrip(".").lower() or "json"
    p.parent.mkdir(parents=True, exist_ok=True)
    if fmt in ("md", "markdown"):
        p.write_text(to_markdown(result, title=title), encoding="utf-8")
    elif fmt in ("html", "htm"):
        p.write_text(to_html(result, title=title), encoding="utf-8")
    else:
        p.write_text(
            json.dumps(to_json_report(result), indent=2, ensure_ascii=False),
            encoding="utf-8",
        )


def batch_to_markdown(
    batch: Dict[str, Any], title: str = "Batch Data Quality Report"
) -> str:
    """Markdown for a directory-scan result (reference
    ``report.py:648-708`` BatchQualityReport.to_markdown): summary
    table, per-file detail with error/warning counts and a pass/fail
    status, skipped files."""
    rate = batch.get("overall_pass_rate", 0.0)
    # directory-scan results carry "directory"; explicit-file-list
    # results (check_files — the pre-commit surface) carry "files"
    if batch.get("directory"):
        source_line = f"Directory: `{batch['directory']}`"
    else:
        shown = list(batch.get("files", []))
        source_line = "Files: " + ", ".join(
            f"`{f}`" for f in shown[:20]
        ) + (f" … (+{len(shown) - 20} more)" if len(shown) > 20 else "")
    lines = [
        f"# {title}",
        "",
        source_line,
        "",
        "## Summary",
        "",
        "| metric | value |",
        "|--------|-------|",
        f"| files checked | {batch.get('total_files', 0)} |",
        f"| total samples | {batch.get('total_samples', 0)} |",
        f"| passed samples | {batch.get('total_passed_samples', 0)} |",
        f"| failed samples | {batch.get('total_failed_samples', 0)} |",
        f"| **overall pass rate** | **{rate:.1%}** |",
        "",
        f"### Grade: {quality_grade(rate)}",
        "",
    ]
    files = batch.get("file_results", {})
    if files:
        lines += [
            "## Files",
            "",
            "| file | samples | pass rate | errors | warnings | status |",
            "|------|---------|-----------|--------|----------|--------|",
        ]
        for path, fr in files.items():
            status = "PASS" if fr.get("error_count", 0) == 0 else "FAIL"
            lines.append(
                f"| {path} | {fr['total_samples']} | {fr['pass_rate']:.1%} "
                f"| {fr.get('error_count', 0)} | {fr.get('warning_count', 0)} "
                f"| {status} |"
            )
        lines.append("")
    if batch.get("skipped_files"):
        lines += ["## Skipped", ""]
        lines += [f"- {s}" for s in batch["skipped_files"]]
        lines.append("")
    return "\n".join(lines)


def batch_to_html(
    batch: Dict[str, Any], title: str = "Batch Data Quality Report"
) -> str:
    """Self-contained HTML for a directory-scan result (reference
    ``report.py:708-780``) — the markdown body in a minimal page, same
    approach as :func:`to_html`."""
    import html as _html

    body = _html.escape(batch_to_markdown(batch, title=title))
    color = grade_color(batch.get("overall_pass_rate", 0.0))
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{_html.escape(title)}</title>"
        "<style>body{font-family:sans-serif;max-width:60em;margin:2em auto}"
        f"pre{{white-space:pre-wrap}} h1{{color:{color}}}</style></head>"
        f"<body><pre>{body}</pre></body></html>"
    )


def save_batch_report(
    batch: Dict[str, Any], output_path: str, fmt: Optional[str] = None
) -> None:
    """Save a directory-scan report as MD/JSON/HTML (reference
    ``report.py:816-829``); explicit ``fmt`` wins over the extension."""
    from pathlib import Path

    p = Path(output_path)
    fmt = fmt or p.suffix.lstrip(".").lower() or "json"
    p.parent.mkdir(parents=True, exist_ok=True)
    if fmt in ("md", "markdown"):
        p.write_text(batch_to_markdown(batch), encoding="utf-8")
    elif fmt in ("html", "htm"):
        p.write_text(batch_to_html(batch), encoding="utf-8")
    else:
        p.write_text(
            json.dumps(batch, indent=2, ensure_ascii=False), encoding="utf-8"
        )


def _arrow(a: float, b: float) -> str:
    """Diff arrows (``report.py:560-570``): ↑ improved, ↓ worse, = same."""
    if b > a:
        return "↑"
    if b < a:
        return "↓"
    return "="


def diff_reports(a: Dict[str, Any], b: Dict[str, Any]) -> str:
    """Markdown diff of two JSON reports (``report.py:545-633``):
    metric table with arrows, per-rule failed deltas, dup-group delta."""
    sa, sb = a.get("summary", {}), b.get("summary", {})

    def pct(s):
        v = s.get("pass_rate", "0%")
        return float(str(v).rstrip("%")) / 100 if isinstance(v, str) else v

    lines = ["# Report Diff", "", "| metric | A | B | trend |", "|---|---|---|---|"]
    pa, pb = pct(sa), pct(sb)
    lines.append(f"| pass_rate | {pa:.1%} | {pb:.1%} | {_arrow(pa, pb)} |")
    for key in ("total_samples", "passed_samples", "failed_samples",
                "error_count", "warning_count", "info_count"):
        va, vb = sa.get(key, 0), sb.get(key, 0)
        # for counts of problems, more is worse: invert the arrow
        arrow = _arrow(va, vb)
        if key in ("failed_samples", "error_count", "warning_count",
                   "info_count"):
            arrow = {"↑": "↓", "↓": "↑"}.get(arrow, arrow)
        lines.append(f"| {key} | {va} | {vb} | {arrow} |")

    ra, rb = a.get("rule_results", {}), b.get("rule_results", {})
    shared = sorted(set(ra) & set(rb))
    if shared:
        lines += ["", "## Rule deltas", "",
                  "| rule | failed A | failed B | Δ |", "|---|---|---|---|"]
        for rid in shared:
            fa, fb = ra[rid].get("failed", 0), rb[rid].get("failed", 0)
            lines.append(f"| {rid} | {fa} | {fb} | {fb - fa:+d} |")

    da = len(a.get("duplicates", []))
    db = len(b.get("duplicates", []))
    lines += ["", f"Duplicate groups: {da} → {db} ({db - da:+d})"]
    return "\n".join(lines)


def gate(
    result: CheckResult, threshold: float = 0.5, strict: bool = False
) -> int:
    """CI gating exit code (``cli.py:42-43``, ``cli.py:169-175``):
    1 if pass_rate < threshold, or (strict) any error/warning."""
    if result.pass_rate < threshold:
        return 1
    if strict and (result.error_count > 0 or result.warning_count > 0):
        return 1
    return 0

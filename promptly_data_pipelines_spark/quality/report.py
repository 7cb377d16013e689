"""Data-quality report generation — the Elementary ``edr report`` role
(reference app.py:52-59; the acceptance suite's only end-to-end
assertion is that an HTML report exists, test_dbt.py:161-177).

Produces a machine-readable JSON report, a human-readable markdown
summary, AND the reference-parity self-contained HTML page (inline
CSS, no external assets — the same deliverable shape ``edr report``
writes) from a check suite + table metrics.
"""

from __future__ import annotations

import html as _html
import json
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame


def write_report(
    suite_results: DataFrame,
    metrics: dict[str, DataFrame],
    out_dir: str,
    run_id: str | None = None,
) -> dict[str, str]:
    """suite_results: the run_suite frame (check_name, n_violations,
    passed); metrics: table name → table_metrics frame. Writes
    report.json + report.md into out_dir, returns their paths.

    Driver-side collect is correct here: a report has one row per
    check/table, never per data row."""
    os.makedirs(out_dir, exist_ok=True)
    checks = [r.asDict() for r in suite_results.collect()]
    tables = {}
    for name, df in metrics.items():
        head = df.head(1)  # first row only — never collect a whole frame
        if not head:
            raise ValueError(
                f"metrics frame for table {name!r} is empty — table_metrics "
                "always yields one row; an empty frame means the wrong "
                "aggregate was passed"
            )
        tables[name] = head[0].asDict()
    generated_at = datetime.now(timezone.utc).isoformat()
    payload = {
        "run_id": run_id or generated_at,
        "generated_at": generated_at,
        # all() over ZERO checks is vacuously True — an empty suite must
        # read as failed, or a config bug that compiles no checks would
        # promote unvalidated data with a green report
        "passed": bool(checks) and all(c["passed"] for c in checks),
        "checks": checks,
        "tables": tables,
    }
    json_path = os.path.join(out_dir, "report.json")
    with open(json_path, "w") as f:
        json.dump(payload, f, indent=2, default=str)

    lines = [
        "# Data quality report",
        f"Run: {payload['run_id']}  ",
        f"Overall: {'PASS' if payload['passed'] else 'FAIL'}",
        "",
        "## Checks",
        "| check | violations | status |",
        "|---|---|---|",
    ]
    for c in checks:
        lines.append(
            f"| {c['check_name']} | {c['n_violations']} | {'✅' if c['passed'] else '❌'} |"
        )
    lines += ["", "## Tables", "| table | rows | keys | min_ts | max_ts |", "|---|---|---|---|---|"]
    for name, m in tables.items():
        lines.append(
            f"| {name} | {m.get('row_count')} | {m.get('key_cardinality')} | "
            f"{m.get('min_ts')} | {m.get('max_ts')} |"
        )
    md_path = os.path.join(out_dir, "report.md")
    with open(md_path, "w") as f:
        f.write("\n".join(lines) + "\n")

    html_path = os.path.join(out_dir, "report.html")
    with open(html_path, "w") as f:
        f.write(_render_html(payload))
    return {"json": json_path, "md": md_path, "html": html_path}


def _render_html(payload: dict) -> str:
    """Self-contained HTML report (reference test_dbt.py:161-177 asserts
    ``edr report`` produced exactly this artifact class: one .html file,
    no external assets). Plain string templating — every dynamic value
    is escaped; no JS, inline CSS only, renders file:// offline."""

    def esc(v) -> str:
        return _html.escape(str(v))

    status = "PASS" if payload["passed"] else "FAIL"
    color = "#1a7f37" if payload["passed"] else "#cf222e"
    check_rows = "\n".join(
        "<tr><td>{}</td><td class='num'>{}</td><td style='color:{}'>{}</td></tr>".format(
            esc(c["check_name"]),
            esc(c["n_violations"]),
            "#1a7f37" if c["passed"] else "#cf222e",
            "pass" if c["passed"] else "FAIL",
        )
        for c in payload["checks"]
    )
    table_rows = "\n".join(
        "<tr><td>{}</td><td class='num'>{}</td><td class='num'>{}</td>"
        "<td>{}</td><td>{}</td></tr>".format(
            esc(name),
            esc(m.get("row_count")),
            esc(m.get("key_cardinality")),
            esc(m.get("min_ts")),
            esc(m.get("max_ts")),
        )
        for name, m in payload["tables"].items()
    )
    return f"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<title>Data quality report — {esc(payload["run_id"])}</title>
<style>
body {{ font: 14px/1.5 system-ui, sans-serif; margin: 2rem auto; max-width: 56rem; color: #1f2328; }}
h1 {{ font-size: 1.4rem; }} h2 {{ font-size: 1.1rem; margin-top: 2rem; }}
.badge {{ display: inline-block; padding: .2rem .6rem; border-radius: .4rem;
          color: #fff; background: {color}; font-weight: 600; }}
table {{ border-collapse: collapse; width: 100%; margin-top: .5rem; }}
th, td {{ border: 1px solid #d1d9e0; padding: .35rem .6rem; text-align: left; }}
th {{ background: #f6f8fa; }} td.num {{ text-align: right; font-variant-numeric: tabular-nums; }}
.meta {{ color: #59636e; }}
</style></head><body>
<h1>Data quality report <span class="badge">{status}</span></h1>
<p class="meta">Run {esc(payload["run_id"])} · generated {esc(payload["generated_at"])}</p>
<h2>Checks ({len(payload["checks"])})</h2>
<table><thead><tr><th>check</th><th>violations</th><th>status</th></tr></thead>
<tbody>
{check_rows}
</tbody></table>
<h2>Tables ({len(payload["tables"])})</h2>
<table><thead><tr><th>table</th><th>rows</th><th>keys</th><th>min_ts</th><th>max_ts</th></tr></thead>
<tbody>
{table_rows}
</tbody></table>
</body></html>
"""

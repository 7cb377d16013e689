"""Data-quality report generation — the Elementary ``edr report`` role
(reference app.py:52-59; the acceptance suite's only end-to-end
assertion is that this report exists, test_dbt.py:161-177).

Produces a machine-readable JSON report plus a human-readable
markdown summary from a check suite + table metrics.
"""

from __future__ import annotations

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
    return {"json": json_path, "md": md_path}

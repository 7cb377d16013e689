"""Doc-registry drift pin: docs/QUERIES.md is generated from the
registry (python docs/generate.py), and the r9 verdict caught it
stale (cdc_parse_variant was registered but undocumented). This is
the cheap no-Spark check that every registered AND local-only query
name appears in the generated doc, and that the tier counts printed
in the doc headers match the registry at HEAD — so a rotation or a
new operator that skips the regenerate step fails CI immediately.
"""

from __future__ import annotations

import os
import re

from promptly_data_pipelines_spark import registry

_DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "docs", "QUERIES.md")


def _doc_text() -> str:
    with open(_DOC, encoding="utf-8") as f:
        return f.read()


def test_every_query_name_documented():
    doc = _doc_text()
    names = set(registry.all_queries()) | set(registry.local_only_queries())
    missing = sorted(n for n in names if f"`{n}`" not in doc)
    assert not missing, (
        f"docs/QUERIES.md is stale — regenerate with `python docs/generate.py`; "
        f"missing: {missing}"
    )


def test_doc_tier_counts_match_registry():
    doc = _doc_text()
    reg = registry.all_queries()
    loc = registry.local_only_queries()
    m = re.search(r"^(\d+) queries; (\d+) oracle-checked, (\d+) rows-only",
                  doc, re.M)
    assert m, "registered-tier count line missing from docs/QUERIES.md"
    assert int(m.group(1)) == len(reg)
    assert int(m.group(2)) == len(registry.all_oracles())
    m2 = re.search(r"^(\d+) queries; (\d+) oracle-checked in pytest", doc, re.M)
    assert m2, "local-tier count line missing from docs/QUERIES.md"
    assert int(m2.group(1)) == len(loc)
    assert int(m2.group(2)) == len(registry.local_only_oracles())


def test_doc_driver_table_order_matches_registry():
    """The driver-visible table lists exactly _ORDER, in order."""
    doc = _doc_text()
    sec = doc.split("## Driver-visible queries", 1)[1]
    sec = sec.split("## Local-only queries", 1)[0]
    rows = re.findall(r"^\| \d+ \| `([^`]+)` \|", sec, re.M)
    assert rows == list(registry.all_queries())

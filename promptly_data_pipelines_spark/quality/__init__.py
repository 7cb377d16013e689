"""Data-quality module (SURVEY.md §2i) — dbt tests + Elementary
monitoring re-expressed as DataFrame checks."""

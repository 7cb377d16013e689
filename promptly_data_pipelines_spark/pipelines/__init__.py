"""Pipelines: the flagship curated model + the dbt-DAG orchestrator."""

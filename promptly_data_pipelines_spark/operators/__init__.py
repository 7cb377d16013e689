"""Batch relational operator library (SURVEY.md §2b-§2g).

Each module registers its operators as named queries with DuckDB
oracle SQL via ``promptly_data_pipelines_spark.registry``.
"""

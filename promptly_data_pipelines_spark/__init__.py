"""promptly_data_pipelines_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of FerozLabs/promptly-data-pipelines (a Trino + dbt +
Kafka/Debezium + Iceberg lakehouse ELT pipeline) as a single
idiomatic-Spark package: DataFrame/SQL logical plans optimized by
Catalyst, Structured Streaming for the CDC path, Pandas UDFs only
where built-ins cannot express the semantics.

Layout:
- ``session``    SparkSession builder (AQE on, UTC, explicit shuffle parallelism)
- ``catalog``    test-table loading / temp-view registration
- ``registry``   the queries()/oracle_sql() registry used by the driver contract
- ``functions``  semantic-parity column helpers (Trino-dialect shims)
- ``operators``  batch relational operators (scans, projections, joins,
                 aggregates, windows, sorts, set ops)
- ``cdc``        Debezium-envelope decode, tombstone filtering, latest-wins
                 compaction, merge upsert — batch and Structured Streaming
- ``quality``    dbt-test-style data-quality checks (unique/not_null/relationships/metrics)
- ``pipelines``  the flagship curated pipeline + a dbt-DAG-style orchestrator
- ``extensions`` LLM-pipeline operators: dedup (exact/minhash/simhash/jaccard),
                 vector similarity search, text analysis, multimodal plumbing
"""

__version__ = "0.1.0"

"""CDC path (SURVEY.md §2h): Debezium-envelope decode, tombstone
handling, op routing, latest-wins compaction, merge upsert — as batch
(the reference's actual mode: Trino re-reads the Kafka topic every dbt
run, kafka.properties:7) and as Structured Streaming (the scale mode).
"""

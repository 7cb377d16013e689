"""Debezium CDC envelope: schema + synthesis + decode.

Mirrors the reference's Kafka table-description mapping
(infra/trino/etc/kafka-table-descriptions/provider.json:10-26): each
message is a JSON envelope ``payload.{op, ts_ms, before, after,
source.{db,schema,table}}`` where ``op ∈ c|u|d|r``, ``ts_ms`` is epoch
millis, and ``before``/``after`` are full row images (null ``after``
for deletes — filtered by raw_provider_postgres.sql:22). The Trino
connector also exposes internal columns ``_timestamp``/``_message``
(kafka.properties:8 hide-internal-columns=false) which we model as
``kafka_timestamp``/``raw_message``.

The harness has no Kafka broker, so envelopes are synthesized
deterministically from the ``events`` fixture (FIXTURES.md §B4): op is
derived from event_id (%10==0 → delete, %3==0 → update, else create).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Row image carried in before/after — the events row minus its timestamp
# (event time travels as payload.ts_ms, as in Debezium).
ROW_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("db", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
    ]
)

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField("op", T.StringType()),
                    T.StructField("ts_ms", T.LongType()),
                    T.StructField("before", ROW_IMAGE_SCHEMA),
                    T.StructField("after", ROW_IMAGE_SCHEMA),
                    T.StructField("source", SOURCE_SCHEMA),
                ]
            ),
        )
    ]
)


def op_from_event_id(event_id: Column) -> Column:
    """Deterministic op assignment for synthesized envelopes:
    %10==0 → 'd' (delete/tombstone), else %3==0 → 'u', else 'c'."""
    return (
        F.when(event_id % 10 == 0, "d").when(event_id % 3 == 0, "u").otherwise("c")
    )


def synthesize_envelopes(events: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """events fixture → Kafka-shaped frame: (raw_message string JSON,
    kafka_timestamp). Deletes carry the row in ``before`` with null
    ``after``, matching Debezium semantics (provider.json:13-20).
    ``extra_cols`` are passed through untouched (e.g. a staging
    batch id that a file-sink partitionBy will strip again)."""
    row_image = F.struct(
        F.col("event_id"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    )
    null_image = F.lit(None).cast(ROW_IMAGE_SCHEMA)
    op = op_from_event_id(F.col("event_id"))
    payload = F.struct(
        op.alias("op"),
        F.unix_millis("ts").alias("ts_ms"),
        F.when(op == "d", row_image).otherwise(null_image).alias("before"),
        F.when(op == "d", null_image).otherwise(row_image).alias("after"),
        F.struct(
            F.lit("promptly").alias("db"),
            F.lit("public").alias("schema"),
            F.lit("events").alias("table"),
        ).alias("source"),
    )
    return events.select(
        F.to_json(F.struct(payload.alias("payload"))).alias("raw_message"),
        F.col("ts").alias("kafka_timestamp"),
        *[F.col(c) for c in extra_cols],
    )


def decode_envelopes(kafka_like: DataFrame) -> DataFrame:
    """raw JSON messages → typed columns. ``from_json`` with the declared
    envelope schema (never schema inference); works identically on a
    batch frame and a readStream frame — this is the single decode used
    by both paths."""
    p = F.from_json("raw_message", ENVELOPE_SCHEMA).getField("payload")
    return kafka_like.select(
        p.getField("op").alias("op"),
        p.getField("ts_ms").alias("ts_ms"),
        p.getField("before").alias("before"),
        p.getField("after").alias("after"),
        p.getField("source").alias("source"),
        "kafka_timestamp",
    )

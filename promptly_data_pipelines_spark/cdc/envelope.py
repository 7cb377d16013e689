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

from pyspark.sql import Column, DataFrame, Window
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


def envelope_schema_for(row_image: T.StructType) -> T.StructType:
    """Debezium envelope schema around a given row-image schema — the
    declared-schema-read discipline applied to CDC: when the upstream
    table gains a column (Debezium starts emitting it mid-topic after
    the DDL), the consumer re-declares the WIDENED image here and
    ``from_json`` NULL-fills it on every pre-DDL message. Same posture
    as operators/evolution.read_with_target_schema for files."""
    return T.StructType(
        [
            T.StructField(
                "payload",
                T.StructType(
                    [
                        T.StructField("op", T.StringType()),
                        T.StructField("ts_ms", T.LongType()),
                        T.StructField("before", row_image),
                        T.StructField("after", row_image),
                        T.StructField("source", SOURCE_SCHEMA),
                    ]
                ),
            )
        ]
    )


ENVELOPE_SCHEMA = envelope_schema_for(ROW_IMAGE_SCHEMA)

# The post-DDL row image: events + an additive 'channel' column (the
# most common CDC operational event — see cdc/batch.cdc_schema_evolution)
ROW_IMAGE_V2_SCHEMA = T.StructType(
    ROW_IMAGE_SCHEMA.fields + [T.StructField("channel", T.StringType())]
)
ENVELOPE_V2_SCHEMA = envelope_schema_for(ROW_IMAGE_V2_SCHEMA)


def op_from_event_id(event_id: Column) -> Column:
    """Deterministic op assignment for synthesized envelopes:
    %10==0 → 'd' (delete/tombstone), else %3==0 → 'u', else 'c'."""
    return (
        F.when(event_id % 10 == 0, "d").when(event_id % 3 == 0, "u").otherwise("c")
    )


def synthesize_envelopes(
    events: DataFrame,
    extra_cols: tuple[str, ...] = (),
    image_extra: dict[str, Column] | None = None,
) -> DataFrame:
    """events fixture → Kafka-shaped frame: (raw_message string JSON,
    kafka_timestamp). Deletes carry the row in ``before`` with null
    ``after``, matching Debezium semantics (provider.json:13-20).
    ``extra_cols`` are passed through untouched (e.g. a staging
    batch id that a file-sink partitionBy will strip again).

    ``image_extra`` appends named columns to the row image — the
    schema-evolution wire shape: to_json's default ignoreNullFields
    OMITS a null field from the serialized message, so an extra column
    that is NULL for pre-DDL rows produces envelopes byte-shaped like
    a real topic across an additive ALTER TABLE (old messages lack the
    key entirely; new ones carry it) — asserted in
    tests/test_kafka_wire.py."""
    image_fields = [
        F.col("event_id"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    ]
    image_schema = ROW_IMAGE_SCHEMA
    if image_extra:
        image_fields += [col.alias(name) for name, col in image_extra.items()]
        # Derive each extra field's REAL type by analyzing (not running)
        # a probe projection against the input — hardcoding StringType
        # here made a non-string extra column type-mismatch against the
        # null_image cast in the when/otherwise branches (ADVICE r12).
        extra_types = {
            f.name: f.dataType
            for f in events.select(
                *[col.alias(name) for name, col in image_extra.items()]
            ).schema.fields
        }
        image_schema = T.StructType(
            ROW_IMAGE_SCHEMA.fields
            + [T.StructField(name, extra_types[name]) for name in image_extra]
        )
    row_image = F.struct(*image_fields)
    null_image = F.lit(None).cast(image_schema)
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


# The EXACT schema Spark's format("kafka") source yields (columns,
# names, types, order — see spark-sql-kafka's KafkaRecordToRowConverter
# fixed projection; headers appear only with includeHeaders=true).
# Pinned here so the no-broker wire tests exercise the same frame shape
# a live topic would produce (r6 verdict item #4).
KAFKA_SOURCE_DDL = (
    "key binary, value binary, topic string, partition int, offset bigint, "
    "timestamp timestamp, timestampType int"
)


def synthesize_kafka_frames(
    events: DataFrame, topic: str = "cdc.public.events", n_partitions: int = 4
) -> DataFrame:
    """events fixture → byte-exact ``format("kafka")`` frame: the
    Debezium value envelope UTF-8-encoded to binary, the key as the
    PK-JSON Debezium emits (``{"event_id": N}``), topic/partition/
    offset/timestamp/timestampType exactly as the source yields them.
    Partition assignment is pmod(event_id, n) — a deterministic
    stand-in for Kafka's murmur2-of-key-bytes partitioner (same
    property that matters: all records for one key share a partition);
    offsets are per-partition arrival positions (ts, event_id order —
    Kafka guarantees order only within a partition)."""
    env = synthesize_envelopes(events, extra_cols=("event_id",))
    part = F.pmod(F.col("event_id"), F.lit(n_partitions)).cast("int")
    offset_w = Window.partitionBy("partition").orderBy("kafka_timestamp", "event_id")
    return (
        env.select(
            F.encode(F.to_json(F.struct(F.col("event_id"))), "UTF-8").alias("key"),
            F.encode(F.col("raw_message"), "UTF-8").alias("value"),
            F.lit(topic).alias("topic"),
            part.alias("partition"),
            F.col("kafka_timestamp"),
            F.col("event_id"),
        )
        .withColumn(
            "offset", (F.row_number().over(offset_w) - 1).cast("bigint")
        )
        .select(
            "key",
            "value",
            "topic",
            "partition",
            "offset",
            F.col("kafka_timestamp").alias("timestamp"),
            F.lit(0).cast("int").alias("timestampType"),  # CreateTime
        )
    )


def from_kafka_source_frame(kafka: DataFrame) -> DataFrame:
    """The production projection from a ``format("kafka")`` frame to
    the (raw_message, kafka_timestamp) shape every downstream decode
    consumes — the single adapter both the batch backfill and the
    readStream path would use against a live topic. Kafka compaction
    tombstones (value IS NULL — distinct from Debezium's op='d'
    delete envelope) surface as a null raw_message, which from_json
    decodes to a null payload and the after-image filter drops —
    asserted by tests/test_kafka_wire.py."""
    return kafka.select(
        F.col("value").cast("string").alias("raw_message"),
        F.col("timestamp").alias("kafka_timestamp"),
    )


def decode_envelopes_variant(kafka_like: DataFrame) -> DataFrame:
    """Schema-on-read decode of the same envelope via Spark 4 VARIANT
    (``try_parse_json`` → ``try_variant_get``) — the path for topics
    whose payload EVOLVES: ``from_json`` with a declared schema
    silently nulls any field added upstream until the schema literal
    is redeployed, while a variant keeps every field queryable the
    moment it appears (Trino's ``json_query(_message, 'lax $...')``
    in raw_provider_postgres.sql:22 is exactly this posture). Cost
    model at 100 TB: the JSON text is parsed ONCE per row into the
    binary variant encoding; each ``variant_get`` then walks the
    pre-parsed tree (no re-tokenizing per field, unlike repeated
    ``get_json_object`` calls). All accessors are the try_ forms so
    one malformed message nulls out instead of failing the job
    (PERMISSIVE posture, same as operators/badrecords.py).

    One wire-format subtlety matters for deletes: Debezium's JSON
    converter serializes ``"after": null`` EXPLICITLY on delete
    envelopes (it does not omit the key), and ``try_variant_get(...,
    'variant')`` on an explicit JSON null yields a *variant-null* —
    a non-NULL variant value — so a plain ``after.isNotNull()``
    tombstone filter would keep delete rows with all-null projected
    fields. ``_variant_or_null`` collapses variant-null to SQL null
    here, once, so every downstream filter behaves identically
    whether the producer omitted the key or wrote an explicit null
    (pinned by tests/test_cdc_variant.py's explicit-null case).

    Returns the same top-level columns as :func:`decode_envelopes`
    but with ``before``/``after`` as VariantType (callers project
    fields with ``try_variant_get``)."""

    v = F.try_parse_json("raw_message")

    def _variant_or_null(path: str):
        # reuse the shared parsed variant `v` — re-deriving it here
        # would parse the JSON text again per column if subexpression
        # elimination doesn't collapse the duplicates
        x = F.try_variant_get(v, path, "variant")
        return F.when(~F.is_variant_null(x), x)
    pay = "$.payload"
    return kafka_like.select(
        F.try_variant_get(v, f"{pay}.op", "string").alias("op"),
        F.try_variant_get(v, f"{pay}.ts_ms", "bigint").alias("ts_ms"),
        _variant_or_null(f"{pay}.before").alias("before"),
        _variant_or_null(f"{pay}.after").alias("after"),
        F.try_variant_get(v, f"{pay}.source.table", "string").alias("src_table"),
        "kafka_timestamp",
    )


def decode_envelopes(
    kafka_like: DataFrame, schema: T.StructType = ENVELOPE_SCHEMA
) -> DataFrame:
    """raw JSON messages → typed columns. ``from_json`` with the declared
    envelope schema (never schema inference); works identically on a
    batch frame and a readStream frame — this is the single decode used
    by both paths. Pass ``schema=ENVELOPE_V2_SCHEMA`` (or any
    envelope_schema_for product) to read a topic across an additive
    upstream DDL: pre-DDL messages NULL-fill the new field."""
    p = F.from_json("raw_message", schema).getField("payload")
    return kafka_like.select(
        p.getField("op").alias("op"),
        p.getField("ts_ms").alias("ts_ms"),
        p.getField("before").alias("before"),
        p.getField("after").alias("after"),
        p.getField("source").alias("source"),
        "kafka_timestamp",
    )

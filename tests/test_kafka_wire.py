"""No-broker Kafka wire-format fidelity (r6 verdict item #4).

The sandbox has no Kafka broker, so ``format("kafka")`` itself cannot
run — but everything AFTER the source can: these tests construct
byte-exact frames with the literal schema the Kafka source yields
(key/value binary, topic, partition, offset, timestamp, timestampType
— reference kafka.properties:1-8, provider.json:10-26) and push them
through the production adapter + decode path, asserting the result
matches the registered cdc_parse oracle. A user wiring a live topic
swaps ONLY the source line; every projection and decode they would
exercise is covered here.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from promptly_data_pipelines_spark.catalog import table
from promptly_data_pipelines_spark.cdc.envelope import (
    KAFKA_SOURCE_DDL,
    decode_envelopes,
    from_kafka_source_frame,
    synthesize_envelopes,
    synthesize_kafka_frames,
)
from promptly_data_pipelines_spark.cdc.streaming import live_rows

from conftest import SF_DIR, assert_oracle_match


def _events(spark):
    return table(spark, SF_DIR, "events")


def test_kafka_frame_schema_is_source_exact(spark):
    """The synthesized frame's schema must be EXACTLY what
    spark-sql-kafka's source projects — names, types, order — so the
    downstream code is proven against the real frame shape."""
    got = synthesize_kafka_frames(_events(spark)).schema
    expected = spark.createDataFrame([], KAFKA_SOURCE_DDL).schema
    assert [(f.name, f.dataType.simpleString()) for f in got.fields] == [
        (f.name, f.dataType.simpleString()) for f in expected.fields
    ]


def test_kafka_value_bytes_roundtrip_lossless(spark):
    """UTF-8 encode → binary → cast(string) must be byte-lossless for
    the envelope JSON: decoding through the kafka frame equals decoding
    the envelope frame directly, row for row."""
    ev = _events(spark)
    via_kafka = (
        decode_envelopes(from_kafka_source_frame(synthesize_kafka_frames(ev)))
        .select("op", "ts_ms", "after.event_id", "kafka_timestamp")
        .orderBy("ts_ms", "event_id")
        .collect()
    )
    direct = (
        decode_envelopes(synthesize_envelopes(ev))
        .select("op", "ts_ms", "after.event_id", "kafka_timestamp")
        .orderBy("ts_ms", "event_id")
        .collect()
    )
    assert via_kafka == direct


def test_kafka_path_matches_cdc_parse_oracle(spark, oracle_con):
    """The full T1+T2 projection over the kafka-source frames must
    satisfy the SAME DuckDB oracle the driver checks cdc_parse with."""
    from promptly_data_pipelines_spark.registry import all_oracles

    decoded = decode_envelopes(
        from_kafka_source_frame(synthesize_kafka_frames(_events(spark)))
    )
    out = decoded.filter(F.col("after").isNotNull()).select(
        "op",
        "ts_ms",
        F.col("after.event_id").alias("event_id"),
        F.col("after.user_id").alias("user_id"),
        F.col("after.event_type").alias("event_type"),
        F.col("after.value").alias("value"),
        F.col("source.table").alias("src_table"),
    )
    assert_oracle_match(
        out, oracle_con, all_oracles()["cdc_parse"], "kafka_wire_cdc_parse"
    )


def test_kafka_key_is_debezium_pk_json(spark):
    """Every key decodes as the PK JSON ``{"event_id": N}`` and matches
    the id carried in the envelope's row image."""
    frames = synthesize_kafka_frames(_events(spark))
    # key and value travel together in one frame — decode both sides of
    # the same row and compare the multisets
    both = frames.select(
        F.get_json_object(F.col("key").cast("string"), "$.event_id").cast("long").alias(
            "key_id"
        ),
        F.col("value").cast("string").alias("raw_message"),
        "timestamp",
    )
    img = decode_envelopes(
        both.select("raw_message", F.col("timestamp").alias("kafka_timestamp"))
    ).select(F.coalesce("after.event_id", "before.event_id").alias("img_id"))
    pairs = both.select("key_id").toPandas()["key_id"].sort_values().tolist()
    imgs = img.toPandas()["img_id"].sort_values().tolist()
    assert pairs == imgs


def test_kafka_partition_offsets_dense_and_keyed(spark):
    """Offsets are dense 0..n-1 within each partition (Kafka's ordering
    contract is per-partition) and a key always lands in one partition."""
    frames = synthesize_kafka_frames(_events(spark)).persist()
    per = (
        frames.groupBy("partition")
        .agg(F.count("*").alias("n"), F.min("offset").alias("lo"), F.max("offset").alias("hi"))
        .collect()
    )
    assert per, "no partitions"
    for r in per:
        assert r.lo == 0 and r.hi == r.n - 1, f"offsets not dense in partition {r.partition}"
    key_parts = (
        frames.select(F.col("key").cast("string").alias("k"), "partition")
        .groupBy("k")
        .agg(F.countDistinct("partition").alias("np"))
        .agg(F.max("np").alias("mx"))
        .first()
    )
    assert key_parts.mx == 1
    frames.unpersist()


def test_kafka_compaction_tombstone_null_value_drops(spark):
    """A log-compaction tombstone is a kafka record with value=NULL —
    NOT a Debezium delete envelope. It must flow through the adapter and
    decode as a null payload that the after-image filter drops, never
    raise."""
    ev = _events(spark).limit(50)
    frames = synthesize_kafka_frames(ev)
    tomb = frames.limit(5).select(
        "key",
        F.lit(None).cast("binary").alias("value"),
        "topic",
        "partition",
        (F.col("offset") + 1_000_000).alias("offset"),
        "timestamp",
        "timestampType",
    )
    mixed = frames.unionByName(tomb)
    out = live_rows(from_kafka_source_frame(mixed))
    n_live_clean = live_rows(from_kafka_source_frame(frames)).count()
    assert out.count() == n_live_clean  # tombstones dropped, nothing else


def test_kafka_stream_path_availablenow(spark, tmp_path):
    """The streaming half: a directory of parquet files carrying the
    EXACT kafka source schema, read with readStream (declared schema,
    never inferred), through the same adapter + live_rows decode, must
    produce the batch path's row set."""
    ev = _events(spark).limit(500)
    frames = synthesize_kafka_frames(ev)
    src = os.path.join(str(tmp_path), "kafka_frames")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    frames.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(KAFKA_SOURCE_DDL).parquet(src)
    live = live_rows(from_kafka_source_frame(stream))
    q = (
        live.writeStream.format("memory")
        .queryName("kafka_wire_stream")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within 120s"
    got = {
        (r.event_id, r.op)
        for r in spark.table("kafka_wire_stream").select("event_id", "op").collect()
    }
    want = {
        (r.event_id, r.op)
        for r in live_rows(from_kafka_source_frame(frames)).select("event_id", "op").collect()
    }
    assert got == want and got


def test_image_extra_keeps_nonstring_types(spark):
    """image_extra columns carry their REAL type into the row-image
    struct and the null-image cast (ADVICE r12: a hardcoded StringType
    made a non-string extra column type-mismatch the when/otherwise
    branches). An int retry_count must survive the wire as a JSON
    number and decode back as a bigint under a widened schema."""
    ev = table(spark, SF_DIR, "events").limit(100)
    retry = F.when(F.col("event_id") % 3 == 0, F.col("event_id") * 2)
    wire = synthesize_envelopes(ev, image_extra={"retry_count": retry})
    # wire level: the value serializes as a bare number, not a string
    assert (
        wire.filter(F.col("raw_message").rlike('"retry_count":\\d')).count() > 0
    )
    assert wire.filter(F.col("raw_message").contains('"retry_count":"')).count() == 0
    schema = (
        "payload struct<op string, ts_ms bigint, "
        "before struct<event_id bigint, retry_count bigint>, "
        "after struct<event_id bigint, retry_count bigint>>"
    )
    dec = wire.select(F.from_json("raw_message", schema).alias("m")).select(
        "m.payload.after.event_id", "m.payload.after.retry_count"
    )
    good = dec.filter(
        (F.col("event_id") % 3 == 0)
        & (F.col("retry_count") == F.col("event_id") * 2)
    )
    assert good.count() == dec.filter(F.col("event_id") % 3 == 0).count() > 0


def test_schema_evolution_wire_shape_and_declared_decode(spark):
    """Additive-DDL wire fidelity (r11 verdict #6), next to the
    tombstone case above: pre-DDL envelopes must LACK the new key
    entirely (Debezium serializes what the table has at commit time —
    modeled by to_json's ignoreNullFields dropping the null), post-DDL
    envelopes must carry it, and ONE declared-schema decode
    (ENVELOPE_V2_SCHEMA) must read the mixed topic: NULL-filled
    channel on old rows, populated on new."""
    from promptly_data_pipelines_spark.cdc.envelope import ENVELOPE_V2_SCHEMA

    ev = table(spark, SF_DIR, "events")
    post_ddl = F.col("event_id") % 2 == 1
    channel = F.when(
        post_ddl,
        F.when(F.col("event_id") % 4 == 1, F.lit("web")).otherwise(F.lit("mobile")),
    )
    wire = synthesize_envelopes(
        ev, extra_cols=("event_id",), image_extra={"channel": channel}
    )
    # wire-level: the raw JSON text itself omits/carries the key
    shape = wire.select(
        (F.col("event_id") % 2 == 1).alias("is_post_ddl"),
        F.col("raw_message").contains('"channel"').alias("has_key"),
        (F.col("event_id") % 10 == 0).alias("is_delete"),
    )
    # delete envelopes carry the image in `before` — same rule applies
    assert shape.filter(F.col("is_post_ddl") != F.col("has_key")).count() == 0
    # declared-schema decode over the MIXED topic: one pass, no rewind
    dec = decode_envelopes(wire.drop("event_id"), schema=ENVELOPE_V2_SCHEMA)
    live = dec.filter(F.col("after").isNotNull()).select(
        "after.event_id", "after.channel"
    )
    bad_old = live.filter(
        (F.col("event_id") % 2 == 0) & F.col("channel").isNotNull()
    )
    bad_new = live.filter((F.col("event_id") % 2 == 1) & F.col("channel").isNull())
    assert bad_old.count() == 0 and bad_new.count() == 0
    # v1 declared decode still reads the mixed topic too (consumers
    # that have not redeployed keep working; they just don't see the
    # new column) — count parity with the widened decode
    v1 = decode_envelopes(wire.drop("event_id"))
    assert v1.filter(F.col("after").isNotNull()).count() == live.count()


def test_schema_evolution_streaming_decode(spark, tmp_path):
    """The same additive-DDL decode through the REAL streaming engine:
    a topic-directory of mixed-shape envelopes read with readStream
    and decoded under ENVELOPE_V2_SCHEMA (decode_envelopes is the
    single decode both paths share) must NULL-fill channel on pre-DDL
    rows and surface it on post-DDL rows — batch/stream parity on the
    schema-evolution path, availableNow-drained."""
    from promptly_data_pipelines_spark.cdc.envelope import ENVELOPE_V2_SCHEMA
    from promptly_data_pipelines_spark.cdc.streaming import RAW_STREAM_SCHEMA

    ev = table(spark, SF_DIR, "events").limit(400)
    post_ddl = F.col("event_id") % 2 == 1
    channel = F.when(
        post_ddl,
        F.when(F.col("event_id") % 4 == 1, F.lit("web")).otherwise(F.lit("mobile")),
    )
    wire = synthesize_envelopes(ev, image_extra={"channel": channel})
    src = os.path.join(str(tmp_path), "topic")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    wire.write.mode("overwrite").json(src)

    stream = spark.readStream.schema(RAW_STREAM_SCHEMA).json(src)
    decoded = decode_envelopes(stream, schema=ENVELOPE_V2_SCHEMA)
    live = decoded.filter(F.col("after").isNotNull()).select(
        F.col("after.event_id").alias("event_id"),
        F.col("after.channel").alias("channel"),
    )
    q = (
        live.writeStream.format("memory")
        .queryName("evolution_stream")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within 120s"
    rows = spark.table("evolution_stream").collect()
    assert rows
    for r in rows:
        if r.event_id % 2 == 1:
            assert r.channel == ("web" if r.event_id % 4 == 1 else "mobile")
        else:
            assert r.channel is None
    # exact parity with the batch decode over the same directory
    batch = decode_envelopes(
        spark.read.schema(RAW_STREAM_SCHEMA).json(src), schema=ENVELOPE_V2_SCHEMA
    ).filter(F.col("after").isNotNull())
    assert batch.count() == len(rows)

"""Structured Streaming forms of the CDC path (SURVEY.md §2h).

The reference's "streaming" is batch-over-Kafka (Trino re-reads the
topic each run). At 100 TB/day that is untenable — the scale mode is a
real readStream with incremental state. These functions apply the SAME
transforms as cdc.batch (decode_envelopes, latest_wins) to streaming
DataFrames; tests drive them with a file source + availableNow
trigger, production would use ``format("kafka")``:

    spark.readStream.format("kafka")
         .option("kafka.bootstrap.servers", ...)
         .option("subscribe", "cdc.public.provider")   # source.yaml:8-9
         .load()
         .select(col("value").cast("string").alias("raw_message"),
                 col("timestamp").alias("kafka_timestamp"))

— the Kafka ``timestamp`` column is the Trino connector's
``_timestamp`` internal column (kafka.properties:8).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..registry import query
from .batch import merge_upsert_frames
from .envelope import decode_envelopes, synthesize_envelopes

RAW_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("raw_message", T.StringType()),
        T.StructField("kafka_timestamp", T.TimestampType()),
    ]
)


def read_envelope_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stand-in for the Kafka topic: a directory of JSON
    lines with the raw envelope per row. Explicit schema — streaming
    sources never infer."""
    return spark.readStream.schema(RAW_STREAM_SCHEMA).json(path)


def live_rows(stream: DataFrame) -> DataFrame:
    """Decode + tombstone-filter (T1+T2), streaming-safe (stateless
    select/filter — identical semantics to the batch path)."""
    decoded = decode_envelopes(stream)
    return decoded.filter(F.col("after").isNotNull()).select(
        "op",
        F.timestamp_millis("ts_ms").alias("ts"),
        F.col("after.event_id").alias("event_id"),
        F.col("after.user_id").alias("user_id"),
        F.col("after.event_type").alias("event_type"),
        F.col("after.value").alias("value"),
    )


def tumbling_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """T5 streaming form: watermarked 1-hour tumbling windows. The
    watermark bounds state: windows older than max(event time) -
    watermark are finalized and evicted."""
    rows = live_rows(stream)
    return (
        rows.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_counts(stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """T6 streaming form: native session windows with an inactivity gap
    (F.session_window merges overlapping per-key windows in state)."""
    rows = live_rows(stream)
    return (
        rows.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def enrich_with_dim(live: DataFrame, dim: DataFrame, on: str, how: str = "left") -> DataFrame:
    """Stream-static join: enrich the CDC stream with a batch dim table
    (the curated_provider.sql:66-68 join, streaming edition). The
    static side is re-read per micro-batch (picks up dim updates
    between batches); Spark broadcasts it when small. No watermark
    needed — stream-static joins are stateless."""
    return live.join(dim, on, how)


def route_by_op(decoded: DataFrame) -> dict[str, DataFrame]:
    """T3: op-type routing (provider.json:21 op ∈ c|u|d|r). Returns one
    branch per operation class — upserts (c/u/r, with the row image
    from ``after``) and deletes (d, keyed from ``before``). Works on
    batch and streaming frames alike; in foreachBatch the two branches
    become the WHEN MATCHED UPDATE / WHEN MATCHED DELETE arms of a
    storage MERGE."""
    upserts = decoded.filter(F.col("op").isin("c", "u", "r")).select(
        "op",
        F.timestamp_millis("ts_ms").alias("ts"),
        F.col("after.event_id").alias("event_id"),
        F.col("after.user_id").alias("user_id"),
        F.col("after.event_type").alias("event_type"),
        F.col("after.value").alias("value"),
    )
    deletes = decoded.filter(F.col("op") == "d").select(
        "op",
        F.timestamp_millis("ts_ms").alias("ts"),
        F.col("before.event_id").alias("event_id"),
    )
    return {"upserts": upserts, "deletes": deletes}


def upsert_sink(stream: DataFrame, target_path: str, checkpoint: str, key: str = "event_id"):
    """T3/S6 streaming form: foreachBatch MERGE. Each micro-batch is
    compacted latest-wins against the current target snapshot and the
    result atomically replaces it. On Iceberg/Delta this body becomes a
    single ``MERGE INTO`` (reference declares exactly that intent:
    raw_provider_postgres.sql:9-10); plain-parquet rewrite keeps the
    harness storage-free. Partitioned targets would rewrite only
    touched partitions (dynamic partition overwrite)."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # Only a MISSING target means first batch. Anything else —
        # corrupt snapshot, schema mismatch in the union, transient IO —
        # must propagate: swallowing it here would overwrite the
        # accumulated snapshot with just this micro-batch (silent loss).
        from ..operators.fs import FileSystemOps

        if FileSystemOps(spark).exists(target_path):
            snapshot = spark.read.parquet(target_path)
            merged = merge_upsert_frames(snapshot, batch_df, key)
        else:
            merged = batch_df
        # localCheckpoint materializes before overwrite (can't lazily
        # read and overwrite the same path in one job)
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(target_path)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


@query(
    "stream_exec_tumbling",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    WHERE event_id % 10 <> 0
    GROUP BY 1, 2
    """,
)
def stream_exec_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5, executed by the REAL Structured Streaming engine (not the
    batch twin): synthesized Debezium envelopes are staged as JSON
    files, read back with ``spark.readStream`` (file source — the
    harness's Kafka stand-in, schema declared, never inferred), decoded
    + tombstone-filtered by ``live_rows``, aggregated by
    ``tumbling_counts`` (watermarked 1-hour windows), and run with
    ``trigger(availableNow=True)`` into a memory sink. The oracle is
    the tumbling-counts aggregation over live (non-delete) events —
    identical semantics to ``stream_tumbling_counts`` minus tombstones,
    which the streaming path drops (raw_provider_postgres.sql:22).

    Complete output mode: with availableNow every event arrives before
    the watermark first advances, so nothing is late — complete mode
    emits every window and the result equals the batch aggregation
    deterministically regardless of how the file source batches input.
    At scale this same query runs continuously against
    ``format("kafka")`` with append mode + the watermark bounding
    state; the memory sink holds only the aggregated windows
    (hours × event_types), never raw events.
    """
    base = os.path.join(
        tempfile.gettempdir(),
        f"pdp_stream_exec_{os.path.basename(sf_dir)}_"
        f"{spark.sparkContext.applicationId.replace(':', '_')}",
    )
    src, ckpt = os.path.join(base, "src"), os.path.join(base, "ckpt")
    # A stale checkpoint would mark the staged files already-processed
    # and availableNow would terminate with zero batches — always start
    # from a fresh checkpoint for this bounded re-runnable query.
    shutil.rmtree(base, ignore_errors=True)
    ev = table(spark, sf_dir, "events")
    synthesize_envelopes(ev).write.json(src)
    agg = tumbling_counts(read_envelope_stream(spark, src))
    sink_name = f"pdp_stream_exec_{os.path.basename(sf_dir)}".replace(".", "_")
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_name).select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def late_drop_counts(stream: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """T6 watermark/late-data streaming form — the twin of the
    oracle-checked batch query cdc.batch.stream_late_drop: tumbling
    hourly counts with ``withWatermark(delay)``, so events arriving
    after the watermark passed their window are DROPPED from the
    aggregation and state for finalized windows is evicted. The batch
    twin reproduces exactly this micro-batch watermark advance
    deterministically (arrival order = event_id, batches of 100)."""
    rows = live_rows(stream)
    return (
        rows.withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )

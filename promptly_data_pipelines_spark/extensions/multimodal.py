"""Multimodal column plumbing (SURVEY.md §2j X7 / north-star).

Media (image/audio/video) travels as an opaque ``binary`` column plus
typed metadata; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each Python invocation processes a whole record
batch, never a row. The actual codec step is STUBBED — the container
has no image/audio libraries — behind ``decode_media``, which raises
``NotImplementedError`` for real codecs and provides a deterministic
fake ("bytestats") so the Spark-side plumbing (schema, batching,
partitioning) is real and tested end-to-end.

The harness has no binary fixture, so media bytes are synthesized
deterministically from ``documents.text`` (utf-8 encode) — standing in
for e.g. a JPEG payload column.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..registry import query

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("last_byte", T.IntegerType()),
        T.StructField("byte_sum_mod", T.IntegerType()),
    ]
)


def decode_media(payload: bytes, media_type: str) -> dict:
    """The codec boundary. Real decoders (PIL/librosa/av) are not in
    this container — attempting them raises; the 'bytestats' fake is
    deterministic and exercises the full Arrow round-trip."""
    if media_type == "bytestats":
        return {
            "n_bytes": len(payload),
            "first_byte": payload[0] if payload else -1,
            "last_byte": payload[-1] if payload else -1,
            "byte_sum_mod": sum(payload) % 256,
        }
    raise NotImplementedError(
        f"codec for media_type={media_type!r} not available in this environment "
        "(image/audio libraries not installed); plug a real decoder in here"
    )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → synthetic binary payload column (the opaque
    media bytes + typed metadata shape)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lit("bytestats").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: one Python call per Arrow batch;
    partitioning of the input is preserved (no shuffle)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_media(p, mt) for p, mt in zip(pdf["payload"], pdf["media_type"])]
            out = pd.DataFrame(feats)
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(batches, FEATURE_SCHEMA)


@query("multimodal_features")  # byte-level UDF pipeline: rows-only check
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7/north-star: binary media column → Arrow-batched feature
    extraction → typed feature frame. The stub codec keeps it
    deterministic; swapping in a real decoder changes only
    ``decode_media``."""
    return extract_features(media_table(spark, sf_dir))


@query(
    "json_props_struct",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS INTEGER) AS k,
           CASE WHEN CAST(props->>'$.k' AS INTEGER) >= 50 THEN 'high' ELSE 'low' END AS k_band
    FROM events
    WHERE props IS NOT NULL
    """,
)
def json_props_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: typed access into a semi-structured props column via
    from_json with a declared schema (multimodal metadata travels the
    same way: typed struct next to the opaque payload)."""
    ev = table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    parsed = ev.withColumn("p", F.from_json("props", "k int"))
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.when(F.col("p.k") >= 50, "high").otherwise("low").alias("k_band"),
    )

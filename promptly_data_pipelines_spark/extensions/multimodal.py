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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: mapInPandas with the output schema a real
    image resize would produce (typed dims + new payload). The codec
    is stubbed: 'bytestats' payloads are deterministically re-sampled
    to width*height bytes (stride sampling — the shape of a nearest-
    neighbor downscale); real image types raise NotImplementedError
    in decode_media. Partitioning preserved, one Python call per
    Arrow batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in it:
            out_payloads = []
            for p, mt in zip(pdf["payload"], pdf["media_type"]):
                if mt != "bytestats":
                    decode_media(p, mt)  # raises: codec not available
                stride = max(1, len(p) // target) if len(p) else 1
                out_payloads.append(bytes(p[::stride][:target]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": pdf["media_type"].values,
                    "width": width,
                    "height": height,
                    "payload": out_payloads,
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 16, frame_size: int = 32) -> DataFrame:
    """Frame-sampling plumbing (video → every Nth frame): one input
    row explodes to multiple typed frame rows. The stub treats the
    payload as a concatenation of fixed-size 'frames' and emits every
    Nth — the row-expansion shape (and batch-size behavior) of real
    video sampling, with the decoder swappable at decode_media."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p, mt in zip(pdf["doc_id"], pdf["payload"], pdf["media_type"]):
                if mt != "bytestats":
                    decode_media(p, mt)
                n_frames = max(1, len(p) // frame_size)
                for idx in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "frame_bytes": bytes(p[idx * frame_size : (idx + 1) * frame_size]),
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return media.mapInPandas(batches, FRAME_SCHEMA)


@query("multimodal_resize", registered=False)  # stub codec: rows-only check
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star: media resize over mapInPandas (stubbed codec,
    real Spark plumbing — schema, Arrow batching, partitioning)."""
    return resize_media(media_table(spark, sf_dir), 8, 8)


@query("multimodal_frame_sample", registered=False)  # stub codec: rows-only check
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star: frame sampling over mapInPandas — 1→N row expansion
    with typed frame rows (stubbed decoder)."""
    return sample_frames(media_table(spark, sf_dir), every_n=4)


@query("multimodal_features", registered=False)  # byte-level UDF pipeline: rows-only check
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


@query("multimodal_pipeline")  # stub codec: rows-only check
def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 composite (driver row for the multimodal family; the three
    single-stage queries above are local-only): the full media pipeline
    chained — binary payload → resize (mapInPandas, typed dims) →
    feature extraction (Arrow-batched decode) joined with frame
    sampling (1→N row expansion) aggregated back per doc. All three
    Pandas-UDF stages execute in one plan; the codec is the documented
    deterministic stub, the Spark plumbing (schemas, Arrow batching,
    partition preservation, row expansion) is real. At 100 TB each
    stage is embarrassingly parallel over media partitions; the only
    shuffle is the per-doc frame-count aggregation."""
    media = media_table(spark, sf_dir)
    resized = resize_media(media, 8, 8)
    feats = extract_features(resized.select("doc_id", "media_type", "payload"))
    frames = sample_frames(resized.select("doc_id", "media_type", "payload"), every_n=4)
    frame_stats = frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.max("frame_idx").alias("max_frame_idx"),
    )
    return feats.join(frame_stats, "doc_id").select(
        "doc_id",
        "media_type",
        "n_bytes",
        "first_byte",
        "last_byte",
        "byte_sum_mod",
        "n_frames",
        "max_frame_idx",
    )

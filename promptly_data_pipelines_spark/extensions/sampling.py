"""Reproducible sampling & dataset splitting (north-star: what a
training-data pipeline runs right before export). Everything here is
HASH-based, not RNG-based: `df.sample()` draws differ per run,
partitioning, and engine — hash sampling gives the same subset on
every engine and every rerun (and documents itself: the predicate IS
the sample definition). md5 is the hash because both engines compute
identical digests; at 100 TB swap in xxhash64 (cheaper, JVM-side)
once cross-engine parity is no longer needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


def hash_bucket(col, n_buckets: int = 256):
    """Deterministic [0, n_buckets) bucket from the md5 of a key's
    string form (first 2 hex chars → 0..255)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 2), 16, 10).cast("int") % n_buckets


@query(
    "sample_hash",
    registered=False,
    oracle="""
    SELECT event_id, event_type, value
    FROM events
    WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 2)) AS INTEGER) < 26
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% reproducible sample (hash bucket < 26 of 256). Pushed to
    the scan as a cheap deterministic predicate — no RNG state, no
    sampling skew across partitions, same rows on every engine/rerun."""
    ev = table(spark, sf_dir, "events")
    return ev.filter(hash_bucket("event_id") < 26).select("event_id", "event_type", "value")


@query(
    "dataset_split",
    oracle="""
    WITH assigned AS (
      SELECT event_id, event_type,
             CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 2)) AS INTEGER) AS bucket
      FROM events
    )
    SELECT event_id, event_type,
           CASE WHEN bucket < 205 THEN 'train'
                WHEN bucket < 230 THEN 'val'
                ELSE 'test' END AS split,
           (bucket < 26) AS in_sample10
    FROM assigned
    """,
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test assignment (~80/10/10 by hash
    bucket) plus a ~10% hash-sample flag (the sample_hash predicate,
    local-only above) — the driver row for the whole hash-sampling
    family. Row-level output: a row's split and sample membership never
    change as the dataset grows — the property RNG splits lack — so
    incremental exports stay consistent across runs. The bucket
    predicate is a cheap deterministic expression that pushes to the
    scan; no RNG state, no per-partition skew."""
    ev = table(spark, sf_dir, "events")
    b = hash_bucket("event_id")
    split = F.when(b < 205, "train").when(b < 230, "val").otherwise("test")
    return ev.select(
        "event_id",
        "event_type",
        split.alias("split"),
        (b < 26).alias("in_sample10"),
    )


@query(
    "sample_stratified_cap",
    oracle="""
    SELECT label, vec_id FROM (
      SELECT label, vec_id,
             row_number() OVER (
               PARTITION BY label
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
      FROM embeddings
    ) WHERE rn <= 20
    """,
)
def sample_stratified_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling: at most 20 rows per label, selected in
    hash order (a deterministic 'random' order — class balancing for
    training sets). Window per label → distributes by strata; the
    rank-limit is pushed into the sort (WindowGroupLimit)."""
    e = table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("label", "vec_id")
    )

"""Physical data layout for scan efficiency — clustering + DPP.

At 100 TB the fastest scan is the one that never happens. Two layout
levers make Spark's parquet reader skip data instead of reading it:

1. **Clustered writes** (``clustered_write``): sort rows by the
   dominant filter columns WITHIN each partition before writing.
   Parquet keeps min/max statistics per row group; on a sorted file
   those ranges are narrow and disjoint, so a point or range filter
   matches a handful of row groups and the reader skips the rest
   (the same reason Iceberg/Delta offer sort/Z-ordering). Unsorted
   data has every row group spanning the full value range — stats
   exist but never exclude anything.
2. **Dynamic partition pruning**: a join against a filtered dimension
   prunes the fact scan's partition directories AT RUNTIME with the
   dim-side join keys (Spark inserts a ``dynamicpruningexpression``
   into the scan's partition filters). Declaring the join + filter is
   enough — no hand-written IN-list — and the 100-TB fact table is
   read only for the days the dim selects. Pinned in
   tests/test_plan_quality.py.

The reference leans on the same ideas declaratively: its raw tables
are date-partitioned parquet (raw_provider_postgres.sql:4-6) and its
models filter by ingestion date.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import date_key
from ..registry import query
from .scans import _session_tag


def clustered_write(
    df: DataFrame,
    dst_dir: str,
    partition_col: str,
    cluster_cols: list[str],
    files_per_partition: int = 1,
) -> None:
    """Write ``df`` date-partitioned with rows range-clustered by
    ``cluster_cols`` inside each partition.

    repartition on the partition column co-locates each partition's
    rows (avoiding the writers×partitions small-file blowup), then an
    in-task sort orders them by the cluster key — a local sort, no
    extra shuffle — so every row group's min/max on the cluster
    columns is a narrow slice of the value space."""
    (
        df.repartition(files_per_partition * 8, F.col(partition_col))
        .sortWithinPartitions(partition_col, *cluster_cols)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(dst_dir)
    )


@query(
    "layout_clustered_scan",
    registered=False,  # registered window full; pytest oracle-parity covers it
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           strftime(ts, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    WHERE user_id % 1000 = 7
    GROUP BY 1, 2
    """,
)
def layout_clustered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events clustered by user_id within day partitions, then
    run the selective per-user readback the layout is built for. The
    values must match the straight source scan exactly — layout moves
    bytes, never values; the row-group skipping itself is pinned by
    tests/test_layout.py via parquet statistics."""
    dst = os.path.join(
        tempfile.gettempdir(),
        f"pdp_layout_{os.path.basename(sf_dir.rstrip('/'))}_{_session_tag(spark)}",
    )
    ev = table(spark, sf_dir, "events").withColumn("day", date_key("ts"))
    clustered_write(ev, dst, "day", ["user_id"])
    back = spark.read.parquet(dst).filter(F.col("user_id") % 1000 == 7)
    return back.groupBy("user_id", F.col("day").cast("string").alias("day")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def dpp_fact_dim_join(
    spark: SparkSession, fact_dir: str, dim: DataFrame, on: str
) -> DataFrame:
    """Join a partitioned parquet fact against a filtered dimension so
    Spark's dynamic partition pruning restricts the fact scan to the
    dim's join keys at runtime. The caller filters ``dim``; this
    function only declares the equi-join — the pruning subquery is
    Catalyst's job, and the plan pin asserts it happened."""
    fact = spark.read.parquet(fact_dir)
    return fact.join(F.broadcast(dim), on)

"""Bucketed tables — pre-shuffled co-location for recurring joins.

The reference declares one physical-layout lever: date partitioning on
its Iceberg raw tables (`dbt/promptly/models/raw/raw_provider_postgres.sql:5`
``partitioned_by = ["ingestion_cdc_date"]``), and its Iceberg catalog
(`infra/trino/etc/catalog/iceberg.properties:1-5`) supports the
``bucket(n, col)`` partition transform for join co-location. Spark's
native equivalent is the bucketed table: ``bucketBy(n, key)`` at write
time records a hash-distribution contract in the catalog, and every
later equi-join or aggregation ON that key reads the buckets
co-located — **no Exchange in the plan**. At 100 TB this is the
highest-leverage join optimization that exists: the fact table's
shuffle is paid ONCE at ingest (where a write shuffle was needed
anyway to control file counts) and amortized over every downstream
join/groupBy on the key, instead of re-paid per query.

Mechanics that make the plan optimal (pinned in
tests/test_bucketing.py):

- ``repartition(n, key)`` before the write aligns the task layout
  with the bucket function (both use Murmur3 on the key), so each
  bucket is exactly ONE file — no per-bucket small-file fan-out from
  many writer tasks, and the layout a future sort-order-aware reader
  needs. (Spark ≥3.0 ignores ``sortBy`` order at read time by
  default, so the merge join keeps its in-partition Sort nodes —
  cheap local sorts; the Exchange is the cost that matters and it is
  gone.)
- An equi-join of two tables bucketed n-ways on their join keys
  satisfies both children's required HashPartitioning → zero
  Exchange; a groupBy on the bucket key is likewise exchange-free.
- A point filter on the bucket key prunes the scan to a single
  bucket (``SelectedBucketsCount: 1 out of n``) — the bucketed
  analogue of partition pruning, without a directory per key. The
  planner only keeps bucketed layout for scans that profit from it
  (``autoBucketedScan``); flip that conf off to force bucket-pruned
  point reads, as the plan test demonstrates.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from .scans import _session_tag


def sink_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    n_buckets: int,
    key: str,
) -> None:
    """Write ``df`` as an external bucketed parquet table at ``path``.

    The pre-write ``repartition(n, key)`` uses the same Murmur3 hash
    as the bucket function, so every writer task holds exactly one
    bucket's rows → one file per bucket (no writers×buckets
    small-file fan-out). ``sortBy(key)`` orders rows within each
    bucket — narrow row-group stats on the key for free, and the
    layout sort-order-aware readers need."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.repartition(n_buckets, F.col(key))
        .write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    )


def _safe_name(raw: str) -> str:
    """Catalog identifiers allow [a-z0-9_]; scratch tags (appId, sf
    basename) carry '.', '-' and ':' — fold them to '_'."""
    return re.sub(r"[^A-Za-z0-9_]", "_", raw)


def stage_bucketed_pair(
    spark: SparkSession, sf_dir: str, n_buckets: int = 16
) -> tuple[str, str]:
    """Stage orders+lineitem as bucketed tables on the order key
    (idempotent per session+sf: re-runs overwrite in place). Returns
    the two table names."""
    tag = _safe_name(f"{os.path.basename(sf_dir.rstrip('/'))}_{_session_tag(spark)}")
    base = os.path.join(tempfile.gettempdir(), f"pdp_bucketed_{tag}")
    li_name, o_name = f"pdp_bkt_lineitem_{tag}", f"pdp_bkt_orders_{tag}"
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    sink_bucketed(li, li_name, os.path.join(base, "lineitem"), n_buckets, "l_orderkey")
    sink_bucketed(o, o_name, os.path.join(base, "orders"), n_buckets, "o_orderkey")
    return li_name, o_name


def bucketed_order_join(spark: SparkSession, li_name: str, o_name: str) -> DataFrame:
    """Per-order rollup ⋈ orders, both sides bucketed on the order
    key: the groupBy satisfies its distribution from the bucketed
    scan and the merge join reads co-located, pre-sorted buckets —
    the whole fact path runs without one Exchange (pinned)."""
    rev = (
        spark.table(li_name)
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )
    return rev.join(
        spark.table(o_name).hint("merge"),
        rev["l_orderkey"] == F.col("o_orderkey"),
    )


@query(
    "join_bucketed",
    oracle="""
    WITH rev AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items,
             round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(n_items) AS BIGINT) AS sum_items,
           round(sum(sum_qty), 2) AS total_qty
    FROM rev JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J5 at ingest-amortized cost: stage the fact pair bucketed on
    the join key, then run rollup→join→summary where the only Exchange
    in the whole plan is the final 5-row priority summary. Values must
    equal the plain shuffled join — bucketing moves bytes at write
    time, never values. Rounding discipline per agg_group: per-order
    quantity sums are exact at 2dp; the outer sum re-rounds at 2dp."""
    li_name, o_name = stage_bucketed_pair(spark, sf_dir)
    j = bucketed_order_join(spark, li_name, o_name)
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum("n_items").alias("sum_items"),
        F.round(F.sum("sum_qty"), 2).alias("total_qty"),
    )

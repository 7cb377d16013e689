"""Bucketed-table invariants (operators/bucketing.py): the staged pair
joins and pre-aggregates with zero Exchange, each bucket is one file,
and point reads prune to a single bucket. Value-level equality is
covered by the oracle-parity suite (join_bucketed)."""

from __future__ import annotations

import contextlib
import glob
import io
import os

from pyspark.sql import functions as F

from conftest import SF_DIR

from promptly_data_pipelines_spark.operators.bucketing import (
    bucketed_order_join,
    stage_bucketed_pair,
)


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark):
    """rollup→join over the bucketed pair: the groupBy draws its
    distribution from the bucketed scan and the merge join reads
    co-located buckets — no Exchange anywhere in the fact path."""
    li, o = stage_bucketed_pair(spark, SF_DIR)
    j = bucketed_order_join(spark, li, o)
    p = _formatted(j)
    assert "SortMergeJoin" in p
    assert "Exchange" not in p, "bucketed fact path still shuffles"
    # the end-to-end summary adds exactly ONE exchange: the 5-row
    # priority rollup (formatted output prints each node twice —
    # tree line + detail header)
    full = j.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))
    pf = _formatted(full)
    assert pf.count("Exchange") <= 2, pf


def test_one_file_per_bucket(spark):
    """The pre-write repartition aligns tasks with the bucket hash:
    exactly n_buckets data files, so no writers×buckets fan-out."""
    li, _ = stage_bucketed_pair(spark, SF_DIR, n_buckets=16)
    loc = spark.sql(f"DESCRIBE TABLE EXTENDED {li}").filter(
        F.col("col_name") == "Location"
    ).first()["data_type"]
    files = glob.glob(os.path.join(loc.removeprefix("file:"), "*.parquet"))
    assert len(files) == 16, f"expected 16 bucket files, found {len(files)}"


def test_point_read_prunes_to_one_bucket(spark):
    """With autoBucketedScan off (the planner otherwise reverts scans
    that avoid no exchange to plain file reads), a bucket-key point
    filter reads 1 of 16 buckets."""
    li, _ = stage_bucketed_pair(spark, SF_DIR, n_buckets=16)
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        p = _formatted(spark.table(li).filter(F.col("l_orderkey") == 1))
        assert "SelectedBucketsCount: 1 out of 16" in p, p
    finally:
        spark.conf.set(key, prev)


def test_bucketed_values_equal_plain_join(spark):
    """Bucketing moves bytes at write time, never values."""
    li, o = stage_bucketed_pair(spark, SF_DIR)
    j = bucketed_order_join(spark, li, o).select(
        "l_orderkey", "n_items", "sum_qty", "o_orderpriority"
    )
    from promptly_data_pipelines_spark.catalog import table

    plain = (
        table(spark, SF_DIR, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .join(
            table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "n_items", "sum_qty", "o_orderpriority")
    )
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))

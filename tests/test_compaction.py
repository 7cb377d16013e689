"""Compaction invariants (operators/compaction.py): file counts shrink
toward the computed plan, no file exceeds the target size, values are
untouched, and hot partitions split across multiple files. Value-level
equality vs the source is covered by the oracle-parity suite
(compact_small_files)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from promptly_data_pipelines_spark.catalog import table
from promptly_data_pipelines_spark.functions import date_key
from promptly_data_pipelines_spark.operators.compaction import (
    compact_partitioned,
    file_census,
)


def _write_fragmented(spark, frag: str, writers: int) -> None:
    ev = table(spark, SF_DIR, "events").withColumn("day", date_key("ts"))
    ev.repartition(writers).write.mode("overwrite").partitionBy("day").parquet(frag)


def test_compaction_shrinks_files_and_preserves_values(spark):
    base = os.path.join(tempfile.gettempdir(), "pdp_compact_test")
    shutil.rmtree(base, ignore_errors=True)
    frag, out = os.path.join(base, "frag"), os.path.join(base, "out")
    _write_fragmented(spark, frag, writers=16)

    before = file_census(spark, frag)
    plan = compact_partitioned(spark, frag, out, "day", target_rows_per_file=50_000)
    after = file_census(spark, out)

    # fragmented: ~16 files per day; compacted: at least the planned
    # count (task-layout collisions may add a file, never remove one)
    assert before["files_per_partition"] > 4
    planned = {r["day"]: r["n_files"] for r in plan.collect()}
    per_day: dict[str, int] = {}
    for f in spark.read.parquet(out).inputFiles():
        day = os.path.basename(os.path.dirname(f)).split("=", 1)[1]
        per_day[day] = per_day.get(day, 0) + 1
    assert set(per_day) == set(planned)
    assert all(per_day[d] >= planned[d] for d in planned)
    assert after["n_files"] < before["n_files"]

    # content identity: same rows, nothing lost or duplicated (float
    # sum compared approximately — summation order legitimately moves)
    a = spark.read.parquet(frag).groupBy().agg(
        F.count("*"), F.sum("value"), F.countDistinct("event_id")
    ).first()
    b = spark.read.parquet(out).groupBy().agg(
        F.count("*"), F.sum("value"), F.countDistinct("event_id")
    ).first()
    assert (a[0], a[2]) == (b[0], b[2])
    assert a[1] == pytest.approx(b[1], rel=1e-9)


def test_null_partition_rows_survive_compaction(spark):
    """Rows whose partition value is NULL (__HIVE_DEFAULT_PARTITION__)
    must be rewritten like any other — the plan join is null-safe, so
    compaction can never silently drop them."""
    base = os.path.join(tempfile.gettempdir(), "pdp_compact_null")
    shutil.rmtree(base, ignore_errors=True)
    frag, out = os.path.join(base, "frag"), os.path.join(base, "out")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, None)], "row_id long, part string"
    )
    df.repartition(2).write.partitionBy("part").parquet(frag)
    plan = compact_partitioned(spark, frag, out, "part", target_rows_per_file=10)
    assert {(r["part"], r["n_rows"]) for r in plan.collect()} == {("a", 2), (None, 2)}
    back = spark.read.parquet(out)
    assert back.count() == 4
    assert back.filter(F.col("part").isNull()).count() == 2


def test_hot_partition_splits_and_respects_file_size(spark):
    """A partition bigger than target must split into >1 file, and NO
    output file may exceed the target row count (the writer's
    maxRecordsPerFile bound, independent of task layout)."""
    base = os.path.join(tempfile.gettempdir(), "pdp_compact_hot")
    shutil.rmtree(base, ignore_errors=True)
    frag, out = os.path.join(base, "frag"), os.path.join(base, "out")
    _write_fragmented(spark, frag, writers=8)
    target = 10
    plan = compact_partitioned(spark, frag, out, "day", target_rows_per_file=target)
    multi = [r for r in plan.collect() if r["n_files"] > 1]
    assert multi, "fixture has no partition above target size — lower the target"
    census = file_census(spark, out)
    assert census["files_per_partition"] > 1
    for f in spark.read.parquet(out).inputFiles():
        path = f.removeprefix("file:")
        assert pq.ParquetFile(path).metadata.num_rows <= target

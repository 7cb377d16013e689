"""Schema-evolution invariants (operators/evolution.py): the declared
target schema fills missing columns with NULL and prunes extras; the
discovery path (mergeSchema) agrees on the union. Aggregate parity is
covered by the oracle suite (scan_schema_evolution)."""

from __future__ import annotations

import os
import shutil
import tempfile

from promptly_data_pipelines_spark.operators.evolution import (
    read_merged,
    read_with_target_schema,
)


def _stage(spark, base: str) -> None:
    shutil.rmtree(base, ignore_errors=True)
    spark.createDataFrame([(1, 10.0)], "k long, v double").write.parquet(
        os.path.join(base, "gen=1")
    )
    spark.createDataFrame(
        [(2, 20.0, "new", "extra")], "k long, v double, tag string, debug string"
    ).write.parquet(os.path.join(base, "gen=2"))


def test_target_schema_null_fills_and_prunes(spark):
    base = os.path.join(tempfile.gettempdir(), "pdp_evo_test")
    _stage(spark, base)
    df = read_with_target_schema(spark, base, "k long, v double, tag string")
    # declared columns in declared order; the gen=N dir still surfaces
    # as a partition column, but the file-level `debug` is pruned
    names = [f.name for f in df.schema.fields]
    assert names[:3] == ["k", "v", "tag"] and "debug" not in names
    rows = {r["k"]: (r["v"], r["tag"]) for r in df.collect()}
    assert rows == {1: (10.0, None), 2: (20.0, "new")}


def test_merge_schema_discovers_union(spark):
    base = os.path.join(tempfile.gettempdir(), "pdp_evo_test2")
    _stage(spark, base)
    df = read_merged(spark, base)
    assert {f.name for f in df.schema.fields} >= {"k", "v", "tag", "debug"}
    assert df.count() == 2

"""The core correctness gate, mirroring the driver: every registered
query with an oracle is executed on Spark and DuckDB at sf0.001 and
compared (columns, row count, order-insensitive values). Queries
without an oracle are smoke-run (schema resolves, executes, returns a
well-formed frame)."""

from __future__ import annotations

import os

import pytest

from promptly_data_pipelines_spark.registry import (
    all_oracles,
    all_queries,
    local_only_oracles,
    local_only_queries,
)

from conftest import SF_DIR, assert_oracle_match

# Registered (driver-visible) and local-only tiers are parity-checked
# identically — the local tier keeps the fine-grained single-operator
# variants continuously verified even though the driver only sees the
# ≤50 composite set.
QUERIES = {**all_queries(), **local_only_queries()}
ORACLES = {**all_oracles(), **local_only_oracles()}


def _shard(names: list[str]) -> list[str]:
    """PDP_PARITY_SHARD=i/n splits the sweep across n pytest processes
    (each gets its own SparkSession — no xdist in this container, but
    two shard processes on 32 cpus halve the wall-clock the same way;
    see README 'Test suite'). Unset → the full list, unchanged."""
    excl = {n for n in os.environ.get("PDP_PARITY_EXCLUDE", "").split(",") if n}
    if excl:
        # tools/run_tests.py pulls the Python-DataSource streaming
        # queries out of the concurrent shards (they run serially
        # before the fan-out — the worker connect-back wait is a
        # hardcoded 10 s in spark-core and starves under 8 JVMs)
        names = [n for n in names if n not in excl]
    spec = os.environ.get("PDP_PARITY_SHARD")
    if not spec:
        return names
    i, n = (int(x) for x in spec.split("/"))
    return [name for k, name in enumerate(names) if k % n == i]


WITH_ORACLE = _shard(sorted(ORACLES))
ROWS_ONLY = _shard(sorted(set(QUERIES) - set(ORACLES)))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, oracle_con, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_oracle_match(df, oracle_con, ORACLES[name], name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_execute(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    rows = df.collect()
    assert df.columns, f"{name}: empty schema"
    assert rows is not None


def test_entry_smoke(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    out = e.entry(spark)
    assert out.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())

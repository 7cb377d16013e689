"""Shared fixtures: one SparkSession per test session + the DuckDB
oracle-compare harness that mirrors the driver protocol (row count,
column names, order-insensitive value comparison) so parity breaks
surface locally before the driver sees them."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from promptly_data_pipelines_spark.catalog import TABLES
from promptly_data_pipelines_spark.session import get_session

import os

SF_DIR = os.environ.get("PDP_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_collection_modifyitems(config, items):
    """PDP_MODULES_SHARD=i/n round-robins collected tests across n
    pytest processes by collection index — the same wall-clock split
    the parity sweep gets from PDP_PARITY_SHARD, for modules that
    aren't registry-parametrized (r16: test_modules.py became the
    564 s straggler). Collection order is stable for the same file
    set, so the shards are a provable partition; tools/run_tests.py
    launches each shard with the same file list and a different i."""
    spec = os.environ.get("PDP_MODULES_SHARD")
    if not spec:
        return
    i, n = (int(x) for x in spec.split("/"))
    keep, drop = [], []
    for k, it in enumerate(items):
        (keep if k % n == i else drop).append(it)
    items[:] = keep
    config.hook.pytest_deselected(items=drop)


@pytest.fixture(scope="session")
def spark():
    s = get_session("pdp-tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else v)
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last", kind="mergesort").reset_index(
            drop=True
        )
    return df


def assert_oracle_match(spark_df, con, sql: str, name: str = "query") -> None:
    got = _normalize(spark_df.toPandas())
    exp = _normalize(con.execute(sql).fetchdf())
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: row count {len(got)} vs {len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
            g = pd.to_numeric(g, errors="coerce").astype(float)
            e = pd.to_numeric(e, errors="coerce").astype(float)
            both_nan = g.isna() & e.isna()
            # exact equality: queries are required to round any value
            # whose accumulation order differs between engines
            eq = (g.values == e.values) | both_nan.values
            assert eq.all(), f"{name}: column {c} differs at rows {np.nonzero(~eq)[0][:5]}: " \
                f"{g.values[~eq][:5]} vs {e.values[~eq][:5]}"
        else:
            g2 = g.astype(str).where(~g.isna(), "<NULL>")
            e2 = e.astype(str).where(~e.isna(), "<NULL>")
            eq = (g2.values == e2.values)
            assert eq.all(), f"{name}: column {c} differs at rows {np.nonzero(~eq)[0][:5]}: " \
                f"{g2.values[~eq][:5]} vs {e2.values[~eq][:5]}"

"""Heavy-hitter invariants (extensions/heavyhitters.py): the MG
candidate pass survives aggressive eviction without losing a true
heavy hitter, counts are exact, the candidate stream is bounded by
k·P, and the recount joins by broadcast (the fact stream is never
shuffled for the match). Value parity vs DuckDB is covered by the
oracle-parity suite (agg_heavy_hitters)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from conftest import SF_DIR

from promptly_data_pipelines_spark.extensions.heavyhitters import (
    _mg_partition_candidates,
    heavy_hitters,
)


def _skewed_df(spark):
    """1000 rows in 2 partitions: 'a'×400, 'b'×300, 300 distinct
    singletons — hostile to a 4-counter table (constant eviction)."""
    rows = [("a",)] * 400 + [("b",)] * 300 + [(f"x{i}",) for i in range(300)]
    return spark.createDataFrame(rows, "key string").repartition(2)


def test_exact_under_constant_eviction(spark):
    """support=0.2 needs capacity ≥ 4; at exactly 4 the counter table
    thrashes on the 300 singletons yet must still surface a and b
    with EXACT counts, and nothing else."""
    df = _skewed_df(spark)
    got = {
        r["key"]: r["n_occurrences"]
        for r in heavy_hitters(df, "key", support=0.2, capacity=4).collect()
    }
    assert got == {"a": 400, "b": 300}


def test_candidate_stream_bounded_by_capacity(spark):
    """Each partition emits ≤ capacity candidate keys regardless of
    distinct-key cardinality — the O(k·P) shuffle contract."""
    df = _skewed_df(spark)
    cands = df.select("key").mapInPandas(
        _mg_partition_candidates("key", 4), schema="key string"
    )
    per_part = cands.withColumn("p", F.spark_partition_id()).groupBy("p").count()
    assert all(r["count"] <= 4 for r in per_part.collect())


def test_below_support_keys_excluded(spark):
    """A key at exactly the support boundary (count == n·s) is not a
    hitter — the contract is strictly-greater, matching HAVING >."""
    rows = [("hot",)] * 500 + [("edge",)] * 250 + [("cold",)] * 250
    df = spark.createDataFrame(rows, "key string").repartition(2)
    got = {r["key"] for r in heavy_hitters(df, "key", support=0.25).collect()}
    assert got == {"hot"}  # edge/cold are exactly 0.25·n, excluded


def test_recount_is_broadcast_and_column_pruned(spark):
    """The recount pass broadcasts the candidate set over the fact
    stream (no fact-side shuffle for the match) and the census scans
    read only the key column."""
    from promptly_data_pipelines_spark.catalog import table

    hh = heavy_hitters(table(spark, SF_DIR, "orders"), "o_custkey", support=1e-4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hh.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    for line in p.splitlines():
        if "ReadSchema" in line:
            assert "o_custkey" in line and "o_totalprice" not in line


def test_overflow_loops_until_table_fits():
    """Strictly-distinct counts are the worst case for subtract-min
    eviction (one pass removes only the min-tied entry): the overflow
    must loop until the table fits capacity, or the emitted candidate
    set breaks the O(k·P) contract. Pure-Python — no Spark."""
    import pandas as pd

    keys: list[str] = []
    for i, k in enumerate("abcdefghijkl"):
        keys += [k] * (i + 1)
    gen = _mg_partition_candidates("key", 4)
    (out,) = list(gen(iter([pd.DataFrame({"key": keys})])))
    assert len(out) <= 4
    # the heaviest keys must be the survivors
    assert set(out["key"]) <= {"i", "j", "k", "l"}


def test_null_keys_excluded_by_contract(spark):
    """A hot NULL is dq_not_null's finding, not a census row — NULLs
    are excluded from candidates/counts up front, not half-dropped by
    value_counts/join. The support DENOMINATOR is the full table
    (r13 review realigned it with the oracle's count(*)): 20 rows at
    support 0.25 → strict threshold 5 — a(6) publishes, b(4) does
    not, and NULL never appears however hot it is."""
    rows = [("a",)] * 6 + [(None,)] * 10 + [("b",)] * 4
    df = spark.createDataFrame(rows, "key string").repartition(2)
    got = {
        r["key"]: r["n_occurrences"]
        for r in heavy_hitters(df, "key", support=0.25).collect()
    }
    assert got == {"a": 6}


def test_support_base_counts_null_key_rows(spark):
    """The support threshold is a fraction of ALL rows — NULL-key rows
    included — matching the count(*) the GROUP BY/HAVING oracle
    thresholds on (r13 review: a null-filtered base would publish
    extra keys on any table with NULL FKs). 100 rows, 30 NULL keys:
    a key with 8 occurrences clears an 0.05 support of the non-null
    count (70·0.05=3.5… and of 100 → 5) but a key with 5 must NOT be
    published at support 0.05 of 100 (needs >5)."""
    from pyspark.sql import functions as F

    from promptly_data_pipelines_spark.extensions.heavyhitters import (
        heavy_hitters,
    )

    rows = (
        [(None,)] * 30
        + [(1,)] * 8   # > 5 -> published
        + [(2,)] * 5   # == 5 -> NOT published (strict >)
        + [(k,) for k in range(100, 157)]  # 57 singletons
    )
    df = spark.createDataFrame(rows, "k bigint")
    assert df.count() == 100
    got = {r.k: r.n_occurrences for r in heavy_hitters(df, "k", 0.05).collect()}
    assert got == {1: 8}

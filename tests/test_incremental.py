"""Incremental materialization invariants (pipelines/incremental.py).

The oracle-parity suite already checks final-result convergence
(incremental_rollup vs the full-recompute SQL); these tests pin the
*incremental* properties that a full-recompute comparison can't see:
exactly-once batch re-delivery, affected-day pruning, late-data
rebuilds, and the pushed-down high-water-mark extract.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from conftest import SF_DIR

from promptly_data_pipelines_spark.catalog import table
from promptly_data_pipelines_spark.pipelines.incremental import (
    arrival_batches,
    extract_new,
    incremental_run,
    read_state,
)


def _events(spark):
    return table(spark, SF_DIR, "events").select("event_id", "ts", "event_type", "value")


def _fresh_warehouse(name: str) -> str:
    wh = os.path.join(tempfile.gettempdir(), f"pdp_incr_test_{name}")
    shutil.rmtree(wh, ignore_errors=True)
    return wh


def _rollup(spark, wh):
    return spark.read.parquet(os.path.join(wh, "rollup", "daily"))


def test_redelivered_batch_is_noop(spark):
    wh = _fresh_warehouse("redeliver")
    b0, b1, _ = arrival_batches(_events(spark))
    incremental_run(spark, b0, "b0", wh)
    incremental_run(spark, b1, "b1", wh)
    before = {tuple(r) for r in _rollup(spark, wh).collect()}
    info = incremental_run(spark, b1, "b1", wh)  # re-delivery
    assert info["skipped"] is True
    after = {tuple(r) for r in _rollup(spark, wh).collect()}
    assert before == after
    assert read_state(os.path.join(wh, "_state.json"))["batches"] == ["b0", "b1"]


def test_affected_days_pruned_and_late_days_rebuilt(spark):
    wh = _fresh_warehouse("pruning")
    ev = _events(spark)
    b0, b1, b2 = arrival_batches(ev)
    info0 = incremental_run(spark, b0, "b0", wh)
    info1 = incremental_run(spark, b1, "b1", wh)
    all_days = {r[0] for r in ev.select(F.date_format("ts", "yyyy-MM-dd")).distinct().collect()}
    # a time-ordered batch touches a strict subset of the calendar —
    # the recompute is pruned, not a full rebuild
    assert 0 < len(info1["affected_days"]) < len(all_days)
    # batch 1 carries late rows (event_id %50 of batch-0 days): those
    # early days must be rebuilt again in run 1
    overlap = set(info0["affected_days"]) & set(info1["affected_days"])
    assert overlap, "late rows did not mark earlier days affected"
    # and the rebuilt early days now include the late rows: spot-check
    # one overlapping day against a direct recompute over b0+b1
    day = sorted(overlap)[0]
    got = (
        _rollup(spark, wh)
        .filter(F.col("day") == day)
        .agg(F.sum("n_events"))
        .first()[0]
    )
    want = (
        b0.unionByName(b1)
        .filter(F.date_format("ts", "yyyy-MM-dd") == day)
        .count()
    )
    assert got == want


def test_hwm_extract_pushes_down(spark):
    ev = _events(spark)
    hwm = "2024-01-02 00:00:00"
    plan = extract_new(ev, "ts", hwm)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(ts), GreaterThan(ts," in plan
    # and it actually bounds the extract
    assert extract_new(ev, "ts", hwm).count() == ev.filter(F.col("ts") > F.lit(hwm)).count()


def test_stream_redelivery_is_noop(spark):
    """Re-running the whole streaming job over the SAME warehouse with
    a fresh checkpoint re-delivers every micro-batch id — the batch-id
    state must turn all of them into no-ops (the foreachBatch
    exactly-once contract)."""
    from promptly_data_pipelines_spark.pipelines.incremental import stream_exec_incremental

    first = {tuple(r) for r in stream_exec_incremental(spark, SF_DIR).collect()}
    # same session tag → same warehouse; the fresh run streams the same
    # files under new checkpoints but identical micro-batch ids
    second = {tuple(r) for r in stream_exec_incremental(spark, SF_DIR).collect()}
    assert first == second


def test_null_ts_rows_roll_up_under_sentinel_day(spark):
    """NULL event times must not strand: they stage under the
    __unknown__ sentinel day, mark it affected, and roll up; an
    all-NULL batch must not corrupt the high-water mark."""
    from pyspark.sql import functions as F

    wh = _fresh_warehouse("nullts")
    rows = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "click", 1.0), (2, None, "view", 2.0)],
        "event_id long, ts_s string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts_s")).select("event_id", "ts", "event_type", "value")
    info = incremental_run(spark, rows, "b0", wh)
    assert "__unknown__" in info["affected_days"]
    got = {
        (str(r["day"]), r["event_type"]): r["n_events"]
        for r in _rollup(spark, wh).collect()
    }
    assert got == {("2024-01-01", "click"): 1, ("__unknown__", "view"): 1}
    # all-NULL follow-up batch: hwm survives unchanged
    nulls = rows.filter(F.col("event_id") == 2)
    info2 = incremental_run(spark, nulls, "b1", wh)
    assert info2["hwm"] == info["hwm"]


def test_state_survives_and_orders_hwm(spark):
    wh = _fresh_warehouse("state")
    b0, b1, _ = arrival_batches(_events(spark))
    i0 = incremental_run(spark, b0, "b0", wh)
    i1 = incremental_run(spark, b1, "b1", wh)
    assert i1["hwm"] >= i0["hwm"]  # monotone high-water mark
    st = read_state(os.path.join(wh, "_state.json"))
    assert st["hwm"] == i1["hwm"] and st["batches"] == ["b0", "b1"]

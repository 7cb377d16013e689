"""Checkpoint recovery of the REAL streaming engine: a query stopped
after a partial drain and restarted against the SAME checkpoint must
resume exactly where it left off — aggregation state restored from the
state store, committed source files never re-read — and converge to
the same totals as a single uninterrupted run. This is the ops story
behind every streaming claim the engine makes: crashes are resumes,
not replays."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from conftest import SF_DIR

from promptly_data_pipelines_spark.catalog import table


def _run_available_now(spark, src, ckpt, name):
    stream = (
        spark.readStream.schema("event_id bigint, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def test_stream_restart_resumes_from_checkpoint(spark):
    base = os.path.join(tempfile.gettempdir(), "pdp_recovery_test")
    shutil.rmtree(base, ignore_errors=True)
    src, ckpt = os.path.join(base, "src"), os.path.join(base, "ckpt")
    os.makedirs(src)

    ev = table(spark, SF_DIR, "events").select("event_id", "event_type", "value")
    half = [
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
    ]

    # run 1: only the first half is staged; availableNow drains it and
    # terminates — the checkpoint now marks those files committed and
    # the state store holds their running aggregates
    half[0].coalesce(1).write.mode("overwrite").json(os.path.join(base, "s0"))
    for i, part in enumerate(
        glob.glob(os.path.join(base, "s0", "part-*.json"))
    ):
        shutil.move(part, os.path.join(src, f"a{i}.json"))
    _run_available_now(spark, src, ckpt, "pdp_recovery_sink")

    # the crash/redeploy: second half arrives, SAME checkpoint
    half[1].coalesce(1).write.mode("overwrite").json(os.path.join(base, "s1"))
    for i, part in enumerate(
        glob.glob(os.path.join(base, "s1", "part-*.json"))
    ):
        shutil.move(part, os.path.join(src, f"b{i}.json"))
    q2 = _run_available_now(spark, src, ckpt, "pdp_recovery_sink")

    # resumed run read ONLY the new files (committed ones not re-read)
    rows_second_half = half[1].count()
    replayed = sum(p["numInputRows"] for p in q2.recentProgress)
    assert replayed == rows_second_half, (
        f"restart re-read committed input: {replayed} != {rows_second_half}"
    )

    # and the restored state makes totals equal one uninterrupted run
    got = {
        r["event_type"]: (r["n"], r["sv"])
        for r in spark.table("pdp_recovery_sink").collect()
    }
    want = {
        r["event_type"]: (r["n"], r["sv"])
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
        .collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0], f"{k}: count diverged after restart"

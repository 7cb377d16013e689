"""Quarantine-channel invariants (operators/badrecords.py): the split
partitions the input exactly, and dead letters keep the raw line
byte-for-byte for replay. Count/value parity with the clean source is
covered by the oracle-parity suite (scan_json_quarantine)."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from promptly_data_pipelines_spark.operators.badrecords import split_corrupt


def test_split_partitions_input_and_preserves_raw_lines(spark):
    base = os.path.join(tempfile.gettempdir(), "pdp_badrec_test")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    src = os.path.join(base, "in.json")
    good_lines = [json.dumps({"k": i, "v": f"x{i}"}) for i in range(5)]
    bad_lines = ['{"k": 5, "v": ', "not json at all", '{"k":: 6}']
    with open(src, "w") as f:
        f.write("\n".join(good_lines + bad_lines) + "\n")

    good, quarantine = split_corrupt(spark, src, "k bigint, v string")
    got_good = {(r["k"], r["v"]) for r in good.collect()}
    got_bad = sorted(r["raw_record"] for r in quarantine.collect())
    assert got_good == {(i, f"x{i}") for i in range(5)}
    assert got_bad == sorted(bad_lines)  # byte-exact, replayable
    assert good.count() + quarantine.count() == len(good_lines) + len(bad_lines)


def test_type_mismatch_rows_are_quarantined_not_nulled(spark):
    """A well-formed JSON line whose field can't cast to the declared
    schema must land in quarantine too (PERMISSIVE marks it corrupt),
    never as a silently-nulled good row."""
    base = os.path.join(tempfile.gettempdir(), "pdp_badrec_type")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    src = os.path.join(base, "in.json")
    with open(src, "w") as f:
        f.write('{"k": 1, "v": "ok"}\n{"k": "NaNope", "v": "bad-type"}\n')
    good, quarantine = split_corrupt(spark, src, "k bigint, v string")
    assert [(r["k"], r["v"]) for r in good.collect()] == [(1, "ok")]
    assert quarantine.count() == 1

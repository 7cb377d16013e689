"""VARIANT-path CDC decode (Spark 4 ``try_parse_json``/``try_variant_get``)
vs the declared-schema ``from_json`` decode.

The two decodes must agree exactly on every projected field — the
variant form is the schema-on-read twin for evolving topics, not a
semantically different operator. Also pins the evolution property the
variant path exists for: a field ADDED to the payload is readable with
no schema redeploy, where the struct decode (schema literal) cannot
see it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from promptly_data_pipelines_spark.catalog import table
from promptly_data_pipelines_spark.cdc.envelope import (
    decode_envelopes,
    decode_envelopes_variant,
    synthesize_envelopes,
)

from conftest import SF_DIR


def _decoded_pair(spark):
    env = synthesize_envelopes(table(spark, SF_DIR, "events"))
    return decode_envelopes(env), decode_envelopes_variant(env)


def test_variant_decode_matches_struct_decode(spark):
    """Full-frame equivalence on the common projection (op, ts_ms,
    after-image fields, source table) — delete rows included (null
    after on both sides)."""
    struct_dec, var_dec = _decoded_pair(spark)
    a = struct_dec.select(
        "op",
        "ts_ms",
        F.col("after.event_id").alias("event_id"),
        F.col("after.event_type").alias("event_type"),
        F.col("after.value").alias("value"),
        F.col("source.table").alias("src_table"),
    )
    b = var_dec.select(
        "op",
        "ts_ms",
        F.try_variant_get("after", "$.event_id", "bigint").alias("event_id"),
        F.try_variant_get("after", "$.event_type", "string").alias("event_type"),
        F.try_variant_get("after", "$.value", "double").alias("value"),
        "src_table",
    )
    assert a.schema == b.schema
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_variant_null_after_on_deletes(spark):
    """op='d' rows carry a SQL-null after-image on the variant path.
    Note the synthesizer's ``to_json`` (ignoreNullFields) OMITS the
    ``after`` key on deletes, so this case exercises the absent-key
    form; real Debezium serializes ``"after": null`` explicitly —
    that form is pinned separately by
    test_variant_explicit_null_after_is_sql_null below."""
    _, var_dec = _decoded_pair(spark)
    counts = (
        var_dec.groupBy("op")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("after").isNull().cast("long")).alias("null_after"),
        )
        .collect()
    )
    by_op = {r["op"]: r for r in counts}
    assert by_op["d"]["n"] == by_op["d"]["null_after"] > 0
    assert by_op["c"]["null_after"] == 0
    assert by_op["u"]["null_after"] == 0


def test_variant_explicit_null_after_is_sql_null(spark):
    """Real Debezium JSON-converter deletes serialize ``"after": null``
    EXPLICITLY (the key is present, the value is JSON null). A naive
    ``try_variant_get(..., 'variant')`` returns a variant-null — a
    non-NULL value — for that form, so a tombstone filter
    ``after.isNotNull()`` would leak delete rows with all-null
    projected fields. decode_envelopes_variant must normalize
    variant-null to SQL null so both wire forms behave identically,
    and identically to the struct decode."""
    import json

    rows = [
        # explicit-null delete — the real Debezium wire form
        (
            json.dumps(
                {
                    "payload": {
                        "op": "d",
                        "ts_ms": 1700000000000,
                        "before": {"event_id": 1},
                        "after": None,
                        "source": {"table": "events"},
                    }
                }
            ),
        ),
        # absent-key delete — what lax producers / the synthesizer emit
        (
            json.dumps(
                {
                    "payload": {
                        "op": "d",
                        "ts_ms": 1700000000001,
                        "before": {"event_id": 2},
                        "source": {"table": "events"},
                    }
                }
            ),
        ),
        # a live row for contrast
        (
            json.dumps(
                {
                    "payload": {
                        "op": "c",
                        "ts_ms": 1700000000002,
                        "after": {"event_id": 3, "event_type": "x"},
                        "source": {"table": "events"},
                    }
                }
            ),
        ),
    ]
    env = (
        spark.createDataFrame(rows, "raw_message string")
        .withColumn("kafka_timestamp", F.current_timestamp())
    )
    var_dec = decode_envelopes_variant(env)
    got = {
        r["ts_ms"]: (r["op"], r["after_is_null"], r["before_is_null"])
        for r in var_dec.select(
            "op",
            "ts_ms",
            F.col("after").isNull().alias("after_is_null"),
            F.col("before").isNull().alias("before_is_null"),
        ).collect()
    }
    # explicit-null delete AND absent-key delete: SQL-null after, live before
    assert got[1700000000000] == ("d", True, False)
    assert got[1700000000001] == ("d", True, False)
    # create: non-null after, null before
    assert got[1700000000002] == ("c", False, True)
    # the tombstone filter the batch decode uses drops BOTH delete forms
    assert var_dec.filter(F.col("after").isNotNull()).count() == 1
    # and the struct decode agrees row-for-row on the filter outcome
    struct_dec = decode_envelopes(env)
    assert struct_dec.filter(F.col("after").isNotNull()).count() == 1


def test_variant_reads_evolved_field_struct_cannot(spark):
    """The point of the variant path: add a field upstream
    (payload.lsn, as Debezium's Postgres source does) — the struct
    decode's schema literal nulls it out of existence; the variant
    decode reads it immediately."""
    env = synthesize_envelopes(table(spark, SF_DIR, "events").limit(50))
    evolved = env.select(
        F.regexp_replace(
            "raw_message", r'^\{"payload":\{', '{"payload":{"lsn":42,'
        ).alias("raw_message"),
        "kafka_timestamp",
    )
    var_dec = decode_envelopes_variant(evolved)
    # variant path: the new field is queryable with no redeploy
    lsn = evolved.select(
        F.try_variant_get(
            F.try_parse_json("raw_message"), "$.payload.lsn", "bigint"
        ).alias("lsn")
    )
    assert lsn.filter(F.col("lsn") == 42).count() == 50
    # struct path: same message, field invisible (schema literal wins)
    struct_dec = decode_envelopes(evolved)
    assert "lsn" not in struct_dec.columns
    # and the declared fields still decode fine next to the unknown key
    assert struct_dec.filter(F.col("op").isNotNull()).count() == 50
    # the variant decode agrees on the declared fields too
    assert (
        var_dec.filter(F.col("op").isNotNull()).count() == 50
    )

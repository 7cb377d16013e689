"""SparkSession construction.

The reference delegates execution to a single Trino 475 container
(reference docker-compose.yaml:91-107); here the engine is Spark and
this module is the one place session-level performance posture is set:

- AQE on (runtime re-planning, partition coalescing, skew-join splits)
  — replaces Trino's CBO role for us at 100 TB.
- Explicit ``spark.sql.shuffle.partitions`` — never the 200 default;
  sized to cores locally, to ~2-3x total executor cores on a cluster.
- UTC session timezone — required for oracle (DuckDB) parity and for
  deterministic timestamp formatting.
- Arrow enabled — every pandas interchange (toPandas, pandas_udf,
  applyInPandas/mapInPandas) goes through Arrow batches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))


def get_session(
    app_name: str = "promptly_data_pipelines_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession with the engine's defaults.

    On a real cluster the ``master`` would come from the environment;
    the config posture (AQE, UTC, Arrow, explicit shuffle parallelism)
    is identical.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-provided
    session (the driver passes its own SparkSession to ``entry`` /
    ``queries()`` callables). Only runtime-mutable confs here."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # The events fixture carries TIMESTAMP(NANOS) parquet, which Spark 4
    # rejects by default; read nanos as long and let the catalog convert
    # to microsecond timestamps (matching DuckDB's ns→µs truncation).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark

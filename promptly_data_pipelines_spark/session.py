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
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))

_PKG_ZIP: str | None = None


def _package_zip() -> str:
    """Zip this package once per process for SparkContext.addPyFile."""
    global _PKG_ZIP
    if _PKG_ZIP is None:
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        pkg_name = os.path.basename(pkg_dir)
        path = os.path.join(tempfile.gettempdir(), f"pdp_spark_pkg_{os.getpid()}.zip")
        with zipfile.ZipFile(path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        arc = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                        zf.write(full, arc)
        _PKG_ZIP = path
    return _PKG_ZIP


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on Python workers regardless of the
    driver's cwd/sys.path. Required for every pandas_udf /
    applyInPandas / mapInPandas operator: cloudpickle serializes
    module-level functions by reference (module + qualname), and the
    externally-provided driver session runs from an arbitrary cwd where
    workers cannot import ``promptly_data_pipelines_spark``."""
    sc = spark.sparkContext
    if getattr(sc, "_pdp_pkg_shipped", False):
        return
    sc.addPyFile(_package_zip())
    sc._pdp_pkg_shipped = True


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
        # r11 (r10 verdict #3): the accept() window for a freshly
        # forked Python worker to connect back to the JVM defaults to
        # 15 s; under the test runner's 7 concurrent local JVMs a
        # worker fork can exceed that on a loaded box, failing a
        # streaming test with "Timed out while waiting for the Python
        # worker to connect back" (passes alone). Generous here is
        # free: the wait only materializes when a worker is genuinely
        # that slow to start.
        .config("spark.python.authenticate.socketTimeout", "120s")
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
    # The fixtures carry TIMESTAMP(MICROS, isAdjustedToUTC=false)
    # parquet; by default Spark 4 infers TIMESTAMP_NTZ for these, which
    # half the timestamp surface (unix_millis, watermarks on some
    # builds, interval arith coercions) rejects. Read them as session-tz
    # TimestampType instead — identical semantics under the UTC session
    # timezone set above, and exactly what DuckDB's naive TIMESTAMP
    # compares equal to. Scan-level conf, so pushdown is unaffected.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    _ship_package(spark)
    return spark

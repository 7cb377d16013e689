"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship curated pipeline at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 through the registry in
``promptly_data_pipelines_spark.registry`` (each operator module
registers itself with its DuckDB oracle at import).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from promptly_data_pipelines_spark import registry
from promptly_data_pipelines_spark.pipelines.flagship import flagship_curated

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_curated(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for the non-SQL-expressible
    ops — xxhash64/HLL/UDF-based — which get a rows-only check)."""
    return registry.all_oracles()

"""Declarative data-quality checks (SURVEY.md §2i).

The reference's correctness gate is dbt tests
(dbt/promptly/models/curated/schema.yaml:10-37: unique, not_null,
relationships) plus Elementary freshness/volume monitoring
(packages.yml:2-4, app.py:52-58). Each check returns a *violations
DataFrame* (empty = pass), exactly what dbt materializes; ``run_suite``
is the ``dbt test`` analog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


def unique_check(df: DataFrame, cols: list[str]) -> DataFrame:
    """dbt ``unique`` (schema.yaml:10-12): GROUP BY key HAVING count>1.
    Violations carry the key and its multiplicity."""
    return (
        df.groupBy(*cols).agg(F.count("*").alias("n_dups")).filter(F.col("n_dups") > 1)
    )


def not_null_check(df: DataFrame, cols: list[str]) -> DataFrame:
    """dbt ``not_null`` (schema.yaml:11-17): one row per column with its
    null count; violations = rows with n_nulls > 0 retained for report
    parity (all columns reported, pass/fail derivable)."""
    aggs = [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias(c) for c in cols
    ]
    wide = df.agg(*aggs)
    stacked = wide.selectExpr(
        "stack({n}, {pairs}) as (column_name, n_nulls)".format(
            n=len(cols), pairs=", ".join(f"'{c}', {c}" for c in cols)
        )
    )
    return stacked


def relationships_check(child: DataFrame, child_key: str, parent: DataFrame, parent_key: str) -> DataFrame:
    """dbt ``relationships`` (schema.yaml:34-37): FK integrity as a left
    anti join — child keys with no parent."""
    return (
        child.filter(F.col(child_key).isNotNull())
        .join(parent, child[child_key] == parent[parent_key], "left_anti")
        .select(F.col(child_key).alias("orphan_key"))
        .groupBy("orphan_key")
        .agg(F.count("*").alias("n_rows"))
    )


def table_metrics(df: DataFrame, ts_col: Column | str, key_col: str) -> DataFrame:
    """Elementary-style table monitor (app.py:52-58; packages.yml:2-4):
    volume, key cardinality, freshness bounds. ``current_timestamp``
    deliberately excluded (nondeterministic — computed by the caller's
    report layer, reference does the same at report time)."""
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return df.agg(
        F.count("*").alias("row_count"),
        F.countDistinct(key_col).alias("key_cardinality"),
        F.date_format(F.min(ts), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("min_ts"),
        F.date_format(F.max(ts), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("max_ts"),
    )


def run_suite(checks: dict[str, DataFrame]) -> DataFrame:
    """``dbt test`` analog: evaluate named violation frames, one result
    row per check (name, n_violations, passed)."""
    spark = next(iter(checks.values())).sparkSession
    rows = [(name, df.count()) for name, df in checks.items()]
    out = spark.createDataFrame(rows, "check_name string, n_violations bigint")
    return out.withColumn("passed", F.col("n_violations") == 0)


# ---- driver-checked queries -------------------------------------------------


@query(
    "dq_unique",
    oracle="""
    SELECT lang, source, CAST(count(*) AS BIGINT) AS n_dups
    FROM documents
    GROUP BY lang, source
    HAVING count(*) > 1
    """,
)
def dq_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: uniqueness violations of (lang, source) in documents —
    non-empty by construction so the check's output shape is exercised."""
    return unique_check(table(spark, sf_dir, "documents"), ["lang", "source"])


@query(
    "dq_not_null",
    oracle="""
    WITH agg AS (
      SELECT CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_event_type,
             CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_value,
             CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_props,
             CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_user_id
      FROM events
    )
    SELECT 'event_type' AS column_name, c_event_type AS n_nulls FROM agg
    UNION ALL SELECT 'value', c_value FROM agg
    UNION ALL SELECT 'props', c_props FROM agg
    UNION ALL SELECT 'user_id', c_user_id FROM agg
    """,
)
def dq_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: null counts per audited column of events (schema.yaml not_null)."""
    return not_null_check(
        table(spark, sf_dir, "events"), ["event_type", "value", "props", "user_id"]
    )


@query(
    "dq_relationships",
    oracle="""
    SELECT o_custkey AS orphan_key, CAST(count(*) AS BIGINT) AS n_rows
    FROM orders o
    WHERE o_custkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    GROUP BY o_custkey
    """,
)
def dq_relationships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: FK integrity orders.o_custkey → customer.c_custkey
    (schema.yaml:34-37 relationships test = left anti join)."""
    return relationships_check(
        table(spark, sf_dir, "orders"), "o_custkey", table(spark, sf_dir, "customer"), "c_custkey"
    )


@query(
    "dq_volume_anomaly",
    oracle="""
    WITH daily AS (
      SELECT strftime(ts, '%Y-%m-%d') AS d, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT d, n,
             CAST(sum(n) OVER w AS DOUBLE) / count(*) OVER w AS mean_n,
             CAST(count(*) OVER w AS BIGINT) AS n_days
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
    )
    SELECT d, n, mean_n,
           CAST(n AS DOUBLE) / mean_n AS volume_ratio,
           (n > 1.5 * mean_n OR 1.5 * n < mean_n) AS is_anomaly
    FROM stats WHERE n_days >= 3
    """,
)
def dq_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4+: Elementary-style volume anomaly monitor (the freshness/
    volume intent of app.py:52-58): each day's row count vs the
    trailing 7-day mean (excluding today); flag >1.5× deviation either
    way. Ratio arithmetic only — integer sums divide into identical
    doubles on both engines (see aggregates.py float discipline).
    The global date ordering is fine at scale: the window input is one
    row per day, not per event."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("d")).agg(
        F.count("*").alias("n")
    )
    from pyspark.sql import Window

    w = Window.orderBy("d").rowsBetween(-6, -1)
    stats = daily.select(
        "d",
        "n",
        (F.sum("n").over(w).cast("double") / F.count("*").over(w)).alias("mean_n"),
        F.count("*").over(w).cast("bigint").alias("n_days"),
    )
    return (
        stats.filter(F.col("n_days") >= 3)
        .select(
            "d",
            "n",
            "mean_n",
            (F.col("n").cast("double") / F.col("mean_n")).alias("volume_ratio"),
            (
                (F.col("n") > 1.5 * F.col("mean_n"))
                | (1.5 * F.col("n") < F.col("mean_n"))
            ).alias("is_anomaly"),
        )
    )


@query(
    "dq_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS row_count,
           CAST(count(DISTINCT user_id) AS BIGINT) AS key_cardinality,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS min_ts,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS max_ts
    FROM events
    """,
)
def dq_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: Elementary-style volume/freshness metrics over events."""
    return table_metrics(table(spark, sf_dir, "events"), "ts", "user_id")

"""Table catalog for the driver's testdata parquet fixtures.

The reference declares schemas at every boundary (Postgres DDL
datagen.py:37-43,70-81; Kafka table-descriptions provider.json:10-26;
external CSV DDL setup.py:111-128). We mirror that: expected schemas
are declared here and asserted in tests; reads use the parquet
footer schema (self-describing, no inference pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Declared schemas (DDL strings) for the driver fixtures — see FIXTURES.md §A.
DECLARED_SCHEMAS: dict[str, str] = {
    "region": "r_regionkey int, r_name string",
    "nation": "n_nationkey int, n_name string, n_regionkey int",
    "customer": "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    "supplier": "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    "part": "p_partkey bigint, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    # ts/o_orderdate/l_shipdate arrive as TIMESTAMP(MICROS,
    # isAdjustedToUTC=false) parquet. tune_session disables
    # inferTimestampNTZ, so all of them read as session-tz TimestampType
    # — under the UTC session timezone that is value-identical to
    # DuckDB's naive TIMESTAMP, and the whole timestamp function surface
    # (unix_millis, watermarks, interval arith) applies uniformly.
    "orders": "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, "
    "o_orderdate timestamp, o_orderpriority string",
    "lineitem": "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
    "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    "events": "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    "documents": "doc_id bigint, text string, lang string, source string, n_chars bigint",
    "embeddings": "vec_id bigint, embedding array<float>, label int",
}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Parquet scan → Catalyst gets column
    pruning + predicate pushdown for free on top of this.

    Nanosecond-precision parquet timestamps (events.ts) arrive as
    nanos-longs (see session.tune_session) and are converted here to
    microsecond TimestampType — the same ns→µs truncation DuckDB
    applies, keeping the oracle comparable."""
    tune_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    declared = dict(
        f.split(None, 1) for f in DECLARED_SCHEMAS.get(name, "").split(", ") if f
    )
    fixes = [
        f.name
        for f in df.schema.fields
        if declared.get(f.name) == "timestamp" and f.dataType.simpleString() == "bigint"
    ]
    for c in fixes:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Expose the tables to the SQL surface (the dbt ``ref()`` analog —
    reference curated_provider.sql:52,67 chains models by name)."""
    for n in names:
        table(spark, sf_dir, n).createOrReplaceTempView(n)


def assert_schema_contract(df: DataFrame, ddl: str, name: str = "frame") -> None:
    """Hard schema contract: the frame must match the declared DDL
    EXACTLY (names, order, types, nullability ignored — Spark's
    nullability is advisory on read paths). The additive-evolution
    module handles compatible drift; this is the boundary check for
    sinks and exports where silent drift corrupts downstream readers.
    Raises with a field-by-field diff, not a stack trace."""
    spark = df.sparkSession
    expected = spark.createDataFrame([], ddl).schema
    got = df.schema
    # Compare simpleString() per field, not dataType objects: dataType
    # equality is sensitive to NESTED-field nullability (a struct/array
    # element differing only in nullable would raise here while the
    # simpleString-based diff below rendered nothing — advice finding),
    # and the docstring promises nullability is ignored at every level.
    if [(f.name, f.dataType.simpleString()) for f in got.fields] == [
        (f.name, f.dataType.simpleString()) for f in expected.fields
    ]:
        return
    lines = []
    for i in range(max(len(got.fields), len(expected.fields))):
        g = got.fields[i] if i < len(got.fields) else None
        e = expected.fields[i] if i < len(expected.fields) else None
        gs = f"{g.name}:{g.dataType.simpleString()}" if g else "<missing>"
        es = f"{e.name}:{e.dataType.simpleString()}" if e else "<missing>"
        if gs != es:
            lines.append(f"  field {i}: got {gs}, expected {es}")
    raise ValueError(
        f"schema contract violated for {name}:\n" + "\n".join(lines)
    )

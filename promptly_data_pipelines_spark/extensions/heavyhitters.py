"""Exact heavy hitters at scale — Misra–Gries candidates + recount.

The skew the stress tier injects (extensions/stress.py) and the salted
aggregation that absorbs it (agg_group_salted) both presuppose an
answer to "WHICH keys are hot?". Asking `groupBy(key).count()` begs
the question at 100 TB: it shuffles one row per distinct key — the
very cardinality explosion a hot-key census exists to avoid (billions
of distinct users/URLs/shingles, of which only a handful matter).

The classic two-pass answer, re-expressed on Spark:

1. **Candidate pass** — each input partition runs a Misra–Gries
   summary with ``k`` counters over its rows (Arrow-batched
   ``mapInPandas``: per-batch ``value_counts`` in C, dict merge, and
   the MG overflow step — subtract the min counter from all and drop
   the zeros). MG's guarantee, partition-local: any key with
   partition frequency > n_p/(k+1) survives. By pigeonhole, a key
   with GLOBAL frequency > n/(k+1) beats that bar in at least one
   partition, so the union of per-partition survivors is a superset
   of every global heavy hitter. The only data that leaves a
   partition is ≤ k candidate keys — shuffle bytes are O(k·P),
   independent of input rows AND of distinct-key cardinality.
2. **Recount pass** — broadcast the candidate set (≤ k·P keys, a few
   MB) back over the input, count ONLY matching rows. Map-side
   partial aggregation collapses each partition to ≤ |candidates|
   rows before the exchange, so the second shuffle is also O(k·P).
   Candidates are exact-counted; false candidates fall to the
   support filter. The result is EXACT — sketch recall + recount
   precision — which is what lets DuckDB's plain GROUP BY/HAVING
   serve as the value oracle.

The reference has no counterpart (its Trino SQL could only express
the full groupBy); this fills the gap every skew-aware pipeline hits
first. Support is a fraction of total rows, so the operator's cost
and its exactness contract are both scale-free.
"""

from __future__ import annotations

from collections.abc import Iterator
from math import ceil

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..registry import query


def _mg_partition_candidates(key: str, capacity: int):
    """Build the mapInPandas generator: one Misra–Gries summary per
    partition, emitting the surviving candidate keys at end-of-stream."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            # C-speed pre-aggregation per Arrow batch, then a dict
            # merge over the batch's DISTINCT keys only.
            for val, c in pdf[key].value_counts().items():
                if val in counters:
                    counters[val] += int(c)
                else:
                    counters[val] = int(c)
            while len(counters) > capacity:
                # Weighted-MG overflow: subtract the minimum counter
                # from every entry and evict what reaches zero. One
                # pass only evicts the min-TIED entries, so loop until
                # the table fits (each pass removes ≥ 1). Every pass
                # runs with > capacity entries live, so it removes
                # ≥ m·(k+1) total mass; cumulative removed mass ≤ n_p
                # ⇒ any key's undercount ≤ n_p/(k+1) — the survival
                # guarantee holds across passes.
                m = min(counters.values())
                counters = {v: c - m for v, c in counters.items() if c > m}
        yield pd.DataFrame({key: list(counters.keys())})

    return gen


def heavy_hitters(
    df: DataFrame, key: str, support: float, capacity: int | None = None
) -> DataFrame:
    """All keys whose row count exceeds ``support`` × total rows, with
    EXACT counts, in two O(k·P)-shuffle passes over ``df``.

    ``capacity`` defaults to the smallest counter table that makes the
    candidate pass lossless for the requested support
    (k ≥ 1/support − 1); passing a smaller value trades exactness of
    the SET for memory — counts of returned keys stay exact either
    way.

    NULL keys are excluded from the CANDIDATE/count side by contract
    (filtered up front — pandas ``value_counts`` and the equi-join
    would each drop them silently half-way otherwise); a hot NULL is
    a data-quality finding, which is ``dq_not_null``'s job, not a
    census row. The SUPPORT BASE is the full table row count,
    NULL-key rows included — the declared semantics ("more than
    support × all rows") and exactly what the plain GROUP BY/HAVING
    oracle computes with count(*) (r13 review: thresholding on the
    null-filtered count would publish extra keys on any table with
    NULL keys and break oracle parity)."""
    if not 0.0 < support < 1.0:
        raise ValueError(f"support must be in (0,1), got {support}")
    if capacity is None:
        capacity = max(8, ceil(1.0 / support) - 1)
    field = df.schema[key]
    # column-pruned scan: the census reads ONE column
    pruned = df.select(key).filter(F.col(key).isNotNull())
    cands = (
        pruned.mapInPandas(
            _mg_partition_candidates(key, capacity),
            schema=T.StructType([T.StructField(key, field.dataType)]),
        )
        .dropDuplicates([key])  # ≤ k·P rows: a tiny dedup shuffle
    )
    total = df.count()
    exact = (
        pruned.join(F.broadcast(cands), key)
        .groupBy(key)
        .agg(F.count("*").alias("n_occurrences"))
    )
    return exact.filter(F.col("n_occurrences") > F.lit(float(total) * support))


@query(
    "agg_heavy_hitters",
    registered=False,  # r13 rotation: demoted (aggs keep group/count-distinct/salted); still a skew10 bench line + pytest oracle parity
    oracle="""
    SELECT CAST(o_custkey AS BIGINT) AS key,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM orders GROUP BY o_custkey
    HAVING count(*) > 1e-4 * (SELECT count(*) FROM orders)
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key census over the order stream: every customer holding
    more than 0.01% of all orders, exactly counted. The sketch pass
    bounds shuffle and memory by k·P regardless of how many distinct
    customers exist — the oracle's plain GROUP BY is the semantics,
    not the plan."""
    o = table(spark, sf_dir, "orders")
    return heavy_hitters(o, "o_custkey", support=1e-4).select(
        F.col("o_custkey").cast("bigint").alias("key"), "n_occurrences"
    )


@query(
    "stream_exec_heavy_hitters",
    registered=False,
    oracle="""
    SELECT CAST(o_custkey AS BIGINT) AS key,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM orders GROUP BY o_custkey
    HAVING count(*) > 1e-4 * (SELECT count(*) FROM orders)
    """,
)
def stream_exec_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The census through the REAL streaming engine — continuous
    candidate maintenance + periodic exact recount, the deployment
    shape of agg_heavy_hitters: each micro-batch runs the Misra–Gries
    candidate pass (k counters per partition, O(k·P) keys out) and
    lands its survivors under a batch_id-keyed path (overwrite — the
    idempotent-replay rule every foreachBatch sink here follows); the
    serving side unions the candidate store and exact-recounts ONLY
    those keys against the source.

    Why this is still exact under ANY batching (pigeonhole over
    batches, the same argument the batch form makes over partitions):
    a key with global frequency > support·n must exceed support·n_b in
    at least one batch b, and capacity ≥ 1/support − 1 makes the MG
    bar n_b/(k+1) ≤ support·n_b — so the union of per-batch survivors
    is a SUPERSET of every global hitter, false candidates fall to the
    recount's support filter, and the published set is the true-hitter
    set regardless of how the engine split the input. The candidates
    evolve per trigger (cheap, bounded); the one recount pass is the
    per-serving amortized cost, not a per-event one."""
    import os

    from ..cdc.streaming import _fresh_staging_dir, drain_stream

    support = 1e-4
    capacity = max(8, ceil(1.0 / support) - 1)
    base = _fresh_staging_dir(spark, sf_dir, "stream_hh")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    store = os.path.join(base, "cands")
    par = spark.sparkContext.defaultParallelism
    table(spark, sf_dir, "orders").select("o_custkey").repartition(par).write.json(
        src
    )

    stream = (
        spark.readStream.schema("o_custkey bigint")
        .option("maxFilesPerTrigger", max(1, par // 4))
        .json(src)
    )

    def feed(batch_df: DataFrame, batch_id: int) -> None:
        pruned = batch_df.filter(F.col("o_custkey").isNotNull())
        cands = pruned.mapInPandas(
            _mg_partition_candidates("o_custkey", capacity),
            schema="o_custkey bigint",
        ).dropDuplicates(["o_custkey"])
        cands.write.mode("overwrite").parquet(
            os.path.join(store, f"batch_id={batch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(feed)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q, "heavy-hitter")

    cand_union = (
        spark.read.parquet(store).select("o_custkey").dropDuplicates(["o_custkey"])
    )
    # support base = ALL rows (NULL keys included), matching the
    # count(*) the oracle thresholds on — see heavy_hitters (r13 review)
    raw = spark.read.schema("o_custkey bigint").json(src)
    total = raw.count()
    source = raw.filter(F.col("o_custkey").isNotNull())
    exact = (
        source.join(F.broadcast(cand_union), "o_custkey")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_occurrences"))
    )
    return exact.filter(
        F.col("n_occurrences") > F.lit(float(total) * support)
    ).select(F.col("o_custkey").cast("bigint").alias("key"), "n_occurrences")

"""Skew-stress corpus builder (r6 verdict item #6).

sf0.1 cannot surface skew behavior — its langs are near-uniform and
its duplicates are sparse — yet the dedup family carries code that
exists FOR skew (shingle df-caps, salted pair joins, pigeonhole block
keys). This module deterministically amplifies a documents table into
the adversarial shape a 100 TB web crawl actually has:

- **hot partition key**: ~70% of rows collapse onto one lang value
  (the 'en' of a real crawl) — stresses every (key, lang)-partitioned
  shuffle and the df-cap's hot-shingle census;
- **template near-dup clusters**: every 5th base doc is replicated
  ``factor`` times with a tiny per-copy suffix (the boilerplate /
  mirror-site shape) — stresses LSH banding with dense candidate
  clusters instead of sparse pairs;
- **10× volume** at unchanged text length distribution.

Everything is derived from doc_id arithmetic — no RNG, no timestamps —
so the slice is bit-identical across runs and rounds at the same
source SF. bench.py builds it once per run (untimed) and times the
dedup family against it as labeled ``skew10_*`` secondary lines.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table

HOT_LANG = "en"
HOT_PCT = 70  # % of rows forced onto the hot lang key
TEMPLATE_MOD = 5  # every TEMPLATE_MOD-th base doc becomes a near-dup cluster
HOT_CUSTKEY = 1  # the one customer 70% of skewed orders collapse onto
HOT_ORDERKEY_BASE = 1  # base orderkey the viral-order lineitems collapse onto


def skewed_documents(spark: SparkSession, sf_dir: str, factor: int = 10) -> DataFrame:
    """``factor``× amplified documents frame with a hot lang key and
    template near-dup clusters (see module docstring). Output schema is
    the documents schema exactly, so every dedup/text operator runs on
    it unmodified."""
    d = table(spark, sf_dir, "documents")
    rep = d.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    )
    is_template = (F.col("doc_id") % TEMPLATE_MOD == 0) & (F.col("rep") > 0)
    # template copies: same base text + a 2-token per-copy suffix —
    # inside LSH/simhash thresholds, outside exact-hash equality
    text = F.when(
        is_template,
        F.concat(F.col("text"), F.lit(" mirror copy "), F.col("rep").cast("string")),
    ).otherwise(F.col("text"))
    # hot key: doc_id*factor+rep cycles 0..99 via %100 — deterministic,
    # uniform over copies, so HOT_PCT% of ALL rows land on HOT_LANG
    new_id = F.col("doc_id") * factor + F.col("rep")
    lang = F.when(new_id % 100 < HOT_PCT, F.lit(HOT_LANG)).otherwise(F.col("lang"))
    return rep.select(
        new_id.alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        F.col("source"),
        F.length(text).cast("bigint").alias("n_chars"),
    )


def skewed_orders(spark: SparkSession, sf_dir: str, factor: int = 10) -> DataFrame:
    """``factor``× amplified orders with a HOT CUSTOMER key: 70% of all
    rows collapse onto o_custkey=HOT_CUSTKEY (the whale-account /
    default-tenant shape every marketplace fact table has). Output
    schema is the orders schema exactly, so the §2 join/window core
    (join_equi, topk_group) runs on it unmodified. Derived from
    o_orderkey arithmetic — deterministic, no RNG.

    What it stresses: a shuffle keyed by o_custkey (window partitions,
    non-broadcast joins) sends 70% of the fact table to ONE reduce
    task unless something intervenes — the interveners under test are
    map-side WindowGroupLimit (topk_group keeps ≤k rows per group per
    map task, so the hot reducer receives tasks·k rows, not 70% of the
    corpus) and AQE skew-join splitting (plan-pinned in
    tests/test_stress.py). Dim joins stay skew-immune via broadcast —
    also exercised, join_equi's plan broadcasts customer/nation/region."""
    o = table(spark, sf_dir, "orders")
    rep = o.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    )
    new_key = F.col("o_orderkey") * factor + F.col("rep")
    # hot iff rep/factor < HOT_PCT% — independent of the source key
    # distribution (review finding: a new_key%100 rule only hit 70%
    # because TPC-H orderkeys happen to cycle evenly mod 10 over the
    # current fixtures; sparse or truncated keys would silently drop
    # below the documented fraction and the zero-margin shape test
    # would misfire). EXACTLY HOT_PCT% per base order only when
    # HOT_PCT*factor is a multiple of 100 (hot reps per order =
    # ceil(HOT_PCT*factor/100), e.g. factor=3 would give 3/3 = 100%
    # hot, not 70%) — assert it so a bad factor fails loudly instead
    # of silently skewing the documented fraction (r8 advice).
    assert HOT_PCT * factor % 100 == 0, (
        f"factor={factor} cannot realize exactly {HOT_PCT}% hot rows "
        f"(need HOT_PCT*factor % 100 == 0); use a multiple of "
        f"{100 // math.gcd(HOT_PCT, 100)}"
    )
    hot = (F.col("rep") * 100 < F.lit(HOT_PCT * factor))
    return rep.select(
        new_key.alias("o_orderkey"),
        F.when(hot, F.lit(HOT_CUSTKEY)).otherwise(F.col("o_custkey")).alias("o_custkey"),
        "o_orderstatus",
        # perturb the price per copy so window order keys stay distinct
        (F.col("o_totalprice") + F.col("rep")).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )


def skewed_lineitem(spark: SparkSession, sf_dir: str, factor: int = 10) -> DataFrame:
    """``factor``× amplified lineitem with a HOT ORDER key: 70% of all
    rows collapse onto l_orderkey = HOT_ORDERKEY_BASE·factor — the
    amplified key of base order 1, which skewed_orders always emits
    (testdata orderkeys are dense 0..N−1), so the hot lines JOIN. This
    is the viral-listing shape (one entity owns most of an activity
    fact) that makes a fact-fact join straggle: a shuffle keyed by
    l_orderkey sends 70% of this table to ONE reduce task. The
    intervener under test is operators/joins.salted_inner_join —
    join_salted_skew vs join_skew_unsalted on this slice is the
    measured difference. Same determinism contract as the other
    amplifiers: pure key arithmetic, no RNG; cold rows keep their
    per-order line structure on the amplified keys."""
    li = table(spark, sf_dir, "lineitem")
    rep = li.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    )
    assert HOT_PCT * factor % 100 == 0, (
        f"factor={factor} cannot realize exactly {HOT_PCT}% hot rows "
        f"(need HOT_PCT*factor % 100 == 0); use a multiple of "
        f"{100 // math.gcd(HOT_PCT, 100)}"
    )
    hot = F.col("rep") * 100 < F.lit(HOT_PCT * factor)
    new_key = F.when(hot, F.lit(HOT_ORDERKEY_BASE * factor)).otherwise(
        F.col("l_orderkey") * factor + F.col("rep")
    )
    return rep.select(
        new_key.alias("l_orderkey"),
        "l_partkey",
        "l_suppkey",
        # perturb per copy so hot rows stay distinct (salting hashes
        # non-key columns for its deterministic spread)
        (F.col("l_linenumber") + F.col("rep") * 10).alias("l_linenumber"),
        "l_quantity",
        (F.col("l_extendedprice") + F.col("rep")).alias("l_extendedprice"),
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    )


def write_skewed_sf(
    spark: SparkSession, src_sf_dir: str, dest_dir: str, factor: int = 10
) -> str:
    """Materialize the skewed slice as ``{dest_dir}/documents.parquet``
    + ``orders.parquet`` (hot-customer fact) + passthrough copies of
    the dims the join queries read (customer/nation/region), so the
    registered dedup AND join/window queries run against it unmodified
    (they take an sf_dir and read their tables) and pay a real parquet
    scan, not a recomputed expression tree."""
    os.makedirs(dest_dir, exist_ok=True)
    # Multi-file output (repartition before write): the source fixtures
    # are single-row-group parquet, and an amplified slice written as
    # ONE file would scan on one task AND leave every downstream
    # shuffle with one mapper — AQE can only split a skewed reduce
    # partition at MAPPER boundaries, so a single-mapper shuffle is
    # unsplittable no matter how hot the key (found by the r8 skew-join
    # plan pin). A real 10× corpus is many files; mirror that.
    par = spark.sparkContext.defaultParallelism
    skewed_documents(spark, src_sf_dir, factor).repartition(par).write.mode(
        "overwrite"
    ).parquet(os.path.join(dest_dir, "documents.parquet"))
    skewed_orders(spark, src_sf_dir, factor).repartition(par).write.mode(
        "overwrite"
    ).parquet(os.path.join(dest_dir, "orders.parquet"))
    skewed_lineitem(spark, src_sf_dir, factor).repartition(par).write.mode(
        "overwrite"
    ).parquet(os.path.join(dest_dir, "lineitem.parquet"))
    for dim in ("customer", "nation", "region"):
        table(spark, src_sf_dir, dim).write.mode("overwrite").parquet(
            os.path.join(dest_dir, f"{dim}.parquet")
        )
    return dest_dir

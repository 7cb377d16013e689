"""Uniform scale-amplification for scaling-linearity measurement (r9).

The skew tier (extensions/stress.py) answers "does the engine survive
an ADVERSARIAL key distribution at 10×?". This module answers the
complementary question the 100 TB design brief actually poses: "does
each operator's cost grow LINEARLY when the data grows uniformly?" —
measured, not argued from plan shapes. tools/probe_scaling.py times
the headline operator families at factor 1 vs 10 of the SAME
distribution and records the implied scaling exponent
(log t10/t1 ÷ log 10) in BASELINE.md; ≈1.0 is linear, <1 means fixed
overhead still dominates locally, >1 is a scale bug.

Amplification must preserve the DISTRIBUTION, not just multiply rows:

- ``documents``: every copy ``rep`` salts EVERY token with ``r<rep>``,
  so the corpus becomes ``factor`` disjoint sub-corpora each
  isomorphic to the base. Cross-copy n-gram/minhash/simhash
  similarity is exactly zero (no shared tokens), so near-dup DENSITY
  (dup pairs ÷ rows) is constant in ``factor`` — unlike the stress
  module's template clusters, which deliberately densify. An operator
  that is linear in rows at constant dup density must scale ≈ factor.
- ``orders``/``lineitem``: FK-consistent key spread
  (``key*factor+rep`` on both sides), dims untouched — the "fact
  tables grow, dimensions don't" shape of a real warehouse year.
  Group-by keys (custkey, partkey) keep their cardinality, so group
  COUNT is constant and group SIZE grows ×factor.
- ``events``: event_id spread, ts/user untouched — 10× events per
  (user, window) pane.
- ``embeddings``: vec_id spread + a per-copy epsilon on every
  component (breaks exact-tie ambiguity between copies; distances and
  top-k work are distribution-identical).

Everything derives from key arithmetic + ``rep`` — no RNG, no
timestamps — so the slice is bit-identical across runs. Factor 1 goes
through the SAME rewrite pipeline (rep=0 salt included), so both ends
of the measurement read parquet of identical physics and the ratio
isolates row volume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table

# facts amplified; dims copied through untouched
_AMPLIFIED = ("documents", "orders", "lineitem", "events", "embeddings")
_PASSTHROUGH = ("region", "nation", "customer", "supplier", "part")


def _rep(factor: int) -> F.Column:
    return F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")


def scaled_documents(spark: SparkSession, sf_dir: str, factor: int) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    rep = d.select("*", _rep(factor))
    salt = F.concat(F.lit("r"), F.col("rep").cast("string"))
    # salt every token: copy corpora share ZERO tokens, so near-dup
    # density is constant in factor (module docstring)
    text = F.array_join(
        F.transform(
            F.filter(F.split(F.col("text"), " "), lambda t: t != ""),
            lambda t: F.concat(salt, t),
        ),
        " ",
    )
    return rep.select(
        (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
        text.alias("text"),
        "lang",
        "source",
        F.length(text).cast("bigint").alias("n_chars"),
    )


def scaled_orders(spark: SparkSession, sf_dir: str, factor: int) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    rep = o.select("*", _rep(factor))
    return rep.select(
        (F.col("o_orderkey") * factor + F.col("rep")).alias("o_orderkey"),
        "o_custkey",
        "o_orderstatus",
        # distinct per-copy price keeps window order keys unambiguous
        (F.col("o_totalprice") + F.col("rep")).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )


def scaled_lineitem(spark: SparkSession, sf_dir: str, factor: int) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    rep = li.select("*", _rep(factor))
    cols = [
        (F.col("l_orderkey") * factor + F.col("rep")).alias("l_orderkey")
    ] + [c for c in li.columns if c != "l_orderkey"]
    return rep.select(*cols)


def scaled_events(spark: SparkSession, sf_dir: str, factor: int) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    rep = ev.select("*", _rep(factor))
    cols = [(F.col("event_id") * factor + F.col("rep")).alias("event_id")] + [
        c for c in ev.columns if c != "event_id"
    ]
    return rep.select(*cols)


def scaled_embeddings(spark: SparkSession, sf_dir: str, factor: int) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    rep = e.select("*", _rep(factor))
    vec = F.transform(
        F.col("embedding"),
        lambda x: (x + F.col("rep").cast("float") * F.lit(1e-4)).cast("float"),
    )
    return rep.select(
        (F.col("vec_id") * factor + F.col("rep")).alias("vec_id"),
        vec.alias("embedding"),
        "label",
    )


_BUILDERS = {
    "documents": scaled_documents,
    "orders": scaled_orders,
    "lineitem": scaled_lineitem,
    "events": scaled_events,
    "embeddings": scaled_embeddings,
}


def write_scaled_sf(
    spark: SparkSession, src_sf_dir: str, dest_dir: str, factor: int
) -> str:
    """Materialize the uniformly amplified slice under ``dest_dir`` with
    the testdata layout ({table}.parquet), so every registered query
    runs on it unmodified. Multi-file output for the facts (same
    mapper-boundary reasoning as stress.write_skewed_sf): a real
    ``factor``× corpus is many files, and a single-file scan would
    serialize the very parallelism the probe measures."""
    os.makedirs(dest_dir, exist_ok=True)
    par = spark.sparkContext.defaultParallelism
    for name in _AMPLIFIED:
        _BUILDERS[name](spark, src_sf_dir, factor).repartition(par).write.mode(
            "overwrite"
        ).parquet(os.path.join(dest_dir, f"{name}.parquet"))
    for name in _PASSTHROUGH:
        table(spark, src_sf_dir, name).write.mode("overwrite").parquet(
            os.path.join(dest_dir, f"{name}.parquet")
        )
    return dest_dir

"""Uniform scaling slice (extensions/scaling.py): determinism, the
distribution-preservation properties the probe's exponents depend on,
and the exact ×factor dup-density contract — the correctness side of
tools/probe_scaling.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from promptly_data_pipelines_spark.catalog import table
from promptly_data_pipelines_spark.extensions.scaling import (
    scaled_documents,
    write_scaled_sf,
)
from promptly_data_pipelines_spark.registry import run

from conftest import SF_DIR

FACTOR = 2


@pytest.fixture(scope="module")
def scale_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("scale2"))
    return write_scaled_sf(spark, SF_DIR, d, factor=FACTOR)


@pytest.fixture(scope="module")
def base_dir(spark, tmp_path_factory):
    """factor=1 through the SAME rewrite pipeline — the probe's
    baseline, so ratios isolate row volume from parquet physics."""
    d = str(tmp_path_factory.mktemp("scale1"))
    return write_scaled_sf(spark, SF_DIR, d, factor=1)


def test_scaled_shape_and_schema(spark, scale_dir):
    for name in ("documents", "orders", "lineitem", "events", "embeddings"):
        base = table(spark, SF_DIR, name)
        sc = table(spark, scale_dir, name)
        assert sc.count() == FACTOR * base.count(), name
        assert [f.name for f in sc.schema.fields] == [
            f.name for f in base.schema.fields
        ], name


def test_scaled_keys_distinct(spark, scale_dir):
    for name, key in (
        ("documents", "doc_id"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
        ("embeddings", "vec_id"),
    ):
        sc = table(spark, scale_dir, name)
        assert sc.select(key).distinct().count() == sc.count(), name


def test_scaled_fk_consistent(spark, scale_dir):
    """l_orderkey and o_orderkey spread with the same rule, so the
    fact-fact FK survives amplification (join_star's contract)."""
    li = table(spark, scale_dir, "lineitem")
    o = table(spark, scale_dir, "orders")
    orphans = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").count()
    assert orphans == 0


def test_scaled_copies_share_zero_tokens(spark, scale_dir):
    """The density invariant's mechanism: per-copy token salting makes
    rep sub-corpora token-DISJOINT, so no cross-copy shingle, minhash
    band, or simhash collision can exist and near-dup relations stay
    strictly within a copy."""
    d = table(spark, scale_dir, "documents")
    toks = d.select(
        (F.col("doc_id") % FACTOR).alias("rep"),
        F.explode(F.split("text", " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    per_rep = toks.groupBy("tok").agg(F.countDistinct("rep").alias("n_reps"))
    assert per_rep.filter(F.col("n_reps") > 1).count() == 0


def test_dup_density_exactly_scales(spark, scale_dir, base_dir):
    """The headline contract behind the probe's exponents: exact n-gram
    Jaccard is salt-invariant within a copy and impossible across
    copies, so the dup-pair count at factor F is EXACTLY F x the
    factor-1 count — constant density, unlike the stress module's
    deliberately densifying template clusters."""
    pairs_1 = run("dedup_ngram_jaccard", spark, base_dir).count()
    pairs_f = run("dedup_ngram_jaccard", spark, scale_dir).count()
    assert pairs_f == FACTOR * pairs_1


def test_scaled_slice_deterministic(spark):
    a = scaled_documents(spark, SF_DIR, FACTOR)
    b = scaled_documents(spark, SF_DIR, FACTOR)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

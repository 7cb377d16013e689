"""Entity-resolution composite (extensions/entity.py): the designed
cluster shapes, beyond the corpus-level DuckDB parity in
tests/test_oracle_parity.py."""

from __future__ import annotations

import pytest

from promptly_data_pipelines_spark.extensions.entity import (
    er_blocking_metrics,
    er_resolve_customers,
)

from conftest import SF_DIR


def test_er_cluster_shapes(spark):
    out = er_resolve_customers(spark, SF_DIR).collect()
    by_rec = {r.rec_id: r for r in out}
    ents: dict[int, list] = {}
    for r in out:
        ents.setdefault(r.entity_id, []).append(r.rec_id)

    # key 6: original + Custmer + Kustomer = a 3-node transitive
    # cluster canonicalized at the original key
    assert sorted(ents[6]) == [6, 1_000_006, 2_000_006]
    assert by_rec[6].is_canonical and by_rec[6].entity_size == 3
    assert not by_rec[1_000_006].is_canonical

    # key 3 (not %6, not %5): original + Custmer pair
    assert sorted(ents[3]) == [3, 1_000_003]

    # Xstmr plants (distance >=3 from original AND both variants,
    # incl. keys divisible by 30 that carry all three) never match
    xst = [r for r in out if r.name.startswith("Xstmr")]
    assert xst, "no Xstmr plants in fixture"
    for r in xst:
        assert r.entity_id == r.rec_id and r.entity_size == 1 and r.is_canonical

    # the two variants of key 6 share NO direct edge under the <=2
    # rule (their mutual distance is 3), so the 3-node entity above
    # necessarily assembled TRANSITIVELY through the original
    def _lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    assert _lev(by_rec[1_000_006].name, by_rec[2_000_006].name) > 2

    # untouched customers (e.g. key 1: not %3/%5) are singletons too
    assert ents[1] == [1]

    # global sanity: every entity's canonical row is its min rec_id
    for eid, members in ents.items():
        assert eid == min(members)


def test_er_fixture_rejects_large_custkeys(spark, tmp_path):
    """r11 advice: the +1M/2M/3M variant offsets (and the rec_id %
    1_000_000 ground truth) silently collide once c_custkey ≥ 1e6
    (SF ≥ ~6.7). The guard must turn that into a LOUD per-row error,
    not wrong clusters — and it must survive column pruning (it rides
    inside the name expression)."""
    big = spark.createDataFrame(
        [(1_000_000, "Customer#001000000", 1, 0.0, "BUILDING")],
        "c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    big.write.parquet(str(tmp_path / "customer.parquet"))
    with pytest.raises(Exception, match="requires c_custkey < 1000000"):
        er_resolve_customers(spark, str(tmp_path)).collect()


def test_er_blocking_completeness_counts_true_matches_only(spark):
    """r11 advice: pairs_completeness = |matched ∩ true| / |true|.
    In this fixture the block key is unique per origin key, so every
    matched pair IS a true pair (n_true_matched == n_matched), and
    the distance-≥3 Xstmr plants keep completeness strictly < 1."""
    row = er_blocking_metrics(spark, SF_DIR).collect()[0]
    assert row.n_true_matched == row.n_matched
    assert row.n_true_matched <= row.n_true_pairs
    assert row.pairs_completeness == pytest.approx(
        row.n_true_matched / row.n_true_pairs
    )
    assert 0.0 < row.pairs_completeness < 1.0


def test_golden_record_survivorship_rule(spark):
    """Longest-name-wins survivorship: multi-member entities must
    surface the untruncated ORIGINAL name (planted variants are all
    shorter or equal-length-later), singletons survive as themselves,
    and the member roster is the sorted pipe-joined name set."""
    from promptly_data_pipelines_spark.extensions.entity import er_golden_records

    out = {r.entity_id: r for r in er_golden_records(spark, SF_DIR).collect()}
    # key 6 carries original + Custmer + Kustomr
    g6 = out[6]
    assert g6.golden_name.startswith("Customer")
    assert g6.n_members == 3 and g6.n_distinct_names == 3
    assert g6.member_names == "|".join(sorted(g6.member_names.split("|")))
    assert g6.golden_name in g6.member_names.split("|")
    # Xstmr singletons are their own golden record
    xst = [r for r in out.values() if r.golden_name.startswith("Xstmr")]
    assert xst and all(r.n_members == 1 for r in xst)
    # every entity has exactly one golden row
    assert len(out) == len(set(out))

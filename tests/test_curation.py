"""Module/property coverage for the r6 curation tier (the oracle
parity of each registered query is covered by test_oracle_parity; here
live the invariants the oracle can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR

from promptly_data_pipelines_spark.catalog import table
from promptly_data_pipelines_spark.extensions.curation import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    text_chunk_windows,
)
from promptly_data_pipelines_spark.operators.bloomjoin import (
    M_BITS,
    build_bloom,
    might_contain,
)
from promptly_data_pipelines_spark.registry import run


def test_bloom_no_false_negatives(spark):
    """Every key inserted into the bloom must pass might_contain —
    the property that makes the prefilter correctness-transparent."""
    cust = table(spark, SF_DIR, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    bloom = build_bloom(cust, "c_custkey")
    misses = cust.filter(~might_contain(F.col("c_custkey"), bloom)).count()
    assert misses == 0


def test_bloom_prunes_fact_side(spark):
    """The prefilter must actually reject most non-matching fact rows
    (fp rate ~1e-4 at this fill factor — allow 1% slack)."""
    cust = table(spark, SF_DIR, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, SF_DIR, "orders")
    bloom = build_bloom(cust, "c_custkey")
    kept = orders.filter(might_contain(F.col("o_custkey"), bloom)).count()
    true_matches = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"], "leftsemi"
    ).count()
    total = orders.count()
    assert kept >= true_matches  # superset of the true matches
    assert kept <= true_matches + max(1, int(0.01 * total))  # and tight


def test_bloom_bitset_is_bounded_metadata(spark):
    """The driver-side collect is bounded by m_bits/64 words regardless
    of how many keys were inserted."""
    cust = table(spark, SF_DIR, "customer")  # whole dim, no segment filter
    bloom = build_bloom(cust, "c_custkey")
    assert len(bloom) == M_BITS // 64


def test_chunk_windows_cover_every_token(spark):
    """Chunking invariants: per doc, chunk 0 starts at token 0, chunk
    starts advance by the stride, and token coverage is gapless —
    sum of per-chunk fresh tokens (stride for inner chunks, the
    remainder for the tail) equals the doc's token count."""
    chunks = text_chunk_windows(spark, SF_DIR)
    docs = (
        table(spark, SF_DIR, "documents")
        .select(
            "doc_id",
            F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias("n_tok"),
        )
        .filter(F.col("n_tok") > 0)
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.max("chunk_idx").alias("max_idx"),
        F.min("chunk_idx").alias("min_idx"),
        F.sum("n_tokens").alias("tok_in_chunks"),
        F.max(CHUNK_STRIDE * F.col("chunk_idx") + F.col("n_tokens")).alias("covered"),
    )
    j = docs.join(per_doc, "doc_id")
    assert j.count() == docs.count()  # every non-empty doc got chunks
    bad = j.filter(
        (F.col("min_idx") != 0)
        | (F.col("max_idx") != F.col("n_chunks") - 1)
        | (F.col("covered") != F.col("n_tok"))  # last chunk ends at n_tok
    ).count()
    assert bad == 0
    # overlap accounting: chunked-token total can't exceed the doc's
    # tokens plus one full overlap per chunk boundary (short tail
    # chunks contribute less, so this is an upper bound, not identity)
    overlap = CHUNK_TOKENS - CHUNK_STRIDE
    assert (
        j.filter(
            F.col("tok_in_chunks")
            > F.col("n_tok") + F.lit(overlap) * (F.col("n_chunks") - 1)
        ).count()
        == 0
    ), "chunked token total exceeds coverage+overlap bound"


def test_grouped_split_has_no_source_leakage(spark):
    """The leakage-safe property itself: every source maps to exactly
    one split."""
    df = run("dataset_split_grouped", spark, SF_DIR)
    multi = (
        df.groupBy("source")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert multi == 0


def test_weighted_priority_favors_heavy_docs(spark):
    """Sampling-weight sanity: the mean n_chars of selected docs should
    exceed the corpus mean (weight = n_chars), and each lang yields
    exactly min(5, lang size) rows."""
    sel = run("sample_weighted_priority", spark, SF_DIR)
    docs = table(spark, SF_DIR, "documents")
    mean_sel = sel.agg(F.avg("n_chars")).first()[0]
    mean_all = docs.agg(F.avg("n_chars")).first()[0]
    assert mean_sel > mean_all
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in sel.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == {k: min(5, v) for k, v in sizes.items()}


def test_semantic_keep_best_keeps_one_per_bucket(spark):
    """Keeper invariants: keepers are never removed, and within a
    bucket the keeper's n_chars >= every removed doc's."""
    removed = run("dedup_semantic_keep_best", spark, SF_DIR)
    removed_ids = {r["doc_id"] for r in removed.select("doc_id").collect()}
    keeper_ids = {r["kept_doc_id"] for r in removed.select("kept_doc_id").collect()}
    assert not (removed_ids & keeper_ids)
    docs = {r["doc_id"]: r["n_chars"] for r in table(spark, SF_DIR, "documents").select("doc_id", "n_chars").collect()}
    for r in removed.collect():
        assert docs[r["kept_doc_id"]] >= r["n_chars"]


def test_curriculum_stages_balanced(spark):
    """ntile(4) per lang: stage sizes within a lang differ by <= 1 and
    stage 1 is at least as fluent as stage 4 on average."""
    df = run("curriculum_stages", spark, SF_DIR)
    sizes = df.groupBy("lang", "stage").agg(F.count("*").alias("n"))
    spreads = (
        sizes.groupBy("lang")
        .agg((F.max("n") - F.min("n")).alias("spread"))
        .filter(F.col("spread") > 1)
        .count()
    )
    assert spreads == 0
    means = {
        (r["lang"], r["stage"]): r["m"]
        for r in df.groupBy("lang", "stage").agg(F.avg("fluency").alias("m")).collect()
    }
    for lang in {k[0] for k in means}:
        if (lang, 1) in means and (lang, 4) in means:
            assert means[(lang, 1)] >= means[(lang, 4)]


def test_quantize_int8_error_bound(spark):
    """Dequantization error <= scale/127 per component (the docstring's
    bound), checked against the raw vectors."""
    from promptly_data_pipelines_spark.extensions.similarity import _doubled

    e = _doubled(table(spark, SF_DIR, "embeddings"))
    s = e.select(
        "vec_id",
        "vec",
        F.array_max(F.transform(F.col("vec"), lambda x: F.abs(x))).alias("scale"),
    ).filter(F.col("scale") > 0)
    qv = F.transform(
        F.col("vec"),
        lambda x: F.floor(x * F.lit(127.0) / F.col("scale")).cast("bigint"),
    )
    err = F.zip_with(
        F.col("vec"),
        qv,
        lambda x, q: F.abs(x - q.cast("double") * F.col("scale") / F.lit(127.0)),
    )
    worst = (
        s.select((F.array_max(err) / (F.col("scale") / F.lit(127.0))).alias("rel"))
        .agg(F.max("rel"))
        .first()[0]
    )
    assert worst <= 1.0 + 1e-9


def test_hard_negatives_exclude_query_label(spark):
    neg = run("similarity_hard_negatives", spark, SF_DIR)
    e = table(spark, SF_DIR, "embeddings").select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    bad = neg.join(e, "query_id").filter(F.col("label") == F.col("q_label")).count()
    assert bad == 0


def test_token_budget_respected_and_greedy(spark):
    """No selected source exceeds the budget, and within a source the
    selection is a prefix of the fluency-ordered ranking (greedy)."""
    from promptly_data_pipelines_spark.extensions.curation import SOURCE_TOKEN_BUDGET

    sel = run("corpus_token_budget", spark, SF_DIR)
    over = (
        sel.groupBy("source")
        .agg(F.max("cum_tokens").alias("m"))
        .filter(F.col("m") > SOURCE_TOKEN_BUDGET)
        .count()
    )
    assert over == 0
    # prefix property: cum_tokens within a source are strictly increasing
    # and each equals the previous plus the row's n_tokens
    from pyspark.sql import Window as W

    w = W.partitionBy("source").orderBy("cum_tokens")
    gaps = (
        sel.withColumn("prev", F.lag("cum_tokens", 1, 0).over(w))
        .filter(F.col("cum_tokens") != F.col("prev") + F.col("n_tokens"))
        .count()
    )
    assert gaps == 0


def test_split_contamination_grouped_vs_row_level(spark):
    """The mechanism the grouped split exists for, pinned on a corpus
    where near-duplicates DO cluster within a source (the testdata
    corpus scatters its duplicates randomly, so no ordering between
    the two splits holds there): duplicate docs sharing one source
    land on one side of the grouped boundary (zero contamination)
    while the row-level split scatters them across it (positive
    contamination)."""
    import hashlib

    def bucket(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 256

    dup_text = "alpha beta gamma delta epsilon zeta eta theta"
    # doc_ids whose ROW-level buckets land on both sides of the boundary
    train_ids = [i for i in range(300) if bucket(str(i)) < 205]
    test_ids = [i for i in range(300) if bucket(str(i)) >= 230]
    rows = [(train_ids[0], dup_text, "en", "dupfarm"),
            (test_ids[0], dup_text, "en", "dupfarm")]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")

    from promptly_data_pipelines_spark.extensions.sampling import hash_bucket

    ws = F.filter(F.split("text", " "), lambda w: w != "")
    grams = F.transform(
        F.sequence(F.lit(1), F.size("w") - 4),
        lambda i: F.array_join(F.slice(F.col("w"), i, 5), " "),
    )

    def contamination(split_key: str) -> int:
        b = hash_bucket(split_key)
        s = (
            d.filter((b < 205) | (b >= 230))
            .select(
                "lang",
                F.when(b < 205, "train").otherwise("test").alias("split"),
                ws.alias("w"),
            )
            .filter(F.size("w") >= 5)
            .select("lang", "split", F.explode(grams).alias("g"))
            .distinct()
        )
        out = (
            s.groupBy("lang", "g")
            .agg(F.countDistinct("split").alias("ns"))
            .filter(F.col("ns") == 2)
            .count()
        )
        return out

    assert contamination("doc_id") > 0  # row-level split leaks the dup
    # grouped split: one source -> one side -> nothing to leak
    assert contamination("source") == 0


def test_bloom_ignores_null_keys(spark):
    """Review r6: NULL dim keys must be dropped pre-hash (join
    semantics: NULL never matches), not crash the bitset assembly;
    NULL probe keys must be filtered out by might_contain."""
    dim = spark.createDataFrame([(1,), (None,), (7,)], "k long")
    bloom = build_bloom(dim, "k")
    assert len(bloom) == M_BITS // 64
    probe = spark.createDataFrame([(1,), (None,), (7,), (99,)], "k long")
    kept = probe.filter(might_contain(F.col("k"), bloom)).collect()
    got = {r["k"] for r in kept}
    assert {1, 7} <= got
    assert None not in got


def test_containment_superset_of_jaccard_pairs(spark):
    """J >= 0.5 implies c >= (|A|+|B|)/3 >= 2·min/3, i.e. containment
    >= 2/3 > 0.6 — so every Jaccard near-dup pair must also be a
    containment pair (the reverse is false: that asymmetric remainder
    is the operator's reason to exist)."""
    jac = {
        (r["doc_a"], r["doc_b"])
        for r in run("dedup_ngram_jaccard", spark, SF_DIR).collect()
    }
    cont = {
        (r["doc_a"], r["doc_b"])
        for r in run("dedup_containment", spark, SF_DIR).collect()
    }
    assert jac <= cont


def test_containment_catches_doc_inside_doc(spark):
    """The asymmetric case on a constructed corpus: a short doc fully
    quoted inside a much larger one — Jaccard (size-banded, symmetric)
    misses it, containment flags it at 1.0."""
    from promptly_data_pipelines_spark.extensions.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    small = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    big = filler + " " + small + " " + filler.replace("w", "v")
    d = spark.createDataFrame(
        [(1, "en", small), (2, "en", big)], "doc_id long, lang string, text string"
    )
    jac = ngram_jaccard_pairs(d).collect()
    cont = containment_pairs(d).collect()
    assert jac == []  # size band (2:1) excludes the pair outright
    assert len(cont) == 1
    row = cont[0]
    assert (row["doc_a"], row["doc_b"]) == (1, 2)
    assert row["containment"] == 1.0


def test_full_outer_reconciles_null_keys(spark, tmp_path):
    """Review r6: a NULL join key group must reconcile ACROSS sides
    (eqNullSafe) and take its status from side presence, not key
    nullness — orders with no customer on both sides of the cutover
    are one 'active' row, not a 'new' + 'churned' pair."""
    import datetime as dt

    from promptly_data_pipelines_spark.catalog import DECLARED_SCHEMAS
    from promptly_data_pipelines_spark.operators.joins import join_full_outer

    before = dt.datetime(1994, 6, 1)
    after = dt.datetime(1996, 6, 1)
    rows = [
        (1, 10, "O", 1.0, before, "1-URGENT"),
        (2, 10, "O", 1.0, after, "1-URGENT"),
        (3, None, "O", 1.0, before, "1-URGENT"),
        (4, None, "O", 1.0, after, "1-URGENT"),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, DECLARED_SCHEMAS["orders"]).write.parquet(
        f"{d}/orders.parquet"
    )
    out = {r["custkey"]: r for r in join_full_outer(spark, d).collect()}
    assert out[10]["status"] == "active"
    assert out[None]["status"] == "active"  # ONE reconciled NULL-key row
    assert out[None]["n_before"] == 1 and out[None]["n_after"] == 1
    assert len(out) == 2


def test_incremental_near_dedup_verdicts(spark):
    """Constructed scenario for the online dedup: a batch doc nearly
    identical to a corpus doc -> dup_corpus; two nearly identical
    batch docs (no corpus match) -> first kept, second dup_batch;
    an unrelated doc -> kept. Plus structural invariants on the
    registered query output."""
    from promptly_data_pipelines_spark.extensions.dedup import incremental_near_dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(1, "en", base), (2, "en", "totally different words entirely here now")],
        "doc_id long, lang string, text string",
    )
    arrivals = spark.createDataFrame(
        [
            (10, "en", base + " lambda"),          # near-copy of corpus doc 1
            (11, "en", "pack my box with five dozen liquor jugs today"),
            # strict near-copy of 11 (one appended word): shingle overlap
            # 7/8 (doc 11 has 7 3-shingles, doc 12 those plus one), high
            # enough that >=1 of the 4 LSH bands matches under the
            # deterministic md5 hash family
            (12, "en", "pack my box with five dozen liquor jugs today always"),
            (13, "en", "completely unrelated content about spark plans"),
        ],
        "doc_id long, lang string, text string",
    )
    out = {r["doc_id"]: r for r in incremental_near_dedup(corpus, arrivals).collect()}
    assert out[10]["verdict"] == "dup_corpus" and out[10]["dup_of"] == 1
    assert out[11]["verdict"] == "kept" and out[11]["dup_of"] is None
    assert out[12]["verdict"] == "dup_batch" and out[12]["dup_of"] == 11
    assert out[13]["verdict"] == "kept"

    reg = run("dedup_incremental", spark, SF_DIR).collect()
    docs = table(spark, SF_DIR, "documents")
    from promptly_data_pipelines_spark.extensions.sampling import hash_bucket

    from promptly_data_pipelines_spark.extensions.sampling import TRAIN_BUCKET

    n_arrivals = docs.filter(hash_bucket("doc_id") >= TRAIN_BUCKET).count()
    assert len(reg) == n_arrivals  # every arrival gets exactly one verdict
    corpus_ids = {
        r["doc_id"]
        for r in docs.filter(hash_bucket("doc_id") < TRAIN_BUCKET).select("doc_id").collect()
    }
    for r in reg:
        if r["verdict"] == "kept":
            assert r["dup_of"] is None
        elif r["verdict"] == "dup_corpus":
            assert r["dup_of"] in corpus_ids
        else:
            assert r["verdict"] == "dup_batch" and r["dup_of"] < r["doc_id"]


def test_eval_set_is_train_disjoint_and_capped(spark):
    """Composite invariants: no eval doc shares a normalized content
    hash with any train-split doc, every eval doc is in the grouped
    TEST split, and no language exceeds the cap."""
    from promptly_data_pipelines_spark.extensions.dedup import _normalized
    from promptly_data_pipelines_spark.extensions.sampling import (
        TRAIN_BUCKET,
        VAL_BUCKET,
        hash_bucket,
    )

    ev = run("eval_set_build", spark, SF_DIR)
    d = table(spark, SF_DIR, "documents")
    sb = hash_bucket("source")
    hashed = _normalized(d).withColumn("h", F.md5("norm_text"))
    train_h = {r["h"] for r in hashed.filter(sb < TRAIN_BUCKET).select("h").collect()}
    test_ids = {
        r["doc_id"] for r in d.filter(sb >= VAL_BUCKET).select("doc_id").collect()
    }
    picked = ev.collect()
    assert picked, "eval set should not be empty on the fixture corpus"
    doc_h = {
        r["doc_id"]: r["h"] for r in hashed.select("doc_id", "h").collect()
    }
    for r in picked:
        assert r["doc_id"] in test_ids
        assert doc_h[r["doc_id"]] not in train_h
    caps = ev.groupBy("lang").count().collect()
    assert all(r["count"] <= 10 for r in caps)

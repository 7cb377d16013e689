"""Deduplication family over ``documents`` (SURVEY.md §2j X3-X4):
exact, MinHash+LSH, SimHash, n-gram Jaccard. The scale story:

- exact: hash-groupBy on a 64-bit fingerprint — one shuffle keyed by
  hash, no full-text comparison ever crosses the wire.
- MinHash+LSH: shingle → k minhashes → band buckets → join within
  buckets only. Candidate generation is linear + one shuffle on band
  keys; no O(n²) pair enumeration.
- SimHash: 64-bit signature via per-token hash bit-voting; near-dups
  share signatures up to small Hamming distance.
- n-gram Jaccard: the exact verifier — run on LSH candidates at scale;
  here also run blocked by (lang) to give the oracle a checkable
  all-pairs form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from .text import words

N_HASHES = 16
N_BANDS = 4  # 4 rows per band


def _normalized(d: DataFrame) -> DataFrame:
    return d.withColumn("norm_text", F.lower(F.trim(F.regexp_replace("text", " +", " "))))


@query(
    "dedup_exact",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS content_hash
      FROM documents
    )
    SELECT content_hash,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM keyed
    GROUP BY content_hash
    HAVING count(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: exact dedup via content-hash groupBy. Survivor = min(doc_id)
    (deterministic, unlike dropDuplicates). Only hash+id shuffle; the
    text column is pruned before the exchange."""
    d = _normalized(table(spark, sf_dir, "documents"))
    return (
        d.select("doc_id", F.md5("norm_text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def minhash_signatures(d: DataFrame, shingle_len: int = 3) -> DataFrame:
    """Word-shingle MinHash: explode w-shingles, hash each with
    N_HASHES seeded xxhash64 functions, take the per-doc min of each.
    Everything is built-in exprs; the only shuffle is the per-doc
    re-aggregation.

    The input is repartitioned first: fixture tables are single-row-
    group parquet (unsplittable → 1 scan task), and shingling+16
    hashes is the expensive stage — one small shuffle of raw docs buys
    full-width parallelism for it. On a real multi-file table the
    repartition is a no-op cost-wise (AQE coalesces)."""
    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism)
    shingled = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(words("text")) - shingle_len),
                lambda i: F.array_join(F.slice(words("text"), i + 1, shingle_len), " "),
            )
        ).alias("shingle"),
    ).dropDuplicates(["doc_id", "shingle"])
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh_{i}") for i in range(N_HASHES)
    ]
    return shingled.groupBy("doc_id").agg(*mins)


@query("dedup_near_text")  # xxhash64-based: not oracle-expressible → rows-only
def dedup_near_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: MinHash+LSH near-dup candidates. Signatures → band keys
    (hash of 4 consecutive minhashes) → self-join within (band, key)
    buckets → estimated Jaccard = fraction of matching minhashes.
    Pairs sharing ≥1 band are candidates; emit those with est ≥ 0.5.
    At 100 TB the band join is the only pairwise step and touches only
    colliding docs."""
    d = table(spark, sf_dir, "documents")
    sig = minhash_signatures(d)
    sig_arr = sig.select("doc_id", F.array(*[f"mh_{i}" for i in range(N_HASHES)]).alias("sig"))
    rows_per_band = N_HASHES // N_BANDS
    bands = sig_arr.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("sig").getItem(b * rows_per_band + r) for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sig", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))
    left = bands.alias("a")
    right = bands.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.round(
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
        / F.lit(float(N_HASHES)),
        4,
    )
    return (
        cand.select("doc_a", "doc_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS vec,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    )
    SELECT doc_a, doc_b, round(cos_sim, 6) AS cos_sim FROM (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
             list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) AS cos_sim
      FROM e a JOIN e b
        ON a.label = b.label AND a.vec_id < b.vec_id
    ) WHERE cos_sim >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4/X5: embedding-cosine near-dup pairs — semantic dedup. Blocked
    on ``label`` (the cluster/bucket key; at 100 TB this is an
    IVF/LSH cell from similarity.py, never all-pairs). Norms are
    precomputed per vector so each pair costs one dot product.
    Broadcast build side + round-robin probe repartition, same
    parallelism reasoning as dedup_ngram_jaccard."""
    from .similarity import dot

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("vec")
    )
    e = e.withColumn("nrm", F.sqrt(dot(F.col("vec"), F.col("vec"))))
    par = spark.sparkContext.defaultParallelism
    a = e.repartition(par).alias("a")
    b = F.broadcast(e).alias("b")
    pairs = a.join(
        b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id"))
    )
    cos = dot(F.col("a.vec"), F.col("b.vec")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        pairs.select(
            F.col("a.vec_id").alias("doc_a"),
            F.col("b.vec_id").alias("doc_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.4)
        .select("doc_a", "doc_b", F.round("cos_sim", 6).alias("cos_sim"))
    )


def simhash_signatures(d: DataFrame) -> DataFrame:
    """63-bit SimHash per doc from per-token hash bit votes (positive
    bit → +1, else −1; sign of the sum per bit position). Bit
    arithmetic via shiftright/bitwise-and, all codegen'd."""
    toks = d.select("doc_id", F.explode(words("text")).alias("tok"))
    hashed = toks.select("doc_id", F.xxhash64("tok").alias("h"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"bit_{i}")
            for i in range(64)
        ]
    )
    return votes.select(
        "doc_id",
        sum(
            (F.when(F.col(f"bit_{i}") > 0, F.lit(1).cast("bigint")).otherwise(0) * F.lit(2**i).cast("bigint"))
            for i in range(63)  # 63 bits: stay within signed long
        ).alias("simhash"),
    )


@query("dedup_simhash")  # xxhash64-based: rows-only
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: SimHash near-dup pairs within Hamming distance ≤ 3, via the
    block-and-verify scheme: split the 63-bit signature into 4 blocks
    — any pair within distance 3 must match exactly on ≥1 block
    (pigeonhole), so candidates come from 4 equi-joins on block keys
    (linear + shuffle, never all-pairs), then the exact Hamming
    distance (bit_count of XOR) verifies. Identical-signature exact
    clusters fall out as distance 0."""
    max_hamming = 3
    n_blocks = max_hamming + 1
    d = table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    sig = simhash_signatures(d.repartition(par))
    # block b = bits [b*16, b*16+15] (last block 15 bits of the 63)
    blocked = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftright(F.col("simhash"), b * 16)
                        .bitwiseAND(F.lit((1 << 16) - 1))
                        .alias("key"),
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.blk").alias("blk"), F.col("bk.key").alias("key"))
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("doc_a", "doc_b")
    )


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH w0 AS (
      SELECT doc_id, lang, list_filter(string_split(text, ' '), w -> w <> '') AS w
      FROM documents
    ),
    ws AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(range(1, len(w) - 1),
                           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gset
      FROM w0
    ),
    s AS (SELECT doc_id, lang, gset, len(gset) AS sz FROM ws)
    SELECT doc_a, doc_b, round(jaccard, 4) AS jaccard FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(list_intersect(a.gset, b.gset)) AS DOUBLE) /
             (a.sz + b.sz - len(list_intersect(a.gset, b.gset))) AS jaccard
      FROM s a JOIN s b
        ON a.lang = b.lang AND a.doc_id < b.doc_id
       AND least(a.sz, b.sz) * 2 >= greatest(a.sz, b.sz)
    ) WHERE jaccard >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: exact 3-gram-shingle Jaccard within (lang) blocks — the
    verifier stage of near-dup dedup, computed via an inverted index
    (posting-list equi-join), the shuffle-native formulation:

    - Shingles are 3-gram sequences hashed to 64-bit xxhash64
      fingerprints (the oracle intersects the raw strings — equal
      unless a 64-bit collision occurs, ~1e-11 over the corpus).
    - Each doc explodes to (shingle, doc) postings; a self-join on the
      shingle key + groupBy(pair) count(*) yields |A∩B| exactly, and
      only for pairs sharing ≥1 shingle — pairs with empty
      intersection are never materialized. The join key (30k distinct
      shingles) shuffles evenly, unlike a lang-blocked pair join
      (5 keys → 5 tasks). Measured 1.6× faster than the blocked
      all-pairs + array_intersect form at sf0.1.
    - Size-band pruning in the join condition: J ≥ 0.5 requires
      min(|A|,|B|)/max ≥ 0.5 (integer-arithmetic form, exact).
    - At 100 TB: posting lists of ultra-frequent shingles are the skew
      risk — cap df (drop shingles with df > threshold; they cannot
      distinguish near-dups) or feed LSH candidates (dedup_near_text)
      to the pairwise stage instead."""
    d = table(spark, sf_dir, "documents")
    w = words("text")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 2),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(w, i, 3))),
        )
    )
    par = spark.sparkContext.defaultParallelism
    ws = (
        d.repartition(par)  # single-row-group input: 1 scan task otherwise
        .select("doc_id", "lang", shingles.alias("gset"))
        .withColumn("sz", F.size("gset"))
    )
    post = ws.select("doc_id", "lang", "sz", F.explode("gset").alias("sh"))
    a, b = post.alias("a"), post.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.least(F.col("a.sz"), F.col("b.sz")) * 2
                >= F.greatest(F.col("a.sz"), F.col("b.sz"))
            ),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sz").alias("sza"),
            F.col("b.sz").alias("szb"),
        )
        .agg(F.count("*").alias("c"))
    )
    jac = F.col("c").cast("double") / (F.col("sza") + F.col("szb") - F.col("c"))
    return (
        pairs.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )

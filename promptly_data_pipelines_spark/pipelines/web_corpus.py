"""End-to-end WEB-corpus curation composite (r6 session-2 analog of
corpus_prep.py, over the boilerplate/learned tier):

    stage (per-site template) → line-dedup (strip boilerplate)
    → min-length gate → unigram-LM perplexity scoring (hash-split
    train) → per-language head/middle/tail terciles → mix report

This is the CCNet pipeline skeleton: dedup boilerplate FIRST (the
template would otherwise dominate both the LM and the length gate),
then score fluency under a language model trained on the cleaned
corpus itself, then cut per-language terciles that downstream
sampling draws from head-heavy. Every stage reuses an
already-verified operator (extensions.lines.split_lines/line_dedup,
the classify.py LM shape) chained in ONE lazy plan, and the whole
composite carries a complete DuckDB oracle assembled from the same
fragments.

Scale shape: line dedup is the census + broadcast anti-join
(lines.py); the LM model is vocabulary-bounded and broadcasts; the
tercile window partitions by lang. One corpus-sized shuffle per
stage boundary, nothing quadratic, nothing collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..catalog import table
from ..registry import query
from ..extensions.classify import _SQL_BUCKET
from ..extensions.lines import (
    HOT_DOC_FREQ,
    SEG_TOKENS,
    _TEMPLATE_SQL,
    _template_col,
    line_dedup,
    split_lines,
)
from ..extensions.sampling import TRAIN_BUCKET, hash_bucket
from ..extensions.text import words

MIN_CLEAN_WORDS = 8  # post-dedup floor: template-only shells drop here


@query(
    "web_corpus_prep",
    registered=False,
    oracle=f"""
    WITH staged AS (
      SELECT doc_id, lang, {_TEMPLATE_SQL} AS text FROM documents
    ),
    t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS w
      FROM staged
    ),
    s AS (
      SELECT doc_id, w, unnest(range(0, len(w), {SEG_TOKENS})) AS start
      FROM t WHERE len(w) > 0
    ),
    lines AS (
      SELECT doc_id,
             CAST(start // {SEG_TOKENS} AS BIGINT) AS seg_idx,
             array_to_string(w[start + 1 : start + {SEG_TOKENS}], ' ') AS line
      FROM s
    ),
    hot AS (
      SELECT line FROM lines GROUP BY line
      HAVING count(DISTINCT doc_id) >= {HOT_DOC_FREQ}
    ),
    cleaned AS (
      SELECT doc_id,
             array_to_string(
               list_transform(
                 list_sort(list({{'seg_idx': seg_idx, 'line': line}})),
                 x -> x.line), ' ') AS clean_text
      FROM lines
      WHERE line NOT IN (SELECT line FROM hot)
      GROUP BY doc_id
    ),
    gated AS (
      SELECT c.doc_id, d.lang,
             list_filter(string_split(c.clean_text, ' '), w -> w <> '') AS w
      FROM cleaned c JOIN documents d ON c.doc_id = d.doc_id
      WHERE len(list_filter(string_split(c.clean_text, ' '), w -> w <> ''))
            >= {MIN_CLEAN_WORDS}
    ),
    train_toks AS (
      SELECT lang, unnest(w) AS word FROM gated
      WHERE {_SQL_BUCKET} < {TRAIN_BUCKET}
    ),
    cnt AS (SELECT lang, word, CAST(count(*) AS BIGINT) AS c FROM train_toks GROUP BY 1, 2),
    tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS tot FROM cnt GROUP BY 1),
    vocab AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS v FROM cnt),
    doc_words AS (
      SELECT doc_id, lang, unnest(w) AS word FROM gated
    ),
    dw AS (
      SELECT doc_id, lang, word, CAST(count(*) AS BIGINT) AS m
      FROM doc_words GROUP BY 1, 2, 3
    ),
    ce AS (
      SELECT d.doc_id, d.lang, CAST(sum(d.m) AS BIGINT) AS n_tokens,
             -sum(d.m * ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE) / (t.tot + vocab.v)))
               / sum(d.m) AS h
      FROM dw d
      JOIN tot t ON d.lang = t.lang
      CROSS JOIN vocab
      LEFT JOIN cnt c ON c.lang = d.lang AND c.word = d.word
      GROUP BY d.doc_id, d.lang
    ),
    buckets AS (
      SELECT *, CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
      FROM (
        SELECT *, ntile(3) OVER (PARTITION BY lang ORDER BY round(h, 6), doc_id) AS nt
        FROM ce
      )
    )
    SELECT lang, bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           round(sum(round(h, 4)), 4) AS sum_ce
    FROM buckets
    GROUP BY lang, bucket
    """,
)
def web_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full web-curation chain over the staged corpus; returns the
    per-(lang, bucket) mix report — doc counts, token mass, and
    cross-entropy totals — the table a data-mixing step consumes to
    set head/middle/tail sampling rates per language."""
    d = table(spark, sf_dir, "documents")
    staged = d.select("doc_id", _template_col().alias("text"))
    lines = split_lines(staged).persist(StorageLevel.MEMORY_AND_DISK)
    cleaned = line_dedup(lines).select("doc_id", "clean_text")

    gated = (
        cleaned.join(d.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", words("clean_text").alias("w"))
        .filter(F.size("w") >= MIN_CLEAN_WORDS)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    train_toks = (
        gated.filter(hash_bucket("doc_id") < TRAIN_BUCKET)
        .select("lang", F.explode("w").alias("word"))
    )
    cnt = train_toks.groupBy("lang", "word").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("lang").agg(F.sum("c").cast("bigint").alias("tot"))
    vocab = cnt.agg(F.countDistinct("word").alias("v"))

    dw = (
        gated.select("doc_id", "lang", F.explode("w").alias("word"))
        .groupBy("doc_id", "lang", "word")
        .agg(F.count("*").cast("bigint").alias("m"))
    )
    cnt_k = cnt.select(F.col("lang").alias("c_lang"), F.col("word").alias("c_word"), "c")
    scored = (
        dw.join(F.broadcast(tot), "lang")
        .crossJoin(F.broadcast(vocab))
        .join(
            F.broadcast(cnt_k),
            (F.col("lang") == F.col("c_lang")) & (F.col("word") == F.col("c_word")),
            "left",
        )
    )
    ce = scored.groupBy("doc_id", "lang").agg(
        F.sum("m").cast("bigint").alias("n_tokens"),
        (
            -F.sum(
                F.col("m")
                * F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                    / (F.col("tot") + F.col("v"))
                )
            )
            / F.sum("m")
        ).alias("h"),
    )
    w = Window.partitionBy("lang").orderBy(F.round("h", 6), "doc_id")
    buckets = ce.withColumn("nt", F.ntile(3).over(w)).withColumn(
        "bucket",
        F.when(F.col("nt") == 1, "head")
        .when(F.col("nt") == 2, "middle")
        .otherwise("tail"),
    )
    return buckets.groupBy("lang", "bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.round(F.sum(F.round("h", 4)), 4).alias("sum_ce"),
    )

"""Cross-document line-level deduplication (boilerplate removal).

Web-curation pipelines (CCNet, RefinedWeb, Dolma) drop *lines* that
repeat across many documents — site navigation, cookie banners,
copyright footers — before any document-level dedup runs: the
boilerplate otherwise both inflates near-dup similarity and pollutes
the training corpus with template text. The reference's curated layer
has no line tier (its documents are rows, dbt/promptly/models/curated/
curated_provider.sql:1-20); this module supplies the operator the
100 TB corpus path needs.

The fixture corpus has no newlines, so the registered query stages a
faithful miniature of the real workload: every document gets its
source's 4-token site template prepended (one "line" of per-site
boilerplate shared by every doc of that source), and "lines" are
fixed 4-token segments — the same slice-by-stride construction as
text_chunk_windows, stride == width. A real deployment splits on
'\\n' instead; ``line_dedup`` takes the already-exploded lines frame,
so the segmentation policy is the caller's.

Scale design (100 TB):
- the lines frame is persisted once and feeds both derivations (hot
  line census + anti-join), mirroring the signature-table pattern in
  extensions/dedup.py:280-290 — without it the corpus is scanned and
  re-exploded twice;
- the hot-line census (count(DISTINCT doc_id) >= threshold) output is
  tiny by construction — boilerplate lines are the heavy tail of the
  line-frequency distribution, the census keeps only lines above the
  threshold — so it broadcasts into the anti-join and the line stream
  never shuffles for the filter (pinned:
  tests/test_plan_quality.py::test_line_dedup_hot_census_broadcast);
- document reassembly is ONE groupBy(doc_id) with an in-row
  array_sort — no order-by, no window over the full line stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..catalog import table
from ..registry import query
from .text import words

SEG_TOKENS = 4  # pseudo-line width (tokens); real corpora split on \n
HOT_DOC_FREQ = 5  # a line present in >= this many docs is boilerplate

# Per-site template prepended by the staging step: 4 tokens = exactly
# one segment, so the boilerplate aligns with the line grid the way a
# real template line aligns with '\n' splits.
_TEMPLATE_SQL = "'site ' || source || ' home login ' || text"


def _template_col() -> F.Column:
    return F.concat_ws(
        " ", F.lit("site"), F.col("source"), F.lit("home"), F.lit("login"), F.col("text")
    )


def split_lines(d: DataFrame, seg_tokens: int = SEG_TOKENS) -> DataFrame:
    """(doc_id, text) -> (doc_id, seg_idx, line): fixed-width token
    segments, stride == width (each token in exactly one line). Pure
    expression tree — tokenize, sequence of starts, slice — all
    map-side; the explosion happens after column pruning."""
    w = words("text")
    t = d.select("doc_id", w.alias("w")).filter(F.size("w") > 0)
    starts = F.sequence(F.lit(0), F.size("w") - 1, F.lit(seg_tokens))
    s = t.select("doc_id", "w", F.explode(starts).alias("start"))
    return s.select(
        "doc_id",
        (F.col("start") / seg_tokens).cast("bigint").alias("seg_idx"),
        F.array_join(F.slice(F.col("w"), F.col("start") + 1, F.lit(seg_tokens)), " ").alias(
            "line"
        ),
    )


def hot_lines(lines: DataFrame, min_doc_freq: int = HOT_DOC_FREQ) -> DataFrame:
    """Boilerplate census: lines appearing in >= min_doc_freq distinct
    documents. Output is the heavy tail only — small by construction,
    broadcastable."""
    return (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("line_df"))
        .filter(F.col("line_df") >= min_doc_freq)
    )


def line_dedup(
    lines: DataFrame, min_doc_freq: int = HOT_DOC_FREQ
) -> DataFrame:
    """Drop boilerplate lines, reassemble documents in line order.

    Documents whose every line is boilerplate drop out entirely (the
    CCNet convention: a template-only page carries no content worth
    keeping). Returns (doc_id, n_lines_kept, clean_text)."""
    hot = hot_lines(lines, min_doc_freq)
    kept = lines.join(F.broadcast(hot.select("line")), "line", "left_anti")
    return kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_lines_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "line"))),
                lambda s: s["line"],
            ),
            " ",
        ).alias("clean_text"),
    )


@query(
    "text_line_dedup",
    registered=False,
    oracle=f"""
    WITH staged AS (
      SELECT doc_id, {_TEMPLATE_SQL} AS text FROM documents
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
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_lines_kept,
           array_to_string(
             list_transform(
               list_sort(list({{'seg_idx': seg_idx, 'line': line}})),
               x -> x.line), ' ') AS clean_text
    FROM lines
    WHERE line NOT IN (SELECT line FROM hot)
    GROUP BY doc_id
    """,
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-line removal over the staged corpus: the per-site
    template line (shared by every doc of a source, df ~ 70-190 >>
    {HOT_DOC_FREQ}) is detected and stripped from every document,
    along with any natural 4-gram segment that repeats across >=
    {HOT_DOC_FREQ} docs; unique content lines survive and documents
    reassemble in original order."""
    d = table(spark, sf_dir, "documents")
    staged = d.select("doc_id", _template_col().alias("text"))
    lines = split_lines(staged).persist(StorageLevel.MEMORY_AND_DISK)
    return line_dedup(lines)

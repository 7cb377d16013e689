"""Plan-tax sweep: for each query, min-of-2 FRESH-plan executions vs
min-of-2 SAME-plan-object re-executions at a small SF. The gap is the
per-invocation DRIVER cost (analysis + optimization), which is
constant in data size — invisible at 100 TB where one plan amortizes
over hours, but pure tax on per-batch/interactive use (streaming
micro-batches, the driver's 50-query sweep, bench).

This sweep found the r9 defects recorded in BASELINE.md:
dedup_simhash's 1.5 s CollapseProject analysis bomb (fresh 1.6 s vs
re-run 0.15 s at 50k docs) and doc_winnowing's O(n²) md5 re-eval
(fresh ≈ re-run ≈ 24.5 s — a large SAME-plan time at a tiny SF is
the execution-pathology signal, the complement of a large gap).

Run: python tools/probe_plantax.py [query ...]   (default: heavy set)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from promptly_data_pipelines_spark.registry import (  # noqa: E402
    all_queries,
    local_only_queries,
)
from promptly_data_pipelines_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("PLANTAX_SF_DIR", "/root/testdata/sf0.01")
DEFAULT = [
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_near_text",
    "dedup_near_text_exact",
    "dedup_embedding_cosine",
    "flagship_curated",
    "join_star",
    "text_tfidf_topk",
    "similarity_topk",
    "text_dup_span_fraction",
    "doc_winnowing",
    "web_corpus_prep",
    "split_contamination",
    "classify_nb_lang",
]


def main() -> None:
    spark = get_session()
    qs = {**all_queries(), **local_only_queries()}
    names = sys.argv[1:] or DEFAULT
    print(f"{'query':28s} fresh  reuse  plan-tax   (sf={SF_DIR})")
    for n in names:
        fn = qs[n]

        def run(df=None):
            (df if df is not None else fn(spark, SF_DIR)).write.format(
                "noop"
            ).mode("overwrite").save()

        run()  # warm: JIT, shuffle dirs, python workers
        fresh = []
        for _ in range(2):
            spark.catalog.clearCache()  # fresh runs pay any persist too
            t0 = time.monotonic()
            run()
            fresh.append(time.monotonic() - t0)
        df = fn(spark, SF_DIR)
        run(df)
        reuse = []
        for _ in range(2):
            t0 = time.monotonic()
            run(df)
            reuse.append(time.monotonic() - t0)
        print(
            f"{n:28s} {min(fresh):5.2f}  {min(reuse):5.2f}  {min(fresh) - min(reuse):5.2f}"
        )


if __name__ == "__main__":
    main()

"""Capture .explain('formatted') for named queries into plans/<tag>/.

Optimization-round evidence tool (guide §1): the judge cannot run
Spark, so every plan claim in OPTIMIZATION_r*.md is backed by a
committed plans/<tag>/<query>_<suffix>.txt file produced here.

Run:  python tools/capture_plans.py --tag r16 --suffix before name...
      python tools/capture_plans.py --tag r16 --suffix before --all-headline

Notes: some query callables do eager work (stream drains, index
builds) before returning their final DataFrame — the capture still
records the final frame's plan, and the eager work happens once per
capture. Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1),
the bench SF, with the bench's session shape.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_near_text",
    "dedup_embedding_cosine",
    "udf_grouped_map_coarse",
    "flagship_curated",
    "join_star",
    "agg_group",
    "dedup_latest",
    "window_sliding_avg",
    "topk_group",
    "merge_upsert",
    "stream_session",
    "text_token_counts",
    "text_tfidf_topk",
    "similarity_topk",
    "sink_partitioned",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r16")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--all-headline", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from promptly_data_pipelines_spark.registry import (
        all_queries,
        local_only_queries,
    )
    from promptly_data_pipelines_spark.session import get_session

    spark = get_session("pdp-plan-capture", cpus=CPUS, shuffle_partitions=CPUS)
    queries = {**local_only_queries(), **all_queries()}
    names = list(args.names)
    if args.all_headline:
        names = HEADLINE + [n for n in names if n not in HEADLINE]

    out_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        try:
            df = queries[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            plan = "CAPTURE FAILED:\n" + traceback.format_exc()
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()

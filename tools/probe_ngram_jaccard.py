"""Within-session decomposition of dedup_ngram_jaccard on the skew10
slice (r7 verdict item #1): the 69 s superlinear line split into
(a) postings build + df-cap, (b) posting-list groupBy, (c) pair-stream
generation (the HOF explode), (d) pair groupBy + Jaccard filter, and
(e) the full registered query — plus the row counts that explain the
cost (postings, lists, PAIR-STREAM rows, output pairs). Run on a quiet
machine and paste the JSON into BASELINE.md.

Stages (b)-(d) read persisted upstream frames so each timing isolates
one stage; (c) vs (d) share the explode, so pair_agg-only ≈ d - c.
The stage bodies are kept in lockstep with
extensions/dedup.py:ngram_jaccard_pairs.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from promptly_data_pipelines_spark.catalog import table
from promptly_data_pipelines_spark.extensions.dedup import (
    DF_CAP,
    capped_postings,
    dedup_ngram_jaccard,
    shingle_postings,
)
from promptly_data_pipelines_spark.extensions.stress import write_skewed_sf
from promptly_data_pipelines_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("NGRAM_PROBE_REPS", "3"))
SKEW = os.environ.get("NGRAM_PROBE_SKEW", "1") == "1"  # probe the skew10 slice
THRESHOLD = 0.5


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _lists(post_ok):
    return (
        post_ok.groupBy("sh", "lang")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "sz"))).alias("docs"))
        .filter(F.size("docs") >= 2)
    )


def _pair_stream(lists):
    n = F.size(F.col("docs"))
    pair_arrays = F.flatten(
        F.transform(
            F.col("docs"),
            lambda x, i: F.filter(
                F.transform(
                    F.slice(F.col("docs"), i + 2, n),
                    lambda y: F.struct(
                        x["doc_id"].alias("doc_a"),
                        x["sz"].alias("sza"),
                        y["doc_id"].alias("doc_b"),
                        y["sz"].alias("szb"),
                    ),
                ),
                lambda p: F.least(p["sza"], p["szb"]).cast("double")
                >= F.lit(THRESHOLD) * F.greatest(p["sza"], p["szb"]) - F.lit(1e-6),
            ),
        )
    )
    return (
        lists.select(F.explode_outer(pair_arrays).alias("p"))
        .filter(F.col("p").isNotNull())
    )


def _pair_agg(stream):
    pairs = stream.groupBy("p.doc_a", "p.doc_b", "p.sza", "p.szb").agg(
        F.count("*").alias("c")
    )
    jac = F.col("c").cast("double") / (F.col("sza") + F.col("szb") - F.col("c"))
    return (
        pairs.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= THRESHOLD)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def main() -> None:
    load_start = os.getloadavg()
    spark = get_session("ngram-probe", cpus=CPUS, shuffle_partitions=CPUS)

    probe_dir = SF_DIR
    tmp = None
    if SKEW:
        tmp = tempfile.mkdtemp(prefix="pdp_ngram_probe_")
        probe_dir = write_skewed_sf(spark, SF_DIR, tmp, factor=10)
    try:
        d = table(spark, probe_dir, "documents")

        # diagnostic counts (once, untimed): where the volume lives
        post_ok = capped_postings(shingle_postings(d), DF_CAP)
        counts = {"docs": d.count(), "postings_capped": post_ok.count()}
        spark.catalog.clearCache()
        lists_c = _lists(capped_postings(shingle_postings(d), DF_CAP)).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        counts["lists"] = lists_c.count()
        counts["pair_stream"] = _pair_stream(lists_c).count()
        counts["out_pairs"] = _pair_agg(_pair_stream(lists_c)).count()
        lists_c.unpersist()
        spark.catalog.clearCache()

        # steady-state discipline: one untimed full warmup
        _noop(dedup_ngram_jaccard(spark, probe_dir))

        out: dict[str, list[float]] = {
            "postings": [],
            "lists": [],
            "pair_gen": [],
            "pair_agg_from_lists": [],
            "full": [],
        }
        for _ in range(REPS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _noop(capped_postings(shingle_postings(d), DF_CAP))
            out["postings"].append(round(time.perf_counter() - t0, 3))

            spark.catalog.clearCache()
            post = capped_postings(shingle_postings(d), DF_CAP).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            post.count()
            t0 = time.perf_counter()
            _noop(_lists(post))
            out["lists"].append(round(time.perf_counter() - t0, 3))

            spark.catalog.clearCache()
            lists_p = _lists(
                capped_postings(shingle_postings(d), DF_CAP)
            ).persist(StorageLevel.MEMORY_AND_DISK)
            lists_p.count()
            t0 = time.perf_counter()
            _noop(_pair_stream(lists_p))
            out["pair_gen"].append(round(time.perf_counter() - t0, 3))

            t0 = time.perf_counter()
            _noop(_pair_agg(_pair_stream(lists_p)))
            out["pair_agg_from_lists"].append(round(time.perf_counter() - t0, 3))
            lists_p.unpersist()

            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _noop(dedup_ngram_jaccard(spark, probe_dir))
            out["full"].append(round(time.perf_counter() - t0, 3))

        print(
            json.dumps(
                {
                    "metric": "ngram_jaccard_decomposition",
                    "sf_dir": SF_DIR,
                    "skew10": SKEW,
                    "reps": REPS,
                    "counts": counts,
                    "min": {k: min(v) for k, v in out.items()},
                    "all": out,
                    "loadavg_start": [round(x, 2) for x in load_start],
                    "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                }
            )
        )
    finally:
        if tmp:
            shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

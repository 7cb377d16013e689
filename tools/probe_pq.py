"""Within-session decomposition of similarity_topk_pq (r7 verdict item
#3): the 11.1 s line split into (a) train (2-iter Lloyd codebooks),
(b) encode (map-side code assignment), (c) ADC scan + shortlist window,
(d) exact re-rank, and (e) the full query — plus single-iteration train
and its recall, to decide whether iters=2 earns its corpus pass. Run on
a quiet machine and paste the JSON into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import Window
from pyspark.sql import functions as F

from promptly_data_pipelines_spark.catalog import table
from promptly_data_pipelines_spark.extensions.similarity import (
    N_QUERIES,
    PQ_DIM,
    PQ_M,
    PQ_SHORTLIST_MIN,
    TOP_K,
    _doubled,
    _sq_dist,
    cosine,
    pq_encode,
    pq_train,
    similarity_topk,
    similarity_topk_pq,
)
from promptly_data_pipelines_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("PQ_PROBE_REPS", "3"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _adc_shortlist(e, enc, cents, n_corpus):
    """Steps 3-4 of similarity_topk_pq, from a given encoded corpus."""
    shortlist_k = max(PQ_SHORTLIST_MIN, -(-n_corpus // 5))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    qsub = q.select(
        "query_id",
        F.posexplode(
            F.array(*[F.slice(F.col("qvec"), s * PQ_DIM + 1, PQ_DIM) for s in range(PQ_M)])
        ).alias("sub", "qsvec"),
    )
    partials = qsub.join(F.broadcast(cents), "sub").select(
        "query_id", "sub", "code",
        F.round(_sq_dist(F.col("qsvec"), F.col("cvec")), 6).alias("pd"),
    )
    adc = (
        enc.join(F.broadcast(partials), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("pd"), 6).alias("adc_dist"))
    )
    short_w = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("vec_id"))
    return (
        adc.withColumn("srk", F.row_number().over(short_w))
        .filter(F.col("srk") <= shortlist_k)
        .select("query_id", "vec_id")
    ), q


def _recall(spark, approx_df, exact_pairs) -> float:
    got = {(r.query_id, r.vec_id) for r in approx_df.collect()}
    return round(len(exact_pairs & got) / len(exact_pairs), 3)


def main() -> None:
    load_start = os.getloadavg()
    spark = get_session("pq-probe", cpus=CPUS, shuffle_partitions=CPUS)
    e = _doubled(table(spark, SF_DIR, "embeddings"))
    n_corpus = e.count()

    exact_pairs = {
        (r.query_id, r.vec_id) for r in similarity_topk(spark, SF_DIR).collect()
    }

    # warmup
    _noop(similarity_topk_pq(spark, SF_DIR))

    out: dict[str, list[float]] = {
        "train2": [], "train1": [], "encode": [], "adc_shortlist": [],
        "rerank": [], "full": [],
    }
    for _ in range(REPS):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        cents2 = pq_train(spark, e, iters=2)
        out["train2"].append(round(time.perf_counter() - t0, 3))

        t0 = time.perf_counter()
        cents1 = pq_train(spark, e, iters=1)
        out["train1"].append(round(time.perf_counter() - t0, 3))

        t0 = time.perf_counter()
        _noop(pq_encode(e, cents2))
        out["encode"].append(round(time.perf_counter() - t0, 3))

        enc_p = pq_encode(e, cents2).persist(StorageLevel.MEMORY_AND_DISK)
        enc_p.count()
        t0 = time.perf_counter()
        shortlist, q = _adc_shortlist(e, enc_p, cents2, n_corpus)
        _noop(shortlist)
        out["adc_shortlist"].append(round(time.perf_counter() - t0, 3))

        shortlist_p = shortlist.persist(StorageLevel.MEMORY_AND_DISK)
        shortlist_p.count()
        t0 = time.perf_counter()
        rerank = (
            shortlist_p.join(e.select("vec_id", "vec"), "vec_id")
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id", "vec_id",
                F.round(cosine(F.col("qvec"), F.col("vec")), 6).alias("cos_sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        _noop(
            rerank.withColumn("rk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rk") <= TOP_K)
        )
        out["rerank"].append(round(time.perf_counter() - t0, 3))
        shortlist_p.unpersist()
        enc_p.unpersist()

        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _noop(similarity_topk_pq(spark, SF_DIR))
        out["full"].append(round(time.perf_counter() - t0, 3))

    # recall with 1 vs 2 training iterations (top-k via the full path
    # but swapping the codebook)
    recalls = {}
    for label, cents in (("iters2", cents2), ("iters1", cents1)):
        enc = pq_encode(e, cents)
        shortlist, q = _adc_shortlist(e, enc, cents, n_corpus)
        rerank = (
            shortlist.join(e.select("vec_id", "vec"), "vec_id")
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id", "vec_id",
                F.round(cosine(F.col("qvec"), F.col("vec")), 6).alias("cos_sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        topk = (
            rerank.withColumn("rk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rk") <= TOP_K)
        )
        recalls[label] = _recall(spark, topk, exact_pairs)

    print(
        json.dumps(
            {
                "metric": "pq_decomposition",
                "sf_dir": SF_DIR,
                "n_corpus": n_corpus,
                "reps": REPS,
                "min": {k: min(v) for k, v in out.items()},
                "all": out,
                "recall": recalls,
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Within-session decomposition of dedup_simhash (r6 verdict item #3):
one JVM, N reps each of (a) signature build alone, (b) band join +
Hamming verify reading a pre-materialized signature cache, (c) the full
registered query — the same split dedup_near_text got in r5. Prints one
JSON line; run on a quiet machine and paste the result into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from promptly_data_pipelines_spark.catalog import table
from promptly_data_pipelines_spark.extensions.dedup import (
    dedup_simhash,
    simhash_signatures,
)
from promptly_data_pipelines_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SIMHASH_PROBE_REPS", "5"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _band_join(spark, sig):
    """The post-signature half of dedup_simhash: block keys → self-join
    → Hamming verify (kept in lockstep with dedup_simhash's body)."""
    n_blocks = 4
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
        .filter(F.col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    )


def main() -> None:
    load_start = os.getloadavg()
    spark = get_session("simhash-probe", cpus=CPUS, shuffle_partitions=CPUS)
    d = table(spark, SF_DIR, "documents")
    par = spark.sparkContext.defaultParallelism

    # steady-state discipline (same as bench.py PAIR_OPS): one untimed
    # warmup of the full query amortizes JIT/codegen first-touch
    _noop(dedup_simhash(spark, SF_DIR))

    out: dict[str, list[float]] = {"signature": [], "band_join": [], "full": []}
    for _ in range(REPS):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _noop(simhash_signatures(d.repartition(par)))
        out["signature"].append(round(time.perf_counter() - t0, 3))

        spark.catalog.clearCache()
        sig = simhash_signatures(d.repartition(par)).persist(StorageLevel.MEMORY_AND_DISK)
        sig.count()  # materialize OUTSIDE the timed window
        t0 = time.perf_counter()
        _noop(_band_join(spark, sig))
        out["band_join"].append(round(time.perf_counter() - t0, 3))

        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _noop(dedup_simhash(spark, SF_DIR))
        out["full"].append(round(time.perf_counter() - t0, 3))

    print(
        json.dumps(
            {
                "metric": "simhash_decomposition",
                "sf_dir": SF_DIR,
                "reps": REPS,
                "min": {k: min(v) for k, v in out.items()},
                "all": out,
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

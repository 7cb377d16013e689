"""Decompose similarity_ivfpq_build / similarity_pq_build (r16 opt
round): per-stage wall time for the persisted-index build at
$SPARK_GRAFT_SF_DIR — count/persist, learned_centroids (3 Lloyd
passes), cell assign+write, pq_train, pq_encode+write — so the
optimization targets the measured stage, not a guess (guide §1).

Run:  python tools/probe_ivfpq_build.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("PDP_PROBE_REPS", "2"))


def main() -> None:
    from pyspark.storagelevel import StorageLevel

    from promptly_data_pipelines_spark.catalog import table
    from promptly_data_pipelines_spark.extensions.similarity import (
        N_ASSIGN,
        _cell_assign,
        _doubled,
        learned_centroids,
        pq_encode,
        pq_train,
    )
    from promptly_data_pipelines_spark.session import get_session

    spark = get_session("pdp-probe-ivfpq", cpus=CPUS, shuffle_partitions=CPUS)
    # the bench warmup
    table(spark, SF_DIR, "lineitem").agg({"*": "count"}).write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict[str, list[float]] = {}

    def timed(label: str, fn) -> object:
        t0 = time.perf_counter()
        r = fn()
        out.setdefault(label, []).append(round(time.perf_counter() - t0, 3))
        return r

    for _ in range(REPS):
        spark.catalog.clearCache()
        dest = tempfile.mkdtemp(prefix="pdp_probe_ivfpq_")
        try:
            e = _doubled(table(spark, SF_DIR, "embeddings")).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            n = timed("count_persist", e.count)
            cents = timed("learned_centroids_3it", lambda: learned_centroids(e))
            timed("centroids_write", lambda: cents.write.mode("overwrite").parquet(
                os.path.join(dest, "centroids.parquet")))
            timed(
                "cell_assign_write",
                lambda: _cell_assign(e, cents, N_ASSIGN)
                .select("vec_id", "cell")
                .write.mode("overwrite")
                .parquet(os.path.join(dest, "assign.parquet")),
            )
            cb = timed("pq_train", lambda: pq_train(spark, e, n_corpus=n))
            timed(
                "pq_encode_write",
                lambda: pq_encode(e, cb)
                .write.mode("overwrite")
                .parquet(os.path.join(dest, "codes.parquet")),
            )
            e.unpersist()
        finally:
            shutil.rmtree(dest, ignore_errors=True)
    print(json.dumps(out, indent=1), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

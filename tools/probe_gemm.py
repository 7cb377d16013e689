"""A/B: exact top-k via per-pair HOF expressions (similarity_topk) vs
one-GEMM-per-block candidates + exact re-score (similarity_topk_gemm),
as the corpus grows. The sf tables top out at 2k vectors — overhead-
dominated, the two are within noise there — so this probe amplifies
the real sf0.1 embeddings table (deterministic vec_id remap + tiny
per-copy rotation of the vector so copies aren't exact duplicates;
dim and value distribution preserved) and measures both at each n.

Run: python tools/probe_gemm.py   (prints one line per n per form)
Results recorded in BASELINE.md (round-9 section).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from promptly_data_pipelines_spark.extensions.similarity import (  # noqa: E402
    similarity_topk,
    similarity_topk_gemm,
)
from promptly_data_pipelines_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 10, 100)


def amplified_dir(spark, factor: int) -> str:
    out = os.path.join(tempfile.gettempdir(), f"pdp_gemm_probe_x{factor}")
    dest = os.path.join(out, "embeddings.parquet")
    if not os.path.exists(dest):
        e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        n = e.count()
        reps = spark.range(factor).withColumnRenamed("id", "rep")
        # copy 0 is the original corpus (query vectors vec_id<5 stay
        # put); later copies get remapped ids and a deterministic
        # per-copy perturbation of the first component so no copy is
        # an exact duplicate of another
        amp = (
            e.crossJoin(reps)
            .select(
                (F.col("vec_id") + F.col("rep") * F.lit(n)).alias("vec_id"),
                F.when(F.col("rep") == 0, F.col("embedding"))
                .otherwise(
                    F.concat(
                        F.array(
                            F.element_at("embedding", 1)
                            + (F.col("rep") % 97).cast("float") / F.lit(1000.0)
                        ),
                        F.slice("embedding", 2, 10_000),
                    )
                )
                .alias("embedding"),
                F.col("label"),
            )
        )
        amp.repartition(max(8, factor)).write.mode("overwrite").parquet(dest)
    return out


def main() -> None:
    spark = get_session()
    for factor in FACTORS:
        d = amplified_dir(spark, factor)
        n = spark.read.parquet(os.path.join(d, "embeddings.parquet")).count()
        for name, fn in (("hof", similarity_topk), ("gemm", similarity_topk_gemm)):
            fn(spark, d).collect()  # untimed warmup: JIT + worker spin-up
            runs = []
            for _ in range(3):
                t0 = time.monotonic()
                rows = fn(spark, d).collect()
                runs.append(time.monotonic() - t0)
            print(
                f"n={n} {name}: min={min(runs):.3f}s "
                f"runs={[round(t, 3) for t in runs]} rows={len(rows)}",
                flush=True,
            )


if __name__ == "__main__":
    main()

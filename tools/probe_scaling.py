"""Scaling-linearity probe (r9): measure, don't argue.

For each headline operator family, time the registered query at a
uniform 1× and 10× amplification of sf0.1 (extensions/scaling.py —
distribution-preserving: constant dup density, constant group
cardinality, FK-consistent keys) and report the implied scaling
exponent log(t10/t1)/log(10). ≈1.0 is linear in rows, <1 means local
fixed overhead (JVM/stage setup) still dominates at this size, >1 is
a scale bug worth a decomposition.

Each factor runs in its OWN subprocess (a real JVM fork — the same
JMH discipline bench.py's stress tier uses), so accumulated
heap/codegen state can't bias the larger factor, which necessarily
runs longer. Factor 1 goes through the same amplification writer
(rep=0 token salt included), so both ends read parquet of identical
physics and the ratio isolates row volume.

Run on a quiet machine and paste the JSON into BASELINE.md:

    python tools/probe_scaling.py            # factors 1,10 — ~10 min
    PDP_SCALE_FACTORS=1,3,10 python tools/probe_scaling.py
    # r10 extra-decade run (verdict item #6): the dedup/join family
    # only, out to factor 30 (~18M lineitem-equivalent rows):
    PDP_SCALE_FACTORS=1,10,30 \
    PDP_SCALE_OPS=agg_group,join_star,topk_group,dedup_exact,dedup_near_text,dedup_simhash,dedup_ngram_jaccard \
      python tools/probe_scaling.py
"""

from __future__ import annotations

import json
import math
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# One representative per headline family that reads an amplified fact
# table. dedup_ngram_jaccard is deliberately included: the r7/r8 skew
# finding was superlinearity on DENSE clusters — this probe shows what
# it does at constant dup density, separating "skew-shaped cost" from
# "row-volume-shaped cost".
OPS = (
    "agg_group",
    "join_star",
    "topk_group",
    "window_sliding_avg",
    "text_token_counts",
    "text_tfidf_topk",
    "dedup_exact",
    "dedup_near_text",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "similarity_topk",
    # r11: retrieval family — bm25's one corpus shuffle, the index
    # build's two-level agg + bounded head, and the expression-only
    # phrase grep (expected near-IO-bound, the row-linear floor)
    "text_bm25_topk",
    "index_inverted_build",
    "index_phrase_search",
    # r12: the salted fact-fact join under UNIFORM amplification (no
    # hot key ⇒ the census classifies nothing hot — this measures the
    # mitigation's standing overhead scaling, the skew win itself is
    # the skew10 bench pair) and the positional-index phrase serve
    # (build + term-filtered join; the scan-based twin is above)
    "join_salted_skew",
    "index_positional_phrase",
    # r12 (late): the sketch rollup — mapInPandas partials scale with
    # rows, the merge with (partitions × groups); the exponent should
    # read row-linear-at-most since the reduce side moves only KBs
    "dq_quantile_sketch",
    # r13: the outer-skew pair under UNIFORM amplification (~30% NULL
    # FK at every factor — the NULL branch is map-side, so the routed
    # form should scale like the scan; the naive twin carries the NULL
    # reducer) and the adaptive chooser (its decision jobs — metadata
    # count + census — should amortize toward row-linear)
    "join_null_skew_naive",
    "left_join_null_skew",
    "join_adaptive_skew",
)


def _ops() -> tuple[str, ...]:
    """PDP_SCALE_OPS narrows the op set (comma-separated names) so an
    expensive high-factor run can target one family."""
    raw = os.environ.get("PDP_SCALE_OPS")
    if not raw:
        return OPS
    chosen = tuple(x.strip() for x in raw.split(",") if x.strip())
    unknown = [x for x in chosen if x not in OPS]
    if unknown:
        raise SystemExit(f"PDP_SCALE_OPS not in probe set: {unknown}")
    return chosen


def one_factor_main() -> None:
    """Subprocess entry (PDP_SCALE_FACTOR set): write the amplified
    slice, time every op min-of-2 (one untimed warmup line first),
    print one JSON line {"factor": N, "times": {...}} last."""
    factor = int(os.environ["PDP_SCALE_FACTOR"])
    from promptly_data_pipelines_spark.extensions.scaling import write_scaled_sf
    from promptly_data_pipelines_spark.registry import (
        all_queries,
        local_only_queries,
    )
    from promptly_data_pipelines_spark.session import get_session

    spark = get_session(f"pdp-scale-{factor}", cpus=CPUS, shuffle_partitions=CPUS)
    queries = {**local_only_queries(), **all_queries()}
    dest = tempfile.mkdtemp(prefix=f"pdp_scale{factor}_")
    times: dict[str, float] = {}
    try:
        write_scaled_sf(spark, SF_DIR, dest, factor)
        # warmup: the cheapest op, untimed — classloading/codegen
        queries["agg_group"](spark, dest).write.format("noop").mode(
            "overwrite"
        ).save()
        for name in _ops():
            runs = []
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                queries[name](spark, dest).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
            times[name] = round(min(runs), 3)
    finally:
        shutil.rmtree(dest, ignore_errors=True)
        spark.stop()
    print(json.dumps({"factor": factor, "times": times}), flush=True)


def main() -> None:
    factors = [
        int(x)
        for x in os.environ.get("PDP_SCALE_FACTORS", "1,10").split(",")
    ]
    load = os.getloadavg()[0]
    if load >= 2.0:
        print(f"WARNING: loadavg {load:.2f} >= 2 — probe on a quiet machine",
              file=sys.stderr)
    results: dict[int, dict[str, float]] = {}
    for factor in factors:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, "PDP_SCALE_FACTOR": str(factor)},
            capture_output=True,
            text=True,
            timeout=3600,
        )
        if proc.returncode != 0:
            print(proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"factor {factor} subprocess failed")
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
        results[rec["factor"]] = rec["times"]
        print(f"# factor {factor}: {rec['times']}", file=sys.stderr)

    base_f = min(results)
    top_f = max(results)
    facts = sorted(results)
    rows = []
    for name in _ops():
        t1, tn = results[base_f].get(name), results[top_f].get(name)
        if not t1 or not tn:
            continue
        ratio = tn / t1
        expo = math.log(ratio) / math.log(top_f / base_f) if top_f != base_f else 0.0
        row = {
            "op": name,
            **{f"t{f}": results[f].get(name) for f in facts},
            "ratio": round(ratio, 2),
            "exponent": round(expo, 2),
        }
        # per-adjacent-decade exponents: the low pair is overhead-
        # dominated, so the HIGH pair is the scale signal that matters
        for lo, hi in zip(facts, facts[1:]):
            a, b = results[lo].get(name), results[hi].get(name)
            if a and b:
                row[f"exp_{lo}_{hi}"] = round(
                    math.log(b / a) / math.log(hi / lo), 2
                )
        rows.append(row)
    out = {
        "metric": "scaling_probe",
        "sf_dir": SF_DIR,
        "factors": sorted(results),
        "loadavg_start": round(load, 2),
        "rows": rows,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    if os.environ.get("PDP_SCALE_FACTOR"):
        one_factor_main()
    else:
        main()

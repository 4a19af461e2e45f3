"""Scaling-curve probe: time representative queries at sf0.001/0.01/0.1
and report the growth exponent alpha where time ~ data^alpha between the
two largest scales (the smallest is dominated by fixed scheduling cost).

alpha <= ~1 means the operator scales linearly-or-better in data volume —
the local[32] proxy for "the plan shape survives a 100x scale-up": a
super-linear alpha at these sizes means a shuffle or candidate explosion
that would only get worse at cluster scale.

Usage: python tools/scaling.py [out.json]
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
# one per operator family: LWW apply kernel, LSH dedup, fact-fact join,
# ANN, text scan, TPC-H agg/join, window, graph iteration
QUERIES = [
    "q_apply_upsert", "q_minhash_dedup", "q_contamination", "q_ann_srp",
    "q_quality", "q_pricing_summary",
    "q_rolling_7d", "q_dedup_cluster", "q_shard_manifest",
    # corpus-ops additions: substring-span index, bloom decontamination,
    # MG sketch, bigram-LM scoring, ensemble verify
    "q_dup_spans", "q_decontaminate", "q_heavy_hitters",
    "q_lm_surprisal", "q_ensemble_dedup",
    # round-3 additions: semantic dedup, triangle counts, k-NN transfer,
    # MAD outliers, streaming MG/HLL state services
    "q_semantic_dedup", "q_triangle_count", "q_knn_classify",
    "q_outlier_mad", "q_streaming_topk", "q_streaming_hll",
]


def main() -> int:
    from dbsync_spark import queries as Q
    from dbsync_spark.session import get_spark

    spark = get_spark("dbsync-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name in QUERIES:
        fn = Q.QUERIES[name]
        times = []
        for sf in SFS:
            fn(spark, sf).count()  # warm (file listing, code paths)
            t0 = time.monotonic()
            fn(spark, sf).count()
            times.append(round(time.monotonic() - t0, 3))
        # exponent between the two largest scales (10x data step)
        alpha = (math.log(max(times[2], 1e-3) / max(times[1], 1e-3))
                 / math.log(10))
        out[name] = {"sf0.001_s": times[0], "sf0.01_s": times[1],
                     "sf0.1_s": times[2], "alpha_01_to_1": round(alpha, 3)}
        print(f"{name:24s} {times[0]:7.3f} {times[1]:7.3f} {times[2]:7.3f} "
              f"alpha={alpha:+.3f}", flush=True)
    payload = {"sfs": SFS, "queries": out}
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(payload, f, indent=1)
    print(json.dumps({"worst_alpha": max(
        v["alpha_01_to_1"] for v in out.values())}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

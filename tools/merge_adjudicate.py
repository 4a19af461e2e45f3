"""Adjudicate the merge_200_into_8x_bucketed regression (VERDICT r5,
"What's wrong" #2): 2.09 s (r4) -> 3.13 s (r5), clean: false after one
re-measurement. This tool reproduces ONLY that cell — same setup as
bench.py's merge sweep — and measures N quiet-gated repeats so the call
between "code regression in sinks/table.py" and "scheduling-floor
variance" rests on a distribution, not two points.

Usage: python tools/merge_adjudicate.py [n_repeats]
Prints one JSON line with all repeat timings + spread stats.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    n_repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    from dbsync_spark.session import get_spark
    from dbsync_spark.sinks.table import BucketedTable

    spark = get_spark("merge-adjudicate")
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="merge_adj_")
    probes: list[float] = []

    def quiet_gate(max_waits: int = 4, threshold: float = 2.0) -> None:
        for _ in range(max_waits + 1):
            t0 = time.time()
            spark.range(3_000_000).selectExpr("sum(id * 3 % 7)").collect()
            spark.range(200_000).write.mode("overwrite").parquet(
                f"{workdir}/_probe")
            dt = time.time() - t0
            probes.append(round(dt, 3))
            if dt <= threshold:
                return
            print(f"# stall window (probe {dt:.1f}s) — waiting",
                  file=sys.stderr, flush=True)
            time.sleep(75)
        print("ADJUDICATION ABORTED: host stalled", file=sys.stderr)
        sys.exit(2)

    keys2 = ["l_orderkey", "l_linenumber"]
    li_df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    mult = 8
    scaled = li_df.withColumn(
        "l_orderkey", F.explode(F.array(
            *[F.col("l_orderkey") * mult + i for i in range(mult)])))
    key_id = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("long")
    big = scaled.select(key_id.alias("id"), F.lit("I").alias("operation"),
                        *scaled.columns).localCheckpoint()
    small200 = big.orderBy("id").limit(200).localCheckpoint()
    bt = BucketedTable(f"{workdir}/mt_buck8", keys2, n_buckets=256)
    quiet_gate()
    bt.merge_changes(spark, big, keys2, pinned=True)

    timings: list[float] = []
    for i in range(n_repeats):
        quiet_gate()
        t0 = time.time()
        bt.merge_changes(spark, small200, keys2)
        timings.append(round(time.time() - t0, 3))
        print(f"# repeat {i + 1}: {timings[-1]}s", file=sys.stderr, flush=True)

    srt = sorted(timings)
    result = {
        "cell": "merge_200_into_8x_bucketed",
        "n_repeats": n_repeats,
        "timings_s": timings,
        "min": srt[0],
        "median": srt[len(srt) // 2],
        "max": srt[-1],
        "spread_max_over_min": round(srt[-1] / srt[0], 3),
        "r4_value": 2.09,
        "r5_value": 3.13,
        "calibration_probe_s": probes,
        "sf_dir": SF_DIR,
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()

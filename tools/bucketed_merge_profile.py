"""Profile the bucketed-merge per-batch fixed floor (OPTIMIZATION_r10
"Not yet optimized" #1): replicate the bench's merge_20_into_32x_bucketed
cell and time each phase of BucketedTable.merge_changes separately —
batch pin, touched-bucket distinct+collect, the mergeSchema footer read
(paid at DataFrame creation), merge+staging write, and the rename swaps
— so the next optimization round starts from numbers, not a hypothesis.

Prints one JSON line per phase and a summary. Measurement only; no
product code is modified.

Usage: python tools/bucketed_merge_profile.py [sf_dir] [mult] [nrows]
       (defaults /root/testdata/sf0.1, 32, 20)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import functions as F

    from dbsync_spark.operators.apply import merge_snapshot
    from dbsync_spark.session import get_spark
    from dbsync_spark.sinks.table import BucketedTable

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    nrows = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    spark = get_spark("bucketed-merge-profile")
    spark.sparkContext.setLogLevel("ERROR")
    li_df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def _direct_changes(li):
        key_id = (F.col("l_orderkey") * 8
                  + F.col("l_linenumber")).cast("long")
        return li.select(key_id.alias("id"), F.lit("I").alias("operation"),
                         *li.columns)

    keys2 = ["l_orderkey", "l_linenumber"]
    scaled = li_df if mult == 1 else li_df.withColumn(
        "l_orderkey", F.explode(F.array(
            *[F.col("l_orderkey") * mult + i for i in range(mult)])))
    big = _direct_changes(scaled).localCheckpoint()
    small = big.orderBy("id").limit(nrows).localCheckpoint()
    workdir = tempfile.mkdtemp(prefix="bmerge_prof_")
    bt = BucketedTable(f"{workdir}/mt_buck{mult}", keys2, n_buckets=256)
    spark.sparkContext.setJobDescription("profile: seed target")
    bt.merge_changes(spark, big, keys2, pinned=True)

    phases: list[dict] = []

    def timed(tag, fn):
        t0 = time.monotonic()
        out = fn()
        dt = round(time.monotonic() - t0, 3)
        phases.append({"phase": tag, "secs": dt})
        print(json.dumps(phases[-1]), flush=True)
        return out

    # --- inlined merge_changes body, phase-timed (mirror of
    # sinks/table.py:BucketedTable.merge_changes at this HEAD) ---
    spark.sparkContext.setJobDescription("profile: phased merge")
    changes = small
    pin = timed("pin_batch", lambda: changes.localCheckpoint())
    bucketed = pin.withColumn(bt.BUCKET_COL, bt._bucket_expr())
    touched = timed("touched_distinct_collect", lambda: [
        r[0] for r in bucketed.select(bt.BUCKET_COL).distinct().collect()])
    bt._recover_buckets()
    paths = [os.path.join(bt.data_path, f"{bt.BUCKET_COL}={b}")
             for b in touched]
    paths = [p for p in paths if os.path.isdir(p)]
    existing = timed("mergeSchema_footer_read_df_creation", lambda: (
        spark.read.option("mergeSchema", "true").parquet(*paths)))
    nofooter = timed("plain_read_df_creation_for_comparison", lambda: (
        spark.read.parquet(*paths)))
    merged = merge_snapshot(existing, bucketed.drop(bt.BUCKET_COL), keys2)
    out = (merged.withColumn(bt.BUCKET_COL, bt._bucket_expr())
           .repartition(len(touched), F.col(bt.BUCKET_COL)))
    staging = bt.data_path + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    timed("merge_plus_staging_write", lambda: (
        out.write.mode("overwrite")
        .partitionBy(bt.BUCKET_COL).parquet(staging)))

    from dbsync_spark.sinks.layout import promote_dir

    def _swap():
        os.makedirs(bt.data_path, exist_ok=True)
        for b in touched:
            src = os.path.join(staging, f"{bt.BUCKET_COL}={b}")
            if os.path.isdir(src):
                promote_dir(src, os.path.join(
                    bt.data_path, f"{bt.BUCKET_COL}={b}"))
        shutil.rmtree(staging, ignore_errors=True)

    timed("bucket_dir_swaps", _swap)

    # reference: the unsplit call on a fresh identical batch
    small2 = big.orderBy(F.desc("id")).limit(nrows).localCheckpoint()
    timed("whole_merge_changes_reference", lambda: bt.merge_changes(
        spark, small2, keys2))

    total = round(sum(p["secs"] for p in phases[:-1]), 3)
    summary = {"sf_dir": sf_dir, "mult": mult, "nrows": nrows,
               "touched_buckets": len(touched),
               "phased_total": total, "phases": phases}
    with open("/root/repo/BUCKETED_MERGE_PROFILE.json", "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "phases"}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

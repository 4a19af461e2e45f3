"""Scale-trend soak: run the headline operators at 1x and Nx the sf0.1
fixture volume (disjoint key/id spaces) and print per-scale throughput.

    python tools/soak.py [N]      # default 8

The point is the TREND, not the absolute numbers: a plan whose throughput
RISES with volume (fixed overhead amortizing, cores saturating) is
evidence the shape survives scale-up; a plan whose wall-clock grows
super-linearly is shuffling or sorting something it shouldn't.
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


def replicate(df, times: int, id_col: str, offset: int):
    parts = [df.withColumn(id_col, F.col(id_col) + F.lit(i * offset))
             for i in range(times)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> int:
    from bench import build_bench_log
    from dbsync_spark.functions.dedup import minhash_near_dups, simhash
    from dbsync_spark.functions.text import contamination, segment_dedup
    from dbsync_spark.operators.apply import last_writer_wins, parse_changes
    from dbsync_spark.session import get_spark
    from dbsync_spark.sources.tables import read_table

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("dbsync-soak")
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="dbsync_soak_")
    li_schema = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").schema
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    cores = spark.sparkContext.defaultParallelism
    results = []

    li1 = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    max_okey = li1.agg(F.max("l_orderkey")).first()[0] + 1

    for scale in (1, n):
        # apply: Nx the change log with genuinely DISJOINT key spaces —
        # the lineitem frame itself is replicated with offset l_orderkey
        # BEFORE the log is built, so the LWW reduce sees Nx distinct keys
        # and writes an Nx-sized target (replicating only the log would
        # measure duplicate-key collapse with constant output instead)
        li = replicate(li1, scale, "l_orderkey", max_okey)
        log = build_bench_log(spark, SF_DIR, li=li)
        (log.repartition(cores * scale)
         .write.mode("overwrite").parquet(f"{workdir}/log{scale}"))
        stored = spark.read.parquet(f"{workdir}/log{scale}")
        rows = stored.count()
        t0 = time.time()
        changes = parse_changes(stored, li_schema)
        final = last_writer_wins(changes, ["l_orderkey", "l_linenumber"])
        final.write.mode("overwrite").parquet(f"{workdir}/target{scale}")
        apply_s = time.time() - t0

        corpus = replicate(docs, scale, "doc_id", 10_000_000)
        timings = {}
        for name, fn in (
                ("minhash", lambda c: minhash_near_dups(c, threshold=0.5)),
                ("simhash", simhash),
                ("segment_dedup", segment_dedup),
                ("contamination",
                 lambda c: contamination(c.withColumn(
                     "source", (F.col("doc_id") % 20).cast("string")),
                     F.col("source") == "19")),
        ):
            t0 = time.time()
            fn(corpus).count()
            timings[name] = round(time.time() - t0, 2)

        # semantic dedup scales on the embeddings corpus (bucket + rep
        # join must stay linear — the whole point of rep-pruning)
        from dbsync_spark.functions.dedup import semantic_dedup

        emb = read_table(spark, SF_DIR, "embeddings").select(
            "vec_id", "embedding")
        ecorpus = replicate(emb, scale, "vec_id", 10_000_000)
        t0 = time.time()
        semantic_dedup(ecorpus, dim=64, n_planes=12).count()
        timings["semantic_dedup"] = round(time.time() - t0, 2)

        results.append({
            "scale": scale, "log_rows": rows,
            "apply_sec": round(apply_s, 2),
            "apply_rows_per_sec": round(rows / apply_s),
            "doc_ops_sec": timings,
        })
        print(json.dumps(results[-1]))

    r1, rn = results
    print(json.dumps({
        "metric": "soak_throughput_ratio",
        "scale_factor": n,
        "apply_throughput_ratio": round(
            rn["apply_rows_per_sec"] / r1["apply_rows_per_sec"], 2),
        "wall_ratio_doc_ops": {
            k: round(rn["doc_ops_sec"][k] / max(r1["doc_ops_sec"][k], 1e-9), 2)
            for k in r1["doc_ops_sec"]},
    }))

    # -- trickle MERGE vs target size (the BucketedTable scale property) ----
    # a fixed 200-row batch merged into a 1x and an Nx target, both
    # layouts: the snapshot layout's per-batch cost must track target
    # size (O(|target|) rewrite); the bucketed layout's must stay flat
    # (touched-buckets bound). This is where the bucketed default EARNS
    # its local fixed floor.
    from dbsync_spark.sinks.table import BucketedTable, ParquetTable

    keys = ["l_orderkey", "l_linenumber"]
    trickle = {}
    for scale in (1, n):
        stored = spark.read.parquet(f"{workdir}/log{scale}")
        big = parse_changes(stored, li_schema).localCheckpoint()
        small = big.orderBy("id").limit(200).localCheckpoint()
        pt = ParquetTable(f"{workdir}/tr_snap{scale}")
        bt = BucketedTable(f"{workdir}/tr_buck{scale}", keys, n_buckets=256)
        pt.merge_changes(spark, big, keys)
        bt.merge_changes(spark, big, keys)
        for label, tbl in (("snapshot", pt), ("bucketed", bt)):
            best = None
            for _ in range(2):  # idempotent replay: timing-only rerun
                t0 = time.time()
                tbl.merge_changes(spark, small, keys)
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            trickle[f"{label}_{scale}x"] = round(best, 2)
    print(json.dumps({
        "metric": "trickle_merge_sec", **trickle,
        "snapshot_growth": round(
            trickle[f"snapshot_{n}x"] / max(trickle["snapshot_1x"], 1e-9), 2),
        "bucketed_growth": round(
            trickle[f"bucketed_{n}x"] / max(trickle["bucketed_1x"], 1e-9), 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

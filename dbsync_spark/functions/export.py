"""Training-data export: deterministic sharded dataset writer.

The last stage of a curation pipeline (filter -> dedup -> sample -> pack)
is materializing the corpus as a FIXED set of shards that a training job
can map to data-loader workers: shard count is part of the dataset
contract, assignment must be reproducible run-to-run (resumable exports,
diffable re-builds), and each shard should land as few large files, not
many small ones.

Spark shape: shard = h15(key) % n_shards — the same engine-portable
md5-derived hash the sampling operators use (functions/text.h15), so the
assignment is oracle-checkable in DuckDB and independent of Spark's
internal hashPartitioning. One repartition on the shard column moves each
shard to exactly one task (n_shards output files), and the
within-partition sort gives stable row order inside a shard. At 100 TB
n_shards is sized so one shard ≈ a few GB (e.g. 32k shards); assignment
cost is a single hash-exchange of the already-curated corpus — no driver
state, no RNG.

Reference scope: the reference engine stops at the JDBC/status sinks; the
shard writer is part of the extended training-pipeline surface (same
family as functions/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbsync_spark.functions.text import h15


def shard_assign(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """Add a deterministic `shard` column in [0, n_shards). Engine-
    portable (md5-derived), uniform, and stable under re-runs and corpus
    growth: a row's shard never depends on what other rows exist."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    return df.withColumn(
        "shard", (h15(F.col(key_col).cast("string")) % n_shards).cast("int"))


def export_shards(df: DataFrame, path: str, key_col: str, n_shards: int,
                  order_col: str | None = None) -> None:
    """Write `df` as `path/shard=K/` parquet, one file per shard, rows
    sorted by `order_col` (default: the shard key) within each shard.

    repartition(n_shards, shard) puts each shard in exactly one task —
    one output file per shard directory, the layout a data loader
    expects. Skew note: shards are hash-uniform over keys, so file sizes
    are balanced whenever keys are; documents with wildly varying sizes
    still balance in expectation across many rows per shard."""
    assigned = shard_assign(df, key_col, n_shards)
    (assigned
     .repartition(n_shards, F.col("shard"))
     .sortWithinPartitions("shard", order_col or key_col)
     .write.mode("overwrite").partitionBy("shard").parquet(path))


def update_shards(spark, path: str, new_df: DataFrame, key_col: str,
                  n_shards: int, order_col: str | None = None) -> list[int]:
    """Incremental corpus refresh: upsert `new_df` into an existing
    export_shards layout, rewriting ONLY the shard directories the new
    keys hash into. Same-key rows are replaced by the new version; other
    shards are never opened — per-refresh cost is O(|new| + |touched
    shards|), independent of corpus size (the export-side analogue of
    BucketedTable.merge_changes, sinks/table.py).

    Crash-safe via the same per-directory rename-aside swap: a touched
    shard is always present as either its live dir or its `.old` aside;
    re-running the refresh converges (upsert is idempotent). Returns the
    touched shard ids."""
    import os
    import shutil

    assigned = shard_assign(new_df, key_col, n_shards).localCheckpoint()
    touched = sorted(r[0] for r in
                     assigned.select("shard").distinct().collect())
    if not touched:
        return []
    order = order_col or key_col
    try:
        existing = (spark.read.parquet(path)
                    .where(F.col("shard").isin(touched))
                    # new version wins on key collision
                    .join(assigned.select(key_col), on=key_col,
                          how="left_anti"))
        merged = existing.unionByName(assigned)
    except Exception as e:  # noqa: BLE001 - first refresh of an empty dir
        from pyspark.errors import AnalysisException

        if not (isinstance(e, AnalysisException) and e.getCondition() in
                ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")):
            raise
        merged = assigned
    staging = path.rstrip("/") + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    (merged.repartition(len(touched), F.col("shard"))
     .sortWithinPartitions("shard", order)
     .write.mode("overwrite").partitionBy("shard").parquet(staging))
    os.makedirs(path, exist_ok=True)
    for s in touched:
        src = os.path.join(staging, f"shard={s}")
        dst = os.path.join(path, f"shard={s}")
        if not os.path.isdir(src):
            continue
        old = dst + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(dst):
            os.replace(dst, old)
        os.replace(src, dst)
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    return touched


def recover_shards(path: str) -> None:
    """Close update_shards' crash window: restore any `shard=K.old`
    whose live dir is missing; drop asides whose swap completed."""
    import os
    import shutil

    if not os.path.isdir(path):
        return
    for entry in os.listdir(path):
        if not entry.endswith(".old"):
            continue
        old = os.path.join(path, entry)
        live = os.path.join(path, entry[:-len(".old")])
        if os.path.isdir(live):
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.replace(old, live)


def shard_manifest(df: DataFrame, key_col: str, n_shards: int,
                   size_col: str | None = None) -> DataFrame:
    """Per-shard manifest (the dataset card a training job validates
    against): row count, key range, and total payload size per shard.
    One hash-exchange groupBy; output is n_shards rows."""
    assigned = shard_assign(df, key_col, n_shards)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.min(key_col).alias("min_key"),
        F.max(key_col).alias("max_key"),
    ]
    if size_col is not None:
        aggs.append(F.sum(F.col(size_col).cast("long")).alias("total_size"))
    return assigned.groupBy("shard").agg(*aggs)

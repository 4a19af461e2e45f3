"""Physical layout helpers: bucketing and date partitioning.

At 100 TB the two cheapest optimizations are paid at WRITE time:
- `write_bucketed` / co-located joins: two tables bucketed by the same key
  into the same bucket count join with NO shuffle on either side (the
  exchange disappears from the plan — asserted in tests).
- `write_date_partitioned`: the change log partitioned by createTime date
  turns the retention cutoff (O8) and time-windowed scans into partition
  PRUNING — the sweep reads only expired partitions instead of the full
  log (PartitionFilters in the scan, asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table_name: str, bucket_cols: list[str],
                   num_buckets: int = 32, sort_cols: list[str] | None = None) -> None:
    """Persist as a Spark-native bucketed table (hash(bucket_cols) %
    num_buckets per file); sorted buckets additionally enable shuffle-free
    sort-merge joins."""
    writer = (df.write.mode("overwrite")
              .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def write_date_partitioned(log: DataFrame, path: str,
                           ts_col: str = "createTime") -> None:
    """Change log partitioned by event date: retention and windowed reads
    prune whole directories."""
    (log.withColumn("_date", F.to_date(F.col(ts_col)))
     .write.mode("overwrite").partitionBy("_date").parquet(path))


def read_date_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("_date")


def write_range_clustered(df: DataFrame, path: str, order_col: str,
                          num_files: int = 8) -> None:
    """Range-cluster by `order_col` at write time: repartitionByRange
    gives each output file a DISJOINT value range, and the within-file
    sort tightens parquet row-group min/max stats. A later filter on
    `order_col` then skips whole files/row-groups at the scan (time-travel
    reads, as-of scans, incremental consumers) — the poor man's Z-order,
    costing one range exchange at write."""
    # INT96 timestamps carry no parquet stats; force the stats-bearing
    # micros encoding regardless of the ambient session's conf
    df.sparkSession.conf.set("spark.sql.parquet.outputTimestampType",
                             "TIMESTAMP_MICROS")
    (df.repartitionByRange(num_files, F.col(order_col))
     .sortWithinPartitions(order_col)
     .write.mode("overwrite").parquet(path))


def promote_dir(src: str, dst: str) -> None:
    """Install directory `src` at `dst` with the rename-aside protocol
    shared by every directory-swap in the engine (bucketed MERGE, shard
    refresh, compaction): the live dir is renamed to `dst + '.old'` (an
    atomic rename, never an rmtree of the only copy), `src` renamed in,
    and the aside dropped LAST. A kill at any point leaves the data as
    either the live dir or its `.old` aside — `restore_asides` closes
    the window on the next open."""
    import os
    import shutil

    old = dst + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(dst):
        os.replace(dst, old)
    os.replace(src, dst)
    shutil.rmtree(old, ignore_errors=True)


def restore_asides(parent: str, suffix: str = ".old") -> None:
    """Crash recovery for promote_dir swaps UNDER `parent`: any
    `<dir>.old` whose live dir is missing IS the data (restore it);
    where the live dir exists the swap completed and the aside is
    garbage (drop it). Run before reading a directory whose children
    are swapped with promote_dir."""
    import os
    import shutil

    if not os.path.isdir(parent):
        return
    for entry in os.listdir(parent):
        if not entry.endswith(suffix):
            continue
        old = os.path.join(parent, entry)
        if not os.path.isdir(old):
            continue
        live = os.path.join(parent, entry[:-len(suffix)])
        if os.path.isdir(live):
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.replace(old, live)


def recover_compaction(path: str) -> None:
    """Close compact()'s crash windows before a dir is opened: if `path`
    is missing, restore the `.old` rename-aside (the `.compacting` copy
    may be half-written, so the ASIDE — complete by construction — wins);
    if `path` exists, stale siblings are garbage from a finished or
    abandoned compaction and are dropped."""
    import os
    import shutil

    path = path.rstrip("/")
    tmp, aside = path + ".compacting", path + ".old"
    if not os.path.isdir(path):
        if os.path.isdir(aside):
            os.replace(aside, path)
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(aside, ignore_errors=True)


def compact(spark: SparkSession, path: str, target_files: int = 4,
            schema=None) -> int:
    """OPTIMIZE/VACUUM equivalent for append-only parquet dirs (the
    reference runs VACUUM ANALYZE / OPTIMIZE TABLE after its retention
    sweep, PgOperation.scala:378-385): rewrite the accumulated small files
    into `target_files` and swap. Returns the new file count.

    Crash-safe via rename-aside (never rmtree the only copy): the live
    dir is renamed to `.old` only after the compacted copy is fully
    written, then the copy is renamed in and `.old` dropped last. A kill
    at any point leaves the data recoverable by `recover_compaction`
    (either the live dir exists, or `.old` holds the pre-compaction
    original). Callers that share the dir with concurrent APPENDERS must
    serialize with them (e.g. the ack_lock in SyncApp) — an append
    landing between the read and the swap would be dropped by the swap."""
    import glob
    import os
    import shutil

    recover_compaction(path)
    reader = spark.read.schema(schema) if schema else spark.read
    df = reader.parquet(path)
    tmp = path.rstrip("/") + ".compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    promote_dir(tmp, path.rstrip("/"))
    return len(glob.glob(os.path.join(path, "*.parquet")))


def zorder_key(cols: list, bits: int = 16) -> "F.Column":
    """Interleave the low `bits` bits of pre-normalized integer columns
    into one Z-order (Morton) key. Callers normalize each column to
    [0, 2^bits) first (see write_zorder_clustered); pure bitwise
    expressions, fully codegen'd, no UDF."""
    n = len(cols)
    terms = []
    for i, c in enumerate(cols):
        for b in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)),
                            b * n + i))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def write_zorder_clustered(df: DataFrame, path: str, cols: list[str],
                           bits: int = 8, num_files: int = 8) -> None:
    """Multi-column clustering at write time (the open-source answer to
    Delta OPTIMIZE ZORDER BY): min/max-normalize each clustering column
    to `bits` bits via one broadcast 1-row bounds aggregate, interleave
    into a Morton key, then range-partition + sort by it. Each output
    file covers a compact hyper-rectangle of the key space, so parquet
    row-group min/max stats prune scans filtered on ANY clustered column
    — single-column range clustering only serves its one column.
    Cost: one bounds pass + one range exchange, both linear."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    bounds = df.agg(*[f(F.col(c)).alias(f"_{nm}_{c}")
                      for c in cols
                      for nm, f in (("min", F.min), ("max", F.max))])
    withb = df.crossJoin(F.broadcast(bounds))
    scale = (1 << bits) - 1
    normed = [
        F.least(F.lit(scale), F.floor(
            (F.col(c) - F.col(f"_min_{c}")).cast("double")
            / (F.col(f"_max_{c}") - F.col(f"_min_{c}") + 1) * (scale + 1))
        ).cast("long")
        for c in cols
    ]
    keyed = withb.withColumn("_z", zorder_key(normed, bits))
    (keyed.repartitionByRange(num_files, F.col("_z"))
     .sortWithinPartitions("_z")
     .drop("_z", *[f"_{nm}_{c}" for c in cols for nm in ("min", "max")])
     .write.mode("overwrite").parquet(path))

"""Retention cleanup (O8) — TTL sweep over the change log.

Reference: every cleanInterval, delete sync_data rows whose status is OK
and older than dataKeepHours, then VACUUM/OPTIMIZE
(job/CleanWorker.scala:27-53, dbopt/PgOperation.scala:369-387).

Spark-first: the sweep is an anti-filter written back to the log table
(on Delta this is a partition-pruned DELETE + OPTIMIZE; on parquet an
overwrite of affected partitions). Partitioning the log by date makes the
cutoff predicate a partition-pruning filter — at 100 TB the sweep reads
only expired partitions, not the full log.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expired(log: DataFrame, status: DataFrame, cutoff: Column,
            id_col: str = "id") -> DataFrame:
    """Rows eligible for deletion: status OK and createTime < cutoff."""
    ok = status.where(F.col("status") == "OK").select(F.col("dataId").alias(id_col))
    return log.join(ok, on=id_col, how="left_semi").where(F.col("createTime") < cutoff)


def sweep(log: DataFrame, status: DataFrame, cutoff: Column,
          id_col: str = "id") -> DataFrame:
    """The log after the retention sweep (complement of `expired`).
    Single left join — not one scan per status class."""
    ok = (status.where(F.col("status") == "OK")
          .select(F.col("dataId").alias(id_col), F.lit(True).alias("_ok")))
    joined = log.join(ok, on=id_col, how="left")
    return joined.where(
        ~(F.coalesce(F.col("_ok"), F.lit(False)) & (F.col("createTime") < cutoff))
    ).drop("_ok")

"""Status accounting (S10/A1/J2) — ack sink and sync-state aggregation.

The reference upserts (dataId, status, message) into sync_data_status,
incrementing `retry` on conflict (dbopt/PgOperation.scala:98-107), and its
monitor runs FIVE separate count queries per database per tick
(PgOperation.scala:509-547): pending (no status row), BLK, ERR, OK, others.

Spark-first improvements:
- `ack` is a MERGE-style reduce (one shuffle, idempotent under replay).
- `status_counts` computes all five classes in ONE pass: left join +
  coalesce(status,'PENDING') + groupBy().count() — map-side partial
  aggregation, no five scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbsync_spark.schemas import STATUS_PENDING


def ack(existing: DataFrame | None, acks: DataFrame) -> DataFrame:
    """Upsert acks into the status table; retry increments on re-ack of the
    same dataId (reference ON CONFLICT .. retry=retry+1)."""
    if existing is None:
        return acks
    merged = (
        existing.select("dataId", "status", "message", "retry", "createTime")
        .unionByName(acks.select("dataId", "status", "message", F.lit(0).alias("retry"), "createTime"))
        .groupBy("dataId")
        .agg(
            F.max_by(F.struct("status", "message", "createTime"), F.col("createTime")).alias("_w"),
            (F.count("*") - 1).cast("int").alias("retry"),
        )
    )
    return merged.select(
        "dataId", "_w.status", "_w.message", "retry", "_w.createTime")


def current_status(acks: DataFrame) -> DataFrame:
    """Latest status per dataId from an append-only ack log (newest
    createTime wins, retry count as tiebreak)."""
    return (
        acks.groupBy("dataId")
        .agg(F.max_by(F.struct("status", "message", "retry", "createTime"),
                      F.struct("createTime", "retry")).alias("_w"))
        .select("dataId", "_w.status", "_w.message", "_w.retry", "_w.createTime")
    )


def status_counts(log: DataFrame, status: DataFrame,
                  id_col: str = "id", status_id_col: str = "dataId") -> DataFrame:
    """Pending/OK/ERR/BLK counts in one pass over the log."""
    joined = log.select(F.col(id_col)).join(
        status.select(F.col(status_id_col).alias(id_col), "status"),
        on=id_col, how="left",
    )
    return (
        joined.groupBy(F.coalesce(F.col("status"), F.lit(STATUS_PENDING)).alias("status"))
        .agg(F.count("*").alias("cnt"))
    )


def derive_status_fixture(log: DataFrame) -> DataFrame:
    """Deterministic status table for the declared queries: ids with
    id%7==0 have no status row (pending); otherwise id%10==8 -> ERR,
    id%10==9 -> BLK, else OK. retry = id%3."""
    return (
        log.where(F.col("id") % 7 != 0)
        .select(
            F.col("id").alias("dataId"),
            F.when(F.col("id") % 10 == 8, "ERR")
            .when(F.col("id") % 10 == 9, "BLK")
            .otherwise("OK")
            .alias("status"),
            F.lit("").alias("message"),
            (F.col("id") % 3).cast("int").alias("retry"),
            F.col("createTime"),
        )
    )

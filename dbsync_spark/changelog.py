"""Deterministic synthetic change-log builders (fixture construction).

Implements FIXTURES.md §C: derives CDC streams in the reference's
`sync_data` shape (dbopt/PgOperation.scala:285-301) as a pure function of
the driver fixtures, so the DuckDB oracle can rebuild the identical log
with SQL CTEs (see dbsync_spark/oracles.py).

- log_orders: I per orders row (id = rank by o_orderkey); U (totalprice*1.1)
  for o_orderkey%5==0 at id N+rank; D for o_orderkey%17==0 at id 2N+rank.
- log_events: pure inserts keyed (event_id); targetDb fan-out "t1,t2" on
  event_type='purchase' rows.

NOTE (scale): `row_number() OVER (ORDER BY key)` is a global sort — fine for
fixture construction, never used in the engine hot path. A real change log
arrives with ids already assigned (the reference's sequence-backed bigint PK,
PgOperation.scala:288-292).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from dbsync_spark.sources.tables import read_table

ORDER_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]
EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]

ORDERS_PAYLOAD_SCHEMA = T.StructType([
    T.StructField("o_orderkey", T.LongType()),
    T.StructField("o_custkey", T.LongType()),
    T.StructField("o_orderstatus", T.StringType()),
    T.StructField("o_totalprice", T.DoubleType()),
    T.StructField("o_orderdate", T.TimestampType()),
    T.StructField("o_orderpriority", T.StringType()),
])

EVENTS_PAYLOAD_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def _sync_shape(df: DataFrame, table: str, payload_cols: list[str], create_time_col: str,
                target_db=None) -> DataFrame:
    """Project a typed leg into the sync_data shape with a JSON row image."""
    if target_db is None:
        target_db = F.lit("t1")
    return df.select(
        F.col("id").cast("long").alias("id"),
        F.lit("db1").alias("sourceDb"),
        target_db.alias("targetDb"),
        F.lit("public").alias("schema"),
        F.lit(table).alias("table"),
        F.col("operation"),
        F.to_json(F.struct(*payload_cols)).alias("data"),
        F.col(create_time_col).alias("createTime"),
    )


def build_log_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change log over `orders` exercising I/U/D last-writer-wins semantics."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    w = Window.orderBy("o_orderkey")

    ins = orders.select(
        F.row_number().over(w).cast("long").alias("id"),
        F.lit("I").alias("operation"),
        *ORDER_COLS,
    )
    upd = (
        orders.where(F.col("o_orderkey") % 5 == 0)
        .select(
            (F.lit(n).cast("long") + F.row_number().over(w)).alias("id"),
            F.lit("U").alias("operation"),
            F.col("o_orderkey"),
            F.col("o_custkey"),
            F.col("o_orderstatus"),
            (F.col("o_totalprice") * F.lit(1.1).cast("double")).alias("o_totalprice"),
            F.col("o_orderdate"),
            F.col("o_orderpriority"),
        )
    )
    dele = orders.where(F.col("o_orderkey") % 17 == 0).select(
        (F.lit(2 * n).cast("long") + F.row_number().over(w)).alias("id"),
        F.lit("D").alias("operation"),
        *ORDER_COLS,
    )
    legs = [
        _sync_shape(leg, "orders", ORDER_COLS, "o_orderdate")
        for leg in (ins, upd, dele)
    ]
    return legs[0].unionByName(legs[1]).unionByName(legs[2])


def build_log_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change log over `events`: pure inserts, multi-target fan-out on purchases."""
    events = read_table(spark, sf_dir, "events")
    w = Window.orderBy("event_id")
    ins = events.select(
        F.row_number().over(w).cast("long").alias("id"),
        F.lit("I").alias("operation"),
        *EVENT_COLS,
    )
    target = F.when(F.col("event_type") == "purchase", F.lit("t1,t2")).otherwise(F.lit("t1"))
    return _sync_shape(ins, "events", EVENT_COLS, "ts", target_db=target)

"""Declared query surface (SURVEY.md §2.9) — one function per operator.

Each function takes (spark, sf_dir) and returns a DataFrame whose values
hash-match the DuckDB oracle in ORACLES (same column names, driver sorts
columns by name and compares order-insensitively).

Registration: add to QUERIES (and ORACLES when SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsync_spark import oracles
from dbsync_spark.changelog import (
    ORDERS_PAYLOAD_SCHEMA,
    build_log_orders,
)
from dbsync_spark.operators.apply import last_writer_wins, parse_changes

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


@_register("q_apply_upsert", oracles.LWW_ORDERS_SQL)
def q_apply_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6-S8/O1-O3: final target state after applying the orders change log
    in id order — last-writer-wins per key, deletes remove.

    Reference semantic: ordered per-key upsert apply
    (doc/architecture.cn.md:14-27, dbopt/PgOperation.scala:47-79)."""
    log = build_log_orders(spark, sf_dir)
    changes = parse_changes(log, ORDERS_PAYLOAD_SCHEMA)
    return last_writer_wins(changes, ["o_orderkey"])


@_register(
    "q_apply_delete",
    f"""
WITH {oracles.LOG_ORDERS_CTE},
_last AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY id DESC) AS _rn
  FROM log_orders WHERE operation <> 'U'
)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM _last WHERE _rn = 1 AND operation <> 'D'
""",
)
def q_apply_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: deletes remove exactly the rows whose key matches (key columns
    only — reference builds DELETE .. WHERE key=?, PgOperation.scala:81-96).
    Applies the I+D legs of the log (no updates)."""
    log = build_log_orders(spark, sf_dir).where(F.col("operation") != "U")
    changes = parse_changes(log, ORDERS_PAYLOAD_SCHEMA)
    return last_writer_wins(changes, ["o_orderkey"])

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
    EVENTS_PAYLOAD_SCHEMA,
    ORDERS_PAYLOAD_SCHEMA,
    build_log_events,
    build_log_orders,
)
from dbsync_spark.operators import retention, status
from dbsync_spark.operators.apply import last_writer_wins, parse_changes
from dbsync_spark.operators.partition import assign_partitions, key_string
from dbsync_spark.operators.poll import poll_batch
from dbsync_spark.operators.route import SyncRule, apply_conditions, fanout_targets, route, rules_df
from dbsync_spark.operators.window_agg import hourly_counts
from dbsync_spark.sources.tables import read_table

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


@_register(
    "q_poll_antijoin",
    f"""
WITH {oracles.LOG_ORDERS_CTE},
polled AS (SELECT id AS dataId FROM log_orders WHERE id % 3 = 0)
SELECT l.id, l.operation, l.o_orderkey
FROM log_orders l LEFT JOIN polled p ON l.id = p.dataId
WHERE p.dataId IS NULL ORDER BY l.id LIMIT 100
""",
)
def q_poll_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/J1: next-batch selection = LEFT ANTI join + ORDER BY id + LIMIT
    (reference poll query, dbopt/PgOperation.scala:27-45). Polled set is the
    deterministic fixture {id % 3 == 0}."""
    log = build_log_orders(spark, sf_dir)
    polled = log.where(F.col("id") % 3 == 0).select(F.col("id").alias("dataId"))
    batch = poll_batch(log, polled, 100)
    typed = parse_changes(batch, ORDERS_PAYLOAD_SCHEMA)
    return typed.select("id", "operation", "o_orderkey")


@_register("q_partition")  # rows-only for the driver; strong parity check in tests
def q_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: per-partition row counts under murmur3(schema:table:key) % 32
    (reference: DataPoller.scala:92-96). The hash is engine-specific, so the
    oracle is a pure-Python reimplementation of Spark's Murmur3_x86_32
    (tests/test_partition.py), not DuckDB."""
    log = build_log_orders(spark, sf_dir).withColumn(
        "o_orderkey", F.get_json_object("data", "$.o_orderkey"))
    assigned = assign_partitions(log, 32, key_cols=("o_orderkey",))
    return assigned.groupBy("partition").agg(F.count("*").alias("cnt"))


@_register(
    "q_cond_filter",
    f"""
WITH {oracles.LOG_EVENTS_CTE}
SELECT id, event_id, value FROM log_events
WHERE operation = 'I' AND value > 0
""",
)
def q_cond_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: per-op condition filter (insertCondition = 'value > 0') applied
    to the decoded row image (config/ConfigParser.scala:50-52)."""
    log = build_log_events(spark, sf_dir)
    changes = parse_changes(log, EVENTS_PAYLOAD_SCHEMA)
    rule = SyncRule("db1", "public", "events", ("event_id",),
                    insert_condition="value > 0")
    return apply_conditions(changes, rule).select("id", "event_id", "value")


@_register(
    "q_fanout",
    f"""
WITH {oracles.LOG_EVENTS_CTE}
SELECT u.t AS targetDb, count(*) AS cnt
FROM log_events, unnest(string_split(targetDb, ',')) AS u(t)
GROUP BY u.t
""",
)
def q_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11: multi-target fan-out — one row per comma-separated target
    (trigger loop, dbopt/PgOperation.scala:125-128)."""
    log = build_log_events(spark, sf_dir)
    return fanout_targets(log).groupBy("targetDb").agg(F.count("*").alias("cnt"))


@_register(
    "q_route",
    f"""
WITH {oracles.LOG_ORDERS_CTE}
SELECT 'tgt' AS targetSchema, 'orders_t' AS targetTable, count(*) AS cnt
FROM log_orders
""",
)
def q_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: table routing/rename; tables without a sync rule are dropped
    (sync/DataPoller.scala:80-90). Rules cover orders only, so the events
    log drops out entirely."""
    log = build_log_orders(spark, sf_dir).unionByName(build_log_events(spark, sf_dir))
    rules = rules_df(spark, [
        SyncRule("db1", "public", "orders", ("o_orderkey",),
                 target_schema="tgt", target_table="orders_t"),
    ])
    routed = route(log, rules)
    return routed.groupBy("targetSchema", "targetTable").agg(F.count("*").alias("cnt"))


STATUS_FIXTURE_CTE = """
status_fx AS (
  SELECT id AS dataId,
         CASE WHEN id % 10 = 8 THEN 'ERR'
              WHEN id % 10 = 9 THEN 'BLK'
              ELSE 'OK' END AS status
  FROM log_orders WHERE id % 7 <> 0
)
"""


@_register(
    "q_status_agg",
    f"""
WITH {oracles.LOG_ORDERS_CTE},
{STATUS_FIXTURE_CTE}
SELECT coalesce(s.status, 'PENDING') AS status, count(*) AS cnt
FROM log_orders l LEFT JOIN status_fx s ON l.id = s.dataId
GROUP BY 1
""",
)
def q_status_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/J2: pending/OK/ERR/BLK counts in ONE pass (the reference issues
    five separate count queries, dbopt/PgOperation.scala:509-547)."""
    log = build_log_orders(spark, sf_dir)
    st = status.derive_status_fixture(log)
    return status.status_counts(log, st)


@_register(
    "q_retention",
    f"""
WITH {oracles.LOG_ORDERS_CTE},
{STATUS_FIXTURE_CTE}
SELECT l.id, l.operation, l.o_orderdate AS createTime
FROM log_orders l LEFT JOIN status_fx s ON l.id = s.dataId
WHERE NOT (coalesce(s.status = 'OK', FALSE) AND l.o_orderdate < TIMESTAMP '1998-01-01')
""",
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8: retention sweep — drop rows acked OK with createTime older than
    the cutoff (job/CleanWorker.scala:27-53, PgOperation.scala:369-387)."""
    log = build_log_orders(spark, sf_dir)
    st = status.derive_status_fixture(log)
    kept = retention.sweep(log, st, F.lit("1998-01-01").cast("timestamp"))
    return kept.select("id", "operation", "createTime")


@_register(
    "q_window_count",
    """
SELECT date_trunc('hour', ts) AS bucket_start, count(*) AS cnt
FROM events GROUP BY 1
""",
)
def q_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: hourly tumbling-window throughput counts over events.ts
    (sync/ComponentManager.scala:68-106)."""
    events = read_table(spark, sf_dir, "events")
    return hourly_counts(events, "ts")


@_register("q_retry_replay", oracles.LWW_ORDERS_SQL)
def q_retry_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4-O6: inject failures (keys with o_orderkey%13==0 fail twice before
    succeeding), drive the ERR/BLK/retry state machine to convergence, and
    verify the final applied state is identical to the failure-free run —
    the reference's idempotent-convergence guarantee
    (doc/architecture.cn.md:21-27, sync/ErrorResolver.scala:43-78)."""
    from dbsync_spark.operators.retry import apply_with_retry, converged_apply

    log = build_log_orders(spark, sf_dir)
    changes = parse_changes(log, ORDERS_PAYLOAD_SCHEMA)
    fail_until = F.when(F.col("o_orderkey") % 13 == 0, 2).otherwise(0)
    state, _passes = apply_with_retry(
        changes, key=F.col("o_orderkey").cast("string"), fail_until=fail_until)
    applied = converged_apply(changes, state)
    return last_writer_wins(applied, ["o_orderkey"])

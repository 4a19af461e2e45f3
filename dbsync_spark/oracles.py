"""DuckDB oracle SQL fragments shared by the declared correctness queries.

Each CTE reconstructs, in ANSI SQL over the pre-registered fixture views
(orders, events, ...), exactly the change log that
dbsync_spark.changelog builds in Spark. Declared queries compose these
CTEs so the driver can hash-compare Spark vs DuckDB results.
"""

# Typed reconstruction of build_log_orders (same ids, same updated values).
LOG_ORDERS_CTE = """
_n AS (SELECT count(*) AS n FROM orders),
_ins AS (
  SELECT row_number() OVER (ORDER BY o_orderkey) AS id, 'I' AS operation,
         o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM orders
),
_upd AS (
  SELECT (SELECT n FROM _n) + row_number() OVER (ORDER BY o_orderkey) AS id, 'U' AS operation,
         o_orderkey, o_custkey, o_orderstatus,
         o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 5 = 0
),
_del AS (
  SELECT 2 * (SELECT n FROM _n) + row_number() OVER (ORDER BY o_orderkey) AS id, 'D' AS operation,
         o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 17 = 0
),
log_orders AS (
  SELECT * FROM _ins UNION ALL SELECT * FROM _upd UNION ALL SELECT * FROM _del
)
"""

# Typed reconstruction of build_log_events.
LOG_EVENTS_CTE = """
log_events AS (
  SELECT row_number() OVER (ORDER BY event_id) AS id, 'I' AS operation,
         CASE WHEN event_type = 'purchase' THEN 't1,t2' ELSE 't1' END AS targetDb,
         event_id, ts, user_id, event_type, value, props
  FROM events
)
"""

# Last-writer-wins final state: max-id event per key wins; D removes the row.
# This is THE core reference semantic (ordered upsert apply,
# doc/architecture.cn.md:14-27).
LWW_ORDERS_SQL = f"""
WITH {LOG_ORDERS_CTE},
_last AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY id DESC) AS _rn
  FROM log_orders
)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM _last WHERE _rn = 1 AND operation <> 'D'
"""

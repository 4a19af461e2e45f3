"""Runnable end-to-end demo: bootstrap the engine from YAML, feed it a
change log built from the driver fixtures, drain, and inspect state.

    python examples/run_demo.py [sf_dir]     # default /root/testdata/sf0.001

What it shows (the reference quickstart, doc/quickstart.cn.md:44-72,
re-expressed on Spark): config -> pipelines, an I/U/D change log applied
as last-writer-wins MERGE, OK acks in the status table, monitor rule
evaluation, a retention sweep, and the HTTP status endpoint payloads.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEMO_YAML = """
sys: {maxPollWait: 5000, dataKeepHours: 24, partition: 8}
db:
  - {name: db1, type: parquet}
  - {name: t1, type: parquet}
sync:
  - sourceDb: db1
    targetDb: t1
    sourceSchema: public
    sourceTable: orders
    sourceKeys: o_orderkey
monitor:
  - {syncErrorOver: 100, action: webhook, params: {url: "http://localhost:9000/alerts"}}
"""


def main() -> int:
    from dbsync_spark.app import DbSyncApp
    from dbsync_spark.changelog import ORDERS_PAYLOAD_SCHEMA, build_log_orders
    from dbsync_spark.config import parse_config
    from dbsync_spark.operators.apply import live_rows
    from dbsync_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("dbsync-demo")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="dbsync_demo_")

    app = DbSyncApp(spark, parse_config(DEMO_YAML), base,
                    {"db1.public.orders": ORDERS_PAYLOAD_SCHEMA})
    app.bootstrap()

    log = build_log_orders(spark, sf_dir)
    n = log.count()
    log.write.mode("append").parquet(app.pipelines[0].log_path)
    print(f"change log: {n} I/U/D rows from {sf_dir}/orders.parquet")

    app.run_all_available()

    target = live_rows(app.pipelines[0].target.read(spark))
    print(f"target rows after apply: {target.count()}")
    state = app.sync_state()
    print(f"sync state: success={state.success} pending={state.pending} "
          f"error={state.error} blocked={state.blocked}")
    fired = app.monitor_pass()
    print(f"monitor rules fired: {fired or 'none'}")
    for route_name, payload in sorted(app.endpoint_payloads().items()):
        print(f"endpoint {route_name}: {payload}")
    # fixture dates are decades past the 24h TTL, so the sweep removes
    # every applied (OK) row from the log — exactly the reference's
    # CleanWorker semantics
    app.retention_pass()
    swept = app.sync_state()
    print(f"log rows after retention sweep: {swept.success + swept.pending}")
    app.stop()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Round-3 control-plane additions:
- the full 7-route endpoint surface (reference monitor/Endpoints.scala:
  27-96): /status/{sync,component,sys,datasource}, /config,
  /control/restart, /config/reload;
- the bounded connection pool (DatasourcePools.scala:16-42): maxActive
  bound, connect retries with backoff, acquire timeout, stats counters,
  session query-timeout statement;
- crash-safe single-write retention sweep (sweep_into_place +
  recover_sweep) covering both crash windows.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import urllib.request

import pytest
from pyspark.sql import functions as F

from dbsync_spark.app import DbSyncApp
from dbsync_spark.changelog import ORDERS_PAYLOAD_SCHEMA, build_log_orders
from dbsync_spark.config import parse_config
from dbsync_spark.sinks.pool import ConnectionPool, PoolExhausted, timeout_statement

APP_YAML = """
sys: {maxPollWait: 5000, dataKeepHours: 24}
db:
  - {name: db1, type: parquet, maxPoolSize: 7, user: alice, password: sekret}
  - {name: t1, type: parquet}
sync:
  - sourceDb: db1
    targetDb: t1
    sourceSchema: public
    sourceTable: orders
    sourceKeys: o_orderkey
"""


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        body = r.read()
    try:
        return json.loads(body)
    except ValueError:
        return body.decode()


def test_all_seven_routes(spark, sf_dir, tmp_path):
    cfg = parse_config(APP_YAML)
    app = DbSyncApp(spark, cfg, str(tmp_path / "app"),
                    {"db1.public.orders": ORDERS_PAYLOAD_SCHEMA})
    app.bootstrap()
    build_log_orders(spark, sf_dir).write.mode("append").parquet(
        app.pipelines[0].log_path)
    app.run_all_available()
    port = app.serve_endpoints()
    try:
        sync = _get(port, "/status/sync")
        assert sync["success"] > 0 and sync["pending"] == 0

        comp = _get(port, "/status/component")
        assert any(k.startswith("pipeline:") for k in comp)

        sysp = _get(port, "/status/sys")
        assert sysp["uptime"] > 0 and "restartReason" in sysp
        assert "running" in sysp and sysp["queries"]
        # listener delivery is async: poll briefly for last-batch stats
        import time as _t

        for _ in range(40):
            sysp = _get(port, "/status/sys")
            if sysp["lastProgress"]:
                break
            _t.sleep(0.25)
        assert sysp["lastProgress"], "no progress events delivered"
        prog = next(iter(sysp["lastProgress"].values()))
        assert prog["numInputRows"] > 0 and prog["batchId"] >= 0

        ds = _get(port, "/status/datasource")
        assert set(ds) == {"db1", "t1"}
        assert ds["db1"]["maxActive"] == 7  # from DbConfig.maxPoolSize
        for fld in ("activeCount", "errorCount", "poolingCount", "waitCount"):
            assert fld in ds["db1"]

        conf = _get(port, "/config")
        assert conf["sys"]["dataKeepHours"] == 24
        assert conf["db"][0]["user"] == "alice"
        assert "password" not in conf["db"][0]  # scrubbed, Endpoints.scala:88
        assert conf["sync"][0]["source_table"] == "orders"

        # action routes: restart/reload rebuild pipelines, answer OK
        pipes_before = app.pipelines
        assert _get(port, "/control/restart") == "OK"
        assert app.restart_reason == "Restart by restart api"
        assert app.pipelines is not pipes_before  # rebuilt
        assert _get(port, "/config/reload") == "OK"
        assert app.restart_reason == "Restart by reload config"

        # after restart the pipelines still resume from checkpoints
        app.run_all_available()
        assert _get(port, "/status/sync")["pending"] == 0
    finally:
        app.stop()


def test_config_selects_target_layout(spark, tmp_path):
    """sys.targetLayout/targetBuckets flow from YAML into the pipelines."""
    from dbsync_spark.changelog import ORDERS_PAYLOAD_SCHEMA
    from dbsync_spark.sinks.table import BucketedTable, ParquetTable

    snap_yaml = APP_YAML.replace(
        "sys: {maxPollWait: 5000, dataKeepHours: 24}",
        "sys: {maxPollWait: 5000, targetLayout: snapshot}")
    app = DbSyncApp(spark, parse_config(snap_yaml), str(tmp_path / "a"),
                    {"db1.public.orders": ORDERS_PAYLOAD_SCHEMA})
    app.bootstrap()
    assert isinstance(app.pipelines[0].target, ParquetTable)

    buck_yaml = APP_YAML.replace(
        "sys: {maxPollWait: 5000, dataKeepHours: 24}",
        "sys: {maxPollWait: 5000, targetBuckets: 8}")
    app2 = DbSyncApp(spark, parse_config(buck_yaml), str(tmp_path / "b"),
                     {"db1.public.orders": ORDERS_PAYLOAD_SCHEMA})
    app2.bootstrap()
    assert isinstance(app2.pipelines[0].target, BucketedTable)
    assert app2.pipelines[0].target.n_buckets == 8


# -- connection pool ---------------------------------------------------------


class FakeConn:
    def __init__(self):
        self.closed = False
        self.executed = []

    def cursor(self):
        conn = self

        class Cur:
            def execute(self, sql, *a):
                conn.executed.append(sql)

            def executemany(self, sql, rows):
                conn.executed.append((sql, len(rows)))

        return Cur()

    def commit(self):
        pass

    def close(self):
        self.closed = True


def test_pool_bounds_and_reuse():
    made = []

    def connect():
        made.append(FakeConn())
        return made[-1]

    pool = ConnectionPool(connect, max_active=2, acquire_timeout=0.2)
    a, b = pool.acquire(), pool.acquire()
    assert len(made) == 2
    with pytest.raises(PoolExhausted):
        pool.acquire()
    assert pool.stats()["waitCount"] == 1
    pool.release(a)
    c = pool.acquire()  # reused, not reopened
    assert c is a and len(made) == 2
    pool.release(b)
    pool.release(c)
    s = pool.stats()
    assert s["activeCount"] == 0 and s["poolingCount"] == 2


def test_pool_retries_flaky_connect_with_backoff():
    attempts = []

    def connect():
        attempts.append(1)
        if len(attempts) < 3:
            raise OSError("connection refused")
        return FakeConn()

    pool = ConnectionPool(connect, connect_retries=3, retry_backoff=0.01)
    conn = pool.acquire()
    assert isinstance(conn, FakeConn) and len(attempts) == 3
    assert pool.stats()["errorCount"] == 2  # the two refused attempts

    # a permanently-down endpoint fails after bounded retries
    def dead():
        raise OSError("down")

    pool2 = ConnectionPool(dead, connect_retries=2, retry_backoff=0.01)
    with pytest.raises(OSError):
        pool2.acquire()
    assert pool2.stats()["activeCount"] == 0  # slot returned on failure


def test_pool_blocked_acquirer_wakes_on_release():
    pool = ConnectionPool(FakeConn, max_active=1, acquire_timeout=5.0)
    held = pool.acquire()
    got = []

    def taker():
        got.append(pool.acquire())

    t = threading.Thread(target=taker)
    t.start()
    pool.release(held)
    t.join(timeout=5)
    assert got and got[0] is held


def test_pool_broken_connection_not_reused():
    pool = ConnectionPool(FakeConn, max_active=1)
    with pytest.raises(RuntimeError, match="boom"):
        with pool.connection() as conn:
            first = conn
            raise RuntimeError("boom")
    assert first.closed  # broken conn closed, not pooled
    with pool.connection() as conn2:
        assert conn2 is not first


def test_timeout_statement_dialects():
    assert timeout_statement("postgresql", 5000) == "SET statement_timeout = 5000"
    assert timeout_statement("greenplum", 5000) == "SET statement_timeout = 5000"
    assert (timeout_statement("mysql", 5000)
            == "SET SESSION max_execution_time = 5000")
    assert timeout_statement("postgresql", 0) is None
    assert timeout_statement("sqlite", 5000) is None


def test_write_upserts_through_pool_with_faults(spark, tmp_path):
    """End-to-end: distributed upserts through a pooled, fault-injected
    connect factory — first attempts refused, retries land, rows applied,
    pool stats visible."""
    import sqlite3

    from dbsync_spark.sinks.jdbc import write_upserts

    db = str(tmp_path / "t.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE s_t (k INTEGER PRIMARY KEY, v TEXT)")
    flag = str(tmp_path / "failed_once")

    def flaky_connect(path=db, flag=flag):
        import os as _os
        import sqlite3 as _sq

        if not _os.path.exists(flag):  # first attempt in each worker fails
            with open(flag, "w") as f:
                f.write("x")
            raise OSError("transient connect failure")
        return _sq.connect(path, timeout=30)

    df = spark.createDataFrame(
        [("I", 1, "a"), ("U", 1, "b"), ("I", 2, "c"), ("D", 2, "c")],
        ["operation", "k", "v"]).coalesce(1)
    # sqlite has no schema prefix: use main
    write_upserts(df, "postgresql", "jdbc:none", "main", "s_t", ["k"],
                  connect=flaky_connect, pool_name="fault-test",
                  connect_retries=3)
    with sqlite3.connect(db) as c:
        rows = sorted(c.execute("SELECT k, v FROM s_t").fetchall())
    assert rows == [(1, "b")]  # upserted then deleted key 2
    # pool counters live in the executor-side python workers (separate
    # processes in local mode) — assert via the flag file instead: it
    # exists, so the fault path truly fired and was retried to success
    assert os.path.exists(flag)


# -- crash-safe retention ----------------------------------------------------


def _mk_log(spark, path, n=100):
    (spark.range(n)
     .select(F.col("id"),
             F.lit("x").alias("data"),
             F.lit("2020-01-01").cast("timestamp").alias("createTime"))
     .write.mode("overwrite").parquet(path))


def test_sweep_into_place_single_write_and_recovery(spark, tmp_path):
    from dbsync_spark.operators.retention import recover_sweep, sweep_into_place

    log = str(tmp_path / "log")
    _mk_log(spark, log)
    kept = spark.read.parquet(log).where(F.col("id") % 2 == 0)
    sweep_into_place(kept, log)
    assert spark.read.parquet(log).count() == 50
    assert not os.path.isdir(log + ".sweeping")  # staging gone after swap

    # crash window 1: staged write done, old log never deleted
    kept2 = spark.read.parquet(log).where(F.col("id") % 4 == 0)
    kept2.write.mode("overwrite").parquet(log + ".sweeping")
    assert recover_sweep(log) == "dropped-stale-staging"
    assert spark.read.parquet(log).count() == 50  # original intact

    # crash window 2: old log deleted, rename pending
    kept2.write.mode("overwrite").parquet(log + ".sweeping")
    shutil.rmtree(log)
    assert recover_sweep(log) == "promoted-staging"
    assert spark.read.parquet(log).count() == 25  # staging promoted

    # incomplete staging (no _SUCCESS) and no log -> dropped, not promoted
    os.makedirs(log + ".sweeping", exist_ok=True)
    shutil.rmtree(log)
    assert recover_sweep(log) == "dropped-incomplete-staging"
    assert not os.path.isdir(log)


def test_app_retention_still_correct(spark, sf_dir, tmp_path):
    """retention_pass end-to-end through the new single-write path."""
    import datetime as dt

    cfg = parse_config(APP_YAML)
    app = DbSyncApp(spark, cfg, str(tmp_path / "app"),
                    {"db1.public.orders": ORDERS_PAYLOAD_SCHEMA})
    app.bootstrap()
    log = build_log_orders(spark, sf_dir)
    log.write.mode("append").parquet(app.pipelines[0].log_path)
    app.run_all_available()
    app.retention_pass(now=dt.datetime(2030, 1, 1))
    from dbsync_spark.schemas import SYNC_DATA_SCHEMA

    assert spark.read.schema(SYNC_DATA_SCHEMA).parquet(
        app.pipelines[0].log_path).count() == 0
    # the rewrite mode (maintenance windows) sweeps row-exactly too
    app.retention_pass(now=dt.datetime(2030, 1, 1), mode="rewrite")
    app.stop()


def test_control_loops_tick_on_intervals(spark, tmp_path):
    """The scheduled control loops (reference CleanWorker/ErrorResolver/
    SelfMonitor cadences) tick each pass at its own interval, survive a
    throwing tick, and stop cleanly."""
    import time

    from dbsync_spark.changelog import ORDERS_PAYLOAD_SCHEMA

    fast_yaml = APP_YAML.replace(
        "sys: {maxPollWait: 5000, dataKeepHours: 24}",
        "sys: {maxPollWait: 200, retryInterval: 100, cleanInterval: 300, "
        "syncTriggerInterval: 150}")
    app = DbSyncApp(spark, parse_config(fast_yaml), str(tmp_path / "app"),
                    {"db1.public.orders": ORDERS_PAYLOAD_SCHEMA})
    app.bootstrap()
    calls = {"retry": 0, "boom": 0}

    def fake_retry():
        calls["retry"] += 1
        return False

    def boom(*a, **k):
        calls["boom"] += 1
        raise RuntimeError("tick failure")

    app.retry_pass = fake_retry
    app.retention_pass = boom  # a failing tick must not kill the loop
    reconciles = []
    try:
        app.start_control_loops(reconcile_fn=lambda: reconciles.append(1))
        app.start_control_loops()  # idempotent: no second thread
        deadline = time.time() + 10
        while time.time() < deadline and not (
                calls["retry"] >= 3 and calls["boom"] >= 2
                and app.loop_stats["monitor"] >= 2):
            time.sleep(0.05)
        assert calls["retry"] >= 3          # fastest interval ticked most
        assert calls["boom"] >= 2           # loop survived the raises
        assert app.loop_stats["errors"] >= 2
        assert app.loop_stats["monitor"] >= 2
        deadline = time.time() + 5
        while time.time() < deadline and len(reconciles) < 2:
            time.sleep(0.05)
        assert len(reconciles) >= 2  # SyncTrigger cadence ticked
    finally:
        app.stop()
    t = app._loops_thread
    assert t is None  # stopped and cleared


def test_segment_retention_streaming_safe(spark, sf_dir, tmp_path):
    """Default (segment) retention under a live stream: only fully
    expired+acked FILES are unlinked, kept rows are never rewritten, and
    a subsequent drain re-ingests NOTHING (no new files appeared)."""
    import datetime as dt

    from dbsync_spark.changelog import ORDERS_PAYLOAD_SCHEMA, build_log_orders

    cfg = parse_config(APP_YAML)
    app = DbSyncApp(spark, cfg, str(tmp_path / "app"),
                    {"db1.public.orders": ORDERS_PAYLOAD_SCHEMA})
    app.bootstrap()
    pipe = app.pipelines[0]
    log = build_log_orders(spark, sf_dir).cache()
    lo, hi = log.agg(F.min("createTime"), F.max("createTime")).first()
    cutpoint = lo + (hi - lo) / 2
    old_part = log.where(F.col("createTime") < F.lit(cutpoint))
    new_part = log.where(F.col("createTime") >= F.lit(cutpoint))
    # two segment files with disjoint time ranges
    old_part.coalesce(1).write.mode("append").parquet(pipe.log_path)
    new_part.coalesce(1).write.mode("append").parquet(pipe.log_path)
    app.run_all_available()  # everything acked OK

    files_before = {f for f in os.listdir(pipe.log_path)
                    if f.endswith(".parquet")}
    fp_before = pipe.target.state_fingerprint()
    # cutoff between the segments (+ keep window): old file all-expired
    app.retention_pass(
        now=cutpoint + dt.timedelta(hours=cfg.sys.dataKeepHours))
    files_after = {f for f in os.listdir(pipe.log_path)
                   if f.endswith(".parquet")}
    assert files_after < files_before            # something was unlinked
    remaining = spark.read.parquet(pipe.log_path)
    assert remaining.count() == new_part.count()  # kept rows untouched
    # no rewrite -> the surviving file is the SAME file
    assert files_after <= files_before

    # a post-sweep drain must be a no-op: no new files, nothing re-acked
    acks_before = spark.read.parquet(
        os.path.join(str(tmp_path / "app"), "status", "db1")).count()
    app.run_all_available()
    acks_after = spark.read.parquet(
        os.path.join(str(tmp_path / "app"), "status", "db1")).count()
    assert acks_after == acks_before
    assert pipe.target.state_fingerprint() == fp_before
    app.stop()


def test_get_pool_replaces_on_config_change():
    """A changed connect factory or limits must not silently reuse the
    old pool: the registry swaps in a new pool (old idle conns closed);
    an unchanged repeat call and a no-factory call reuse the same pool."""
    from dbsync_spark.sinks.pool import get_pool

    closed = []

    class FakeConn:
        def close(self):
            closed.append(self)

    factory_a = lambda: FakeConn()
    p1 = get_pool("swap_test", factory_a, max_active=3)
    assert get_pool("swap_test") is p1                       # fast path
    assert get_pool("swap_test", factory_a, max_active=3) is p1  # same cfg
    # warm an idle connection so replacement provably closes it
    c = p1.acquire()
    p1.release(c)
    factory_b = lambda: FakeConn()
    p2 = get_pool("swap_test", factory_b, max_active=3)
    assert p2 is not p1 and closed == [c]                    # new factory
    p3 = get_pool("swap_test", factory_b, max_active=5)
    assert p3 is not p2                                      # new limit

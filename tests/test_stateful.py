from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from dbsync_spark.changelog import build_log_orders
from dbsync_spark.schemas import SYNC_DATA_SCHEMA
from dbsync_spark.streaming.stateful import lww_updates


def test_stateful_lww_change_feed(spark, sf_dir):
    """applyInPandasWithState LWW state across multiple micro-batches:
    reducing the emitted change feed must equal the batch LWW result."""
    workdir = tempfile.mkdtemp(prefix="dbsync_stateful_")
    log = build_log_orders(spark, sf_dir).cache()
    log.repartition(4).write.parquet(f"{workdir}/log")

    stream = (
        spark.readStream.schema(SYNC_DATA_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{workdir}/log")
        .withColumn("okey", F.get_json_object("data", "$.o_orderkey"))
    )
    feed = lww_updates(stream, "okey")
    q = (
        feed.writeStream.format("memory").queryName("lww_feed")
        .outputMode("update")
        .option("checkpointLocation", f"{workdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.sql("SELECT * FROM lww_feed")
    # several micro-batches may each emit a version per key: reduce to the
    # final version per key
    final = (
        out.groupBy("key")
        .agg(F.max_by(F.struct("operation", "payload"), "last_id").alias("w"),
             F.max("last_id").alias("last_id"))
        .select("key", "w.operation", "w.payload")
    )
    live = final.where(F.col("operation") != "D")

    from dbsync_spark.changelog import ORDERS_PAYLOAD_SCHEMA
    from dbsync_spark.operators.apply import last_writer_wins, parse_changes
    expected = last_writer_wins(parse_changes(log, ORDERS_PAYLOAD_SCHEMA),
                                ["o_orderkey"])
    assert live.count() == expected.count()

    # spot-check a payload value round-trips the state store
    some = live.limit(1).collect()[0]
    parsed = spark.read.json(spark.sparkContext.parallelize([some["payload"]]))
    assert int(parsed.collect()[0]["o_orderkey"]) == some["key"]


def test_stateful_ttl_eviction(spark, sf_dir):
    """Keys idle past the TTL are evicted (marker row emitted, state
    dropped). TTL mode needs a continuous trigger: with processing-time
    timeouts Spark keeps scheduling (possibly empty) micro-batches to fire
    expired timers, so Trigger.AvailableNow would never terminate."""
    import time

    workdir = tempfile.mkdtemp(prefix="dbsync_ttl_")
    log = build_log_orders(spark, sf_dir).cache()
    log.where(F.col("id") <= 10).coalesce(1).write.parquet(f"{workdir}/log")

    stream = (
        spark.readStream.schema(SYNC_DATA_SCHEMA)
        .parquet(f"{workdir}/log")
        .withColumn("okey", F.get_json_object("data", "$.o_orderkey"))
    )
    feed = lww_updates(stream, "okey", ttl_ms=500)
    q = (feed.writeStream.format("memory").queryName("ttl_feed")
         .outputMode("update")
         .option("checkpointLocation", f"{workdir}/ckpt")
         .trigger(processingTime="500 milliseconds").start())
    try:
        deadline = time.time() + 120
        evicted_n = 0
        while time.time() < deadline:
            evicted_n = spark.sql(
                "SELECT count(*) AS c FROM ttl_feed "
                "WHERE operation = '_EVICTED'").collect()[0]["c"]
            if evicted_n > 0:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    out = spark.sql("SELECT * FROM ttl_feed").cache()
    assert evicted_n > 0  # idle keys were evicted after the TTL
    evicted = out.where(F.col("operation") == "_EVICTED")
    # evicted keys carried their last known id forward in the marker row
    assert evicted.where(F.col("last_id") <= 0).count() == 0
    # every evicted key had previously been emitted as a live update
    live_keys = {r["key"] for r in
                 out.where(F.col("operation") != "_EVICTED").collect()}
    for r in evicted.collect():
        assert r["key"] in live_keys

"""transformWithStateInPandas change audit: streaming result (across
multiple micro-batches) must equal the batch aggregation.

Spark's transformWithState Python worker needs the `protobuf` package
(its state-server protocol is protobuf-framed); this container doesn't
ship it, so the test skips itself when the import fails — the operator
code is exercised wherever protobuf exists.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from dbsync_spark.changelog import build_log_orders
from dbsync_spark.schemas import SYNC_DATA_SCHEMA
from dbsync_spark.streaming.tws import (HAS_TRANSFORM_WITH_STATE,
                                        ROCKSDB_PROVIDER, change_audit)


@pytest.mark.skipif(
    not HAS_TRANSFORM_WITH_STATE,
    reason="transformWithState needs the protobuf package (not in container)")
def test_change_audit_matches_batch(spark, sf_dir):
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    original = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, ROCKSDB_PROVIDER)
    try:
        workdir = tempfile.mkdtemp(prefix="dbsync_tws_")
        log = build_log_orders(spark, sf_dir).cache()
        log.repartition(4).write.parquet(f"{workdir}/log")

        stream = (
            spark.readStream.schema(SYNC_DATA_SCHEMA)
            .option("maxFilesPerTrigger", 2)
            .parquet(f"{workdir}/log")
            .withColumn("okey", F.get_json_object("data", "$.o_orderkey"))
        )
        feed = change_audit(stream, "okey")
        q = (feed.writeStream.format("memory").queryName("tws_audit")
             .outputMode("update")
             .option("checkpointLocation", f"{workdir}/ckpt")
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

        # last emitted row per key == final state
        got = spark.sql("""
            SELECT key, n_changes, last_id, last_op FROM (
              SELECT *, row_number() OVER (PARTITION BY key
                                           ORDER BY last_id DESC,
                                                    n_changes DESC) AS rn
              FROM tws_audit
            ) WHERE rn = 1
        """)
        expected = (
            log.withColumn("key",
                           F.get_json_object("data", "$.o_orderkey")
                           .cast("long"))
            .groupBy("key")
            .agg(F.count("*").alias("n_changes"),
                 F.max("id").alias("last_id"),
                 F.max_by("operation", "id").alias("last_op"))
        )
        assert got.count() == expected.count()
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0
    finally:
        if original is not None:
            spark.conf.set(provider_key, original)
        else:
            spark.conf.unset(provider_key)

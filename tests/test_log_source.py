from __future__ import annotations

import pytest

from dbsync_spark.changelog import ORDERS_PAYLOAD_SCHEMA, build_log_orders
from dbsync_spark.operators.apply import last_writer_wins, parse_changes
from dbsync_spark.sources.log_source import read_log, read_log_stream, write_log


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv", "orc"])
def test_log_roundtrip_all_formats(spark, sf_dir, tmp_path, fmt):
    """The same change log applied from any wire format yields the same
    final state (JSON payloads survive CSV quoting, timestamps survive the
    text formats at microsecond precision)."""
    log = build_log_orders(spark, sf_dir).cache()
    path = str(tmp_path / fmt)
    write_log(log, path, fmt)
    back = read_log(spark, path, fmt)
    assert back.count() == log.count()

    # nullability flags and timestamp flavor (NTZ in the in-memory fixture
    # vs LTZ in the declared wire schema; identical wall times under the
    # UTC session) differ between construction and file read
    def norm(schema):
        return [(f.name, f.dataType.simpleString().replace("_ntz", ""))
                for f in schema.fields]

    assert norm(back.schema) == norm(log.schema)

    got = last_writer_wins(parse_changes(back, ORDERS_PAYLOAD_SCHEMA),
                           ["o_orderkey"])
    want = last_writer_wins(parse_changes(log, ORDERS_PAYLOAD_SCHEMA),
                            ["o_orderkey"])
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_log_stream_json(spark, sf_dir, tmp_path):
    """Streaming reader over a JSON-lines spool drains to the same state."""
    from pyspark.sql import functions as F

    log = build_log_orders(spark, sf_dir)
    path = str(tmp_path / "jsonlog")
    write_log(log.repartition(3), path, "json")
    stream = read_log_stream(spark, path, "json", max_files_per_trigger=1)
    q = (stream.writeStream.format("memory").queryName("json_log")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert spark.sql("SELECT count(*) c FROM json_log").first()["c"] == log.count()


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported log format"):
        read_log(spark, str(tmp_path), "avro")


def test_pipeline_over_json_log(spark, sf_dir, tmp_path):
    """Full SyncPipeline drains a JSON-lines change log to the same state
    as the parquet path."""
    from dbsync_spark.operators.apply import last_writer_wins, live_rows
    from dbsync_spark.operators.route import SyncRule
    from dbsync_spark.streaming.pipeline import SyncPipeline

    log = build_log_orders(spark, sf_dir).cache()
    write_log(log, str(tmp_path / "log"), "json")
    rule = SyncRule("db1", "public", "orders", ("o_orderkey",))
    pipe = SyncPipeline(
        spark, rule, ORDERS_PAYLOAD_SCHEMA,
        log_path=str(tmp_path / "log"), target_path=str(tmp_path / "target"),
        status_path=str(tmp_path / "status"),
        checkpoint_path=str(tmp_path / "ckpt"), log_format="json")
    pipe.run_to_completion()
    final = live_rows(pipe.target.read(spark))
    want = last_writer_wins(parse_changes(log, ORDERS_PAYLOAD_SCHEMA),
                            ["o_orderkey"])
    assert final.count() == want.count()
    assert final.exceptAll(want).count() == 0

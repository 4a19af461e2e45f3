"""Schema drift on the change-log payload.

The reference's payload is schema-less JSON (Map decode,
sync/DataPoller.scala:91) so capture-side drift never breaks the engine.
Our typed path must degrade the same way: unknown JSON keys are ignored,
missing keys become NULL, and apply still converges.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbsync_spark.operators.apply import last_writer_wins, parse_changes


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "id LONG, operation STRING, data STRING")


def test_unknown_keys_ignored_missing_null(spark):
    schema = "k LONG, v STRING, w DOUBLE"
    log = _log(spark, [
        (1, "I", '{"k": 1, "v": "a", "w": 1.5}'),
        # drift: new capture-side column "extra" not yet in the engine schema
        (2, "I", '{"k": 2, "v": "b", "w": 2.5, "extra": "ignored"}'),
        # drift: old capture version missing "w"
        (3, "I", '{"k": 3, "v": "c"}'),
    ])
    from pyspark.sql.types import StructType
    parsed = parse_changes(log, StructType.fromDDL(schema))
    rows = {r["k"]: r for r in parsed.collect()}
    assert rows[2]["v"] == "b"            # extra key ignored, row intact
    assert rows[3]["w"] is None           # missing key -> NULL
    assert parsed.count() == 3


def test_apply_converges_under_drift(spark):
    """LWW over a log whose later entries carry drifted payloads still
    converges: newest row image wins wholesale (full-row semantics, as in
    the reference's row_to_json full images)."""
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL("k LONG, v STRING, w DOUBLE")
    log = _log(spark, [
        (1, "I", '{"k": 1, "v": "old", "w": 1.0}'),
        (2, "U", '{"k": 1, "v": "new"}'),               # drifted update: no w
        (3, "I", '{"k": 2, "v": "x", "w": 9.0, "zz": 4}'),
    ])
    final = last_writer_wins(parse_changes(log, schema), ["k"])
    rows = {r["k"]: r for r in final.collect()}
    assert rows[1]["v"] == "new"
    assert rows[1]["w"] is None   # full-row image: newest image wins wholesale
    assert rows[2]["w"] == 9.0


def test_malformed_json_rows_are_null_not_fatal(spark):
    """A corrupt payload must not kill the batch (the reference acks ERR
    per-row, never crashes the poller): from_json yields NULLs that the
    caller can route to a dead-letter set."""
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL("k LONG, v STRING")
    log = _log(spark, [
        (1, "I", '{"k": 1, "v": "ok"}'),
        (2, "I", 'NOT JSON AT ALL'),
    ])
    parsed = parse_changes(log, schema)
    good = parsed.where(F.col("k").isNotNull())
    dead = parsed.where(F.col("k").isNull())
    assert good.count() == 1 and dead.count() == 1

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dbsync_spark.operators.asof import asof_join, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_semantics(spark):
    """Latest right row with right_ts <= left_ts; equality counts; keys
    with no preceding right row get NULLs."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-05T00:00:00")),
         (1, _ts("2024-01-02T00:00:00")),
         (2, _ts("2024-01-01T00:00:00"))],
        ["k", "lts"])
    right = spark.createDataFrame(
        [(1, _ts("2024-01-02T00:00:00"), "a"),   # ties with left @01-02 -> <=
         (1, _ts("2024-01-04T00:00:00"), "b"),
         (2, _ts("2024-06-01T00:00:00"), "z")],  # after left -> no match
        ["k", "rts", "v"])
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts",
                    right_cols=["v"])
    got = {(r["k"], r["lts"].isoformat()): r["v"] for r in out.collect()}
    assert got == {
        (1, "2024-01-05T00:00:00"): "b",
        (1, "2024-01-02T00:00:00"): "a",
        (2, "2024-01-01T00:00:00"): None,
    }


def test_asof_plan_single_shuffle(spark):
    left = spark.range(100).select(F.col("id").alias("k"),
                                   F.col("id").cast("timestamp").alias("lts"))
    right = spark.range(50).select(F.col("id").alias("k"),
                                   F.col("id").cast("timestamp").alias("rts"),
                                   F.lit("x").alias("v"))
    out = asof_join(left, right, ["k"], "lts", "rts", ["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_broadcast(spark):
    pts = spark.range(100).select((F.col("id") % 10).cast("double").alias("v"))
    rng = spark.createDataFrame([("lo", 0.0, 5.0), ("hi", 5.0, 10.0)],
                                ["tier", "lo", "hi"])
    out = range_join(pts, rng, "v", "lo", "hi")
    assert out.count() == 100
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan

from __future__ import annotations


import __spark_entry__ as entrymod
from dbsync_spark.changelog import ORDERS_PAYLOAD_SCHEMA, build_log_orders
from dbsync_spark.operators.apply import last_writer_wins, merge_into, parse_changes
from tests.compare import assert_matches


def test_q_apply_upsert_matches_oracle(spark, sf_dir, duck):
    q = entrymod.queries()["q_apply_upsert"]
    assert_matches(q(spark, sf_dir), duck, entrymod.oracle_sql()["q_apply_upsert"])


def test_q_apply_delete_matches_oracle(spark, sf_dir, duck):
    q = entrymod.queries()["q_apply_delete"]
    assert_matches(q(spark, sf_dir), duck, entrymod.oracle_sql()["q_apply_delete"])


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "o_orderkey" in df.columns


def test_lww_tiny_manual(spark):
    rows = [
        (1, "I", 10, "a"),
        (2, "U", 10, "b"),
        (3, "I", 20, "x"),
        (4, "D", 20, "x"),
        (5, "I", 30, "z"),
    ]
    df = spark.createDataFrame(rows, ["id", "operation", "k", "v"])
    out = {r["k"]: r["v"] for r in last_writer_wins(df, ["k"]).collect()}
    assert out == {10: "b", 30: "z"}


def test_merge_into_idempotent_replay(spark, sf_dir):
    """At-least-once replay converges: applying the same log onto the
    already-merged snapshot yields the identical state (reference relies on
    idempotent upserts, dbopt/PgOperation.scala:47-79)."""
    log = build_log_orders(spark, sf_dir)
    changes = parse_changes(log, ORDERS_PAYLOAD_SCHEMA)
    once = last_writer_wins(changes, ["o_orderkey"])
    twice = merge_into(once, changes, ["o_orderkey"])
    assert once.count() == twice.count()
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0


def test_merge_into_applies_increment(spark):
    existing = spark.createDataFrame([(10, "old"), (20, "keep")], ["k", "v"])
    inc = spark.createDataFrame(
        [(1, "U", 10, "new"), (2, "I", 30, "ins"), (3, "D", 20, "keep")],
        ["id", "operation", "k", "v"],
    )
    out = {r["k"]: r["v"] for r in merge_into(existing, inc, ["k"]).collect()}
    assert out == {10: "new", 30: "ins"}

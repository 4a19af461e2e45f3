"""TPC-DS-shaped surface (queries_tpcds.py): oracle sweep + the plan
properties that justify the Spark-first rewrites (one-scan conditional
aggregation instead of DS's repeated fact scans; broadcast of the
HAVING-filtered aggregate)."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.compare import assert_matches

TPCDS_QUERIES = [
    "q_yoy_growth",
    "q_channel_union_agg",
    "q_count_buckets",
    "q_having_range",
    "q_returns_net",
    "q_cumulative_crossover",
    "q_rollup_topk",
    "q_moving_dev",
]


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_tpcds_surface_matches_oracle(spark, sf_dir, duck):
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    for name in TPCDS_QUERIES:
        assert_matches(qs[name](spark, sf_dir), duck, os_[name])


def test_channel_union_single_fact_scan(spark, sf_dir):
    """The union-of-channels oracle scans orders 3x; the engine must scan
    it once (conditional aggregation) with broadcast dimensions."""
    plan = _plan(entrymod.queries()["q_channel_union_agg"](spark, sf_dir))
    # formatted plans name each node twice (tree + detail section)
    assert plan.count("Scan parquet") == 6  # orders + customer + nation
    assert plan.count("BroadcastHashJoin") == 4  # 2 joins x (tree + detail)
    assert "Union" not in plan


def test_count_buckets_one_scan_no_join(spark, sf_dir):
    """DS Q88's eight scalar subqueries collapse to one scan + one
    global aggregate — no joins, no repeated scans."""
    plan = _plan(entrymod.queries()["q_count_buckets"](spark, sf_dir))
    # formatted plans name each node twice (tree + detail section)
    assert plan.count("Scan parquet") == 2
    assert "Join" not in plan
    # only quantity + discount read, not the full lineitem row
    assert "l_quantity" in plan and "l_extendedprice" not in plan


def test_yoy_growth_single_shuffle_no_self_join(spark, sf_dir):
    """The lag() rewrite keeps one aggregate + one window over the same
    custkey partitioning — no second join of the yearly aggregate."""
    plan = _plan(entrymod.queries()["q_yoy_growth"](spark, sf_dir))
    assert "Join" not in plan
    assert "Window" in plan


def test_having_range_broadcasts_filtered_agg(spark, sf_dir):
    """The HAVING-filtered order counts broadcast into the customer scan."""
    plan = _plan(entrymod.queries()["q_having_range"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_returns_net_counts_are_consistent(spark, sf_dir):
    """Netting invariants: returned lines net to zero, so net_cents of a
    supplier with all lines returned is 0; n_returned <= n_items."""
    rows = entrymod.queries()["q_returns_net"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_returned"] <= r["n_items"]
        assert r["net_cents"] >= 0


def test_rollup_topk_mixes_levels(spark, sf_dir):
    """The subtotal row (yr NULL) always outranks its detail years —
    rank 1 in every priority partition is the subtotal."""
    rows = entrymod.queries()["q_rollup_topk"](spark, sf_dir).collect()
    for r in rows:
        if r["rnk"] == 1 and r["o_orderpriority"] is not None:
            assert r["yr"] is None

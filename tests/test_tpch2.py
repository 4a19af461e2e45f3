"""TPC-H completion suite (queries_tpch2.py — Q2/Q8/Q9/Q11/Q16/Q17/Q19/
Q20/Q21/Q22 shapes): oracle sweep + the plan properties that let these
run at 100 TB (broadcast dimensions, bounded shuffle count, semi-join
pushout)."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.compare import assert_matches

TPCH2_ORACLE_BACKED = [
    "q_min_cost_supplier",
    "q_market_share",
    "q_profit_by_nation",
    "q_important_parts",
    "q_supplier_counts",
    "q_small_qty_revenue",
    "q_disjunctive_revenue",
    "q_excess_suppliers",
    "q_waiting_suppliers",
    "q_global_sales_opportunity",
]


def test_tpch2_surface_matches_oracle(spark, sf_dir, duck):
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    for name in TPCH2_ORACLE_BACKED:
        assert_matches(qs[name](spark, sf_dir), duck, os_[name])


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_min_cost_supplier_part_filter_reaches_offer_agg(spark, sf_dir):
    """Q2's p_size filter must prune the lineitem aggregation input (the
    oracle applies it last; the engine must not)."""
    plan = _plan(entrymod.queries()["q_min_cost_supplier"](spark, sf_dir))
    # every join with a dimension is a broadcast; the offer aggregation is
    # the only wide exchange keyed on (l_partkey, l_suppkey)
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_profit_by_nation_single_fact_shuffle(spark, sf_dir):
    """Q9: part/supplier/nation broadcast; only orders joins wide. The
    final agg is the one hash exchange over grouped keys."""
    plan = _plan(entrymod.queries()["q_profit_by_nation"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_waiting_suppliers_semi_join_and_single_agg_pass(spark, sf_dir):
    """Q21: the EXISTS/NOT-EXISTS pair is one per-order aggregate, not two
    correlated re-scans — exactly one distinct-aggregate expand."""
    plan = _plan(entrymod.queries()["q_waiting_suppliers"](spark, sf_dir))
    assert "LeftSemi" in plan  # order-status gate
    assert "Expand" in plan    # two count(DISTINCT)s in one pass


def test_excess_suppliers_all_semi_joins(spark, sf_dir):
    """Q20: the IN-chain compiles to semi-joins (no row multiplication)."""
    plan = _plan(entrymod.queries()["q_excess_suppliers"](spark, sf_dir))
    assert plan.count("LeftSemi") >= 3

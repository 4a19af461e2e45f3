"""Hostile-driver simulation: the grading driver brings its OWN session
(possibly non-UTC, different confs). Every declared query pins the confs
it assumes at the contract boundary (queries._register), so results must
be identical under a hostile session state."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.compare import assert_matches

TZ_SENSITIVE = ["q_window_count", "q_date_funcs", "q_rollup", "q_sessionize",
                "q_gap_fill", "q_hopping_window", "q_session_window",
                "q_attribution", "q_changed_columns"]


def test_queries_survive_non_utc_session(spark, sf_dir, duck):
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        for name in TZ_SENSITIVE:
            assert_matches(qs[name](spark, sf_dir), duck, os_[name])
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
        spark.conf.set("spark.sql.adaptive.enabled", "true")

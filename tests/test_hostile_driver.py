"""Hostile-driver simulation: the grading driver brings its OWN session
(possibly non-UTC, different confs). Every declared query pins the confs
it assumes at the contract boundary (queries._register), so results must
be identical under a hostile session state."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.compare import assert_matches

TZ_SENSITIVE = ["q_window_count", "q_date_funcs", "q_rollup", "q_sessionize",
                "q_gap_fill", "q_hopping_window", "q_session_window",
                "q_attribution", "q_changed_columns", "q_channel_cumulative"]


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


def test_streaming_dtw_tz_invariant(spark, sf_dir):
    """q_streaming_dtw is rows-only AND bucket-boundary-sensitive
    (date_trunc hour + interval spines): its distances must be identical
    under a hostile non-UTC session — the _register pin, not the ambient
    session, decides the buckets. Also covers an India-style half-hour
    offset, where an unpinned hour-truncation would shift every bucket."""
    q = entrymod.queries()["q_streaming_dtw"]
    ref = {r["user_id"]: r["dtw_dist"] for r in q(spark, sf_dir).collect()}
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("America/New_York", "Asia/Kolkata"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = {r["user_id"]: r["dtw_dist"]
                   for r in q(spark, sf_dir).collect()}
            assert got == ref, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)

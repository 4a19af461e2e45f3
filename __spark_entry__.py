"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (ordered change-log apply, the
reference's core semantic) on sf0.001. `queries()` exposes every
implemented operator from SURVEY.md §2 as (spark, sf_dir) -> DataFrame;
`oracle_sql()` gives the DuckDB-equivalent SQL for each.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbsync_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: last-writer-wins change-log apply (Q-apply-upsert)."""
    return Q.QUERIES["q_apply_upsert"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)

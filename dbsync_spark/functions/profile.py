"""ANALYZE-style table profiling: per-column stats in ONE scan.

The profile every warehouse engine exposes (row count, nulls, exact
distinct, min/max) computed as parallel aggregate expressions over a
single pass, then unpivoted with `stack` into one row per column.
Exact count_distinct over k columns makes Catalyst plan an Expand
(k rows per input row) — the standard exact-profile plan; at 100 TB
swap in approx_count_distinct per column (single pass, no Expand, HLL
merge across partitions) and keep this exact path for audits. min/max
are rendered as strings so heterogeneous column types share one output
schema; only types with engine-portable string renderings (integers,
strings, dates at day precision) belong in a hash-checked profile.

Reference has no profiling surface; this is engine-completeness for the
data-validation step of a training pipeline (cf. shard_manifest, which
profiles the physical sharding instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled column: (col, n_rows, n_null, n_distinct,
    min_value, max_value) — nulls excluded from distinct, min and max
    rendered as strings."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    row = df.agg(F.count(F.lit(1)).alias("_n"), *aggs)
    stacked = ", ".join(
        f"'{c}', _n - _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols)
    return row.selectExpr(
        "_n AS n_rows",
        f"stack({len(cols)}, {stacked}) AS "
        "(col, n_null, n_distinct, min_value, max_value)",
    ).select("col", "n_rows", "n_null", "n_distinct",
             "min_value", "max_value")

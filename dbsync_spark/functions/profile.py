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
plain strings) should be listed in `minmax_cols` for a hash-checked
profile — the rest emit NULL.

Reference has no profiling surface; this is engine-completeness for the
data-validation step of a training pipeline (cf. shard_manifest, which
profiles the physical sharding instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str],
                  minmax_cols: list[str] | None = None) -> DataFrame:
    """One row per profiled column: (col_name, n_rows, n_nulls,
    n_distinct, min_value, max_value). min/max are emitted (as strings)
    only for columns in `minmax_cols` (default: all), NULL otherwise."""
    mm = set(cols if minmax_cols is None else minmax_cols)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [F.count(c).alias(f"{c}__nn"),
                 F.count_distinct(c).alias(f"{c}__nd")]
        if c in mm:
            aggs += [F.min(c).cast("string").alias(f"{c}__mn"),
                     F.max(c).cast("string").alias(f"{c}__mx")]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n - {c}__nn, {c}__nd, "
        + (f"{c}__mn, {c}__mx" if c in mm
           else "CAST(NULL AS STRING), CAST(NULL AS STRING)")
        for c in cols)
    return row.select(
        F.expr(f"stack({len(cols)}, {stack_args})")
        .alias("col_name", "n_nulls", "n_distinct", "min_value",
               "max_value"),
        F.col("__n").alias("n_rows"),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct",
             "min_value", "max_value")

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
    only for columns in `minmax_cols` (default: all), NULL otherwise.
    Internal aggregate aliases are positional (_c0_nn, ...) and the
    stack() arguments reference only those plus an escaped label
    literal, so column names with spaces/quotes/keywords profile
    correctly (F.col handles them without SQL parsing)."""
    mm = set(cols if minmax_cols is None else minmax_cols)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [F.count(F.col(c)).alias(f"_c{i}_nn"),
                 F.count_distinct(F.col(c)).alias(f"_c{i}_nd")]
        if c in mm:
            aggs += [F.min(F.col(c)).cast("string").alias(f"_c{i}_mn"),
                     F.max(F.col(c)).cast("string").alias(f"_c{i}_mx")]
    row = df.agg(*aggs)

    def lbl(c: str) -> str:
        return "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"

    stack_args = ", ".join(
        f"{lbl(c)}, __n - _c{i}_nn, _c{i}_nd, "
        + (f"_c{i}_mn, _c{i}_mx" if c in mm
           else "CAST(NULL AS STRING), CAST(NULL AS STRING)")
        for i, c in enumerate(cols))
    return row.select(
        F.expr(f"stack({len(cols)}, {stack_args})")
        .alias("col_name", "n_nulls", "n_distinct", "min_value",
               "max_value"),
        F.col("__n").alias("n_rows"),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct",
             "min_value", "max_value")

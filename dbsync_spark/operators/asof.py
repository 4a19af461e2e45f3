"""As-of and range joins — time-series operators Spark lacks natively.

- `asof_join`: for each left row, the single latest right row with
  right_ts <= left_ts per key. Implemented as the union-and-fill pattern:
  tag both sides, sort (key, ts, side) within one shuffle, and carry the
  last-seen right payload forward with last(ignorenulls) over an
  unbounded-preceding window. One shuffle, no per-row Python, no
  cross-product explosion — the standard scale-safe formulation.
- `range_join`: point-in-interval join against a small ranges table via
  broadcast + non-equi condition (never a shuffled theta join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str,
              right_cols: list[str],
              tolerance: str | None = None) -> DataFrame:
    """Left as-of join: latest right row (by right_ts <= left_ts) per key.
    Right side must be unique per (key, right_ts) — pre-reduce if not.
    Right payload columns come back NULL when no right row precedes.

    `tolerance` (an INTERVAL string, e.g. "90 days") bounds staleness:
    a match older than left_ts - tolerance is treated as no match (the
    kdb `aj` / pandas `merge_asof(tolerance=...)` semantic). Implemented
    as a null-out after the fill — no extra shuffle."""
    left_payload = [c for c in left.columns if c not in on]
    l_tagged = left.select(
        *on, F.col(left_ts).alias("_ts"), F.lit(1).alias("_side"),
        *[F.col(c) for c in left_payload if c != left_ts],
        F.col(left_ts),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in right_cols],
    )
    r_tagged = right.select(
        *on, F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in left_payload if c != left_ts],
        F.lit(None).cast(dict(left.dtypes)[left_ts]).alias(left_ts),
        *right_cols,
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows (side 0) sort before left rows at the same ts -> <= semantics
    w = (Window.partitionBy(*on).orderBy("_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    match_ts = F.last(F.when(F.col("_side") == 0, F.col("_ts")),
                      ignorenulls=True).over(w)
    filled = unioned.select(
        "*", match_ts.alias("_f__match_ts"),
        *[F.last(c, ignorenulls=True).over(w).alias(f"_f_{c}")
          for c in right_cols])
    if tolerance is not None:
        fresh = (F.col("_f__match_ts")
                 >= F.col("_ts") - F.expr(f"INTERVAL {tolerance}"))
        out_cols = [F.when(fresh, F.col(f"_f_{c}")).alias(c)
                    for c in right_cols]
    else:
        out_cols = [F.col(f"_f_{c}").alias(c) for c in right_cols]
    return (filled.where(F.col("_side") == 1)
            .select(*on, *[c for c in left_payload if c != left_ts], left_ts,
                    *out_cols))


def range_join(points: DataFrame, ranges: DataFrame, point_col: str,
               lo_col: str, hi_col: str) -> DataFrame:
    """Point-in-interval inner join; the ranges side broadcasts (it is a
    dimension table — bucketing schemes, SLA windows, price tiers)."""
    cond = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    return points.join(F.broadcast(ranges), cond)

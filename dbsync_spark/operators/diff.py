"""Snapshot diff: the net change set between two applied states.

The inverse of apply: the reference turns a change stream into target
state; this turns two states (e.g. two snapshot versions of
sinks/table.ParquetTable) back into the minimal I/U/D change set — the
change-data-feed a downstream cascade consumer would replay. One full
outer join on the key, null-safe row comparison, no shuffle beyond the
join's own.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame,
                  key_cols: list[str]) -> DataFrame:
    """Rows keyed by `key_cols` that differ between `old` and `new`:
    change_type 'I' (only in new), 'D' (only in old), 'U' (in both but any
    column differs, null-safe). Identical rows are dropped."""
    payload_cols = [c for c in new.columns if c not in key_cols]
    o = old.select([F.col(c).alias(f"_o_{c}") for c in old.columns])
    n = new.select([F.col(c).alias(f"_n_{c}") for c in new.columns])
    cond = reduce(lambda a, b: a & b,
                  [o[f"_o_{k}"].eqNullSafe(n[f"_n_{k}"]) for k in key_cols])
    joined = o.join(n, cond, "full_outer")

    in_old = reduce(lambda a, b: a | b,
                    [F.col(f"_o_{k}").isNotNull() for k in key_cols])
    in_new = reduce(lambda a, b: a | b,
                    [F.col(f"_n_{k}").isNotNull() for k in key_cols])
    same_payload = reduce(
        lambda a, b: a & b,
        [F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")) for c in payload_cols],
        F.lit(True))
    change_type = (
        F.when(~in_old, F.lit("I"))
        .when(~in_new, F.lit("D"))
        .when(~same_payload, F.lit("U")))
    keys_out = [
        F.coalesce(F.col(f"_n_{k}"), F.col(f"_o_{k}")).alias(k)
        for k in key_cols
    ]
    return (joined
            .withColumn("change_type", change_type)
            .where(F.col("change_type").isNotNull())
            .select(*keys_out, "change_type"))

"""Incremental view maintenance for joins (append-only deltas).

The reference keeps TARGET TABLES in sync from change logs; the natural
extension for an analytics engine is keeping DERIVED views in sync. For an
inner join view V = A ⋈ B and append-only deltas dA, dB, the exact
increment is the delta algebra

    dV = (dA ⋈ B_old) ∪ (A_old ⋈ dB) ∪ (dA ⋈ dB)

so the refreshed view V ∪ dV equals a full recompute over (A_old ∪ dA) ⋈
(B_old ∪ dB) — declared and oracle-checked as q_incremental_join.

Scale shape: each leg joins a (small) delta against a base — at 100 TB the
delta side is a micro-batch, so all three legs broadcast the delta and
touch only matching base partitions; the full-recompute alternative
re-shuffles both complete tables every refresh. Companion to
operators/window_agg.merge_counts (incremental aggregate maintenance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_delta(old_a: DataFrame, delta_a: DataFrame,
               old_b: DataFrame, delta_b: DataFrame,
               on: list[str]) -> DataFrame:
    """The exact increment dV of the inner-join view for append-only
    deltas. Broadcasts the delta legs — a refresh's cost is proportional
    to the delta, not the base."""
    return (
        F.broadcast(delta_a).join(old_b, on=on)
        .unionByName(old_a.join(F.broadcast(delta_b), on=on))
        .unionByName(F.broadcast(delta_a).join(F.broadcast(delta_b), on=on))
    )


def refresh(view: DataFrame, old_a: DataFrame, delta_a: DataFrame,
            old_b: DataFrame, delta_b: DataFrame,
            on: list[str]) -> DataFrame:
    """V ∪ dV — the maintained view after one incremental refresh."""
    return view.unionByName(join_delta(old_a, delta_a, old_b, delta_b, on))

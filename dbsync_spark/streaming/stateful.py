"""Custom stateful streaming operator: incremental per-key LWW state.

`lww_updates` keeps (last_id, operation, payload-JSON) per key in Spark's
streaming state store via applyInPandasWithState and emits one row per key
per micro-batch when its current version changed — a push-based change
feed of the applied table, vs. the snapshot MERGE in pipeline.py. This is
the reference's per-key worker state (sync/StateManger.scala) recast as
managed streaming state: checkpointed, partitioned by key hash, no queues.

Out-of-order safety mirrors merge_snapshot: an event with id <= last_id is
ignored; deletes park a tombstone in state rather than dropping it.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "last_id LONG, operation STRING, payload STRING"


def _output_schema(key_field: str) -> str:
    return f"{key_field} LONG, last_id LONG, operation STRING, payload STRING"


EVICTED = "_EVICTED"


def _make_lww_fn(ttl_ms: int | None):
    def _lww_fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if ttl_ms is not None and state.hasTimedOut:
            # idle key: emit an eviction marker and drop the state — the
            # reference's retention of per-key bookkeeping (O8) applied to
            # streaming state
            last_id, op, payload = state.get
            state.remove()
            yield pd.DataFrame({
                "key": [key[0]], "last_id": [last_id],
                "operation": [EVICTED], "payload": [payload],
            })
            return
        if state.exists:
            last_id, op, payload = state.get
        else:
            last_id, op, payload = -1, None, None
        changed = False
        for pdf in pdfs:
            pdf = pdf.sort_values("id")
            for _, row in pdf.iterrows():
                if row["id"] > last_id:
                    last_id, op, payload = (int(row["id"]), row["operation"],
                                            row["data"])
                    changed = True
        if changed:
            state.update((last_id, op, payload))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame({
                "key": [key[0]], "last_id": [last_id],
                "operation": [op], "payload": [payload],
            })
        elif ttl_ms is not None and state.exists:
            state.setTimeoutDuration(ttl_ms)

    return _lww_fn


def lww_updates(stream: DataFrame, key_col: str,
                ttl_ms: int | None = None) -> DataFrame:
    """Change feed of per-key current versions over a sync_data-shaped
    stream. Output: (key, last_id, operation, payload) — operation 'D'
    rows are live tombstones. With `ttl_ms`, keys idle past the TTL emit a
    final '_EVICTED' row and their state is dropped (bounded state at
    scale)."""
    keyed = stream.selectExpr(f"CAST({key_col} AS LONG) AS key",
                              "id", "operation", "data")
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms is not None
               else GroupStateTimeout.NoTimeout)
    return keyed.groupBy("key").applyInPandasWithState(
        _make_lww_fn(ttl_ms),
        outputStructType=_output_schema("key"),
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )

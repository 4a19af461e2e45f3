"""Per-key change audit via transformWithStateInPandas (Spark 4 arbitrary
stateful API).

Companion to streaming/stateful.py (applyInPandasWithState): same
change-stream domain, the newer API — typed value state, explicit state
variables, RocksDB-backed. The operator keeps a per-key audit record
(change count, last applied id, last operation) over a sync_data-shaped
stream: the streaming form of the reference's per-row status bookkeeping
(sync_data_status, dbopt/PgOperation.scala:310-323), keyed by row rather
than by log entry.

Requires the RocksDB state store provider (bundled with Spark 4):
  spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
and the Python `protobuf` package (the transformWithState state-server
protocol is protobuf-framed). The test suite skips itself when protobuf
is absent; applyInPandasWithState (streaming/stateful.py) is the
dependency-free stateful path in such environments.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

try:
    from pyspark.sql.streaming import (StatefulProcessor,
                                       StatefulProcessorHandle)
    _import_ok = True
except ImportError:  # pragma: no cover - environment-dependent
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = object  # type: ignore[assignment,misc]
    _import_ok = False


def _has_protobuf() -> bool:
    # the transformWithState *runtime* worker speaks a protobuf-framed
    # protocol; the class imports fine without it, so probe explicitly
    try:
        import importlib.util

        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


HAS_TRANSFORM_WITH_STATE = _import_ok and _has_protobuf()

ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider")

AUDIT_OUTPUT_SCHEMA = ("key LONG, n_changes LONG, last_id LONG, "
                       "last_op STRING")


class ChangeAuditProcessor(StatefulProcessor):
    """State: (n_changes, last_id, last_op) per key; emits the updated
    audit row for every key touched in a micro-batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "audit", "n_changes LONG, last_id LONG, last_op STRING")

    def handleInputRows(self, key, rows, timerValues):
        n_changes, last_id, last_op = 0, -1, None
        if self._state.exists():
            n_changes, last_id, last_op = self._state.get()
        for pdf in rows:
            n_changes += len(pdf)
            top = pdf.loc[pdf["id"].idxmax()]
            if int(top["id"]) > last_id:
                last_id, last_op = int(top["id"]), top["operation"]
        self._state.update((n_changes, last_id, last_op))
        yield pd.DataFrame({
            "key": [key[0]], "n_changes": [n_changes],
            "last_id": [last_id], "last_op": [last_op],
        })

    def close(self) -> None:
        pass


def change_audit(stream: DataFrame, key_col: str) -> DataFrame:
    """Audit feed of (key, n_changes, last_id, last_op) over a
    sync_data-shaped stream."""
    keyed = stream.selectExpr(f"CAST({key_col} AS LONG) AS key",
                              "id", "operation")
    return keyed.groupBy("key").transformWithStateInPandas(
        statefulProcessor=ChangeAuditProcessor(),
        outputStructType=AUDIT_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

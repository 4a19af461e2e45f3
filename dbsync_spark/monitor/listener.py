"""StreamingQueryListener -> heartbeat registry bridge (M1).

The reference's components heartbeat a ComponentManager
(sync/ComponentManager.scala:47-65); on Spark the equivalent signal is the
streaming engine's own progress events. Every micro-batch progress
heartbeats the query's registry entry, so the GREEN/YELLOW/RED evaluation
(monitor/health.py) works unchanged for streaming queries.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener

from dbsync_spark.monitor.health import ComponentRegistry


class HeartbeatListener(StreamingQueryListener):
    def __init__(self, registry: ComponentRegistry, interval_ms: float = 60000):
        self.registry = registry
        self.interval_ms = interval_ms

    def _name(self, event) -> str:
        name = getattr(event.progress, "name", None) if hasattr(event, "progress") else None
        return f"query:{name or event.id}"

    def onQueryStarted(self, event):  # noqa: N802
        self.registry.register(f"query:{event.name or event.id}", self.interval_ms)

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        name = f"query:{p.name or p.id}"
        if name not in self.registry.intervals:
            self.registry.register(name, self.interval_ms)
        self.registry.heartbeat(name)
        # last-batch operational stats for /status/sys (listener events
        # are delivered async; the registry just keeps the latest)
        try:
            self.registry.record_progress(name, {
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "triggerMs": dict(p.durationMs or {}).get(
                    "triggerExecution"),
                "timestamp": p.timestamp,
            })
        except Exception:  # noqa: BLE001 - stats are best-effort; a
            pass           # malformed event must not kill the listener bus

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        pass

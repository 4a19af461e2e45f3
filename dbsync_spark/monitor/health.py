"""Monitoring: heartbeat health, threshold rules, alert actions, endpoints.

Reference semantics:
- M1 heartbeat eval (sync/ComponentManager.scala:47-65): component status
  by missed-interval ratio — GREEN < 2x, YELLOW < 5x, RED >= 5x.
- M2 threshold rules (monitor/SelfMonitor.scala:45-105): heartbeatLostOver,
  syncBlockedOver, syncErrorOver, syncPendingOver -> action. NOTE the
  reference compares the *blocked* count in its error/pending rules
  (SelfMonitor.scala:92,98) — a reference bug; we compare the matching
  counts (the documented intent).
- M3 actions (monitor/{Email,Webhook,Restart}ActionHandler.scala): alert
  dispatch; here email/webhook are injectable callables (no SMTP/HTTP in
  this environment) and restart stops/restarts streaming queries.
- M4 endpoints (monitor/Endpoints.scala:27-96): status snapshots as dicts,
  servable by any HTTP layer.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

GREEN, YELLOW, RED = "GREEN", "YELLOW", "RED"


def heartbeat_status(last_beat_ms: float, interval_ms: float,
                     now_ms: float | None = None) -> str:
    """GREEN/YELLOW/RED by (now - last) / interval thresholds (<2 / <5 / >=5)."""
    now_ms = time.time() * 1000 if now_ms is None else now_ms
    missed = (now_ms - last_beat_ms) / interval_ms
    if missed < 2:
        return GREEN
    if missed < 5:
        return YELLOW
    return RED


@dataclass
class ComponentRegistry:
    """Heartbeat registry (the reference's ComponentManager), plus the
    last micro-batch progress per streaming query (batch id, input rows,
    trigger duration) — the operational numbers an operator reads off
    /status/sys to see whether a pipeline is keeping up."""

    intervals: dict[str, float] = field(default_factory=dict)
    last_beats: dict[str, float] = field(default_factory=dict)
    progress: dict[str, dict] = field(default_factory=dict)

    def register(self, name: str, interval_ms: float) -> None:
        # beat BEFORE interval: statuses() iterates intervals and looks
        # up last_beats — the insertion order guarantees any name a
        # reader can see already has a beat (writers: listener thread)
        self.last_beats[name] = time.time() * 1000
        self.intervals[name] = interval_ms

    def heartbeat(self, name: str) -> None:
        self.last_beats[name] = time.time() * 1000

    def record_progress(self, name: str, info: dict) -> None:
        self.progress[name] = info

    def statuses(self, now_ms: float | None = None) -> dict[str, str]:
        # snapshot both dicts: the listener-bus thread register()s new
        # queries while the monitor tick / HTTP threads iterate here —
        # iterating the live dict raises "changed size during iteration"
        # (same race endpoint_payloads already guards for `progress`)
        intervals = dict(self.intervals)
        beats = dict(self.last_beats)
        return {
            name: heartbeat_status(beats.get(name, 0.0), iv, now_ms)
            for name, iv in intervals.items()
        }


@dataclass
class SyncState:
    """Global pending/blocked/error/success counts (A1 fold,
    monitor/SelfMonitor.scala:53-66)."""

    pending: int = 0
    blocked: int = 0
    error: int = 0
    success: int = 0
    others: int = 0

    @classmethod
    def from_status_counts(cls, rows) -> SyncState:
        m = {"PENDING": "pending", "BLK": "blocked", "ERR": "error", "OK": "success"}
        state = cls()
        for r in rows:
            setattr(state, m.get(r["status"], "others"),
                    getattr(state, m.get(r["status"], "others")) + r["cnt"])
        return state


def evaluate_rules(rules, sync_state: SyncState,
                   component_statuses: dict[str, str]) -> list[tuple]:
    """Returns [(rule, reason)] for every tripped rule. Error/pending rules
    compare their own counts — not the reference's copy-paste of the
    blocked count (SelfMonitor.scala:92,98)."""
    lost = sum(1 for s in component_statuses.values() if s == RED)
    tripped = []
    for r in rules:
        if r.heartbeatLostOver is not None and lost > r.heartbeatLostOver:
            tripped.append((r, f"heartbeat lost {lost} > {r.heartbeatLostOver}"))
        if r.syncBlockedOver is not None and sync_state.blocked > r.syncBlockedOver:
            tripped.append((r, f"blocked {sync_state.blocked} > {r.syncBlockedOver}"))
        if r.syncErrorOver is not None and sync_state.error > r.syncErrorOver:
            tripped.append((r, f"error {sync_state.error} > {r.syncErrorOver}"))
        if r.syncPendingOver is not None and sync_state.pending > r.syncPendingOver:
            tripped.append((r, f"pending {sync_state.pending} > {r.syncPendingOver}"))
    return tripped


class ActionDispatcher:
    """Pluggable alert actions (ServiceLoader pattern -> plain registry)."""

    def __init__(self, email=None, webhook=None, restart=None):
        self.handlers = {}
        if email:
            self.handlers["email"] = email
        if webhook:
            self.handlers["webhook"] = webhook
        if restart:
            self.handlers["restart"] = restart
        self.dispatched: list[tuple[str, str]] = []
        self.failures: list[tuple[str, str]] = []

    def dispatch(self, rule, reason: str) -> None:
        self.dispatched.append((rule.action, reason))
        handler = self.handlers.get(rule.action)
        if handler:
            try:
                handler(reason, **rule.params)
            except Exception as e:  # noqa: BLE001 - an alert action failing
                # (SMTP down, webhook 500) must never kill the monitor loop
                self.failures.append((rule.action, str(e)))


def status_endpoints(sync_state: SyncState, registry: ComponentRegistry,
                     queries=(), config=None) -> dict[str, dict]:
    """The M4 GET payloads — all 5 read routes of the reference
    (monitor/Endpoints.scala:27-96): /status/sync, /status/component,
    /status/sys, /status/datasource, /config. The two action routes
    (/control/restart, /config/reload) live in app.serve_endpoints."""
    payloads = {
        "/status/sync": vars(sync_state).copy(),
        "/status/component": dict(sorted(registry.statuses().items())),
        "/status/sys": {
            "queries": [getattr(q, "name", str(q)) for q in queries],
            "ts": time.time(),
        },
    }
    if config is not None:
        payloads["/config"] = config_payload(config)
        payloads["/status/datasource"] = datasource_payload(config)
    return payloads


def config_payload(config) -> dict:
    """The /config snapshot (Endpoints.scala:81-91): sys + db + sync,
    with db passwords scrubbed before serialization."""
    return {
        "sys": vars(config.sys).copy(),
        "db": [{k: v for k, v in vars(d).items() if k != "password"}
               for d in config.dbs],
        "sync": [vars(r).copy() for r in config.syncs],
    }


def datasource_payload(config) -> dict:
    """The /status/datasource snapshot (Endpoints.scala:52-74): per-db
    pool config + live counters from this process's pool registry (pools
    on executors are per-worker and not visible here — the driver-side
    registry covers the control-plane connections, and the counter
    vocabulary matches the reference's Druid fields)."""
    from dbsync_spark.sinks.pool import pool_stats

    live = pool_stats()
    out = {}
    for d in config.dbs:
        s = live.get(d.name) or {
            "maxActive": d.maxPoolSize, "activeCount": 0,
            "errorCount": 0, "poolingCount": 0, "waitCount": 0,
        }
        out[d.name] = {
            "name": d.name, "url": d.url, "user": d.user,
            "maxActive": s["maxActive"], "activeCount": s["activeCount"],
            "errorCount": s["errorCount"],
            "poolingCount": s["poolingCount"], "waitCount": s["waitCount"],
        }
    return dict(sorted(out.items()))


def webhook_action(reason: str, url: str, timeout: float = 5.0,
                   **params) -> None:
    """Default webhook handler: POST a JSON alert body (the reference's
    WebhookActionHandler.scala:11-34 — HTTP POST of the alert payload)."""
    import json
    import urllib.request

    body = json.dumps({"reason": reason, **params}).encode()
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"})
    urllib.request.urlopen(req, timeout=timeout).read()


def email_action(reason: str, smtp_host: str = "localhost",
                 smtp_port: int = 25, sender: str = "dbsync@localhost",
                 to: str = "ops@localhost", subject: str = "dbsync alert",
                 timeout: float = 10.0, **params) -> None:
    """Default SMTP handler (EmailActionHandler.scala:11-56). The connect
    timeout bounds the monitor tick: a blackholed port 25 must not stall
    the driver loop for the kernel TCP timeout."""
    import smtplib
    from email.message import EmailMessage

    msg = EmailMessage()
    msg["From"], msg["To"], msg["Subject"] = sender, to, subject
    msg.set_content(reason)
    with smtplib.SMTP(smtp_host, smtp_port, timeout=timeout) as s:
        s.send_message(msg)


def restart_action_for(app) -> "callable":
    """Default restart handler: reload the app with its current config
    (RestartActionHandler.scala:9-19 — in-process relaunch; reload==restart
    per Endpoints.scala:75-95)."""
    def _restart(reason: str, **params) -> None:
        app.reload(app.config)
    return _restart

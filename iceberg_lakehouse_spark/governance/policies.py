"""Retention, maintenance, SLA, notifications (SURVEY G8-G11,
reference retention.py / maintenance.py / sla.py / notifications.py)."""

from __future__ import annotations

import time
from datetime import datetime, timezone

from ..catalog import LakeTable
from .stores import JsonStore


class RetentionManager:
    """G10: {max_snapshot_age_hours, max_snapshot_count,
    min_snapshots_to_keep≥1}; evaluate → expire; dry-run."""

    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {})

    def set_policy(
        self,
        table: str,
        max_snapshot_age_hours: float | None = None,
        max_snapshot_count: int | None = None,
        min_snapshots_to_keep: int = 1,
    ) -> dict:
        if min_snapshots_to_keep < 1:
            raise ValueError("min_snapshots_to_keep must be >= 1")
        data = self.store.load()
        data[table] = {
            "max_snapshot_age_hours": max_snapshot_age_hours,
            "max_snapshot_count": max_snapshot_count,
            "min_snapshots_to_keep": min_snapshots_to_keep,
        }
        self.store.save(data)
        return data[table]

    def get_policy(self, table: str) -> dict | None:
        return self.store.load().get(table)

    def list_policies(self) -> dict:
        return self.store.load()

    def apply(self, table: LakeTable, dry_run: bool = False) -> dict:
        name = f"{table.namespace}.{table.table}"
        pol = self.get_policy(name) or self.get_policy(table.table)
        if not pol:
            return {"table": name, "applied": False, "reason": "no policy"}
        retain_count = None
        if pol.get("max_snapshot_count"):
            retain_count = max(pol["max_snapshot_count"], pol["min_snapshots_to_keep"])
        older_ms = None
        if pol.get("max_snapshot_age_hours") is not None:
            older_ms = int(
                (time.time() - pol["max_snapshot_age_hours"] * 3600) * 1000
            )
        res = table.expire_snapshots(
            older_than_ms=older_ms,
            retain_last=retain_count or pol["min_snapshots_to_keep"],
            dry_run=dry_run,
        )
        return {"table": name, "applied": not dry_run, **res}


class MaintenanceManager:
    """G11: {auto_compact_threshold=10, auto_expire_retain_last=5,
    auto_cleanup_orphans}; check-needed; run with dry-run."""

    DEFAULTS = {
        "auto_compact_threshold": 10,
        "auto_expire_retain_last": 5,
        "auto_cleanup_orphans": True,
    }

    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {})

    def set_policy(self, table: str, **kwargs) -> dict:
        unknown = set(kwargs) - set(self.DEFAULTS)
        if unknown:
            raise ValueError(f"unknown policy keys: {sorted(unknown)}")
        data = self.store.load()
        data[table] = {**self.DEFAULTS, **kwargs}
        self.store.save(data)
        return data[table]

    def get_policy(self, table: str) -> dict:
        return self.store.load().get(table, dict(self.DEFAULTS))

    def check_needed(self, table: LakeTable) -> dict:
        name = f"{table.namespace}.{table.table}"
        pol = self.get_policy(name)
        fs = table.file_stats()
        return {
            "table": name,
            "compact_needed": fs["file_count"] >= pol["auto_compact_threshold"],
            "expire_needed": fs["snapshot_count"] > pol["auto_expire_retain_last"],
            "orphan_cleanup_needed": fs["orphan_count"] > 0,
            "stats": fs,
        }

    def run(self, table: LakeTable, dry_run: bool = False) -> dict:
        name = f"{table.namespace}.{table.table}"
        pol = self.get_policy(name)
        needed = self.check_needed(table)
        actions = []
        if needed["compact_needed"]:
            if not dry_run:
                res = table.compact()
                actions.append({"action": "compact", **res})
            else:
                actions.append({"action": "compact", "dry_run": True})
        if needed["expire_needed"]:
            if not dry_run:
                res = table.expire_snapshots(retain_last=pol["auto_expire_retain_last"])
                actions.append({"action": "expire", **res})
            else:
                actions.append({"action": "expire", "dry_run": True})
        if pol["auto_cleanup_orphans"]:
            orphans = table.cleanup_orphans(dry_run=dry_run)
            if orphans:
                actions.append({"action": "cleanup_orphans", "removed": len(orphans)})
        return {"table": name, "actions": actions}


class SlaManager:
    """G8: thresholds {max_staleness_hours, min_quality_score,
    min_row_count, max_null_pct}; check vs live stats; history ≤ 50."""

    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {"policies": {}, "history": {}})

    def set_sla(self, table: str, **thresholds) -> dict:
        allowed = {
            "max_staleness_hours",
            "min_quality_score",
            "min_row_count",
            "max_null_pct",
        }
        unknown = set(thresholds) - allowed
        if unknown:
            raise ValueError(f"unknown thresholds: {sorted(unknown)}")
        data = self.store.load()
        data["policies"][table] = thresholds
        self.store.save(data)
        return thresholds

    def check(self, table: LakeTable, stats: dict, quality: dict | None = None) -> dict:
        name = f"{table.namespace}.{table.table}"
        data = self.store.load()
        pol = data["policies"].get(name, {})
        violations = []
        if "min_row_count" in pol and stats["row_count"] < pol["min_row_count"]:
            violations.append(
                f"row_count {stats['row_count']} < {pol['min_row_count']}"
            )
        if "max_null_pct" in pol:
            worst = max(
                (c["null_pct"] for c in stats["columns"].values()), default=0.0
            )
            if worst > pol["max_null_pct"]:
                violations.append(f"null_pct {worst} > {pol['max_null_pct']}")
        if "max_staleness_hours" in pol:
            cur = table.current_snapshot()
            if cur:
                age_h = (time.time() * 1000 - cur.timestamp_ms) / 3.6e6
                if age_h > pol["max_staleness_hours"]:
                    violations.append(
                        f"staleness {age_h:.1f}h > {pol['max_staleness_hours']}h"
                    )
        if "min_quality_score" in pol and quality:
            if quality["score"] < pol["min_quality_score"]:
                violations.append(
                    f"quality {quality['score']} < {pol['min_quality_score']}"
                )
        result = {
            "table": name,
            "ok": not violations,
            "violations": violations,
            "checked_at": datetime.now(timezone.utc).isoformat(),
        }
        hist = data["history"].setdefault(name, [])
        hist.append(result)
        data["history"][name] = hist[-50:]
        self.store.save(data)
        return result

    def history(self, table: str) -> list[dict]:
        return self.store.load()["history"].get(table, [])


class NotificationManager:
    """G9: handlers per (table, event); fire_event appends to history
    (log handler) — webhook-style handlers record the payload."""

    EVENTS = {"insert", "update", "delete", "quality_drop", "sla_violation", "any"}

    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {"handlers": [], "history": []})

    def add_handler(self, table: str, event: str, kind: str = "log", target: str | None = None) -> dict:
        if event not in self.EVENTS:
            raise ValueError(f"unknown event {event!r}")
        data = self.store.load()
        h = {"table": table, "event": event, "kind": kind, "target": target}
        data["handlers"].append(h)
        self.store.save(data)
        return h

    def list_handlers(self, table: str | None = None) -> list[dict]:
        handlers = self.store.load()["handlers"]
        return [h for h in handlers if table is None or h["table"] == table]

    def remove_handler(self, table: str, event: str) -> int:
        data = self.store.load()
        before = len(data["handlers"])
        data["handlers"] = [
            h for h in data["handlers"]
            if not (h["table"] == table and h["event"] == event)
        ]
        self.store.save(data)
        return before - len(data["handlers"])

    def fire_event(self, table: str, event: str, payload: dict | None = None) -> list[dict]:
        data = self.store.load()
        fired = []
        for h in data["handlers"]:
            if h["table"] in (table, "*") and h["event"] in (event, "any"):
                entry = {
                    "table": table,
                    "event": event,
                    "handler": h["kind"],
                    "target": h.get("target"),
                    "payload": payload or {},
                    "at": datetime.now(timezone.utc).isoformat(),
                }
                data["history"].append(entry)
                fired.append(entry)
        data["history"] = data["history"][-1000:]
        self.store.save(data)
        return fired

    def history(self, table: str | None = None, limit: int = 100) -> list[dict]:
        hist = self.store.load()["history"]
        if table:
            hist = [h for h in hist if h["table"] == table]
        return list(reversed(hist[-limit:]))

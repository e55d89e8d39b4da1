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
    """G9 (reference notifications.py:13-263): typed handlers keyed by
    a 12-hex handler_id; fire_event EXECUTES each matching handler
    best-effort (log append / shell subprocess / webhook POST) and
    appends a history entry with per-handler results."""

    VALID_EVENT_TYPES = {
        "write", "schema_change", "sla_violation", "maintenance",
        "contract_violation", "all",
    }
    VALID_HANDLER_TYPES = {"webhook", "shell", "log"}
    MAX_HISTORY = 1000

    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {"handlers": {}, "history": []})

    @staticmethod
    def _normalize(name: str) -> str:
        if name == "*":
            return name
        return name if "." in name else f"default.{name}"

    def add_handler(
        self, table: str, event_type: str, handler_type: str = "log",
        config: dict | None = None,
    ) -> dict:
        if not table or not table.strip():
            raise ValueError("Table name cannot be empty")
        table = self._normalize(table)
        if event_type not in self.VALID_EVENT_TYPES:
            raise ValueError(
                f"Invalid event type '{event_type}'. Must be one of: "
                f"{sorted(self.VALID_EVENT_TYPES)}"
            )
        if handler_type not in self.VALID_HANDLER_TYPES:
            raise ValueError(
                f"Invalid handler type '{handler_type}'. Must be one of: "
                f"{sorted(self.VALID_HANDLER_TYPES)}"
            )
        config = config or {}
        if handler_type == "webhook" and "url" not in config:
            raise ValueError("Webhook handler requires 'url' in config")
        if handler_type == "shell" and "command" not in config:
            raise ValueError("Shell handler requires 'command' in config")
        if handler_type == "log" and "file" not in config:
            raise ValueError("Log handler requires 'file' in config")
        import uuid

        data = self.store.load()
        handler_id = uuid.uuid4().hex[:12]
        data["handlers"][handler_id] = {
            "table": table,
            "event_type": event_type,
            "handler_type": handler_type,
            "config": config,
            "created_at": datetime.now(timezone.utc).isoformat(),
        }
        self.store.save(data)
        return {
            "handler_id": handler_id,
            "table": table,
            "event_type": event_type,
            "handler_type": handler_type,
            "message": f"Registered {handler_type} handler for '{table}' "
                       f"on {event_type} events",
        }

    def list_handlers(self, table: str | None = None) -> list[dict]:
        handlers = self.store.load()["handlers"]
        out = [{"handler_id": hid, **h} for hid, h in handlers.items()]
        if table is not None:
            t = self._normalize(table)
            out = [h for h in out if h["table"] == t]
        return out

    def remove_handler(self, handler_id: str) -> dict:
        data = self.store.load()
        if handler_id not in data["handlers"]:
            return {
                "handler_id": handler_id,
                "message": f"No handler found with ID '{handler_id}'",
            }
        del data["handlers"][handler_id]
        self.store.save(data)
        return {
            "handler_id": handler_id,
            "message": f"Removed handler '{handler_id}'",
        }

    def remove_matching(self, table: str, event_type: str) -> int:
        """Remove every handler registered for (table, event_type);
        returns removed count (server/CLI convenience)."""
        t = self._normalize(table)
        data = self.store.load()
        doomed = [
            hid
            for hid, h in data["handlers"].items()
            if h["table"] == t and h["event_type"] == event_type
        ]
        for hid in doomed:
            del data["handlers"][hid]
        self.store.save(data)
        return len(doomed)

    def _execute_handler(
        self, handler: dict, table: str, event_type: str, payload: dict
    ) -> dict:
        """Best-effort execution: errors are returned, never raised
        (reference notifications.py:168-232)."""
        import json as _json

        handler_type = handler["handler_type"]
        config = handler["config"]
        event_data = _json.dumps(
            {
                "table": table,
                "event_type": event_type,
                "timestamp": datetime.now(timezone.utc).isoformat(),
                "payload": payload,
            },
            default=str,
        )
        try:
            if handler_type == "webhook":
                import urllib.request

                req = urllib.request.Request(
                    config["url"],
                    data=event_data.encode("utf-8"),
                    headers={"Content-Type": "application/json"},
                    method=config.get("method", "POST"),
                )
                try:
                    with urllib.request.urlopen(req, timeout=5) as resp:
                        return {"status": "success", "http_status": resp.status}
                except Exception as e:  # noqa: BLE001
                    return {"status": "error", "error": str(e)}
            elif handler_type == "shell":
                import subprocess

                result = subprocess.run(
                    config["command"], shell=True, capture_output=True,
                    text=True, timeout=10,
                    env={"LAKEHOUSE_EVENT": event_data},
                )
                return {
                    "status": "success" if result.returncode == 0 else "error",
                    "returncode": result.returncode,
                    "stdout": result.stdout[:500],
                    "stderr": result.stderr[:500],
                }
            elif handler_type == "log":
                import os

                log_file = config["file"]
                parent = os.path.dirname(log_file)
                if parent:
                    os.makedirs(parent, exist_ok=True)
                with open(log_file, "a", encoding="utf-8") as f:
                    f.write(event_data + "\n")
                return {"status": "success", "file": log_file}
        except Exception as e:  # noqa: BLE001
            return {"status": "error", "error": str(e)}
        return {"status": "error", "error": f"Unknown handler type: {handler_type}"}

    def fire_event(self, table: str, event_type: str, payload: dict | None = None) -> dict:
        table = self._normalize(table)
        payload = payload or {}
        data = self.store.load()
        results = []
        for hid, h in data["handlers"].items():
            table_match = h["table"] in (table, "default.*", "*")
            event_match = h["event_type"] in (event_type, "all")
            if table_match and event_match:
                result = self._execute_handler(h, table, event_type, payload)
                results.append({"handler_id": hid, **result})
        entry = {
            "table": table,
            "event_type": event_type,
            "fired_at": datetime.now(timezone.utc).isoformat(),
            "handlers_triggered": len(results),
            "results": results,
        }
        data["history"].append(entry)
        data["history"] = data["history"][-self.MAX_HISTORY:]
        self.store.save(data)
        return {
            **entry,
            "message": f"Fired '{event_type}' event for '{table}': "
                       f"{len(results)} handlers triggered",
        }

    def history(
        self, table: str | None = None, limit: int = 50,
        event_type: str | None = None,
    ) -> list[dict]:
        hist = self.store.load()["history"]
        if table:
            t = self._normalize(table)
            hist = [h for h in hist if h["table"] == t]
        if event_type:
            hist = [h for h in hist if h["event_type"] == event_type]
        return list(reversed(hist[-limit:]))

    def send_test_event(self, handler_id: str) -> dict:
        data = self.store.load()
        if handler_id not in data["handlers"]:
            return {
                "handler_id": handler_id,
                "message": f"No handler found with ID '{handler_id}'",
            }
        handler = data["handlers"][handler_id]
        result = self._execute_handler(
            handler, handler["table"], "test",
            {"test": True, "message": "This is a test event from the lakehouse"},
        )
        return {
            "handler_id": handler_id,
            "handler_type": handler["handler_type"],
            "result": result,
            "message": f"Test event sent to handler '{handler_id}': "
                       f"{result['status']}",
        }

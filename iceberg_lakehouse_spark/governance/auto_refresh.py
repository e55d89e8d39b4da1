"""Auto-refresh cascade (SURVEY I9, reference auto_refresh.py:34-286).

Per-table config {enabled, cascade_depth≤3, refresh_matviews,
rerun_pipelines, invalidate_cache}; plan = BFS over downstream lineage
→ ordered actions by depth; execute best-effort; history ring ≤ 100.
"""

from __future__ import annotations

from datetime import datetime, timezone

from .lineage import LineageManager
from .stores import JsonStore

MAX_DEPTH = 3
HISTORY_CAP = 100


class AutoRefreshManager:
    def __init__(
        self,
        store_path: str,
        lineage: LineageManager,
        matviews=None,
        pipelines=None,
        query_cache=None,
    ):
        self.store = JsonStore(store_path, {"config": {}, "history": []})
        self.lineage = lineage
        self.matviews = matviews
        self.pipelines = pipelines
        self.query_cache = query_cache

    @staticmethod
    def _normalize(name: str) -> str:
        return name if "." in name else f"default.{name}"

    def configure(
        self,
        table: str,
        enabled: bool = True,
        cascade_depth: int = MAX_DEPTH,
        refresh_matviews: bool = True,
        rerun_pipelines: bool = False,
        invalidate_cache: bool = True,
    ) -> dict:
        if cascade_depth > MAX_DEPTH:
            raise ValueError(f"cascade_depth > {MAX_DEPTH}")
        table = self._normalize(table)
        data = self.store.load()
        data["config"][table] = {
            "enabled": enabled,
            "cascade_depth": cascade_depth,
            "refresh_matviews": refresh_matviews,
            "rerun_pipelines": rerun_pipelines,
            "invalidate_cache": invalidate_cache,
        }
        self.store.save(data)
        return {"table": table, **data["config"][table]}

    def get_config(self, table: str) -> dict:
        """{'enabled': False} for an unconfigured table (reference
        get_auto_refresh semantics)."""
        table = self._normalize(table)
        cfg = self.store.load()["config"].get(table)
        if cfg is None:
            return {"table": table, "enabled": False}
        return {"table": table, **cfg}

    def list_configs(self) -> list[dict]:
        return [
            {"table": t, **cfg}
            for t, cfg in self.store.load()["config"].items()
        ]

    def remove_config(self, table: str) -> dict:
        table = self._normalize(table)
        data = self.store.load()
        if table in data["config"]:
            del data["config"][table]
            self.store.save(data)
            return {"table": table,
                    "message": f"Auto-refresh removed for '{table}'"}
        return {"table": table,
                "message": f"No auto-refresh configured for '{table}'"}

    def plan(self, table: str) -> dict:
        """BFS downstream lineage → {downstream_count, actions} ordered
        by depth (reference auto_refresh.py:123-189)."""
        table = self._normalize(table)
        cfg = self.store.load()["config"].get(table)
        if not cfg or not cfg["enabled"]:
            return {"table": table, "downstream_count": 0, "actions": []}
        actions: list[dict] = []
        if cfg["invalidate_cache"]:
            actions.append({"action": "invalidate_cache", "table": table, "depth": 0})
        downstream = self.lineage.downstream(table, max_depth=cfg["cascade_depth"])
        for node in downstream:
            target, via, depth = node["table"], node["via"], node["depth"]
            if via == "matview" and cfg["refresh_matviews"]:
                mv = target.split("mv_", 1)[-1] if "mv_" in target else target
                actions.append({"action": "refresh_matview", "matview": mv, "depth": depth})
            elif via.startswith("pipeline:") and cfg["rerun_pipelines"]:
                actions.append(
                    {"action": "rerun_pipeline", "pipeline": via.split(":", 1)[1], "depth": depth}
                )
            if cfg["invalidate_cache"]:
                actions.append({"action": "invalidate_cache", "table": target, "depth": depth})
        return {
            "table": table,
            "downstream_count": len(downstream),
            "actions": sorted(actions, key=lambda a: a["depth"]),
        }

    def execute(self, table: str) -> dict:
        """Best-effort execution; each action's error recorded, never
        raised (reference auto_refresh.py:231-270)."""
        table = self._normalize(table)
        results = []
        for action in self.plan(table)["actions"]:
            entry = dict(action)
            try:
                if action["action"] == "invalidate_cache" and self.query_cache:
                    entry["invalidated"] = self.query_cache.invalidate_table(
                        action["table"]
                    )
                elif action["action"] == "refresh_matview" and self.matviews:
                    mv = self.matviews.store.load().get(action["matview"], {})
                    if mv.get("kind") == "aggregate":
                        # changelog-delta refresh: O(changed data), the
                        # point of declaring the matview as an aggregate
                        rep = self.matviews.refresh_incremental(
                            action["matview"])
                        entry["mode"] = rep["mode"]
                    else:
                        self.matviews.refresh(action["matview"])
                    entry["refreshed"] = True
                elif action["action"] == "rerun_pipeline" and self.pipelines:
                    entry["run"] = self.pipelines.run(action["pipeline"])["status"]
                else:
                    entry["skipped"] = True
                entry["status"] = "success"
                entry["ok"] = True
            except Exception as e:  # noqa: BLE001
                entry["status"] = "error"
                entry["ok"] = False
                entry["error"] = str(e)
            results.append(entry)
        data = self.store.load()
        record = {
            "table": table,
            "at": datetime.now(timezone.utc).isoformat(),
            "actions_executed": len(results),
            "actions": results,
        }
        data["history"].append(record)
        data["history"] = data["history"][-HISTORY_CAP:]
        self.store.save(data)
        return record

    def history(self, limit: int = 20, table: str | None = None) -> list[dict]:
        hist = self.store.load()["history"]
        if table:
            t = self._normalize(table)
            hist = [h for h in hist if h["table"] == t]
        return list(reversed(hist[-limit:]))

"""Saved queries + query history + query cache (SURVEY G19/G20,
reference queries.py:31-222, query_cache.py:65-277)."""

from __future__ import annotations

import hashlib
import re
import time
from datetime import datetime, timezone

from .stores import JsonStore

MAX_HISTORY_ENTRIES = 1000  # reference queries.py:10
HISTORY_CAP = MAX_HISTORY_ENTRIES  # back-compat alias
CACHE_CAP = 100
DEFAULT_TTL_S = 300


def normalize_sql(sql: str) -> str:
    """Cache key normalization (reference query_cache.py:21-30):
    uppercase + whitespace-collapse + trailing-semicolon strip."""
    return re.sub(r"\s+", " ", sql.strip()).rstrip(";").strip().upper()


def cache_key(sql: str) -> str:
    return hashlib.sha256(normalize_sql(sql).encode()).hexdigest()[:16]


class SavedQueries:
    """Reference queries.py:31-222 contract: saved-query CRUD with
    reference messages/raises, history entries with rows_returned /
    duration_ms / executed_at, MAX_HISTORY_ENTRIES cap, newest-first
    reads. ``overwrite`` is a documented repo superset (the reference
    requires delete-then-recreate)."""

    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {"saved": {}, "history": []})

    def save(
        self,
        name: str,
        sql: str,
        description: str = "",
        overwrite: bool = False,
    ) -> dict:
        if not name or not name.strip():
            raise ValueError("Query name must not be empty")
        if not sql or not sql.strip():
            raise ValueError("SQL query must not be empty")
        data = self.store.load()
        if name in data["saved"] and not overwrite:
            raise ValueError(
                f"Query '{name}' already exists. Delete it first to replace."
            )
        data["saved"][name] = {
            "sql": sql,
            "description": description or "",
            "created_at": datetime.now(timezone.utc).isoformat(),
        }
        self.store.save(data)
        return {
            "name": name,
            "sql": sql,
            "description": description or "",
            "message": f"Saved query '{name}'",
        }

    def get(self, name: str) -> dict:
        saved = self.store.load()["saved"]
        if name not in saved:
            raise ValueError(f"Saved query '{name}' not found")
        entry = saved[name]
        return {
            "name": name,
            "sql": entry["sql"],
            "description": entry.get("description", ""),
            "created_at": entry.get("created_at", ""),
        }

    def list(self) -> list[dict]:
        return [
            {
                "name": name,
                "sql": entry["sql"],
                "description": entry.get("description", ""),
                "created_at": entry.get("created_at", ""),
            }
            for name, entry in self.store.load()["saved"].items()
        ]

    def delete(self, name: str) -> dict:
        data = self.store.load()
        if name not in data["saved"]:
            raise ValueError(f"Saved query '{name}' not found")
        del data["saved"][name]
        self.store.save(data)
        return {"name": name, "message": f"Deleted saved query '{name}'"}

    def add_history(
        self, sql: str, rows_returned: int = 0, duration_ms: int = 0
    ) -> None:
        data = self.store.load()
        data["history"].append(
            {
                "sql": sql,
                "executed_at": datetime.now(timezone.utc).isoformat(),
                "rows_returned": rows_returned,
                "duration_ms": duration_ms,
            }
        )
        data["history"] = data["history"][-MAX_HISTORY_ENTRIES:]
        self.store.save(data)

    def record_history(self, sql: str, duration_s: float, rows: int) -> None:
        """Engine-facing adapter (plans/engine.py reports seconds)."""
        self.add_history(sql, rows_returned=rows, duration_ms=int(duration_s * 1000))

    def history(self, limit: int = 20) -> list[dict]:
        return list(reversed(self.store.load()["history"][-limit:]))

    def clear_history(self) -> dict:
        data = self.store.load()
        n = len(data["history"])
        data["history"] = []
        self.store.save(data)
        return {"cleared": n, "message": f"Cleared {n} history entries"}


class QueryCache:
    """Collected-result cache with TTL + per-table policy + table-based
    invalidation. Results are row dicts (they were collected anyway at
    the API edge — caching DataFrames would cache nothing)."""

    def __init__(self, store_path: str, ttl_s: int = DEFAULT_TTL_S):
        self.store = JsonStore(store_path, {"entries": {}, "policy": {}, "stats": {"hits": 0, "misses": 0}})
        self.ttl_s = ttl_s
        self._results: dict[str, list[dict]] = {}

    def enabled_for(self, tables: list[str]) -> bool:
        policy = self.store.load()["policy"]
        return all(policy.get(t, True) for t in tables)

    def set_policy(self, table: str, enabled: bool) -> None:
        data = self.store.load()
        data["policy"][table] = enabled
        self.store.save(data)

    def get(self, sql: str) -> list[dict] | None:
        key = cache_key(sql)
        data = self.store.load()
        meta = data["entries"].get(key)
        hit = (
            meta is not None
            and key in self._results
            and time.time() - meta["cached_at"] <= meta["ttl_s"]
        )
        data["stats"]["hits" if hit else "misses"] += 1
        if hit:
            meta["hit_count"] = meta.get("hit_count", 0) + 1
        self.store.save(data)
        return self._results[key] if hit else None

    def put(self, sql: str, rows: list[dict], tables: list[str]) -> None:
        key = cache_key(sql)
        data = self.store.load()
        data["entries"][key] = {
            "sql": sql,
            "tables": tables,
            "cached_at": time.time(),
            "ttl_s": self.ttl_s,
            "rows": len(rows),
            "hit_count": 0,
        }
        # oldest-eviction beyond cap (reference query_cache.py:96-101)
        if len(data["entries"]) > CACHE_CAP:
            oldest = sorted(data["entries"], key=lambda k: data["entries"][k]["cached_at"])
            for k in oldest[: len(data["entries"]) - CACHE_CAP]:
                data["entries"].pop(k)
                self._results.pop(k, None)
        self.store.save(data)
        self._results[key] = rows

    def invalidate_table(self, table: str) -> int:
        data = self.store.load()
        doomed = [k for k, e in data["entries"].items() if table in e.get("tables", [])]
        for k in doomed:
            data["entries"].pop(k)
            self._results.pop(k, None)
        self.store.save(data)
        return len(doomed)

    def invalidate_all(self) -> int:
        data = self.store.load()
        n = len(data["entries"])
        data["entries"] = {}
        self.store.save(data)
        self._results.clear()
        return n

    def stats(self) -> dict:
        data = self.store.load()
        hits = data["stats"]["hits"]
        misses = data["stats"]["misses"]
        total = hits + misses
        return {
            **data["stats"],
            "hit_rate": round(100.0 * hits / total, 2) if total else 0.0,
            "entries": len(data["entries"]),
            "total_entries": len(data["entries"]),
        }

    def list(self, limit: int = 20) -> list[dict]:
        """Cached entries, most recent first, with sql + hit_count
        (reference list_cached_queries)."""
        data = self.store.load()
        entries = sorted(
            data["entries"].values(),
            key=lambda e: e["cached_at"],
            reverse=True,
        )
        return [
            {
                "sql": e["sql"],
                "tables": e.get("tables", []),
                "rows": e.get("rows", 0),
                "hit_count": e.get("hit_count", 0),
                "cached_at": e["cached_at"],
            }
            for e in entries[:limit]
        ]

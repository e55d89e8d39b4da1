"""Lineage graph (SURVEY G4, reference lineage.py:36-306): edges
sources→target with op+sql, deduped by (sources, target); BFS
upstream/downstream with visited set + depth; per-edge removal;
impact analysis. Bare table names normalize to the ``default``
namespace exactly like the catalog does (catalog.py:289)."""

from __future__ import annotations

from collections import deque
from datetime import datetime, timezone

from .stores import JsonStore


def _normalize(name: str) -> str:
    return name if "." in name else f"default.{name}"


class LineageManager:
    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {"edges": []})

    def record(
        self, sources: list[str], target: str, operation: str = "manual",
        sql: str | None = None,
    ) -> dict:
        """Record (or update) the edge sources→target. The dedupe key is
        (sources, target) — re-recording with a different operation
        UPDATES the existing edge (reference lineage.py:66-81), it does
        not create a parallel edge."""
        if not sources:
            raise ValueError("sources must not be empty")
        if not target or not target.strip():
            raise ValueError("target must not be empty")
        norm_sources = sorted({_normalize(s) for s in sources if s.strip()})
        if not norm_sources:
            raise ValueError("sources must contain at least one non-empty name")
        norm_target = _normalize(target)
        now = datetime.now(timezone.utc).isoformat()
        data = self.store.load()
        for e in data["edges"]:
            if sorted(e["sources"]) == norm_sources and e["target"] == norm_target:
                e.update(operation=operation, sql=sql, recorded_at=now)
                self.store.save(data)
                return {
                    **e,
                    "message": f"Updated lineage: {norm_sources} -> {norm_target}",
                }
        edge = {
            "sources": norm_sources,
            "target": norm_target,
            "operation": operation,
            "sql": sql,
            "recorded_at": now,
        }
        data["edges"].append(edge)
        self.store.save(data)
        return {
            **edge,
            "message": f"Recorded lineage: {norm_sources} -> {norm_target}",
        }

    def edges(self) -> list[dict]:
        return self.store.load()["edges"]

    def remove(self, source: str, target: str) -> dict:
        """Remove edge(s) where ``source`` is among the sources AND the
        target matches (reference lineage.py:234-259). Returns
        {removed, message}."""
        src, tgt = _normalize(source), _normalize(target)
        data = self.store.load()
        before = len(data["edges"])
        data["edges"] = [
            e
            for e in data["edges"]
            if not (src in e["sources"] and e["target"] == tgt)
        ]
        removed = before - len(data["edges"])
        self.store.save(data)
        if removed == 0:
            return {
                "removed": 0,
                "message": f"No lineage edge found from {src} to {tgt}",
            }
        return {
            "removed": removed,
            "message": f"Removed {removed} lineage edge(s) from {src} to {tgt}",
        }

    def remove_table(self, table: str) -> int:
        """Drop every edge that touches ``table`` (as target or source);
        used when a table is dropped from the catalog. Returns
        removed-edge count."""
        t = _normalize(table)
        data = self.store.load()
        before = len(data["edges"])
        data["edges"] = [
            e for e in data["edges"] if e["target"] != t and t not in e["sources"]
        ]
        self.store.save(data)
        return before - len(data["edges"])

    def upstream(
        self, table: str, max_depth: int = 10, transitive: bool = True
    ) -> list[dict]:
        return self._walk(
            table, direction="up", max_depth=max_depth if transitive else 1
        )

    def downstream(
        self, table: str, max_depth: int = 10, transitive: bool = True
    ) -> list[dict]:
        return self._walk(
            table, direction="down", max_depth=max_depth if transitive else 1
        )

    def _walk(self, start: str, direction: str, max_depth: int) -> list[dict]:
        edges = self.edges()
        start = _normalize(start)
        out, visited = [], {start}
        frontier = deque([(start, 0)])
        while frontier:
            node, depth = frontier.popleft()
            if depth >= max_depth:
                continue
            for e in edges:
                if direction == "up" and e["target"] == node:
                    nxt = [s for s in e["sources"] if s not in visited]
                    for s in nxt:
                        visited.add(s)
                        out.append({"table": s, "depth": depth + 1, "via": e["operation"]})
                        frontier.append((s, depth + 1))
                elif direction == "down" and node in e["sources"]:
                    if e["target"] not in visited:
                        visited.add(e["target"])
                        out.append(
                            {"table": e["target"], "depth": depth + 1, "via": e["operation"]}
                        )
                        frontier.append((e["target"], depth + 1))
        return out

    def impact(self, table: str) -> dict:
        """Downstream blast radius of dropping/modifying ``table``
        (reference lineage.py:262-290)."""
        t = _normalize(table)
        down = self.downstream(t)
        affected = [d["table"] for d in down]
        return {
            "table": t,
            "affected_tables": affected,
            "affected_count": len(affected),
            "details": down,
            "message": (
                f"Dropping {t} would affect {len(affected)} table(s)"
                if affected
                else f"No downstream dependencies for {t}"
            ),
        }

    def graph(self) -> dict:
        nodes: set[str] = set()
        edges = self.edges()
        for e in edges:
            nodes.update(e["sources"])
            nodes.add(e["target"])
        return {
            "nodes": sorted(nodes),
            "edges": edges,
            "node_count": len(nodes),
            "edge_count": len(edges),
        }


def extract_tables(sql: str, known_tables: list[str]) -> list[str]:
    """Reference heuristic (joins.py:165-180, matviews.py:35-51): a known
    table participates if its name appears as a word in the SQL."""
    import re

    found = []
    for t in known_tables:
        short = t.split(".", 1)[-1]
        if re.search(rf"\b{re.escape(short)}\b", sql):
            found.append(t)
    return found

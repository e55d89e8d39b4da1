"""Lineage graph (SURVEY G4, reference lineage.py:36-286): edges
sources→target with op+sql, deduped; BFS upstream/downstream with
visited set + depth; impact analysis."""

from __future__ import annotations

from collections import deque
from datetime import datetime, timezone

from .stores import JsonStore


class LineageManager:
    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {"edges": []})

    def record(
        self, sources: list[str], target: str, operation: str, sql: str | None = None
    ) -> dict:
        data = self.store.load()
        for e in data["edges"]:
            if e["sources"] == sorted(sources) and e["target"] == target and e["operation"] == operation:
                e["last_seen"] = datetime.now(timezone.utc).isoformat()
                e["sql"] = sql
                self.store.save(data)
                return e
        edge = {
            "sources": sorted(sources),
            "target": target,
            "operation": operation,
            "sql": sql,
            "created": datetime.now(timezone.utc).isoformat(),
            "last_seen": datetime.now(timezone.utc).isoformat(),
        }
        data["edges"].append(edge)
        self.store.save(data)
        return edge

    def edges(self) -> list[dict]:
        return self.store.load()["edges"]

    def remove(self, table: str) -> int:
        """Drop every edge that touches ``table`` (as target or source);
        other tables' edges are preserved. Returns removed-edge count
        (reference lineage remove-node semantics)."""
        data = self.store.load()
        before = len(data["edges"])
        data["edges"] = [
            e
            for e in data["edges"]
            if e["target"] != table and table not in e["sources"]
        ]
        self.store.save(data)
        return before - len(data["edges"])

    def upstream(self, table: str, max_depth: int = 10) -> list[dict]:
        return self._walk(table, direction="up", max_depth=max_depth)

    def downstream(self, table: str, max_depth: int = 10) -> list[dict]:
        return self._walk(table, direction="down", max_depth=max_depth)

    def _walk(self, start: str, direction: str, max_depth: int) -> list[dict]:
        edges = self.edges()
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
        down = self.downstream(table)
        return {
            "table": table,
            "impacted": [d["table"] for d in down],
            "count": len(down),
        }

    def graph(self) -> dict:
        nodes: set[str] = set()
        for e in self.edges():
            nodes.update(e["sources"])
            nodes.add(e["target"])
        return {"nodes": sorted(nodes), "edges": self.edges()}


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

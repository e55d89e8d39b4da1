"""Optimizer advisor + cost estimation + dashboard (SURVEY G21, A12,
G17; reference optimizer.py, dashboard.py).

Heuristic advice over our own query-history and stats stores (the
reference never rewrites plans — Catalyst does real optimization; this
module advises humans)."""

from __future__ import annotations

import re
from collections import Counter

_TABLE_RE = re.compile(r"\b(?:from|join)\s+([a-zA-Z_][\w.]*)", re.IGNORECASE)
_FILTER_RE = re.compile(r"\bwhere\b(.*?)(?:\bgroup\b|\border\b|\blimit\b|$)",
                        re.IGNORECASE | re.DOTALL)
_COL_RE = re.compile(r"([a-zA-Z_]\w*)\s*(?:=|>|<|>=|<=|like|in)\s", re.IGNORECASE)


def extract_query_tables(sql: str) -> list[str]:
    return sorted({m.lower() for m in _TABLE_RE.findall(sql)})


def extract_filter_columns(sql: str) -> list[str]:
    m = _FILTER_RE.search(sql)
    if not m:
        return []
    return sorted({c.lower() for c in _COL_RE.findall(m.group(1))})


def estimate_cost(sql: str, table_stats: dict[str, dict]) -> dict:
    """A12 (reference optimizer.py:261-317): est. scan = Σ rows ×
    (0.3 if filtered); complexity from has_join/has_agg."""
    tables = extract_query_tables(sql)
    has_filter = bool(_FILTER_RE.search(sql))
    scanned = 0
    for t in tables:
        rows = table_stats.get(t, {}).get("row_count", 0)
        scanned += int(rows * (0.3 if has_filter else 1.0))
    has_join = bool(re.search(r"\bjoin\b", sql, re.IGNORECASE))
    has_agg = bool(re.search(r"\b(group\s+by|sum|count|avg|min|max)\b", sql, re.IGNORECASE))
    complexity = "high" if (has_join and has_agg) else "medium" if (has_join or has_agg) else "low"
    return {
        "tables": tables,
        "estimated_rows_scanned": scanned,
        "complexity": complexity,
        "has_filter": has_filter,
    }


def analyze_patterns(history: list[dict], slow_factor_p: float = 0.9) -> dict:
    """G21 pattern analysis: frequent tables/filters, p90-slow queries,
    repeated queries (reference optimizer.py:49-130)."""
    tables = Counter()
    filters = Counter()
    sql_counts = Counter()
    durations = []
    for h in history:
        sql = h.get("sql", "")
        sql_counts[re.sub(r"\s+", " ", sql.strip()).upper()] += 1
        tables.update(extract_query_tables(sql))
        filters.update(extract_filter_columns(sql))
        if h.get("duration_s") is not None:
            durations.append((h["duration_s"], sql))
    durations.sort()
    p90 = durations[int(len(durations) * slow_factor_p)][0] if durations else 0.0
    slow = [sql for d, sql in durations if durations and d >= p90 and d > 0]
    return {
        "frequent_tables": tables.most_common(10),
        "frequent_filter_columns": filters.most_common(10),
        "slow_threshold_s": p90,
        "slow_queries": slow[-10:],
        "repeated_queries": [s for s, c in sql_counts.items() if c >= 2],
    }


def suggest_partitioning(history: list[dict], table_stats: dict[str, dict]) -> list[dict]:
    """G21: suggest partitioning on frequently-filtered columns with
    2 ≤ distinct ≤ 1000; benefit ∝ distinct/rows (optimizer.py:183-193)."""
    patterns = analyze_patterns(history)
    out = []
    for col, uses in patterns["frequent_filter_columns"]:
        for tname, stats in table_stats.items():
            cstats = stats.get("columns", {}).get(col)
            if not cstats:
                continue
            d, n = cstats.get("distinct", 0), stats.get("row_count", 0)
            if 2 <= d <= 1000 and n:
                out.append(
                    {
                        "table": tname,
                        "column": col,
                        "distinct_values": d,
                        "benefit": round(1.0 - d / n, 4),
                        "filter_uses": uses,
                    }
                )
    return sorted(out, key=lambda s: (-s["filter_uses"], -s["benefit"]))


def suggest_matviews(history: list[dict]) -> list[dict]:
    """G21: repeated (≥2) queries containing join or aggregation."""
    patterns = analyze_patterns(history)
    out = []
    for sql in patterns["repeated_queries"]:
        if re.search(r"\b(JOIN|GROUP BY|SUM|COUNT|AVG)\b", sql):
            out.append({"sql": sql, "reason": "repeated aggregate/join query"})
    return out


def optimization_report(history: list[dict], table_stats: dict[str, dict]) -> dict:
    """G21 report: score 100 − 10·issues (optimizer.py:232-258)."""
    part = suggest_partitioning(history, table_stats)
    mv = suggest_matviews(history)
    patterns = analyze_patterns(history)
    issues = len(part) + len(mv) + len(patterns["slow_queries"])
    return {
        "score": max(0, 100 - 10 * issues),
        "partition_suggestions": part,
        "matview_suggestions": mv,
        "patterns": patterns,
    }


def dashboard(catalog, stats_cache, compact_threshold: int = 10) -> dict:
    """G17 (reference dashboard.py:36-148): all tables with rows/size/
    health + counts."""
    tables = []
    for name in catalog.list_tables():
        t = catalog.load_table(name)
        fs = t.file_stats()
        health = "Good"
        if fs["orphan_count"]:
            health = "Orphans"
        elif fs["file_count"] >= compact_threshold:
            health = "Needs compaction"
        cached = stats_cache.peek(name) if stats_cache else None
        tables.append(
            {
                "table": name,
                "rows": cached.get("row_count") if cached else None,
                "files": fs["file_count"],
                "bytes": fs["total_bytes"],
                "snapshots": fs["snapshot_count"],
                "health": health,
            }
        )
    return {
        "tables": tables,
        "table_count": len(tables),
        "total_bytes": sum(t["bytes"] for t in tables),
        "unhealthy": [t["table"] for t in tables if t["health"] != "Good"],
    }

"""Optimizer advisor + cost estimation + dashboard (SURVEY G21, A12,
G17; reference optimizer.py, dashboard.py).

Heuristic advice over our own query-history and stats stores (the
reference never rewrites plans — Catalyst does real optimization; this
module advises humans)."""

from __future__ import annotations

import re
from collections import Counter

_TABLE_RE = re.compile(r"\b(?:from|join)\s+([a-zA-Z_][\w.]*)", re.IGNORECASE)
_FILTER_RE = re.compile(r"\bwhere\b(.*?)(?:\bgroup\b|\border\b|\blimit\b|\bhaving\b|$)",
                        re.IGNORECASE | re.DOTALL)
_COL_RE = re.compile(
    r"([a-zA-Z_][\w.]*)\s*(?:>=|<=|!=|<>|=|>|<|\blike\b|\bin\b|\bis\b)\s",
    re.IGNORECASE)
_NON_COLUMN_WORDS = {"and", "or", "not", "null", "true", "false"}


def _duration_s(entry: dict) -> float:
    """History entries store duration_ms (reference queries.py:157-185);
    accept legacy duration_s too."""
    if entry.get("duration_ms") is not None:
        return entry["duration_ms"] / 1000.0
    return entry.get("duration_s") or 0.0


def extract_query_tables(sql: str) -> list[str]:
    return sorted({m.lower() for m in _TABLE_RE.findall(sql)})


def extract_filter_columns(sql: str) -> list[str]:
    m = _FILTER_RE.search(sql)
    if not m:
        return []
    return sorted({c.lower() for c in _COL_RE.findall(m.group(1))
                   if c.lower() not in _NON_COLUMN_WORDS})


def has_aggregation(sql: str) -> bool:
    return bool(re.search(r"\b(sum|avg|count|min|max|group\s+by)\b", sql, re.IGNORECASE))


def has_join(sql: str) -> bool:
    return bool(re.search(r"\bjoin\b", sql, re.IGNORECASE))


def estimate_cost(sql: str, table_stats: dict[str, dict]) -> dict:
    """A12 (reference optimizer.py:261-317): est. scan = Σ rows ×
    (0.3 if filtered); complexity simple/moderate/complex from
    has_join × has_aggregation."""
    tables = extract_query_tables(sql)
    has_filter = bool(extract_filter_columns(sql))
    total_rows = 0
    details = []
    for t in tables:
        # SQL names are usually short; the stats store is keyed by the
        # qualified name — try both so the estimate is never silently 0
        stats = table_stats.get(t) or table_stats.get(f"default.{t}", {})
        rows = stats.get("row_count", 0)
        total_rows += rows
        details.append(
            {
                "table": t,
                "estimated_rows": rows,
                # compute_table_stats emits 'total_bytes'
                "size_bytes": stats.get(
                    "total_bytes", stats.get("total_size_bytes", 0)
                ),
            }
        )
    scanned = int(total_rows * 0.3) if has_filter else total_rows
    join_f, agg_f = has_join(sql), has_aggregation(sql)
    complexity = "complex" if (join_f and agg_f) else "moderate" if (join_f or agg_f) else "simple"
    return {
        "sql": sql,
        "tables_involved": details,
        "estimated_rows_scanned": scanned,
        "total_source_rows": total_rows,
        "has_filter": has_filter,
        "has_join": join_f,
        "has_aggregation": agg_f,
        "complexity": complexity,
        "message": f"Query cost estimate: ~{scanned:,} rows scanned across "
                   f"{len(tables)} table(s) ({complexity})",
    }


def analyze_patterns(history: list[dict], slow_factor_p: float = 0.9) -> dict:
    """G21 pattern analysis: frequent tables/filters, p90-slow queries,
    repeated queries (reference optimizer.py:49-130)."""
    if not history:
        return {
            "total_queries": 0,
            "frequent_tables": [],
            "frequent_filters": [],
            "slow_queries": [],
            "repeated_queries": [],
            "message": "No query history available",
        }
    tables = Counter()
    filters = Counter()
    sql_counts = Counter()
    durations = []
    for h in history:
        sql = h.get("sql", "")
        sql_counts[re.sub(r"\s+", " ", sql.strip()).rstrip(";").upper()] += 1
        tables.update(extract_query_tables(sql))
        filters.update(extract_filter_columns(sql))
        durations.append(_duration_s(h))
    sorted_d = sorted(durations)
    p90_idx = int(len(sorted_d) * slow_factor_p)
    p90 = sorted_d[min(p90_idx, len(sorted_d) - 1)]
    slow = [
        {"sql": h.get("sql", ""), "duration_s": _duration_s(h),
         "rows": h.get("rows_returned", h.get("rows", 0))}
        for h in history
        if _duration_s(h) > p90 and p90 > 0
    ][:10]
    repeated = [
        {"sql_pattern": s, "count": c}
        for s, c in sql_counts.most_common(10)
        if c > 1
    ]
    return {
        "total_queries": len(history),
        "frequent_tables": [{"table": t, "count": c} for t, c in tables.most_common(10)],
        "frequent_filters": [{"column": f, "count": c} for f, c in filters.most_common(10)],
        "slow_threshold_s": p90,
        "slow_queries": slow,
        "repeated_queries": repeated,
        "message": f"Analyzed {len(history)} queries: {len(tables)} tables, "
                   f"{len(repeated)} repeated patterns",
    }


def suggest_partitioning(history: list[dict], table_stats: dict[str, dict],
                         current_partition_fields: dict[str, list[str]] | None = None) -> list[dict]:
    """G21: suggest partitioning on frequently-filtered columns with
    2 ≤ distinct ≤ 1000; benefit high/medium/low by distinct/rows ratio
    (reference optimizer.py:133-196). Columns a table already partitions
    on are skipped."""
    patterns = analyze_patterns(history)
    current = current_partition_fields or {}
    out = []
    for fc in patterns["frequent_filters"]:
        col, uses = fc["column"], fc["count"]
        for tname, stats in table_stats.items():
            if col in current.get(tname, []):
                continue
            cstats = stats.get("columns", {}).get(col)
            if not cstats:
                continue
            d, n = cstats.get("distinct", 0), stats.get("row_count", 0)
            if 2 <= d <= 1000 and n:
                ratio = d / n
                benefit = "high" if ratio < 0.1 else "medium" if ratio < 0.5 else "low"
                out.append(
                    {
                        "table": tname,
                        "column": col,
                        "unique_values": d,
                        "filter_frequency": uses,
                        "benefit": benefit,
                        "rationale": f"Column '{col}' is filtered {uses} times with "
                                     f"{d} unique values ({benefit} partition benefit)",
                    }
                )
    rank = {"high": 0, "medium": 1, "low": 2}
    return sorted(out, key=lambda s: (-s["filter_frequency"], rank[s["benefit"]]))


def suggest_matviews(history: list[dict]) -> list[dict]:
    """G21: repeated (≥2) queries containing join or aggregation
    (reference optimizer.py:199-229)."""
    patterns = analyze_patterns(history)
    out = []
    for rq in patterns["repeated_queries"]:
        sql, count = rq["sql_pattern"], rq["count"]
        if count >= 2 and (has_aggregation(sql) or has_join(sql)):
            kind = "aggregation" if has_aggregation(sql) else "join"
            out.append(
                {
                    "sql": sql,
                    "run_count": count,
                    "has_aggregation": has_aggregation(sql),
                    "has_join": has_join(sql),
                    "tables_involved": extract_query_tables(sql),
                    "rationale": f"Query run {count} times with {kind} — "
                                 "good materialization candidate",
                }
            )
    return out


def optimization_report(history: list[dict], table_stats: dict[str, dict]) -> dict:
    """G21 report: score 100 − 10·issues, floor 0
    (reference optimizer.py:232-258)."""
    part = suggest_partitioning(history, table_stats)
    mv = suggest_matviews(history)
    patterns = analyze_patterns(history)
    issues = len(part) + len(mv) + len(patterns["slow_queries"])
    score = max(0, 100 - 10 * issues)
    return {
        "query_patterns": patterns,
        "partition_suggestions": part,
        "materialization_suggestions": mv,
        "slow_queries": patterns["slow_queries"],
        "optimization_score": score,
        "total_suggestions": len(part) + len(mv),
        "message": f"Optimization report: score {score}/100, {len(part)} partition "
                   f"and {len(mv)} materialization suggestions",
    }


def format_size(n: int) -> str:
    """Reference dashboard._format_size: B / KB / MB / GB / TB with one
    decimal above bytes."""
    if n < 1024:
        return f"{n} B"
    for unit in ("KB", "MB", "GB", "TB"):
        n /= 1024
        if n < 1024 or unit == "TB":
            return f"{n:.1f} {unit}"
    return f"{n:.1f} TB"


def table_health(file_count: int, orphan_count: int, stale: bool,
                 compact_threshold: int = 10) -> str:
    """Reference dashboard._table_health priority:
    Stale > Orphans > Compact > Good."""
    if stale:
        return "Stale"
    if orphan_count > 0:
        return "Orphans"
    if file_count >= compact_threshold:
        return "Compact"
    return "Good"


def dashboard(catalog, stats_cache, audit=None, saved=None,
              compact_threshold: int = 10) -> dict:
    """G17 (reference dashboard.py:36-148): storage summary, all tables
    with rows/size/files/health, recent audit activity, saved-query and
    history counts."""
    tables = []
    for name in catalog.list_tables():
        t = catalog.load_table(name)
        fs = t.file_stats()
        cached = stats_cache.peek(name) if stats_cache else None
        stale = stats_cache.is_stale(t) if (stats_cache and cached) else False
        tables.append(
            {
                "name": name,
                "rows": cached.get("row_count") if cached else None,
                "data_files": fs["file_count"],
                "size_bytes": fs["total_bytes"],
                "size_display": format_size(fs["total_bytes"]),
                "snapshots": fs["snapshot_count"],
                "health": table_health(
                    fs["file_count"], fs["orphan_count"], stale,
                    compact_threshold,
                ),
            }
        )
    total_bytes = sum(t["size_bytes"] for t in tables)
    return {
        "storage_path": getattr(catalog, "warehouse", None),
        "namespaces": sorted(catalog.list_namespaces()),
        "total_tables": len(tables),
        "total_size_bytes": total_bytes,
        "total_size_display": format_size(total_bytes),
        "tables": tables,
        "recent_activity": audit.query(limit=10) if audit else [],
        "saved_queries_count": len(saved.list()) if saved else 0,
        "history_entries_count": len(saved.history(1000)) if saved else 0,
        "unhealthy": [t["name"] for t in tables if t["health"] != "Good"],
    }


# -- physical join planning advice (round 8, beyond-reference) --------------

BROADCAST_THRESHOLD_BYTES = 64 * 1024 * 1024  # AQE-era comfortable default


def join_strategy(
    catalog,
    left: str,
    right: str,
    on: list[str],
    broadcast_threshold: int = BROADCAST_THRESHOLD_BYTES,
) -> dict:
    """Recommend the physical join strategy for two catalog tables from
    persisted metadata alone (file sizes + the latest ANALYZE NDVs) —
    no data is read. The decision tree mirrors what a 1000-executor
    plan review applies by hand:

    * a side under the broadcast threshold → broadcast it (no shuffle
      of the big side at all);
    * both sides big → shuffle join; if the key NDV supports it,
      suggest bucketing both tables on the key so the shuffle
      disappears from every future join;
    * key NDV << row count on the probe side → flag skew (salting /
      AQE skew-join advice), because a hot key turns one task into the
      whole job's critical path.

    NDVs may be stale (ANALYZE is point-in-time); strategy advice
    degrades gracefully — staleness is reported, never fatal."""
    lt, rt = catalog.load_table(left), catalog.load_table(right)
    for side, t in (("left", lt), ("right", rt)):
        known = {f.name for f in t.schema().fields}
        missing = sorted(set(on) - known)
        if missing:
            raise ValueError(
                f"join column(s) {missing} not in {side} table {t.table!r}"
            )
    lb = lt.file_stats()["total_bytes"]
    rb = rt.file_stats()["total_bytes"]
    la, ra = lt.analyzed_stats(), rt.analyzed_stats()

    def _ndv(stats, col):
        if not stats:
            return None
        c = stats.get("columns", {}).get(col)
        return c.get("ndv") if c else None

    reasons: list[str] = []
    skew: list[dict] = []
    for side, stats, nbytes in (("left", la, lb), ("right", ra, rb)):
        if stats is None:
            reasons.append(f"{side} table has no ANALYZE stats "
                           "(run analyze_table for NDV-aware advice)")
            continue
        if stats.get("stale"):
            reasons.append(f"{side} ANALYZE stats are stale "
                           "(advice still directionally sound)")
        rows = stats.get("row_count") or 0
        for c in on:
            ndv = _ndv(stats, c)
            if ndv and rows and rows / max(ndv, 1) > 10_000:
                skew.append({
                    "side": side, "column": c, "rows": rows, "ndv": ndv,
                    "advice": "rows-per-key > 10k: salt the key or rely "
                              "on AQE skew-join splitting",
                })
    small, small_bytes = None, None
    if min(lb, rb) <= broadcast_threshold:
        small = "left" if lb <= rb else "right"
        small_bytes = min(lb, rb)
        strategy = "broadcast"
        reasons.insert(0, f"{small} side is {small_bytes:,} bytes "
                          f"(<= {broadcast_threshold:,}): broadcast it — "
                          "the big side never shuffles")
    else:
        strategy = "shuffle"
        reasons.insert(0, "both sides exceed the broadcast threshold: "
                          "shuffle join on the key")
        # bucketing advice needs the key to be high-cardinality on
        # BOTH sides — a degenerate right-side NDV (all rows one key)
        # makes bucketed files as skewed as the shuffle they replace,
        # so take the min across both tables' ANALYZE stats.
        ndvs = [
            n
            for c in on
            for n in (_ndv(la, c), _ndv(ra, c))
            if n
        ]
        if ndvs and min(ndvs) >= 32:
            reasons.append(
                "key NDV supports bucketing: bucket BOTH tables on "
                f"{on} (operators/bucketed.py) to eliminate this "
                "shuffle from every future join"
            )
    return {
        "left": left, "right": right, "on": on,
        "left_bytes": lb, "right_bytes": rb,
        "strategy": strategy,
        **({"broadcast_side": small} if small else {}),
        "skew_warnings": skew,
        "reasons": reasons,
    }

"""Table statistics + cache, quality scoring, anomaly detection
(SURVEY A1-A4, A9-A11, reference stats.py / quality.py).

Profiling is ONE aggregation pass per table — every per-column metric
(nulls, distinct, min/max/avg/stddev) partial-aggregates map-side, so
the 100 TB cost is a single scan, not the reference's
one-SQL-per-column loop.
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import LakeTable
from .stores import JsonStore

_NUMERIC = (T.LongType, T.IntegerType, T.DoubleType, T.FloatType, T.DecimalType)
_TEMPORAL = (T.DateType, T.TimestampType, T.TimestampNTZType)


def compute_table_stats(
    table: LakeTable,
    top_k: int = 10,
    columns: list[str] | None = None,
) -> dict:
    """A1-A4 + A11 shape (reference stats.py:29-150, profile.py): rows,
    files, sizes, snapshots + per-column stats. One single-pass
    aggregation carries counts/min/max/mean/std AND the p25/p50/p75
    percentiles (percentile_approx in the same job); string columns add
    a top_k value histogram (one bounded groupBy per string column,
    matching the reference profile). ``columns`` restricts profiling to
    the named columns."""
    df = table.scan()
    schema = df.schema
    wanted = [
        f for f in schema.fields if columns is None or f.name in columns
    ]
    aggs = [F.count("*").alias("__rows")]
    for f in wanted:
        c = f.name
        aggs.append((F.count("*") - F.count(c)).alias(f"{c}__nulls"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
        if isinstance(f.dataType, _NUMERIC):
            aggs += [
                F.min(c).alias(f"{c}__min"),
                F.max(c).alias(f"{c}__max"),
                F.avg(c).alias(f"{c}__avg"),
                F.stddev(c).alias(f"{c}__stddev"),
                F.percentile_approx(c, [0.25, 0.5, 0.75]).alias(f"{c}__pcts"),
            ]
        elif isinstance(f.dataType, _TEMPORAL):
            aggs += [
                F.min(c).cast("string").alias(f"{c}__min"),
                F.max(c).cast("string").alias(f"{c}__max"),
            ]
    row = df.agg(*aggs).collect()[0].asDict()
    n = row["__rows"]
    columns_out = {}
    for f in wanted:
        c = f.name
        col_stats = {
            "type": f.dataType.simpleString(),
            "nulls": row[f"{c}__nulls"],
            "distinct": row[f"{c}__distinct"],
            "unique": row[f"{c}__distinct"],
            "null_pct": round(100.0 * row[f"{c}__nulls"] / n, 4) if n else 0.0,
        }
        for suffix in ("min", "max", "avg", "stddev"):
            if f"{c}__{suffix}" in row:
                col_stats[suffix] = row[f"{c}__{suffix}"]
        if f"{c}__avg" in row:
            col_stats["mean"] = row[f"{c}__avg"]
            col_stats["std"] = row[f"{c}__stddev"]
        pcts = row.get(f"{c}__pcts")
        if pcts is not None:
            col_stats["p25"], col_stats["p50"], col_stats["p75"] = pcts
        from pyspark.sql.types import StringType

        if isinstance(f.dataType, StringType) and n:
            col_stats["top_values"] = {
                r[c]: r["__cnt"]
                for r in df.where(F.col(c).isNotNull())
                .groupBy(c)
                .agg(F.count("*").alias("__cnt"))
                .orderBy(F.desc("__cnt"), c)
                .limit(top_k)
                .collect()
            }
        columns_out[c] = col_stats
    fs = table.file_stats()
    cur = table.current_snapshot()
    return {
        "table": f"{table.namespace}.{table.table}",
        "row_count": n,
        "snapshot_id": cur.snapshot_id if cur else None,
        "file_count": fs["file_count"],
        "total_bytes": fs["total_bytes"],
        "snapshot_count": fs["snapshot_count"],
        "columns": columns_out,
        "last_modified": (
            datetime.fromtimestamp(cur.timestamp_ms / 1000, timezone.utc).isoformat()
            if cur
            else None
        ),
        "computed_at": datetime.now(timezone.utc).isoformat(),
    }


class StatsCache:
    """A11: stats keyed by snapshot id; stale when the table moved
    (reference stats.py:211-237)."""

    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {})

    def get(self, table: LakeTable, refresh: bool = False) -> dict:
        name = f"{table.namespace}.{table.table}"
        data = self.store.load()
        cur = table.current_snapshot()
        cur_id = cur.snapshot_id if cur else None
        cached = data.get(name)
        if not refresh and cached and cached.get("snapshot_id") == cur_id:
            return {**cached, "cached": True}
        stats = compute_table_stats(table)
        data[name] = stats
        self.store.save(data)
        return {**stats, "cached": False}

    def seed(self, table: LakeTable, stats: dict) -> None:
        """Store already-computed stats as the table's cached baseline —
        callers that just ran compute_table_stats avoid a second full
        scan (quality report seeds with the stats it scored)."""
        data = self.store.load()
        data[f"{table.namespace}.{table.table}"] = stats
        self.store.save(data)

    def is_stale(self, table: LakeTable) -> bool:
        name = f"{table.namespace}.{table.table}"
        cached = self.store.load().get(name)
        if not cached:
            return True
        cur = table.current_snapshot()
        return cached.get("snapshot_id") != (cur.snapshot_id if cur else None)

    def peek(self, table_name: str) -> dict | None:
        return self.store.load().get(table_name)

    def refresh(self, tables: "list[LakeTable] | LakeTable") -> dict:
        """Recompute and cache stats for one or many tables (reference
        stats.py refresh_stats shape: count / tables_refreshed /
        duration_seconds / message)."""
        if isinstance(tables, LakeTable):
            tables = [tables]
        t0 = time.time()
        refreshed = []
        for t in tables:
            self.get(t, refresh=True)
            refreshed.append(f"{t.namespace}.{t.table}")
        dur = round(time.time() - t0, 3)
        return {
            "count": len(refreshed),
            "tables_refreshed": refreshed,
            "duration_seconds": dur,
            "message": f"Refreshed stats for {len(refreshed)} table(s) in {dur}s",
        }


def quality_score(stats: dict, rules_compliance: float = 100.0) -> dict:
    """A9 (reference quality.py:28-159): completeness 30% + uniqueness
    25% + freshness 20% + rule-compliance 25%; piecewise freshness
    decay (≤1h=100; ≤24h linear→50; →0 over 7d)."""
    cols = stats.get("columns", {})
    n = stats.get("row_count", 0)
    if cols and n:
        completeness = 100.0 - sum(c["null_pct"] for c in cols.values()) / len(cols)
        key_uniq = []
        for c in cols.values():
            if c["distinct"] and n:
                key_uniq.append(min(100.0, 100.0 * c["distinct"] / n))
        uniqueness = max(key_uniq) if key_uniq else 0.0
    else:
        completeness = uniqueness = 0.0

    # freshness decays from the DATA's last write (snapshot timestamp),
    # not from when stats were computed — live-scoring paths compute
    # stats on demand, so computed_at is always 'now' and would pin
    # freshness at 100 for a table last written years ago
    anchor = stats.get("last_modified") or stats.get("computed_at")
    age_h = 0.0
    if anchor:
        age_h = (
            datetime.now(timezone.utc)
            - datetime.fromisoformat(anchor)
        ).total_seconds() / 3600
    if age_h <= 1:
        freshness = 100.0
    elif age_h <= 24:
        freshness = 100.0 - (age_h - 1) / 23 * 50.0
    elif age_h <= 24 * 7:
        freshness = 50.0 - (age_h - 24) / (24 * 6) * 50.0
    else:
        freshness = 0.0

    score = (
        completeness * 0.30 + uniqueness * 0.25 + freshness * 0.20 + rules_compliance * 0.25
    )
    return {
        "score": round(score, 2),
        "completeness": round(completeness, 2),
        "uniqueness": round(uniqueness, 2),
        "freshness": round(freshness, 2),
        "rules_compliance": round(rules_compliance, 2),
    }


MAX_QUALITY_HISTORY = 50  # reference quality.py:9


class QualityMonitor:
    """Quality scoring with per-table history + cross-table report
    (reference quality.py:28-340: compute_quality_score /
    get_quality_history / get_quality_report).

    Rule compliance is computed from the table's validation rules with
    DataFrame aggregations (ValidationManager._check counts failing rows
    executor-side) — the reference collects every row to Python and
    re-validates dict-by-dict (quality.py:98-104), which cannot work at
    100 TB.
    """

    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {})

    def score(self, table: LakeTable, validation=None, stats: dict | None = None) -> dict:
        name = f"{table.namespace}.{table.table}"
        stats = stats or compute_table_stats(table)
        n = stats.get("row_count", 0)

        rules = validation.list_rules(name) if validation is not None else []
        if rules and n:
            violations = validation.validate(name, table.scan())
            # reference formula (quality.py:100-106): checks = rules×rows,
            # failures = failing row-checks; missing-column violations
            # (failed_rows == -1) fail the whole column's checks.
            total_checks = len(rules) * n
            failures = sum(
                n if v["failed_rows"] < 0 else v["failed_rows"] for v in violations
            )
            compliance = round(max(0.0, (total_checks - failures) / total_checks) * 100, 1)
        else:
            compliance = 100.0

        q = quality_score(stats, rules_compliance=compliance)

        recommendations = []
        if q["completeness"] < 80:
            null_cols = [
                c for c, info in stats.get("columns", {}).items()
                if n and info.get("nulls", 0) > n * 0.1
            ]
            if null_cols:
                recommendations.append(
                    "Add NOT NULL constraints to columns with many nulls: "
                    + ", ".join(null_cols[:3])
                )
        if q["uniqueness"] < 50:
            recommendations.append("Review columns for unexpected duplicates")
        if q["freshness"] < 50:
            recommendations.append("Table data may be stale — consider refreshing source data")
        if compliance < 80:
            recommendations.append("Review failing validation rules and fix data quality issues")

        entry = {
            "overall_score": q["score"],
            "completeness": q["completeness"],
            "uniqueness": q["uniqueness"],
            "freshness": q["freshness"],
            "rule_compliance": compliance,
            "row_count": n,
            "column_count": len(stats.get("columns", {})),
            "recommendations": recommendations,
            "computed_at": datetime.now(timezone.utc).isoformat(),
        }
        data = self.store.load()
        hist = data.setdefault(name, {"history": []})["history"]
        hist.append(entry)
        data[name]["history"] = hist[-MAX_QUALITY_HISTORY:]
        self.store.save(data)
        return {
            "table": name,
            **entry,
            "message": f"Quality score for {name!r}: {q['score']}/100",
        }

    def history(self, table_name: str) -> list[dict]:
        return self.store.load().get(table_name, {}).get("history", [])

    def report(self, catalog, table_name: str | None = None, validation=None,
               stats_cache: "StatsCache | None" = None) -> dict:
        """Score every table (or one), count anomalies vs the cached
        baseline (reference quality.py:276-329 shape)."""
        names = [table_name] if table_name else catalog.list_tables()
        tables_out, scores = [], []
        for name in names:
            try:
                t = catalog.load_table(name)
                old = stats_cache.peek(f"{t.namespace}.{t.table}") if stats_cache else None
                fresh = compute_table_stats(t)
                s = self.score(t, validation=validation, stats=fresh)
                anomalies = detect_anomalies(old, fresh) if old else []
                if stats_cache:
                    # seed with the stats already computed above — a
                    # get() here would rescan every stale table twice
                    stats_cache.seed(t, fresh)
                tables_out.append(
                    {
                        "table": s["table"],
                        "overall_score": s["overall_score"],
                        "completeness": s["completeness"],
                        "uniqueness": s["uniqueness"],
                        "freshness": s["freshness"],
                        "rule_compliance": s["rule_compliance"],
                        "anomalies": len(anomalies),
                        "anomaly_details": anomalies,
                        "recommendations": s["recommendations"],
                    }
                )
                scores.append(s["overall_score"])
            except Exception:
                tables_out.append(
                    {"table": name, "overall_score": None, "error": "Could not compute score"}
                )
        return {
            "tables": tables_out,
            "total_tables": len(names),
            "average_score": round(sum(scores) / len(scores), 1) if scores else 0,
        }


def detect_anomalies(old_stats: dict, new_stats: dict) -> list[dict]:
    """A10 (reference quality.py:162-273): row-count Δ>50% warn />90%
    critical; null-rate Δ>10pp warn />30pp critical; numeric min <
    0.5×old-min / max > 2×old-max."""
    anomalies = []
    old_n, new_n = old_stats.get("row_count", 0), new_stats.get("row_count", 0)
    if old_n:
        delta = abs(new_n - old_n) / old_n
        if delta > 0.5:
            anomalies.append(
                {
                    "type": "row_count_change",
                    "severity": "critical" if delta > 0.9 else "warning",
                    "detail": f"row count {old_n} → {new_n} ({delta:.0%})",
                }
            )
    for col, new_c in new_stats.get("columns", {}).items():
        old_c = old_stats.get("columns", {}).get(col)
        if not old_c:
            continue
        dn = new_c["null_pct"] - old_c["null_pct"]
        if dn > 10:
            anomalies.append(
                {
                    "type": "null_rate_increase",
                    "column": col,
                    "severity": "critical" if dn > 30 else "warning",
                    "detail": f"null% {old_c['null_pct']} → {new_c['null_pct']}",
                }
            )
        if (
            isinstance(old_c.get("min"), (int, float))
            and isinstance(new_c.get("min"), (int, float))
            and old_c["min"] > 0
            and new_c["min"] < 0.5 * old_c["min"]
        ):
            anomalies.append(
                {"type": "min_drop", "column": col, "severity": "warning",
                 "detail": f"min {old_c['min']} → {new_c['min']}"}
            )
        if (
            isinstance(old_c.get("max"), (int, float))
            and isinstance(new_c.get("max"), (int, float))
            and old_c["max"] > 0
            and new_c["max"] > 2 * old_c["max"]
        ):
            anomalies.append(
                {"type": "max_spike", "column": col, "severity": "warning",
                 "detail": f"max {old_c['max']} → {new_c['max']}"}
            )
    return anomalies

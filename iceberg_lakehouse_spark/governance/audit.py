"""Audit log (SURVEY G5, reference audit.py:13-183): NDJSON append of
{timestamp, table, operation, rows_affected, source, details}; filtered
query incl. `since`; clear with '30d'/'24h'/ISO cutoff returning
{cleared}; 10k-line cap oldest-first (reference MAX_AUDIT_ENTRIES)."""

from __future__ import annotations

import json
import os
import re
from datetime import datetime, timedelta, timezone
from typing import Any

MAX_LINES = 10_000
_DUR_RE = re.compile(r"^(\d+)([dhms])$")  # the grammar the tool help advertises


def _parse_cutoff(cutoff: str) -> datetime:
    m = _DUR_RE.match(cutoff.strip())
    now = datetime.now(timezone.utc)
    if m:
        n, unit = int(m.group(1)), m.group(2)
        delta = {"d": timedelta(days=n), "h": timedelta(hours=n),
                 "m": timedelta(minutes=n), "s": timedelta(seconds=n)}[unit]
        return now - delta
    dt = datetime.fromisoformat(cutoff)
    return dt if dt.tzinfo else dt.replace(tzinfo=timezone.utc)


class AuditLog:
    def __init__(self, path: str):
        self.path = path

    def record(
        self,
        table: str,
        operation: str,
        rows_affected: int = 0,
        source: str = "api",
        details: dict[str, Any] | None = None,
    ) -> dict:
        entry = {
            "timestamp": datetime.now(timezone.utc).isoformat(),
            "table": table,
            "operation": operation,
            "rows_affected": rows_affected,
            "source": source,
            "details": details or {},
        }
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(entry) + "\n")
        self._cap()
        return entry

    def _cap(self) -> None:
        lines = self._lines()
        if len(lines) > MAX_LINES:
            with open(self.path, "w") as f:
                f.writelines(lines[-MAX_LINES:])

    def _lines(self) -> list[str]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return f.readlines()

    def query(
        self,
        table: str | None = None,
        operation: str | None = None,
        limit: int = 100,
        since: str | None = None,
    ) -> list[dict]:
        since_dt = _parse_cutoff(since) if since else None
        out = []
        for line in reversed(self._lines()):
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            if table and e.get("table") != table:
                continue
            if operation and e.get("operation") != operation:
                continue
            if since_dt is not None:
                try:
                    ts = datetime.fromisoformat(e["timestamp"])
                except (KeyError, ValueError):
                    continue
                if ts.tzinfo is None:
                    ts = ts.replace(tzinfo=timezone.utc)
                if ts < since_dt:
                    continue
            out.append(e)
            if len(out) >= limit:
                break
        return out

    def clear(self, older_than: str | None = None) -> dict:
        lines = self._lines()
        if older_than is None:
            removed = len(lines)
            if os.path.exists(self.path):
                os.remove(self.path)
            return {"cleared": removed}
        cutoff = _parse_cutoff(older_than)
        kept = []
        for line in lines:
            try:
                ts = datetime.fromisoformat(json.loads(line)["timestamp"])
            except (json.JSONDecodeError, KeyError, ValueError):
                continue
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=timezone.utc)
            if ts >= cutoff:
                kept.append(line)
        with open(self.path, "w") as f:
            f.writelines(kept)
        return {"cleared": len(lines) - len(kept)}

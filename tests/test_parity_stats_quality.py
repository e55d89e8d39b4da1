"""Behavioral parity with reference tests/test_stats.py (348 LoC) and
tests/test_quality.py (255 LoC): cache internals, empty-table stats,
refresh-all, staleness lifecycle, quality score components, rule
compliance, history, and cross-table report."""

from __future__ import annotations

import datetime
import json

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance.stats import (
    QualityMonitor,
    StatsCache,
    compute_table_stats,
    detect_anomalies,
)
from iceberg_lakehouse_spark.governance.validation import ValidationManager
from iceberg_lakehouse_spark.operators import crud

SCHEMA = [("id", "long"), ("name", "string"), ("amount", "double")]
ROWS = [
    {"id": 1, "name": "Alice", "amount": 100.5},
    {"id": 2, "name": "Bob", "amount": 200.0},
    {"id": 3, "name": "Charlie", "amount": 150.75},
]


@pytest.fixture()
def catalog(spark, tmp_warehouse):
    return LakehouseCatalog(spark, tmp_warehouse)


@pytest.fixture()
def table(catalog):
    t = catalog.create_table("stats_test", SCHEMA)
    crud.insert_rows(t, ROWS)
    return t


# -- compute_table_stats (reference TestComputeTableStats) ----------------


class TestComputeTableStats:
    def test_basic_counts_and_columns(self, table):
        stats = compute_table_stats(table)
        assert stats["row_count"] == 3
        assert len(stats["columns"]) == 3
        assert set(stats["columns"]) == {"id", "name", "amount"}

    def test_numeric_column_stats(self, table):
        col = compute_table_stats(table)["columns"]["id"]
        assert col["type"] == "bigint"
        assert col["min"] == 1
        assert col["max"] == 3
        assert col["avg"] == 2.0
        assert col["nulls"] == 0
        assert col["distinct"] == 3

    def test_string_column_has_no_numeric_stats(self, table):
        col = compute_table_stats(table)["columns"]["name"]
        assert col["nulls"] == 0
        assert col["distinct"] == 3
        assert "min" not in col
        assert "avg" not in col

    def test_double_column_stats(self, table):
        col = compute_table_stats(table)["columns"]["amount"]
        assert col["min"] == 100.5
        assert col["max"] == 200.0
        assert col["avg"] is not None

    def test_snapshot_and_file_info(self, table):
        stats = compute_table_stats(table)
        assert stats["snapshot_count"] >= 1
        assert stats["snapshot_id"] is not None
        assert stats["file_count"] >= 1
        assert stats["total_bytes"] > 0

    def test_timestamps_parseable(self, table):
        stats = compute_table_stats(table)
        datetime.datetime.fromisoformat(stats["last_modified"])
        datetime.datetime.fromisoformat(stats["computed_at"])

    def test_empty_table(self, catalog):
        t = catalog.create_table("empty_stats", [("id", "long"), ("val", "string")])
        stats = compute_table_stats(t)
        assert stats["row_count"] == 0
        assert set(stats["columns"]) == {"id", "val"}
        assert stats["columns"]["id"]["nulls"] == 0
        assert stats["columns"]["id"]["distinct"] == 0
        assert stats["last_modified"] is None  # no snapshot yet


# -- StatsCache (reference TestGetCachedStats / TestRefreshStats /
#    TestIsStatsStale / cache internals) ----------------------------------


class TestStatsCache:
    def test_peek_miss(self, tmp_path):
        sc = StatsCache(str(tmp_path / "stats.json"))
        assert sc.peek("default.nothing") is None

    def test_corrupt_cache_recovers(self, tmp_path, table):
        path = tmp_path / "stats.json"
        path.write_text("{invalid json")
        sc = StatsCache(str(path))
        assert sc.peek("default.stats_test") is None  # corrupt → empty
        got = sc.get(table)
        assert got["row_count"] == 3  # recompute works, file rewritten
        assert json.loads(path.read_text())["default.stats_test"]["row_count"] == 3

    def test_cache_file_structure(self, tmp_path, table):
        path = tmp_path / "stats.json"
        StatsCache(str(path)).get(table)
        entry = json.loads(path.read_text())["default.stats_test"]
        expected = {
            "row_count", "snapshot_id", "file_count", "total_bytes",
            "snapshot_count", "columns", "last_modified", "computed_at",
        }
        assert expected.issubset(entry.keys())

    def test_refresh_single(self, tmp_path, table):
        sc = StatsCache(str(tmp_path / "stats.json"))
        res = sc.refresh(table)
        assert res["count"] == 1
        assert res["tables_refreshed"] == ["default.stats_test"]
        assert "duration_seconds" in res and "message" in res

    def test_refresh_detects_changes(self, tmp_path, table):
        sc = StatsCache(str(tmp_path / "stats.json"))
        sc.get(table)
        crud.insert_rows(table, [{"id": 4, "name": "Dave", "amount": 300.0}])
        sc.refresh(table)
        assert sc.peek("default.stats_test")["row_count"] == 4

    def test_refresh_all_catalog_tables(self, tmp_path, catalog, table):
        second = catalog.create_table("stats_second", [("id", "long")])
        crud.insert_rows(second, [{"id": 1}])
        sc = StatsCache(str(tmp_path / "stats.json"))
        res = sc.refresh([catalog.load_table(n) for n in catalog.list_tables()])
        assert res["count"] == 2
        assert set(res["tables_refreshed"]) == {"default.stats_test", "default.stats_second"}

    def test_stale_lifecycle(self, tmp_path, catalog):
        t = catalog.create_table("workflow", [("id", "long"), ("value", "double")])
        sc = StatsCache(str(tmp_path / "stats.json"))
        assert sc.is_stale(t) is True  # no cache yet
        crud.insert_rows(t, [{"id": 1, "value": 10.0}, {"id": 2, "value": 20.0}])
        assert sc.get(t)["row_count"] == 2
        assert sc.is_stale(t) is False
        crud.insert_rows(t, [{"id": 3, "value": 30.0}])
        assert sc.is_stale(t) is True
        sc.refresh(t)
        assert sc.peek("default.workflow")["row_count"] == 3
        assert sc.is_stale(t) is False


# -- QualityMonitor (reference TestComputeQualityScore / history / report) -


@pytest.fixture()
def dirty_table(catalog):
    t = catalog.create_table("dirty_data", SCHEMA)
    crud.insert_rows(t, [
        {"id": 1, "name": "Alice", "amount": 10.0},
        {"id": 1, "name": None, "amount": None},
        {"id": 2, "name": None, "amount": None},
        {"id": 2, "name": None, "amount": 20.0},
    ])
    return t


class TestQualityMonitor:
    def test_clean_data_high_score(self, tmp_path, table):
        qm = QualityMonitor(str(tmp_path / "quality.json"))
        res = qm.score(table)
        assert res["overall_score"] >= 70
        assert res["completeness"] == 100.0
        assert res["table"] == "default.stats_test"
        assert "message" in res

    def test_dirty_data_lower_score(self, tmp_path, dirty_table):
        qm = QualityMonitor(str(tmp_path / "quality.json"))
        res = qm.score(dirty_table)
        assert res["completeness"] < 100.0
        assert res["overall_score"] < 100

    def test_components_in_range(self, tmp_path, table):
        qm = QualityMonitor(str(tmp_path / "quality.json"))
        res = qm.score(table)
        for key in ("completeness", "uniqueness", "freshness",
                    "rule_compliance", "overall_score"):
            assert 0 <= res[key] <= 100

    def test_passing_rules_full_compliance(self, tmp_path, table):
        vm = ValidationManager(str(tmp_path / "rules.json"))
        vm.add_rule("default.stats_test", "not_null", column="name")
        qm = QualityMonitor(str(tmp_path / "quality.json"))
        assert qm.score(table, validation=vm)["rule_compliance"] == 100.0

    def test_failing_rules_lower_compliance(self, tmp_path, dirty_table):
        vm = ValidationManager(str(tmp_path / "rules.json"))
        vm.add_rule("default.dirty_data", "not_null", column="name")
        qm = QualityMonitor(str(tmp_path / "quality.json"))
        res = qm.score(dirty_table, validation=vm)
        assert res["rule_compliance"] < 100.0
        # 1 rule × 4 rows, 3 null names → 25% compliance
        assert res["rule_compliance"] == 25.0

    def test_recommendations_on_dirty_data(self, tmp_path, dirty_table):
        vm = ValidationManager(str(tmp_path / "rules.json"))
        vm.add_rule("default.dirty_data", "not_null", column="name")
        qm = QualityMonitor(str(tmp_path / "quality.json"))
        res = qm.score(dirty_table, validation=vm)
        assert any("NOT NULL" in r for r in res["recommendations"])
        assert any("validation rules" in r for r in res["recommendations"])

    def test_history_accumulates_and_caps(self, tmp_path, table):
        qm = QualityMonitor(str(tmp_path / "quality.json"))
        for _ in range(3):
            qm.score(table)
        hist = qm.history("default.stats_test")
        assert len(hist) == 3
        for entry in hist:
            assert "overall_score" in entry and "computed_at" in entry
        # cap at 50 (reference MAX_HISTORY)
        data = qm.store.load()
        data["default.stats_test"]["history"] = hist * 20  # 60 entries
        qm.store.save(data)
        qm.score(table)
        assert len(qm.history("default.stats_test")) == 50

    def test_empty_history(self, tmp_path):
        qm = QualityMonitor(str(tmp_path / "quality.json"))
        assert qm.history("default.nothing") == []

    def test_store_json_structure(self, tmp_path, table):
        path = tmp_path / "quality.json"
        QualityMonitor(str(path)).score(table)
        data = json.loads(path.read_text())
        h = data["default.stats_test"]["history"][0]
        for key in ("overall_score", "completeness", "uniqueness", "freshness",
                    "rule_compliance", "computed_at", "recommendations"):
            assert key in h

    def test_report_single_table(self, tmp_path, catalog, table):
        qm = QualityMonitor(str(tmp_path / "quality.json"))
        rep = qm.report(catalog, table_name="default.stats_test")
        assert rep["total_tables"] == 1
        assert rep["tables"][0]["table"] == "default.stats_test"
        assert rep["tables"][0]["anomalies"] == 0  # no baseline → none
        assert rep["average_score"] > 0

    def test_report_all_tables(self, tmp_path, catalog, table, dirty_table):
        qm = QualityMonitor(str(tmp_path / "quality.json"))
        rep = qm.report(catalog)
        assert rep["total_tables"] == 2
        assert {t["table"] for t in rep["tables"]} == {
            "default.stats_test", "default.dirty_data"}

    def test_report_counts_anomalies_vs_baseline(self, tmp_path, catalog, table):
        sc = StatsCache(str(tmp_path / "stats.json"))
        sc.get(table)  # baseline: 3 rows
        crud.insert_rows(table, [
            {"id": i, "name": f"u{i}", "amount": float(i)} for i in range(10, 20)
        ])  # 3 → 13 rows: >90% change → critical anomaly
        qm = QualityMonitor(str(tmp_path / "quality.json"))
        rep = qm.report(catalog, table_name="default.stats_test", stats_cache=sc)
        row = rep["tables"][0]
        assert row["anomalies"] >= 1
        kinds = {a["type"] for a in row["anomaly_details"]}
        assert "row_count_change" in kinds

    def test_report_survives_broken_table(self, tmp_path, catalog, table):
        qm = QualityMonitor(str(tmp_path / "quality.json"))
        rep = qm.report(catalog, table_name="default.no_such_table")
        assert rep["tables"][0]["overall_score"] is None
        assert "error" in rep["tables"][0]


# -- anomaly edges (reference TestDetectAnomalies) -------------------------


class TestAnomalyEdges:
    def test_stable_data_no_anomalies(self, table):
        stats = compute_table_stats(table)
        assert detect_anomalies(stats, stats) == []

    def test_row_count_boundary(self, table):
        stats = compute_table_stats(table)
        up_49 = {**stats, "row_count": int(stats["row_count"] * 1.49)}
        assert detect_anomalies(stats, up_49) == []  # ≤50% is fine
        up_95 = {**stats, "row_count": 6}  # 3 → 6 = +100% > 90% → critical
        found = detect_anomalies(stats, up_95)
        assert found and found[0]["severity"] == "critical"

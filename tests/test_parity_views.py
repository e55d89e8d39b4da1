"""Behavioral parity with reference tests/test_views.py (227 LoC):
create/list/get/drop result shapes, blank-input and duplicate guards,
JSON store structure, and view queries over engine-registered tables."""

from __future__ import annotations

import json

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance.views import ViewManager
from iceberg_lakehouse_spark.operators import crud
from iceberg_lakehouse_spark.plans.engine import QueryEngine


@pytest.fixture()
def catalog(spark, tmp_warehouse):
    return LakehouseCatalog(spark, tmp_warehouse)


@pytest.fixture()
def engine(catalog):
    return QueryEngine(catalog)


@pytest.fixture()
def views_path(tmp_path):
    return tmp_path / "views.json"


@pytest.fixture()
def vm(views_path, engine):
    return ViewManager(str(views_path), engine)


# --- create_view (reference test_views.py:26-72) ---


class TestCreateView:
    def test_simple_view(self, vm):
        result = vm.create("test_view", "SELECT 1 AS val")
        assert result["name"] == "test_view"
        assert result["sql"] == "SELECT 1 AS val"
        assert "created" in result["message"].lower()

    def test_with_description(self, vm):
        result = vm.create("my_view", "SELECT * FROM t", description="My view")
        assert result["description"] == "My view"

    def test_persists(self, vm, views_path):
        vm.create("stored_view", "SELECT 1")
        assert views_path.exists()
        data = json.loads(views_path.read_text())
        assert "stored_view" in data

    def test_has_timestamp(self, vm):
        result = vm.create("ts_view", "SELECT 1")
        assert result["created_at"] is not None

    def test_duplicate_raises(self, vm):
        vm.create("dupe", "SELECT 1")
        with pytest.raises(ValueError, match="already exists"):
            vm.create("dupe", "SELECT 2")

    def test_empty_name_raises(self, vm):
        with pytest.raises(ValueError, match="empty"):
            vm.create("", "SELECT 1")

    def test_empty_sql_raises(self, vm):
        with pytest.raises(ValueError, match="empty"):
            vm.create("test", "")

    def test_whitespace_name_raises(self, vm):
        with pytest.raises(ValueError, match="empty"):
            vm.create("   ", "SELECT 1")


# --- list_views (reference test_views.py:78-101) ---


class TestListViews:
    def test_empty(self, vm):
        assert vm.list() == []

    def test_with_views(self, vm):
        vm.create("v1", "SELECT 1")
        vm.create("v2", "SELECT 2", description="second")
        views = vm.list()
        assert len(views) == 2
        names = [v["name"] for v in views]
        assert "v1" in names
        assert "v2" in names

    def test_includes_all_fields(self, vm):
        vm.create("full", "SELECT *", description="all fields")
        v = vm.list()[0]
        assert v["name"] == "full"
        assert v["sql"] == "SELECT *"
        assert v["description"] == "all fields"
        assert v["created_at"]


# --- get_view (reference test_views.py:107-118) ---


class TestGetView:
    def test_existing(self, vm):
        vm.create("get_me", "SELECT 42")
        v = vm.get("get_me")
        assert v["name"] == "get_me"
        assert v["sql"] == "SELECT 42"

    def test_nonexistent_raises(self, vm):
        with pytest.raises(ValueError, match="not found"):
            vm.get("no_such")


# --- drop_view (reference test_views.py:124-135) ---


class TestDropView:
    def test_drop_existing(self, vm):
        vm.create("to_drop", "SELECT 1")
        result = vm.drop("to_drop")
        assert "dropped" in result["message"].lower()
        assert vm.list() == []

    def test_drop_nonexistent_raises(self, vm):
        with pytest.raises(ValueError, match="not found"):
            vm.drop("no_such")


# --- query_view (reference test_views.py:141-209) ---


class TestQueryView:
    def test_simple_query(self, vm):
        vm.create("simple", "SELECT 1 AS val")
        rows = vm.query("simple").collect()
        assert len(rows) == 1
        assert rows[0]["val"] == 1

    def test_view_over_table(self, catalog, engine, views_path):
        t = catalog.create_table(
            "view_data", [("id", "long"), ("name", "string")]
        )
        crud.insert_rows(t, [
            {"id": 1, "name": "Alice"},
            {"id": 2, "name": "Bob"},
            {"id": 3, "name": "Charlie"},
        ])
        vm = ViewManager(str(views_path), engine)
        vm.create("all_data", "SELECT * FROM view_data")
        assert vm.query("all_data").count() == 3

    def test_view_with_where(self, catalog, engine, views_path):
        t = catalog.create_table(
            "filter_data", [("id", "long"), ("val", "double")]
        )
        crud.insert_rows(t, [
            {"id": 1, "val": 10.0},
            {"id": 2, "val": 20.0},
            {"id": 3, "val": 30.0},
        ])
        vm = ViewManager(str(views_path), engine)
        vm.create("big_vals", "SELECT * FROM filter_data WHERE val > 15")
        assert vm.query("big_vals").count() == 2

    def test_view_with_aggregation(self, catalog, engine, views_path):
        t = catalog.create_table(
            "agg_data", [("cat", "string"), ("amount", "double")]
        )
        crud.insert_rows(t, [
            {"cat": "A", "amount": 10.0},
            {"cat": "A", "amount": 20.0},
            {"cat": "B", "amount": 30.0},
        ])
        vm = ViewManager(str(views_path), engine)
        vm.create(
            "by_cat",
            "SELECT cat, SUM(amount) AS total FROM agg_data GROUP BY cat",
        )
        rows = vm.query("by_cat").collect()
        assert len(rows) == 2
        assert {r["cat"] for r in rows} == {"A", "B"}

    def test_max_rows(self, vm):
        # Spark's sequence+explode replaces DuckDB's generate_series
        vm.create(
            "limited",
            "SELECT explode(sequence(1, 100)) AS val",
        )
        assert vm.query("limited", max_rows=5).count() == 5

    def test_nonexistent_raises(self, vm):
        with pytest.raises(ValueError, match="not found"):
            vm.query("missing")


# --- storage format (reference test_views.py:215-227) ---


class TestStorageFormat:
    def test_json_structure(self, vm, views_path):
        vm.create("v1", "SELECT 1", description="first")
        vm.create("v2", "SELECT 2")
        data = json.loads(views_path.read_text())
        assert "v1" in data
        assert "v2" in data
        entry = data["v1"]
        assert entry["sql"] == "SELECT 1"
        assert entry["description"] == "first"
        assert "created_at" in entry

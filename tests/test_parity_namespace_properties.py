"""Behavioral parity with reference tests/test_namespace.py (265 LoC)
and tests/test_table_properties.py (92 LoC): namespace create/drop/
properties result shapes and guards, wildcard table listing, same-name
tables across namespaces, and the single-property get/set/remove
surface."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.operators import crud

SCHEMA = [("id", "long"), ("name", "string")]


@pytest.fixture()
def catalog(spark, tmp_warehouse):
    c = LakehouseCatalog(spark, tmp_warehouse)
    # reference create_sample_tables seeds expenses/health/notes in default
    for t in ("expenses", "health", "notes"):
        c.create_table(t, SCHEMA)
    return c


# --- list_namespaces (reference test_namespace.py:16-33) ---


class TestListNamespaces:
    def test_default_namespace_exists(self, catalog):
        assert "default" in catalog.list_namespaces()

    def test_lists_created_namespaces(self, catalog):
        catalog.create_namespace("staging")
        namespaces = catalog.list_namespaces()
        assert "default" in namespaces
        assert "staging" in namespaces

    def test_lists_multiple_namespaces(self, catalog):
        catalog.create_namespace("staging")
        catalog.create_namespace("analytics")
        assert len(catalog.list_namespaces()) >= 3


# --- create_namespace (reference test_namespace.py:36-62) ---


class TestCreateNamespace:
    def test_create_simple(self, catalog):
        result = catalog.create_namespace("staging")
        assert result["namespace"] == "staging"
        assert "Created" in result["message"]
        assert "staging" in catalog.list_namespaces()

    def test_create_with_properties(self, catalog):
        result = catalog.create_namespace(
            "analytics", properties={"owner": "data-team", "env": "prod"}
        )
        assert result["namespace"] == "analytics"
        assert result["properties"]["owner"] == "data-team"

    def test_create_duplicate_raises(self, catalog):
        catalog.create_namespace("staging")
        with pytest.raises(ValueError, match="already exists"):
            catalog.create_namespace("staging")

    def test_create_without_properties(self, catalog):
        assert catalog.create_namespace("staging")["properties"] == {}


# --- drop_namespace (reference test_namespace.py:65-92) ---


class TestDropNamespace:
    def test_drop_empty_namespace(self, catalog):
        catalog.create_namespace("staging")
        result = catalog.drop_namespace("staging")
        assert result["namespace"] == "staging"
        assert "Dropped" in result["message"]
        assert "staging" not in catalog.list_namespaces()

    def test_drop_nonexistent_raises(self, catalog):
        with pytest.raises(ValueError, match="not found"):
            catalog.drop_namespace("nonexistent")

    def test_drop_nonempty_raises(self, catalog):
        with pytest.raises(ValueError, match="not empty"):
            catalog.drop_namespace("default")

    def test_drop_with_created_table_raises(self, catalog):
        catalog.create_namespace("staging")
        catalog.create_table("staging.events", SCHEMA)
        with pytest.raises(ValueError, match="not empty"):
            catalog.drop_namespace("staging")


# --- get_namespace_properties (reference test_namespace.py:95-117) ---


class TestGetNamespaceProperties:
    def test_get_properties(self, catalog):
        catalog.create_namespace("staging", properties={"owner": "data-team"})
        props = catalog.namespace_properties("staging")
        assert props["owner"] == "data-team"

    def test_get_empty_properties(self, catalog):
        catalog.create_namespace("staging")
        assert isinstance(catalog.namespace_properties("staging"), dict)

    def test_get_nonexistent_raises(self, catalog):
        with pytest.raises(ValueError, match="not found"):
            catalog.namespace_properties("nonexistent")


# --- list_tables namespace filtering (reference test_namespace.py:120-150) ---


class TestListTablesWithNamespace:
    def test_list_default_tables(self, catalog):
        assert len(catalog.list_tables("default")) >= 3

    def test_list_all_namespaces(self, catalog):
        catalog.create_namespace("staging")
        catalog.create_table("staging.events", [("id", "long")])
        all_tables = catalog.list_tables("*")
        assert any("staging.events" in t for t in all_tables)
        assert any("expenses" in t for t in all_tables)

    def test_list_empty_namespace(self, catalog):
        catalog.create_namespace("staging")
        assert catalog.list_tables("staging") == []

    def test_list_specific_namespace(self, catalog):
        catalog.create_namespace("staging")
        catalog.create_table("staging.events", [("id", "long")])
        catalog.create_table(
            "staging.logs", [("id", "long"), ("message", "string")]
        )
        tables = catalog.list_tables("staging")
        assert len(tables) == 2
        names = [t.split(".")[-1] for t in tables]
        assert "events" in names
        assert "logs" in names


# --- tables in namespaces (reference test_namespace.py:153-200) ---


class TestCreateTableInNamespace:
    def test_insert_into_namespace_table(self, catalog):
        catalog.create_namespace("staging")
        t = catalog.create_table("staging.events", SCHEMA)
        count = crud.insert_rows(t, [
            {"id": 1, "name": "event1"},
            {"id": 2, "name": "event2"},
        ])
        assert count == 2
        assert catalog.load_table("staging.events").scan().count() == 2

    def test_query_namespace_table(self, catalog):
        catalog.create_namespace("staging")
        t = catalog.create_table("staging.events", SCHEMA)
        crud.insert_rows(t, [{"id": 1, "name": "event1"}])
        rows = catalog.load_table("staging.events").scan().collect()
        assert len(rows) == 1
        assert rows[0]["name"] == "event1"


# --- workflows (reference test_namespace.py:203-265) ---


class TestNamespaceWorkflow:
    def test_full_lifecycle(self, catalog):
        catalog.create_namespace("staging")
        assert "staging" in catalog.list_namespaces()
        t = catalog.create_table(
            "staging.events", [("id", "long"), ("value", "double")]
        )
        assert len(catalog.list_tables("staging")) == 1
        crud.insert_rows(t, [{"id": 1, "value": 10.0}, {"id": 2, "value": 20.0}])
        assert catalog.load_table("staging.events").scan().count() == 2
        catalog.drop_table("staging.events")
        assert catalog.list_tables("staging") == []
        result = catalog.drop_namespace("staging")
        assert "Dropped" in result["message"]
        assert "staging" not in catalog.list_namespaces()

    def test_multiple_namespaces_with_same_table_name(self, catalog):
        catalog.create_namespace("staging")
        catalog.create_namespace("prod")
        ts = catalog.create_table("staging.events", SCHEMA)
        tp = catalog.create_table("prod.events", SCHEMA)
        crud.insert_rows(ts, [{"id": 1, "name": "staging_event"}])
        crud.insert_rows(tp, [{"id": 1, "name": "prod_event"}])
        assert [
            r["name"]
            for r in catalog.load_table("staging.events").scan().collect()
        ] == ["staging_event"]
        assert [
            r["name"]
            for r in catalog.load_table("prod.events").scan().collect()
        ] == ["prod_event"]

    def test_default_namespace_unaffected(self, catalog):
        catalog.create_namespace("staging")
        catalog.create_namespace("analytics")
        names = [t.split(".")[-1] for t in catalog.list_tables("default")]
        for expected in ("expenses", "health", "notes"):
            assert expected in names


# --- table properties (reference test_table_properties.py) ---


class TestGetTableProperty:
    def test_get_nonexistent_property(self, catalog):
        t = catalog.load_table("expenses")
        assert t.get_property("write.format.default") is None

    def test_get_after_set(self, catalog):
        t = catalog.load_table("expenses")
        t.set_property("write.format.default", "orc")
        assert t.get_property("write.format.default") == "orc"

    def test_get_nonexistent_table_raises(self, catalog):
        with pytest.raises(ValueError, match="not found"):
            catalog.load_table("nonexistent")

    def test_get_with_namespace(self, catalog):
        t = catalog.load_table("default.expenses")
        t.set_property("custom.key", "value1")
        assert t.get_property("custom.key") == "value1"


class TestSetTableProperty:
    def test_set_property(self, catalog):
        t = catalog.load_table("expenses")
        msg = t.set_property("write.format.default", "orc")
        assert "write.format.default" in msg
        assert "orc" in msg

    def test_set_overwrites_existing(self, catalog):
        t = catalog.load_table("expenses")
        t.set_property("custom.key", "value1")
        t.set_property("custom.key", "value2")
        assert t.get_property("custom.key") == "value2"

    def test_set_multiple_properties(self, catalog):
        t = catalog.load_table("expenses")
        t.set_property("key1", "val1")
        t.set_property("key2", "val2")
        assert t.get_property("key1") == "val1"
        assert t.get_property("key2") == "val2"

    def test_set_different_tables(self, catalog):
        catalog.load_table("expenses").set_property("key", "expenses_val")
        catalog.load_table("health").set_property("key", "health_val")
        assert catalog.load_table("expenses").get_property("key") == "expenses_val"
        assert catalog.load_table("health").get_property("key") == "health_val"


class TestRemoveTableProperty:
    def test_remove_property(self, catalog):
        t = catalog.load_table("expenses")
        t.set_property("custom.key", "value")
        msg = t.remove_property("custom.key")
        assert "Removed" in msg
        assert t.get_property("custom.key") is None

    def test_remove_nonexistent_property_raises(self, catalog):
        with pytest.raises(ValueError, match="not found"):
            catalog.load_table("expenses").remove_property("nonexistent.key")

    def test_remove_nonexistent_table_raises(self, catalog):
        with pytest.raises(ValueError, match="not found"):
            catalog.load_table("nonexistent")

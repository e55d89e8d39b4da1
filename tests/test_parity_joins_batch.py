"""Join + batch parity with the reference behavioral corpus
(reference tests/test_joins.py:1-194, test_batch.py:1-120).

Ports the assertion CONTENT — SQL joins through the engine (simple/
filtered/aggregated/left/namespace-qualified/max-rows/invalid-SQL),
join-to-table with rows_written + append/overwrite modes, join
suggestions (shared columns, join SQL, self-exclusion, missing-table
raise), and batch execution (multi-op, stop-on-error with skipped
remainder, per-op validation errors) — against the repo API."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.operators import crud
from iceberg_lakehouse_spark.operators.joins import join_to_table, suggest_joins
from iceberg_lakehouse_spark.plans.engine import QueryEngine


@pytest.fixture
def catalog(spark, tmp_path):
    c = LakehouseCatalog(spark, str(tmp_path / "lake"))
    users = c.create_table("users", [("id", "long"), ("name", "string")])
    crud.insert_rows(users, [
        {"id": 1, "name": "alice"}, {"id": 2, "name": "bob"},
        {"id": 3, "name": "charlie"},
    ])
    orders = c.create_table("orders", [("order_id", "long"), ("id", "long"),
                                       ("amount", "double")])
    crud.insert_rows(orders, [
        {"order_id": 1, "id": 1, "amount": 100.0},
        {"order_id": 2, "id": 1, "amount": 200.0},
        {"order_id": 3, "id": 2, "amount": 50.0},
    ])
    return c


@pytest.fixture
def engine(catalog):
    return QueryEngine(catalog)


# --- SQL joins via the engine (reference execute_join) ---


def test_simple_join(engine):
    df = engine.execute(
        "SELECT u.name, o.amount FROM users u JOIN orders o ON u.id = o.id")
    assert df.count() == 3
    assert "name" in df.columns and "amount" in df.columns


def test_join_with_where(engine):
    df = engine.execute(
        "SELECT u.name, o.amount FROM users u JOIN orders o ON u.id = o.id "
        "WHERE o.amount > 60")
    assert df.count() == 2


def test_join_with_aggregation(engine):
    rows = engine.execute(
        "SELECT u.name, SUM(o.amount) AS total FROM users u "
        "JOIN orders o ON u.id = o.id GROUP BY u.name").collect()
    assert len(rows) == 2
    assert {r["name"]: r["total"] for r in rows}["alice"] == 300.0


def test_join_max_rows(engine):
    df = engine.execute(
        "SELECT u.name FROM users u JOIN orders o ON u.id = o.id",
        max_rows=2)
    assert df.count() == 2


def test_namespace_qualified_refs(engine):
    df = engine.execute(
        "SELECT u.name FROM default.users u JOIN default.orders o "
        "ON u.id = o.id")
    assert df.count() == 3


def test_left_join_keeps_unmatched(engine):
    rows = engine.execute(
        "SELECT u.name, o.amount FROM users u LEFT JOIN orders o "
        "ON u.id = o.id").collect()
    assert len(rows) == 4
    charlie = [r for r in rows if r["name"] == "charlie"]
    assert len(charlie) == 1 and charlie[0]["amount"] is None


def test_invalid_sql_raises(engine):
    with pytest.raises(Exception):
        engine.execute("SELECT * FROM users JOIN").collect()


# --- join_to_table ---


def test_save_to_new_table(catalog, engine):
    result = join_to_table(
        catalog, engine,
        "SELECT u.name, SUM(o.amount) AS total FROM users u "
        "JOIN orders o ON u.id = o.id GROUP BY u.name",
        "default.user_totals")
    assert result["rows_written"] == 2
    assert "user_totals" in result["target"]
    assert catalog.load_table("user_totals").scan().count() == 2


def test_join_append_mode(catalog, engine):
    sql = ("SELECT u.name, o.amount FROM users u JOIN orders o "
           "ON u.id = o.id WHERE o.amount > 60")
    join_to_table(catalog, engine, sql, "default.appended")
    result = join_to_table(catalog, engine, sql, "default.appended",
                           mode="append")
    assert result["rows_written"] == 4  # 2 + 2


def test_join_overwrite_mode(catalog, engine):
    join_to_table(
        catalog, engine,
        "SELECT u.name FROM users u JOIN orders o ON u.id = o.id",
        "default.ow_target")
    result = join_to_table(
        catalog, engine,
        "SELECT u.name FROM users u JOIN orders o ON u.id = o.id "
        "WHERE o.amount > 150",
        "default.ow_target", mode="overwrite")
    assert result["rows_written"] == 1


def test_join_create_duplicate_raises(catalog, engine):
    join_to_table(catalog, engine, "SELECT 1 AS one", "default.once")
    with pytest.raises(ValueError, match="already exists"):
        join_to_table(catalog, engine, "SELECT 1 AS one", "default.once")


# --- suggest_joins ---


def test_suggest_finds_matching_columns(catalog):
    suggestions = suggest_joins(catalog, "default.users")
    assert any(s["shared_columns"] == ["id"] for s in suggestions)


def test_suggest_no_matches(catalog):
    catalog.create_table("island", [("unrelated", "string")])
    assert suggest_joins(catalog, "default.island") == []


def test_suggest_includes_join_sql(catalog):
    suggestions = suggest_joins(catalog, "default.users")
    assert suggestions
    assert all("JOIN" in s["join_sql"] for s in suggestions)


def test_suggest_nonexistent_table_raises(catalog):
    with pytest.raises(ValueError):
        suggest_joins(catalog, "default.ghost")


def test_suggest_excludes_self(catalog):
    for s in suggest_joins(catalog, "default.users"):
        assert s["table"] != "default.users"


# --- execute_batch ---


def test_batch_multiple_inserts(catalog):
    t = catalog.load_table("users")
    results = crud.execute_batch([
        (t, {"op": "insert", "rows": [{"id": 10, "name": "x"}]}),
        (t, {"op": "insert", "rows": [{"id": 11, "name": "y"}]}),
    ])
    assert len(results) == 2
    assert all(r["status"] == "ok" for r in results)
    assert results[0]["rows_affected"] == 1
    assert results[1]["rows_affected"] == 1
    assert t.scan().count() == 5


def test_batch_insert_update_delete(catalog):
    t = catalog.load_table("users")
    results = crud.execute_batch([
        (t, {"op": "insert", "rows": [{"id": 20, "name": "new"}]}),
        (t, {"op": "update", "filter": "id = 20", "updates": {"name": "upd"}}),
        (t, {"op": "delete", "filter": "id = 1"}),
    ])
    assert len(results) == 3
    assert all(r["status"] == "ok" for r in results)
    rows = {r["id"]: r["name"] for r in t.scan().collect()}
    assert rows[20] == "upd"
    assert 1 not in rows


def test_batch_stops_on_first_error(catalog):
    t = catalog.load_table("users")
    results = crud.execute_batch([
        (t, {"op": "insert", "rows": [{"id": 30, "name": "ok"}]}),
        (t, {"op": "update", "filter": "BROKEN ===", "updates": {"name": "x"}}),
        (t, {"op": "delete", "filter": "id = 30"}),
    ])
    assert len(results) == 3
    assert results[0]["status"] == "ok"
    assert results[1]["status"] == "error"
    assert results[2]["status"] == "skipped"
    # the delete never ran
    assert 30 in {r["id"] for r in t.scan().collect()}


def test_batch_unknown_action(catalog):
    t = catalog.load_table("users")
    results = crud.execute_batch([(t, {"op": "truncate"})])
    assert results[0]["status"] == "error"
    assert "op" in results[0]["message"].lower()


def test_batch_missing_rows_for_insert(catalog):
    t = catalog.load_table("users")
    results = crud.execute_batch([(t, {"op": "insert"})])
    assert results[0]["status"] == "error"
    assert "rows" in results[0]["message"].lower()


def test_batch_missing_filter_for_update(catalog):
    t = catalog.load_table("users")
    results = crud.execute_batch([(t, {"op": "update", "updates": {"name": "x"}})])
    assert results[0]["status"] == "error"


def test_batch_missing_filter_for_delete(catalog):
    t = catalog.load_table("users")
    results = crud.execute_batch([(t, {"op": "delete"})])
    assert results[0]["status"] == "error"

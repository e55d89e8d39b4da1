"""Saved-query + history parity with the reference behavioral corpus
(reference tests/test_queries.py:1-378, queries.py:31-222).

Ports the assertion CONTENT: save/list/get/delete result shapes and
raises, history entry fields (rows_returned/duration_ms/executed_at),
newest-first ordering, the MAX_HISTORY_ENTRIES cap, default read limit
of 20, clear-history counts, and store resilience — against the repo's
SavedQueries.
"""

from __future__ import annotations

import json

import pytest

from iceberg_lakehouse_spark.governance.queries_store import (
    MAX_HISTORY_ENTRIES,
    SavedQueries,
)


@pytest.fixture
def sq(tmp_path):
    return SavedQueries(str(tmp_path / "queries.json"))


@pytest.fixture
def store_path(tmp_path):
    return tmp_path / "queries.json"


# --- save (test_queries.py:27-85) ---


class TestSaveQuery:
    def test_save_simple(self, sq):
        result = sq.save("totals", "SELECT sum(amount) FROM expenses")
        assert result["name"] == "totals"
        assert result["sql"] == "SELECT sum(amount) FROM expenses"
        assert "Saved" in result["message"]

    def test_save_with_description(self, sq):
        result = sq.save(
            "totals", "SELECT sum(amount) FROM expenses",
            description="Sum of all expenses",
        )
        assert result["description"] == "Sum of all expenses"

    def test_save_persists_to_disk(self, sq, store_path):
        sq.save("totals", "SELECT 1")
        data = json.loads(store_path.read_text())
        assert "totals" in data["saved"]
        assert data["saved"]["totals"]["sql"] == "SELECT 1"

    def test_save_duplicate_raises(self, sq):
        sq.save("totals", "SELECT 1")
        with pytest.raises(ValueError, match="already exists"):
            sq.save("totals", "SELECT 2")

    def test_save_empty_name_raises(self, sq):
        with pytest.raises(ValueError, match="name must not be empty"):
            sq.save("", "SELECT 1")

    def test_save_whitespace_name_raises(self, sq):
        with pytest.raises(ValueError, match="name must not be empty"):
            sq.save("   ", "SELECT 1")

    def test_save_empty_sql_raises(self, sq):
        with pytest.raises(ValueError, match="SQL query must not be empty"):
            sq.save("test", "")

    def test_save_whitespace_sql_raises(self, sq):
        with pytest.raises(ValueError, match="SQL query must not be empty"):
            sq.save("test", "   ")

    def test_save_includes_created_at(self, sq, store_path):
        sq.save("totals", "SELECT 1")
        data = json.loads(store_path.read_text())
        assert "created_at" in data["saved"]["totals"]

    def test_save_multiple(self, sq, store_path):
        sq.save("q1", "SELECT 1")
        sq.save("q2", "SELECT 2")
        sq.save("q3", "SELECT 3")
        assert len(json.loads(store_path.read_text())["saved"]) == 3


# --- list (test_queries.py:88-116) ---


class TestListSavedQueries:
    def test_list_empty(self, sq):
        assert sq.list() == []

    def test_list_returns_all(self, sq):
        sq.save("q1", "SELECT 1")
        sq.save("q2", "SELECT 2", description="second")
        queries = sq.list()
        assert len(queries) == 2
        names = [q["name"] for q in queries]
        assert "q1" in names and "q2" in names

    def test_list_includes_fields(self, sq):
        sq.save("totals", "SELECT sum(amount) FROM expenses",
                description="Sum of expenses")
        q = sq.list()[0]
        assert q["name"] == "totals"
        assert q["sql"] == "SELECT sum(amount) FROM expenses"
        assert q["description"] == "Sum of expenses"
        assert "created_at" in q


# --- get (test_queries.py:119-140) ---


class TestGetSavedQuery:
    def test_get_existing(self, sq):
        sq.save("totals", "SELECT sum(amount) FROM expenses", description="Sum")
        result = sq.get("totals")
        assert result["name"] == "totals"
        assert result["sql"] == "SELECT sum(amount) FROM expenses"
        assert result["description"] == "Sum"

    def test_get_nonexistent_raises(self, sq):
        with pytest.raises(ValueError, match="not found"):
            sq.get("nonexistent")

    def test_get_after_multiple_saves(self, sq):
        sq.save("q1", "SELECT 1")
        sq.save("q2", "SELECT 2")
        sq.save("q3", "SELECT 3")
        assert sq.get("q2")["sql"] == "SELECT 2"


# --- delete (test_queries.py:143-176) ---


class TestDeleteSavedQuery:
    def test_delete_existing(self, sq):
        sq.save("totals", "SELECT 1")
        result = sq.delete("totals")
        assert result["name"] == "totals"
        assert "Deleted" in result["message"]
        assert sq.list() == []

    def test_delete_nonexistent_raises(self, sq):
        with pytest.raises(ValueError, match="not found"):
            sq.delete("nonexistent")

    def test_delete_one_keeps_others(self, sq):
        sq.save("q1", "SELECT 1")
        sq.save("q2", "SELECT 2")
        sq.delete("q1")
        queries = sq.list()
        assert len(queries) == 1
        assert queries[0]["name"] == "q2"

    def test_delete_then_recreate(self, sq):
        sq.save("totals", "SELECT 1")
        sq.delete("totals")
        sq.save("totals", "SELECT 2")
        assert sq.get("totals")["sql"] == "SELECT 2"


# --- history (test_queries.py:179-269) ---


class TestAddHistoryEntry:
    def test_add_entry(self, sq):
        sq.add_history("SELECT 1", rows_returned=1, duration_ms=10)
        history = sq.history()
        assert len(history) == 1
        assert history[0]["sql"] == "SELECT 1"
        assert history[0]["rows_returned"] == 1
        assert history[0]["duration_ms"] == 10

    def test_entries_include_timestamp(self, sq):
        sq.add_history("SELECT 1")
        assert "executed_at" in sq.history()[0]

    def test_most_recent_first(self, sq):
        sq.add_history("SELECT 1")
        sq.add_history("SELECT 2")
        sq.add_history("SELECT 3")
        history = sq.history()
        assert [h["sql"] for h in history] == ["SELECT 3", "SELECT 2", "SELECT 1"]

    def test_history_cap(self, sq, store_path):
        for i in range(MAX_HISTORY_ENTRIES + 50):
            sq.add_history(f"SELECT {i}")
        data = json.loads(store_path.read_text())
        assert len(data["history"]) == MAX_HISTORY_ENTRIES
        assert sq.history(limit=1)[0]["sql"] == f"SELECT {MAX_HISTORY_ENTRIES + 49}"

    def test_history_preserves_saved_queries(self, sq):
        sq.save("q1", "SELECT 1")
        sq.add_history("SELECT 2")
        queries = sq.list()
        assert len(queries) == 1
        assert queries[0]["name"] == "q1"


class TestGetHistory:
    def test_get_empty(self, sq):
        assert sq.history() == []

    def test_get_with_limit(self, sq):
        for i in range(10):
            sq.add_history(f"SELECT {i}")
        history = sq.history(limit=3)
        assert [h["sql"] for h in history] == ["SELECT 9", "SELECT 8", "SELECT 7"]

    def test_get_default_limit_is_20(self, sq):
        for i in range(30):
            sq.add_history(f"SELECT {i}")
        assert len(sq.history()) == 20

    def test_limit_larger_than_history(self, sq):
        sq.add_history("SELECT 1")
        sq.add_history("SELECT 2")
        assert len(sq.history(limit=100)) == 2


class TestClearHistory:
    def test_clear_empty(self, sq):
        assert sq.clear_history()["cleared"] == 0

    def test_clear_with_entries(self, sq):
        for i in range(5):
            sq.add_history(f"SELECT {i}")
        result = sq.clear_history()
        assert result["cleared"] == 5
        assert sq.history() == []

    def test_clear_preserves_saved_queries(self, sq):
        sq.save("q1", "SELECT 1")
        sq.add_history("SELECT 2")
        sq.clear_history()
        queries = sq.list()
        assert len(queries) == 1
        assert queries[0]["name"] == "q1"


# --- store resilience (test_queries.py:296-330) ---


class TestStoreResilience:
    def test_load_corrupt_json(self, store_path):
        store_path.write_text("not valid json{{{")
        fresh = SavedQueries(str(store_path))
        assert fresh.list() == []
        assert fresh.history() == []

    def test_store_creates_parent_dirs(self, tmp_path):
        nested = tmp_path / "deep" / "nested" / "queries.json"
        SavedQueries(str(nested)).save("q1", "SELECT 1")
        assert nested.exists()

    def test_concurrent_save_and_history(self, sq):
        sq.save("q1", "SELECT 1")
        sq.add_history("SELECT 2")
        sq.save("q2", "SELECT 3")
        sq.add_history("SELECT 4")
        assert len(sq.list()) == 2
        assert len(sq.history()) == 2


# --- workflows (test_queries.py:333-378) ---


class TestQueryWorkflow:
    def test_save_list_get_delete(self, sq):
        sq.save("totals", "SELECT sum(amount) FROM expenses",
                description="Total spending")
        assert len(sq.list()) == 1
        assert sq.get("totals")["sql"] == "SELECT sum(amount) FROM expenses"
        sq.delete("totals")
        assert sq.list() == []

    def test_mixed_operations(self, sq):
        sq.save("q1", "SELECT 1")
        sq.add_history("SELECT 1", rows_returned=1)
        sq.save("q2", "SELECT 2")
        sq.add_history("SELECT 2", rows_returned=2)
        sq.delete("q1")
        sq.add_history("SELECT 3", rows_returned=3)
        queries = sq.list()
        assert len(queries) == 1
        assert queries[0]["name"] == "q2"
        history = sq.history()
        assert len(history) == 3
        assert history[0]["sql"] == "SELECT 3"

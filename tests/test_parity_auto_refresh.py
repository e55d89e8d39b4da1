"""Auto-refresh parity with the reference behavioral corpus
(reference tests/test_auto_refresh.py:1-179, auto_refresh.py:34-286).

Ports the assertion CONTENT — config lifecycle (set/get/disable/list/
remove with messages), plan shape {downstream_count, actions} with
depth ordering + depth limit + cycle tolerance, trigger execution with
actions_executed and per-action success status, and history with
table filter + limit — against the repo's AutoRefreshManager."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.governance.auto_refresh import AutoRefreshManager
from iceberg_lakehouse_spark.governance.lineage import LineageManager
from iceberg_lakehouse_spark.governance.queries_store import QueryCache


@pytest.fixture
def lineage(tmp_path):
    return LineageManager(str(tmp_path / "lineage.json"))


@pytest.fixture
def ar(tmp_path, lineage):
    cache = QueryCache(str(tmp_path / "cache.json"))
    return AutoRefreshManager(str(tmp_path / "ar.json"), lineage,
                              query_cache=cache)


@pytest.fixture
def chain(lineage):
    """table_a → table_b → table_c lineage chain."""
    lineage.record(["table_a"], "table_b", operation="matview")
    lineage.record(["table_b"], "table_c", operation="matview")
    return lineage


# --- config ---


def test_set_and_get(ar):
    result = ar.configure("tbl")
    assert result["enabled"] is True
    assert result["table"] == "default.tbl"
    assert ar.get_config("tbl")["enabled"] is True


def test_set_with_config(ar):
    result = ar.configure("tbl", cascade_depth=3, refresh_matviews=False)
    assert result["cascade_depth"] == 3
    assert result["refresh_matviews"] is False


def test_get_nonexistent(ar):
    assert ar.get_config("nope")["enabled"] is False


def test_disable(ar):
    ar.configure("tbl")
    result = ar.configure("tbl", enabled=False)
    assert result["enabled"] is False


def test_depth_cap_raises(ar):
    with pytest.raises(ValueError, match="cascade_depth"):
        ar.configure("tbl", cascade_depth=99)


# --- list / remove ---


def test_list_empty(ar):
    assert ar.list_configs() == []


def test_list_multiple(ar):
    ar.configure("t1")
    ar.configure("t2")
    assert len(ar.list_configs()) == 2


def test_remove(ar):
    ar.configure("t1")
    ar.remove_config("t1")
    assert ar.list_configs() == []


def test_remove_nonexistent(ar):
    result = ar.remove_config("nope")
    assert "No auto-refresh" in result["message"]


# --- plan ---


def test_plan_with_downstream(ar, chain):
    ar.configure("table_a")
    plan = ar.plan("table_a")
    assert plan["downstream_count"] == 2
    assert len(plan["actions"]) > 0


def test_plan_no_downstream(ar):
    ar.configure("lonely")
    plan = ar.plan("lonely")
    assert plan["downstream_count"] == 0


def test_plan_disabled_is_empty(ar, chain):
    ar.configure("table_a", enabled=False)
    assert ar.plan("table_a")["actions"] == []


def test_plan_respects_depth(ar, chain):
    ar.configure("table_a", cascade_depth=1)
    plan = ar.plan("table_a")
    tables = {a.get("table") for a in plan["actions"]} | {
        f"default.mv_{a['matview']}" for a in plan["actions"]
        if "matview" in a
    }
    assert any("table_b" in (t or "") for t in tables)
    assert not any("table_c" in (t or "") for t in tables)


def test_plan_actions_sorted_by_depth(ar, chain):
    ar.configure("table_a")
    depths = [a["depth"] for a in ar.plan("table_a")["actions"]]
    assert depths == sorted(depths)


def test_plan_survives_cycle(ar, lineage):
    lineage.record(["x"], "y", operation="matview")
    lineage.record(["y"], "x", operation="matview")
    ar.configure("x")
    plan = ar.plan("x")
    assert plan["downstream_count"] >= 1  # terminates


# --- execute ---


def test_trigger_with_cache_invalidation(ar, chain):
    ar.configure("table_a")
    result = ar.execute("table_a")
    assert result["actions_executed"] > 0
    cache_actions = [a for a in result["actions"]
                     if a["action"] == "invalidate_cache"]
    assert cache_actions
    for a in cache_actions:
        assert a["status"] == "success"


def test_trigger_records_history(ar, chain):
    ar.configure("table_a")
    ar.execute("table_a")
    history = ar.history()
    assert len(history) == 1
    assert history[0]["table"] == "default.table_a"


def test_trigger_no_dependencies(ar):
    ar.configure("solo")
    result = ar.execute("solo")
    assert result["actions_executed"] >= 1  # cache invalidation at depth 0


# --- history ---


def test_empty_history(ar):
    assert ar.history() == []


def test_history_accumulates(ar):
    ar.configure("t1")
    ar.execute("t1")
    ar.execute("t1")
    assert len(ar.history()) == 2


def test_history_filter_by_table(ar):
    ar.configure("t1")
    ar.configure("t2")
    ar.execute("t1")
    ar.execute("t2")
    history = ar.history(table="t1")
    assert len(history) == 1
    assert history[0]["table"] == "default.t1"


def test_history_limit(ar):
    ar.configure("t1")
    for _ in range(5):
        ar.execute("t1")
    assert len(ar.history(limit=3)) == 3

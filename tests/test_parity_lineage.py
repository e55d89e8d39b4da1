"""Lineage parity with the reference behavioral corpus
(reference tests/test_lineage.py:1-306, lineage.py:36-306).

Ports the assertion CONTENT — name normalization, (sources, target)
edge dedupe with operation update, source dedup/sort, empty-raises,
BFS depth/cycle semantics, per-edge removal, impact analysis shape,
and JSON storage format — against the repo's LineageManager."""

from __future__ import annotations

import json

import pytest

from iceberg_lakehouse_spark.governance.lineage import LineageManager


@pytest.fixture
def lm(tmp_path):
    return LineageManager(str(tmp_path / "lineage.json"))


# --- record ---


def test_record_basic(lm):
    result = lm.record(["expenses"], "spending_report")
    assert result["sources"] == ["default.expenses"]
    assert result["target"] == "default.spending_report"
    assert result["operation"] == "manual"
    assert "recorded" in result["message"].lower()


def test_record_multiple_sources(lm):
    result = lm.record(["expenses", "categories"], "spending_report",
                       operation="insert_from")
    assert "default.categories" in result["sources"]
    assert "default.expenses" in result["sources"]


def test_record_with_sql(lm):
    sql = "INSERT INTO report SELECT * FROM expenses JOIN categories"
    result = lm.record(["expenses", "categories"], "report",
                       operation="insert_from", sql=sql)
    assert result["sql"] == sql


def test_record_qualified_names_preserved(lm):
    result = lm.record(["analytics.events"], "analytics.summary")
    assert result["sources"] == ["analytics.events"]
    assert result["target"] == "analytics.summary"


def test_record_duplicate_updates(lm):
    """Re-recording the same (sources, target) updates the edge — the
    operation changes in place and edge_count stays 1."""
    lm.record(["a"], "b", operation="manual")
    result = lm.record(["a"], "b", operation="pipeline")
    assert result["operation"] == "pipeline"
    assert "updated" in result["message"].lower()
    assert lm.graph()["edge_count"] == 1


def test_record_deduplicates_sources(lm):
    result = lm.record(["expenses", "expenses"], "report")
    assert result["sources"] == ["default.expenses"]


def test_record_sources_sorted(lm):
    result = lm.record(["zebra", "alpha"], "report")
    assert result["sources"] == ["default.alpha", "default.zebra"]


def test_record_empty_sources_raises(lm):
    with pytest.raises(ValueError, match="empty"):
        lm.record([], "report")


def test_record_empty_target_raises(lm):
    with pytest.raises(ValueError, match="empty"):
        lm.record(["a"], "")


def test_record_blank_sources_raises(lm):
    with pytest.raises(ValueError, match="non-empty"):
        lm.record(["  "], "report")


def test_record_has_timestamp(lm):
    assert lm.record(["a"], "b")["recorded_at"] is not None


def test_record_persists(lm, tmp_path):
    lm.record(["a"], "b")
    data = json.loads((tmp_path / "lineage.json").read_text())
    assert len(data["edges"]) == 1


# --- upstream ---


def test_upstream_direct(lm):
    lm.record(["expenses", "categories"], "report")
    tables = [d["table"] for d in lm.upstream("report", transitive=False)]
    assert "default.expenses" in tables
    assert "default.categories" in tables


def test_upstream_transitive(lm):
    lm.record(["raw_data"], "cleaned")
    lm.record(["cleaned"], "report")
    tables = [d["table"] for d in lm.upstream("report")]
    assert "default.cleaned" in tables
    assert "default.raw_data" in tables


def test_upstream_transitive_depth(lm):
    lm.record(["a"], "b")
    lm.record(["b"], "c")
    lm.record(["c"], "d")
    depth_map = {d["table"]: d["depth"] for d in lm.upstream("d")}
    assert depth_map["default.c"] == 1
    assert depth_map["default.b"] == 2
    assert depth_map["default.a"] == 3


def test_upstream_no_deps(lm):
    lm.record(["a"], "b")
    assert lm.upstream("a") == []


def test_upstream_cycle_detection(lm):
    lm.record(["a"], "b")
    lm.record(["b"], "c")
    lm.record(["c"], "a")  # cycle!
    tables = [d["table"] for d in lm.upstream("a")]
    assert "default.c" in tables


def test_upstream_non_transitive_is_depth_one(lm):
    lm.record(["a"], "b")
    lm.record(["b"], "c")
    tables = [d["table"] for d in lm.upstream("c", transitive=False)]
    assert tables == ["default.b"]


# --- downstream ---


def test_downstream_direct(lm):
    lm.record(["expenses"], "report")
    lm.record(["expenses"], "summary")
    tables = [d["table"] for d in lm.downstream("expenses", transitive=False)]
    assert "default.report" in tables
    assert "default.summary" in tables


def test_downstream_transitive(lm):
    lm.record(["a"], "b")
    lm.record(["b"], "c")
    tables = [d["table"] for d in lm.downstream("a")]
    assert "default.b" in tables
    assert "default.c" in tables


def test_downstream_no_deps(lm):
    lm.record(["a"], "b")
    assert lm.downstream("b") == []


# --- graph ---


def test_graph_full(lm):
    lm.record(["a"], "b")
    lm.record(["b", "c"], "d")
    graph = lm.graph()
    assert graph["node_count"] == 4
    assert graph["edge_count"] == 2
    assert "default.a" in graph["nodes"]
    assert "default.d" in graph["nodes"]


def test_graph_empty(lm):
    graph = lm.graph()
    assert graph["nodes"] == []
    assert graph["edges"] == []
    assert graph["node_count"] == 0
    assert graph["edge_count"] == 0


def test_graph_nodes_sorted(lm):
    lm.record(["zebra"], "alpha")
    assert lm.graph()["nodes"] == ["default.alpha", "default.zebra"]


# --- remove ---


def test_remove_existing(lm):
    lm.record(["a"], "b")
    result = lm.remove("a", "b")
    assert result["removed"] == 1
    assert lm.graph()["edge_count"] == 0


def test_remove_nonexistent(lm):
    result = lm.remove("a", "b")
    assert result["removed"] == 0
    assert "no lineage edge" in result["message"].lower()


def test_remove_preserves_others(lm):
    lm.record(["a"], "b")
    lm.record(["c"], "d")
    lm.remove("a", "b")
    graph = lm.graph()
    assert graph["edge_count"] == 1
    assert graph["edges"][0]["target"] == "default.d"


def test_remove_table_drops_all_touching_edges(lm):
    lm.record(["a"], "b")
    lm.record(["b"], "c")
    lm.record(["x"], "y")
    assert lm.remove_table("b") == 2
    assert lm.graph()["edge_count"] == 1


# --- impact analysis ---


def test_impact_with_downstream(lm):
    lm.record(["a"], "b")
    lm.record(["b"], "c")
    lm.record(["a"], "d")
    result = lm.impact("a")
    assert result["affected_count"] == 3
    assert "default.b" in result["affected_tables"]
    assert "default.c" in result["affected_tables"]
    assert "default.d" in result["affected_tables"]


def test_impact_no_downstream(lm):
    lm.record(["a"], "b")
    result = lm.impact("b")
    assert result["affected_count"] == 0
    assert "no downstream" in result["message"].lower()


def test_impact_message_includes_count(lm):
    lm.record(["a"], "b")
    assert "1 table" in lm.impact("a")["message"]


# --- storage format ---


def test_json_structure(lm, tmp_path):
    lm.record(["expenses", "categories"], "report", operation="insert_from",
              sql="SELECT * FROM expenses JOIN categories")
    data = json.loads((tmp_path / "lineage.json").read_text())
    assert "edges" in data
    assert len(data["edges"]) == 1
    edge = data["edges"][0]
    assert edge["sources"] == ["default.categories", "default.expenses"]
    assert edge["target"] == "default.report"
    assert edge["operation"] == "insert_from"
    assert edge["sql"] is not None
    assert "recorded_at" in edge

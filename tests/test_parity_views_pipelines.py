"""Matview + pipeline parity with the reference behavioral corpus
(reference tests/test_matviews.py:1-241, test_pipelines.py:1-324).

Ports the assertion CONTENT — creation results with row counts and
messages, backing-table lifecycle, refresh before/after counts,
staleness via source snapshots, list summaries, run results with
steps_completed/steps_failed/step_results + rows_affected,
overwrite/append modes, dry-run validation without side effects, and
drop messages — against the repo's MatviewManager/PipelineManager."""

from __future__ import annotations

import json

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance.views import MatviewManager, PipelineManager
from iceberg_lakehouse_spark.operators import crud
from iceberg_lakehouse_spark.plans.engine import QueryEngine


@pytest.fixture
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "lake"))


@pytest.fixture
def engine(catalog):
    return QueryEngine(catalog)


@pytest.fixture
def source(catalog):
    t = catalog.create_table("mv_source", [("id", "long"), ("category", "string"),
                                           ("amount", "double")])
    crud.insert_rows(t, [
        {"id": 1, "category": "a", "amount": 10.0},
        {"id": 2, "category": "b", "amount": 20.0},
        {"id": 3, "category": "a", "amount": 30.0},
    ])
    return t


@pytest.fixture
def mv(catalog, engine, tmp_path):
    return MatviewManager(str(tmp_path / "mv.json"), catalog, engine)


@pytest.fixture
def pm(catalog, engine, tmp_path):
    return PipelineManager(str(tmp_path / "pipelines.json"), catalog, engine)


# --- matview create ---


def test_mv_create_basic(mv, source):
    result = mv.create(
        "totals",
        "SELECT category, SUM(amount) AS total FROM mv_source GROUP BY category")
    assert result["name"] == "totals"
    assert result["row_count"] == 2
    assert "mv_totals" in result["backing_table"]
    assert "created" in result["message"].lower()


def test_mv_create_with_description(mv, source):
    result = mv.create("described", "SELECT * FROM mv_source",
                       description="My view")
    assert result["description"] == "My view"


def test_mv_create_duplicate_raises(mv, source):
    mv.create("dup", "SELECT * FROM mv_source")
    with pytest.raises(ValueError, match="already exists"):
        mv.create("dup", "SELECT * FROM mv_source")


def test_mv_create_empty_name_raises(mv, source):
    with pytest.raises(ValueError, match="non-empty"):
        mv.create("", "SELECT * FROM mv_source")


def test_mv_create_empty_sql_raises(mv, source):
    with pytest.raises(ValueError, match="non-empty"):
        mv.create("x", "   ")


def test_mv_creates_backing_table(mv, source, catalog):
    mv.create("backed", "SELECT * FROM mv_source")
    assert "default.mv_backed" in catalog.list_tables()


def test_mv_query_returns_cached_data(mv, source):
    mv.create(
        "q",
        "SELECT category, SUM(amount) AS total FROM mv_source GROUP BY category")
    assert mv.query("q").count() == 2


def test_mv_query_nonexistent_raises(mv):
    with pytest.raises(ValueError, match="does not exist"):
        mv.query("ghost")


# --- matview refresh / freshness ---


def test_mv_refresh_picks_up_changes(mv, source):
    mv.create("r", "SELECT * FROM mv_source")
    crud.insert_rows(source, [{"id": 4, "category": "c", "amount": 40.0}])
    result = mv.refresh("r")
    assert result["rows_before"] == 3
    assert result["rows_after"] == 4
    assert "refreshed" in result["message"].lower()


def test_mv_refresh_nonexistent_raises(mv):
    with pytest.raises(ValueError, match="does not exist"):
        mv.refresh("ghost")


def test_mv_fresh(mv, source):
    mv.create("f", "SELECT * FROM mv_source")
    assert mv.freshness("f")["stale"] is False


def test_mv_stale_after_insert(mv, source):
    mv.create("s", "SELECT * FROM mv_source")
    crud.insert_rows(source, [{"id": 9, "category": "z", "amount": 1.0}])
    result = mv.freshness("s")
    assert result["stale"] is True
    assert "default.mv_source" in result["changed_tables"]


# --- matview list / drop / storage ---


def test_mv_list_empty(mv):
    assert mv.list() == []


def test_mv_list_with_views(mv, source):
    mv.create("v1", "SELECT * FROM mv_source")
    mv.create("v2", "SELECT id FROM mv_source")
    views = mv.list()
    assert len(views) == 2
    names = [v["name"] for v in views]
    assert "v1" in names and "v2" in names
    for v in views:
        assert "sql" in v
        assert "row_count" in v
        assert "last_refreshed" in v


def test_mv_drop(mv, source, catalog):
    mv.create("to_drop", "SELECT * FROM mv_source")
    result = mv.drop("to_drop")
    assert "dropped" in result["message"].lower()
    assert "default.mv_to_drop" not in catalog.list_tables()


def test_mv_drop_nonexistent_raises(mv):
    with pytest.raises(ValueError, match="does not exist"):
        mv.drop("ghost")


def test_mv_json_structure(mv, source, tmp_path):
    mv.create("json_check", "SELECT * FROM mv_source", description="test")
    data = json.loads((tmp_path / "mv.json").read_text())
    assert "json_check" in data
    entry = data["json_check"]
    assert entry["sql"] == "SELECT * FROM mv_source"
    assert entry["description"] == "test"
    assert entry["backing_table"] == "default.mv_json_check"
    assert entry["row_count"] == 3
    assert "created_at" in entry
    assert "last_refreshed" in entry
    assert "source_snapshot_ids" in entry


# --- pipeline create / get / list ---


def test_pipe_create_basic(pm):
    result = pm.create("etl", [{"sql": "SELECT 1 AS one"}])
    assert result["name"] == "etl"
    assert result["steps"] == 1
    assert "created" in result["message"].lower()


def test_pipe_create_with_description(pm):
    result = pm.create("d", [{"sql": "SELECT 1"}], description="My pipeline")
    assert result["description"] == "My pipeline"


def test_pipe_create_multiple_steps(pm):
    result = pm.create("multi", [{"sql": "SELECT 1"}, {"sql": "SELECT 2"}])
    assert result["steps"] == 2


def test_pipe_duplicate_raises(pm):
    pm.create("dup", [{"sql": "SELECT 1"}])
    with pytest.raises(ValueError, match="already exists"):
        pm.create("dup", [{"sql": "SELECT 1"}])


def test_pipe_empty_name_raises(pm):
    with pytest.raises(ValueError, match="non-empty"):
        pm.create("", [{"sql": "SELECT 1"}])


def test_pipe_empty_steps_raises(pm):
    with pytest.raises(ValueError, match="at least one step"):
        pm.create("e", [])


def test_pipe_empty_sql_raises(pm):
    with pytest.raises(ValueError, match="missing 'sql'"):
        pm.create("e", [{"sql": "  "}])


def test_pipe_invalid_mode_raises(pm):
    with pytest.raises(ValueError, match="invalid mode"):
        pm.create("e", [{"sql": "SELECT 1", "mode": "merge"}])


def test_pipe_get(pm):
    pm.create("get_me", [{"sql": "SELECT 1"}], description="desc")
    result = pm.get("get_me")
    assert result["name"] == "get_me"
    assert result["description"] == "desc"
    assert len(result["steps"]) == 1
    assert result["last_run"] is None


def test_pipe_get_nonexistent_raises(pm):
    with pytest.raises(ValueError, match="does not exist"):
        pm.get("ghost")


def test_pipe_list_empty(pm):
    assert pm.list() == []


def test_pipe_list_fields(pm):
    pm.create("p1", [{"sql": "SELECT 1"}])
    pm.create("p2", [{"sql": "SELECT 2"}])
    pipelines = pm.list()
    assert len(pipelines) == 2
    names = [p["name"] for p in pipelines]
    assert "p1" in names and "p2" in names
    for p in pipelines:
        assert "step_count" in p
        assert "created_at" in p
        assert "last_run" in p
        assert "last_run_status" in p


# --- pipeline run ---


def test_pipe_run_single_step(pm, source, catalog):
    pm.create("single", [
        {"sql": "SELECT * FROM mv_source WHERE category = 'a'",
         "target_table": "default.run_out"},
    ])
    result = pm.run("single")
    assert result["steps_completed"] == 1
    assert result["steps_failed"] == 0
    assert result["step_results"][0]["rows_affected"] == 2
    assert "completed" in result["message"].lower()


def test_pipe_run_failure_stops(pm, source):
    pm.create("failing", [
        {"sql": "SELECT nope FROM mv_source", "target_table": "default.f1"},
        {"sql": "SELECT 1 AS one", "target_table": "default.f2"},
    ])
    result = pm.run("failing")
    assert result["steps_failed"] == 1
    assert result["steps_completed"] == 0
    assert len(result["step_results"]) == 1


def test_pipe_run_updates_last_run_status(pm, source):
    pm.create("lr", [{"sql": "SELECT * FROM mv_source",
                      "target_table": "default.lr_out"}])
    pm.run("lr")
    p = pm.get("lr")
    assert p["last_run"] is not None
    assert p["last_run_status"] == "completed"


def test_pipe_run_failed_status(pm, source):
    pm.create("lrf", [{"sql": "SELECT nope FROM mv_source"}])
    pm.run("lrf")
    assert pm.get("lrf")["last_run_status"] == "failed"


def test_pipe_run_nonexistent_raises(pm):
    with pytest.raises(ValueError, match="does not exist"):
        pm.run("ghost")


def test_pipe_overwrite_mode(pm, source, catalog):
    pm.create("ow", [{"sql": "SELECT * FROM mv_source WHERE category = 'a'",
                      "target_table": "default.ow_out", "mode": "overwrite"}])
    pm.run("ow")
    result = pm.run("ow")  # second run overwrites, not doubles
    assert result["step_results"][0]["rows_affected"] == 2
    assert catalog.load_table("ow_out").scan().count() == 2


def test_pipe_append_mode(pm, source, catalog):
    pm.create("ap", [{"sql": "SELECT * FROM mv_source WHERE category = 'a'",
                      "target_table": "default.ap_out", "mode": "append"}])
    pm.run("ap")
    pm.run("ap")
    assert catalog.load_table("ap_out").scan().count() == 4


def test_pipe_no_target_counts_rows(pm, source):
    pm.create("nt", [{"sql": "SELECT * FROM mv_source"}])
    result = pm.run("nt")
    assert result["steps_completed"] == 1
    assert result["step_results"][0]["rows_affected"] == 3


# --- pipeline dry run / drop ---


def test_pipe_dry_run_validates_without_executing(pm, source, catalog):
    pm.create("dr", [{"sql": "SELECT * FROM mv_source",
                      "target_table": "default.dry_out"}])
    result = pm.dry_run("dr")
    assert result["dry_run"] is True
    assert result["step_results"][0]["status"] == "validated"
    assert "default.dry_out" not in catalog.list_tables()


def test_pipe_dry_run_catches_errors(pm, source):
    pm.create("dre", [{"sql": "SELECT nope FROM mv_source"}])
    result = pm.dry_run("dre")
    assert result["step_results"][0]["status"] == "error"


def test_pipe_dry_run_does_not_update_metadata(pm, source):
    pm.create("drm", [{"sql": "SELECT * FROM mv_source"}])
    pm.dry_run("drm")
    assert pm.get("drm")["last_run"] is None


def test_pipe_drop(pm):
    pm.create("dropme", [{"sql": "SELECT 1"}])
    result = pm.drop("dropme")
    assert "dropped" in result["message"].lower()
    with pytest.raises(ValueError, match="does not exist"):
        pm.get("dropme")

"""Incremental + CDC parity with the reference behavioral corpus
(reference tests/test_incremental.py:1-228, test_cdc.py:1-260).

Ports the assertion CONTENT — watermark lifecycle (set/get with None
defaults, list as rows, reset messages, JSON structure), incremental
reads with row_count/is_full, pipeline runs with status/total_rows/
skipped steps, CDC typed change lists with row/before/after/
changed_columns, the change log entry shape, change summaries with
affected_columns, and export formats — against the repo API."""

from __future__ import annotations

import json

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance import cdc
from iceberg_lakehouse_spark.governance.incremental import (
    WatermarkStore,
    read_incremental,
    run_incremental_pipeline,
)
from iceberg_lakehouse_spark.operators import crud
from iceberg_lakehouse_spark.plans.engine import QueryEngine


@pytest.fixture
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "lake"))


@pytest.fixture
def wm(tmp_path):
    return WatermarkStore(str(tmp_path / "watermarks.json"))


@pytest.fixture
def inc_table(catalog):
    t = catalog.create_table("events", [("id", "long"), ("val", "string")])
    crud.insert_rows(t, [{"id": 1, "val": "a"}, {"id": 2, "val": "b"},
                         {"id": 3, "val": "c"}])
    return t


@pytest.fixture
def cdc_table(catalog):
    t = catalog.create_table("cdc_test", [("id", "long"), ("name", "string"),
                                          ("value", "double")])
    crud.insert_rows(t, [
        {"id": 1, "name": "alice", "value": 10.0},
        {"id": 2, "name": "bob", "value": 20.0},
        {"id": 3, "name": "carol", "value": 30.0},
    ])
    return t


# --- watermarks ---


def test_wm_set_and_get(wm):
    result = wm.set("etl", "default.events", 12345, rows_processed=100)
    assert result["snapshot_id"] == 12345
    assert result["rows_processed"] == 100
    assert wm.get("etl", "default.events")["snapshot_id"] == 12345


def test_wm_get_nonexistent(wm):
    assert wm.get("nope", "default.nothing")["snapshot_id"] is None


def test_wm_overwrite(wm):
    wm.set("etl", "t", 111)
    wm.set("etl", "t", 222)
    assert wm.get("etl", "t")["snapshot_id"] == 222


def test_wm_list_all(wm):
    wm.set("etl", "a", 1)
    wm.set("other", "b", 2)
    assert len(wm.list()) == 2


def test_wm_list_by_pipeline(wm):
    wm.set("etl", "a", 1)
    wm.set("etl", "b", 2)
    wm.set("other", "c", 3)
    assert len(wm.list(pipeline="etl")) == 2


def test_wm_list_empty(wm):
    assert wm.list() == []


def test_wm_reset_table(wm):
    wm.set("etl", "t", 1)
    wm.reset("etl", "t")
    assert wm.get("etl", "t")["snapshot_id"] is None


def test_wm_reset_all(wm):
    wm.set("etl", "a", 1)
    wm.set("etl", "b", 2)
    wm.reset("etl")
    assert wm.list(pipeline="etl") == []


def test_wm_reset_nonexistent(wm):
    result = wm.reset("ghost")
    assert "no watermarks" in result["message"].lower()


def test_wm_json_structure(wm, tmp_path):
    wm.set("etl", "default.events", 12345, rows_processed=100)
    data = json.loads((tmp_path / "watermarks.json").read_text())
    assert "etl" in data
    assert "default.events" in data["etl"]
    entry = data["etl"]["default.events"]
    assert entry["snapshot_id"] == 12345
    assert "processed_at" in entry
    assert entry["rows_processed"] == 100


# --- read_incremental ---


def test_read_no_watermark_returns_all(inc_table, wm):
    result = read_incremental(inc_table, wm, "etl")
    assert result["row_count"] == 3
    assert result["is_full"] is True


def test_read_incremental_returns_new_rows(inc_table, wm):
    wm.set("etl", "default.events", inc_table.current_snapshot().snapshot_id)
    crud.insert_rows(inc_table, [{"id": 4, "val": "d"}, {"id": 5, "val": "e"}])
    result = read_incremental(inc_table, wm, "etl")
    assert result["row_count"] == 2
    assert result["is_full"] is False


def test_read_no_new_data(inc_table, wm):
    wm.set("etl", "default.events", inc_table.current_snapshot().snapshot_id)
    result = read_incremental(inc_table, wm, "etl")
    assert result["row_count"] == 0


# --- incremental pipeline run ---


def test_pipeline_full_first_run(inc_table, wm, catalog):
    eng = QueryEngine(catalog)
    steps = [{"source_table": "default.events", "view_name": "inc",
              "sql": "SELECT * FROM inc", "target_table": "default.inc_out"}]
    result = run_incremental_pipeline(catalog, wm, "etl", steps, eng)
    assert result["status"] == "success"
    assert result["total_rows"] == 3
    assert wm.get("etl", "default.events")["snapshot_id"] is not None


def test_pipeline_incremental_second_run(inc_table, wm, catalog):
    eng = QueryEngine(catalog)
    steps = [{"source_table": "default.events", "view_name": "inc",
              "sql": "SELECT * FROM inc", "target_table": "default.inc_out2"}]
    run_incremental_pipeline(catalog, wm, "etl", steps, eng)
    crud.insert_rows(inc_table, [{"id": 9, "val": "z"}])
    result = run_incremental_pipeline(catalog, wm, "etl", steps, eng)
    assert result["status"] == "success"
    assert result["total_rows"] == 1


def test_pipeline_skip_when_no_new_data(inc_table, wm, catalog):
    eng = QueryEngine(catalog)
    steps = [{"source_table": "default.events", "view_name": "inc",
              "sql": "SELECT * FROM inc", "target_table": "default.inc_out3"}]
    run_incremental_pipeline(catalog, wm, "etl", steps, eng)
    result = run_incremental_pipeline(catalog, wm, "etl", steps, eng)
    assert result["steps"][0]["status"] == "skipped"
    assert result["total_rows"] == 0


# --- CDC: detection ---


def test_cdc_detect_inserts(cdc_table):
    before = cdc_table.current_snapshot().snapshot_id
    crud.insert_rows(cdc_table, [{"id": 4, "name": "diana", "value": 40.0}])
    after = cdc_table.current_snapshot().snapshot_id
    result = cdc.capture_changes(cdc_table, before, after, key_columns=["id"])
    assert result["summary"]["inserts"] == 1
    assert result["summary"]["deletes"] == 0
    assert result["summary"]["updates"] == 0
    inserted = [c for c in result["changes"] if c["type"] == "INSERT"]
    assert inserted[0]["row"]["name"] == "diana"


def test_cdc_detect_deletes(cdc_table):
    before = cdc_table.current_snapshot().snapshot_id
    crud.delete_rows(cdc_table, "id = 2")
    after = cdc_table.current_snapshot().snapshot_id
    result = cdc.capture_changes(cdc_table, before, after, key_columns=["id"])
    assert result["summary"]["deletes"] == 1
    deleted = [c for c in result["changes"] if c["type"] == "DELETE"]
    assert deleted[0]["row"]["id"] == 2


def test_cdc_detect_updates(cdc_table):
    before = cdc_table.current_snapshot().snapshot_id
    crud.update_rows(cdc_table, "id = 1", {"name": "alice_updated"})
    after = cdc_table.current_snapshot().snapshot_id
    result = cdc.capture_changes(cdc_table, before, after, key_columns=["id"])
    assert result["summary"]["updates"] == 1
    updated = [c for c in result["changes"] if c["type"] == "UPDATE"]
    assert updated[0]["before"]["name"] == "alice"
    assert updated[0]["after"]["name"] == "alice_updated"
    assert "name" in updated[0]["changed_columns"]


def test_cdc_mixed_operations(cdc_table):
    before = cdc_table.current_snapshot().snapshot_id
    crud.insert_rows(cdc_table, [{"id": 4, "name": "d", "value": 40.0}])
    crud.update_rows(cdc_table, "id = 2", {"value": 22.0})
    crud.delete_rows(cdc_table, "id = 3")
    after = cdc_table.current_snapshot().snapshot_id
    result = cdc.capture_changes(cdc_table, before, after, key_columns=["id"])
    assert result["summary"]["inserts"] >= 1
    assert result["summary"]["updates"] >= 1
    assert result["summary"]["deletes"] >= 1


def test_cdc_same_snapshot_no_changes(cdc_table):
    s = cdc_table.current_snapshot().snapshot_id
    result = cdc.capture_changes(cdc_table, s, s, key_columns=["id"])
    assert result["summary"] == {"inserts": 0, "updates": 0, "deletes": 0}


# --- CDC: change log ---


def test_cdc_change_log_shape(cdc_table):
    crud.insert_rows(cdc_table, [{"id": 4, "name": "d", "value": 40.0}])
    crud.insert_rows(cdc_table, [{"id": 5, "name": "e", "value": 50.0}])
    log = cdc.change_log(cdc_table, key_columns=["id"])
    assert len(log) >= 2
    for entry in log:
        assert "from_snapshot" in entry
        assert "to_snapshot" in entry
        assert "timestamp" in entry
        assert "summary" in entry
        assert "change_count" in entry


def test_cdc_change_log_single_snapshot(catalog):
    t = catalog.create_table("solo", [("id", "long")])
    crud.insert_rows(t, [{"id": 1}])
    assert cdc.change_log(t) == []


# --- CDC: summary ---


def test_cdc_summary(cdc_table):
    before = cdc_table.current_snapshot().snapshot_id
    crud.insert_rows(cdc_table, [{"id": 4, "name": "diana", "value": 40.0}])
    after = cdc_table.current_snapshot().snapshot_id
    result = cdc.change_summary(cdc_table, before, after, key_columns=["id"])
    assert result["inserts"] == 1
    assert result["total_changes"] == 1
    assert "affected_columns" in result
    assert len(result["affected_columns"]) >= 1


# --- CDC: export ---


def test_cdc_export_json(cdc_table):
    before = cdc_table.current_snapshot().snapshot_id
    crud.insert_rows(cdc_table, [{"id": 4, "name": "diana", "value": 40.0}])
    after = cdc_table.current_snapshot().snapshot_id
    ch = cdc.capture_changes(cdc_table, before, after, key_columns=["id"])
    data = json.loads(cdc.export_changes(ch, "json"))
    assert data["table"] == "default.cdc_test"
    assert data["summary"]["inserts"] == 1
    assert len(data["changes"]) == 1


def test_cdc_export_csv(cdc_table):
    before = cdc_table.current_snapshot().snapshot_id
    crud.insert_rows(cdc_table, [{"id": 4, "name": "diana", "value": 40.0}])
    after = cdc_table.current_snapshot().snapshot_id
    ch = cdc.capture_changes(cdc_table, before, after, key_columns=["id"])
    output = cdc.export_changes(ch, "csv")
    assert "change_type" in output
    assert "INSERT" in output


def test_cdc_export_invalid_format(cdc_table):
    s = cdc_table.current_snapshot().snapshot_id
    ch = cdc.capture_changes(cdc_table, s, s, key_columns=["id"])
    with pytest.raises(ValueError, match="Unsupported format"):
        cdc.export_changes(ch, "xml")

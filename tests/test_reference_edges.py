"""Edge-case behaviors ported from the reference's per-module suites
(reference tests/test_validation.py, test_audit.py, test_lineage.py,
test_pipelines.py, test_maintenance.py, test_import.py, test_export.py,
test_queries.py, test_stats.py — semantics only, re-asserted against the
Spark-first implementations)."""

from __future__ import annotations

import json
import os

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.operators import crud

SCHEMA = [("id", "long"), ("name", "string"), ("v", "double")]


@pytest.fixture()
def catalog(spark, tmp_warehouse):
    return LakehouseCatalog(spark, tmp_warehouse)


@pytest.fixture()
def t(catalog):
    tab = catalog.create_table("edges", SCHEMA)
    crud.insert_rows(tab, [
        {"id": 1, "name": "a", "v": 1.0},
        {"id": 2, "name": "b", "v": 2.0},
    ])
    return tab


# ------------------------------------------------------------- validation

def test_invalid_regex_pattern_rejected_at_add_time(tmp_path):
    from iceberg_lakehouse_spark.governance.validation import ValidationManager

    vr = ValidationManager(str(tmp_path / "rules.json"))
    with pytest.raises(ValueError, match="Invalid regex"):
        vr.add_rule("t", "regex", column="name", pattern="[unclosed")


# ------------------------------------------------------------------ audit

def test_audit_skips_corrupt_lines_and_enforces_cap(tmp_path):
    from iceberg_lakehouse_spark.governance import audit as audit_mod
    from iceberg_lakehouse_spark.governance.audit import AuditLog

    path = tmp_path / "audit.jsonl"
    log = AuditLog(str(path))
    log.record("t1", "insert", rows_affected=1)
    with open(path, "a") as f:
        f.write("{corrupt json\n")
    log.record("t1", "delete", rows_affected=1)
    entries = log.query(table="t1")
    assert [e["operation"] for e in entries] == ["delete", "insert"]
    # cap: flood past MAX_LINES, then one record() → file trimmed oldest-first
    with open(path, "a") as f:
        for _ in range(audit_mod.MAX_LINES + 50):
            f.write(json.dumps({"table": "flood", "operation": "op",
                                "timestamp": "2026-01-01T00:00:00+00:00"}) + "\n")
    log.record("t1", "update", rows_affected=1)
    assert len(log._lines()) <= audit_mod.MAX_LINES
    assert log.query(table="t1", limit=1)[0]["operation"] == "update"


# ---------------------------------------------------------------- lineage

def test_lineage_cycle_terminates_and_remove_preserves_others(tmp_path):
    from iceberg_lakehouse_spark.governance.lineage import LineageManager

    lin = LineageManager(str(tmp_path / "lineage.json"))
    lin.record(["a"], "b", operation="etl")
    lin.record(["b"], "a", operation="backfill")  # cycle a↔b
    lin.record(["b"], "c", operation="mv")
    up = lin.upstream("a")  # must terminate despite the cycle
    assert {d["table"] for d in up} <= {"default.a", "default.b"}
    impact = lin.impact("a")
    assert "default.c" in impact["affected_tables"]
    removed = lin.remove("b", "c")
    assert removed["removed"] == 1
    assert {e["target"] for e in lin.edges()} == {"default.a", "default.b"}


def test_lineage_depth_limit(tmp_path):
    from iceberg_lakehouse_spark.governance.lineage import LineageManager

    lin = LineageManager(str(tmp_path / "lineage.json"))
    for i in range(5):
        lin.record([f"t{i}"], f"t{i+1}", operation="step")
    deep = lin.downstream("t0", max_depth=2)
    assert {d["table"] for d in deep} == {"default.t1", "default.t2"}


# -------------------------------------------------------------- pipelines

def test_pipeline_append_mode_accumulates(catalog, t, tmp_path):
    from iceberg_lakehouse_spark.governance.views import PipelineManager
    from iceberg_lakehouse_spark.plans.engine import QueryEngine

    eng = QueryEngine(catalog)
    p = PipelineManager(str(tmp_path / "pipelines.json"), catalog, eng)
    p.create("acc", [
        {"sql": "SELECT id, name, v FROM edges", "target_table": "edges_copy",
         "mode": "append"},
    ])
    p.run("acc")
    p.run("acc")
    eng.refresh()
    assert eng.execute("SELECT count(*) AS n FROM edges_copy") \
        .collect()[0]["n"] == 4  # 2 rows × 2 appends
    with pytest.raises(ValueError, match="invalid mode"):
        p.create("bad", [
            {"sql": "SELECT 1", "target_table": "x", "mode": "merge"}
        ])


# ------------------------------------------------------------ maintenance

def test_compact_empty_and_single_file_tables(catalog):
    empty = catalog.create_table("empty_t", SCHEMA)
    res = empty.compact()
    assert res["files_before"] == 0
    single = catalog.create_table("single_t", SCHEMA)
    crud.insert_rows(single, [{"id": 1, "name": "x", "v": 0.5}])
    res = single.compact(target_partitions=1)
    assert res["files_after"] == 1
    assert single.scan().count() == 1


def test_orphan_cleanup_idempotent_and_scoped(catalog, t):
    # create an orphan: a data file on disk not referenced by any snapshot
    data_dir = os.path.join(t.root, "data")
    stray_dir = next(
        os.path.join(data_dir, d)
        for d in os.listdir(data_dir)
        if os.path.isdir(os.path.join(data_dir, d))
    )
    stray = os.path.join(stray_dir, "stray-not-referenced.parquet")
    with open(stray, "wb") as f:
        f.write(b"not really parquet")
    # metadata files must not be treated as orphans
    notes = os.path.join(t.root, "_meta", "notes.txt")
    with open(notes, "w") as f:
        f.write("keep me")
    first = t.cleanup_orphans(dry_run=False)
    assert any("stray-not-referenced" in f for f in first)
    second = t.cleanup_orphans(dry_run=False)
    assert second == []
    assert os.path.exists(notes)
    assert t.scan().count() == 2


# ------------------------------------------------------- import / export

def test_import_custom_delimiter_and_no_header(catalog, tmp_path):
    from iceberg_lakehouse_spark.sources.io import import_file

    p = tmp_path / "pipe.csv"
    p.write_text("10|x|1.5\n20|y|2.5\n")
    res = import_file(
        catalog, str(p), "piped", file_format="csv",
        delimiter="|", has_header=False,
    )
    assert res["rows"] == 2
    tab = catalog.load_table("piped")
    assert tab.scan().count() == 2
    assert len(tab.schema().fields) == 3  # auto-named without a header


def test_import_format_override_and_missing_file(catalog, tmp_path):
    from iceberg_lakehouse_spark.sources.io import import_file

    p = tmp_path / "data.txt"  # extension lies; explicit format wins
    p.write_text("id,name\n1,a\n")
    res = import_file(catalog, str(p), "override_t", file_format="csv")
    assert res["rows"] == 1
    with pytest.raises(Exception):
        import_file(catalog, str(tmp_path / "nope.csv"), "missing_t")


def test_export_empty_table_and_parent_dirs(catalog, tmp_path):
    from iceberg_lakehouse_spark.sources.io import export_table

    empty = catalog.create_table("exp_empty", SCHEMA)
    out = tmp_path / "deep" / "nested" / "out.csv"
    res = export_table(empty, str(out), "csv")
    assert res["rows"] == 0 and os.path.exists(out)
    # json export also creates parents
    outj = tmp_path / "deeper" / "out.json"
    export_table(empty, str(outj), "json")
    assert os.path.exists(outj)


def test_export_where_uses_pruned_scan(catalog, tmp_path):
    from iceberg_lakehouse_spark.sources.io import export_table

    tab = catalog.create_table("exp_pruned", [("id", "long"), ("v", "double")])
    for lo in (0, 100):
        crud.insert_rows(tab, [{"id": lo + i, "v": 1.0} for i in range(5)])
    out = tmp_path / "sel.csv"
    res = export_table(tab, str(out), "csv", where="id >= 100")
    assert res["rows"] == 5
    # and the same predicate prunes at plan time
    kept, total = tab.prune_files("id >= 100")
    assert len(kept) < total


# --------------------------------------------------- snapshots / rollback

def test_rollback_requires_target_and_supports_timestamp(catalog, t):
    import datetime

    with pytest.raises(ValueError, match="requires"):
        t.rollback()
    with pytest.raises(ValueError, match="not found"):
        t.rollback(snapshot_id=999999)
    first = t.snapshots()[0]
    crud.insert_rows(t, [{"id": 9, "name": "z", "v": 9.0}])
    ts = datetime.datetime.fromtimestamp(
        first.timestamp_ms / 1000, tz=datetime.timezone.utc
    ).isoformat()
    t.rollback(as_of=ts)
    assert t.scan().count() == 2  # back to the first snapshot's rows
    assert t.snapshots()[-1].operation == "rollback"  # appended, not rewound


def test_expire_requires_criterion_and_accepts_duration(catalog, t):
    with pytest.raises(ValueError, match="requires"):
        t.expire_snapshots()
    crud.insert_rows(t, [{"id": 3, "name": "c", "v": 3.0}])
    # everything is seconds old: a 30d cutoff expires nothing
    res = t.expire_snapshots(older_than="30d")
    assert res["expired"] == []
    # an ISO cutoff in the future expires all but the current snapshot
    res = t.expire_snapshots(older_than="2100-01-01T00:00:00+00:00")
    assert len(res["kept"]) == 1


def test_scan_invalid_snapshot_raises(t):
    with pytest.raises(ValueError, match="not found"):
        t.scan(snapshot_id=123456789)


# ------------------------------------------------------- views / matviews

def test_view_and_matview_reject_blank_name_or_sql(catalog, t, tmp_path):
    from iceberg_lakehouse_spark.governance.views import (
        MatviewManager, ViewManager,
    )
    from iceberg_lakehouse_spark.plans.engine import QueryEngine

    eng = QueryEngine(catalog)
    vm = ViewManager(str(tmp_path / "views.json"), eng)
    with pytest.raises(ValueError, match="name"):
        vm.create("  ", "SELECT 1")
    with pytest.raises(ValueError, match="sql"):
        vm.create("v1", "   ")
    mm = MatviewManager(str(tmp_path / "mv.json"), catalog, eng)
    with pytest.raises(ValueError, match="name"):
        mm.create("", "SELECT 1")
    with pytest.raises(ValueError, match="sql"):
        mm.create("m1", "")


# ------------------------------------------------------------------- CDC

def test_cdc_export_csv_and_invalid_format(catalog, t):
    from iceberg_lakehouse_spark.governance.cdc import (
        capture_changes, export_changes,
    )

    first = t.snapshots()[0].snapshot_id
    crud.insert_rows(t, [{"id": 5, "name": "e", "v": 5.0}])
    latest = t.snapshots()[-1].snapshot_id
    changes = capture_changes(t, first, latest, key_columns=["id"])
    assert changes["summary"]["inserts"] == 1
    csv_text = export_changes(changes, "csv")
    assert "INSERT" in csv_text.upper()
    with pytest.raises(ValueError, match="Unsupported"):
        export_changes(changes, "xml")


# ---------------------------------------------------------- saved queries

def test_saved_query_rejects_blank_name_and_sql(tmp_path):
    from iceberg_lakehouse_spark.governance.queries_store import SavedQueries

    sq = SavedQueries(str(tmp_path / "q.json"))
    with pytest.raises(ValueError, match="name"):
        sq.save("   ", "SELECT 1")
    with pytest.raises(ValueError, match="(?i)sql"):
        sq.save("ok", "")
    sq.save("ok", "SELECT 1")
    assert sq.get("ok")["sql"] == "SELECT 1"


# ------------------------------------------------------------------ stats

def test_stats_stale_after_insert_and_refresh_detects(catalog, t, tmp_path):
    from iceberg_lakehouse_spark.governance.stats import StatsCache

    cache = StatsCache(str(tmp_path / "stats.json"))
    s1 = cache.get(t)
    assert not cache.is_stale(t)
    crud.insert_rows(t, [{"id": 3, "name": "c", "v": 3.0}])
    assert cache.is_stale(t)
    s2 = cache.get(t, refresh=True)
    assert s2["row_count"] == s1["row_count"] + 1
    assert not cache.is_stale(t)

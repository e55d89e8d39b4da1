"""Governance layer tests (reference tests/test_validation.py,
test_masking.py, test_audit.py, test_lineage.py, test_views.py,
test_matviews.py, test_pipelines.py, test_incremental.py, test_cdc.py,
test_quality.py, test_stats.py, test_retention.py, test_maintenance.py,
test_sla.py, test_contracts.py style)."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance.advisor import (
    dashboard,
    estimate_cost,
    optimization_report,
    suggest_partitioning,
)
from iceberg_lakehouse_spark.governance.audit import AuditLog
from iceberg_lakehouse_spark.governance.cdc import (
    capture_changes,
    change_log,
    export_changes,
    replay_changes,
)
from iceberg_lakehouse_spark.governance.contracts import ContractManager
from iceberg_lakehouse_spark.governance.incremental import (
    WatermarkStore,
    incremental_read,
    run_incremental_pipeline,
)
from iceberg_lakehouse_spark.governance.lineage import LineageManager, extract_tables
from iceberg_lakehouse_spark.governance.masking import MaskingManager
from iceberg_lakehouse_spark.governance.policies import (
    MaintenanceManager,
    NotificationManager,
    RetentionManager,
    SlaManager,
)
from iceberg_lakehouse_spark.governance.queries_store import QueryCache, SavedQueries
from iceberg_lakehouse_spark.governance.stats import (
    StatsCache,
    compute_table_stats,
    detect_anomalies,
    quality_score,
)
from iceberg_lakehouse_spark.governance.tagging import CatalogMetadata, TagManager
from iceberg_lakehouse_spark.governance.validation import ValidationManager
from iceberg_lakehouse_spark.governance.views import (
    MatviewManager,
    PipelineManager,
    ViewManager,
)
from iceberg_lakehouse_spark.operators import crud
from iceberg_lakehouse_spark.plans.engine import QueryEngine

SCHEMA = [("id", "long"), ("category", "string"), ("amount", "double")]
ROWS = [
    {"id": 1, "category": "a", "amount": 10.0},
    {"id": 2, "category": "b", "amount": 20.0},
    {"id": 3, "category": "a", "amount": 30.0},
]


@pytest.fixture()
def catalog(spark, tmp_warehouse):
    c = LakehouseCatalog(spark, tmp_warehouse)
    t = c.create_table("expenses", SCHEMA)
    crud.insert_rows(t, ROWS)
    return c


@pytest.fixture()
def table(catalog):
    return catalog.load_table("expenses")


# -- validation (G1) -------------------------------------------------------

def test_validation_rules(tmp_path, table, spark):
    vm = ValidationManager(str(tmp_path / "rules.json"))
    vm.add_rule("expenses", "not_null", column="id")
    vm.add_rule("expenses", "range", column="amount", min_value=0, max_value=100)
    vm.add_rule("expenses", "regex", column="category", pattern="^[a-z]+$")
    vm.add_rule("expenses", "unique", column="id")
    vm.add_rule("expenses", "expression", expression="amount >= 0")
    assert len(vm.list_rules("expenses")) == 5

    good = spark.createDataFrame([(4, "d", 5.0)], "id long, category string, amount double")
    assert vm.validate("expenses", good, existing=table.scan()) == []

    bad = spark.createDataFrame(
        [(None, "UPPER", 500.0), (1, "x", -1.0)],
        "id long, category string, amount double",
    )
    violations = vm.validate("expenses", bad, existing=table.scan())
    kinds = {v["type"] for v in violations}
    assert {"not_null", "range", "regex", "unique", "expression"} == kinds
    with pytest.raises(ValueError, match="Validation failed"):
        vm.enforce("expenses", bad, existing=table.scan())
    assert vm.remove_rule("expenses", vm.list_rules("expenses")[0]["id"])


def test_validation_failing_rows(tmp_path, spark):
    vm = ValidationManager(str(tmp_path / "rules.json"))
    rule = vm.add_rule("t", "expression", expression="amount < 25")
    df = spark.createDataFrame([(1, 10.0), (2, 30.0), (3, 40.0)], "id long, amount double")
    failing = vm.failing_rows(rule, df).collect()
    assert [r["rowid"] for r in failing] == [1, 2]


# -- masking (G2) ----------------------------------------------------------

def test_masking_strategies(tmp_path, spark):
    mm = MaskingManager(str(tmp_path / "mask.json"))
    mm.add_policy("users", "email", "hash")
    mm.add_policy("users", "name", "truncate", options={"length": 2})
    mm.add_policy("users", "ssn", "redact")
    mm.add_policy("other", "phone", "nullify")
    df = spark.createDataFrame(
        [("a@x.com", "alice", "123-45-6789", "555-1234", 1)],
        "email string, name string, ssn string, phone string, id long",
    )
    # cross-table-by-column-name quirk: 'phone' policy from table
    # 'other' applies to this result too
    out = mm.apply(df, table="users").collect()[0]
    assert len(out["email"]) == 16 and out["email"] != "a@x.com"
    assert out["name"] == "al***"
    assert out["ssn"] == "***"
    assert out["phone"] is None
    assert out["id"] == 1  # unmasked


# -- audit (G5) ------------------------------------------------------------

def test_audit_log(tmp_path):
    log = AuditLog(str(tmp_path / "audit.log"))
    log.record("t1", "insert", 5)
    log.record("t1", "delete", 2)
    log.record("t2", "insert", 7)
    assert len(log.query()) == 3
    assert len(log.query(table="t1")) == 2
    assert log.query(operation="insert")[0]["table"] == "t2"  # newest first
    assert log.clear(older_than="1h")["cleared"] == 0  # all fresh
    assert log.clear()["cleared"] == 3


# -- lineage (G4) ----------------------------------------------------------

def test_lineage_walks(tmp_path):
    lm = LineageManager(str(tmp_path / "lineage.json"))
    lm.record(["a"], "b", "pipeline")
    lm.record(["b"], "c", "matview")
    lm.record(["b"], "c", "matview")  # dedupe
    assert len(lm.edges()) == 2
    assert [d["table"] for d in lm.downstream("a")] == ["default.b", "default.c"]
    assert [d["table"] for d in lm.upstream("c")] == ["default.b", "default.a"]
    assert lm.impact("a")["affected_count"] == 2
    assert extract_tables("SELECT * FROM orders JOIN lineitem", ["default.orders", "default.lineitem", "default.part"]) == ["default.orders", "default.lineitem"]


# -- tags + metadata (G6/G7) ----------------------------------------------

def test_tagging_and_metadata(tmp_path):
    tm = TagManager(str(tmp_path / "tags.json"))
    tm.add_tag("expenses", "Finance")
    tm.add_tag("expenses", "monthly")
    tm.set_description("expenses", "Monthly expense fact table")
    tm.bookmark("expenses")
    assert tm.info("expenses")["tags"] == ["finance", "monthly"]
    assert tm.bookmarks() == ["default.expenses"]
    assert tm.search("finance")[0]["table"] == "default.expenses"
    assert tm.search("exp", catalog_tables=["default.expenses2"])  # catalog names too

    cm = CatalogMetadata(str(tmp_path / "meta.json"))
    cm.classify_column("expenses", "category", "internal")
    cm.classify_column("users", "email", "pii")
    with pytest.raises(ValueError, match="invalid classification"):
        cm.classify_column("t", "c", "nope")
    assert cm.pii_columns() == [{"table": "default.users", "column": "email"}]
    cm.add_glossary_term("MRR", "Monthly recurring revenue", aliases=["monthly rev"])
    assert cm.lookup_term("monthly rev")["term"] == "mrr"


# -- views / matviews / pipelines (V1-V3) ----------------------------------

def test_views_matviews_pipelines(tmp_path, catalog):
    eng = QueryEngine(catalog)
    vm = ViewManager(str(tmp_path / "views.json"), eng)
    vm.create("totals", "SELECT category, sum(amount) AS total FROM expenses GROUP BY category")
    assert vm.query("totals").count() == 2
    with pytest.raises(ValueError, match="already exists"):
        vm.create("totals", "SELECT 1")

    lm = LineageManager(str(tmp_path / "lineage.json"))
    mm = MatviewManager(str(tmp_path / "mv.json"), catalog, eng, lineage=lm)
    mm.create("cat_totals", "SELECT category, sum(amount) AS total FROM expenses GROUP BY category")
    assert mm.query("cat_totals").count() == 2
    assert not mm.freshness("cat_totals")["stale"]
    crud.insert_rows(catalog.load_table("expenses"), [{"id": 9, "category": "z", "amount": 1.0}])
    fresh = mm.freshness("cat_totals")
    assert fresh["stale"] and fresh["changed_tables"] == ["default.expenses"]
    mm.refresh("cat_totals")
    assert mm.query("cat_totals").count() == 3
    assert not mm.freshness("cat_totals")["stale"]
    assert lm.downstream("default.expenses")[0]["table"] == "default.mv_cat_totals"
    mm.drop("cat_totals")
    assert not catalog.table_exists("default.mv_cat_totals")

    pm = PipelineManager(str(tmp_path / "pipes.json"), catalog, eng, lineage=lm)
    pm.create(
        "daily",
        [
            {"sql": "SELECT category, count(*) AS n FROM expenses GROUP BY category",
             "target_table": "default.cat_counts"},
            {"sql": "SELECT * FROM cat_counts WHERE n > 1",
             "target_table": "default.hot_cats", "mode": "overwrite"},
        ],
    )
    dry = pm.dry_run("daily")
    assert all(s["status"] == "validated" for s in dry["step_results"])
    run = pm.run("daily")
    assert run["status"] == "completed"
    assert catalog.load_table("hot_cats").scan().count() >= 1
    # error stops the pipeline
    pm.create("broken", [{"sql": "SELECT * FROM nope_table"}])
    assert pm.run("broken")["status"] == "failed"


# -- incremental (I1-I3) ---------------------------------------------------

def test_incremental_read_modes(tmp_path, catalog, table):
    wm = WatermarkStore(str(tmp_path / "wm.json"))
    df, info = incremental_read(table, wm, "p1")
    assert info["mode"] == "full" and df.count() == 3
    wm.set("p1", "default.expenses", table.current_snapshot().snapshot_id)
    df, info = incremental_read(table, wm, "p1")
    assert info["mode"] == "none" and df.count() == 0
    crud.insert_rows(table, [{"id": 4, "category": "c", "amount": 4.0}])
    df, info = incremental_read(table, wm, "p1")
    assert info["mode"] == "append_files" and df.count() == 1
    assert df.collect()[0]["id"] == 4
    # overwrite breaks the append chain → EXCEPT diff
    crud.update_rows(table, "id = 1", {"amount": 99.0})
    df, info = incremental_read(table, wm, "p1")
    assert info["mode"] == "except_diff"
    ids = sorted(r["id"] for r in df.collect())
    assert ids == [1, 4]  # updated row + appended row


def test_incremental_pipeline(tmp_path, catalog, spark):
    wm = WatermarkStore(str(tmp_path / "wm.json"))
    eng = QueryEngine(catalog)
    steps = [
        {
            "source_table": "default.expenses",
            "view_name": "inc",
            "sql": "SELECT category, count(*) AS n FROM inc GROUP BY category",
            "target_table": "default.inc_counts",
        }
    ]
    res = run_incremental_pipeline(catalog, wm, "p2", steps, eng)
    assert res["status"] == "success" and res["steps"][0]["rows"] == 2
    # second run: nothing new
    res = run_incremental_pipeline(catalog, wm, "p2", steps, eng)
    assert res["steps"][0]["rows"] == 0
    assert res["steps"][0]["status"] == "skipped"
    crud.insert_rows(
        catalog.load_table("expenses"), [{"id": 7, "category": "q", "amount": 2.0}]
    )
    res = run_incremental_pipeline(catalog, wm, "p2", steps, eng)
    assert res["steps"][0]["rows"] == 1 and res["total_rows"] == 1
    assert catalog.load_table("inc_counts").scan().count() == 3


# -- CDC (I4-I7) -----------------------------------------------------------

def test_cdc_classify_export_replay(catalog, table):
    s1 = table.current_snapshot().snapshot_id
    crud.insert_rows(table, [{"id": 4, "category": "d", "amount": 40.0}])
    crud.update_rows(table, "id = 2", {"amount": 22.0})
    crud.delete_rows(table, "id = 3")
    s2 = table.current_snapshot().snapshot_id
    ch = capture_changes(table, s1, s2, key_columns=["id"])
    assert ch["summary"] == {"inserts": 1, "updates": 1, "deletes": 1}
    assert ch["inserts"][0]["id"] == 4
    assert ch["updates"][0]["changed_columns"] == ["amount"]
    assert ch["deletes"][0]["id"] == 3

    csv_out = export_changes(ch, "csv")
    assert "UPDATE_BEFORE" in csv_out and "UPDATE_AFTER" in csv_out
    assert "INSERT" in csv_out and "DELETE" in csv_out

    log = change_log(table, key_columns=["id"])
    assert len(log) == 3  # three commits after s1
    assert log[0]["to_snapshot"] == s2

    # replay onto a clone of the old state
    clone = catalog.create_table("replay_target", SCHEMA)
    clone.append(table.scan(snapshot_id=s1))
    applied = replay_changes(clone, ch)
    assert applied == {"inserts": 1, "updates": 1, "deletes": 1}
    a = {r["id"]: r for r in clone.scan().collect()}
    assert set(a) == {1, 2, 4}
    assert a[2]["amount"] == 22.0


# -- stats / quality (A9-A11) ---------------------------------------------

def test_stats_and_cache(tmp_path, table):
    stats = compute_table_stats(table)
    assert stats["row_count"] == 3
    assert stats["columns"]["id"]["distinct"] == 3
    assert stats["columns"]["amount"]["max"] == 30.0
    sc = StatsCache(str(tmp_path / "stats.json"))
    first = sc.get(table)
    assert first["cached"] is False
    assert sc.get(table)["cached"] is True
    assert not sc.is_stale(table)
    crud.insert_rows(table, [{"id": 5, "category": "e", "amount": 5.0}])
    assert sc.is_stale(table)
    assert sc.get(table)["row_count"] == 4


def test_quality_and_anomalies(table):
    stats = compute_table_stats(table)
    q = quality_score(stats)
    assert q["completeness"] == 100.0
    assert q["freshness"] == 100.0
    assert 0 < q["score"] <= 100
    new_stats = {
        **stats,
        "row_count": 30,
        "columns": {
            **stats["columns"],
            "amount": {**stats["columns"]["amount"], "null_pct": 45.0, "max": 30000.0},
        },
    }
    kinds = {a["type"] for a in detect_anomalies(stats, new_stats)}
    assert {"row_count_change", "null_rate_increase", "max_spike"} <= kinds


# -- retention / maintenance / sla / notifications (G8-G11) ---------------

def test_retention_policy(tmp_path, table):
    rm = RetentionManager(str(tmp_path / "ret.json"))
    with pytest.raises(ValueError, match="min_snapshots_to_keep"):
        rm.set_policy("default.expenses", min_snapshots_to_keep=0)
    rm.set_policy("default.expenses", max_snapshot_count=2)
    for i in range(4):
        crud.insert_rows(table, [{"id": 50 + i, "category": "r", "amount": 1.0}])
    assert len(table.snapshots()) == 5
    res = rm.apply(table)
    assert res["action"] == "expired" and res["remaining"] == 2
    assert len(table.snapshots()) == 2


def test_maintenance(tmp_path, table):
    mm = MaintenanceManager(str(tmp_path / "maint.json"))
    mm.set_policy("default.expenses", auto_compact_threshold=2)
    for i in range(3):
        crud.insert_rows(table, [{"id": 60 + i, "category": "m", "amount": 1.0}])
    needed = mm.check_needed(table)
    assert needed["needs_compact"]
    res = mm.run(table)
    actions = {a["action"] for a in res["actions"]}
    assert "compact" in actions
    assert table.scan().count() == 6


def test_sla_and_notifications(tmp_path, table):
    sm = SlaManager(str(tmp_path / "sla.json"))
    sm.set_sla("default.expenses", min_row_count=10, max_null_pct=50)
    stats = compute_table_stats(table)
    res = sm.check(table, stats)
    assert not res["ok"] and "Row count" in res["violations"][0]
    assert res["status"] == "violation" and res["recommendations"]
    assert len(sm.history("default.expenses")) == 1

    nm = NotificationManager(str(tmp_path / "notif.json"))
    log = str(tmp_path / "events.log")
    nm.add_handler("default.expenses", "sla_violation", "log", {"file": log})
    nm.add_handler("*", "all", "log", {"file": log})
    fired = nm.fire_event("default.expenses", "sla_violation", {"violations": res["violations"]})
    assert fired["handlers_triggered"] == 2
    hist = nm.history("default.expenses")
    assert len(hist) == 1 and hist[0]["handlers_triggered"] == 2


# -- advisor / dashboard (G21/G17/A12) ------------------------------------

def test_advisor(table):
    stats = {"default.expenses": compute_table_stats(table)}
    history = [
        {"sql": "SELECT * FROM expenses WHERE category = 'a'", "duration_s": 0.5},
        {"sql": "SELECT * FROM expenses WHERE category = 'a'", "duration_s": 0.6},
        {"sql": "SELECT category, sum(amount) FROM expenses GROUP BY category", "duration_s": 2.0},
        {"sql": "SELECT category, sum(amount) FROM expenses GROUP BY category", "duration_s": 2.1},
    ]
    cost = estimate_cost(history[0]["sql"], {"expenses": stats["default.expenses"]})
    assert cost["has_filter"] and cost["estimated_rows_scanned"] == 0  # 3*0.3 → int 0
    sugg = suggest_partitioning(history, stats)
    assert any(s["column"] == "category" for s in sugg)
    report = optimization_report(history, stats)
    assert 0 <= report["optimization_score"] <= 100
    assert report["materialization_suggestions"]


def test_dashboard(tmp_path, catalog, table):
    sc = StatsCache(str(tmp_path / "stats.json"))
    sc.get(table)
    d = dashboard(catalog, sc)
    assert d["total_tables"] == 1
    assert d["tables"][0]["rows"] == 3
    assert d["tables"][0]["health"] == "Good"
    assert "default" in d["namespaces"]
    assert d["total_size_display"].split()[-1] in ("B", "KB", "MB")


# -- saved queries + cache (G19/G20) ---------------------------------------

def test_saved_queries_history(tmp_path):
    sq = SavedQueries(str(tmp_path / "q.json"))
    sq.save("top", "SELECT 1", "desc")
    assert sq.get("top")["sql"] == "SELECT 1"
    sq.record_history("SELECT 1", 0.1, 1)
    sq.record_history("SELECT 2", 0.2, 2)
    assert sq.history()[0]["sql"] == "SELECT 2"  # newest first
    sq.delete("top")
    with pytest.raises(ValueError, match="not found"):
        sq.get("top")


def test_query_cache(tmp_path):
    qc = QueryCache(str(tmp_path / "cache.json"), ttl_s=300)
    assert qc.get("SELECT * FROM t") is None
    qc.put("SELECT * FROM t", [{"a": 1}], ["t"])
    assert qc.get("select  *  from t") == [{"a": 1}]  # normalized key
    assert qc.invalidate_table("t") == 1
    assert qc.get("SELECT * FROM t") is None
    s = qc.stats()
    assert s["hits"] == 1 and s["misses"] == 2


# -- contracts (G3) --------------------------------------------------------

def test_contracts_lifecycle(tmp_path, table, spark):
    cm = ContractManager(str(tmp_path / "contracts.json"))
    c = cm.generate_from_stats(table)
    assert c["version"] == 1
    kinds = {x["type"] for x in c["constraints"]}
    assert {"not_null", "range", "enum"} <= kinds
    # current data complies with its own generated contract
    v = cm.violations(table)
    assert v["compliant"], v
    assert cm.compliance_score(table) == 100.0

    # break the range constraint
    bad = spark.createDataFrame([(99, "zzz", 1e9)], "id long, category string, amount double")
    row_v = cm.validate_rows("default.expenses", bad)
    assert any(x["constraint"] == "range" for x in row_v)
    assert any(x["constraint"] == "enum" for x in row_v)

    # version bump + diff + deprecate
    cm.update("default.expenses", schema={**c["schema"], "extra": {"type": "string", "nullable": True}})
    assert cm.get("default.expenses")["version"] == 2
    diff = cm.diff_versions("default.expenses", 1, 2)
    assert diff["added_columns"] == ["extra"]
    cm.deprecate("default.expenses")
    assert cm.get("default.expenses")["status"] == "deprecated"

    cm.register_consumer("default.expenses", "dashboard-app")
    assert cm.consumers("default.expenses") == ["dashboard-app"]
    cov = cm.coverage(["default.expenses", "default.other"])
    assert cov["pct"] == 50.0


def test_contracts_dry_run_monitor_dashboard(tmp_path, catalog, table, spark):
    cm = ContractManager(str(tmp_path / "c2.json"))
    proposal = {
        "schema": {"id": {"type": "bigint"}, "ghost_col": {"type": "string"}},
        "constraints": [{"type": "range", "column": "amount", "min": 0, "max": 15}],
    }
    res = cm.dry_run(table, proposal)
    assert not res["ok"]
    kinds = {v["kind"] for v in res["would_violate"]}
    assert kinds == {"schema", "constraint"}  # ghost col + amounts > 15
    assert "__dry_run__" not in cm.list()  # no persistence leak

    cm.generate_from_stats(table)
    cm.monitor(table)
    cm.monitor(table)
    tr = cm.trends("default.expenses")
    assert tr["checks"] == 2 and tr["latest"] == 100.0 and tr["improving"]

    other = catalog.create_table("uncovered_t", SCHEMA)
    dash = cm.dashboard([table, other])
    assert dash["covered"] == 1 and dash["uncovered"] == 1
    assert dash["avg_score"] == 100.0

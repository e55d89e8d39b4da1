"""Deep behavioral tests for the governance modules, ported from the
reference's per-module suites (test_validation.py, test_masking.py,
test_schema_evolution.py, test_retention.py, test_sla.py,
test_notifications.py, test_queries.py, test_query_cache.py,
test_audit.py, test_cdc.py, test_incremental.py): error paths and
edge-case semantics, pytest.raises everywhere."""

from __future__ import annotations

import time
from datetime import datetime, timedelta, timezone

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance import cdc, schema_evolution as se
from iceberg_lakehouse_spark.governance.audit import AuditLog
from iceberg_lakehouse_spark.governance.incremental import (
    WatermarkStore,
    incremental_read,
)
from iceberg_lakehouse_spark.governance.masking import MaskingManager
from iceberg_lakehouse_spark.governance.policies import (
    MaintenanceManager,
    NotificationManager,
    RetentionManager,
    SlaManager,
)
from iceberg_lakehouse_spark.governance.queries_store import (
    QueryCache,
    SavedQueries,
    normalize_sql,
)
from iceberg_lakehouse_spark.governance.stats import compute_table_stats, quality_score
from iceberg_lakehouse_spark.governance.tagging import CatalogMetadata, TagManager
from iceberg_lakehouse_spark.governance.validation import ValidationManager
from iceberg_lakehouse_spark.operators import crud

SCHEMA = [("id", "long"), ("name", "string"), ("value", "double")]
ROWS = [
    {"id": 1, "name": "alice", "value": 10.0},
    {"id": 2, "name": "bob", "value": 20.0},
]


@pytest.fixture()
def catalog(spark, tmp_warehouse):
    return LakehouseCatalog(spark, tmp_warehouse)


@pytest.fixture()
def metrics(catalog):
    t = catalog.create_table("metrics", SCHEMA)
    crud.insert_rows(t, ROWS)
    return t


# ---------------------------------------------------------------- validation

class TestValidationRuleCrud:
    @pytest.fixture()
    def vm(self, tmp_path):
        return ValidationManager(str(tmp_path / "v.json"))

    def test_unknown_rule_type_raises(self, vm):
        with pytest.raises(ValueError, match="Invalid rule type"):
            vm.add_rule("t", "bogus", column="x")

    def test_column_required(self, vm):
        for rt in ("not_null", "range", "regex"):
            with pytest.raises(ValueError, match="requires 'column'"):
                vm.add_rule("t", rt)
        with pytest.raises(ValueError, match="requires 'columns'"):
            vm.add_rule("t", "unique")

    def test_range_requires_bound(self, vm):
        with pytest.raises(ValueError, match="requires at least"):
            vm.add_rule("t", "range", column="x")

    def test_regex_requires_pattern(self, vm):
        with pytest.raises(ValueError, match="requires 'pattern'"):
            vm.add_rule("t", "regex", column="x")

    def test_expression_requires_expression(self, vm):
        with pytest.raises(ValueError, match="requires 'sql'"):
            vm.add_rule("t", "expression")

    def test_auto_ids_are_unique(self, vm):
        r1 = vm.add_rule("t", "not_null", column="a")
        r2 = vm.add_rule("t", "not_null", column="a")
        assert r1["id"] != r2["id"]

    def test_remove_rule(self, vm):
        r = vm.add_rule("t", "not_null", column="a")
        assert "Removed" in vm.remove_rule("t", r["id"])["message"]
        with pytest.raises(ValueError, match="not found"):
            vm.remove_rule("t", r["id"])
        assert vm.list_rules("t") == []


class TestValidationChecks:
    @pytest.fixture()
    def vm(self, tmp_path):
        return ValidationManager(str(tmp_path / "v.json"))

    def test_not_null_counts(self, vm, spark):
        vm.add_rule("t", "not_null", column="a")
        df = spark.createDataFrame([(None,), (1,), (None,)], "a int")
        v = vm.validate("t", df)
        assert v[0]["failed_rows"] == 2

    def test_range_min_only_and_max_only(self, vm, spark):
        vm.add_rule("t", "range", column="a", min_value=0)
        vm.add_rule("t", "range", column="a", max_value=10)
        df = spark.createDataFrame([(-1,), (5,), (11,)], "a int")
        v = vm.validate("t", df)
        assert [x["failed_rows"] for x in v] == [1, 1]

    def test_regex_nulls_exempt(self, vm, spark):
        vm.add_rule("t", "regex", column="a", pattern="^[a-z]+$")
        df = spark.createDataFrame([("ok",), ("NO",), (None,)], "a string")
        assert vm.validate("t", df)[0]["failed_rows"] == 1

    def test_unique_within_batch(self, vm, spark):
        vm.add_rule("t", "unique", column="a")
        df = spark.createDataFrame([(1,), (1,), (2,)], "a int")
        v = vm.validate("t", df)
        assert "duplicated within batch" in v[0]["detail"]

    def test_unique_vs_existing(self, vm, spark):
        vm.add_rule("t", "unique", column="a")
        batch = spark.createDataFrame([(1,), (3,)], "a int")
        existing = spark.createDataFrame([(1,), (2,)], "a int")
        v = vm.validate("t", batch, existing)
        assert v[0]["failed_rows"] == 1
        assert "already present" in v[0]["detail"]

    def test_expression_null_passes(self, vm, spark):
        vm.add_rule("t", "expression", expression="a > 0")
        df = spark.createDataFrame([(1,), (-1,), (None,)], "a int")
        # NULL predicate drops out of WHERE NOT(expr) -> passes, the
        # reference's SQL semantics (validation.py:224-228): 1 failure
        assert vm.validate("t", df)[0]["failed_rows"] == 1

    def test_missing_column_flags_rule(self, vm, spark):
        vm.add_rule("t", "not_null", column="ghost")
        df = spark.createDataFrame([(1,)], "a int")
        v = vm.validate("t", df)
        assert v[0]["failed_rows"] == -1 and "missing" in v[0]["detail"]

    def test_enforce_raises_with_all_violations(self, vm, spark):
        vm.add_rule("t", "not_null", column="a")
        vm.add_rule("t", "range", column="a", min_value=0)
        df = spark.createDataFrame([(None,), (-1,)], "a int")
        with pytest.raises(ValueError, match="Validation failed"):
            vm.enforce("t", df)

    def test_enforce_clean_passes(self, vm, spark):
        vm.add_rule("t", "not_null", column="a")
        vm.enforce("t", spark.createDataFrame([(1,)], "a int"))

    def test_failing_rows_returns_offenders(self, vm, spark):
        rule = vm.add_rule("t", "range", column="a", max_value=5)
        df = spark.createDataFrame([(1,), (9,)], "a int")
        rows = vm.failing_rows(rule, df).collect()
        assert [r["a"] for r in rows] == [9]


# ------------------------------------------------------------------- masking

class TestMasking:
    @pytest.fixture()
    def mm(self, tmp_path):
        return MaskingManager(str(tmp_path / "m.json"))

    def test_unknown_strategy_raises(self, mm):
        with pytest.raises(ValueError, match="Invalid strategy"):
            mm.add_policy("t", "a", "rot13")

    def test_expression_strategy_requires_sql_option(self, mm):
        with pytest.raises(ValueError, match="sql"):
            mm.add_policy("t", "a", "expression")

    def test_hash_deterministic_and_null_preserving(self, mm, spark):
        mm.add_policy("t", "email", "hash")
        df = spark.createDataFrame(
            [("x@y.com",), ("x@y.com",), (None,)], "email string"
        )
        out = [r["email"] for r in mm.apply(df, "t").collect()]
        assert out[0] == out[1] and len(out[0]) == 16
        assert out[2] is None

    def test_redact_custom_replacement(self, mm, spark):
        mm.add_policy("t", "ssn", "redact", options={"replacement": "[HIDDEN]"})
        df = spark.createDataFrame([("123-45-6789",), (None,)], "ssn string")
        out = [r["ssn"] for r in mm.apply(df, "t").collect()]
        assert out == ["[HIDDEN]", None]

    def test_nullify(self, mm, spark):
        mm.add_policy("t", "phone", "nullify")
        df = spark.createDataFrame([("555",)], "phone string")
        assert mm.apply(df, "t").collect()[0]["phone"] is None

    def test_truncate_length(self, mm, spark):
        mm.add_policy("t", "name", "truncate", options={"length": 2})
        df = spark.createDataFrame([("alice",)], "name string")
        assert mm.apply(df, "t").collect()[0]["name"] == "al***"

    def test_cross_table_policies_apply_by_column_name(self, mm, spark):
        """Reference quirk: a policy on any table masks same-named
        columns in every query result (masking.py:167-171)."""
        mm.add_policy("other_table", "email", "redact")
        df = spark.createDataFrame([("x@y.com",)], "email string")
        assert mm.apply(df).collect()[0]["email"] == "***"

    def test_own_table_policy_wins(self, mm, spark):
        mm.add_policy("other", "email", "redact", options={"replacement": "OTHER"})
        mm.add_policy("mine", "email", "redact", options={"replacement": "MINE"})
        df = spark.createDataFrame([("x",)], "email string")
        assert mm.apply(df, "mine").collect()[0]["email"] == "MINE"

    def test_remove_policy(self, mm, spark):
        mm.add_policy("t", "a", "nullify")
        assert "removed" in mm.remove_policy("t", "a")["message"].lower()
        assert "no masking policy" in mm.remove_policy("t", "a")["message"].lower()
        df = spark.createDataFrame([("keep",)], "a string")
        assert mm.apply(df, "t").collect()[0]["a"] == "keep"


# ---------------------------------------------------------- schema evolution

class TestSchemaEvolution:
    def test_add_drop_rename_and_history(self, metrics):
        metrics.add_column("note", "string")
        metrics.rename_column("note", "comment")
        metrics.drop_column("comment")
        hist = metrics.schema_history()
        assert [h["version"] for h in hist][-3:] == [2, 3, 4]

    def test_add_existing_column_raises(self, metrics):
        with pytest.raises(ValueError, match="already exists"):
            metrics.add_column("name", "string")

    def test_drop_missing_column_raises(self, metrics):
        with pytest.raises(ValueError, match="does not exist"):
            metrics.drop_column("ghost")

    def test_rename_to_existing_raises(self, metrics):
        with pytest.raises(ValueError, match="already exists"):
            metrics.rename_column("name", "value")

    def test_version_not_found_raises(self, metrics):
        with pytest.raises(ValueError, match="version 99 not found"):
            se.schema_at_version(metrics, 99)

    def test_diff_and_migration_steps(self, metrics):
        metrics.add_column("note", "string")
        metrics.drop_column("name")
        v = metrics.schema_history()[-1]["version"]
        d = se.diff_schemas(metrics, 2, v)
        assert d == {
            "added": [],
            "dropped": ["name"],
            "renamed": [],
            "type_changed": [],
        }
        steps = se.migration_steps(metrics, 2, v)
        assert steps == ["DROP COLUMN name"]

    def test_rename_reports_as_rename_not_drop_add(self, metrics):
        """G18 field-id semantics (VERDICT r3 #2): add → rename → diff
        must report a rename — the field keeps its id through the
        rename (reference schema_evolution.py:148-157)."""
        metrics.add_column("note", "string")
        v_add = metrics.schema_history()[-1]["version"]
        metrics.rename_column("note", "comment")
        v_ren = metrics.schema_history()[-1]["version"]
        d = se.diff_schemas(metrics, v_add, v_ren)
        assert d["added"] == [] and d["dropped"] == []
        assert len(d["renamed"]) == 1
        r = d["renamed"][0]
        assert (r["from"], r["to"]) == ("note", "comment")
        # id stability: the renamed field carries the id 'note' got
        added_id = next(
            f["id"]
            for f in se.fields_at_version(metrics, v_add)
            if f["name"] == "note"
        )
        assert r["field_id"] == added_id
        # migration emits a RENAME step; compat: warns, doesn't break
        assert "RENAME COLUMN note TO comment" in se.migration_steps(
            metrics, v_add, v_ren
        )
        c = se.check_compatibility(metrics, v_add, v_ren)
        assert c["compatible"] is True
        assert any("note" in w and "comment" in w for w in c["warnings"])

    def test_field_ids_never_reused_after_drop(self, metrics):
        metrics.add_column("a1", "string")
        id_a1 = metrics.meta()["schema"]["fields"][-1]["id"]
        metrics.drop_column("a1")
        metrics.add_column("a2", "string")
        id_a2 = metrics.meta()["schema"]["fields"][-1]["id"]
        assert id_a2 > id_a1, "dropped ids must never be reassigned"

    def test_legacy_table_without_ids_backfills_and_falls_back(self, tmp_path, spark):
        """A table whose metadata predates field ids: diffs against
        pre-backfill versions fall back to name-based (rename shows as
        drop+add there), while post-backfill versions diff by id."""
        import json
        import os

        from iceberg_lakehouse_spark.catalog import LakehouseCatalog

        cat = LakehouseCatalog(spark, str(tmp_path / "legacy_wh"))
        t = cat.create_table("legacy", [("x", "long"), ("y", "string")])
        # simulate a pre-field-id table by stripping ids from metadata
        meta_path = os.path.join(t.root, "_meta", "table.json")
        with open(meta_path) as f:
            meta = json.load(f)
        for fld in meta["schema"]["fields"]:
            fld.pop("id", None)
        meta["schema"].pop("last_field_id", None)
        for h in meta["schema_history"]:
            for fld in h["fields"]:
                fld.pop("id", None)
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        t.add_column("z", "string")  # triggers backfill
        assert all("id" in fld for fld in t.meta()["schema"]["fields"])
        v_add = t.schema_history()[-1]["version"]
        t.rename_column("z", "zz")
        v_ren = t.schema_history()[-1]["version"]
        # v1 predates ids → name-based fallback, no renamed reporting
        d_legacy = se.diff_schemas(t, 1, v_ren)
        assert d_legacy["renamed"] == []
        assert "zz" in d_legacy["added"]
        # post-backfill versions diff by id → rename is a rename
        d_new = se.diff_schemas(t, v_add, v_ren)
        assert [(r["from"], r["to"]) for r in d_new["renamed"]] == [("z", "zz")]

    def test_compatibility_add_is_compatible(self, metrics):
        metrics.add_column("note", "string")
        v = metrics.schema_history()[-1]["version"]
        c = se.check_compatibility(metrics, 1, v)
        assert c["compatible"] is True and c["breaking_changes"] == []

    def test_compatibility_drop_is_breaking(self, metrics):
        metrics.drop_column("name")
        v = metrics.schema_history()[-1]["version"]
        c = se.check_compatibility(metrics, 1, v)
        assert c["compatible"] is False
        assert "dropped column 'name'" in c["breaking_changes"]


# ----------------------------------------------------------------- retention

class TestRetention:
    @pytest.fixture()
    def rm(self, tmp_path):
        return RetentionManager(str(tmp_path / "r.json"))

    def test_min_keep_must_be_positive(self, rm):
        with pytest.raises(ValueError, match="min_snapshots_to_keep"):
            rm.set_policy("t", min_snapshots_to_keep=0)

    def test_no_policy_is_noop(self, rm, metrics):
        res = rm.apply(metrics)
        assert res["action"] == "no_policy"

    def test_count_policy_expires(self, rm, metrics):
        for i in range(3):
            crud.insert_rows(metrics, [{"id": 10 + i, "name": "x", "value": 1.0}])
        assert len(metrics.snapshots()) == 4
        rm.set_policy("default.metrics", max_snapshot_count=2)
        res = rm.apply(metrics)
        assert res["action"] == "expired" and res["expired"] == 2
        assert len(metrics.snapshots()) == 2

    def test_dry_run_does_not_expire(self, rm, metrics):
        crud.insert_rows(metrics, [{"id": 9, "name": "x", "value": 1.0}])
        rm.set_policy("default.metrics", max_snapshot_count=1)
        rm.apply(metrics, dry_run=True)
        assert len(metrics.snapshots()) == 2


# --------------------------------------------------------------- maintenance

class TestMaintenancePolicies:
    @pytest.fixture()
    def mm(self, tmp_path):
        return MaintenanceManager(str(tmp_path / "m.json"))

    def test_unknown_keys_raise(self, mm):
        with pytest.raises(ValueError, match="unknown policy keys"):
            mm.set_policy("t", max_files=5)

    def test_no_policy_returns_none_and_check_reports_it(self, mm, metrics):
        assert mm.get_policy("t") is None
        chk = mm.check_needed(metrics)
        assert chk["has_policy"] is False and chk["actions_needed"] == []

    def test_check_needed_thresholds(self, mm, metrics):
        mm.set_policy("default.metrics", auto_compact_threshold=1)
        chk = mm.check_needed(metrics)
        assert chk["has_policy"] is True
        assert chk["needs_compact"] is True
        assert chk["needs_orphan_cleanup"] is False
        assert any("compact" in a for a in chk["actions_needed"])

    def test_run_dry_run_reports_without_acting(self, mm, metrics):
        mm.set_policy("default.metrics", auto_compact_threshold=1)
        files_before = len(metrics.current_snapshot().files)
        res = mm.run(metrics, dry_run=True)
        assert any(a["status"] == "dry_run" for a in res["actions"])
        assert len(metrics.current_snapshot().files) == files_before
        assert mm.get_policy("default.metrics")["last_run"] is None  # dry

    def test_run_updates_last_run(self, mm, metrics):
        mm.set_policy("default.metrics", auto_compact_threshold=1)
        mm.run(metrics)
        assert mm.get_policy("default.metrics")["last_run"] is not None


# ----------------------------------------------------------------------- sla

class TestSla:
    @pytest.fixture()
    def sla(self, tmp_path):
        return SlaManager(str(tmp_path / "s.json"))

    def test_unknown_threshold_raises(self, sla):
        with pytest.raises(ValueError, match="unknown thresholds"):
            sla.set_sla("t", max_latency_ms=5)

    def test_row_count_violation(self, sla, metrics):
        sla.set_sla("default.metrics", min_row_count=100)
        stats = compute_table_stats(metrics)
        res = sla.check(metrics, stats)
        assert not res["ok"] and res["status"] == "violation"
        assert "Row count 2 below minimum 100" in res["violations"][0]
        assert res["recommendations"]

    def test_null_pct_violation(self, sla, metrics, catalog):
        crud.insert_rows(metrics, [{"id": 3, "name": None, "value": 1.0}])
        sla.set_sla("default.metrics", max_null_pct=10.0)
        res = sla.check(metrics, compute_table_stats(metrics))
        assert not res["ok"] and "Null percentage" in res["violations"][0]

    def test_quality_violation_and_history(self, sla, metrics):
        crud.insert_rows(metrics, [{"id": 3, "name": None, "value": 1.0}])
        sla.set_sla("default.metrics", min_quality_score=100)
        stats = compute_table_stats(metrics)
        res = sla.check(metrics, stats, quality_score(stats))
        assert not res["ok"]
        assert len(sla.history("default.metrics")) == 1

    def test_invalid_quality_threshold_raises(self, sla):
        with pytest.raises(ValueError, match="min_quality_score"):
            sla.set_sla("t", min_quality_score=101)

    def test_invalid_staleness_raises(self, sla):
        with pytest.raises(ValueError, match="max_staleness_hours"):
            sla.set_sla("t", max_staleness_hours=0)

    def test_clean_check(self, sla, metrics):
        sla.set_sla("default.metrics", min_row_count=1, max_null_pct=50.0)
        res = sla.check(metrics, compute_table_stats(metrics))
        assert res["ok"] and res["violations"] == []


# ------------------------------------------------------------- notifications

class TestNotifications:
    @pytest.fixture()
    def nm(self, tmp_path):
        return NotificationManager(str(tmp_path / "n.json"))

    @pytest.fixture()
    def log(self, tmp_path):
        return {"file": str(tmp_path / "events.log")}

    def test_unknown_event_raises(self, nm, log):
        with pytest.raises(ValueError, match="Invalid event type"):
            nm.add_handler("t", "reboot", "log", log)

    def test_fire_matches_table_and_event(self, nm, log):
        nm.add_handler("t", "write", "log", log)
        assert nm.fire_event("t", "write")["handlers_triggered"] == 1
        assert nm.fire_event("t", "maintenance")["handlers_triggered"] == 0
        assert nm.fire_event("other", "write")["handlers_triggered"] == 0

    def test_wildcard_table_and_all_events(self, nm, log):
        nm.add_handler("*", "all", "log", log)
        assert nm.fire_event("whatever", "maintenance")["handlers_triggered"] == 1

    def test_history_filter_and_order(self, nm, log):
        nm.add_handler("a", "write", "log", log)
        nm.add_handler("b", "write", "log", log)
        nm.fire_event("a", "write")
        nm.fire_event("b", "write")
        hist = nm.history()
        assert hist[0]["table"] == "default.b"  # most recent first
        assert [h["table"] for h in nm.history("a")] == ["default.a"]

    def test_remove_matching(self, nm, log):
        nm.add_handler("t", "write", "log", log)
        assert nm.remove_matching("t", "write") == 1
        assert nm.remove_matching("t", "write") == 0
        assert nm.fire_event("t", "write")["handlers_triggered"] == 0


# ------------------------------------------------------- tagging + glossary

class TestTagging:
    @pytest.fixture()
    def tm(self, tmp_path):
        return TagManager(str(tmp_path / "t.json"))

    def test_add_remove_idempotent(self, tm):
        assert tm.add_tag("t", "gold") == ["gold"]
        assert tm.add_tag("t", "gold") == ["gold"]
        assert tm.remove_tag("t", "gold") == []
        assert tm.remove_tag("t", "gold") == []

    def test_search_matches_name_tag_description(self, tm):
        tm.add_tag("default.sales", "finance")
        tm.set_description("default.orders", "finance-critical feed")
        hits = {h["table"] for h in tm.search("finance", ["default.sales", "default.orders", "default.misc"])}
        assert hits == {"default.sales", "default.orders"}

    def test_bookmarks(self, tm):
        tm.bookmark("t1")
        tm.bookmark("t2")
        tm.bookmark("t1", False)
        assert tm.bookmarks() == ["default.t2"]


class TestCatalogMetadata:
    @pytest.fixture()
    def md(self, tmp_path):
        return CatalogMetadata(str(tmp_path / "md.json"))

    def test_column_descriptions_and_classification(self, md):
        md.set_column_description("t", "id", "primary key")
        md.classify_column("t", "email", "pii")
        info = md.column_info("t")
        assert info["id"]["description"] == "primary key"
        assert info["email"]["classification"] == "pii"

    def test_pii_columns_across_tables(self, md):
        md.classify_column("a", "email", "pii")
        md.classify_column("b", "name", "pii")
        md.classify_column("b", "total", "public")
        assert len(md.pii_columns()) == 2
        assert len(md.pii_columns("a")) == 1

    def test_glossary_alias_lookup_case_insensitive(self, md):
        md.add_glossary_term("GMV", "gross merchandise value", aliases=["Gross"])
        assert md.lookup_term("gmv")["definition"] == "gross merchandise value"
        assert md.lookup_term("GROSS")["term"] == "gmv"
        assert md.lookup_term("missing") is None


# ------------------------------------------------ saved queries + query cache

class TestSavedQueries:
    @pytest.fixture()
    def sq(self, tmp_path):
        return SavedQueries(str(tmp_path / "q.json"))

    def test_get_missing_raises(self, sq):
        with pytest.raises(ValueError, match="not found"):
            sq.get("ghost")

    def test_save_duplicate_raises_unless_overwrite(self, sq):
        """Reference queries.py: duplicate names raise; explicit
        overwrite replaces."""
        sq.save("q", "SELECT 1")
        with pytest.raises(ValueError, match="already exists"):
            sq.save("q", "SELECT 2")
        sq.save("q", "SELECT 2", overwrite=True)
        assert sq.get("q")["sql"] == "SELECT 2"

    def test_delete_missing_raises_and_recreate_works(self, sq):
        with pytest.raises(ValueError, match="not found"):
            sq.delete("ghost")
        sq.save("q", "SELECT 1", description="d1")
        sq.delete("q")
        assert sq.list() == []
        sq.save("q", "SELECT 9")  # delete-then-recreate is a fresh save
        assert sq.get("q")["sql"] == "SELECT 9"

    def test_save_includes_created_at_and_description(self, sq):
        e = sq.save("q", "SELECT 1", description="daily rollup")
        assert e["description"] == "daily rollup"
        assert "Saved" in e["message"]
        assert sq.get("q")["created_at"]

    def test_delete_one_keeps_others(self, sq):
        sq.save("a", "SELECT 1")
        sq.save("b", "SELECT 2")
        sq.delete("a")
        assert [q["name"] for q in sq.list()] == ["b"]

    def test_history_preserved_across_saved_query_ops(self, sq):
        sq.record_history("SELECT 1", 0.1, 1)
        sq.save("q", "SELECT 2")
        sq.delete("q")
        assert len(sq.history()) == 1

    def test_clear_empty_history_is_zero(self, sq):
        assert sq.clear_history()["cleared"] == 0

    def test_history_capped_and_cleared(self, sq):
        for i in range(5):
            sq.record_history(f"SELECT {i}", 0.1, i)
        assert len(sq.history()) == 5
        assert sq.history(limit=2)[0]["sql"] == "SELECT 4"  # newest first
        assert sq.clear_history()["cleared"] == 5
        assert sq.history() == []

    def test_normalize_sql_collapses_whitespace_and_case(self):
        assert normalize_sql("SELECT  *\nFROM t") == normalize_sql("select * from t")


class TestQueryCache:
    @pytest.fixture()
    def qc(self, tmp_path):
        return QueryCache(str(tmp_path / "qc.json"), ttl_s=60)

    def test_roundtrip_and_stats(self, qc):
        assert qc.get("SELECT 1") is None
        qc.put("SELECT 1", [{"a": 1}], ["t"])
        assert qc.get("SELECT 1") == [{"a": 1}]
        st = qc.stats()
        assert st["hits"] == 1 and st["misses"] == 1

    def test_ttl_expiry(self, tmp_path):
        qc = QueryCache(str(tmp_path / "qc2.json"), ttl_s=0)
        qc.put("q", [{"a": 1}], ["t"])
        time.sleep(0.01)
        assert qc.get("q") is None

    def test_invalidate_by_table(self, qc):
        qc.put("q1", [], ["orders"])
        qc.put("q2", [], ["customer"])
        assert qc.invalidate_table("orders") == 1
        assert qc.get("q1") is None and qc.get("q2") == []

    def test_policy_disables_caching(self, qc):
        qc.set_policy("secret", False)
        assert qc.enabled_for(["orders", "secret"]) is False
        assert qc.enabled_for(["orders"]) is True


# ------------------------------------------------------------------- audit

class TestAudit:
    @pytest.fixture()
    def log(self, tmp_path):
        return AuditLog(str(tmp_path / "a.ndjson"))

    def test_record_and_filtered_query(self, log):
        log.record("t1", "insert", rows_affected=5)
        log.record("t2", "delete", rows_affected=1)
        log.record("t1", "delete", rows_affected=2)
        assert len(log.query()) == 3
        assert [e["table"] for e in log.query(table="t1")] == ["t1", "t1"]
        assert [e["operation"] for e in log.query(operation="delete")] == ["delete", "delete"]
        assert log.query()[0]["operation"] == "delete"  # newest first

    def test_clear_all_and_older_than(self, log):
        log.record("t", "insert")
        assert log.clear()["cleared"] == 1
        assert log.query() == []
        log.record("t", "insert")
        # nothing is older than 1 hour
        assert log.clear(older_than="1h")["cleared"] == 0
        assert len(log.query()) == 1


# --------------------------------------------------------------------- cdc

class TestCdc:
    def test_classify_insert_update_delete(self, metrics):
        crud.insert_rows(metrics, [{"id": 3, "name": "carol", "value": 30.0}])
        crud.update_rows(metrics, "id = 1", {"value": 11.0})
        crud.delete_rows(metrics, "id = 2")
        snaps = metrics.snapshots()
        ch = cdc.capture_changes(metrics, snaps[0].snapshot_id,
                                 snaps[-1].snapshot_id, ["id"])
        assert ch["summary"] == {"inserts": 1, "updates": 1, "deletes": 1}
        assert ch["inserts"][0]["id"] == 3
        up = ch["updates"][0]
        assert up["key"] == {"id": 1}
        assert up["before"]["value"] == 10.0 and up["after"]["value"] == 11.0
        assert up["changed_columns"] == ["value"]
        assert ch["deletes"][0]["id"] == 2

    def test_max_rows_caps_details_not_summary(self, metrics):
        crud.insert_rows(metrics, [
            {"id": 100 + i, "name": "n", "value": 1.0} for i in range(5)
        ])
        snaps = metrics.snapshots()
        ch = cdc.capture_changes(metrics, snaps[0].snapshot_id,
                                 snaps[-1].snapshot_id, ["id"], max_rows=2)
        assert ch["summary"]["inserts"] == 5
        assert len(ch["inserts"]) == 2

    def test_export_csv_shape(self, metrics):
        crud.update_rows(metrics, "id = 1", {"value": 99.0})
        snaps = metrics.snapshots()
        ch = cdc.capture_changes(metrics, snaps[0].snapshot_id,
                                 snaps[-1].snapshot_id, ["id"])
        text = cdc.export_changes(ch, "csv")
        lines = text.strip().splitlines()
        assert lines[0].startswith("change_type")
        assert {l.split(",")[0] for l in lines[1:]} == {"UPDATE_BEFORE", "UPDATE_AFTER"}

    def test_export_unknown_format_raises(self, metrics):
        snaps = metrics.snapshots()
        ch = cdc.capture_changes(metrics, snaps[0].snapshot_id, snaps[0].snapshot_id)
        with pytest.raises(ValueError, match="Unsupported format"):
            cdc.export_changes(ch, "xml")

    def test_replay_into_empty_table(self, metrics, catalog):
        crud.insert_rows(metrics, [{"id": 7, "name": "g", "value": 7.0}])
        snaps = metrics.snapshots()
        target = catalog.create_table("replica", SCHEMA)
        ch = cdc.capture_changes(metrics, snaps[0].snapshot_id,
                                 snaps[-1].snapshot_id, ["id"])
        applied = cdc.replay_changes(target, ch)
        assert applied["inserts"] == 1
        assert target.scan().count() == 1


# -------------------------------------------------------------- incremental

class TestIncremental:
    @pytest.fixture()
    def wm(self, tmp_path):
        return WatermarkStore(str(tmp_path / "wm.json"))

    def test_first_read_is_full(self, metrics, wm):
        df, info = incremental_read(metrics, wm, "p")
        assert info["mode"] == "full" and df.count() == 2

    def test_same_snapshot_reads_nothing(self, metrics, wm):
        wm.set("p", "default.metrics", metrics.current_snapshot().snapshot_id)
        df, info = incremental_read(metrics, wm, "p")
        assert info["mode"] == "none" and df.count() == 0

    def test_append_only_fast_path_reads_new_files_only(self, metrics, wm):
        wm.set("p", "default.metrics", metrics.current_snapshot().snapshot_id)
        crud.insert_rows(metrics, [{"id": 3, "name": "c", "value": 3.0}])
        df, info = incremental_read(metrics, wm, "p")
        assert info["mode"] == "append_files"
        assert [r["id"] for r in df.collect()] == [3]

    def test_overwrite_falls_back_to_diff(self, metrics, wm):
        wm.set("p", "default.metrics", metrics.current_snapshot().snapshot_id)
        crud.update_rows(metrics, "id = 1", {"value": 42.0})
        df, info = incremental_read(metrics, wm, "p")
        assert info["mode"] == "except_diff"
        assert [r["value"] for r in df.collect()] == [42.0]

    def test_expired_watermark_rescans(self, metrics, wm):
        wm.set("p", "default.metrics", 9999)
        crud.insert_rows(metrics, [{"id": 3, "name": "c", "value": 3.0}])
        df, info = incremental_read(metrics, wm, "p")
        assert info["mode"] == "except_diff" or info["mode"] == "full"

    def test_reset_scopes(self, wm):
        wm.set("p", "a", 1)
        wm.set("p", "b", 2)
        wm.reset("p", "a")
        assert wm.get("p", "a")["snapshot_id"] is None
        assert wm.get("p", "b")["snapshot_id"] == 2
        wm.reset("p")
        assert wm.list("p") == []


class TestValidationOnWrite:
    """Reference TestInsertValidation/TestUpdateValidation: registered
    rules gate MCP writes — invalid data raises BEFORE anything lands,
    and the rejected write leaves no snapshot and no audit entry."""

    @pytest.fixture()
    def srv(self, tmp_path):
        from iceberg_lakehouse_spark.server import LakehouseServer

        s = LakehouseServer(home=str(tmp_path / "vw_home"))
        err, p = self._call(s, "create_table", {
            "table": "vt", "schema": [["id", "long"], ["amount", "double"]],
        })
        assert not err
        return s

    @staticmethod
    def _call(s, name, args):
        import json as _json

        resp = s.handle_request({
            "jsonrpc": "2.0", "id": 1, "method": "tools/call",
            "params": {"name": name, "arguments": args},
        })
        res = resp["result"]
        text = res["content"][0]["text"]
        return res["isError"], (_json.loads(text) if not res["isError"] else text)

    def test_insert_valid_passes(self, srv):
        self._call(srv, "add_validation_rule",
                   {"table": "default.vt", "rule_type": "not_null", "column": "id"})
        err, p = self._call(srv, "insert", {
            "table": "vt", "rows": [{"id": 1, "amount": 10.0}]})
        assert not err and p == {"inserted": 1}

    def test_insert_invalid_raises_and_lands_nothing(self, srv):
        self._call(srv, "add_validation_rule",
                   {"table": "default.vt", "rule_type": "not_null", "column": "id"})
        err, text = self._call(srv, "insert", {
            "table": "vt", "rows": [{"id": None, "amount": 10.0}]})
        assert err and "Validation failed" in text
        err, p = self._call(srv, "query", {"sql": "SELECT count(*) AS n FROM vt"})
        assert p[0]["n"] == 0
        # the rejected write produced no audit entry
        err, log = self._call(srv, "get_audit_log", {})
        assert not any(e.get("operation") == "insert" for e in log)

    def test_insert_range_violation_blocked(self, srv):
        self._call(srv, "add_validation_rule",
                   {"table": "default.vt", "rule_type": "range",
                    "column": "amount", "min_value": 0})
        err, text = self._call(srv, "insert", {
            "table": "vt", "rows": [{"id": 1, "amount": -5.0}]})
        assert err and "Validation failed" in text

    def test_unique_vs_existing_blocks_reinsert_but_not_upsert(self, srv):
        self._call(srv, "insert", {"table": "vt",
                                   "rows": [{"id": 1, "amount": 1.0}]})
        self._call(srv, "add_validation_rule",
                   {"table": "default.vt", "rule_type": "unique", "column": "id"})
        err, text = self._call(srv, "insert", {
            "table": "vt", "rows": [{"id": 1, "amount": 2.0}]})
        assert err and "already present" in text
        # upsert legitimately re-sends the existing key
        err, p = self._call(srv, "upsert", {
            "table": "vt", "rows": [{"id": 1, "amount": 2.0}],
            "key_columns": ["id"]})
        assert not err and p == {"updated": 1, "inserted": 0}

    def test_update_validates_post_update_image(self, srv):
        self._call(srv, "insert", {"table": "vt",
                                   "rows": [{"id": 1, "amount": 10.0}]})
        self._call(srv, "add_validation_rule",
                   {"table": "default.vt", "rule_type": "range",
                    "column": "amount", "min_value": 0})
        err, text = self._call(srv, "update", {
            "table": "vt", "filter": "id = 1", "updates": {"amount": -3.0}})
        assert err and "Validation failed" in text
        err, p = self._call(srv, "query", {"sql": "SELECT amount FROM vt"})
        assert p[0]["amount"] == 10.0  # untouched
        err, p = self._call(srv, "update", {
            "table": "vt", "filter": "id = 1", "updates": {"amount": 3.0}})
        assert not err and p == {"updated": 1}

    def test_no_rules_zero_interference(self, srv):
        err, p = self._call(srv, "insert", {
            "table": "vt", "rows": [{"id": None, "amount": -1.0}]})
        assert not err and p == {"inserted": 1}


class TestValidationRuleEdges:
    """Remaining reference test_validation.py edges not yet pinned."""

    @pytest.fixture()
    def vm(self, tmp_path):
        return ValidationManager(str(tmp_path / "edge_v.json"))

    def test_add_invalid_type_raises(self, vm):
        with pytest.raises(ValueError, match="Invalid rule type"):
            vm.add_rule("t", "checksum", column="a")

    def test_add_not_null_missing_column_raises(self, vm):
        with pytest.raises(ValueError, match="requires 'column'"):
            vm.add_rule("t", "not_null")

    def test_add_range_missing_bounds_raises(self, vm):
        with pytest.raises(ValueError, match="requires at least"):
            vm.add_rule("t", "range", column="a")

    def test_rules_isolated_per_table(self, vm):
        vm.add_rule("t1", "not_null", column="a")
        vm.add_rule("t2", "not_null", column="b")
        assert len(vm.list_rules("t1")) == 1
        assert vm.list_rules("t1")[0]["column"] == "a"
        assert vm.list_rules("t3") == []

    def test_remove_one_keeps_others(self, vm):
        r1 = vm.add_rule("t", "not_null", column="a")
        vm.add_rule("t", "not_null", column="b")
        assert "Removed" in vm.remove_rule("t", r1["id"])["message"]
        assert [r["column"] for r in vm.list_rules("t")] == ["b"]

    def test_range_nulls_pass(self, vm, spark):
        """Reference: NULL is not a range violation (not_null owns
        null policing)."""
        vm.add_rule("t", "range", column="a", min_value=0, max_value=10)
        df = spark.createDataFrame([(None,), (5,)], "a int")
        assert vm.validate("t", df) == []

    def test_empty_batch_passes_all(self, vm, spark):
        vm.add_rule("t", "not_null", column="a")
        vm.add_rule("t", "range", column="a", min_value=0)
        df = spark.createDataFrame([], "a int")
        assert vm.validate("t", df) == []

    def test_multiple_failures_all_reported(self, vm, spark):
        vm.add_rule("t", "not_null", column="a")
        vm.add_rule("t", "range", column="b", max_value=5)
        vm.add_rule("t", "regex", column="c", pattern="^x")
        df = spark.createDataFrame([(None, 9, "y")], "a int, b int, c string")
        v = vm.validate("t", df)
        assert len(v) == 3

    def test_store_corrupt_json_recovers(self, vm, tmp_path):
        path = str(tmp_path / "edge_v.json")
        with open(path, "w") as f:
            f.write("{not json!!")
        fresh = ValidationManager(path)
        assert fresh.list_rules("t") == []  # corrupt store → empty, no crash
        fresh.add_rule("t", "not_null", column="a")
        assert len(fresh.list_rules("t")) == 1

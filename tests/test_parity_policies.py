"""Retention / maintenance-policy / SLA parity with the reference
behavioral corpus (reference tests/test_retention.py:1-191,
test_maintenance_policies.py:1-265, test_sla.py:1-209).

Ports the assertion CONTENT — policy validation + normalization +
timestamps, expire-set computation with min-keep clamping and the
no_action/would_expire/expired vocabulary, maintenance needs-checks
with actions_needed and last_run stamping, and SLA lifecycle with
status/violations/recommendations — against the repo's managers."""

from __future__ import annotations

import json

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance.policies import (
    MaintenanceManager,
    RetentionManager,
    SlaManager,
)
from iceberg_lakehouse_spark.governance.stats import compute_table_stats
from iceberg_lakehouse_spark.operators import crud


@pytest.fixture
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "lake"))


@pytest.fixture
def snapshotted(catalog):
    """A table with 5 snapshots (one per insert)."""
    t = catalog.create_table("snappy", [("id", "long"), ("val", "string")])
    for i in range(5):
        crud.insert_rows(t, [{"id": i, "val": f"v{i}"}])
    assert len(t.snapshots()) == 5
    return t


@pytest.fixture
def rm(tmp_path):
    return RetentionManager(str(tmp_path / "retention.json"))


@pytest.fixture
def mm(tmp_path):
    return MaintenanceManager(str(tmp_path / "maintenance.json"))


@pytest.fixture
def sla(tmp_path):
    return SlaManager(str(tmp_path / "sla.json"))


# --- retention: set/get/list/remove ---


def test_retention_set_basic(rm):
    result = rm.set_policy("my_table", max_snapshot_count=5,
                           min_snapshots_to_keep=2)
    assert result["table"] == "default.my_table"
    assert result["policy"]["max_snapshot_count"] == 5
    assert result["policy"]["min_snapshots_to_keep"] == 2
    assert "created_at" in result["policy"]
    assert result["policy"]["last_evaluated"] is None


def test_retention_set_age_policy(rm):
    result = rm.set_policy("t", max_snapshot_age_hours=168)
    assert result["policy"]["max_snapshot_age_hours"] == 168


def test_retention_overwrite(rm):
    rm.set_policy("t", max_snapshot_count=10)
    result = rm.set_policy("t", max_snapshot_count=5)
    assert result["policy"]["max_snapshot_count"] == 5


def test_retention_empty_name_raises(rm):
    with pytest.raises(ValueError, match="empty"):
        rm.set_policy("", max_snapshot_count=5)


def test_retention_invalid_age_raises(rm):
    with pytest.raises(ValueError, match="max_snapshot_age_hours"):
        rm.set_policy("t", max_snapshot_age_hours=-1)


def test_retention_invalid_count_raises(rm):
    with pytest.raises(ValueError, match="max_snapshot_count"):
        rm.set_policy("t", max_snapshot_count=0)


def test_retention_invalid_min_keep_raises(rm):
    with pytest.raises(ValueError, match="min_snapshots_to_keep"):
        rm.set_policy("t", min_snapshots_to_keep=0)


def test_retention_get_existing(rm):
    rm.set_policy("t", max_snapshot_count=5)
    assert rm.get_policy("t")["max_snapshot_count"] == 5


def test_retention_get_nonexistent(rm):
    assert rm.get_policy("nope") is None


def test_retention_list(rm):
    assert rm.list_policies() == []
    rm.set_policy("a", max_snapshot_count=5)
    rm.set_policy("b", max_snapshot_count=3)
    policies = rm.list_policies()
    assert len(policies) == 2
    tables = [p["table"] for p in policies]
    assert "default.a" in tables and "default.b" in tables


def test_retention_remove(rm):
    rm.set_policy("t", max_snapshot_count=5)
    result = rm.remove_policy("t")
    assert "removed" in result["message"].lower()
    assert rm.get_policy("t") is None


def test_retention_remove_nonexistent(rm):
    result = rm.remove_policy("nope")
    assert "no retention policy" in result["message"].lower()


# --- retention: evaluate ---


def test_retention_expire_by_count(rm, snapshotted):
    rm.set_policy("default.snappy", max_snapshot_count=3)
    res = rm.apply(snapshotted)
    assert res["action"] == "expired"
    assert res["expired"] >= 1
    assert len(snapshotted.snapshots()) == 3


def test_retention_dry_run(rm, snapshotted):
    rm.set_policy("default.snappy", max_snapshot_count=3)
    res = rm.apply(snapshotted, dry_run=True)
    assert res["action"] == "would_expire"
    assert res["dry_run"] is True
    assert res["would_expire"] >= 1
    assert len(snapshotted.snapshots()) == 5  # untouched


def test_retention_min_keep_prevents_over_expiration(rm, snapshotted):
    # age policy wants everything gone, min-keep saves 4
    rm.set_policy("default.snappy", max_snapshot_age_hours=0.0000001,
                  min_snapshots_to_keep=4)
    res = rm.apply(snapshotted, dry_run=True)
    assert res["action"] == "would_expire"
    assert res["would_expire"] == 1
    assert res["would_remain"] == 4


def test_retention_no_action_within_limits(rm, snapshotted):
    rm.set_policy("default.snappy", max_snapshot_count=100)
    res = rm.apply(snapshotted)
    assert res["action"] == "no_action"
    assert res["expired"] == 0


def test_retention_updates_last_evaluated(rm, snapshotted):
    rm.set_policy("default.snappy", max_snapshot_count=3)
    assert rm.get_policy("default.snappy")["last_evaluated"] is None
    rm.apply(snapshotted)
    assert rm.get_policy("default.snappy")["last_evaluated"] is not None


def test_retention_evaluate_all(rm, catalog, snapshotted):
    rm.set_policy("default.snappy", max_snapshot_count=100)
    results = rm.evaluate_all(catalog)
    assert len(results) == 1
    assert results[0]["action"] == "no_action"


# --- maintenance policies ---


def test_maint_complete_policy(mm):
    result = mm.set_policy(
        "expenses", auto_compact_threshold=15, auto_expire_retain_last=3,
        auto_expire_older_than="7d", auto_cleanup_orphans=False,
    )
    assert result["table"] == "default.expenses"
    p = result["policy"]
    assert p["auto_compact_threshold"] == 15
    assert p["auto_expire_retain_last"] == 3
    assert p["auto_expire_older_than"] == "7d"
    assert p["auto_cleanup_orphans"] is False


def test_maint_partial_policy_defaults_fill(mm):
    p = mm.set_policy("expenses", auto_compact_threshold=20)["policy"]
    assert p["auto_compact_threshold"] == 20
    assert p["auto_expire_retain_last"] == 5
    assert p["auto_cleanup_orphans"] is True


def test_maint_empty_policy_uses_defaults(mm):
    p = mm.set_policy("expenses")["policy"]
    assert p["auto_compact_threshold"] == 10
    assert p["auto_expire_retain_last"] == 5
    assert p["auto_expire_older_than"] is None


def test_maint_has_timestamps(mm):
    p = mm.set_policy("expenses")["policy"]
    assert p["created_at"] is not None
    assert p["last_run"] is None


def test_maint_overwrite(mm):
    mm.set_policy("expenses", auto_compact_threshold=5)
    result = mm.set_policy("expenses", auto_compact_threshold=20)
    assert result["policy"]["auto_compact_threshold"] == 20


def test_maint_get_normalizes(mm):
    mm.set_policy("default.expenses", auto_compact_threshold=8)
    assert mm.get_policy("expenses")["auto_compact_threshold"] == 8


def test_maint_get_nonexistent_is_none(mm):
    assert mm.get_policy("no_table") is None


def test_maint_remove(mm):
    mm.set_policy("expenses")
    result = mm.remove_policy("expenses")
    assert "removed" in result["message"].lower()
    assert mm.get_policy("expenses") is None


def test_maint_remove_nonexistent(mm):
    assert "no policy" in mm.remove_policy("no_table")["message"].lower()


def test_maint_persists_normalized(mm, tmp_path):
    mm.set_policy("expenses", auto_compact_threshold=8)
    data = json.loads((tmp_path / "maintenance.json").read_text())
    assert "default.expenses" in data
    entry = data["default.expenses"]
    for key in ("auto_compact_threshold", "auto_expire_retain_last",
                "auto_cleanup_orphans", "created_at", "last_run"):
        assert key in entry


def test_maint_check_no_policy(mm, snapshotted):
    result = mm.check_needed(snapshotted)
    assert result["has_policy"] is False
    assert result["needs_compact"] is False


def test_maint_check_nothing_needed(mm, snapshotted):
    mm.set_policy("default.snappy", auto_compact_threshold=100,
                  auto_expire_retain_last=100)
    result = mm.check_needed(snapshotted)
    assert result["has_policy"] is True
    assert result["needs_compact"] is False
    assert result["actions_needed"] == []


def test_maint_check_needs_compact(mm, snapshotted):
    mm.set_policy("default.snappy", auto_compact_threshold=2,
                  auto_expire_retain_last=100)
    result = mm.check_needed(snapshotted)
    assert result["needs_compact"] is True
    assert any("compact" in a for a in result["actions_needed"])


def test_maint_check_needs_expire(mm, snapshotted):
    mm.set_policy("default.snappy", auto_compact_threshold=100,
                  auto_expire_retain_last=2)
    result = mm.check_needed(snapshotted)
    assert result["needs_expire"] is True
    assert any("expire" in a for a in result["actions_needed"])


def test_maint_run_noop(mm, snapshotted):
    mm.set_policy("default.snappy", auto_compact_threshold=100,
                  auto_expire_retain_last=100)
    assert mm.run(snapshotted)["actions"] == []


def test_maint_run_dry_run(mm, snapshotted):
    mm.set_policy("default.snappy", auto_compact_threshold=2,
                  auto_expire_retain_last=100)
    actions = mm.run(snapshotted, dry_run=True)["actions"]
    assert len(actions) >= 1
    assert all(a["status"] == "dry_run" for a in actions)


def test_maint_run_compacts(mm, snapshotted):
    mm.set_policy("default.snappy", auto_compact_threshold=2,
                  auto_expire_retain_last=100)
    actions = mm.run(snapshotted)["actions"]
    compact = [a for a in actions if a["action"] == "compact"]
    assert compact and compact[0]["status"] == "completed"


def test_maint_run_all(mm, catalog, snapshotted):
    mm.set_policy("default.snappy", auto_compact_threshold=100,
                  auto_expire_retain_last=100)
    results = mm.run_all(catalog)
    assert isinstance(results, list) and len(results) == 1


def test_maint_run_updates_last_run(mm, snapshotted):
    mm.set_policy("default.snappy", auto_compact_threshold=2,
                  auto_expire_retain_last=100)
    assert mm.get_policy("default.snappy")["last_run"] is None
    mm.run(snapshotted)
    assert mm.get_policy("default.snappy")["last_run"] is not None


# --- SLA ---


def test_sla_set_and_get(sla):
    result = sla.set_sla("metrics", max_staleness_hours=24,
                         min_quality_score=80)
    assert result["table"] == "default.metrics"
    assert result["sla"]["max_staleness_hours"] == 24
    got = sla.get_sla("metrics")
    assert got["sla"]["min_quality_score"] == 80


def test_sla_get_nonexistent(sla):
    assert sla.get_sla("nope")["sla"] is None


def test_sla_empty_name_raises(sla):
    with pytest.raises(ValueError, match="empty"):
        sla.set_sla("", min_row_count=1)


def test_sla_invalid_staleness_raises(sla):
    with pytest.raises(ValueError, match="max_staleness_hours"):
        sla.set_sla("t", max_staleness_hours=-5)


def test_sla_invalid_quality_raises(sla):
    with pytest.raises(ValueError, match="min_quality_score"):
        sla.set_sla("t", min_quality_score=150)


def test_sla_list(sla):
    assert sla.list_slas() == []
    sla.set_sla("a", min_row_count=1)
    sla.set_sla("b", min_row_count=2)
    assert len(sla.list_slas()) == 2


def test_sla_remove(sla):
    sla.set_sla("t", min_row_count=1)
    sla.remove_sla("t")
    assert sla.get_sla("t")["sla"] is None


def test_sla_remove_nonexistent(sla):
    assert "no sla found" in sla.remove_sla("nope")["message"].lower()


def test_sla_passing_status(sla, snapshotted):
    sla.set_sla("default.snappy", min_row_count=1)
    res = sla.check(snapshotted, compute_table_stats(snapshotted))
    assert res["status"] == "passing" and res["violations"] == []


def test_sla_row_count_violation_wording(sla, snapshotted):
    sla.set_sla("default.snappy", min_row_count=100)
    res = sla.check(snapshotted, compute_table_stats(snapshotted))
    assert res["status"] == "violation"
    assert any("row count" in v.lower() for v in res["violations"])
    assert len(res["recommendations"]) >= 1


def test_sla_null_violation_wording(sla, catalog):
    t = catalog.create_table("dirty", [("id", "long"), ("name", "string")])
    crud.insert_rows(t, [{"id": 1, "name": None}, {"id": 2, "name": "x"}])
    sla.set_sla("default.dirty", max_null_pct=10.0)
    res = sla.check(t, compute_table_stats(t))
    assert res["status"] == "violation"
    assert any("null" in v.lower() for v in res["violations"])


def test_sla_check_all(sla, snapshotted):
    sla.set_sla("default.snappy", min_row_count=1)
    stats = {"default.snappy": compute_table_stats(snapshotted)}
    summary = sla.check_all([snapshotted], stats)
    assert summary["total"] == 1
    assert summary["passing"] == 1
    assert summary["tables"][0]["status"] == "passing"


def test_sla_history_accumulates_with_status(sla, snapshotted):
    sla.set_sla("default.snappy", min_row_count=1)
    stats = compute_table_stats(snapshotted)
    for _ in range(3):
        sla.check(snapshotted, stats)
    history = sla.history("default.snappy")
    assert len(history) == 3
    for entry in history:
        assert "checked_at" in entry
        assert "status" in entry


def test_sla_empty_history(sla):
    assert sla.history("nope") == []


def test_sla_storage_normalized(sla, tmp_path):
    sla.set_sla("t", max_staleness_hours=1, min_quality_score=50)
    data = json.loads((tmp_path / "sla.json").read_text())
    assert "default.t" in data["policies"]
    entry = data["policies"]["default.t"]
    assert "max_staleness_hours" in entry
    assert "min_quality_score" in entry

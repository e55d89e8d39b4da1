"""Behavioral parity with reference tests/test_snapshot_diff.py (239
LoC), test_snapshots.py (162 LoC), and test_time_travel.py (112 LoC):
ref resolution, diff report shape, rollback no-op/error paths, expire
edges, and time-travel scans."""

from __future__ import annotations

import datetime

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.operators import crud

SCHEMA = [("id", "long"), ("val", "string"), ("num", "double")]
ROWS = [
    {"id": 1, "val": "alpha", "num": 10.0},
    {"id": 2, "val": "beta", "num": 20.0},
    {"id": 3, "val": "gamma", "num": 30.0},
]


@pytest.fixture()
def catalog(spark, tmp_warehouse):
    return LakehouseCatalog(spark, tmp_warehouse)


@pytest.fixture()
def table(catalog):
    t = catalog.create_table("diff_test", SCHEMA)
    crud.insert_rows(t, ROWS)
    return t


def _current_id(table):
    return table.current_snapshot().snapshot_id


# -- snapshot_diff_report (reference TestSnapshotDiff*) --------------------


class TestSnapshotDiffReport:
    def test_added_rows(self, table):
        frm = _current_id(table)
        crud.insert_rows(table, [
            {"id": 4, "val": "delta", "num": 40.0},
            {"id": 5, "val": "epsilon", "num": 50.0},
        ])
        res = table.snapshot_diff_report(frm)
        assert res["summary"]["added"] == 2
        assert res["summary"]["deleted"] == 0
        assert {r["id"] for r in res["added"]} == {4, 5}

    def test_deleted_rows(self, table):
        frm = _current_id(table)
        crud.delete_rows(table, "id = 1")
        res = table.snapshot_diff_report(frm)
        assert res["summary"]["deleted"] >= 1
        assert 1 in {r["id"] for r in res["deleted"]}

    def test_update_shows_as_delete_and_add(self, table):
        frm = _current_id(table)
        crud.update_rows(table, "id = 1", {"num": 999.99})
        res = table.snapshot_diff_report(frm)
        assert res["summary"]["deleted"] >= 1
        assert res["summary"]["added"] >= 1
        assert 999.99 in {r["num"] for r in res["added"]}

    def test_mixed_add_delete(self, table):
        frm = _current_id(table)
        crud.insert_rows(table, [{"id": 10, "val": "new", "num": 100.0}])
        crud.delete_rows(table, "id = 2")
        res = table.snapshot_diff_report(frm)
        assert 10 in {r["id"] for r in res["added"]}
        assert 2 in {r["id"] for r in res["deleted"]}

    def test_same_snapshot_no_changes(self, table):
        sid = _current_id(table)
        res = table.snapshot_diff_report(sid, sid)
        assert res["summary"] == {"added": 0, "deleted": 0, "modified": 0}
        assert res["added"] == [] and res["deleted"] == []

    def test_explicit_to_snapshot_and_ids(self, table):
        frm = _current_id(table)
        crud.insert_rows(table, [{"id": 20, "val": "explicit", "num": 200.0}])
        to = _current_id(table)
        res = table.snapshot_diff_report(str(frm), str(to))
        assert res["summary"]["added"] >= 1
        assert res["from_snapshot_id"] == frm
        assert res["to_snapshot_id"] == to

    def test_from_ref_as_iso_timestamp(self, table):
        ts = datetime.datetime.fromtimestamp(
            table.current_snapshot().timestamp_ms / 1000,
            datetime.timezone.utc,
        ).isoformat()
        crud.insert_rows(table, [{"id": 30, "val": "timestamp", "num": 300.0}])
        res = table.snapshot_diff_report(ts)
        assert 30 in {r["id"] for r in res["added"]}

    def test_invalid_snapshot_id_raises(self, table):
        with pytest.raises(ValueError):
            table.snapshot_diff_report("99999999999999")

    def test_garbage_ref_raises(self, table):
        with pytest.raises(ValueError, match="Cannot resolve"):
            table.snapshot_diff_report("not-a-valid-ref-at-all")

    def test_result_structure(self, table):
        frm = _current_id(table)
        crud.insert_rows(table, [{"id": 40, "val": "struct", "num": 400.0}])
        res = table.snapshot_diff_report(frm)
        for key in ("added", "deleted", "modified", "summary",
                    "from_snapshot_id", "to_snapshot_id"):
            assert key in res
        assert isinstance(res["from_snapshot_id"], int)
        assert set(res["added"][0].keys()) == {"id", "val", "num"}


# -- rollback (reference TestRollback) -------------------------------------


class TestRollback:
    def test_rollback_to_snapshot_id(self, table):
        frm = _current_id(table)
        crud.insert_rows(table, [{"id": 99, "val": "later", "num": 1.0}])
        table.rollback(snapshot_id=frm)
        ids = {r["id"] for r in table.scan().collect()}
        assert 99 not in ids and {1, 2, 3} <= ids

    def test_rollback_to_timestamp(self, table):
        ts = datetime.datetime.fromtimestamp(
            table.current_snapshot().timestamp_ms / 1000,
            datetime.timezone.utc,
        ).isoformat()
        crud.insert_rows(table, [{"id": 98, "val": "later", "num": 1.0}])
        table.rollback(as_of=ts)
        assert 98 not in {r["id"] for r in table.scan().collect()}

    def test_rollback_already_at_snapshot_is_noop(self, table):
        cur = _current_id(table)
        n_before = len(table.snapshots())
        snap = table.rollback(snapshot_id=cur)
        assert snap.snapshot_id == cur  # no restoring commit
        assert len(table.snapshots()) == n_before

    def test_rollback_no_params_raises(self, table):
        with pytest.raises(ValueError, match="snapshot_id or as_of"):
            table.rollback()

    def test_rollback_invalid_snapshot_raises(self, table):
        with pytest.raises(ValueError, match="not found"):
            table.rollback(snapshot_id=999999999999)

    def test_rollback_empty_table_raises(self, catalog):
        t = catalog.create_table("empty_rb", [("id", "long")])
        with pytest.raises(ValueError):
            t.rollback(snapshot_id=1)


# -- expire edges (reference TestExpireSnapshots) --------------------------


class TestExpireEdges:
    def test_expire_recent_duration_expires_nothing(self, table):
        res = table.expire_snapshots(older_than="30d")
        assert res["expired"] == []

    def test_expire_past_iso_expires_nothing(self, table):
        res = table.expire_snapshots(older_than="2020-01-01T00:00:00")
        assert res["expired"] == []


# -- time travel (reference TestTimeTravel) --------------------------------


class TestTimeTravel:
    def test_empty_table_has_no_snapshots(self, catalog):
        t = catalog.create_table("tt_empty", [("id", "long")])
        assert t.snapshots() == []
        assert t.current_snapshot() is None

    def test_insert_creates_snapshot_with_fields(self, table):
        snaps = table.snapshots()
        assert len(snaps) == 1
        s = snaps[0]
        assert isinstance(s.snapshot_id, int)
        assert s.timestamp_ms > 0
        assert s.operation == "append"

    def test_scan_as_of_snapshot_id(self, table):
        frm = _current_id(table)
        crud.insert_rows(table, [{"id": 31, "val": "v2", "num": 20.0}])
        ids = {r["id"] for r in table.scan(snapshot_id=frm).collect()}
        assert 31 not in ids and 1 in ids

    def test_scan_as_of_future_timestamp_sees_all(self, table):
        future = (
            datetime.datetime.now(datetime.timezone.utc)
            + datetime.timedelta(hours=1)
        ).isoformat()
        ids = {r["id"] for r in table.scan(as_of=future).collect()}
        assert {1, 2, 3} <= ids

    def test_scan_as_of_invalid_snapshot_raises(self, table):
        with pytest.raises(ValueError, match="not found"):
            table.scan(snapshot_id=999999999999)

    def test_nonexistent_table_raises(self, catalog):
        with pytest.raises(ValueError):
            catalog.load_table("nonexistent")

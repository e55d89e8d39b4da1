"""Minor delete-file compaction (catalog.rewrite_delete_files — the
Iceberg RewritePositionDeleteFiles analogue) and single-commit
cherry-pick (catalog.cherry_pick — the WAP publish half fast_forward
doesn't cover). Both are metadata-plus-small-I/O commits: data files
must never be rewritten."""

from __future__ import annotations

import os

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance.cdc import changelog_view
from iceberg_lakehouse_spark.operators import crud

MOR = {"write.delete.mode": "merge-on-read",
       "write.update.mode": "merge-on-read"}


def _t(spark, wh, props=MOR, name="default.rd"):
    cat = LakehouseCatalog(spark, wh)
    t = cat.create_table(name, [("id", "long"), ("v", "string")],
                         properties=dict(props))
    t.append(spark.createDataFrame([(i, f"v{i}") for i in range(50)],
                                   "id long, v string"))
    return t


def _rows(t):
    return sorted((r["id"], r["v"]) for r in t.scan().collect())


def test_consolidates_many_delete_files_to_one(spark, tmp_warehouse):
    t = _t(spark, tmp_warehouse)
    for i in range(4):
        crud.delete_rows(t, f"id = {i}")
    assert len(t.current_snapshot().delete_files) == 4
    before = _rows(t)
    data_files_before = sorted(t.current_snapshot().files)
    rep = t.rewrite_delete_files()
    assert rep["rewritten_delete_files"] == 4
    assert rep["kept_keys"] == 4 and rep["dropped_keys"] == 0
    snap = t.current_snapshot()
    assert len(snap.delete_files) == 1
    # the invariant that makes it MINOR: zero data files touched
    assert sorted(snap.files) == data_files_before
    assert _rows(t) == before
    assert snap.operation == "rewrite_deletes"


def test_duplicate_keys_deduped(spark, tmp_warehouse):
    """The same (file, pos) key in two delete files (possible when a
    caller commits overlapping hand-built delete sets) survives
    consolidation exactly once."""
    t = _t(spark, tmp_warehouse)
    keys = (t.scan(with_pos=True).where("id = 4")
            .selectExpr("_mor_file as _file", "_mor_pos as _pos"))
    for _ in range(2):  # two commits carrying the SAME key
        t.commit_position_deletes(t.write_position_deletes(keys))
    assert len(t.current_snapshot().delete_files) == 2
    before = _rows(t)
    rep = t.rewrite_delete_files()
    assert rep["kept_keys"] == 1 and rep["dropped_keys"] == 1
    assert _rows(t) == before and (4, "v4") not in before


def test_dangling_keys_dropped_after_partial_rewrite(spark, tmp_warehouse):
    """CoW-rewrite one file while others keep live deletes: keys whose
    data file left the snapshot are dead and must be dropped."""
    t = _t(spark, tmp_warehouse)
    t.append(spark.createDataFrame([(100 + i, "x") for i in range(10)],
                                   "id long, v string").coalesce(1))
    crud.delete_rows(t, "id = 1")      # delete in file-set A
    crud.delete_rows(t, "id = 105")    # delete in the single B file
    before = _rows(t)
    # CoW-update a row in file-set B → B's files are rewritten, the
    # id=105 keys dangle (their file URIs left the snapshot)
    t.set_properties({"write.update.mode": "copy-on-write"})
    # rewrites every file-set-B file (id=105's key now dangles); the
    # id=1 key in untouched file-set A stays live
    crud.update_rows(t, "id >= 100", {"v": "X"})
    rep = t.rewrite_delete_files()
    assert rep["dropped_keys"] >= 1 and rep["kept_keys"] >= 1
    after = _rows(t)
    assert after == sorted([r for r in before if r[0] < 100]
                           + [(i, "X") for i in range(100, 110) if i != 105])


def test_rewrite_noop_and_changelog_nets_zero(spark, tmp_warehouse):
    t = _t(spark, tmp_warehouse)
    assert t.rewrite_delete_files() == {
        "rewritten_delete_files": 0, "kept_keys": 0,
        "dropped_keys": 0, "dropped_eq_deletes": 0}
    crud.delete_rows(t, "id < 2")
    s0 = t.current_snapshot().snapshot_id
    t.rewrite_delete_files()
    # consolidation must be invisible to the changelog
    assert changelog_view(t, s0).count() == 0


def test_rewrite_drops_dead_eq_deletes(spark, tmp_warehouse):
    """An equality delete whose sequence trails every live file's
    (all pre-delete files were since rewritten; replace_files inherits
    the eq list) can never match again — dead weight dropped. One
    seed file, so the deleted row shares a file with live rows and the
    CoW update provably rewrites it."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.rd", [("id", "long"), ("v", "string")],
                         properties=dict(MOR))
    t.append(spark.createDataFrame([(i, f"v{i}") for i in range(50)],
                                   "id long, v string").coalesce(1))
    crud.delete_rows_by_key(t, [{"id": 3}])
    assert len(t.current_snapshot().eq_delete_files) == 1
    t.set_properties({"write.update.mode": "copy-on-write"})
    crud.update_rows(t, "id >= 0", {"v": "rewritten"})  # rewrites ALL files
    assert len(t.current_snapshot().eq_delete_files) == 1  # inherited
    before = _rows(t)
    rep = t.rewrite_delete_files()
    assert rep["dropped_eq_deletes"] == 1
    assert t.current_snapshot().eq_delete_files == []
    assert _rows(t) == before and 3 not in [r[0] for r in before]


def test_incremental_fast_path_survives_rewrite(spark, tmp_warehouse):
    from iceberg_lakehouse_spark.governance.incremental import (
        WatermarkStore, incremental_read,
    )

    t = _t(spark, tmp_warehouse)
    wm = WatermarkStore(os.path.join(tmp_warehouse, "wm.json"))
    wm.set("p", "default.rd", t.current_snapshot().snapshot_id, 50)
    crud.delete_rows(t, "id = 0")
    t.rewrite_delete_files()
    t.append(spark.createDataFrame([(200, "n")], "id long, v string"))
    df, info = incremental_read(t, wm, "p")
    assert info["mode"] == "append_files"
    assert [r["id"] for r in df.collect()] == [200]


def test_cherry_pick_from_branch(spark, tmp_warehouse):
    """WAP single-commit publish: stage an append on a branch, audit,
    cherry-pick it onto main without fast-forwarding the branch's
    other commits."""
    t = _t(spark, tmp_warehouse, props={})
    t.create_branch("wap")
    b = t.for_branch("wap")
    b.append(spark.createDataFrame([(100, "staged")], "id long, v string"))
    staged = b.current_snapshot().snapshot_id
    b.append(spark.createDataFrame([(101, "later")], "id long, v string"))
    # main is untouched; pick ONLY the first staged commit
    assert len(_rows(t)) == 50
    snap = t.cherry_pick(staged)
    assert snap.operation == "cherry_pick"
    assert snap.summary["source_snapshot_id"] == staged
    got = _rows(t)
    assert (100, "staged") in got and (101, "later") not in got
    with pytest.raises(ValueError, match="already applied"):
        t.cherry_pick(staged)


def test_cherry_pick_mor_delete_commit(spark, tmp_warehouse):
    """Picking a MoR delete commit re-applies its position-delete
    files; picking a rewrite is rejected."""
    t = _t(spark, tmp_warehouse)
    t.create_branch("wap")
    b = t.for_branch("wap")
    crud.delete_rows(b, "id < 5")
    staged = b.current_snapshot().snapshot_id
    assert len(_rows(t)) == 50
    t.cherry_pick(staged)
    assert [r[0] for r in _rows(t)] == list(range(5, 50))
    t.compact()  # a rewriting commit can never be cherry-picked
    with pytest.raises(ValueError, match="additive"):
        t.cherry_pick(t.current_snapshot().snapshot_id)


def test_cherry_pick_eq_delete_resequenced(spark, tmp_warehouse):
    """A cherry-picked equality delete gets the NEW commit's sequence:
    it deletes every matching row existing before the pick — including
    rows appended to main AFTER the branch staged it."""
    t = _t(spark, tmp_warehouse)
    t.create_branch("wap")
    b = t.for_branch("wap")
    crud.delete_rows_by_key(b, [{"id": 7}])
    staged = b.current_snapshot().snapshot_id
    t.append(spark.createDataFrame([(7, "dup")], "id long, v string"))
    assert sorted(r[1] for r in _rows(t) if r[0] == 7) == ["dup", "v7"]
    t.cherry_pick(staged)
    assert [r for r in _rows(t) if r[0] == 7] == []


def test_maintenance_policy_schedules_minor_rewrite(spark, tmp_warehouse):
    """auto_rewrite_delete_files triggers the MINOR compaction when
    position-delete debt crosses the threshold and a full compact is
    not itself needed; a needed compact takes precedence (it folds the
    deletes anyway)."""
    import os

    from iceberg_lakehouse_spark.governance.policies import (
        MaintenanceManager,
    )

    t = _t(spark, tmp_warehouse)
    mm = MaintenanceManager(os.path.join(tmp_warehouse, "maint.json"))
    mm.set_policy("default.rd", auto_compact_threshold=10_000,
                  auto_expire_retain_last=10_000,
                  auto_cleanup_orphans=False,
                  auto_rewrite_delete_files=3)
    crud.delete_rows(t, "id = 0")
    crud.delete_rows(t, "id = 1")
    chk = mm.check_needed(t)
    assert not chk["needs_rewrite_deletes"] and not chk["needs_compact"]
    crud.delete_rows(t, "id = 2")
    chk = mm.check_needed(t)
    assert chk["needs_rewrite_deletes"]
    assert any("rewrite_delete_files" in a for a in chk["actions_needed"])
    rep = mm.run(t)
    acts = {a["action"]: a for a in rep["actions"]}
    assert acts["rewrite_delete_files"]["status"] == "completed"
    assert acts["rewrite_delete_files"]["rewritten_delete_files"] == 3
    assert len(t.current_snapshot().delete_files) == 1
    # full-compact precedence: drop the file threshold so compact fires
    mm.set_policy("default.rd", auto_compact_threshold=1,
                  auto_expire_retain_last=10_000,
                  auto_cleanup_orphans=False,
                  auto_rewrite_delete_files=1)
    chk = mm.check_needed(t)
    assert chk["needs_compact"] and not chk["needs_rewrite_deletes"]

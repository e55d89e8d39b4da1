"""Merge-on-read update/delete (VERDICT r6 #5): position-delete files
(Iceberg v2 analogue) amortize small mutations — a one-row delete on a
wide table writes one tiny delete file instead of rewriting every
matched data file. Copy-on-write stays the default; MoR is opt-in via
the Iceberg property names write.delete.mode / write.update.mode.
Covers: scan merge transparency, time travel, CoW/MoR mixing without
row resurrection, compaction folding, rollback restore, CDC over MoR
deletes, orphan accounting for delete files, CAS conflicts, and the
parquet-only gate."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from iceberg_lakehouse_spark.catalog import (
    CommitConflictError,
    LakehouseCatalog,
    retry_on_conflict,
)
from iceberg_lakehouse_spark.operators import crud

MOR_PROPS = {
    "write.delete.mode": "merge-on-read",
    "write.update.mode": "merge-on-read",
}


def _table(spark, warehouse, name="default.mor", props=MOR_PROPS, n=20):
    cat = LakehouseCatalog(spark, warehouse)
    t = cat.create_table(
        name, [("id", "long"), ("v", "string")], properties=dict(props)
    )
    t.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(n // 2)], "id long, v string"))
    t.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(n // 2, n)], "id long, v string"))
    return cat, t


def test_mor_delete_files_not_rewritten(spark, tmp_warehouse):
    """A MoR delete leaves every data file in place (summary says so,
    the file list is unchanged) and only adds a delete file; the scan
    merges it transparently."""
    _, t = _table(spark, tmp_warehouse)
    files_before = list(t.current_snapshot().files)
    n = crud.delete_rows(t, "id % 3 = 0")
    assert n == 7
    snap = t.current_snapshot()
    assert snap.operation == "delete"
    assert snap.files == files_before  # no data file rewritten
    assert len(snap.delete_files) == 1
    ids = sorted(r["id"] for r in t.scan().collect())
    assert ids == [i for i in range(20) if i % 3 != 0]
    # filtered scans merge too (pruned path)
    assert t.scan(filter="id < 10").count() == 6
    # repeat delete over merged state is a no-op (0 live matches)
    assert crud.delete_rows(t, "id = 3") == 0


def test_mor_update_single_commit_and_time_travel(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    pre = t.current_snapshot().snapshot_id
    n = crud.update_rows(t, "id IN (4, 5)", {"v": "X"})
    assert n == 2
    snap = t.current_snapshot()
    assert snap.operation == "update"
    # ONE commit: old files + new data file(s) + delete file together
    assert snap.parent_id == pre
    assert len(snap.delete_files) == 1
    rows = {r["id"]: r["v"] for r in t.scan().collect()}
    assert rows[4] == "X" and rows[5] == "X" and len(rows) == 20
    # time travel: the pre-update snapshot still reads original values
    old = {r["id"]: r["v"] for r in t.scan(snapshot_id=pre).collect()}
    assert old[4] == "v4" and old[5] == "v5"


def test_mor_then_cow_update_does_not_resurrect(spark, tmp_warehouse):
    """Mixed-mode: CoW rewrite of files holding MoR-deleted rows must
    apply the pending deletes, not resurrect the rows."""
    cat, t = _table(
        spark, tmp_warehouse,
        props={"write.delete.mode": "merge-on-read"},  # update stays CoW
    )
    assert crud.delete_rows(t, "id = 1") == 1
    assert crud.update_rows(t, "id >= 0", {"v": "ALL"}) == 19
    ids = sorted(r["id"] for r in t.scan().collect())
    assert ids == [i for i in range(20) if i != 1]  # 1 stays dead
    assert all(r["v"] == "ALL" for r in t.scan().collect())


def test_mor_compact_folds_deletes(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    crud.delete_rows(t, "id < 5")
    crud.update_rows(t, "id = 7", {"v": "seven"})
    assert len(t.current_snapshot().delete_files) == 2
    rep = t.compact()
    snap = t.current_snapshot()
    assert snap.delete_files == []  # folded
    rows = {r["id"]: r["v"] for r in t.scan().collect()}
    assert sorted(rows) == list(range(5, 20)) and rows[7] == "seven"
    assert rep["files_after"] < rep["files_before"]


def test_mor_rollback_restores_delete_files(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    crud.delete_rows(t, "id % 2 = 0")
    mor_snap = t.current_snapshot().snapshot_id
    t.compact()
    assert t.current_snapshot().delete_files == []
    t.rollback(snapshot_id=mor_snap)
    assert len(t.current_snapshot().delete_files) == 1
    ids = sorted(r["id"] for r in t.scan().collect())
    assert ids == [i for i in range(20) if i % 2 == 1]


def test_mor_cdc_sees_deletes_and_updates(spark, tmp_warehouse):
    from iceberg_lakehouse_spark.governance.cdc import capture_changes

    _, t = _table(spark, tmp_warehouse)
    pre = t.current_snapshot().snapshot_id
    crud.delete_rows(t, "id = 2")
    crud.update_rows(t, "id = 9", {"v": "nine"})
    changes = capture_changes(
        t, pre, t.current_snapshot().snapshot_id, key_columns=["id"]
    )
    assert any(r["id"] == 2 for r in changes["deletes"]), changes["deletes"]
    assert any(u["key"]["id"] == 9 for u in changes["updates"])
    assert changes["summary"] == {"inserts": 0, "updates": 1, "deletes": 1}


def test_mor_incremental_general_path(spark, tmp_warehouse):
    """Incremental reads over MoR commit chains take the additive fast
    path (MoR never rewrites old files): new rows = new files with the
    head's position deletes merged — no EXCEPT diff job."""
    from iceberg_lakehouse_spark.governance.incremental import (
        WatermarkStore,
        incremental_read,
    )

    import os

    cat, t = _table(spark, tmp_warehouse)
    store = WatermarkStore(os.path.join(cat.warehouse, "wm.json"))
    df, info = incremental_read(t, store, "p1")
    store.set("p1", "default.mor", t.current_snapshot().snapshot_id)
    crud.delete_rows(t, "id = 0")
    t.append(spark.createDataFrame([(100, "new")], "id long, v string"))
    df2, info2 = incremental_read(t, store, "p1")
    got = {r["id"] for r in df2.collect()}
    assert 100 in got and 0 not in got
    assert info2["mode"] == "append_files"  # no diff job over MoR chain
    # an updated row's NEW version flows through the fast path
    crud.update_rows(t, "id = 100", {"v": "newer"})
    df3, info3 = incremental_read(t, store, "p1")
    assert info3["mode"] == "append_files"
    assert {(r["id"], r["v"]) for r in df3.collect()} == {(100, "newer")}


def test_mor_delete_files_referenced_then_expire(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    crud.delete_rows(t, "id < 3")
    del_rel = t.current_snapshot().delete_files[0]
    assert t.orphan_files() == []  # delete file is referenced
    t.compact()
    # history still references the delete file via the older snapshot
    assert t.orphan_files() == []
    t.expire_snapshots(retain_last=1, grace_seconds=0)
    # once history is gone the delete file is released: either already
    # physically removed by expire's implicit cleanup, or reported as
    # an orphan for cleanup_orphans
    import os

    if os.path.exists(os.path.join(t.root, del_rel)):
        assert del_rel in t.orphan_files()
        t.cleanup_orphans(dry_run=False, grace_seconds=0)
    assert not os.path.exists(os.path.join(t.root, del_rel))
    # table still reads correctly after physical cleanup
    assert t.scan().count() == 17


def test_mor_cas_conflict_and_retry(spark, tmp_warehouse):
    """Chaos: a commit landing between a MoR delete's planning and its
    commit raises CommitConflictError; retry_on_conflict replans and
    the final state is consistent (no lost rows, no double deletes)."""
    _, t = _table(spark, tmp_warehouse)
    cur = t.current_snapshot()
    src = t.scan(snapshot_id=cur.snapshot_id, filter="id = 6", with_pos=True)
    keys = src.select(
        F.col("_mor_file").alias("_file"), F.col("_mor_pos").alias("_pos")
    )
    del_files = t.write_position_deletes(keys)
    # interloper commits first
    t.append(spark.createDataFrame([(200, "late")], "id long, v string"))
    with pytest.raises(CommitConflictError):
        t.commit_position_deletes(
            del_files, {"deleted_rows": 1},
            expected_snapshot_id=cur.snapshot_id,
        )
    # the standard consumer pattern replans and lands
    n = retry_on_conflict(lambda: crud.delete_rows(t, "id = 6"))
    assert n == 1
    ids = sorted(r["id"] for r in t.scan().collect())
    assert 6 not in ids and 200 in ids and len(ids) == 20


def test_mor_requires_parquet(spark, tmp_warehouse):
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table(
        "default.orc_t", [("id", "long")],
        properties={"write.format.default": "orc",
                    "write.delete.mode": "merge-on-read"},
    )
    t.append(spark.createDataFrame([(1,)], "id long"))
    with pytest.raises(ValueError, match="parquet"):
        crud.delete_rows(t, "id = 1")


def test_mor_scan_plan_broadcasts_delete_set(spark, tmp_warehouse):
    """Scale shape: the delete merge is a BROADCAST anti join on the
    position key — never a shuffle of the data."""
    import contextlib
    import io

    _, t = _table(spark, tmp_warehouse)
    crud.delete_rows(t, "id = 0")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        t.scan().explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_mor_merge_upsert_no_table_rewrite(spark, tmp_warehouse):
    """write.merge.mode=merge-on-read: upsert position-deletes the
    matched rows and appends the incoming batch in ONE commit — the
    CoW path overwrites the whole table. Results must be identical to
    the CoW twin; data files must be untouched."""
    props = dict(MOR_PROPS)
    props["write.merge.mode"] = "merge-on-read"
    _, t = _table(spark, tmp_warehouse, props=props)
    files_before = list(t.current_snapshot().files)
    pre = t.current_snapshot().snapshot_id
    res = crud.upsert_rows(
        t,
        [{"id": 5, "v": "FIVE"}, {"id": 100, "v": "hundred"}],
        ["id"],
    )
    assert res == {"updated": 1, "inserted": 1}
    snap = t.current_snapshot()
    assert snap.operation == "update" and snap.parent_id == pre
    assert set(files_before) <= set(snap.files)  # nothing rewritten
    assert len(snap.delete_files) == 1
    rows = {r["id"]: r["v"] for r in t.scan().collect()}
    assert rows[5] == "FIVE" and rows[100] == "hundred"
    assert len(rows) == 21
    # CoW twin produces the identical logical table
    cat2 = LakehouseCatalog(spark, tmp_warehouse)
    t2 = cat2.create_table(
        "default.cow_twin", [("id", "long"), ("v", "string")]
    )
    t2.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "id long, v string"))
    crud.upsert_rows(
        t2, [{"id": 5, "v": "FIVE"}, {"id": 100, "v": "hundred"}], ["id"]
    )
    assert {(r["id"], r["v"]) for r in t.scan().collect()} == {
        (r["id"], r["v"]) for r in t2.scan().collect()
    }
    # duplicate-key existing rows: ALL matched copies die
    t.append(spark.createDataFrame([(100, "dup")], "id long, v string"))
    crud.upsert_rows(t, [{"id": 100, "v": "final"}], ["id"])
    assert [r["v"] for r in t.scan().where("id = 100").collect()] \
        == ["final"]


def test_mor_delete_file_debt_triggers_maintenance_compact(
    spark, tmp_warehouse, tmp_path
):
    """Governance tie-in (r7): auto_compact_delete_files schedules a
    compact once merge-on-read delete files accumulate; running the
    policy folds them and clears the trigger. Default None keeps the
    reference's exact trigger set."""
    from iceberg_lakehouse_spark.governance.policies import (
        MaintenanceManager,
    )

    _, t = _table(spark, tmp_warehouse)
    mm = MaintenanceManager(str(tmp_path / "pol.json"))
    mm.set_policy(
        "default.mor", auto_compact_threshold=1000,
        auto_compact_delete_files=2, auto_cleanup_orphans=False,
    )
    crud.delete_rows(t, "id = 1")
    chk = mm.check_needed(t)
    assert not chk["needs_compact"]  # 1 delete file < 2
    crud.delete_rows(t, "id = 2")
    chk = mm.check_needed(t)
    assert chk["needs_compact"]
    assert any("merge-on-read delete files" in a
               for a in chk["actions_needed"])
    t.compact()
    chk = mm.check_needed(t)
    assert not chk["needs_compact"]
    assert t.current_snapshot().delete_files == []


def test_mor_on_partitioned_table(spark, tmp_warehouse):
    """MoR over hidden partitioning: partitioned writes reuse part-file
    basenames across partition dirs, which is exactly why the position
    key is the FULL file path. Delete + update + compact on a
    partitioned MoR table stay correct."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table(
        "default.pmor", [("id", "long"), ("grp", "string"), ("v", "long")],
        partition_by=["grp"], properties=dict(MOR_PROPS),
    )
    rows = [(i, "even" if i % 2 == 0 else "odd", i * 10) for i in range(40)]
    t.append(spark.createDataFrame(rows, "id long, grp string, v long"))
    # delete rows straddling both partitions; same in-partition offsets
    # exist on both sides, so a basename-keyed delete would kill twins
    assert crud.delete_rows(t, "id IN (0, 1, 2, 3)") == 4
    ids = sorted(r["id"] for r in t.scan().collect())
    assert ids == list(range(4, 40))
    assert crud.update_rows(t, "id = 10", {"v": -1}) == 1
    got = {r["id"]: r["v"] for r in t.scan().collect()}
    assert got[10] == -1 and got[11] == 110 and len(got) == 36
    # partition pruning still works through the merge
    evens = t.scan(filter="grp = 'even'")
    assert sorted(r["id"] for r in evens.collect()) == \
        [i for i in range(4, 40) if i % 2 == 0]
    t.compact()
    assert t.current_snapshot().delete_files == []
    assert sorted(r["id"] for r in t.scan().collect()) == list(range(4, 40))


def test_mor_after_add_column(spark, tmp_warehouse):
    """Schema evolution over MoR: a column added after data landed
    reads as NULL through the delete-merged scan, and new MoR
    mutations keep working against the widened schema."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table(
        "default.emor", [("id", "long"), ("v", "string")],
        properties=dict(MOR_PROPS),
    )
    t.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, v string"))
    assert crud.delete_rows(t, "id = 0") == 1
    t.add_column("score", "double")
    rows = {r["id"]: r for r in t.scan().collect()}
    assert 0 not in rows and rows[1]["score"] is None
    assert crud.update_rows(t, "id = 1", {"score": 9.5}) == 1
    rows = {r["id"]: r for r in t.scan().collect()}
    assert rows[1]["score"] == 9.5 and rows[2]["score"] is None
    assert len(t.current_snapshot().delete_files) == 2


def test_cow_upsert_folds_pending_mor_deletes(spark, tmp_warehouse):
    """A CoW upsert over a table with pending MoR deletes reads the
    MERGED scan and overwrites — deleted rows stay dead and the delete
    files fold away."""
    cat, t = _table(
        spark, tmp_warehouse,
        props={"write.delete.mode": "merge-on-read"},  # merge stays CoW
    )
    assert crud.delete_rows(t, "id = 7") == 1
    res = crud.upsert_rows(t, [{"id": 3, "v": "three"}], ["id"])
    assert res == {"updated": 1, "inserted": 0}
    snap = t.current_snapshot()
    assert snap.delete_files == []  # folded by the overwrite
    rows = {r["id"]: r["v"] for r in t.scan().collect()}
    assert 7 not in rows and rows[3] == "three" and len(rows) == 19


def test_mor_randomized_mutations_match_model(spark, tmp_warehouse):
    """Chaos, deterministic seed: a 30-op random sequence of MoR
    inserts/deletes/updates/upserts with interleaved compactions
    tracks a plain dict model exactly at every step, and a snapshot
    pinned mid-sequence time-travels back to the model state recorded
    at that point."""
    import random

    rng = random.Random(7)
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table(
        "default.chaos", [("id", "long"), ("v", "long")],
        properties={**MOR_PROPS, "write.merge.mode": "merge-on-read"},
    )
    model: dict[int, int] = {}
    next_id = 0
    pinned = None  # (snapshot_id, model copy)

    def check():
        got = {r["id"]: r["v"] for r in t.scan().collect()}
        assert got == model, (
            f"divergence: extra={set(got) - set(model)}, "
            f"missing={set(model) - set(got)}, "
            f"wrong={[k for k in got if k in model and got[k] != model[k]]}"
        )

    for step in range(30):
        op = rng.choice(["insert", "delete", "update", "upsert", "compact"])
        if op == "insert" or not model:
            rows = [(next_id + i, rng.randrange(1000)) for i in range(3)]
            next_id += 3
            t.append(spark.createDataFrame(rows, "id long, v long"))
            model.update(dict(rows))
        elif op == "delete":
            ids = rng.sample(sorted(model), min(2, len(model)))
            n = crud.delete_rows(
                t, f"id IN ({', '.join(map(str, ids))})"
            )
            assert n == len(ids)
            for i in ids:
                del model[i]
        elif op == "update":
            lo = rng.choice(sorted(model))
            val = rng.randrange(1000)
            n = crud.update_rows(t, f"id >= {lo}", {"v": val})
            hits = [k for k in model if k >= lo]
            assert n == len(hits)
            for k in hits:
                model[k] = val
        elif op == "upsert":
            old = rng.sample(sorted(model), min(1, len(model)))
            rows = [{"id": k, "v": rng.randrange(1000)} for k in old]
            rows.append({"id": next_id, "v": rng.randrange(1000)})
            next_id += 1
            res = crud.upsert_rows(t, rows, ["id"])
            assert res["updated"] == len(old)
            for r in rows:
                model[r["id"]] = r["v"]
        else:
            t.compact()
            assert t.current_snapshot().delete_files == []
        if step % 7 == 3:
            check()
        if step == 15:
            pinned = (t.current_snapshot().snapshot_id, dict(model))
    check()
    # time travel to the mid-sequence snapshot reads its model state
    snap_id, old_model = pinned
    got = {r["id"]: r["v"]
           for r in t.scan(snapshot_id=snap_id).collect()}
    assert got == old_model

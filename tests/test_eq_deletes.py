"""Equality deletes (Iceberg v2's second delete-file kind): delete by
key VALUES with data-sequence semantics — the delete applies only to
data files OLDER than it, so re-inserting a deleted key afterwards is
visible. No table scan on the write path, no row positions, and no
parquet-only gate (works on ORC). Covers: basic delete + counts,
sequence-exempt re-insert, NULL keys, multi-column keys, interplay
with position deletes and CoW rewrites, compaction folding, rollback,
time travel, orphan accounting, CAS, incremental reads, and a
randomized model chaos test."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from iceberg_lakehouse_spark.catalog import (
    CommitConflictError,
    LakehouseCatalog,
)
from iceberg_lakehouse_spark.operators import crud


def _table(spark, warehouse, name="default.eqdel", props=None, n=20):
    cat = LakehouseCatalog(spark, warehouse)
    t = cat.create_table(
        name, [("id", "long"), ("v", "string")],
        properties=dict(props or {}),
    )
    t.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(n // 2)], "id long, v string"))
    t.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(n // 2, n)], "id long, v string"))
    return cat, t


def _ids(t, **kw):
    return sorted(r["id"] for r in t.scan(**kw).collect())


def test_eq_delete_basic_and_counts(spark, tmp_warehouse):
    """Keys vanish from scans; no data file is touched; the returned
    count is the number of live matched rows."""
    _, t = _table(spark, tmp_warehouse)
    files_before = list(t.current_snapshot().files)
    n = crud.delete_rows_by_key(t, [{"id": 3}, {"id": 7}, {"id": 99}])
    assert n == 2  # 99 matches nothing
    snap = t.current_snapshot()
    assert snap.files == files_before
    assert len(snap.eq_delete_files) == 1
    assert snap.eq_delete_files[0]["cols"] == ["id"]
    assert snap.eq_delete_files[0]["seq"] == snap.snapshot_id
    assert _ids(t) == [i for i in range(20) if i not in (3, 7)]
    # filtered (stats-pruned) scans merge too
    assert t.scan(filter="id < 10").count() == 8
    # deleting the same key again counts zero live rows
    assert crud.delete_rows_by_key(t, [{"id": 3}]) == 0


def test_reinsert_after_delete_is_visible(spark, tmp_warehouse):
    """THE sequence-number semantics: a key deleted at sequence s and
    re-inserted at s+1 is visible — the delete applies only to files
    older than it."""
    _, t = _table(spark, tmp_warehouse)
    crud.delete_rows_by_key(t, [{"id": 5}])
    assert 5 not in _ids(t)
    crud.insert_rows(t, [{"id": 5, "v": "reborn"}])
    rows = {r["id"]: r["v"] for r in t.scan().collect()}
    assert rows[5] == "reborn"  # new file exempt from the older delete
    assert len(rows) == 20
    # and deleting again removes the reborn row
    assert crud.delete_rows_by_key(t, [{"id": 5}]) == 1
    assert 5 not in _ids(t)


def test_null_keys_match_null_safely(spark, tmp_warehouse):
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.nulls", [("k", "string"), ("x", "long")])
    t.append(spark.createDataFrame(
        [("a", 1), (None, 2), ("b", 3), (None, 4)], "k string, x long"))
    n = crud.delete_rows_by_key(t, [{"k": None}])
    assert n == 2
    assert sorted(r["x"] for r in t.scan().collect()) == [1, 3]


def test_multi_column_keys(spark, tmp_warehouse):
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table(
        "default.mc", [("a", "long"), ("b", "string"), ("v", "long")]
    )
    t.append(spark.createDataFrame(
        [(1, "x", 10), (1, "y", 11), (2, "x", 12)], "a long, b string, v long"
    ))
    assert crud.delete_rows_by_key(t, [{"a": 1, "b": "x"}]) == 1
    got = sorted((r["a"], r["b"]) for r in t.scan().collect())
    assert got == [(1, "y"), (2, "x")]
    # key rows must bind exactly the key columns
    with pytest.raises(ValueError, match="outside"):
        crud.delete_rows_by_key(t, [{"a": 1, "v": 5}], cols=["a"])
    with pytest.raises(ValueError, match="unknown key columns"):
        crud.delete_rows_by_key(t, [{"nope": 1}])


def test_eq_delete_on_orc_table(spark, tmp_warehouse):
    """Equality deletes need no row index → no parquet gate (position
    deletes ARE parquet-gated)."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table(
        "default.orc", [("id", "long"), ("v", "string")],
        properties={"write.format.default": "orc"},
    )
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    assert crud.delete_rows_by_key(t, [{"id": 1}]) == 1
    assert _ids(t) == [2]


def test_interplay_with_position_deletes(spark, tmp_warehouse):
    """Both delete kinds live on one snapshot and compose."""
    _, t = _table(spark, tmp_warehouse, props={
        "write.delete.mode": "merge-on-read",
    })
    crud.delete_rows(t, "id = 2")          # position delete
    crud.delete_rows_by_key(t, [{"id": 4}])  # equality delete
    snap = t.current_snapshot()
    assert snap.delete_files and snap.eq_delete_files
    assert _ids(t) == [i for i in range(20) if i not in (2, 4)]
    # counts over the merged view stay honest
    assert crud.delete_rows_by_key(t, [{"id": 2}, {"id": 4}]) == 0


def test_cow_rewrite_preserves_eq_deletes(spark, tmp_warehouse):
    """A file-pruned CoW update inherits the eq-delete list: kept
    files (older sequence) still honor it; the rewritten files are
    exempt by their NEW sequence — and were planned over the merged
    scan, so deleted rows don't come back."""
    _, t = _table(spark, tmp_warehouse)
    crud.delete_rows_by_key(t, [{"id": 1}, {"id": 15}])
    # CoW-update a row in the first file (which holds deleted id=1)
    assert crud.update_rows(t, "id = 2", {"v": "upd"}) == 1
    snap = t.current_snapshot()
    assert snap.eq_delete_files  # inherited
    rows = {r["id"]: r["v"] for r in t.scan().collect()}
    assert 1 not in rows and 15 not in rows
    assert rows[2] == "upd" and len(rows) == 18


def test_compact_folds_eq_deletes(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    crud.delete_rows_by_key(t, [{"id": 0}, {"id": 19}])
    res = t.compact()
    snap = t.current_snapshot()
    assert snap.eq_delete_files == [] and snap.delete_files == []
    assert _ids(t) == list(range(1, 19))
    assert res["files_after"] <= res["files_before"]


def test_rollback_and_time_travel(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    pre = t.current_snapshot().snapshot_id
    crud.delete_rows_by_key(t, [{"id": 8}])
    post = t.current_snapshot().snapshot_id
    crud.insert_rows(t, [{"id": 8, "v": "again"}])
    # time travel reads each snapshot's own delete state
    assert 8 in _ids(t, snapshot_id=pre)
    assert 8 not in _ids(t, snapshot_id=post)
    assert 8 in _ids(t)
    # rollback to the deleted state restores list AND sequences
    t.rollback(snapshot_id=post)
    assert 8 not in _ids(t)
    cur = t.current_snapshot()
    assert cur.eq_delete_files and cur.file_seqs
    # re-insert after rollback: still sequence-exempt
    crud.insert_rows(t, [{"id": 8, "v": "back"}])
    assert {r["v"] for r in t.scan().where("id = 8").collect()} == {"back"}


def test_orphan_accounting_references_eq_files(spark, tmp_warehouse):
    """Live eq-delete files are referenced — orphan cleanup must not
    remove them."""
    _, t = _table(spark, tmp_warehouse)
    crud.delete_rows_by_key(t, [{"id": 9}])
    eq_path = t.current_snapshot().eq_delete_files[0]["path"]
    assert eq_path not in t.orphan_files(grace_seconds=0)
    removed = t._delete_unreferenced(grace_seconds=0)
    assert eq_path not in removed
    assert 9 not in _ids(t)


def test_cas_conflict_on_concurrent_commit(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    cur = t.current_snapshot()
    key_df = spark.createDataFrame([(3,)], "id long")
    eq_files = t.write_eq_deletes(key_df, ["id"])
    # another writer lands first
    t.append(spark.createDataFrame([(100, "x")], "id long, v string"))
    with pytest.raises(CommitConflictError):
        t.commit_eq_deletes(
            eq_files, ["id"], expected_snapshot_id=cur.snapshot_id
        )


def test_incremental_read_over_eq_deletes(spark, tmp_warehouse):
    """The append-files fast path stays correct: rows appended since
    the watermark and then eq-deleted do not surface."""
    from iceberg_lakehouse_spark.governance.incremental import (
        WatermarkStore,
        incremental_read,
    )

    import os

    cat, t = _table(spark, tmp_warehouse)
    wm = WatermarkStore(os.path.join(tmp_warehouse, "wm.json"))
    _df, _info = incremental_read(t, wm, "p")
    wm.set("p", "default.eqdel", t.current_snapshot().snapshot_id)
    crud.insert_rows(t, [{"id": 50, "v": "new"}, {"id": 51, "v": "new"}])
    crud.delete_rows_by_key(t, [{"id": 50}, {"id": 2}])
    df, info = incremental_read(t, wm, "p")
    assert info["mode"] == "append_files"
    assert sorted(r["id"] for r in df.collect()) == [51]


def test_empty_table_and_empty_keys(spark, tmp_warehouse):
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.empty", [("id", "long"), ("v", "string")])
    assert crud.delete_rows_by_key(t, []) == 0
    assert crud.delete_rows_by_key(t, [{"id": 1}]) == 0
    assert t.current_snapshot() is None  # no commit happened


def test_randomized_model_chaos(spark, tmp_warehouse):
    """Randomized insert / eq-delete / re-insert / compact sequence
    tracked against a dict model — the eq analogue of the MoR chaos
    test (fixed seed, deterministic)."""
    import random

    rng = random.Random(1234)
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.chaos", [("k", "long"), ("v", "long")])
    live: list[tuple[int, int]] = []  # (k, v) multiset as list
    next_v = 0
    for step in range(14):
        op = rng.choice(["insert", "delete", "insert", "delete", "compact"])
        if op == "insert":
            ks = [rng.randrange(8) for _ in range(rng.randrange(1, 4))]
            rows = []
            for k in ks:
                rows.append({"k": k, "v": next_v})
                live.append((k, next_v))
                next_v += 1
            crud.insert_rows(t, rows)
        elif op == "delete":
            k = rng.randrange(8)
            expect = sum(1 for kk, _ in live if kk == k)
            got = crud.delete_rows_by_key(t, [{"k": k}])
            assert got == expect, f"step {step}: count {got} != {expect}"
            live = [(kk, vv) for kk, vv in live if kk != k]
        else:
            t.compact()
        got_rows = sorted((r["k"], r["v"]) for r in t.scan().collect())
        assert got_rows == sorted(live), f"step {step} ({op}) diverged"

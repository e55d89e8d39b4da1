"""Lazy changelog view (governance/cdc.py:changelog_view): the Iceberg
create_changelog_view analogue — row-level changes across a snapshot
range as ONE lazy DataFrame, additive commits planned from metadata
(added files / new delete keys, no diff job), rewrites via conformed
EXCEPT. Complements the reference's collected capture_changes report."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance.cdc import (
    capture_changes,
    changelog_view,
)
from iceberg_lakehouse_spark.operators import crud

MOR = {"write.delete.mode": "merge-on-read",
       "write.update.mode": "merge-on-read"}


def _t(spark, wh, props=None, name="default.cl"):
    cat = LakehouseCatalog(spark, wh)
    t = cat.create_table(name, [("id", "long"), ("v", "string")],
                         properties=dict(props or {}))
    t.append(spark.createDataFrame([(i, f"v{i}") for i in range(10)],
                                   "id long, v string"))
    return t


def test_append_only_chain(spark, tmp_warehouse):
    t = _t(spark, tmp_warehouse)
    s0 = t.current_snapshot().snapshot_id
    t.append(spark.createDataFrame([(10, "a"), (11, "b")],
                                   "id long, v string"))
    t.append(spark.createDataFrame([(12, "c")], "id long, v string"))
    log = changelog_view(t, s0).collect()
    assert len(log) == 3
    assert all(r["_change_type"] == "insert" for r in log)
    by_ord = {}
    for r in log:
        by_ord.setdefault(r["_change_ordinal"], []).append(r["id"])
    assert sorted(by_ord[1]) == [10, 11] and by_ord[2] == [12]
    snaps = [s.snapshot_id for s in t.snapshots()]
    assert {r["_commit_snapshot_id"] for r in log} == set(snaps[-2:])


def test_mor_delete_update_as_key_joins(spark, tmp_warehouse):
    t = _t(spark, tmp_warehouse, props=MOR)
    s0 = t.current_snapshot().snapshot_id
    crud.delete_rows(t, "id < 3")
    crud.update_rows(t, "id = 5", {"v": "FIVE"})
    log = changelog_view(t, s0).collect()
    d1 = sorted(r["id"] for r in log
                if r["_change_ordinal"] == 1 and r["_change_type"] == "delete")
    assert d1 == [0, 1, 2]
    assert not [r for r in log if r["_change_ordinal"] == 1
                and r["_change_type"] == "insert"]
    # update = delete of the old version + insert of the new
    o2 = [(r["_change_type"], r["id"], r["v"])
          for r in log if r["_change_ordinal"] == 2]
    assert sorted(o2) == [("delete", 5, "v5"), ("insert", 5, "FIVE")]
    # deleting an already-deleted row again contributes nothing
    crud.delete_rows(t, "id = 0")
    log2 = changelog_view(t, s0).collect()
    assert len(log2) == len(log)


def test_eq_delete_and_reinsert(spark, tmp_warehouse):
    t = _t(spark, tmp_warehouse)
    s0 = t.current_snapshot().snapshot_id
    crud.delete_rows_by_key(t, [{"id": 4}, {"id": 99}])
    t.append(spark.createDataFrame([(4, "reborn")], "id long, v string"))
    log = changelog_view(t, s0).collect()
    assert [(r["_change_type"], r["id"], r["v"]) for r in log
            if r["_change_ordinal"] == 1] == [("delete", 4, "v4")]
    assert [(r["_change_type"], r["id"], r["v"]) for r in log
            if r["_change_ordinal"] == 2] == [("insert", 4, "reborn")]


def test_cow_rewrite_and_compact(spark, tmp_warehouse):
    t = _t(spark, tmp_warehouse)
    s0 = t.current_snapshot().snapshot_id
    crud.update_rows(t, "id = 7", {"v": "SEVEN"})  # CoW rewrite
    t.compact()
    log = changelog_view(t, s0).collect()
    # the rewrite nets to exactly one delete+insert pair; compaction
    # rewrites files but nets to ZERO row changes
    assert sorted((r["_change_type"], r["id"], r["v"]) for r in log) == [
        ("delete", 7, "v7"), ("insert", 7, "SEVEN")]
    assert {r["_change_ordinal"] for r in log} == {1}


def test_range_and_errors(spark, tmp_warehouse):
    t = _t(spark, tmp_warehouse)
    s0 = t.current_snapshot().snapshot_id
    t.append(spark.createDataFrame([(10, "a")], "id long, v string"))
    s1 = t.current_snapshot().snapshot_id
    t.append(spark.createDataFrame([(11, "b")], "id long, v string"))
    # bounded range excludes the later commit
    log = changelog_view(t, s0, s1).collect()
    assert [(r["id"], r["_change_ordinal"]) for r in log] == [(10, 1)]
    # from == to → empty, schema carries the metadata columns
    empty = changelog_view(t, s1, s1)
    assert empty.count() == 0
    assert {"_change_type", "_commit_snapshot_id",
            "_change_ordinal"} <= set(empty.columns)
    with pytest.raises(ValueError, match="not found"):
        changelog_view(t, 12345)
    # reversed range: `to` is not a descendant of `from`
    with pytest.raises(ValueError, match="ancestor"):
        changelog_view(t, t.current_snapshot().snapshot_id, s0)


def test_agrees_with_capture_changes(spark, tmp_warehouse):
    t = _t(spark, tmp_warehouse, props=MOR)
    s0 = t.current_snapshot().snapshot_id
    crud.insert_rows(t, [{"id": 20, "v": "x"}])
    crud.delete_rows(t, "id = 1")
    crud.update_rows(t, "id = 2", {"v": "two"})
    head = t.current_snapshot().snapshot_id
    cap = capture_changes(t, s0, head, key_columns=["id"])
    log = changelog_view(t, s0, head).collect()
    n_ins = sum(1 for r in log if r["_change_type"] == "insert")
    n_del = sum(1 for r in log if r["_change_type"] == "delete")
    # changelog counts updates as delete+insert pairs
    assert n_ins == cap["summary"]["inserts"] + cap["summary"]["updates"]
    assert n_del == cap["summary"]["deletes"] + cap["summary"]["updates"]


def test_lazy_plan_no_full_scan_for_additive_chain(spark, tmp_warehouse):
    """Additive commits must plan from added files + delete keys only:
    the physical plan's parquet scans must not include the initial
    load's files for an append-only range."""
    t = _t(spark, tmp_warehouse)
    s0 = t.current_snapshot().snapshot_id
    first_files = set(t.current_snapshot().files)
    t.append(spark.createDataFrame([(10, "a")], "id long, v string"))
    df = changelog_view(t, s0)
    scanned = {f for f in df.inputFiles()}
    assert not any(any(ff in s for s in scanned) for ff in first_files)


def test_replace_where_changelog_is_exact_diff(spark, tmp_warehouse):
    """A replace_where commit surfaces in the changelog as exactly the
    slice's deletes plus the replacement's inserts — untouched rows
    never appear (the conformed-EXCEPT rewrite path)."""
    from iceberg_lakehouse_spark.operators import crud

    t = _t(spark, tmp_warehouse)
    t.append(spark.createDataFrame(
        [(1, "keep"), (2, "old"), (3, "old")], "id long, v string"))
    s0 = t.current_snapshot().snapshot_id
    crud.replace_where(
        t, "v = 'old'",
        spark.createDataFrame([(9, "old")], "id long, v string"))
    log = changelog_view(t, s0).collect()
    changes = sorted((r["_change_type"], r["id"]) for r in log)
    assert changes == [("delete", 2), ("delete", 3), ("insert", 9)]


def test_overwrite_partitions_changelog_is_exact_diff(spark, tmp_warehouse):
    from iceberg_lakehouse_spark.catalog import LakehouseCatalog
    from iceberg_lakehouse_spark.operators import crud

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table(
        "default.clop", [("id", "long"), ("day", "string")],
        partition_by=["day"])
    t.append(spark.createDataFrame(
        [(1, "d1"), (2, "d2"), (3, "d2")], "id long, day string"))
    s0 = t.current_snapshot().snapshot_id
    crud.overwrite_partitions(
        t, spark.createDataFrame([(9, "d2")], "id long, day string"))
    log = changelog_view(t, s0).collect()
    changes = sorted((r["_change_type"], r["id"]) for r in log)
    assert changes == [("delete", 2), ("delete", 3), ("insert", 9)]


def test_compact_where_changelog_nets_zero(spark, tmp_warehouse):
    """Partial compaction rewrites files, not rows: the changelog over
    a compact(where=) commit is empty."""
    t = _t(spark, tmp_warehouse)
    for k in range(3):
        t.append(spark.createDataFrame(
            [(k, f"v{k}")], "id long, v string").repartition(1))
    s0 = t.current_snapshot().snapshot_id
    res = t.compact(where="id <= 1", target_partitions=1)
    assert res["rewritten_files"] >= 2
    assert changelog_view(t, s0).count() == 0

"""Snapshot refs: branches and tags (Iceberg refs model) and the
write-audit-publish workflow. Branch commits append to the same
snapshot log (global ids, time travel by id unchanged) but chain
parent_id off the branch ref; "main" stays implicit (= log tail) until
the first branch commit pins it, so legacy tables need no migration.
Covers: isolation both ways, per-branch CAS, WAP fast-forward with the
ancestor check, tag immutability, expire protection of ref targets,
branch CRUD, and ref errors."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import (
    CommitConflictError,
    LakehouseCatalog,
)
from iceberg_lakehouse_spark.operators import crud


def _table(spark, warehouse, name="default.refs"):
    cat = LakehouseCatalog(spark, warehouse)
    t = cat.create_table(name, [("id", "long"), ("v", "string")])
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    return cat, t


def _ids(t, **kw):
    return sorted(r["id"] for r in t.scan(**kw).collect())


def test_branch_write_isolated_from_main(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    t.create_branch("audit")
    b = t.for_branch("audit")
    b.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    assert _ids(b) == [1, 2, 3]
    assert _ids(t) == [1, 2]  # main untouched
    # and main writes stay invisible on the branch
    t.append(spark.createDataFrame([(10, "m")], "id long, v string"))
    assert _ids(t) == [1, 2, 10]
    assert _ids(b) == [1, 2, 3]
    # both heads advance independently; ids stay globally unique
    refs = t.list_refs()
    assert refs["branches"]["audit"] != refs["branches"]["main"]
    ids = [s.snapshot_id for s in t.snapshots()]
    assert len(ids) == len(set(ids))


def test_write_audit_publish_fast_forward(spark, tmp_warehouse):
    """The WAP loop: write to a branch, audit via ref scan, publish by
    fast-forwarding main."""
    _, t = _table(spark, tmp_warehouse)
    t.create_branch("wap")
    b = t.for_branch("wap")
    crud.insert_rows(b, [{"id": 3, "v": "staged"}])
    # audit: the branch head is readable by ref without a handle
    assert _ids(t, ref="wap") == [1, 2, 3]
    assert _ids(t) == [1, 2]
    res = t.fast_forward("main", "wap")
    assert res["to"] == t.list_refs()["branches"]["main"]
    assert _ids(t) == [1, 2, 3]  # published
    t.drop_branch("wap")
    assert "wap" not in t.list_refs()["branches"]
    assert _ids(t) == [1, 2, 3]  # data survives the ref drop


def test_fast_forward_refuses_diverged_branches(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    t.create_branch("feature")
    b = t.for_branch("feature")
    b.append(spark.createDataFrame([(3, "f")], "id long, v string"))
    t.append(spark.createDataFrame([(4, "m")], "id long, v string"))
    with pytest.raises(ValueError, match="not an ancestor"):
        t.fast_forward("main", "feature")
    # the reverse direction is also diverged
    with pytest.raises(ValueError, match="not an ancestor"):
        t.fast_forward("feature", "main")


def test_per_branch_cas(spark, tmp_warehouse):
    """CAS compares against the BRANCH head: a concurrent main commit
    does not conflict a branch commit, but a concurrent branch commit
    does."""
    _, t = _table(spark, tmp_warehouse)
    t.create_branch("b1")
    b = t.for_branch("b1")
    cur = b.current_snapshot()
    # main moves — irrelevant to the branch CAS
    t.append(spark.createDataFrame([(9, "m")], "id long, v string"))
    df = spark.createDataFrame([(3, "x")], "id long, v string")
    b.overwrite(df, expected_snapshot_id=cur.snapshot_id)  # no conflict
    assert _ids(b) == [3]
    # now a stale branch CAS must conflict
    b2 = t.for_branch("b1")
    stale = cur.snapshot_id
    with pytest.raises(CommitConflictError):
        b2.overwrite(df, expected_snapshot_id=stale)


def test_tags_immutable_and_protected_from_expiry(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    tagged = t.current_snapshot().snapshot_id
    t.create_tag("v1")
    for i in range(3):
        t.append(spark.createDataFrame([(10 + i, "x")], "id long, v string"))
    assert _ids(t, ref="v1") == [1, 2]  # tag pins the old head
    res = t.expire_snapshots(retain_last=1, grace_seconds=0)
    assert tagged not in res["expired"]  # ref target survives
    assert _ids(t, ref="v1") == [1, 2]
    t.drop_tag("v1")
    with pytest.raises(ValueError, match="not found"):
        t.scan(ref="v1")


def test_branch_crud_and_mor(spark, tmp_warehouse):
    """CRUD operators work against a branch handle and stay isolated —
    including equality deletes."""
    _, t = _table(spark, tmp_warehouse)
    t.create_branch("mut")
    b = t.for_branch("mut")
    assert crud.update_rows(b, "id = 1", {"v": "B"}) == 1
    assert crud.delete_rows_by_key(b, [{"id": 2}]) == 1
    rows = {r["id"]: r["v"] for r in b.scan().collect()}
    assert rows == {1: "B"}
    main_rows = {r["id"]: r["v"] for r in t.scan().collect()}
    assert main_rows == {1: "a", 2: "b"}


def test_ref_errors(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    with pytest.raises(ValueError, match="not found"):
        t.for_branch("nope")
    t.create_branch("dup")
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("dup")
    with pytest.raises(ValueError, match="already exists"):
        t.create_tag("dup")
    with pytest.raises(ValueError, match="not 'main'"):
        t.create_branch("main")
    with pytest.raises(ValueError, match="cannot drop"):
        t.drop_branch("main")
    # branching an empty table is meaningless
    cat = LakehouseCatalog(spark, tmp_warehouse)
    e = cat.create_table("default.em", [("id", "long")])
    with pytest.raises(ValueError, match="empty"):
        e.create_branch("b")


def test_branch_from_historical_snapshot(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    old = t.current_snapshot().snapshot_id
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    t.create_branch("past", from_snapshot_id=old)
    b = t.for_branch("past")
    assert _ids(b) == [1, 2]
    b.append(spark.createDataFrame([(99, "p")], "id long, v string"))
    assert _ids(b) == [1, 2, 99]
    assert _ids(t) == [1, 2, 3]


def test_fast_forward_between_branches(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    t.create_branch("dev")
    d = t.for_branch("dev")
    d.append(spark.createDataFrame([(3, "d")], "id long, v string"))
    t.create_branch("stage", from_snapshot_id=t.current_snapshot().snapshot_id)
    t.fast_forward("stage", "dev")
    assert _ids(t.for_branch("stage")) == [1, 2, 3]

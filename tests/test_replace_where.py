"""replace_where — filtered overwrite in one atomic commit (round 8).

The idempotent partition-reload primitive: delete rows matching a
predicate and insert the replacement batch with no intermediate
snapshot where the slice is missing or doubled. Covers: file pruning
(untouched files carried by reference), enforce semantics, NULL
predicates keeping rows, empty-match insert-only, empty-table path,
idempotent rerun convergence, MoR pending-delete folding (no
resurrection), time travel, CAS conflict, and changelog/CDC shape.
"""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import (
    CommitConflictError,
    LakehouseCatalog,
)
from iceberg_lakehouse_spark.operators import crud


def _table(spark, warehouse, name="default.rw", props=None, n=20):
    cat = LakehouseCatalog(spark, warehouse)
    t = cat.create_table(
        name, [("id", "long"), ("day", "string"), ("v", "string")],
        properties=dict(props or {}),
    )
    # one file per day slice, disjoint day ranges → stats-prunable
    t.append(spark.createDataFrame(
        [(i, "d1", f"a{i}") for i in range(n // 2)],
        "id long, day string, v string").repartition(1))
    t.append(spark.createDataFrame(
        [(i, "d2", f"a{i}") for i in range(n // 2, n)],
        "id long, day string, v string").repartition(1))
    return cat, t


def test_replace_where_swaps_one_partition_atomically(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    files_before = list(t.current_snapshot().files)
    new = spark.createDataFrame(
        [(100, "d2", "new0"), (101, "d2", "new1")],
        "id long, day string, v string")
    res = crud.replace_where(t, "day = 'd2'", new)
    assert res == {"deleted_rows": 10, "inserted_rows": 2}
    rows = {(r["id"], r["day"]) for r in t.scan().collect()}
    assert rows == {(i, "d1") for i in range(10)} | {(100, "d2"), (101, "d2")}
    # exactly one new snapshot; d1 file carried by reference
    snap = t.current_snapshot()
    assert snap.summary["operation_detail"] == "replace_where"
    kept = set(snap.files) & set(files_before)
    assert len(kept) >= 1  # the untouched d1 file survives unrewritten


def test_replace_where_prunes_untouched_files(spark, tmp_warehouse):
    """The probe must not rewrite files whose stats exclude the
    predicate: the d1 file path is byte-identical across the commit."""
    _, t = _table(spark, tmp_warehouse)
    snap0 = t.current_snapshot()
    d1_files = {f for f in snap0.files}
    crud.replace_where(
        t, "day = 'd2'",
        spark.createDataFrame([(1, "d2", "x")], "id long, day string, v string"))
    snap1 = t.current_snapshot()
    carried = d1_files & set(snap1.files)
    assert len(carried) == len(d1_files) - 1  # only the d2 file left the list


def test_replace_where_enforce_rejects_out_of_slice_rows(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    bad = spark.createDataFrame(
        [(1, "d3", "leak")], "id long, day string, v string")
    with pytest.raises(ValueError, match="do not satisfy the filter"):
        crud.replace_where(t, "day = 'd2'", bad)
    # enforce=False allows it (documented escape hatch)
    res = crud.replace_where(t, "day = 'd2'", bad, enforce=False)
    assert res["inserted_rows"] == 1
    assert t.scan(filter="day = 'd3'").count() == 1


def test_replace_where_null_predicate_rows_kept(spark, tmp_warehouse):
    """SQL delete semantics: rows where the predicate is NULL are NOT
    replaced."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.rwnull", [("id", "long"), ("day", "string")])
    t.append(spark.createDataFrame(
        [(1, "d1"), (2, None), (3, "d2")], "id long, day string"))
    res = crud.replace_where(
        t, "day = 'd2'",
        spark.createDataFrame([(30, "d2")], "id long, day string"))
    assert res["deleted_rows"] == 1
    ids = sorted(r["id"] for r in t.scan().collect())
    assert ids == [1, 2, 30]  # NULL-day row survives


def test_replace_where_no_match_is_plain_insert(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    res = crud.replace_where(
        t, "day = 'd9'",
        spark.createDataFrame([(1, "d9", "x")], "id long, day string, v string"))
    assert res == {"deleted_rows": 0, "inserted_rows": 1}
    assert t.scan().count() == 21


def test_replace_where_empty_table(spark, tmp_warehouse):
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.rwempty", [("id", "long"), ("day", "string")])
    res = crud.replace_where(
        t, "day = 'd1'",
        spark.createDataFrame([(1, "d1")], "id long, day string"))
    assert res == {"deleted_rows": 0, "inserted_rows": 1}
    assert t.scan().count() == 1


def test_replace_where_rerun_converges(spark, tmp_warehouse):
    """Idempotence — the reason this op exists: rerunning the same
    backfill yields the same table, not duplicates."""
    _, t = _table(spark, tmp_warehouse)
    new = spark.createDataFrame(
        [(100, "d2", "n")], "id long, day string, v string")
    crud.replace_where(t, "day = 'd2'", new)
    first = sorted((r["id"], r["day"], r["v"]) for r in t.scan().collect())
    crud.replace_where(t, "day = 'd2'", new)
    second = sorted((r["id"], r["day"], r["v"]) for r in t.scan().collect())
    assert first == second


def test_replace_where_folds_pending_mor_deletes(spark, tmp_warehouse):
    """A table with pending position deletes must not resurrect deleted
    rows when replace_where rewrites a file that carries them."""
    _, t = _table(spark, tmp_warehouse, name="default.rwmor", props={
        "write.delete.mode": "merge-on-read"})
    assert crud.delete_rows(t, "id = 3") == 1       # MoR: delete file only
    assert len(t.current_snapshot().delete_files) == 1
    # replace the d1 slice's ids >= 5 half? No — replace the WHOLE d1
    # slice: the rewrite scans the d1 file delete-merged, so id=3 must
    # not come back even though its delete entry goes stale.
    res = crud.replace_where(
        t, "day = 'd1' AND id >= 5",
        spark.createDataFrame(
            [(50, "d1", "n")], "id long, day string, v string"))
    assert res["deleted_rows"] == 5
    ids = sorted(r["id"] for r in t.scan(filter="day = 'd1'").collect())
    assert ids == [0, 1, 2, 4, 50]  # 3 stays dead, 5-9 replaced by 50


def test_replace_where_time_travel_and_rollback(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    before = t.current_snapshot().snapshot_id
    crud.replace_where(
        t, "day = 'd2'",
        spark.createDataFrame([(1, "d2", "x")], "id long, day string, v string"))
    assert t.scan(snapshot_id=before).count() == 20
    t.rollback(before)
    assert t.scan().count() == 20


def test_replace_where_cas_conflict(spark, tmp_warehouse):
    """A concurrent commit between the probe and the commit raises
    instead of silently erasing the other writer."""
    _, t = _table(spark, tmp_warehouse)
    orig_replace = t.replace_files

    def racing_replace(keep, repl, summary, expected_snapshot_id=None):
        # sneak a concurrent append in just before the commit
        t2 = LakehouseCatalog(spark, tmp_warehouse).load_table("default.rw")
        t2.append(spark.createDataFrame(
            [(999, "d9", "race")], "id long, day string, v string"))
        return orig_replace(keep, repl, summary,
                            expected_snapshot_id=expected_snapshot_id)

    t.replace_files = racing_replace
    with pytest.raises(CommitConflictError):
        crud.replace_where(
            t, "day = 'd2'",
            spark.createDataFrame(
                [(1, "d2", "x")], "id long, day string, v string"))
    t.replace_files = orig_replace
    # the racer's row survived; the failed commit changed nothing else
    assert t.scan(filter="id = 999").count() == 1
    assert t.scan().count() == 21


def test_replace_where_requires_filter(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    with pytest.raises(ValueError, match="required"):
        crud.replace_where(
            t, "  ",
            spark.createDataFrame([(1, "d1", "x")],
                                  "id long, day string, v string"))

"""Partial compaction — compact(where=...) (round 8): rewrite only the
files whose stats intersect a predicate (Iceberg rewrite_data_files
filter analogue). The predicate selects FILES, never drops rows."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import (
    CommitConflictError,
    LakehouseCatalog,
)
from iceberg_lakehouse_spark.operators import crud


def _table(spark, warehouse, name="default.cw"):
    cat = LakehouseCatalog(spark, warehouse)
    t = cat.create_table(name, [("id", "long"), ("v", "string")])
    # one big "cold" file (high id range) + three small "hot" files
    t.append(spark.createDataFrame(
        [(i, f"c{i}") for i in range(100, 150)], "id long, v string")
        .repartition(1))
    for k in range(3):
        t.append(spark.createDataFrame(
            [(k * 10 + j, f"h{k}{j}") for j in range(5)],
            "id long, v string").repartition(1))
    return cat, t


def test_compact_where_rewrites_only_matching_files(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    snap0 = t.current_snapshot()
    assert len(snap0.files) == 4
    rows_before = sorted((r["id"], r["v"]) for r in t.scan().collect())
    res = t.compact(where="id < 100", target_partitions=1)
    assert res["rewritten_files"] == 3
    assert res["files_before"] == 4
    snap1 = t.current_snapshot()
    # the cold file carried by reference; the three hot files merged
    carried = set(snap0.files) & set(snap1.files)
    assert len(carried) == 1
    assert len(snap1.files) < 4
    # no row dropped, no value changed
    assert sorted((r["id"], r["v"]) for r in t.scan().collect()) == rows_before
    assert snap1.summary["operation_detail"] == "compact_where"


def test_compact_where_no_match_is_noop(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    snap0 = t.current_snapshot()
    res = t.compact(where="id > 1000000")
    assert "nothing to compact" in res["message"]
    assert t.current_snapshot().snapshot_id == snap0.snapshot_id


def test_compact_where_folds_pending_mor_deletes(spark, tmp_warehouse):
    """Rewritten files read through the delete-merged scan: a deleted
    row must not resurrect; deletes on KEPT files stay live."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table(
        "default.cwmor", [("id", "long"), ("v", "string")],
        properties={"write.delete.mode": "merge-on-read"})
    t.append(spark.createDataFrame(
        [(i, f"a{i}") for i in range(10)], "id long, v string")
        .repartition(1))
    t.append(spark.createDataFrame(
        [(i, f"b{i}") for i in range(100, 110)], "id long, v string")
        .repartition(1))
    crud.delete_rows(t, "id = 3")        # hits the low file (rewritten)
    crud.delete_rows(t, "id = 105")      # hits the high file (kept)
    res = t.compact(where="id < 50")
    assert res["rewritten_files"] == 1
    ids = sorted(r["id"] for r in t.scan().collect())
    assert 3 not in ids and 105 not in ids
    assert len(ids) == 18


def test_compact_where_cas_conflict(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse, name="default.cwcas")
    orig = t.replace_files

    def racing(keep, repl, summary, expected_snapshot_id=None):
        t2 = LakehouseCatalog(spark, tmp_warehouse).load_table(
            "default.cwcas")
        t2.append(spark.createDataFrame(
            [(999, "race")], "id long, v string"))
        return orig(keep, repl, summary,
                    expected_snapshot_id=expected_snapshot_id)

    t.replace_files = racing
    with pytest.raises(CommitConflictError):
        t.compact(where="id < 100")
    t.replace_files = orig
    assert t.scan(filter="id = 999").count() == 1


def test_compact_where_with_sort_clusters_subset(spark, tmp_warehouse):
    """where + sort_by composes: the rewritten subset is range-
    clustered so later point predicates prune within it."""
    _, t = _table(spark, tmp_warehouse, name="default.cwsort")
    res = t.compact(where="id < 100", sort_by=["id"], target_partitions=2)
    assert res["rewritten_files"] == 3
    assert res["clustered_by"] == ["id"]
    # pruning now keeps at most 1 of the 2 rewritten files + never the
    # cold file for a point lookup in the hot range
    kept, total = t.prune_files("id = 3")
    assert total == 3  # 1 cold + 2 rewritten
    assert len(kept) == 1

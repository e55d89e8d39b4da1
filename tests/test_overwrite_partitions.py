"""Dynamic partition overwrite (round 8): replace exactly the
partitions present in the incoming batch, atomically, from metadata
alone — no table scan in the write path."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import (
    CommitConflictError,
    LakehouseCatalog,
)
from iceberg_lakehouse_spark.operators import crud


def _table(spark, warehouse, name="default.op"):
    cat = LakehouseCatalog(spark, warehouse)
    t = cat.create_table(
        name, [("id", "long"), ("day", "string"), ("v", "string")],
        partition_by=["day"],
    )
    t.append(spark.createDataFrame(
        [(i, f"d{i % 3}", f"a{i}") for i in range(30)],
        "id long, day string, v string"))
    return cat, t


def test_overwrite_swaps_only_present_partitions(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse)
    snap0 = t.current_snapshot()
    new = spark.createDataFrame(
        [(100, "d1", "n0"), (101, "d1", "n1")],
        "id long, day string, v string")
    res = crud.overwrite_partitions(t, new)
    assert res["replaced_partitions"] == 1
    assert res["inserted_rows"] == 2
    assert res["dropped_files"] >= 1
    rows = {(r["id"], r["day"]) for r in t.scan().collect()}
    assert (100, "d1") in rows and (101, "d1") in rows
    assert not any(d == "d1" and i < 100 for i, d in rows)  # old d1 gone
    assert sum(1 for _, d in rows if d == "d0") == 10       # d0 untouched
    assert sum(1 for _, d in rows if d == "d2") == 10
    # untouched partitions carry by reference
    snap1 = t.current_snapshot()
    assert snap1.summary["operation_detail"] == "overwrite_partitions"
    kept = set(snap0.files) & set(snap1.files)
    assert kept  # d0/d2 files survived unrewritten
    assert all("_p_day=d1" not in f for f in kept)


def test_overwrite_multiple_partitions_and_rerun_idempotent(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse, name="default.op2")
    new = spark.createDataFrame(
        [(100, "d0", "x"), (200, "d2", "y")],
        "id long, day string, v string")
    crud.overwrite_partitions(t, new)
    first = sorted(map(tuple, t.scan().collect()))
    crud.overwrite_partitions(t, new)
    assert sorted(map(tuple, t.scan().collect())) == first
    days = {r["day"] for r in t.scan().collect()}
    assert days == {"d0", "d1", "d2"}
    assert t.scan(filter="day = 'd0'").count() == 1


def test_overwrite_new_partition_is_insert(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse, name="default.op3")
    res = crud.overwrite_partitions(
        t, spark.createDataFrame(
            [(999, "d9", "new")], "id long, day string, v string"))
    assert res["dropped_files"] == 0
    assert res["replaced_partitions"] == 1  # present in df, empty before
    assert t.scan().count() == 31


def test_overwrite_null_partition_value(spark, tmp_warehouse):
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table(
        "default.opnull", [("id", "long"), ("day", "string")],
        partition_by=["day"])
    t.append(spark.createDataFrame(
        [(1, "d1"), (2, None), (3, None)], "id long, day string"))
    res = crud.overwrite_partitions(
        t, spark.createDataFrame([(20, None)], "id long, day string"))
    assert res["replaced_partitions"] == 1
    rows = sorted((r["id"], r["day"]) for r in t.scan().collect())
    assert rows == [(1, "d1"), (20, None)]


def test_overwrite_requires_partitioned_table(spark, tmp_warehouse):
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.opflat", [("id", "long")])
    with pytest.raises(ValueError, match="partitioned"):
        crud.overwrite_partitions(
            t, spark.createDataFrame([(1,)], "id long"))


def test_overwrite_rejects_pre_evolution_files(spark, tmp_warehouse):
    """A file written before the current partition spec holds many
    partitions' rows — swapping directories would corrupt it, so the
    op must refuse and point at compact()."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.opevo", [("id", "long"), ("day", "string")])
    t.append(spark.createDataFrame(
        [(1, "d1"), (2, "d2")], "id long, day string"))
    t.evolve_partition_spec(["day"])
    with pytest.raises(ValueError, match="compact"):
        crud.overwrite_partitions(
            t, spark.createDataFrame([(9, "d1")], "id long, day string"))
    t.compact()
    res = crud.overwrite_partitions(
        t, spark.createDataFrame([(9, "d1")], "id long, day string"))
    assert res["replaced_partitions"] == 1
    assert sorted((r["id"], r["day"]) for r in t.scan().collect()) == \
        [(2, "d2"), (9, "d1")]


def test_overwrite_transform_partition(spark, tmp_warehouse):
    """Non-identity transform (bucket): matching happens on the
    TRANSFORM value, so an incoming row replaces exactly its bucket."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table(
        "default.opbkt", [("id", "long"), ("v", "string")],
        partition_by=["bucket(4, id)"])
    t.append(spark.createDataFrame(
        [(i, f"a{i}") for i in range(20)], "id long, v string"))
    before = t.scan().count()
    res = crud.overwrite_partitions(
        t, spark.createDataFrame([(0, "NEW")], "id long, v string"))
    assert res["replaced_partitions"] == 1
    after = t.scan().collect()
    # every row of id=0's bucket is gone, replaced by the single new row
    assert len(after) < before
    assert [r["v"] for r in after if r["id"] == 0] == ["NEW"]


def test_overwrite_cas_conflict(spark, tmp_warehouse):
    _, t = _table(spark, tmp_warehouse, name="default.opcas")
    orig = t.replace_files

    def racing(keep, repl, summary, expected_snapshot_id=None):
        t2 = LakehouseCatalog(spark, tmp_warehouse).load_table(
            "default.opcas")
        t2.append(spark.createDataFrame(
            [(999, "d9", "race")], "id long, day string, v string"))
        return orig(keep, repl, summary,
                    expected_snapshot_id=expected_snapshot_id)

    t.replace_files = racing
    with pytest.raises(CommitConflictError):
        crud.overwrite_partitions(
            t, spark.createDataFrame(
                [(1, "d1", "x")], "id long, day string, v string"))
    t.replace_files = orig
    assert t.scan(filter="id = 999").count() == 1


def test_overwrite_empty_string_partition_value(spark, tmp_warehouse):
    """Spark's partitioned writer sends EMPTY-STRING values to the
    __HIVE_DEFAULT_PARTITION__ directory like nulls; the path-tuple
    match must treat them the same or the overwrite silently degrades
    to an append (old rows kept + new rows added)."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table(
        "default.opempty", [("id", "long"), ("day", "string")],
        partition_by=["day"])
    t.append(spark.createDataFrame(
        [(1, "d1"), (2, ""), (3, None)], "id long, day string"))
    res = crud.overwrite_partitions(
        t, spark.createDataFrame([(20, "")], "id long, day string"))
    assert res["replaced_partitions"] == 1
    assert res["dropped_files"] >= 1      # the old default-dir file went
    rows = sorted((r["id"], r["day"] or "") for r in t.scan().collect())
    # ids 2 AND 3 are gone: empty string and null share one directory,
    # so the default partition swaps as a unit (documented Hive layout)
    assert [r[0] for r in rows] == [1, 20]

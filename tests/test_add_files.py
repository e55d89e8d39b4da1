"""add_files — zero-copy parquet adoption (round 8): register existing
parquet files as an append commit without reading or rewriting data."""

from __future__ import annotations

import os

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog


def _external(spark, tmp_path, n=20, parts=2):
    src = str(tmp_path / "ext")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(n)], "id long, v string"
    ).repartition(parts).write.parquet(src)
    return sorted(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )


def test_add_files_is_zero_copy_and_scannable(spark, tmp_warehouse, tmp_path):
    files = _external(spark, tmp_path)
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.adopt", [("id", "long"), ("v", "string")])
    snap = t.add_files(files)
    assert snap.summary["operation_detail"] == "add_files"
    assert snap.summary["added_files"] == len(files)
    # zero-copy: the originals got a second hardlink, not a copy
    assert all(os.stat(f).st_nlink >= 2 for f in files)
    ids = sorted(r["id"] for r in t.scan().collect())
    assert ids == list(range(20))
    # adopted files participate in stats pruning like native writes
    kept, total = t.prune_files("id = 0")
    assert total == len(files)
    assert len(kept) < total


def test_add_files_appends_to_existing_data(spark, tmp_warehouse, tmp_path):
    files = _external(spark, tmp_path, n=5, parts=1)
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.adopt2", [("id", "long"), ("v", "string")])
    t.append(spark.createDataFrame([(100, "x")], "id long, v string"))
    before = t.current_snapshot().snapshot_id
    t.add_files(files)
    assert t.scan().count() == 6
    # time travel: the pre-adoption snapshot is intact
    assert t.scan(snapshot_id=before).count() == 1


def test_add_files_schema_mismatch_rejected_before_linking(
    spark, tmp_warehouse, tmp_path
):
    src = str(tmp_path / "bad")
    spark.createDataFrame([(1, 2.0)], "id long, other double") \
        .write.parquet(src)
    files = [os.path.join(src, f) for f in os.listdir(src)
             if f.endswith(".parquet")]
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.adopt3", [("id", "long"), ("v", "string")])
    with pytest.raises(ValueError, match="does not match table schema"):
        t.add_files(files)
    # nothing was linked into the table
    assert t.current_snapshot() is None or not t.current_snapshot().files
    assert t.scan().count() == 0


def test_add_files_guards(spark, tmp_warehouse, tmp_path):
    cat = LakehouseCatalog(spark, tmp_warehouse)
    part = cat.create_table(
        "default.adoptp", [("id", "long"), ("day", "string")],
        partition_by=["day"])
    with pytest.raises(ValueError, match="unpartitioned"):
        part.add_files(["/nonexistent.parquet"])
    t = cat.create_table("default.adopt4", [("id", "long"), ("v", "string")])
    with pytest.raises(ValueError, match="no files"):
        t.add_files([])
    with pytest.raises(ValueError, match="not a file"):
        t.add_files([str(tmp_path / "missing.parquet")])


def test_add_files_then_crud_and_compact(spark, tmp_warehouse, tmp_path):
    """Adopted files behave like native ones under the rest of the
    engine: CoW delete prunes to the matching adopted file; compact
    folds everything."""
    from iceberg_lakehouse_spark.operators import crud

    files = _external(spark, tmp_path, n=20, parts=2)
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.adopt5", [("id", "long"), ("v", "string")])
    t.add_files(files)
    assert crud.delete_rows(t, "id = 3") == 1
    assert t.scan().count() == 19
    res = t.compact(target_partitions=1)
    assert res["files_after"] == 1
    assert t.scan().count() == 19


def test_add_files_rejects_intra_batch_schema_drift(
    spark, tmp_warehouse, tmp_path
):
    """A batch where ONE file diverges must be rejected: batch-level
    spark.read inference looks at a single footer and would wave the
    whole batch through, null-filling the drifted file at scan time."""
    good = _external(spark, tmp_path, n=5, parts=1)
    bad_dir = str(tmp_path / "drift")
    spark.createDataFrame([(1,)], "id long").write.parquet(bad_dir)
    bad = [os.path.join(bad_dir, f) for f in os.listdir(bad_dir)
           if f.endswith(".parquet")]
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.adopt5", [("id", "long"), ("v", "string")])
    with pytest.raises(ValueError, match="drift inside batch"):
        t.add_files(good + bad)
    assert t.scan().count() == 0  # nothing linked


def test_add_files_tolerates_column_order_and_metadata(
    spark, tmp_warehouse, tmp_path
):
    """Files with the same name->type columns in a DIFFERENT footer
    order scan identically (Spark resolves parquet columns by name) —
    the per-file drift check must accept them."""
    a = str(tmp_path / "ordA")
    b = str(tmp_path / "ordB")
    spark.createDataFrame([(1, "x")], "id long, v string").write.parquet(a)
    spark.createDataFrame([("y", 2)], "v string, id long") \
        .select("v", "id").write.parquet(b)
    files = sorted(
        os.path.join(d, f)
        for d in (a, b) for f in os.listdir(d) if f.endswith(".parquet")
    )
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("default.adopt6", [("id", "long"), ("v", "string")])
    t.add_files(files)
    rows = sorted((r["id"], r["v"]) for r in t.scan().collect())
    assert rows == [(1, "x"), (2, "y")]

"""Core-maintenance parity with the reference behavioral corpus
(reference tests/test_maintenance.py:1-372, catalog.py:2014-2189).

Ports the assertion CONTENT — compaction (multi-file, empty,
single-file, data preservation, namespace normalization), maintenance
status fields (data_files/sizes/snapshots/orphans with empty-table
zeros), and orphan cleanup (none/dry-run/real with bytes reclaimed) —
against the repo's LakeTable surface."""

from __future__ import annotations

import os

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.operators import crud


@pytest.fixture
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "lake"))


def _multi_file_table(catalog, name="mf", inserts=5):
    t = catalog.create_table(name, [("id", "long"), ("v", "double")])
    for i in range(inserts):
        crud.insert_rows(t, [{"id": i * 3 + j, "v": float(j)} for j in range(3)])
    return t


# --- compact ---


def test_compact_multiple_files(catalog):
    t = _multi_file_table(catalog)
    before = t.file_stats()["file_count"]
    assert before >= 5
    result = t.compact(target_partitions=1)
    assert result["files_before"] == before
    assert result["files_after"] == 1
    assert t.scan().count() == 15


def test_compact_preserves_data(catalog):
    t = catalog.create_table("cp", [("id", "long")])
    for i in range(3):
        crud.insert_rows(t, [{"id": i + 1}])
    t.compact(target_partitions=1)
    assert sorted(r["id"] for r in t.scan().collect()) == [1, 2, 3]


def test_compact_empty_table(catalog):
    t = catalog.create_table("ce", [("id", "long")])
    result = t.compact()
    assert result["files_before"] == 0
    assert result["files_after"] == 0


def test_compact_single_file(catalog):
    t = catalog.create_table("cs", [("id", "long")])
    crud.insert_rows(t, [{"id": 1}, {"id": 2}])
    before = t.file_stats()["file_count"]
    result = t.compact(target_partitions=1)
    assert result["files_before"] == before
    assert result["files_after"] <= before
    assert t.scan().count() == 2


def test_compact_nonexistent_table_raises(catalog):
    with pytest.raises(ValueError):
        catalog.load_table("ghost")


def test_compact_namespace_normalized(catalog):
    t = _multi_file_table(catalog, "nsx", inserts=2)
    t.compact(target_partitions=1)
    # loadable by short and qualified name, data intact
    assert catalog.load_table("default.nsx").scan().count() == 6


# --- maintenance status ---


def test_status_after_inserts(catalog):
    t = _multi_file_table(catalog, "st", inserts=3)
    status = t.maintenance_status()
    assert status["table"] == "default.st"
    assert status["data_files"] == t.file_stats()["file_count"]
    assert status["total_size_bytes"] > 0
    assert status["avg_file_size"] > 0
    assert status["snapshots"] == 3


def test_status_empty_table(catalog):
    t = catalog.create_table("se", [("id", "long")])
    status = t.maintenance_status()
    assert status["data_files"] == 0
    assert status["total_size_bytes"] == 0
    assert status["avg_file_size"] == 0
    assert status["snapshots"] == 0
    assert status["orphan_files"] == 0


def test_status_snapshot_count(catalog):
    t = catalog.create_table("sc", [("id", "long")])
    for i in range(5):
        crud.insert_rows(t, [{"id": i}])
    assert t.maintenance_status()["snapshots"] == 5


def test_status_detects_orphans(catalog):
    t = catalog.create_table("so", [("id", "long")])
    crud.insert_rows(t, [{"id": 1}])
    # drop an unreferenced file into the data dir
    data_dir = next(
        os.path.join(t.root, d) for d in ["data"]
        if os.path.isdir(os.path.join(t.root, d))
    )
    orphan = os.path.join(data_dir, "orphan-000.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")
    status = t.maintenance_status()
    assert status["orphan_files"] == 1
    assert status["orphan_bytes"] > 0


# --- orphan cleanup ---


def test_cleanup_no_orphans(catalog):
    t = catalog.create_table("co", [("id", "long")])
    crud.insert_rows(t, [{"id": 1}])
    result = t.cleanup_orphans_report(dry_run=True)
    assert result["orphan_files_found"] == 0
    assert result["orphan_files_removed"] == 0


def _plant_orphans(t, n=2):
    data_dir = os.path.join(t.root, "data")
    paths = []
    for i in range(n):
        p = os.path.join(data_dir, f"orphan-{i}.parquet")
        with open(p, "wb") as f:
            f.write(b"x" * 64)
        paths.append(p)
    return paths


def test_cleanup_dry_run_detects_but_keeps(catalog):
    t = catalog.create_table("cd", [("id", "long")])
    crud.insert_rows(t, [{"id": 1}])
    paths = _plant_orphans(t)
    result = t.cleanup_orphans_report(dry_run=True)
    assert result["orphan_files_found"] == 2
    assert result["orphan_files_removed"] == 0
    assert result["dry_run"] is True
    assert all(os.path.exists(p) for p in paths)


def test_cleanup_removes_and_reclaims(catalog):
    t = catalog.create_table("cr", [("id", "long")])
    crud.insert_rows(t, [{"id": 1}])
    paths = _plant_orphans(t)
    result = t.cleanup_orphans_report(dry_run=False)
    assert result["orphan_files_found"] == 2
    assert result["orphan_files_removed"] == 2
    assert result["bytes_reclaimed"] > 0
    assert not any(os.path.exists(p) for p in paths)
    # table still reads fine
    assert t.scan().count() == 1

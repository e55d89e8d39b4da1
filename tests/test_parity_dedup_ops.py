"""Table-dedup parity with the reference behavioral corpus
(reference tests/test_dedup.py:1-120, dedup.py).

Ports the assertion CONTENT — duplicate-group discovery by key
columns with _dup_count, empty/no-dup cases, summaries with
total/unique/duplicate rows + percentage, and keep-one removal with
dry-run — against the repo's operators.dedup_ops."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.operators import crud, dedup_ops


@pytest.fixture
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "lake"))


@pytest.fixture
def dup_table(catalog):
    """5 rows, ids 1,2,2,3,3 — two duplicate id-groups."""
    t = catalog.create_table("dups", [("id", "long"), ("name", "string")])
    crud.insert_rows(t, [
        {"id": 1, "name": "alice"},
        {"id": 2, "name": "bob"}, {"id": 2, "name": "bob"},
        {"id": 3, "name": "carol"}, {"id": 3, "name": "carol2"},
    ])
    return t


@pytest.fixture
def unique_table(catalog):
    t = catalog.create_table("uniq", [("id", "long")])
    crud.insert_rows(t, [{"id": 1}, {"id": 2}, {"id": 3}])
    return t


# --- find_duplicates ---


def test_find_exact_duplicates(dup_table):
    result = dedup_ops.find_duplicates(dup_table)
    assert result["duplicate_groups"] >= 1
    assert result["duplicate_count"] >= 1


def test_find_by_key_columns(dup_table):
    result = dedup_ops.find_duplicates(dup_table, columns=["id"])
    assert result["duplicate_groups"] == 2
    keys = [g["id"] for g in result["groups"]]
    assert 2 in keys and 3 in keys


def test_no_duplicates(unique_table):
    result = dedup_ops.find_duplicates(unique_table)
    assert result["duplicate_groups"] == 0
    assert result["duplicate_count"] == 0


def test_single_column_key_group_counts(dup_table):
    result = dedup_ops.find_duplicates(dup_table, columns=["name"])
    bob = [g for g in result["groups"] if g["name"] == "bob"]
    assert len(bob) == 1
    assert bob[0]["_dup_count"] == 2


def test_empty_table(catalog):
    t = catalog.create_table("empty_d", [("id", "long")])
    result = dedup_ops.find_duplicates(t)
    assert result["duplicate_count"] == 0


# --- dedup_summary ---


def test_summary_with_dups(dup_table):
    result = dedup_ops.dedup_summary(dup_table, columns=["id"])
    assert result["total_rows"] == 5
    assert result["unique_rows"] == 3
    assert result["duplicate_rows"] == 2
    assert result["duplicate_pct"] == 40.0


def test_summary_no_dups(unique_table):
    result = dedup_ops.dedup_summary(unique_table)
    assert result["duplicate_rows"] == 0
    assert result["duplicate_pct"] == 0.0


def test_summary_all_columns(dup_table):
    # full-row dedup: only the exact (2, bob) pair collides
    result = dedup_ops.dedup_summary(dup_table)
    assert result["duplicate_rows"] == 1


# --- remove_duplicates ---


def test_remove_dry_run(dup_table):
    result = dedup_ops.remove_duplicates(dup_table, columns=["id"],
                                         dry_run=True)
    assert result["dry_run"] is True
    assert result["removed"] == 2
    assert result["remaining"] == 3
    assert dup_table.scan().count() == 5  # untouched


def test_remove_keep_one(dup_table):
    result = dedup_ops.remove_duplicates(dup_table, columns=["id"])
    assert result["dry_run"] is False
    assert result["removed"] == 2
    assert result["remaining"] == 3
    assert dup_table.scan().count() == 3


def test_remove_noop_writes_no_snapshot(unique_table):
    snaps_before = len(unique_table.snapshots())
    result = dedup_ops.remove_duplicates(unique_table)
    assert result["removed"] == 0
    assert len(unique_table.snapshots()) == snaps_before

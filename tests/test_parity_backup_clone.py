"""Backup + cloning parity with the reference behavioral corpus
(reference tests/test_backup.py:1-154, test_cloning.py:1-205).

Ports the assertion CONTENT — archive creation with row_count/
size_bytes, metadata structure (table_name/row_count/columns/
data_checksum), restore with rename/overwrite semantics, namespace
archives, backup listing, verification with tables_verified/issues,
clone results with source/target/snapshot ids + messages, clone
independence, the clone registry, and promote/discard lifecycle —
against the repo's backup_clone module."""

from __future__ import annotations

import json
import tarfile

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.operators import crud
from iceberg_lakehouse_spark.sources import backup_clone as bc


@pytest.fixture
def catalog(spark, tmp_path):
    c = LakehouseCatalog(spark, str(tmp_path / "lake"))
    t = c.create_table("backup_src", [("id", "long"), ("name", "string")])
    crud.insert_rows(t, [{"id": 1, "name": "a"}, {"id": 2, "name": "b"},
                         {"id": 3, "name": "c"}])
    return c


@pytest.fixture
def backup_dir(tmp_path):
    d = tmp_path / "backups"
    d.mkdir()
    return d


# --- backup ---


def test_backup_creates_archive(catalog, backup_dir):
    arch = str(backup_dir / "b.tar.gz")
    result = bc.backup_table(catalog.load_table("backup_src"), arch)
    assert result["row_count"] == 3
    assert result["size_bytes"] > 0
    assert (backup_dir / "b.tar.gz").exists()


def test_backup_archive_contents(catalog, backup_dir):
    arch = str(backup_dir / "b.tar.gz")
    bc.backup_table(catalog.load_table("backup_src"), arch)
    with tarfile.open(arch, "r:gz") as tar:
        names = tar.getnames()
        assert any("metadata.json" in n for n in names)
        assert any(".parquet" in n for n in names)


def test_backup_metadata_structure(catalog, backup_dir):
    arch = str(backup_dir / "b.tar.gz")
    bc.backup_table(catalog.load_table("backup_src"), arch)
    with tarfile.open(arch, "r:gz") as tar:
        data = json.load(tar.extractfile("metadata.json"))
    assert data["table_name"] == "default.backup_src"
    assert data["row_count"] == 3
    assert "columns" in data
    assert "data_checksum" in data


# --- restore ---


def test_restore_creates_table(catalog, backup_dir):
    arch = str(backup_dir / "b.tar.gz")
    bc.backup_table(catalog.load_table("backup_src"), arch)
    result = bc.restore_table(catalog, arch, "default.restored_tbl")
    assert result["rows_restored"] == 3
    assert result["table"] == "default.restored_tbl"
    assert catalog.load_table("restored_tbl").scan().count() == 3


def test_restore_with_rename(catalog, backup_dir):
    arch = str(backup_dir / "b.tar.gz")
    bc.backup_table(catalog.load_table("backup_src"), arch)
    result = bc.restore_table(catalog, arch, "default.renamed_tbl")
    assert result["table"] == "default.renamed_tbl"


def test_restore_default_name_from_metadata(catalog, backup_dir):
    arch = str(backup_dir / "b.tar.gz")
    bc.backup_table(catalog.load_table("backup_src"), arch)
    catalog.drop_table("backup_src")
    result = bc.restore_table(catalog, arch)
    assert result["table"] == "default.backup_src"


def test_restore_existing_without_overwrite_raises(catalog, backup_dir):
    arch = str(backup_dir / "b.tar.gz")
    bc.backup_table(catalog.load_table("backup_src"), arch)
    with pytest.raises(ValueError, match="exists"):
        bc.restore_table(catalog, arch, "default.backup_src")


def test_restore_with_overwrite(catalog, backup_dir):
    arch = str(backup_dir / "b.tar.gz")
    bc.backup_table(catalog.load_table("backup_src"), arch)
    result = bc.restore_table(catalog, arch, "default.backup_src",
                              overwrite=True)
    assert result["rows_restored"] == 3


def test_restore_nonexistent_archive(catalog, tmp_path):
    with pytest.raises((FileNotFoundError, tarfile.TarError)):
        bc.restore_table(catalog, str(tmp_path / "ghost.tar.gz"), "x")


# --- namespace backup ---


def test_backup_namespace(catalog, backup_dir):
    arch = str(backup_dir / "ns.tar.gz")
    result = bc.backup_namespace(catalog, "default", arch)
    assert result["table_count"] >= 1
    assert result["size_bytes"] > 0
    assert (backup_dir / "ns.tar.gz").exists()


def test_restore_namespace(catalog, backup_dir):
    arch = str(backup_dir / "ns.tar.gz")
    bc.backup_namespace(catalog, "default", arch)
    catalog.drop_table("backup_src")
    result = bc.restore_namespace(catalog, arch)
    assert result["table_count"] >= 1
    assert catalog.load_table("backup_src").scan().count() == 3


def test_backup_empty_namespace_raises(catalog, backup_dir):
    with pytest.raises(ValueError, match="no tables"):
        bc.backup_namespace(catalog, "ghost_ns", str(backup_dir / "x.tar.gz"))


# --- list / verify ---


def test_list_empty(backup_dir):
    assert bc.list_backups(str(backup_dir)) == []


def test_list_after_backup(catalog, backup_dir):
    bc.backup_table(catalog.load_table("backup_src"),
                    str(backup_dir / "b.tar.gz"))
    backups = bc.list_backups(str(backup_dir))
    assert len(backups) == 1
    assert "file" in backups[0]
    assert "size_bytes" in backups[0]
    assert backups[0]["row_count"] == 3


def test_verify_valid(catalog, backup_dir):
    arch = str(backup_dir / "b.tar.gz")
    bc.backup_table(catalog.load_table("backup_src"), arch)
    verify = bc.verify_backup(arch)
    assert verify["valid"] is True
    assert len(verify["tables_verified"]) == 1
    assert verify["issues"] == []


def test_verify_namespace_archive(catalog, backup_dir):
    arch = str(backup_dir / "ns.tar.gz")
    bc.backup_namespace(catalog, "default", arch)
    verify = bc.verify_backup(arch)
    assert verify["valid"] is True
    assert "default.backup_src" in verify["tables_verified"]


# --- cloning ---


@pytest.fixture
def registry(tmp_path):
    return str(tmp_path / "clones.json")


def test_basic_clone(catalog, registry):
    result = bc.clone_table(catalog, "default.backup_src",
                            "default.clone_target", registry_path=registry)
    assert result["source"] == "default.backup_src"
    assert result["target"] == "default.clone_target"
    assert result["row_count"] == 3
    assert "cloned" in result["message"].lower()


def test_clone_has_same_data_and_schema(catalog, registry):
    bc.clone_table(catalog, "default.backup_src", "default.c_same",
                   registry_path=registry)
    src = catalog.load_table("backup_src")
    tgt = catalog.load_table("c_same")
    assert sorted(r["id"] for r in src.scan().collect()) == \
        sorted(r["id"] for r in tgt.scan().collect())
    assert [f.name for f in src.schema().fields] == \
        [f.name for f in tgt.schema().fields]


def test_clone_is_independent(catalog, registry):
    bc.clone_table(catalog, "default.backup_src", "default.c_ind",
                   registry_path=registry)
    crud.insert_rows(catalog.load_table("c_ind"), [{"id": 4, "name": "d"}])
    assert catalog.load_table("backup_src").scan().count() == 3
    assert catalog.load_table("c_ind").scan().count() == 4


def test_clone_from_snapshot(catalog, registry):
    t = catalog.load_table("backup_src")
    first = t.current_snapshot().snapshot_id
    crud.insert_rows(t, [{"id": 4, "name": "d"}])
    result = bc.clone_table(catalog, "default.backup_src", "default.c_old",
                            as_of=str(first), registry_path=registry)
    assert result["row_count"] == 3
    assert result["as_of"] == str(first)


def test_clone_nonexistent_source_raises(catalog, registry):
    with pytest.raises(ValueError):
        bc.clone_table(catalog, "default.ghost", "default.c_x",
                       registry_path=registry)


def test_clone_to_existing_name_raises(catalog, registry):
    with pytest.raises(ValueError, match="already exists"):
        bc.clone_table(catalog, "default.backup_src", "default.backup_src",
                       registry_path=registry)


def test_clone_has_source_snapshot_id(catalog, registry):
    result = bc.clone_table(catalog, "default.backup_src", "default.c_snap",
                            registry_path=registry)
    assert result["source_snapshot_id"] is not None


# --- clone registry ---


def test_registry_empty(registry):
    assert bc.CloneRegistry(registry).list() == []


def test_registry_lists_clones(catalog, registry):
    bc.clone_table(catalog, "default.backup_src", "default.c1",
                   registry_path=registry)
    bc.clone_table(catalog, "default.backup_src", "default.c2",
                   registry_path=registry)
    clones = bc.CloneRegistry(registry).list()
    assert len(clones) == 2
    names = [c["clone"] for c in clones]
    assert "default.c1" in names and "default.c2" in names
    for c in clones:
        assert "source_table" in c
        assert "cloned_at" in c
        assert "row_count" in c


# --- promote / discard ---


def test_promote(catalog, registry):
    bc.clone_table(catalog, "default.backup_src", "default.promo",
                   registry_path=registry)
    crud.insert_rows(catalog.load_table("promo"), [{"id": 4, "name": "d"}])
    result = bc.promote_clone(catalog, "default.promo", "default.backup_src",
                              registry_path=registry)
    assert result["row_count"] == 4
    assert "promoted" in result["message"].lower()
    assert catalog.load_table("backup_src").scan().count() == 4


def test_promote_removes_from_registry(catalog, registry):
    bc.clone_table(catalog, "default.backup_src", "default.promo_rem",
                   registry_path=registry)
    bc.promote_clone(catalog, "default.promo_rem", "default.backup_src",
                     registry_path=registry)
    names = [c["clone"] for c in bc.CloneRegistry(registry).list()]
    assert "default.promo_rem" not in names


def test_promote_nonexistent_clone_raises(catalog, registry):
    with pytest.raises(ValueError, match="not a registered clone"):
        bc.promote_clone(catalog, "default.ghost", "default.backup_src",
                         registry_path=registry)


def test_discard(catalog, registry):
    bc.clone_table(catalog, "default.backup_src", "default.to_discard",
                   registry_path=registry)
    result = bc.discard_clone(catalog, "default.to_discard",
                              registry_path=registry)
    assert "discarded" in result["message"].lower()
    assert not catalog.table_exists("default.to_discard")
    assert bc.CloneRegistry(registry).list() == []

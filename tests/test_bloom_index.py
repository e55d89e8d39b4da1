"""File-level bloom index (plans/bloom.py): Delta-style per-file bloom
bitsets for point-lookup FILE pruning where min/max stats can't help —
unclustered high-cardinality keys. Conservative contract mirrors
plans/pruning.py: only provably-absent files are dropped; files without
bloom rows, non-equality conjuncts, and literals that don't survive the
column-type cast all keep everything."""

from __future__ import annotations

import os

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.operators import crud
from iceberg_lakehouse_spark.plans.bloom import BLOOM_SUBDIR

PROPS = {
    "write.bloom.columns": "id",
    "write.bloom.index": "true",
}


@pytest.fixture()
def cat(spark, tmp_warehouse):
    return LakehouseCatalog(spark, tmp_warehouse)


def _interleaved(cat, name="default.bloom_t", props=PROPS, files=4, n=400):
    """files appends with fully OVERLAPPING id ranges (append i holds
    ids where id % files == i), each coalesced to one part-file — so
    min/max stats prune nothing and any pruning observed is bloom's."""
    t = cat.create_table(name, [("id", "long"), ("v", "string")],
                         properties=dict(props))
    for i in range(files):
        rows = [(j, f"v{j}") for j in range(n) if j % files == i]
        t.append(t.spark.createDataFrame(rows, "id long, v string")
                 .coalesce(1))
    assert len(t.current_snapshot().files) == files
    return t


@pytest.fixture(scope="module")
def shared_t(spark, tmp_path_factory):
    """One interleaved 4-file table for the READ-ONLY tests (the bloom
    build pays several Spark jobs per append — share them)."""
    cat = LakehouseCatalog(
        spark, str(tmp_path_factory.mktemp("bloom_shared")))
    return _interleaved(cat)


def test_sidecar_built_per_commit(shared_t):
    t = shared_t
    d = os.path.join(t.root, BLOOM_SUBDIR)
    assert os.path.isdir(d)
    assert len(os.listdir(d)) == 4  # one sidecar per write
    side = t.spark.read.parquet(os.path.join(d, "*"))
    rows = side.collect()
    assert {r["column"] for r in rows} == {"id"}
    assert sorted(r["file"] for r in rows) == sorted(
        t.current_snapshot().files)
    assert all(r["nbits"] == 131072 and r["nhashes"] == 7 for r in rows)
    assert all(len(r["words"]) > 0 for r in rows)


def test_point_lookup_prunes_to_one_file(shared_t):
    t = shared_t
    # min/max stats alone keep all 4 (ranges fully overlap)
    kept, total = t.prune_files("id = 6")
    assert total == 4 and len(kept) == 1
    # the survivor actually holds the row
    assert [r["v"] for r in t.scan(filter="id = 6").collect()] == ["v6"]
    # absent key: every file provably absent
    kept, _ = t.prune_files("id = 999999")
    assert kept == []
    assert t.scan(filter="id = 999999").count() == 0


def test_no_false_negatives_over_all_values(shared_t):
    t = shared_t
    for probe in range(0, 400, 29):
        got = t.scan(filter=f"id = {probe}").collect()
        assert [r["id"] for r in got] == [probe], probe


def test_in_list_keeps_union_of_files(shared_t):
    t = shared_t
    # 5 and 6 live in different files (5 % 4 = 1, 6 % 4 = 2)
    kept, _ = t.prune_files("id IN (5, 6)")
    assert len(kept) == 2
    assert sorted(r["id"] for r in t.scan(filter="id IN (5, 6)").collect()) \
        == [5, 6]


def test_files_without_bloom_rows_are_kept(cat):
    t = cat.create_table("default.bloom_late",
                         [("id", "long"), ("v", "string")])
    t.append(t.spark.createDataFrame([(1, "old")], "id long, v string")
             .coalesce(1))
    t.set_properties(dict(PROPS))
    t.append(t.spark.createDataFrame([(2, "new")], "id long, v string")
             .coalesce(1))
    # value in the pre-index file: its file has no bloom row → kept
    kept, total = t.prune_files("id = 1")
    assert total == 2 and len(kept) >= 1
    assert [r["v"] for r in t.scan(filter="id = 1").collect()] == ["old"]


def test_mixed_bits_across_commits(cat):
    t = cat.create_table("default.bloom_mixed",
                         [("id", "long")],
                         properties={**PROPS,
                                     "write.bloom.index.bits": "1024"})
    t.append(t.spark.createDataFrame([(i,) for i in range(0, 50)],
                                     "id long").coalesce(1))
    t.set_properties({"write.bloom.index.bits": "65536"})
    t.append(t.spark.createDataFrame([(i,) for i in range(50, 100)],
                                     "id long").coalesce(1))
    side = t.spark.read.parquet(os.path.join(t.root, BLOOM_SUBDIR, "*"))
    assert {r["nbits"] for r in side.collect()} == {1024, 65536}
    # probes consult each row's own nbits: both halves still found
    assert t.scan(filter="id = 7").count() == 1
    assert t.scan(filter="id = 93").count() == 1
    kept, _ = t.prune_files("id = 93")
    assert len(kept) == 1


def test_conservative_on_non_equality_and_widened_literals(shared_t):
    t = shared_t
    # range predicate: bloom does not apply, stats keep all
    kept, total = t.prune_files("id > 5")
    assert len(kept) == total == 4
    # fractional literal on a bigint column compares in a widened
    # domain the index never hashed → bloom must keep everything
    kept, _ = t.prune_files("id = 6.5")
    assert len(kept) == 4
    assert t.scan(filter="id = 6.5").count() == 0
    # but exact-integral lexical forms still prune
    kept, _ = t.prune_files("id = 6")
    assert len(kept) == 1


def test_string_column_index(cat):
    t = cat.create_table(
        "default.bloom_str", [("k", "string"), ("v", "long")],
        properties={"write.bloom.columns": "k", "write.bloom.index": "true"})
    for i in range(3):
        rows = [(f"key_{j}", j) for j in range(i * 100, (i + 1) * 100)]
        t.append(t.spark.createDataFrame(rows, "k string, v long")
                 .coalesce(1))
    kept, total = t.prune_files("k = 'key_150'")
    assert total == 3 and len(kept) == 1
    assert [r["v"] for r in t.scan(filter="k = 'key_150'").collect()] == [150]
    kept, _ = t.prune_files("k = 'nope'")
    assert kept == []


def test_cow_update_correct_under_bloom_pruning(cat):
    """CoW update/delete route through scan(filter=) → prune_files; a
    bloom-pruned probe must still rewrite exactly the matched rows."""
    t = _interleaved(cat)
    assert crud.update_rows(t, "id = 6", {"v": "SIX"}) == 1
    rows = {r["id"]: r["v"] for r in t.scan().collect()}
    assert rows[6] == "SIX" and rows[5] == "v5" and len(rows) == 400
    assert crud.delete_rows(t, "id = 7") == 1
    assert t.scan(filter="id = 7").count() == 0
    assert t.scan().count() == 399


def test_ansi_mode_build_and_probe(cat, spark):
    """The driver's session runs ANSI mode (Spark 4 default; our test
    session disables it) — the hash position math must be
    overflow-free and the bitset probe must use try_element_at, or
    builds die with ARITHMETIC_OVERFLOW / probes with a map-key error
    under ANSI. Regression for the real failure found in check_oracle."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        t = _interleaved(cat, name="default.bloom_ansi", files=3, n=90)
        kept, total = t.prune_files("id = 4")
        assert total == 3 and len(kept) == 1
        assert [r["id"] for r in t.scan(filter="id = 4").collect()] == [4]
        # widened literal: ANSI cast throws inside the probe → caught →
        # conservative keep-all, and the scan still answers correctly
        kept, _ = t.prune_files("id = 4.5")
        assert len(kept) == 3
        assert t.scan(filter="id = 4.5").count() == 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_sidecar_consolidation(cat):
    """Consolidation merges sidecars into one, keeps rows for every
    on-disk file, drops rows for files deleted by expire+cleanup, and
    pruning behaves identically afterwards."""
    from iceberg_lakehouse_spark.plans.bloom import (
        BLOOM_SUBDIR, consolidate_bloom_index)

    t = _interleaved(cat, name="default.bloom_cons", files=3, n=90)
    d = os.path.join(t.root, BLOOM_SUBDIR)
    assert len(os.listdir(d)) == 3
    # overwrite drops one file from the head; expire + cleanup delete it
    t.overwrite(t.scan().where("id % 3 != 0"))
    t.expire_snapshots(retain_last=1, grace_seconds=0)
    t.cleanup_orphans(dry_run=False)
    consolidate_bloom_index(t)
    assert len(os.listdir(d)) == 1
    side = t.spark.read.parquet(os.path.join(d, "*"))
    files = {r["file"] for r in side.collect()}
    # exactly the overwrite's surviving files: the 3 originals were
    # deleted from disk and referenced by no snapshot → rows dropped
    assert files == set(t.current_snapshot().files)
    kept, total = t.prune_files("id = 4")
    assert len(kept) < total
    assert [r["id"] for r in t.scan(filter="id = 4").collect()] == [4]
    assert t.scan(filter="id = 3").count() == 0  # deleted by overwrite


def test_config_validation(cat):
    from iceberg_lakehouse_spark.plans.bloom import bloom_index_config

    assert bloom_index_config({}) is None
    assert bloom_index_config({"write.bloom.index": "true"}) is None
    assert bloom_index_config(
        {"write.bloom.index": "true", "write.bloom.columns": "a, b"}
    ) == (["a", "b"], 131072, 7)
    with pytest.raises(ValueError):
        bloom_index_config({"write.bloom.index": "true",
                            "write.bloom.columns": "a",
                            "write.bloom.index.bits": "8"})

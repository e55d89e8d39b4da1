"""Write-clustering table properties: write.sort.order (range-cluster
+ sort every write → tight file stats from birth) and
write.bloom.columns (parquet bloom filters for point-lookup skipping)."""
from __future__ import annotations

import os

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog


def test_sort_order_clusters_writes(spark, tmp_warehouse):
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table(
        "default.sorted", [("id", "long"), ("v", "string")],
        properties={"write.sort.order": "id"},
    )
    import random
    rng = random.Random(7)
    rows = [(i, f"v{i}") for i in range(4000)]
    rng.shuffle(rows)
    # AQE would (correctly) coalesce this tiny fixture into one file,
    # which leaves nothing to prune — pin multiple range partitions
    # for the test only
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        t.append(spark.createDataFrame(rows, "id long, v string")
                 .repartition(8))
    finally:
        spark.conf.set(key, prev)
    files = t.current_snapshot().files
    assert len(files) > 1
    # clustered: per-file id ranges must be (near-)disjoint — a point
    # predicate prunes to one file
    stats = t._file_column_stats(t.current_snapshot())
    ranges = sorted(
        (int(s["id"][0]), int(s["id"][1]))
        for s in stats.values() if "id" in s
    )
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint ranges
    kept, total = t.prune_files("id = 17", t.current_snapshot())
    assert len(kept) == 1 and total == len(files)
    # correctness unaffected
    assert t.scan().count() == 4000


def test_sort_order_unknown_column_raises(spark, tmp_warehouse):
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table(
        "default.badsort", [("id", "long")],
        properties={"write.sort.order": "nope"},
    )
    with pytest.raises(ValueError, match="unknown columns"):
        t.append(spark.createDataFrame([(1,)], "id long"))


def test_bloom_filter_written(spark, tmp_warehouse):
    """This pyarrow (16.x) doesn't expose bloom offsets, so the
    observable is the deterministic footprint: identical data written
    with and without write.bloom.columns — the bloomed file must be
    strictly larger (the serialized bloom bitset), and reads stay
    correct."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    rows = [(i, f"user-{i:05d}") for i in range(5000)]

    def _one_file_size(name, props):
        t = cat.create_table(
            name, [("id", "long"), ("v", "string")], properties=props
        )
        t.append(spark.createDataFrame(rows, "id long, v string")
                 .coalesce(1))
        assert t.scan().count() == 5000
        f = [p for p in t.current_snapshot().files
             if p.endswith(".parquet")]
        assert len(f) == 1
        return os.path.getsize(os.path.join(t.root, f[0]))

    plain = _one_file_size("default.plain", {})
    bloomed = _one_file_size(
        "default.bloomed", {"write.bloom.columns": "v"}
    )
    assert bloomed > plain + 1000  # the bloom bitset is real bytes

"""Partitioning depth, ported from the assertion content of reference
tests/test_partitioning.py (405 LoC, 42 tests): transform parse edges,
create-time validation, hidden-partition layout per transform, the
get_partitions surface, and stats edges."""

from __future__ import annotations

import datetime

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog, PartitionField
from iceberg_lakehouse_spark.operators import crud


@pytest.fixture()
def catalog(spark, tmp_warehouse):
    return LakehouseCatalog(spark, tmp_warehouse)


# ------------------------------------------------------------- parse edges

class TestParseTransform:
    @pytest.mark.parametrize("spec,transform,column,param", [
        ("category", "identity", "category", None),
        ("identity(category)", "identity", "category", None),
        ("year(ts)", "year", "ts", None),
        ("month(ts)", "month", "ts", None),
        ("day(ts)", "day", "ts", None),
        ("hour(ts)", "hour", "ts", None),
        ("bucket(16, id)", "bucket", "id", 16),
        ("truncate(4, name)", "truncate", "name", 4),
        ("  month( date )  ", "month", "date", None),  # whitespace
    ])
    def test_valid_specs(self, spec, transform, column, param):
        pf = PartitionField.parse(spec)
        assert (pf.transform, pf.column, pf.param) == (transform, column, param)

    @pytest.mark.parametrize("bad", [
        "exp(id, 2, 3)",         # unknown transform
        "bucket(id)",            # bucket missing count
        "bucket(x, id)",         # bucket non-integer count
        "truncate(name)",        # truncate missing width
        "month(a, b)",           # too many args
        "month()",               # no column
        "",                      # empty
    ])
    def test_invalid_specs_raise(self, bad):
        with pytest.raises(ValueError, match="invalid partition spec"):
            PartitionField.parse(bad)


# ---------------------------------------------------- create-time validation

class TestCreateValidation:
    def test_create_empty_columns_raises(self, catalog):
        with pytest.raises(ValueError, match="at least one column"):
            catalog.create_table("empty_t", [])

    def test_create_invalid_type_raises(self, catalog):
        with pytest.raises(ValueError, match="Unsupported column type"):
            catalog.create_table("bad_t", [("id", "uuid")])

    def test_create_partition_unknown_column_raises(self, catalog):
        """Reference raises at CREATE time, not first insert."""
        with pytest.raises(ValueError, match="not in table schema"):
            catalog.create_table(
                "bad_p", [("id", "long")], partition_by=["month(ghost)"]
            )

    def test_create_duplicate_raises(self, catalog):
        catalog.create_table("dup_t", [("id", "long")])
        with pytest.raises(ValueError, match="already exists"):
            catalog.create_table("dup_t", [("id", "long")])

    def test_create_all_column_types(self, catalog):
        t = catalog.create_table("all_types", [
            ("id", "long"), ("name", "string"), ("score", "double"),
            ("event_date", "date"), ("created_at", "timestamp"),
            ("active", "boolean"),
        ])
        assert len(t.schema().fields) == 6
        crud.insert_rows(t, [{
            "id": 1, "name": "a", "score": 0.5,
            "event_date": datetime.date(2025, 1, 1),
            "created_at": datetime.datetime(2025, 1, 1, 12, 0),
            "active": True,
        }])
        row = t.scan().collect()[0]
        assert row["active"] is True
        assert row["event_date"] == datetime.date(2025, 1, 1)


# ------------------------------------------------- insert + layout per transform

ROWS = [
    {"id": i, "name": n, "d": datetime.date(2025, m, 3)}
    for i, (n, m) in enumerate([("alice", 1), ("bob", 1), ("carol", 7), ("dave", 12)])
]
SCHEMA = [("id", "long"), ("name", "string"), ("d", "date")]


class TestInsertIntoPartitioned:
    def _mk(self, catalog, name, spec):
        t = catalog.create_table(name, SCHEMA, partition_by=spec)
        crud.insert_rows(t, ROWS)
        return t

    def test_month_partitioned_layout_and_data(self, catalog):
        t = self._mk(catalog, "pt_month", ["month(d)"])
        assert t.scan().count() == 4
        parts = {s["partition"] for s in t.partition_stats()}
        assert parts == {"_p_month_d=1", "_p_month_d=7", "_p_month_d=12"}
        # hidden partitioning: the scan schema has no partition column
        assert [f.name for f in t.scan().schema.fields] == ["id", "name", "d"]

    def test_year_partitioned(self, catalog):
        t = self._mk(catalog, "pt_year", ["year(d)"])
        assert {s["partition"] for s in t.partition_stats()} == {"_p_year_d=2025"}

    def test_bucket_partitioned_rows_intact(self, catalog):
        t = self._mk(catalog, "pt_bucket", ["bucket(4, id)"])
        assert sorted(r["name"] for r in t.scan().collect()) == [
            "alice", "bob", "carol", "dave"
        ]
        # every partition value is a bucket ordinal < 4
        for s in t.partition_stats():
            val = int(s["partition"].split("=")[1])
            assert 0 <= val < 4

    def test_truncate_partitioned(self, catalog):
        t = self._mk(catalog, "pt_trunc", ["truncate(1, name)"])
        parts = {s["partition"] for s in t.partition_stats()}
        assert parts == {"_p_truncate1_name=a", "_p_truncate1_name=b",
                         "_p_truncate1_name=c", "_p_truncate1_name=d"}

    def test_multiple_partition_fields(self, catalog):
        t = self._mk(catalog, "pt_multi", ["month(d)", "identity(name)"])
        info = t.partitions_info()
        assert [f["source_column"] for f in info["fields"]] == ["d", "name"]
        assert t.scan().count() == 4


# -------------------------------------------------------- get_partitions API

class TestPartitionsInfo:
    def test_partitioned_table(self, catalog):
        t = catalog.create_table("pi_t", SCHEMA, partition_by=["month(d)"])
        info = t.partitions_info()
        assert info["table"] == "default.pi_t"
        assert info["is_partitioned"] is True
        assert info["fields"] == [{
            "source_column": "d", "transform": "month",
            "param": None, "name": "_p_month_d",
        }]

    def test_unpartitioned_table(self, catalog):
        t = catalog.create_table("pi_plain", SCHEMA)
        info = t.partitions_info()
        assert info["is_partitioned"] is False and info["fields"] == []

    def test_nonexistent_table_raises(self, catalog):
        with pytest.raises(ValueError, match="not found"):
            catalog.load_table("nope")

    def test_with_namespace(self, catalog):
        catalog.create_table("ns2.pi_ns", SCHEMA, partition_by=["year(d)"])
        info = catalog.load_table("ns2.pi_ns").partitions_info()
        assert info["table"] == "ns2.pi_ns"


# ----------------------------------------------------------- stats edges

class TestPartitionStatsEdges:
    def test_unpartitioned_groups_under_sentinel(self, catalog):
        t = catalog.create_table("ps_plain", SCHEMA)
        crud.insert_rows(t, ROWS)
        stats = t.partition_stats()
        assert len(stats) == 1 and stats[0]["partition"] == "<unpartitioned>"
        assert stats[0]["file_count"] >= 1 and stats[0]["bytes"] > 0

    def test_partitioned_empty_table(self, catalog):
        t = catalog.create_table("ps_empty", SCHEMA, partition_by=["month(d)"])
        assert t.partition_stats() == []

    def test_stats_report_reference_shape(self, catalog):
        """Reference get_partition_stats result (test_partitioning.py:
        305-357): files/size_bytes rows, total_partitions, and the
        'Table is not partitioned' short-circuit."""
        plain = catalog.create_table("psr_plain", SCHEMA)
        report = plain.partition_stats_report()
        assert not report["is_partitioned"]
        assert report["message"] == "Table is not partitioned"
        assert report["partitions"] == []

        t = catalog.create_table("psr_part", SCHEMA, partition_by=["month(d)"])
        empty = t.partition_stats_report()
        assert empty["is_partitioned"] and empty["partitions"] == []
        crud.insert_rows(t, ROWS)
        report = t.partition_stats_report()
        assert report["table"] == "default.psr_part"
        assert report["total_partitions"] >= 1
        for p in report["partitions"]:
            assert p["files"] >= 1
            assert p["size_bytes"] > 0

    def test_stats_track_appends(self, catalog):
        t = catalog.create_table("ps_grow", SCHEMA, partition_by=["month(d)"])
        crud.insert_rows(t, ROWS[:2])  # both January
        s1 = {s["partition"]: s for s in t.partition_stats()}
        assert set(s1) == {"_p_month_d=1"}
        crud.insert_rows(t, ROWS[2:])  # July + December
        s2 = {s["partition"]: s for s in t.partition_stats()}
        assert set(s2) == {"_p_month_d=1", "_p_month_d=7", "_p_month_d=12"}
        assert s2["_p_month_d=1"]["file_count"] >= s1["_p_month_d=1"]["file_count"]

    def test_partition_pruning_on_derived_column(self, catalog, spark):
        """The partition transform column prunes the scan: filtering on
        the raw date hits only matching month dirs' rows."""
        t = catalog.create_table("ps_prune", SCHEMA, partition_by=["month(d)"])
        crud.insert_rows(t, ROWS)
        jan = t.scan().where("d < DATE'2025-02-01'")
        assert jan.count() == 2
        assert {r["name"] for r in jan.collect()} == {"alice", "bob"}


# ---------------------------------------------------- partition evolution

class TestPartitionEvolution:
    def _mk(self, catalog, spark, spec=None):
        t = catalog.create_table(
            "default.pevo",
            [("id", "long"), ("cat", "string"), ("ts", "timestamp")],
            partition_by=spec,
        )
        t.append(spark.createDataFrame(
            [(1, "a", datetime.datetime(2024, 1, 5)),
             (2, "b", datetime.datetime(2024, 2, 5))],
            "id long, cat string, ts timestamp"))
        return t

    def test_evolve_changes_future_writes_only(self, catalog, spark):
        """Old files keep their layout, new files get the new one,
        scans read both correctly — zero rewrites (Iceberg partition
        evolution)."""
        t = self._mk(catalog, spark, spec=["cat"])
        files_before = list(t.current_snapshot().files)
        res = t.evolve_partition_spec(["month(ts)"])
        assert res["changed"] is True
        assert t.current_snapshot().files == files_before  # no rewrite
        t.append(spark.createDataFrame(
            [(3, "c", datetime.datetime(2024, 3, 5))],
            "id long, cat string, ts timestamp"))
        snap = t.current_snapshot()
        old = [f for f in snap.files if "_p_cat=" in f]
        new = [f for f in snap.files if "_p_month_ts=" in f]
        assert old and new  # mixed layouts coexist
        assert sorted(r["id"] for r in t.scan().collect()) == [1, 2, 3]
        # filtered scan across mixed layouts stays correct
        assert t.scan(filter="id >= 2").count() == 2
        info = t.partitions_info()
        assert info["fields"][0]["transform"] == "month"
        assert t.meta().get("partition_spec_history")

    def test_evolve_to_unpartitioned_and_back(self, catalog, spark):
        t = self._mk(catalog, spark, spec=["cat"])
        t.evolve_partition_spec([])
        t.append(spark.createDataFrame(
            [(3, "c", datetime.datetime(2024, 3, 5))],
            "id long, cat string, ts timestamp"))
        assert t.scan().count() == 3
        t.evolve_partition_spec(["bucket(4, id)"])
        t.append(spark.createDataFrame(
            [(4, "d", datetime.datetime(2024, 4, 5))],
            "id long, cat string, ts timestamp"))
        assert sorted(r["id"] for r in t.scan().collect()) == [1, 2, 3, 4]
        assert any("_p_bucket4_id=" in f for f in t.current_snapshot().files)

    def test_evolve_unknown_column_raises(self, catalog, spark):
        t = self._mk(catalog, spark)
        with pytest.raises(ValueError, match="not in table schema"):
            t.evolve_partition_spec(["nope"])

    def test_evolve_noop_same_spec(self, catalog, spark):
        t = self._mk(catalog, spark, spec=["cat"])
        assert t.evolve_partition_spec(["cat"]) == {
            "changed": False,
            "spec": [{"transform": "identity", "column": "cat",
                      "param": None}],
        }

    def test_compact_realigns_under_current_spec(self, catalog, spark):
        t = self._mk(catalog, spark, spec=["cat"])
        t.evolve_partition_spec(["month(ts)"])
        t.compact()
        snap = t.current_snapshot()
        assert all("_p_cat=" not in f for f in snap.files)
        assert any("_p_month_ts=" in f for f in snap.files)
        assert t.scan().count() == 2

    def test_evolution_with_mor_deletes(self, catalog, spark):
        """Position deletes recorded before an evolution keep applying
        (full-path keys are layout-independent), and equality deletes
        span mixed layouts."""
        t = catalog.create_table(
            "default.pevomor",
            [("id", "long"), ("cat", "string")],
            partition_by=["cat"],
            properties={"write.delete.mode": "merge-on-read"},
        )
        t.append(spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "a")], "id long, cat string"))
        crud.delete_rows(t, "id = 1")  # position delete, old layout
        t.evolve_partition_spec(["bucket(2, id)"])
        t.append(spark.createDataFrame(
            [(4, "c"), (5, "d")], "id long, cat string"))
        crud.delete_rows_by_key(t, [{"id": 2}, {"id": 4}])
        assert sorted(r["id"] for r in t.scan().collect()) == [3, 5]


def test_write_distribution_mode_hash_one_file_per_value(
        catalog, spark):
    """r13 (Iceberg write.distribution-mode=hash analogue): with the
    property set, an append clusters rows by partition value before
    the write, so each partition value lands as exactly ONE data file
    per commit regardless of input partitioning; without it, the
    default one-file-per-(task, value) layout is unchanged."""
    df = spark.range(0, 3_000).selectExpr(
        "id", "CAST(id % 3 AS STRING) AS cat").repartition(16)

    t = catalog.create_table(
        "default.dist_hash", [("id", "long"), ("cat", "string")],
        partition_by=["cat"],
        properties={"write.distribution.mode": "hash"})
    t.append(df)
    files = t.current_snapshot().files
    assert len(files) == 3, files  # one per cat value
    assert t.scan().count() == 3_000

    t2 = catalog.create_table(
        "default.dist_default", [("id", "long"), ("cat", "string")],
        partition_by=["cat"])
    t2.append(df)
    # default layout: one file per (task, value) — more than one per
    # value with a 16-partition input
    assert len(t2.current_snapshot().files) > 3
    assert t2.scan().count() == 3_000


def test_hash_distribution_composes_with_sort_order(catalog, spark):
    """r13 ADVICE: write.distribution.mode=hash + write.sort.order must
    COMPOSE — the hash shuffle runs first and the sort runs within the
    hashed partitions (pcols leading the sort key so the file writer
    inserts no sort of its own), giving one file per partition value
    AND rows sorted by the sort key inside every file. The old order
    (range-sort, then hash repartition) destroyed the sorted layout."""
    import pyarrow.parquet as pq

    df = spark.range(0, 3_000).selectExpr(
        "id", "CAST(id % 3 AS STRING) AS cat",
        "CAST((id * 2654435761) % 1000 AS LONG) AS k"
    ).repartition(16)

    t = catalog.create_table(
        "default.dist_hash_sorted",
        [("id", "long"), ("cat", "string"), ("k", "long")],
        partition_by=["cat"],
        properties={"write.distribution.mode": "hash",
                    "write.sort.order": "k"})
    t.append(df)
    files = t.current_snapshot().files
    assert len(files) == 3, files  # hash clustering held: one per cat
    for f in files:
        ks = pq.read_table(
            f"{t.root}/{f}", columns=["k"]).column("k").to_pylist()
        assert ks == sorted(ks), f  # sort-order promise held in-file
    assert t.scan().count() == 3_000

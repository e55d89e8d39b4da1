"""Deep behavioral tests for sources (import/export/backup/clone) and
derived objects (views/matviews/pipelines), reference-style: error
paths via pytest.raises, mode semantics, staleness, corruption."""

from __future__ import annotations

import json
import os
import tarfile

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance.views import (
    MatviewManager,
    PipelineManager,
    ViewManager,
)
from iceberg_lakehouse_spark.operators import crud
from iceberg_lakehouse_spark.plans.engine import QueryEngine
from iceberg_lakehouse_spark.sources import backup_clone as bc
from iceberg_lakehouse_spark.sources import io as lio

SCHEMA = [("id", "long"), ("name", "string"), ("value", "double")]
ROWS = [
    {"id": 1, "name": "alice", "value": 10.0},
    {"id": 2, "name": "bob", "value": 20.0},
]


@pytest.fixture()
def catalog(spark, tmp_warehouse):
    return LakehouseCatalog(spark, tmp_warehouse)


@pytest.fixture()
def metrics(catalog):
    t = catalog.create_table("metrics", SCHEMA)
    crud.insert_rows(t, ROWS)
    return t


@pytest.fixture()
def engine(catalog):
    return QueryEngine(catalog)


# -------------------------------------------------------------- import/export

class TestImport:
    @pytest.fixture()
    def csv_file(self, tmp_path):
        p = tmp_path / "in.csv"
        p.write_text("id,name,value\n1,a,1.5\n2,b,2.5\n")
        return str(p)

    def test_create_mode(self, catalog, csv_file):
        res = lio.import_file(catalog, csv_file, "imported")
        assert res["table"] == "default.imported"
        assert res["rows_imported"] == 2 and res["mode"] == "create"
        assert catalog.load_table("imported").scan().count() == 2

    def test_if_exists_fail_raises(self, catalog, csv_file):
        lio.import_file(catalog, csv_file, "t")
        with pytest.raises(ValueError, match="already exists"):
            lio.import_file(catalog, csv_file, "t")

    def test_if_exists_append_and_replace(self, catalog, csv_file):
        lio.import_file(catalog, csv_file, "t")
        res = lio.import_file(catalog, csv_file, "t", if_exists="append")
        assert res["mode"] == "append"
        assert catalog.load_table("t").scan().count() == 4
        res = lio.import_file(catalog, csv_file, "t", if_exists="replace")
        assert res["mode"] == "replace"
        assert catalog.load_table("t").scan().count() == 2

    def test_append_rejects_extra_columns(self, catalog, csv_file, tmp_path):
        lio.import_file(catalog, csv_file, "t")
        wider = tmp_path / "wider.csv"
        wider.write_text("id,name,value,extra\n3,c,3.5,x\n")
        with pytest.raises(ValueError, match="columns not in table"):
            lio.import_file(catalog, str(wider), "t", if_exists="append")

    def test_invalid_if_exists_raises(self, catalog, csv_file):
        lio.import_file(catalog, csv_file, "t")
        with pytest.raises(ValueError, match="invalid if_exists"):
            lio.import_file(catalog, csv_file, "t", if_exists="upsert")

    def test_tsv_and_ndjson_inference(self, catalog, tmp_path):
        tsv = tmp_path / "in.tsv"
        tsv.write_text("id\tname\n1\ta\n")
        assert lio.import_file(catalog, str(tsv), "t_tsv")["rows"] == 1
        nd = tmp_path / "in.ndjson"
        nd.write_text('{"id": 1}\n{"id": 2}\n')
        assert lio.import_file(catalog, str(nd), "t_nd")["rows"] == 2

    def test_json_array_import(self, catalog, tmp_path):
        p = tmp_path / "arr.json"
        p.write_text(json.dumps([{"id": 1, "v": "x"}, {"id": 2, "v": "y"}]))
        assert lio.import_file(catalog, str(p), "t_json", file_format="json")["rows"] == 2


class TestExport:
    def test_unknown_format_raises(self, metrics, tmp_path):
        with pytest.raises(ValueError, match="Unsupported format"):
            lio.export_table(metrics, str(tmp_path / "x.avro"), "avro")

    def test_unknown_columns_raise(self, metrics, tmp_path):
        with pytest.raises(ValueError, match="Columns not found"):
            lio.export_table(metrics, str(tmp_path / "x.csv"), "csv", columns=["ghost"])

    def test_pushdown_trio(self, metrics, tmp_path, spark):
        out = str(tmp_path / "x.csv")
        res = lio.export_table(metrics, out, "csv", where="value > 15",
                               columns=["id", "value"], limit=10)
        assert res["rows"] == 1
        text = open(out).read()
        assert text.splitlines()[0] == "id,value"
        assert "alice" not in text

    def test_json_export_is_array(self, metrics, tmp_path):
        out = str(tmp_path / "x.json")
        lio.export_table(metrics, out, "json")
        data = json.load(open(out))
        assert isinstance(data, list) and len(data) == 2

    def test_roundtrip_parquet(self, metrics, tmp_path, catalog):
        out = str(tmp_path / "x.parquet")
        lio.export_table(metrics, out, "parquet")
        back = lio.import_file(catalog, out, "roundtrip")
        assert back["rows"] == 2


class TestConvert:
    def test_parquet_orc_roundtrip(self, metrics, tmp_path, spark):
        pq = str(tmp_path / "a.parquet")
        orc = str(tmp_path / "a.orc")
        lio.export_table(metrics, pq, "parquet")
        res = lio.convert_file(spark, pq, orc)
        assert res["rows"] == 2
        back = str(tmp_path / "b.parquet")
        assert lio.convert_file(spark, orc, back)["rows"] == 2


# -------------------------------------------------------------- backup/clone

class TestBackup:
    def test_backup_verify_restore(self, metrics, catalog, tmp_path):
        ap = str(tmp_path / "m.tar.gz")
        res = bc.backup_table(metrics, ap)
        assert res["rows"] == 2 and os.path.exists(ap)
        v = bc.verify_backup(ap)
        assert v["valid"] is True and v["table"] == "default.metrics"
        r = bc.restore_table(catalog, ap, "restored")
        assert r["rows"] == 2
        assert catalog.load_table("restored").scan().count() == 2

    def test_restore_existing_requires_overwrite(self, metrics, catalog, tmp_path):
        ap = str(tmp_path / "m.tar.gz")
        bc.backup_table(metrics, ap)
        with pytest.raises(ValueError, match="use overwrite=True"):
            bc.restore_table(catalog, ap, "default.metrics")
        r = bc.restore_table(catalog, ap, "default.metrics", overwrite=True)
        assert r["rows"] == 2

    def test_corrupt_archive_detected(self, metrics, catalog, tmp_path):
        ap = str(tmp_path / "m.tar.gz")
        bc.backup_table(metrics, ap)
        # tamper: rewrite the data member with altered bytes
        extract = tmp_path / "x"
        with tarfile.open(ap) as tar:
            tar.extractall(extract, filter="data")
        (extract / "data.parquet").write_bytes(b"corrupted")
        with tarfile.open(ap, "w:gz") as tar:
            tar.add(extract / "data.parquet", arcname="data.parquet")
            tar.add(extract / "metadata.json", arcname="metadata.json")
        assert bc.verify_backup(ap)["valid"] is False
        with pytest.raises(ValueError, match="checksum mismatch"):
            bc.restore_table(catalog, ap, "bad")

    def test_backup_as_of_snapshot(self, metrics, tmp_path, catalog):
        first = metrics.current_snapshot().snapshot_id
        crud.insert_rows(metrics, [{"id": 3, "name": "c", "value": 3.0}])
        ap = str(tmp_path / "old.tar.gz")
        res = bc.backup_table(metrics, ap, as_of=str(first))
        assert res["rows"] == 2  # pre-insert state


class TestClone:
    def test_clone_promote_discard(self, metrics, catalog):
        res = bc.clone_table(catalog, "default.metrics", "clones.m2")
        assert res["rows"] == 2
        clone = catalog.load_table("clones.m2")
        assert clone.properties()["cloned_from"] == "default.metrics"
        crud.insert_rows(clone, [{"id": 9, "name": "z", "value": 9.0}])
        bc.promote_clone(catalog, "clones.m2", "default.metrics")
        assert metrics.scan().count() == 3
        # promote preserved target history: previous snapshot still there
        assert len(metrics.snapshots()) >= 2
        bc.discard_clone(catalog, "clones.m2")
        assert not catalog.table_exists("clones.m2")

    def test_clone_existing_name_raises(self, metrics, catalog):
        bc.clone_table(catalog, "default.metrics", "clones.m3")
        with pytest.raises(ValueError, match="already exists"):
            bc.clone_table(catalog, "default.metrics", "clones.m3")


# --------------------------------------------------- views/matviews/pipelines

class TestViews:
    def test_create_duplicate_raises(self, engine, tmp_path):
        vm = ViewManager(str(tmp_path / "v.json"), engine)
        vm.create("v", "SELECT 1 AS one")
        with pytest.raises(ValueError, match="already exists"):
            vm.create("v", "SELECT 2")

    def test_get_missing_raises(self, engine, tmp_path):
        vm = ViewManager(str(tmp_path / "v.json"), engine)
        with pytest.raises(ValueError, match="not found"):
            vm.get("ghost")

    def test_query_resolves_tables(self, engine, metrics, tmp_path):
        vm = ViewManager(str(tmp_path / "v.json"), engine)
        vm.create("highs", "SELECT id FROM metrics WHERE value > 15")
        assert [r["id"] for r in vm.query("highs").collect()] == [2]


class TestMatviews:
    @pytest.fixture()
    def mv(self, catalog, engine, tmp_path):
        return MatviewManager(str(tmp_path / "mv.json"), catalog, engine)

    def test_create_materializes_and_freshness_tracks(self, mv, metrics):
        mv.create("m_sum", "SELECT sum(value) AS s FROM metrics")
        assert mv.query("m_sum").collect()[0]["s"] == 30.0
        assert mv.freshness("m_sum")["stale"] is False
        crud.insert_rows(metrics, [{"id": 3, "name": "c", "value": 5.0}])
        fresh = mv.freshness("m_sum")
        assert fresh["stale"] is True
        assert fresh["changed_tables"] == ["default.metrics"]
        mv.refresh("m_sum")
        assert mv.query("m_sum").collect()[0]["s"] == 35.0
        assert mv.freshness("m_sum")["stale"] is False

    def test_duplicate_and_missing_raise(self, mv, metrics):
        mv.create("m1", "SELECT 1 AS one")
        with pytest.raises(ValueError, match="already exists"):
            mv.create("m1", "SELECT 2")
        with pytest.raises(ValueError, match="does not exist"):
            mv.refresh("ghost")
        with pytest.raises(ValueError, match="does not exist"):
            mv.freshness("ghost")

    def test_drop_removes_backing_table(self, mv, metrics, catalog):
        created = mv.create("m2", "SELECT id FROM metrics")
        backing = created["backing_table"]
        assert catalog.table_exists(backing)
        mv.drop("m2")
        assert not catalog.table_exists(backing)


class TestPipelines:
    @pytest.fixture()
    def pm(self, catalog, engine, tmp_path):
        return PipelineManager(str(tmp_path / "p.json"), catalog, engine)

    def test_step_validation(self, pm):
        with pytest.raises(ValueError, match="missing 'sql'"):
            pm.create("p", [{"target_table": "x"}])
        with pytest.raises(ValueError, match="invalid mode"):
            pm.create("p", [{"sql": "SELECT 1", "mode": "merge"}])

    def test_duplicate_raises(self, pm):
        pm.create("p", [{"sql": "SELECT 1 AS one"}])
        with pytest.raises(ValueError, match="already exists"):
            pm.create("p", [{"sql": "SELECT 1"}])

    def test_run_materializes_chain(self, pm, metrics, catalog):
        pm.create("chain", [
            {"sql": "SELECT id, value * 2 AS v2 FROM metrics",
             "target_table": "default.stage1"},
            {"sql": "SELECT sum(v2) AS total FROM stage1",
             "target_table": "default.stage2"},
        ])
        run = pm.run("chain")
        assert run["status"] == "completed"
        assert run["steps_completed"] == 2 and run["steps_failed"] == 0
        assert catalog.load_table("stage2").scan().collect()[0]["total"] == 60.0

    def test_run_stops_on_error(self, pm, metrics, catalog):
        pm.create("bad", [
            {"sql": "SELECT broken_col FROM metrics", "target_table": "default.b1"},
            {"sql": "SELECT 1 AS one", "target_table": "default.b2"},
        ])
        run = pm.run("bad")
        assert run["status"] == "failed"
        assert len(run["step_results"]) == 1  # second step never ran
        assert not catalog.table_exists("default.b2")

    def test_dry_run_validates_without_writing(self, pm, metrics, catalog):
        pm.create("dry", [
            {"sql": "SELECT id FROM metrics", "target_table": "default.d1"},
            {"sql": "SELECT id FROM d1", "target_table": "default.d2"},
        ])
        res = pm.dry_run("dry")
        assert res["dry_run"] is True
        assert all(s["status"] == "validated" for s in res["step_results"])
        assert res["step_results"][0]["columns"] == ["id"]
        assert not catalog.table_exists("default.d1")

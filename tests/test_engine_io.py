"""QueryEngine + import/export + backup/clone tests (reference
tests/test_queries.py, test_import.py, test_export.py, test_backup.py
style)."""

from __future__ import annotations

import json
import os

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.operators import crud
from iceberg_lakehouse_spark.plans.engine import QueryEngine
from iceberg_lakehouse_spark.sources import backup_clone, io as lio

SCHEMA = [("id", "long"), ("category", "string"), ("amount", "double")]
ROWS = [
    {"id": 1, "category": "a", "amount": 10.0},
    {"id": 2, "category": "b", "amount": 20.0},
    {"id": 3, "category": "a", "amount": 30.0},
]


@pytest.fixture()
def catalog(spark, tmp_warehouse):
    c = LakehouseCatalog(spark, tmp_warehouse)
    t = c.create_table("expenses", SCHEMA)
    crud.insert_rows(t, ROWS)
    return c


def test_engine_sql_and_autolimit(catalog):
    eng = QueryEngine(catalog, max_rows=2)
    assert eng.execute("SELECT * FROM expenses").count() == 2  # auto-limit
    assert eng.execute("SELECT * FROM expenses LIMIT 3").count() == 3
    assert (
        eng.execute("SELECT sum(amount) AS s FROM expenses").collect()[0]["s"] == 60.0
    )
    # namespace alias
    assert eng.execute("SELECT * FROM default__expenses LIMIT 5").count() == 3


def test_engine_refresh_sees_new_data(catalog):
    eng = QueryEngine(catalog)
    assert eng.execute("SELECT * FROM expenses").count() == 3
    crud.insert_rows(catalog.load_table("expenses"), [{"id": 4, "category": "c", "amount": 1.0}])
    eng.refresh()
    assert eng.execute("SELECT * FROM expenses").count() == 4


def test_engine_as_of(catalog):
    t = catalog.load_table("expenses")
    s1 = t.current_snapshot().snapshot_id
    crud.insert_rows(t, [{"id": 4, "category": "c", "amount": 1.0}])
    eng = QueryEngine(catalog)
    hist = eng.execute_as_of("SELECT * FROM expenses", "expenses", str(s1))
    assert hist.count() == 3
    # main session still sees current data afterwards
    assert eng.execute("SELECT * FROM expenses").count() == 4


def test_csv_roundtrip(catalog, tmp_path):
    t = catalog.load_table("expenses")
    out = str(tmp_path / "out.csv")
    res = lio.export_table(t, out, "csv", where="amount > 10", columns=["id", "amount"])
    assert res["rows"] == 2
    imp = lio.import_file(catalog, out, "expenses_copy")
    assert imp["table"] == "default.expenses_copy"
    assert imp["rows_imported"] == 2 and imp["format"] == "csv"
    assert imp["mode"] == "create"
    df = catalog.load_table("expenses_copy").scan()
    assert sorted(r["id"] for r in df.collect()) == [2, 3]


def test_import_if_exists_modes(catalog, tmp_path):
    t = catalog.load_table("expenses")
    out = str(tmp_path / "rows.ndjson")
    lio.export_table(t, out, "ndjson")
    with pytest.raises(ValueError, match="already exists"):
        lio.import_file(catalog, out, "expenses", file_format="ndjson")
    res = lio.import_file(catalog, out, "expenses", file_format="ndjson", if_exists="append")
    assert res["mode"] == "append"
    assert t.scan().count() == 6
    res = lio.import_file(catalog, out, "expenses", file_format="ndjson", if_exists="replace")
    assert t.scan().count() == 3


def test_json_array_export(catalog, tmp_path):
    out = str(tmp_path / "rows.json")
    lio.export_table(catalog.load_table("expenses"), out, "json")
    data = json.load(open(out))
    assert len(data) == 3 and {"id", "category", "amount"} <= set(data[0])


def test_orc_second_format(catalog, tmp_path):
    t = catalog.load_table("expenses")
    orc = str(tmp_path / "t.orc")
    lio.table_to_orc(t, orc)
    pq = str(tmp_path / "t.parquet")
    lio.convert_file(catalog.spark, orc, pq)
    assert catalog.spark.read.parquet(pq).count() == 3
    eng = QueryEngine(catalog)
    assert eng.query_file(orc, "SELECT count(*) AS n FROM file_view").collect()[0]["n"] == 3


def test_backup_verify_restore(catalog, tmp_path):
    t = catalog.load_table("expenses")
    arch = str(tmp_path / "b.tar.gz")
    res = backup_clone.backup_table(t, arch)
    assert res["rows"] == 3
    assert backup_clone.verify_backup(arch)["valid"]
    res = backup_clone.restore_table(catalog, arch, "restored")
    assert catalog.load_table("restored").scan().count() == 3
    with pytest.raises(ValueError, match="exists"):
        backup_clone.restore_table(catalog, arch, "restored")
    backup_clone.restore_table(catalog, arch, "restored", overwrite=True)


def test_clone_promote_discard(catalog):
    t = catalog.load_table("expenses")
    s1 = t.current_snapshot().snapshot_id
    crud.insert_rows(t, [{"id": 99, "category": "z", "amount": 0.5}])
    res = backup_clone.clone_table(catalog, "default.expenses", "default.exp_clone", as_of=str(s1))
    assert res["rows"] == 3  # cloned at old snapshot
    crud.update_rows(catalog.load_table("exp_clone"), "id = 1", {"amount": 111.0})
    backup_clone.promote_clone(catalog, "exp_clone", "expenses")
    assert t.scan().count() == 3
    assert t.scan().where("id = 1").collect()[0]["amount"] == 111.0
    backup_clone.discard_clone(catalog, "exp_clone")
    assert not catalog.table_exists("exp_clone")


def test_execute_cached_with_history(catalog, tmp_path):
    from iceberg_lakehouse_spark.governance.queries_store import QueryCache, SavedQueries
    from iceberg_lakehouse_spark.plans.engine import QueryEngine

    sq = SavedQueries(str(tmp_path / "q.json"))
    qc = QueryCache(str(tmp_path / "cache.json"))
    eng = QueryEngine(catalog, history=sq, query_cache=qc)
    sql = "SELECT category, sum(amount) AS total FROM expenses GROUP BY category"
    rows1 = eng.execute_cached(sql)
    assert len(rows1) == 2
    # second call is a cache hit: history unchanged, same rows
    rows2 = eng.execute_cached(sql)
    assert rows2 == rows1
    assert len(sq.history()) == 1
    assert qc.stats()["hits"] == 1
    # table invalidation forces recompute
    qc.invalidate_table("expenses")
    eng.execute_cached(sql)
    assert len(sq.history()) == 2


class TestExportEdges:
    """Reference tests/test_export.py: auto-detect, pushdown combos,
    errors, empty tables, parent dirs."""

    @pytest.fixture()
    def t(self, catalog):
        return catalog.load_table("expenses")

    def test_auto_detect_by_extension(self, t, tmp_path):
        for name, expect in [
            ("out.csv", "csv"), ("out.tsv", "tsv"), ("out.json", "json"),
            ("out.ndjson", "ndjson"), ("out.jsonl", "ndjson"),
            ("out.parquet", "parquet"), ("out.orc", "orc"),
        ]:
            p = str(tmp_path / name)
            res = lio.export_table(t, p)
            assert res["rows"] == 3, name
            assert os.path.exists(p), name
        # .json is a real JSON array; .jsonl is newline-delimited
        with open(tmp_path / "out.json") as f:
            assert len(json.load(f)) == 3
        with open(tmp_path / "out.jsonl") as f:
            assert len([ln for ln in f if ln.strip()]) == 3

    def test_where_columns_limit_combo(self, t, tmp_path, spark):
        p = str(tmp_path / "combo.csv")
        res = lio.export_table(
            t, p, where="amount >= 10", columns=["id", "amount"], limit=2
        )
        assert res["rows"] == 2
        got = spark.read.option("header", True).csv(p)
        assert got.columns == ["id", "amount"]
        assert got.count() == 2

    def test_invalid_column_raises(self, t, tmp_path):
        with pytest.raises(ValueError, match="Columns not found"):
            lio.export_table(t, str(tmp_path / "x.csv"), columns=["ghost"])

    def test_unsupported_format_raises(self, t, tmp_path):
        with pytest.raises(ValueError, match="Unsupported format"):
            lio.export_table(t, str(tmp_path / "x.avro"), file_format="avro")

    def test_empty_table_exports_header_only(self, catalog, tmp_path, spark):
        empty = catalog.create_table("empty_exp", SCHEMA)
        p = str(tmp_path / "empty.csv")
        res = lio.export_table(empty, p)
        assert res["rows"] == 0
        assert spark.read.option("header", True).csv(p).count() == 0

    def test_creates_parent_dirs(self, t, tmp_path):
        p = str(tmp_path / "deep" / "nested" / "out.csv")
        lio.export_table(t, p)
        assert os.path.exists(p)


class TestImportEdges:
    """Reference tests/test_import.py: delimiters, headers, overrides,
    error paths, schema drift on append."""

    def test_custom_delimiter(self, catalog, tmp_path):
        p = tmp_path / "semi.csv"
        p.write_text("id;name\n1;alice\n2;bob\n")
        res = lio.import_file(catalog, str(p), "semi_t", delimiter=";")
        assert res["table"] == "default.semi_t"
        assert res["rows_imported"] == 2 and res["mode"] == "create"
        assert catalog.load_table("semi_t").scan().columns == ["id", "name"]

    def test_tsv_auto_detect(self, catalog, tmp_path):
        p = tmp_path / "tabs.tsv"
        p.write_text("id\tname\n1\talice\n")
        res = lio.import_file(catalog, str(p), "tsv_t")
        assert res["rows"] == 1
        assert catalog.load_table("tsv_t").scan().collect()[0]["name"] == "alice"

    def test_no_header_generates_column_names(self, catalog, tmp_path):
        p = tmp_path / "raw.csv"
        p.write_text("1,alice\n2,bob\n")
        res = lio.import_file(catalog, str(p), "nohdr_t", has_header=False)
        assert res["rows"] == 2
        cols = catalog.load_table("nohdr_t").scan().columns
        assert cols == ["_c0", "_c1"]

    def test_format_override_beats_extension(self, catalog, tmp_path):
        p = tmp_path / "data.txt"  # ndjson content, wrong extension
        p.write_text('{"id": 1}\n{"id": 2}\n')
        res = lio.import_file(catalog, str(p), "ovr_t", file_format="ndjson")
        assert res["rows"] == 2

    def test_jsonl_auto_detect(self, catalog, tmp_path):
        p = tmp_path / "rows.jsonl"
        p.write_text('{"id": 1}\n{"id": 2}\n{"id": 3}\n')
        assert lio.import_file(catalog, str(p), "jsonl_t")["rows"] == 3

    def test_missing_file_raises(self, catalog, tmp_path):
        with pytest.raises(Exception):  # Spark AnalysisException: PATH_NOT_FOUND
            lio.import_file(catalog, str(tmp_path / "nope.csv"), "missing_t")
        assert not catalog.table_exists("missing_t")

    def test_unsupported_format_raises(self, catalog, tmp_path):
        p = tmp_path / "x.csv"
        p.write_text("id\n1\n")
        with pytest.raises(ValueError, match="Unsupported format"):
            lio.import_file(catalog, str(p), "bad_t", file_format="avro")

    def test_append_rejects_extra_columns(self, catalog, tmp_path):
        p = tmp_path / "extra.csv"
        p.write_text("id,category,amount,bonus\n9,z,1.5,4\n")
        with pytest.raises(ValueError, match="columns not in table"):
            lio.import_file(catalog, str(p), "expenses", if_exists="append")

    def test_append_null_fills_missing_columns(self, catalog, tmp_path):
        p = tmp_path / "narrow.csv"
        p.write_text("id,category\n9,z\n")
        res = lio.import_file(catalog, str(p), "expenses", if_exists="append")
        assert res["mode"] == "append"
        row = [r for r in catalog.load_table("expenses").scan().collect()
               if r["id"] == 9][0]
        assert row["category"] == "z" and row["amount"] is None

    def test_import_with_namespace(self, catalog, tmp_path):
        p = tmp_path / "ns.csv"
        p.write_text("id\n1\n")
        lio.import_file(catalog, str(p), "staging.in_t")
        assert catalog.load_table("staging.in_t").scan().count() == 1

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
    assert imp == {"table": "expenses_copy", "rows": 2, "mode": "create"}
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

"""Incremental aggregate matviews (governance/views.py
create_aggregate / refresh_incremental): changelog-driven per-group
delta maintenance with an atomic equality-delete + append commit over
only the touched groups. Invariant checked throughout: after every
refresh the matview equals a from-scratch recompute. Reference
analogue: none (reference matviews recompute on refresh)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance.views import MatviewManager
from iceberg_lakehouse_spark.operators import crud
from iceberg_lakehouse_spark.plans.engine import QueryEngine

MOR = {"write.delete.mode": "merge-on-read",
       "write.update.mode": "merge-on-read"}

AGGS = [
    {"fn": "sum", "col": "amount", "as": "total"},
    {"fn": "count", "col": "amount", "as": "n_amounts"},
    {"fn": "count_star", "as": "n_rows"},
]


@pytest.fixture
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "lake"))


@pytest.fixture
def mv(catalog, tmp_path):
    return MatviewManager(str(tmp_path / "mv.json"), catalog,
                          QueryEngine(catalog))


@pytest.fixture
def source(spark, catalog):
    t = catalog.create_table(
        "default.sales",
        [("id", "long"), ("category", "string"), ("amount", "long")],
        properties=dict(MOR))
    t.append(spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], (i + 1) * 10) for i in range(30)],
        "id long, category string, amount long"))
    return t


def _recompute(t):
    return sorted(
        tuple(r) for r in t.scan().groupBy("category").agg(
            F.sum("amount").alias("total"),
            F.count("amount").alias("n_amounts"),
            F.count(F.lit(1)).alias("n_rows"),
        ).collect())


def _view(mv, name="agg"):
    return sorted(tuple(r) for r in mv.query(name).collect())


def _check(mv, t, name="agg"):
    assert _view(mv, name) == _recompute(t)


def test_incremental_tracks_mutations_exactly(spark, catalog, mv, source):
    mv.create_aggregate("agg", "default.sales", ["category"], AGGS)
    _check(mv, source)
    # hidden maintenance columns never leak through query()
    assert all(not c.startswith("_mv_") for c in mv.query("agg").columns)

    source.append(spark.createDataFrame(
        [(100, "a", 5), (101, "d", 7)],
        "id long, category string, amount long"))
    rep = mv.refresh_incremental("agg")
    assert rep["mode"] == "incremental" and rep["changed_groups"] == 2
    _check(mv, source)  # new group 'd' appeared

    crud.delete_rows(source, "category = 'b' AND id < 10")
    crud.update_rows(source, "id = 0", {"amount": 999})
    rep = mv.refresh_incremental("agg")
    assert rep["mode"] == "incremental"
    _check(mv, source)

    rep = mv.refresh_incremental("agg")  # nothing changed
    assert rep["mode"] == "noop"


def test_group_dies_when_count_reaches_zero(spark, catalog, mv, source):
    mv.create_aggregate("agg", "default.sales", ["category"], AGGS)
    crud.delete_rows(source, "category = 'c'")
    rep = mv.refresh_incremental("agg")
    assert rep["mode"] == "incremental"
    _check(mv, source)
    assert "c" not in [r["category"] for r in mv.query("agg").collect()]


def test_all_null_sum_stays_null(spark, catalog, mv):
    t = catalog.create_table(
        "default.ns", [("k", "string"), ("v", "long")],
        properties=dict(MOR))
    t.append(spark.createDataFrame([("a", 1), ("b", None)],
                                   "k string, v long"))
    mv.create_aggregate("agg", "default.ns", ["k"],
                        [{"fn": "sum", "col": "v", "as": "total"}])
    got = {r["k"]: r["total"] for r in mv.query("agg").collect()}
    assert got == {"a": 1, "b": None}
    # delete group a's only valued row via update to NULL-equivalent:
    # append another NULL row to b, delete a entirely
    t.append(spark.createDataFrame([("b", None)], "k string, v long"))
    crud.delete_rows(t, "k = 'a'")
    rep = mv.refresh_incremental("agg")
    assert rep["mode"] == "incremental"
    got = {r["k"]: r["total"] for r in mv.query("agg").collect()}
    assert got == {"b": None}  # two NULL rows: sum stays NULL, group lives


def test_null_group_key_is_a_real_group(spark, catalog, mv):
    t = catalog.create_table(
        "default.nk", [("k", "string"), ("v", "long")],
        properties=dict(MOR))
    t.append(spark.createDataFrame([("a", 1), (None, 2)],
                                   "k string, v long"))
    mv.create_aggregate("agg", "default.nk", ["k"],
                        [{"fn": "sum", "col": "v", "as": "total"}])
    t.append(spark.createDataFrame([(None, 5)], "k string, v long"))
    rep = mv.refresh_incremental("agg")
    assert rep["mode"] == "incremental"
    got = {r["k"]: r["total"] for r in mv.query("agg").collect()}
    assert got == {"a": 1, None: 7}


def test_full_fallback_when_changelog_expired(spark, catalog, mv, source):
    mv.create_aggregate("agg", "default.sales", ["category"], AGGS)
    source.append(spark.createDataFrame([(200, "a", 1)],
                                        "id long, category string, amount long"))
    source.compact()  # rewrite commits alone wouldn't force full...
    source.expire_snapshots(retain_last=1)  # ...but losing the range does
    rep = mv.refresh_incremental("agg")
    assert rep["mode"] == "full"
    _check(mv, source)


def test_full_refresh_path_and_freshness(spark, catalog, mv, source):
    mv.create_aggregate("agg", "default.sales", ["category"], AGGS)
    assert mv.freshness("agg")["stale"] is False
    source.append(spark.createDataFrame([(300, "e", 4)],
                                        "id long, category string, amount long"))
    assert mv.freshness("agg")["stale"] is True
    mv.refresh("agg")  # classic full recompute still works
    _check(mv, source)
    assert mv.freshness("agg")["stale"] is False
    assert mv.refresh_incremental("agg")["mode"] == "noop"


def test_validation(spark, catalog, mv, source):
    with pytest.raises(ValueError, match="MIN/MAX"):
        mv.create_aggregate("x", "default.sales", ["category"],
                            [{"fn": "min", "col": "amount", "as": "m"}])
    with pytest.raises(ValueError, match="not in"):
        mv.create_aggregate("x", "default.sales", ["category"],
                            [{"fn": "sum", "col": "ghost", "as": "m"}])
    with pytest.raises(ValueError, match="group_by"):
        mv.create_aggregate("x", "default.sales", [], AGGS)
    with pytest.raises(ValueError, match="bad or duplicate"):
        mv.create_aggregate("x", "default.sales", ["category"],
                            [{"fn": "count_star", "as": "_mv_evil"}])
    mv.create_aggregate("agg", "default.sales", ["category"], AGGS)
    with pytest.raises(ValueError, match="does not exist"):
        mv.refresh_incremental("nope")
    mv.create("plain", "SELECT 1 AS one")  # classic matviews reject it
    with pytest.raises(ValueError, match="SQL matview"):
        mv.refresh_incremental("plain")


def test_auto_refresh_cascade_uses_incremental(spark, catalog, mv, source,
                                               tmp_path):
    """The refresh cascade routes aggregate matviews through the
    changelog-delta path instead of a recompute."""
    from iceberg_lakehouse_spark.governance.auto_refresh import (
        AutoRefreshManager,
    )
    from iceberg_lakehouse_spark.governance.lineage import LineageManager

    lineage = LineageManager(str(tmp_path / "lin.json"))
    mv.lineage = lineage
    mv.create_aggregate("agg", "default.sales", ["category"], AGGS)
    ar = AutoRefreshManager(str(tmp_path / "ar.json"), lineage, matviews=mv)
    ar.configure("default.sales")
    source.append(spark.createDataFrame(
        [(500, "a", 1)], "id long, category string, amount long"))
    res = ar.execute("default.sales")
    acts = [a for a in res["actions"]
            if a.get("action") == "refresh_matview"]
    assert acts and acts[0]["mode"] == "incremental"
    _check(mv, source)


def test_backing_delete_debt_folds(spark, catalog, mv, source, monkeypatch):
    """Every refresh adds one eq-delete file to the backing table (and
    a scan branch with it) — past the threshold a cheap compact folds
    the debt; values stay recompute-exact throughout."""
    monkeypatch.setattr(MatviewManager, "_BACKING_COMPACT_EQ", 2)
    mv.create_aggregate("agg", "default.sales", ["category"], AGGS)
    backing = catalog.load_table(mv.store.load()["agg"]["backing_table"])
    for i in range(3):
        source.append(spark.createDataFrame(
            [(900 + i, "a", 1)], "id long, category string, amount long"))
        assert mv.refresh_incremental("agg")["mode"] == "incremental"
        _check(mv, source)
    assert len(backing.current_snapshot().eq_delete_files) < 2


def test_incremental_refresh_over_replace_where(spark, tmp_warehouse, tmp_path):
    """A replace_where commit on the backing table routes through the
    changelog (delete+insert deltas), so the incremental refresh stays
    exact: group totals reflect the replaced slice, and a group whose
    rows all left dies."""
    from iceberg_lakehouse_spark.catalog import LakehouseCatalog
    from iceberg_lakehouse_spark.governance.views import MatviewManager
    from iceberg_lakehouse_spark.operators import crud
    from iceberg_lakehouse_spark.plans.engine import QueryEngine

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table(
        "default.rwmv", [("k", "string"), ("cents", "long")])
    t.append(spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5)], "k string, cents long"))
    mv = MatviewManager(str(tmp_path / "mv.json"), cat, QueryEngine(cat))
    mv.create_aggregate(
        "totals", "default.rwmv", ["k"],
        [{"fn": "sum", "col": "cents", "as": "total"},
         {"fn": "count_star", "as": "n"}])
    crud.replace_where(
        t, "k = 'b'",
        spark.createDataFrame([("b", 100), ("b", 1)], "k string, cents long"))
    rep = mv.refresh_incremental("totals")
    rows = {r["k"]: (r["total"], r["n"])
            for r in mv.query("totals").collect()}
    assert rows == {"a": (30, 2), "b": (101, 2)}, (rep, rows)
    # replace the whole 'a' slice with nothing -> group death
    crud.replace_where(
        t, "k = 'a'", spark.createDataFrame([], "k string, cents long"))
    mv.refresh_incremental("totals")
    rows = {r["k"]: (r["total"], r["n"])
            for r in mv.query("totals").collect()}
    assert rows == {"b": (101, 2)}

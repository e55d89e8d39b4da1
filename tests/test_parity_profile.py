"""Table-profile parity with the reference behavioral corpus
(reference tests/test_profile.py:1-123, profile.py).

Ports the assertion CONTENT — numeric stats (min/max/mean/std +
p25/p50/p75), integer and null handling, string top-value histograms,
and column-restricted profiling — against the repo's
compute_table_stats."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance.stats import compute_table_stats
from iceberg_lakehouse_spark.operators import crud


@pytest.fixture
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "lake"))


def test_profile_numeric_stats(catalog):
    t = catalog.create_table("p_num", [("id", "long"), ("amount", "double")])
    crud.insert_rows(t, [{"id": i, "amount": float(i * 10)} for i in range(1, 6)])
    amount = compute_table_stats(t)["columns"]["amount"]
    assert amount["type"] == "double"
    assert amount["nulls"] == 0
    assert amount["unique"] == 5
    assert amount["min"] == 10.0
    assert amount["max"] == 50.0
    assert amount["mean"] == 30.0
    assert amount["p50"] == 30.0
    assert "std" in amount
    assert "p25" in amount
    assert "p75" in amount


def test_profile_integer_column(catalog):
    t = catalog.create_table("p_int", [("id", "long")])
    crud.insert_rows(t, [{"id": 1}, {"id": 2}, {"id": 3}])
    id_col = compute_table_stats(t)["columns"]["id"]
    assert id_col["type"] == "bigint"
    assert id_col["min"] == 1
    assert id_col["max"] == 3
    assert id_col["mean"] == 2.0


def test_profile_string_top_values(catalog):
    t = catalog.create_table("p_str", [("id", "long"), ("category", "string")])
    crud.insert_rows(t, [
        {"id": 1, "category": "food"}, {"id": 2, "category": "food"},
        {"id": 3, "category": "food"}, {"id": 4, "category": "transport"},
        {"id": 5, "category": "transport"},
    ])
    cat = compute_table_stats(t)["columns"]["category"]
    assert cat["type"] == "string"
    assert cat["unique"] == 2
    assert cat["top_values"]["food"] == 3
    assert cat["top_values"]["transport"] == 2


def test_profile_string_nulls(catalog):
    t = catalog.create_table("p_null", [("id", "long"), ("category", "string")])
    crud.insert_rows(t, [
        {"id": 1, "category": "a"}, {"id": 2, "category": None},
        {"id": 3, "category": None},
    ])
    cat = compute_table_stats(t)["columns"]["category"]
    assert cat["nulls"] == 2
    assert cat["unique"] == 1
    assert None not in cat["top_values"]


def test_profile_numeric_with_nulls(catalog):
    t = catalog.create_table("p_nn", [("id", "long"), ("amount", "double")])
    crud.insert_rows(t, [
        {"id": 1, "amount": 10.0}, {"id": 2, "amount": None},
        {"id": 3, "amount": 30.0},
    ])
    amount = compute_table_stats(t)["columns"]["amount"]
    assert amount["nulls"] == 1
    assert amount["unique"] == 2
    assert amount["min"] == 10.0
    assert amount["max"] == 30.0


def test_profile_specific_columns(catalog):
    t = catalog.create_table(
        "p_cols",
        [("id", "long"), ("amount", "double"), ("category", "string"),
         ("currency", "string")])
    crud.insert_rows(t, [{"id": 1, "amount": 1.0, "category": "x",
                          "currency": "usd"}])
    stats = compute_table_stats(t, columns=["id", "amount"])
    assert "id" in stats["columns"]
    assert "amount" in stats["columns"]
    assert "category" not in stats["columns"]
    assert "currency" not in stats["columns"]
    assert stats["row_count"] == 1


def test_profile_top_values_capped(catalog):
    t = catalog.create_table("p_cap", [("v", "string")])
    crud.insert_rows(t, [{"v": f"val{i}"} for i in range(15)])
    stats = compute_table_stats(t, top_k=5)
    assert len(stats["columns"]["v"]["top_values"]) == 5

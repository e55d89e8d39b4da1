"""Sample-to-table (SA4) + sample statistics (SA5)."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.operators import crud
from iceberg_lakehouse_spark.operators.sampling_ops import sample_stats, sample_to_table


@pytest.fixture()
def catalog(spark, tmp_warehouse):
    c = LakehouseCatalog(spark, tmp_warehouse)
    t = c.create_table("src", [("id", "long"), ("grp", "string"), ("v", "double")])
    crud.insert_rows(
        t,
        [{"id": i, "grp": "a" if i % 10 else "rare", "v": float(i)} for i in range(200)],
    )
    return c


def test_bernoulli_sample_to_table(catalog):
    res = sample_to_table(catalog, "src", "s1", fraction=0.2, method="bernoulli")
    assert 10 <= res["rows"] <= 90  # ~40 expected
    assert catalog.load_table("s1").scan().count() == res["rows"]


def test_systematic_sample_to_table(catalog):
    res = sample_to_table(catalog, "src", "s2", fraction=0.1, method="systematic")
    assert res["rows"] == 20  # exactly every 10th


def test_stratified_keeps_rare_stratum(catalog):
    res = sample_to_table(
        catalog, "src", "s3", fraction=0.05, method="stratified", stratify_by="grp"
    )
    sample = catalog.load_table("s3").scan()
    # the 20-row 'rare' stratum must still be represented (≥1 row)
    assert sample.where("grp = 'rare'").count() >= 1
    with pytest.raises(ValueError, match="stratify_by"):
        sample_to_table(catalog, "src", "s4", method="stratified")


def test_sample_stats(catalog):
    sample_to_table(catalog, "src", "s5", fraction=0.3, method="bernoulli")
    stats = sample_stats(
        catalog.load_table("src").scan(), catalog.load_table("s5").scan()
    )
    assert stats["full_rows"] == 200
    assert 0 < stats["coverage_pct"] < 100
    assert abs(stats["columns"]["v"]["sample_avg"] - stats["columns"]["v"]["full_avg"]) < 40

"""Sampling-operator parity with the reference behavioral corpus
(reference tests/test_sampling.py:1-167, sampling.py:181-308).

Ports the assertion CONTENT — random sampling (fraction bounds, seed
reproducibility, fraction=1, limits, empty tables), stratified
sampling (all strata covered, per-stratum sampled<=total),
systematic every-Nth, sample materialization with rows_sampled and
method validation, and sample-vs-full statistics with coverage and
per-numeric-column comparison — against operators.sampling_ops."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.operators import crud
from iceberg_lakehouse_spark.operators.sampling_ops import (
    random_sample,
    sample_stats,
    sample_to_table,
    stratified_sample,
    systematic_sample,
)


@pytest.fixture
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "lake"))


@pytest.fixture
def sample_table(catalog):
    """100 rows over 3 categories (reference sample_table fixture)."""
    t = catalog.create_table(
        "samp", [("id", "long"), ("category", "string"), ("value", "double")])
    crud.insert_rows(t, [
        {"id": i, "category": ["A", "B", "C"][i % 3], "value": float(i)}
        for i in range(100)
    ])
    return t


# --- random ---


def test_random_approximate_fraction(sample_table):
    result = random_sample(sample_table, fraction=0.5, seed=1)
    assert 20 <= result["sample_size"] <= 80
    assert result["total_rows"] == 100


def test_random_seed_reproducible(sample_table):
    r1 = random_sample(sample_table, fraction=0.3, seed=7)
    r2 = random_sample(sample_table, fraction=0.3, seed=7)
    assert r1["sample_size"] == r2["sample_size"]


def test_random_fraction_one_returns_all(sample_table):
    assert random_sample(sample_table, fraction=1.0)["sample_size"] == 100


def test_random_empty_table(catalog):
    t = catalog.create_table("empty_s", [("id", "long")])
    assert random_sample(t, fraction=0.5)["sample_size"] == 0


def test_random_small_table(catalog):
    t = catalog.create_table("small_s", [("id", "long")])
    crud.insert_rows(t, [{"id": 1}, {"id": 2}, {"id": 3}])
    assert random_sample(t, fraction=0.5)["sample_size"] <= 3


def test_random_with_limit(sample_table):
    result = random_sample(sample_table, fraction=0.9, limit=5)
    assert result["sample_size"] <= 5


# --- stratified ---


def test_stratified_maintains_distribution(sample_table):
    result = stratified_sample(sample_table, "category", 0.3)
    categories = {r["category"] for r in result["rows"]}
    assert categories == {"A", "B", "C"}
    assert set(result["strata"]) == {"A", "B", "C"}


def test_stratified_proportional(sample_table):
    result = stratified_sample(sample_table, "category", 0.3)
    for val in result["strata"].values():
        assert val["sampled"] >= 1
        assert val["sampled"] <= val["total"]


def test_stratified_empty_table(catalog):
    t = catalog.create_table("empty_str", [("id", "long"), ("c", "string")])
    assert stratified_sample(t, "c", 0.5)["sample_size"] == 0


# --- systematic ---


def test_systematic_every_10th(sample_table):
    assert systematic_sample(sample_table, interval=10)["sample_size"] == 10


def test_systematic_every_5th(sample_table):
    assert systematic_sample(sample_table, interval=5)["sample_size"] == 20


def test_systematic_empty_table(catalog):
    t = catalog.create_table("empty_sys", [("id", "long")])
    assert systematic_sample(t, interval=10)["sample_size"] == 0


# --- materialize ---


def test_materialize_random(catalog, sample_table):
    result = sample_to_table(catalog, "default.samp", "default.random_copy",
                             fraction=0.3)
    assert result["rows_sampled"] > 0
    assert result["sample_table"] == "default.random_copy"
    assert (catalog.load_table("random_copy").scan().count()
            == result["rows_sampled"])


def test_materialize_stratified(catalog, sample_table):
    result = sample_to_table(
        catalog, "default.samp", "default.strat_copy", fraction=0.3,
        method="stratified", stratify_by="category")
    assert result["rows_sampled"] > 0


def test_materialize_systematic(catalog, sample_table):
    result = sample_to_table(catalog, "default.samp", "default.sys_copy",
                             fraction=0.1, method="systematic")
    assert result["rows_sampled"] == 10


def test_materialize_invalid_method(catalog, sample_table):
    with pytest.raises(ValueError, match="unknown method"):
        sample_to_table(catalog, "default.samp", "default.x",
                        fraction=0.1, method="quantum")


def test_materialize_stratified_without_column(catalog, sample_table):
    with pytest.raises(ValueError, match="stratify_by"):
        sample_to_table(catalog, "default.samp", "default.x",
                        fraction=0.1, method="stratified")


# --- sample stats ---


def test_sample_stats_comparison(catalog, sample_table):
    sample_to_table(catalog, "default.samp", "default.stat_copy",
                    fraction=0.1, method="systematic")
    full = sample_table.scan()
    samp = catalog.load_table("stat_copy").scan()
    result = sample_stats(full, samp)
    assert result["full_rows"] == 100
    assert result["sample_rows"] == 10
    assert result["coverage"] == 10.0
    # id and value are numeric; category is not
    assert set(result["column_comparison"]) == {"id", "value"}
    for comp in result["column_comparison"].values():
        assert "full_avg" in comp and "sample_avg" in comp

"""Format-config parity with the reference behavioral corpus
(reference tests/test_config.py:1-188, config.py:150-218).

Ports the assertion CONTENT — parquet default, set-time validation,
per-table overrides with qualified-name stripping, the config summary,
and the full resolution chain (override > table property > table
config > global config > default) including case-insensitive and
invalid-property fall-through — against the repo's ConfigManager.
The reference's 'vortex' format maps to the sanctioned ORC
substitution, so 'orc' plays its role here."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance.config import ConfigManager

KEY = "write.format.default"


@pytest.fixture
def cm(tmp_path):
    return ConfigManager(str(tmp_path / "config.json"))


@pytest.fixture
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "lake"))


# --- global format ---


def test_default_is_parquet(cm):
    assert cm.resolve_write_format(None) == "parquet"


def test_set_default_format(cm):
    cm.set_global(KEY, "orc")
    assert cm.resolve_write_format(None) == "orc"


def test_set_back_to_parquet(cm):
    cm.set_global(KEY, "orc")
    cm.set_global(KEY, "parquet")
    assert cm.resolve_write_format(None) == "parquet"


def test_set_invalid_format_raises(cm):
    with pytest.raises(ValueError, match="unsupported write format"):
        cm.set_global(KEY, "csv")


# --- per-table format ---


def test_table_format_defaults_to_global(cm):
    assert cm.resolve_write_format(None, "expenses") == "parquet"


def test_table_format_uses_global_when_set(cm):
    cm.set_global(KEY, "orc")
    assert cm.resolve_write_format(None, "expenses") == "orc"


def test_table_override(cm):
    cm.set_table("expenses", KEY, "orc")
    assert cm.resolve_write_format(None, "expenses") == "orc"


def test_table_override_scoped(cm):
    cm.set_global(KEY, "parquet")
    cm.set_table("expenses", KEY, "orc")
    assert cm.resolve_write_format(None, "expenses") == "orc"
    assert cm.resolve_write_format(None, "health") == "parquet"


def test_set_table_invalid_format_raises(cm):
    with pytest.raises(ValueError, match="unsupported write format"):
        cm.set_table("expenses", KEY, "avro")


def test_qualified_table_name_stripped(cm):
    cm.set_table("default.expenses", KEY, "orc")
    assert cm.resolve_write_format(None, "expenses") == "orc"
    assert cm.resolve_write_format(None, "default.expenses") == "orc"


# --- summary ---


def test_summary_empty(cm):
    summary = cm.summary()
    assert summary["default_format"] == "parquet"
    assert summary["table_overrides"] == {}


def test_summary_full(cm):
    cm.set_global(KEY, "orc")
    cm.set_table("expenses", KEY, "parquet")
    cm.set_table("health", KEY, "orc")
    summary = cm.summary()
    assert summary["default_format"] == "orc"
    assert summary["table_overrides"] == {"expenses": "parquet", "health": "orc"}


# --- resolve chain without table property ---


def test_override_takes_priority(cm):
    cm.set_table("expenses", KEY, "parquet")
    assert cm.resolve_write_format(None, "expenses", override="orc") == "orc"


def test_invalid_override_raises(cm):
    with pytest.raises(ValueError, match="unsupported write format"):
        cm.resolve_write_format(None, "expenses", override="xml")


def test_table_config_used(cm):
    cm.set_table("expenses", KEY, "orc")
    assert cm.resolve_write_format(None, "expenses") == "orc"


def test_global_fallback(cm):
    cm.set_global(KEY, "orc")
    assert cm.resolve_write_format(None, "expenses") == "orc"


# --- resolve chain with table property ---


@pytest.fixture
def prop_table(catalog):
    return catalog.create_table("expenses", [("id", "long")])


def test_override_highest_priority(cm, catalog, prop_table):
    prop_table.set_properties({KEY: "orc"})
    cm.set_table("expenses", KEY, "orc")
    assert cm.resolve_write_format(catalog, "expenses", override="parquet") == "parquet"


def test_table_property_beats_config(cm, catalog, prop_table):
    prop_table.set_properties({KEY: "orc"})
    cm.set_table("expenses", KEY, "parquet")
    assert cm.resolve_write_format(catalog, "expenses") == "orc"


def test_config_used_when_no_property(cm, catalog, prop_table):
    cm.set_table("expenses", KEY, "orc")
    assert cm.resolve_write_format(catalog, "expenses") == "orc"


def test_full_fallback_chain(cm, catalog, prop_table):
    assert cm.resolve_write_format(catalog, "expenses") == "parquet"
    cm.set_global(KEY, "orc")
    assert cm.resolve_write_format(catalog, "expenses") == "orc"


def test_case_insensitive_property(cm, catalog, prop_table):
    prop_table.set_properties({KEY: "ORC"})
    assert cm.resolve_write_format(catalog, "expenses") == "orc"


def test_invalid_property_ignored(cm, catalog, prop_table):
    prop_table.set_properties({KEY: "not_a_format"})
    cm.set_table("expenses", KEY, "orc")
    # invalid property falls through to the table config
    assert cm.resolve_write_format(catalog, "expenses") == "orc"

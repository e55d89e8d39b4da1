"""Query-cache + catalog-metadata parity with the reference corpus
(reference tests/test_query_cache.py:1-170, test_catalog_metadata.py:1-196).

Ports the assertion CONTENT — cache hit/miss with normalized SQL and
semicolon stripping, TTL expiry, table/all invalidation, hit/miss
stats with hit_rate, entry listing with hit counts, per-table policy;
column descriptions with messages, classification filters, glossary
add/search/list/remove, and schema enrichment with coverage counts —
against the repo's QueryCache and CatalogMetadata."""

from __future__ import annotations

import json
import time

import pytest

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance.queries_store import QueryCache
from iceberg_lakehouse_spark.governance.tagging import CatalogMetadata


@pytest.fixture
def qc(tmp_path):
    return QueryCache(str(tmp_path / "cache.json"))


@pytest.fixture
def md(tmp_path):
    return CatalogMetadata(str(tmp_path / "metadata.json"))


ROWS = [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]


# --- cache get/put ---


def test_cache_hit(qc):
    qc.put("SELECT * FROM t1", ROWS, ["t1"])
    result = qc.get("SELECT * FROM t1")
    assert result is not None
    assert len(result) == 2
    assert result[0]["id"] == 1


def test_cache_miss(qc):
    assert qc.get("SELECT * FROM nothing") is None


def test_ttl_expiration(tmp_path):
    qc = QueryCache(str(tmp_path / "c.json"), ttl_s=0)
    qc.put("SELECT 1", ROWS, ["t"])
    time.sleep(0.01)
    assert qc.get("SELECT 1") is None


def test_normalized_sql_matching(qc):
    qc.put("SELECT * FROM t1", ROWS, ["t1"])
    assert qc.get("select   *   from T1") is not None


def test_semicolons_stripped(qc):
    qc.put("SELECT * FROM t1", ROWS, ["t1"])
    assert qc.get("SELECT * FROM t1;") is not None


# --- invalidation ---


def test_invalidate_by_table(qc):
    qc.put("SELECT * FROM t1", ROWS, ["t1"])
    qc.put("SELECT * FROM t2", ROWS, ["t2"])
    assert qc.invalidate_table("t1") == 1
    assert qc.get("SELECT * FROM t1") is None
    assert qc.get("SELECT * FROM t2") is not None


def test_invalidate_all(qc):
    qc.put("SELECT * FROM t1", ROWS, ["t1"])
    qc.put("SELECT * FROM t2", ROWS, ["t2"])
    assert qc.invalidate_all() == 2
    assert qc.get("SELECT * FROM t1") is None
    assert qc.get("SELECT * FROM t2") is None


# --- stats ---


def test_stats_hits_misses(qc):
    qc.put("SELECT * FROM t1", ROWS, ["t1"])
    qc.get("SELECT * FROM t1")
    qc.get("SELECT * FROM t1")
    qc.get("SELECT * FROM miss")
    stats = qc.stats()
    assert stats["hits"] == 2
    assert stats["misses"] == 1
    assert stats["hit_rate"] == pytest.approx(66.67, abs=0.1)
    assert stats["total_entries"] == 1


def test_stats_empty(qc):
    stats = qc.stats()
    assert stats["total_entries"] == 0
    assert stats["hits"] == 0
    assert stats["misses"] == 0
    assert stats["hit_rate"] == 0.0


# --- listing ---


def test_list_queries(qc):
    qc.put("SELECT * FROM t1", ROWS, ["t1"])
    qc.put("SELECT * FROM t2", ROWS, ["t2"])
    entries = qc.list()
    assert len(entries) == 2
    sqls = [e["sql"] for e in entries]
    assert any("t1" in s for s in sqls)
    assert any("t2" in s for s in sqls)


def test_list_respects_limit(qc):
    for i in range(5):
        qc.put(f"SELECT {i} FROM t", ROWS, ["t"])
    assert len(qc.list(limit=3)) == 3


def test_list_shows_hit_count(qc):
    qc.put("SELECT * FROM t1", ROWS, ["t1"])
    qc.get("SELECT * FROM t1")
    qc.get("SELECT * FROM t1")
    entries = qc.list()
    assert entries[0]["hit_count"] == 2


# --- per-table policy ---


def test_disable_cache_for_table(qc):
    qc.set_policy("t1", False)
    assert qc.enabled_for(["t1"]) is False
    assert qc.enabled_for(["t2"]) is True


def test_enable_cache_for_table(qc):
    qc.set_policy("t1", False)
    qc.set_policy("t1", True)
    assert qc.enabled_for(["t1"]) is True


# --- column descriptions ---


def test_md_set_and_get(md):
    result = md.set_column_description("t", "col1", "A description")
    assert result["descriptions"]["col1"] == "A description"
    assert "description set" in result["message"].lower()


def test_md_multiple_columns(md):
    md.set_column_description("t", "a", "one")
    md.set_column_description("t", "b", "two")
    assert len(md.get_column_descriptions("t")["descriptions"]) == 2


def test_md_overwrite(md):
    md.set_column_description("t", "col", "Old")
    md.set_column_description("t", "col", "New")
    assert md.get_column_descriptions("t")["descriptions"]["col"] == "New"


def test_md_empty_table(md):
    assert md.get_column_descriptions("nothing")["descriptions"] == {}


# --- classifications ---


def test_md_classify_valid(md):
    result = md.classify_column("t", "email", "pii")
    assert result["classification"] == "pii"


def test_md_invalid_classification_raises(md):
    with pytest.raises(ValueError, match="invalid classification"):
        md.classify_column("t", "c", "made_up")


def test_md_get_by_table(md):
    md.classify_column("t1", "email", "pii")
    md.classify_column("t2", "name", "pii")
    results = md.classified_columns(table="t1")
    assert len(results) == 1
    assert results[0]["table"] == "default.t1"


def test_md_get_by_type(md):
    md.classify_column("t1", "email", "pii")
    md.classify_column("t1", "amount", "financial")
    md.classify_column("t2", "ssn", "pii")
    assert len(md.classified_columns(classification="pii")) == 2


# --- glossary ---


def test_md_glossary_add_and_search(md):
    md.add_glossary_term("MRR", "Monthly recurring revenue")
    results = md.search_glossary("mrr")
    assert len(results) == 1
    assert results[0]["term"] == "MRR"


def test_md_search_by_definition(md):
    md.add_glossary_term("MRR", "Monthly recurring revenue")
    assert len(md.search_glossary("recurring")) == 1


def test_md_search_by_alias(md):
    md.add_glossary_term("MRR", "Monthly recurring revenue",
                         aliases=["monthly rev"])
    assert len(md.search_glossary("monthly rev")) == 1


def test_md_list_glossary(md):
    md.add_glossary_term("A", "first")
    md.add_glossary_term("B", "second")
    assert len(md.list_glossary()) == 2


def test_md_remove_glossary(md):
    md.add_glossary_term("Gone", "soon")
    md.remove_glossary_term("Gone")
    assert md.list_glossary() == []


def test_md_remove_nonexistent(md):
    result = md.remove_glossary_term("never")
    assert "not found" in result["message"].lower()


# --- schema enrichment ---


@pytest.fixture
def enriched_table(spark, tmp_path, md):
    catalog = LakehouseCatalog(spark, str(tmp_path / "lake"))
    t = catalog.create_table(
        "users", [("id", "long"), ("email", "string"), ("score", "double")])
    md.set_column_description("default.users", "email", "User email address")
    md.set_column_description("default.users", "id", "Primary key")
    md.classify_column("default.users", "email", "pii")
    md.classify_column("default.users", "id", "public")
    return t


def test_md_enrich_includes_descriptions(md, enriched_table):
    result = md.enrich_schema(enriched_table)
    email = next(f for f in result["fields"] if f["name"] == "email")
    assert email["description"] == "User email address"


def test_md_enrich_includes_classifications(md, enriched_table):
    result = md.enrich_schema(enriched_table)
    email = next(f for f in result["fields"] if f["name"] == "email")
    assert email["classification"] == "pii"


def test_md_enrich_includes_glossary_matches(md, enriched_table):
    md.add_glossary_term("email", "electronic mail address")
    result = md.enrich_schema(enriched_table)
    email = next(f for f in result["fields"] if f["name"] == "email")
    assert "email" in email["glossary_matches"]


def test_md_enrich_counts(md, enriched_table):
    result = md.enrich_schema(enriched_table)
    assert result["total_fields"] == 3
    assert result["described_fields"] == 2
    assert result["classified_fields"] == 2


# --- storage format ---


def test_md_json_structure(md, tmp_path):
    md.set_column_description("t", "c", "desc")
    md.classify_column("t", "c", "pii")
    data = json.loads((tmp_path / "metadata.json").read_text())
    assert "column_descriptions" in data
    assert "classifications" in data

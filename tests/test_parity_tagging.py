"""Tagging parity with the reference behavioral corpus
(reference tests/test_tagging.py:1-269, tagging.py:40-269).

Ports the assertion CONTENT — tag normalization/dedup/sort, blank-tag
filtering, untag no-ops, exact-tag search, description defaults and
persistence across tag mutations, bookmark lifecycle + messages,
multi-modal search with match_type/bookmarked, and the JSON storage
format — against the repo's TagManager."""

from __future__ import annotations

import json

import pytest

from iceberg_lakehouse_spark.governance.tagging import TagManager


@pytest.fixture
def tm(tmp_path):
    return TagManager(str(tmp_path / "table_metadata.json"))


# --- tag ---


def test_add_tags(tm):
    result = tm.tag("expenses", ["finance", "pii"])
    assert result["table"] == "default.expenses"
    assert "finance" in result["tags"]
    assert "pii" in result["tags"]


def test_tags_normalized_lowercase(tm):
    result = tm.tag("expenses", ["Finance", "PII"])
    assert "finance" in result["tags"]
    assert "pii" in result["tags"]


def test_tags_accumulate(tm):
    tm.tag("expenses", ["finance"])
    result = tm.tag("expenses", ["pii"])
    assert "finance" in result["tags"]
    assert "pii" in result["tags"]


def test_duplicate_tags_deduplicated(tm):
    tm.tag("expenses", ["finance"])
    result = tm.tag("expenses", ["finance", "pii"])
    assert result["tags"].count("finance") == 1


def test_tags_sorted(tm):
    result = tm.tag("expenses", ["zebra", "alpha", "middle"])
    assert result["tags"] == ["alpha", "middle", "zebra"]


def test_empty_tags_ignored(tm):
    result = tm.tag("expenses", ["finance", "", "  "])
    assert result["tags"] == ["finance"]


def test_bare_name_normalized(tm):
    tm.tag("expenses", ["test"])
    assert "test" in tm.get_tags("expenses")
    assert "test" in tm.get_tags("default.expenses")


# --- untag ---


def test_remove_tags(tm):
    tm.tag("expenses", ["finance", "pii", "old"])
    result = tm.untag("expenses", ["pii", "old"])
    assert result["tags"] == ["finance"]


def test_remove_nonexistent_tag(tm):
    tm.tag("expenses", ["finance"])
    result = tm.untag("expenses", ["nonexistent"])
    assert result["tags"] == ["finance"]


# --- get_tags ---


def test_get_tags_existing(tm):
    tm.tag("expenses", ["finance"])
    assert tm.get_tags("expenses") == ["finance"]


def test_get_tags_none(tm):
    assert tm.get_tags("no_table") == []


# --- search_by_tag ---


def test_search_by_tag_finds_tables(tm):
    tm.tag("expenses", ["finance"])
    tm.tag("revenue", ["finance"])
    tm.tag("users", ["pii"])
    result = tm.search_by_tag("finance")
    assert "default.expenses" in result
    assert "default.revenue" in result
    assert "default.users" not in result


def test_search_by_tag_no_matches(tm):
    assert tm.search_by_tag("nonexistent") == []


def test_search_by_tag_sorted(tm):
    tm.tag("zebra", ["test"])
    tm.tag("alpha", ["test"])
    assert tm.search_by_tag("test") == ["default.alpha", "default.zebra"]


# --- descriptions ---


def test_description_set_and_get(tm):
    tm.set_description("expenses", "Monthly expense reports")
    assert tm.get_description("expenses") == "Monthly expense reports"


def test_description_overwrite(tm):
    tm.set_description("expenses", "Old")
    tm.set_description("expenses", "New")
    assert tm.get_description("expenses") == "New"


def test_no_description_is_empty_string(tm):
    assert tm.get_description("no_table") == ""


def test_description_preserved_with_tags(tm):
    tm.set_description("expenses", "My table")
    tm.tag("expenses", ["finance"])
    assert tm.get_description("expenses") == "My table"


# --- bookmarks ---


def test_bookmark_message(tm):
    result = tm.bookmark("expenses")
    assert "bookmarked" in result["message"].lower()


def test_unbookmark_message(tm):
    tm.bookmark("expenses")
    result = tm.unbookmark("expenses")
    assert "unbookmarked" in result["message"].lower()


def test_list_bookmarks(tm):
    tm.bookmark("expenses")
    tm.bookmark("revenue")
    bookmarks = tm.bookmarks()
    assert "default.expenses" in bookmarks
    assert "default.revenue" in bookmarks


def test_list_bookmarks_empty(tm):
    assert tm.bookmarks() == []


def test_unbookmark_removes_from_list(tm):
    tm.bookmark("expenses")
    tm.unbookmark("expenses")
    assert tm.bookmarks() == []


def test_bookmark_preserved_with_tags(tm):
    tm.bookmark("expenses")
    tm.tag("expenses", ["finance"])
    assert "default.expenses" in tm.bookmarks()


# --- search ---


def test_search_by_name(tm):
    tm.tag("expenses", ["finance"])
    results = tm.search("expense")
    assert len(results) == 1
    assert results[0]["table"] == "default.expenses"
    assert "name" in results[0]["match_type"]


def test_search_by_tag_match_type(tm):
    tm.tag("revenue", ["finance"])
    results = tm.search("finance")
    assert len(results) == 1
    assert "tag" in results[0]["match_type"]


def test_search_by_description_match_type(tm):
    tm.set_description("users", "User accounts and profiles")
    results = tm.search("profiles")
    assert len(results) == 1
    assert "description" in results[0]["match_type"]


def test_search_multiple_matches(tm):
    tm.tag("expenses", ["finance"])
    tm.tag("revenue", ["finance"])
    assert len(tm.search("finance")) == 2


def test_search_no_matches(tm):
    assert tm.search("nonexistent") == []


def test_search_with_catalog_tables(tm):
    results = tm.search("expense", catalog_tables=["default.expenses"])
    assert any("expense" in r["table"].lower() for r in results)


def test_search_includes_bookmark_status(tm):
    tm.tag("expenses", ["finance"])
    tm.bookmark("expenses")
    results = tm.search("expense")
    assert results[0]["bookmarked"] is True


def test_search_case_insensitive(tm):
    tm.tag("Expenses", ["FINANCE"])
    assert len(tm.search("finance")) == 1


# --- storage format ---


def test_json_structure(tm, tmp_path):
    tm.tag("expenses", ["finance", "pii"])
    tm.set_description("expenses", "My table")
    tm.bookmark("expenses")
    data = json.loads((tmp_path / "table_metadata.json").read_text())
    assert "default.expenses" in data
    entry = data["default.expenses"]
    assert entry["tags"] == ["finance", "pii"]
    assert entry["description"] == "My table"
    assert entry["bookmarked"] is True
    assert "updated_at" in entry

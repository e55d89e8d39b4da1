"""Optimizer-advisor parity with the reference behavioral corpus
(reference tests/test_optimizer.py:1-205, optimizer.py:1-317).

Ports the assertion CONTENT — SQL-parsing heuristics, pattern
analysis over seeded history, partition/materialization suggestion
shapes, report scoring, and cost estimation vocabulary — against the
repo's functional advisor API (history list + stats dict in, dict
out; no hidden store)."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.governance.advisor import (
    analyze_patterns,
    estimate_cost,
    extract_filter_columns,
    extract_query_tables,
    has_aggregation,
    has_join,
    optimization_report,
    suggest_matviews,
    suggest_partitioning,
)


@pytest.fixture
def seeded_history():
    """The reference's 12-entry seed (test_optimizer.py:27-45),
    duration_ms carried as duration_s (repo unit)."""
    entries = [
        ("SELECT * FROM orders WHERE status = 'active'", 100, 50),
        ("SELECT * FROM orders WHERE status = 'active'", 100, 45),
        ("SELECT * FROM orders WHERE region = 'US'", 80, 30),
        ("SELECT id, name FROM customers", 200, 20),
        ("SELECT id, name FROM customers", 200, 25),
        ("SELECT o.id, c.name FROM orders o JOIN customers c ON o.cid = c.id", 50, 200),
        ("SELECT region, SUM(amount) FROM orders GROUP BY region", 5, 150),
        ("SELECT region, SUM(amount) FROM orders GROUP BY region", 5, 160),
        ("SELECT region, SUM(amount) FROM orders GROUP BY region", 5, 140),
        ("SELECT COUNT(*) FROM orders WHERE created_at > '2024-01-01'", 1, 500),
        ("SELECT * FROM orders", 200, 10),
        ("SELECT * FROM orders WHERE id > 5", 50, 15),
    ]
    return [
        {"sql": sql, "rows": rows, "duration_s": dur / 1000.0}
        for sql, rows, dur in entries
    ]


@pytest.fixture
def orders_stats():
    """Stats shaped like governance.stats.compute_table_stats output:
    20 rows, status 2-distinct, region 3-distinct (test_optimizer.py:48-56)."""
    return {
        "orders": {
            "row_count": 20,
            "columns": {
                "id": {"distinct": 20},
                "status": {"distinct": 2},
                "region": {"distinct": 3},
                "amount": {"distinct": 20},
            },
        }
    }


# --- SQL parsing helpers (reference TestSqlParsing) ---


def test_extract_tables_from():
    assert "orders" in extract_query_tables("SELECT * FROM orders")


def test_extract_tables_join():
    tables = extract_query_tables(
        "SELECT * FROM orders o JOIN customers c ON o.id = c.id")
    assert "orders" in tables
    assert "customers" in tables


def test_extract_tables_qualified():
    assert "default.orders" in extract_query_tables("SELECT * FROM default.orders")


def test_extract_filters():
    filters = extract_filter_columns(
        "SELECT * FROM t WHERE status = 'active' AND region IN ('US')")
    assert "status" in filters
    assert "region" in filters


def test_extract_filters_no_where():
    assert extract_filter_columns("SELECT * FROM t") == []


def test_extract_filters_excludes_keywords_and_handles_neq_is():
    filters = extract_filter_columns(
        "SELECT * FROM t WHERE a != 1 AND b <> 2 AND c IS NULL")
    assert filters == ["a", "b", "c"]


def test_has_aggregation():
    assert has_aggregation("SELECT COUNT(*) FROM t") is True
    assert has_aggregation("SELECT region, SUM(x) FROM t GROUP BY region") is True
    assert has_aggregation("SELECT * FROM t") is False


def test_has_join():
    assert has_join("SELECT * FROM a JOIN b ON a.id = b.id") is True
    assert has_join("SELECT * FROM a") is False


# --- analyze_patterns (reference TestAnalyzePatterns) ---


def test_empty_history():
    result = analyze_patterns([])
    assert result["total_queries"] == 0
    assert "no query history" in result["message"].lower()


def test_frequent_tables(seeded_history):
    result = analyze_patterns(seeded_history)
    assert result["total_queries"] == 12
    assert "orders" in [t["table"] for t in result["frequent_tables"]]


def test_frequent_filters(seeded_history):
    result = analyze_patterns(seeded_history)
    assert "status" in [f["column"] for f in result["frequent_filters"]]


def test_repeated_queries(seeded_history):
    result = analyze_patterns(seeded_history)
    assert len(result["repeated_queries"]) >= 1
    # The aggregation query was run 3 times
    patterns = {rq["sql_pattern"] for rq in result["repeated_queries"]}
    assert any("SUM" in p for p in patterns)
    agg = [rq for rq in result["repeated_queries"] if "SUM" in rq["sql_pattern"]]
    assert agg[0]["count"] == 3


def test_slow_queries(seeded_history):
    # The 500ms query is above p90
    result = analyze_patterns(seeded_history)
    assert len(result["slow_queries"]) >= 1
    assert any(s["duration_s"] == 0.5 for s in result["slow_queries"])


# --- suggest_partitioning (reference TestSuggestPartitions) ---


def test_no_suggestions_empty_history(orders_stats):
    assert suggest_partitioning([], orders_stats) == []


def test_suggestions_with_history(seeded_history, orders_stats):
    result = suggest_partitioning(seeded_history, orders_stats)
    assert result, "status (2 distinct / 20 rows) must be suggested"
    cols = [s["column"] for s in result]
    assert any(c in cols for c in ["status", "region"])
    for s in result:
        assert s["benefit"] in ("high", "medium", "low")
        assert "rationale" in s
        assert "unique_values" in s and "filter_frequency" in s


def test_partitioned_column_skipped(seeded_history, orders_stats):
    result = suggest_partitioning(
        seeded_history, orders_stats,
        current_partition_fields={"orders": ["status", "region"]})
    assert all(s["column"] not in ("status", "region") for s in result)


def test_benefit_vocabulary(seeded_history):
    # distinct/rows < 0.1 → high benefit (reference optimizer.py:183)
    stats = {"orders": {"row_count": 1000, "columns": {"status": {"distinct": 3}}}}
    result = suggest_partitioning(seeded_history, stats)
    assert result and result[0]["benefit"] == "high"
    # 0.1 ≤ ratio < 0.5 → medium
    stats = {"orders": {"row_count": 20, "columns": {"status": {"distinct": 5}}}}
    assert suggest_partitioning(seeded_history, stats)[0]["benefit"] == "medium"


# --- suggest_matviews (reference TestSuggestMaterializations) ---


def test_no_matview_suggestions_empty():
    assert suggest_matviews([]) == []


def test_matview_suggestions_with_repeated_agg(seeded_history):
    result = suggest_matviews(seeded_history)
    # The GROUP BY query was run 3 times
    assert len(result) >= 1
    assert result[0]["has_aggregation"] is True
    assert result[0]["run_count"] >= 2
    assert "orders" in result[0]["tables_involved"]
    assert "rationale" in result[0]


def test_matview_requires_agg_or_join():
    # Repeated plain selects are NOT materialization candidates
    history = [{"sql": "SELECT * FROM t", "duration_s": 0.01}] * 3
    assert suggest_matviews(history) == []


# --- optimization_report (reference TestOptimizationReport) ---


def test_report_empty(orders_stats):
    result = optimization_report([], orders_stats)
    assert result["optimization_score"] == 100  # no issues
    assert result["total_suggestions"] == 0


def test_report_with_history(seeded_history, orders_stats):
    result = optimization_report(seeded_history, orders_stats)
    assert "query_patterns" in result
    assert "partition_suggestions" in result
    assert "materialization_suggestions" in result
    assert 0 <= result["optimization_score"] <= 100
    # issues exist (partition + matview + slow) → score dropped
    assert result["optimization_score"] < 100
    assert result["total_suggestions"] == (
        len(result["partition_suggestions"])
        + len(result["materialization_suggestions"]))


# --- estimate_cost (reference TestEstimateQueryCost) ---


def test_cost_simple_select(orders_stats):
    result = estimate_cost("SELECT * FROM orders", orders_stats)
    assert result["complexity"] == "simple"
    assert result["has_filter"] is False
    assert result["total_source_rows"] >= 1
    assert result["estimated_rows_scanned"] == result["total_source_rows"]


def test_cost_filtered_query(orders_stats):
    result = estimate_cost(
        "SELECT * FROM orders WHERE status = 'active'", orders_stats)
    assert result["has_filter"] is True
    assert result["estimated_rows_scanned"] < result["total_source_rows"]


def test_cost_join_query(orders_stats):
    result = estimate_cost(
        "SELECT * FROM orders JOIN customers ON orders.id = customers.id",
        orders_stats)
    assert result["has_join"] is True
    assert result["complexity"] in ("moderate", "complex")


def test_cost_complex_query(orders_stats):
    result = estimate_cost(
        "SELECT region, SUM(amount) FROM orders JOIN ref ON orders.id = ref.id "
        "GROUP BY region", orders_stats)
    assert result["complexity"] == "complex"
    assert result["has_aggregation"] is True
    assert result["has_join"] is True
    assert result["tables_involved"] and "message" in result

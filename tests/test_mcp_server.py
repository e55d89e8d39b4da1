"""MCP server tests: the JSON-RPC surface an LLM client drives
(reference tests drive server.py tools the same way)."""

from __future__ import annotations

import json

import pytest

from iceberg_lakehouse_spark.server import LakehouseServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    return LakehouseServer(home=str(tmp_path_factory.mktemp("mcp_home")))


def rpc(server, method, params=None, rid=1):
    return server.handle_request(
        {"jsonrpc": "2.0", "id": rid, "method": method, "params": params or {}}
    )


def call(server, name, args):
    resp = rpc(server, "tools/call", {"name": name, "arguments": args})
    result = resp["result"]
    payload = json.loads(result["content"][0]["text"]) if not result["isError"] else None
    return result["isError"], payload, result


def test_initialize_and_list(server):
    resp = rpc(server, "initialize")
    assert resp["result"]["serverInfo"]["name"] == "iceberg-lakehouse-spark"
    assert rpc(server, "notifications/initialized") is None
    tools = rpc(server, "tools/list")["result"]["tools"]
    names = {t["name"] for t in tools}
    assert len(tools) >= 30
    assert {"query", "insert", "upsert", "snapshot_diff", "near_dup_docs",
            "knn_search", "create_matview", "incremental_read"} <= names
    for t in tools:
        assert t["inputSchema"]["type"] == "object"


def test_unknown_method_and_tool(server):
    resp = rpc(server, "bogus/method")
    assert resp["error"]["code"] == -32601
    is_err, _p, result = call(server, "no_such_tool", {})
    assert is_err and "unknown tool" in result["content"][0]["text"]


def test_full_crud_flow_through_rpc(server):
    is_err, p, _ = call(server, "create_table", {
        "table": "mcp_t", "schema": [["id", "long"], ["name", "string"], ["v", "double"]],
    })
    assert not is_err
    is_err, p, _ = call(server, "insert", {
        "table": "mcp_t",
        "rows": [{"id": 1, "name": "a", "v": 1.5}, {"id": 2, "name": "b", "v": 2.5}],
    })
    assert not is_err and p == {"inserted": 2}
    is_err, p, _ = call(server, "query", {"sql": "SELECT sum(v) AS s FROM mcp_t"})
    assert not is_err and p[0]["s"] == 4.0
    is_err, p, _ = call(server, "upsert", {
        "table": "mcp_t", "rows": [{"id": 2, "name": "b2", "v": 9.0}],
        "key_columns": ["id"],
    })
    assert p == {"updated": 1, "inserted": 0}
    is_err, p, _ = call(server, "list_snapshots", {"table": "mcp_t"})
    assert len(p) == 2
    is_err, p, _ = call(server, "snapshot_diff", {
        "table": "mcp_t", "from_snapshot": 1, "to_snapshot": 2,
    })
    assert [r["name"] for r in p["added"]] == ["b2"]
    # time-travel query through rpc
    is_err, p, _ = call(server, "query_as_of", {
        "sql": "SELECT name FROM mcp_t ORDER BY id", "table_name": "mcp_t", "as_of": "1",
    })
    assert [r["name"] for r in p] == ["a", "b"]


def test_governance_tools_through_rpc(server):
    call(server, "add_validation_rule", {
        "table": "mcp_t", "rule_type": "range", "column": "v", "min_value": 0,
    })
    is_err, p, _ = call(server, "validate_table", {"table": "mcp_t"})
    assert not is_err and p == []
    call(server, "add_masking_policy", {"table": "mcp_t", "column": "name", "strategy": "redact"})
    is_err, p, _ = call(server, "query_masked", {
        "sql": "SELECT id, name FROM mcp_t ORDER BY id", "table": "mcp_t",
    })
    assert p[0]["name"] == "***"
    is_err, p, _ = call(server, "profile_table", {"table": "mcp_t"})
    assert p["row_count"] == 2
    is_err, p, _ = call(server, "dashboard", {})
    assert p["table_count"] >= 1
    is_err, p, _ = call(server, "incremental_read", {
        "table": "default.mcp_t", "pipeline": "etl", "advance": True,
    })
    assert p["info"]["mode"] == "full" and len(p["rows"]) == 2
    is_err, p, _ = call(server, "incremental_read", {
        "table": "default.mcp_t", "pipeline": "etl",
    })
    assert p["info"]["mode"] == "none" and p["rows"] == []


def test_tool_error_surfaces_as_mcp_error(server):
    is_err, _p, result = call(server, "query", {"sql": "SELECT * FROM nope"})
    assert is_err
    assert "TABLE_OR_VIEW_NOT_FOUND" in result["content"][0]["text"]

"""MCP server — LLM-tool surface over the engine (reference server.py:
5,299 LoC / 155 tools; this is the same protocol surface with a
representative tool set over every module).

No `mcp` SDK in this environment, so the protocol layer is implemented
directly: JSON-RPC 2.0 over newline-delimited stdio with the MCP
methods `initialize`, `tools/list`, `tools/call`. The handler registry
is plain Python — tests drive `handle_request` without a transport.

Run: python -m iceberg_lakehouse_spark.server
"""

from __future__ import annotations

import json
import os
import sys
from typing import Any, Callable

PROTOCOL_VERSION = "2024-11-05"
SERVER_INFO = {"name": "iceberg-lakehouse-spark", "version": "0.1.0"}


def _tool(name: str, description: str, properties: dict, required: list[str]):
    return {
        "name": name,
        "description": description,
        "inputSchema": {
            "type": "object",
            "properties": properties,
            "required": required,
        },
    }


_S = {"type": "string"}
_I = {"type": "integer"}
_N = {"type": "number"}
_B = {"type": "boolean"}


class LakehouseServer:
    def __init__(self, home: str | None = None):
        self.home = home or os.environ.get(
            "LAKEHOUSE_HOME", os.path.expanduser("~/.lakehouse_spark")
        )
        os.makedirs(self.home, exist_ok=True)
        from .catalog import LakehouseCatalog
        from .plans.engine import QueryEngine
        from .session import get_spark

        self.spark = get_spark("lakehouse-mcp")
        self.catalog = LakehouseCatalog(self.spark, os.path.join(self.home, "warehouse"))
        self.engine = QueryEngine(self.catalog)
        self._tools: dict[str, tuple[dict, Callable[..., Any]]] = {}
        self._register_tools()

    def _store(self, name: str) -> str:
        return os.path.join(self.home, name)

    # ------------------------------------------------------------------
    # tool registry
    # ------------------------------------------------------------------

    def _add(self, spec: dict, fn: Callable[..., Any]) -> None:
        self._tools[spec["name"]] = (spec, fn)

    def _register_tools(self) -> None:  # noqa: PLR0915 — flat registry
        from .operators import crud
        c, eng = self.catalog, self.engine

        def rows_of(df, cap=1000):
            return [r.asDict(recursive=True) for r in df.limit(cap).collect()]

        # -- query / tables ------------------------------------------------
        self._add(
            _tool("query", "Run SQL over all lakehouse tables",
                  {"sql": _S, "max_rows": _I}, ["sql"]),
            lambda sql, max_rows=100: rows_of(eng.execute(sql, max_rows=max_rows)),
        )
        self._add(
            _tool("query_as_of", "Run SQL with one table bound to a historic snapshot",
                  {"sql": _S, "table_name": _S, "as_of": _S}, ["sql", "table_name", "as_of"]),
            lambda sql, table_name, as_of: rows_of(eng.execute_as_of(sql, table_name, as_of)),
        )
        self._add(
            _tool("list_tables", "List all tables", {}, []),
            lambda: c.list_tables(),
        )
        self._add(
            _tool("describe_table", "Schema, partitioning, properties, file stats",
                  {"table": _S}, ["table"]),
            lambda table: {
                "schema": c.load_table(table).meta()["schema"],
                "partition_spec": c.load_table(table).meta().get("partition_spec", []),
                "properties": c.load_table(table).properties(),
                "stats": c.load_table(table).file_stats(),
            },
        )
        self._add(
            _tool("create_table", "Create a table",
                  {"table": _S, "schema": {"type": "array"}, "partition_by": {"type": "array"}},
                  ["table", "schema"]),
            lambda table, schema, partition_by=None: (
                c.create_table(table, [tuple(x) for x in schema], partition_by=partition_by)
                and {"created": table}
            ),
        )
        self._add(
            _tool("drop_table", "Drop a table", {"table": _S}, ["table"]),
            lambda table: (c.drop_table(table), {"dropped": table})[1],
        )

        # -- CRUD ----------------------------------------------------------
        self._add(
            _tool("insert", "Insert rows (list of objects)",
                  {"table": _S, "rows": {"type": "array"}}, ["table", "rows"]),
            lambda table, rows: {"inserted": crud.insert_rows(c.load_table(table), rows)},
        )
        self._add(
            _tool("update", "Update rows matching a SQL filter",
                  {"table": _S, "filter": _S, "updates": {"type": "object"}},
                  ["table", "filter", "updates"]),
            lambda table, filter, updates: {
                "updated": crud.update_rows(c.load_table(table), filter, updates)
            },
        )
        self._add(
            _tool("delete", "Delete rows matching a SQL filter",
                  {"table": _S, "filter": _S}, ["table", "filter"]),
            lambda table, filter: {"deleted": crud.delete_rows(c.load_table(table), filter)},
        )
        self._add(
            _tool("upsert", "Upsert rows by key columns",
                  {"table": _S, "rows": {"type": "array"}, "key_columns": {"type": "array"}},
                  ["table", "rows", "key_columns"]),
            lambda table, rows, key_columns: crud.upsert_rows(
                c.load_table(table), rows, key_columns
            ),
        )

        # -- snapshots / time travel --------------------------------------
        self._add(
            _tool("list_snapshots", "Snapshot history", {"table": _S}, ["table"]),
            lambda table: [s.to_json() for s in c.load_table(table).snapshots()],
        )
        self._add(
            _tool("snapshot_diff", "Row diff between two snapshots",
                  {"table": _S, "from_snapshot": _I, "to_snapshot": _I},
                  ["table", "from_snapshot", "to_snapshot"]),
            lambda table, from_snapshot, to_snapshot: {
                k: rows_of(v)
                for k, v in c.load_table(table)
                .snapshot_diff(from_snapshot, to_snapshot)
                .items()
            },
        )
        self._add(
            _tool("rollback", "Restore table to a snapshot (new restoring commit)",
                  {"table": _S, "snapshot_id": _I}, ["table", "snapshot_id"]),
            lambda table, snapshot_id: c.load_table(table)
            .rollback(snapshot_id=snapshot_id)
            .to_json(),
        )
        self._add(
            _tool("expire_snapshots", "Expire old snapshots",
                  {"table": _S, "retain_last": _I, "dry_run": _B}, ["table"]),
            lambda table, retain_last=None, dry_run=False: c.load_table(table)
            .expire_snapshots(retain_last=retain_last, dry_run=dry_run),
        )

        # -- maintenance ---------------------------------------------------
        self._add(
            _tool("compact", "Compact small files", {"table": _S}, ["table"]),
            lambda table: c.load_table(table).compact(),
        )
        self._add(
            _tool("cleanup_orphans", "List/delete unreferenced files",
                  {"table": _S, "delete": _B}, ["table"]),
            lambda table, delete=False: {
                "orphans": c.load_table(table).cleanup_orphans(dry_run=not delete)
            },
        )
        self._add(
            _tool("partition_stats", "Per-partition file count + bytes",
                  {"table": _S}, ["table"]),
            lambda table: c.load_table(table).partition_stats(),
        )

        # -- import / export ----------------------------------------------
        from .sources import io as lio

        self._add(
            _tool("import_file", "Import CSV/JSON/NDJSON/Parquet/ORC into a table",
                  {"path": _S, "table": _S, "file_format": _S, "if_exists": _S},
                  ["path", "table"]),
            lambda path, table, file_format=None, if_exists="fail": lio.import_file(
                c, path, table, file_format, if_exists
            ),
        )
        self._add(
            _tool("export_table", "Export a table to a file",
                  {"table": _S, "path": _S, "file_format": _S, "where": _S,
                   "columns": {"type": "array"}, "limit": _I},
                  ["table", "path"]),
            lambda table, path, file_format="csv", where=None, columns=None, limit=None:
                lio.export_table(c.load_table(table), path, file_format,
                                 where=where, columns=columns, limit=limit),
        )

        # -- stats / profile / quality ------------------------------------
        from .governance.stats import StatsCache, compute_table_stats, quality_score

        stats_cache = StatsCache(self._store("stats.json"))
        self._add(
            _tool("profile_table", "Full table profile (cached by snapshot)",
                  {"table": _S, "refresh": _B}, ["table"]),
            lambda table, refresh=False: stats_cache.get(c.load_table(table), refresh=refresh),
        )
        self._add(
            _tool("quality_score", "Composite quality score", {"table": _S}, ["table"]),
            lambda table: quality_score(compute_table_stats(c.load_table(table))),
        )

        # -- validation / masking -----------------------------------------
        from .governance.masking import MaskingManager
        from .governance.validation import ValidationManager

        vm = ValidationManager(self._store("validation.json"))
        mm = MaskingManager(self._store("masking.json"))
        self._add(
            _tool("add_validation_rule", "Add a validation rule",
                  {"table": _S, "rule_type": _S, "column": _S, "min_value": _N,
                   "max_value": _N, "pattern": _S, "expression": _S},
                  ["table", "rule_type"]),
            lambda table, rule_type, **kw: vm.add_rule(table, rule_type, **kw),
        )
        self._add(
            _tool("validate_table", "Run all rules against current data",
                  {"table": _S}, ["table"]),
            lambda table: vm.validate(
                table.split(".", 1)[-1], c.load_table(table).scan()
            ),
        )
        self._add(
            _tool("add_masking_policy", "Add a column masking policy",
                  {"table": _S, "column": _S, "strategy": _S, "expression": _S},
                  ["table", "column", "strategy"]),
            lambda table, column, strategy, expression=None: mm.add_policy(
                table, column, strategy, expression=expression
            ),
        )
        self._add(
            _tool("query_masked", "Run SQL with masking policies applied",
                  {"sql": _S, "table": _S}, ["sql"]),
            lambda sql, table=None: rows_of(mm.apply(eng.execute(sql), table)),
        )

        # -- views / matviews / pipelines ---------------------------------
        from .governance.lineage import LineageManager
        from .governance.views import MatviewManager, PipelineManager, ViewManager

        lineage = LineageManager(self._store("lineage.json"))
        views = ViewManager(self._store("views.json"), eng)
        matviews = MatviewManager(self._store("matviews.json"), c, eng, lineage=lineage)
        pipelines = PipelineManager(self._store("pipelines.json"), c, eng, lineage=lineage)
        self._add(
            _tool("create_view", "Store a named SQL view",
                  {"name": _S, "sql": _S}, ["name", "sql"]),
            lambda name, sql: views.create(name, sql),
        )
        self._add(
            _tool("query_view", "Execute a stored view", {"name": _S}, ["name"]),
            lambda name: rows_of(views.query(name)),
        )
        self._add(
            _tool("create_matview", "Materialize a SQL result as a backed table",
                  {"name": _S, "sql": _S}, ["name", "sql"]),
            lambda name, sql: matviews.create(name, sql),
        )
        self._add(
            _tool("refresh_matview", "Refresh a materialized view", {"name": _S}, ["name"]),
            lambda name: matviews.refresh(name),
        )
        self._add(
            _tool("matview_freshness", "Staleness vs source snapshots",
                  {"name": _S}, ["name"]),
            lambda name: matviews.freshness(name),
        )
        self._add(
            _tool("create_pipeline", "Create a multi-step SQL pipeline",
                  {"name": _S, "steps": {"type": "array"}}, ["name", "steps"]),
            lambda name, steps: pipelines.create(name, steps),
        )
        self._add(
            _tool("run_pipeline", "Run a pipeline", {"name": _S}, ["name"]),
            lambda name: pipelines.run(name),
        )
        self._add(
            _tool("lineage", "Upstream/downstream lineage of a table",
                  {"table": _S, "direction": _S}, ["table"]),
            lambda table, direction="downstream": (
                lineage.downstream(table) if direction == "downstream"
                else lineage.upstream(table)
            ),
        )

        # -- incremental / CDC --------------------------------------------
        from .governance.cdc import capture_changes
        from .governance.incremental import WatermarkStore, incremental_read

        wm = WatermarkStore(self._store("watermarks.json"))

        def _incremental(table, pipeline, advance=False):
            t = c.load_table(table)
            df, info = incremental_read(t, wm, pipeline)
            rows = rows_of(df)
            if advance and t.current_snapshot():
                wm.set(pipeline, table, t.current_snapshot().snapshot_id, len(rows))
            return {"info": info, "rows": rows}

        self._add(
            _tool("incremental_read", "New rows since the pipeline watermark",
                  {"table": _S, "pipeline": _S, "advance": _B}, ["table", "pipeline"]),
            _incremental,
        )
        self._add(
            _tool("capture_changes", "CDC classification between snapshots",
                  {"table": _S, "from_snapshot": _I, "to_snapshot": _I,
                   "key_columns": {"type": "array"}},
                  ["table", "from_snapshot", "to_snapshot"]),
            lambda table, from_snapshot, to_snapshot, key_columns=None: capture_changes(
                c.load_table(table), from_snapshot, to_snapshot, key_columns
            ),
        )

        # -- LLM-pipeline operators ---------------------------------------
        from .functions import dedup_text as dt
        from .functions import similarity as fsim

        self._add(
            _tool("near_dup_docs", "MinHash+LSH near-duplicate pairs in a table",
                  {"table": _S, "id_column": _S, "text_column": _S,
                   "threshold": _N}, ["table", "id_column", "text_column"]),
            lambda table, id_column, text_column, threshold=0.7: rows_of(
                dt.minhash_dedup(
                    c.load_table(table).scan(), id_column, text_column,
                    threshold=threshold,
                )
            ),
        )
        self._add(
            _tool("knn_search", "Brute-force cosine top-k over an embedding column",
                  {"table": _S, "id_column": _S, "vector_column": _S,
                   "query_vector": {"type": "array"}, "k": _I},
                  ["table", "id_column", "vector_column", "query_vector"]),
            lambda table, id_column, vector_column, query_vector, k=10: rows_of(
                fsim.knn_bruteforce(
                    c.load_table(table).scan(), id_column, vector_column,
                    query_vector, k=k,
                )
            ),
        )

        # -- dashboard -----------------------------------------------------
        from .governance.advisor import dashboard as dash

        self._add(
            _tool("dashboard", "All-tables health overview", {}, []),
            lambda: dash(c, stats_cache),
        )

    # ------------------------------------------------------------------
    # JSON-RPC / MCP protocol
    # ------------------------------------------------------------------

    def handle_request(self, req: dict) -> dict | None:
        rid = req.get("id")
        method = req.get("method")
        try:
            if method == "initialize":
                result = {
                    "protocolVersion": PROTOCOL_VERSION,
                    "capabilities": {"tools": {}},
                    "serverInfo": SERVER_INFO,
                }
            elif method == "notifications/initialized":
                return None
            elif method == "tools/list":
                result = {"tools": [spec for spec, _fn in self._tools.values()]}
            elif method == "tools/call":
                params = req.get("params", {})
                name = params.get("name")
                args = params.get("arguments", {}) or {}
                if name not in self._tools:
                    raise ValueError(f"unknown tool {name!r}")
                _spec, fn = self._tools[name]
                payload = fn(**args)
                result = {
                    "content": [
                        {
                            "type": "text",
                            "text": json.dumps(payload, indent=1, default=str),
                        }
                    ],
                    "isError": False,
                }
            else:
                return {
                    "jsonrpc": "2.0",
                    "id": rid,
                    "error": {"code": -32601, "message": f"method not found: {method}"},
                }
            return {"jsonrpc": "2.0", "id": rid, "result": result}
        except Exception as e:  # noqa: BLE001 — tool errors surface as MCP errors
            if method == "tools/call":
                return {
                    "jsonrpc": "2.0",
                    "id": rid,
                    "result": {
                        "content": [{"type": "text", "text": f"error: {e}"}],
                        "isError": True,
                    },
                }
            return {
                "jsonrpc": "2.0",
                "id": rid,
                "error": {"code": -32000, "message": str(e)},
            }

    def serve(self) -> None:
        """Newline-delimited JSON-RPC over stdio (MCP stdio transport)."""
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            try:
                req = json.loads(line)
            except json.JSONDecodeError:
                continue
            resp = self.handle_request(req)
            if resp is not None:
                sys.stdout.write(json.dumps(resp, default=str) + "\n")
                sys.stdout.flush()


def main() -> None:
    LakehouseServer().serve()


if __name__ == "__main__":
    main()

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
_O = {"type": "object"}


def _explain_text(df, mode: str = "formatted") -> str:
    """df.explain(mode) prints to stdout; capture it for RPC transport."""
    import contextlib
    import io

    if mode not in ("simple", "extended", "codegen", "cost", "formatted"):
        raise ValueError(f"unknown explain mode {mode!r}")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _scan_or_missing(catalog, table: str):
    """Table scan, or the reference's ValueError for preview on a
    missing table (masking.py:207-210)."""
    try:
        return catalog.load_table(table).scan()
    except Exception as e:
        raise ValueError(f"Table '{table}' not found: {e}") from e


class _LazyProxy:
    """Defers construction of an expensive object (the SparkSession and
    everything downstream of it) until first attribute access, so the
    CLI can render --help and run pure-metadata tools without paying
    JVM startup. Attribute sets before construction are replayed onto
    the real object once it exists."""

    def __init__(self, factory):
        object.__setattr__(self, "_factory", factory)
        object.__setattr__(self, "_obj", None)
        object.__setattr__(self, "_pending", {})

    def _resolve(self):
        if object.__getattribute__(self, "_obj") is None:
            obj = object.__getattribute__(self, "_factory")()
            object.__setattr__(self, "_obj", obj)
            for k, v in object.__getattribute__(self, "_pending").items():
                setattr(obj, k, v)
        return object.__getattribute__(self, "_obj")

    def __getattr__(self, name):
        return getattr(self._resolve(), name)

    def __setattr__(self, name, value):
        obj = object.__getattribute__(self, "_obj")
        if obj is None:
            object.__getattribute__(self, "_pending")[name] = value
        else:
            setattr(obj, name, value)


class LakehouseServer:
    def __init__(self, home: str | None = None, lazy_spark: bool = False):
        self.home = home or os.environ.get(
            "LAKEHOUSE_HOME", os.path.expanduser("~/.lakehouse_spark")
        )
        os.makedirs(self.home, exist_ok=True)
        from .catalog import LakehouseCatalog
        from .plans.engine import QueryEngine
        from .session import get_spark

        if lazy_spark:
            self.spark = _LazyProxy(lambda: get_spark("lakehouse-mcp"))
            self.catalog = _LazyProxy(
                lambda: LakehouseCatalog(
                    self.spark, os.path.join(self.home, "warehouse")
                )
            )
            self.engine = _LazyProxy(lambda: QueryEngine(self.catalog))
        else:
            self.spark = get_spark("lakehouse-mcp")
            self.catalog = LakehouseCatalog(
                self.spark, os.path.join(self.home, "warehouse")
            )
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
        from .governance import advisor
        from .operators import crud
        c, eng = self.catalog, self.engine

        ROWS_CAP = 1000  # RPC result cap; truncation checks share it

        def rows_of(df, cap=ROWS_CAP):
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
            _tool("evolve_partition_spec",
                  "Change the partition spec for FUTURE writes without "
                  "rewriting existing files (Iceberg partition "
                  "evolution); [] unpartitions",
                  {"table": _S, "partition_by": {"type": "array"}},
                  ["table", "partition_by"]),
            lambda table, partition_by: c.load_table(
                table).evolve_partition_spec(partition_by),
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
            _tool("delete_by_key",
                  "Equality-delete rows matching key values (Iceberg v2 "
                  "equality-delete files: no data file rewrite, "
                  "re-inserting a deleted key later is visible)",
                  {"table": _S, "keys": {"type": "array"},
                   "key_columns": {"type": "array"}},
                  ["table", "keys"]),
            lambda table, keys, key_columns=None: {
                "deleted": crud.delete_rows_by_key(
                    c.load_table(table), keys, key_columns
                )
            },
        )
        self._add(
            _tool("replace_where",
                  "Atomically replace every row matching a SQL filter "
                  "with the given rows in ONE commit (Delta replaceWhere "
                  "analogue — the idempotent partition-reload primitive). "
                  "enforce=true (default) rejects rows outside the filter",
                  {"table": _S, "filter": _S, "rows": {"type": "array"},
                   "enforce": {"type": "boolean"}},
                  ["table", "filter", "rows"]),
            lambda table, filter, rows, enforce=True: (
                lambda t: crud.replace_where(
                    t, filter, crud.rows_to_df(t, rows), enforce=enforce
                )
            )(c.load_table(table)),
        )
        self._add(
            _tool("overwrite_partitions",
                  "Dynamic partition overwrite: atomically replace "
                  "exactly the partitions present in the given rows "
                  "(whole partition directories swap; untouched "
                  "partitions carry by reference)",
                  {"table": _S, "rows": {"type": "array"}},
                  ["table", "rows"]),
            lambda table, rows: (
                lambda t: crud.overwrite_partitions(
                    t, crud.rows_to_df(t, rows)
                )
            )(c.load_table(table)),
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
            _tool("snapshot_diff",
                  "Row diff between two snapshots (refs: snapshot id or ISO "
                  "timestamp; to_snapshot defaults to current)",
                  {"table": _S, "from_snapshot": {"type": ["integer", "string"]},
                   "to_snapshot": {"type": ["integer", "string"]}},
                  ["table", "from_snapshot"]),
            lambda table, from_snapshot, to_snapshot=None: c.load_table(
                table).snapshot_diff_report(from_snapshot, to_snapshot),
        )
        self._add(
            _tool("rollback", "Restore table to a snapshot (new restoring commit)",
                  {"table": _S, "snapshot_id": _I}, ["table", "snapshot_id"]),
            lambda table, snapshot_id: c.load_table(table)
            .rollback(snapshot_id=snapshot_id)
            .to_json(),
        )
        self._add(
            _tool("branch_create",
                  "Create a branch ref at the current head (or a given "
                  "snapshot) — the write side of write-audit-publish",
                  {"table": _S, "name": _S, "from_snapshot_id": _I},
                  ["table", "name"]),
            lambda table, name, from_snapshot_id=None: c.load_table(
                table).create_branch(name, from_snapshot_id),
        )
        self._add(
            _tool("tag_create",
                  "Create an immutable tag ref (release label); tagged "
                  "snapshots never expire while the tag lives",
                  {"table": _S, "name": _S, "snapshot_id": _I},
                  ["table", "name"]),
            lambda table, name, snapshot_id=None: c.load_table(
                table).create_tag(name, snapshot_id),
        )
        self._add(
            _tool("refs_list", "All branch/tag refs with resolved heads",
                  {"table": _S}, ["table"]),
            lambda table: c.load_table(table).list_refs(),
        )

        def _inspect_metadata(table, name, snapshot_id=None):
            t = c.load_table(table)
            dispatch = {
                "snapshots": t.snapshots_df,
                "files": lambda: t.files_df(snapshot_id),
                "history": t.history_df,
                "refs": t.refs_df,
                "delete_files": lambda: t.delete_files_df(snapshot_id),
                "partitions": t.partitions_df,
            }
            if name not in dispatch:
                raise ValueError(
                    f"unknown metadata table {name!r}; one of "
                    f"{sorted(dispatch)}")
            rows = dispatch[name]().collect()
            out = []
            for r in rows:
                d = r.asDict(recursive=True)
                for k, v in d.items():
                    if hasattr(v, "isoformat"):
                        d[k] = v.isoformat()
                out.append(d)
            return out

        self._add(
            _tool("inspect_metadata_table",
                  "Rows of an Iceberg-style metadata table: snapshots | "
                  "files | history | refs | delete_files | partitions "
                  "(also SQL-queryable as <table>__<name> views)",
                  {"table": _S, "name": _S, "snapshot_id": _I},
                  ["table", "name"]),
            _inspect_metadata,
        )
        self._add(
            _tool("branch_fast_forward",
                  "Publish step of write-audit-publish: move to_branch "
                  "to from_branch's head (ancestor-checked)",
                  {"table": _S, "to_branch": _S, "from_branch": _S},
                  ["table", "to_branch", "from_branch"]),
            lambda table, to_branch, from_branch: c.load_table(
                table).fast_forward(to_branch, from_branch),
        )
        self._add(
            _tool("branch_drop", "Drop a branch ref (data stays in the log)",
                  {"table": _S, "name": _S}, ["table", "name"]),
            lambda table, name: c.load_table(table).drop_branch(name),
        )
        self._add(
            _tool("tag_drop", "Drop a tag ref",
                  {"table": _S, "name": _S}, ["table", "name"]),
            lambda table, name: c.load_table(table).drop_tag(name),
        )
        self._add(
            _tool("insert_into_branch",
                  "Append rows to a BRANCH head (write-audit-publish "
                  "staging write; main is untouched until fast-forward)",
                  {"table": _S, "branch": _S, "rows": {"type": "array"}},
                  ["table", "branch", "rows"]),
            lambda table, branch, rows: {
                "inserted": crud.insert_rows(
                    c.load_table(table).for_branch(branch), rows
                )
            },
        )
        self._add(
            _tool("query_branch",
                  "Read a branch or tag head (audit step of "
                  "write-audit-publish); returns up to `limit` rows",
                  {"table": _S, "ref": _S, "limit": _I}, ["table", "ref"]),
            lambda table, ref, limit=100: [
                r.asDict(recursive=True)
                for r in c.load_table(table).scan(ref=ref).limit(limit)
                .collect()
            ],
        )
        self._add(
            _tool("expire_snapshots", "Expire old snapshots (retain_last "
                  "and/or older_than '30d'/'24h'/'90m'=minutes/'45s'/ISO)",
                  {"table": _S, "retain_last": _I, "older_than": _S,
                   "dry_run": _B}, ["table"]),
            lambda table, retain_last=None, older_than=None, dry_run=False:
            c.load_table(table).expire_snapshots(
                retain_last=retain_last, older_than=older_than, dry_run=dry_run
            ),
        )

        # -- maintenance ---------------------------------------------------
        from .governance.policies import _ORPHAN_GRACE_S

        self._add(
            _tool("compact", "Compact small files (optionally cluster: "
                  "sort_by = linear range-cluster, zorder_by = bit-"
                  "interleaved multi-column locality; where = partial "
                  "rewrite of only the files matching the predicate)",
                  {"table": _S, "target_partitions": _I,
                   "sort_by": {"type": "array", "items": _S},
                   "zorder_by": {"type": "array", "items": _S},
                   "where": _S}, ["table"]),
            lambda table, target_partitions=None, sort_by=None,
            zorder_by=None, where=None:
            c.load_table(table).compact(
                target_partitions=target_partitions, sort_by=sort_by,
                zorder_by=zorder_by, where=where,
            ),
        )
        self._add(
            _tool("rewrite_delete_files",
                  "Minor compaction: consolidate MoR position-delete "
                  "files and drop dead delete state without touching "
                  "data files",
                  {"table": _S}, ["table"]),
            lambda table: c.load_table(table).rewrite_delete_files(),
        )
        self._add(
            _tool("cherry_pick",
                  "Re-apply one additive commit (e.g. staged on a WAP "
                  "branch) onto the current head",
                  {"table": _S, "snapshot_id": _I},
                  ["table", "snapshot_id"]),
            lambda table, snapshot_id: c.load_table(table)
            .cherry_pick(snapshot_id).to_json(),
        )
        self._add(
            _tool("add_files",
                  "Zero-copy import: register existing parquet files "
                  "as one append commit (hardlinked, footer stats "
                  "recorded — no data read or rewritten). Schema must "
                  "match the table exactly; unpartitioned tables only",
                  {"table": _S, "paths": {"type": "array", "items": _S},
                   "link": _B},
                  ["table", "paths"]),
            lambda table, paths, link=True:
            c.load_table(table).add_files(paths, link=link).to_json(),
        )
        self._add(
            _tool("analyze_table",
                  "ANALYZE: one-pass per-column approximate NDV + null "
                  "counts + exact row count, persisted per snapshot — "
                  "optimizer food for broadcast/bucketing/skew decisions",
                  {"table": _S, "columns": {"type": "array", "items": _S}},
                  ["table"]),
            lambda table, columns=None: c.load_table(table).analyze(columns),
        )
        self._add(
            _tool("analyzed_stats",
                  "Last ANALYZE result (stale-flagged when the table "
                  "committed past the analyzed snapshot)",
                  {"table": _S}, ["table"]),
            lambda table: c.load_table(table).analyzed_stats()
            or {"message": "no ANALYZE stats — run analyze_table"},
        )
        self._add(
            _tool("join_strategy",
                  "Physical join-strategy advice for two tables from "
                  "metadata alone: broadcast vs shuffle, bucketing "
                  "suggestion, hot-key skew warnings (uses file sizes "
                  "+ ANALYZE NDVs; reads no data)",
                  {"left": _S, "right": _S,
                   "on": {"type": "array", "items": _S},
                   "broadcast_threshold": _I},
                  ["left", "right", "on"]),
            lambda left, right, on, broadcast_threshold=None:
            advisor.join_strategy(
                c, left, right, on,
                **({"broadcast_threshold": broadcast_threshold}
                   if broadcast_threshold is not None else {}),
            ),
        )
        self._add(
            _tool("explain_query",
                  "Formatted physical plan for a SQL query (pushdown, "
                  "pruned read schemas, join strategies, exchanges)",
                  {"sql": _S, "mode": _S}, ["sql"]),
            lambda sql, mode="formatted": {
                "sql": sql,
                "mode": mode,
                "plan": _explain_text(
                    self.engine.execute(sql, max_rows=0), mode
                ),
            },
        )
        self._add(
            _tool("scan_plan", "Preview stats-based file pruning for a "
                  "predicate: surviving files vs snapshot total",
                  {"table": _S, "filter": _S}, ["table", "filter"]),
            lambda table, filter: (
                lambda kept, total: {
                    "files_kept": len(kept),
                    "files_total": total,
                    "files": kept[:100],
                }
            )(*c.load_table(table).prune_files(filter)),
        )
        self._add(
            # default grace matches the governance maintenance path
            # (policies._ORPHAN_GRACE_S): an agent-invoked delete racing
            # a concurrent writer's materialize-before-commit window
            # must not remove not-yet-committed files (r5 advice). An
            # explicit grace_seconds=0 restores immediate semantics.
            _tool("cleanup_orphans", "List/delete unreferenced files",
                  {"table": _S, "delete": _B, "grace_seconds": _I},
                  ["table"]),
            lambda table, delete=False, grace_seconds=None: c.load_table(
                table).cleanup_orphans_report(
                    dry_run=not delete,
                    grace_seconds=_ORPHAN_GRACE_S
                    if grace_seconds is None else grace_seconds),
        )
        self._add(
            _tool("partition_stats", "Per-partition files + size_bytes "
                  "(reference get_partition_stats shape)",
                  {"table": _S}, ["table"]),
            lambda table: c.load_table(table).partition_stats_report(),
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
            lambda table, path, file_format=None, where=None, columns=None, limit=None:
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
                  {"table": _S, "column": _S, "strategy": _S, "options": _O},
                  ["table", "column", "strategy"]),
            lambda table, column, strategy, options=None: mm.add_policy(
                table, column, strategy, options=options
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
            _tool("create_aggregate_matview",
                  "Self-maintainable GROUP BY matview (sum/count/"
                  "count_star) refreshable from the changelog",
                  {"name": _S, "table": _S,
                   "group_by": {"type": "array", "items": _S},
                   "aggs": {"type": "array"}},
                  ["name", "table", "group_by", "aggs"]),
            lambda name, table, group_by, aggs: matviews.create_aggregate(
                name, table, group_by, aggs),
        )
        self._add(
            _tool("refresh_matview_incremental",
                  "Apply the source changelog as per-group deltas — "
                  "O(changed data), one atomic commit",
                  {"name": _S}, ["name"]),
            lambda name: matviews.refresh_incremental(name),
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
            total = len(rows) if len(rows) < ROWS_CAP else df.count()
            if advance and t.current_snapshot():
                # record the TRUE processed count — the watermark covers
                # every new row, not just the 1000 returned over RPC
                wm.set(pipeline, table, t.current_snapshot().snapshot_id, total)
            return {"info": {**info, "total_rows": total,
                             "truncated": total > len(rows)},
                    "rows": rows}

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
        from .governance.cdc import changelog_view

        self._add(
            _tool("changelog_view",
                  "Row-level changes across a snapshot range "
                  "(_change_type/_commit_snapshot_id/_change_ordinal; "
                  "updates appear as delete+insert pairs)",
                  {"table": _S, "from_snapshot": _I, "to_snapshot": _I},
                  ["table", "from_snapshot"]),
            lambda table, from_snapshot, to_snapshot=None: rows_of(
                changelog_view(c.load_table(table), from_snapshot, to_snapshot)
                .orderBy("_change_ordinal", "_change_type")
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
        self._add(
            _tool("near_dup_cluster_labels",
                  "Connected-component cluster labels over MinHash+LSH "
                  "near-dup pairs (node, comp = keeper id)",
                  {"table": _S, "id_column": _S, "text_column": _S,
                   "threshold": _N}, ["table", "id_column", "text_column"]),
            lambda table, id_column, text_column, threshold=0.7: rows_of(
                dt.connected_components(
                    dt.minhash_dedup(
                        c.load_table(table).scan(), id_column, text_column,
                        threshold=threshold,
                    ).select("left_id", "right_id")
                )
            ),
        )

        def _dedup_corpus_summary(table, id_column, text_column, threshold=0.7):
            from pyspark.sql import functions as F

            src = c.load_table(table).scan()
            pairs = dt.minhash_dedup(
                src, id_column, text_column, threshold=threshold
            )
            comp = dt.connected_components(pairs.select("left_id", "right_id"))
            losers = comp.where(F.col("node") != F.col("comp"))
            total = src.count()
            removed = losers.count()
            return {
                "total_rows": total,
                "removed": removed,
                "kept": total - removed,
                "removed_ids_sample": sorted(
                    r["node"] for r in losers.limit(100).collect()
                ),
                "message": f"{removed} near-duplicate rows of {total} "
                "would be removed (one keeper per cluster)",
            }

        self._add(
            _tool("dedup_corpus",
                  "Near-duplicate removal summary: keep one doc per "
                  "cluster, report removed ids (dry-run analysis)",
                  {"table": _S, "id_column": _S, "text_column": _S,
                   "threshold": _N}, ["table", "id_column", "text_column"]),
            _dedup_corpus_summary,
        )
        self._add(
            _tool("embedding_near_dup_gated",
                  "Size-gated embedding near-duplicate pairs: exact "
                  "cosine verify inside blocks at or under max_block, "
                  "seeded sign-sketch sub-buckets + keeper star edges "
                  "for overflow blocks — the scale path that keeps a "
                  "mass-duplicated corpus linear instead of "
                  "block-quadratic (r13 VERDICT #2: the library "
                  "operator had no tool surface)",
                  {"table": _S, "id_column": _S, "vector_column": _S,
                   "block_column": _S, "threshold": _N, "max_block": _I,
                   "sketch_bits": _I, "sketch_tables": _I,
                   "max_sub_bucket": _I, "seed": _I, "max_rows": _I},
                  ["table", "id_column", "vector_column"]),
            lambda table, id_column, vector_column, block_column=None,
                   threshold=0.9, max_block=1024, sketch_bits=8,
                   sketch_tables=2, max_sub_bucket=None, seed=13,
                   max_rows=1000: rows_of(
                fsim.gated_cosine_near_dup_pairs(
                    c.load_table(table).scan(), id_column, vector_column,
                    block_col=block_column, threshold=threshold,
                    max_block=max_block, sketch_bits=sketch_bits,
                    sketch_tables=sketch_tables,
                    max_sub_bucket=max_sub_bucket, seed=seed,
                ).orderBy("left_id", "right_id"), cap=max_rows,
            ),
        )
        self._add(
            _tool("containment_pairs",
                  "Asymmetric containment (|A∩B|/|A|) over MinHash+LSH "
                  "candidates — subset duplication Jaccard misses "
                  "(quote farms, concatenated dumps)",
                  {"table": _S, "id_column": _S, "text_column": _S,
                   "threshold": _N},
                  ["table", "id_column", "text_column"]),
            lambda table, id_column, text_column, threshold=0.8: rows_of(
                (lambda src: dt.containment_pairs(
                    src,
                    dt.lsh_candidate_pairs(
                        dt.minhash_signatures(src, id_column, text_column),
                        id_column,
                    ),
                    id_column, text_column,
                ).where(
                    f"greatest(left_containment, right_containment) "
                    f">= {float(threshold)}"
                ))(c.load_table(table).scan())
            ),
        )
        from .operators import dedup_index as _di

        self._add(
            _tool("dedup_index_build",
                  "Persist a MinHash band-key index of a corpus table "
                  "for incremental near-dup probing",
                  {"table": _S, "index_table": _S, "id_column": _S,
                   "text_column": _S},
                  ["table", "index_table", "id_column", "text_column"]),
            lambda table, index_table, id_column, text_column: {
                "index_table": index_table,
                "rows": _di.build_dedup_index(
                    c, index_table, c.load_table(table).scan(),
                    id_column, text_column,
                ).scan().count(),
                "message": f"dedup index {index_table} built from {table}",
            },
        )
        self._add(
            _tool("span_index_build",
                  "Persist a span-gram index (distinct n-gram hash -> "
                  "keeper doc) of a corpus table — feeds the streaming "
                  "substring-level dedup sink",
                  {"table": _S, "index_table": _S, "id_column": _S,
                   "text_column": _S, "ngram": _I},
                  ["table", "index_table", "id_column", "text_column"]),
            lambda table, index_table, id_column, text_column, ngram=8: {
                "index_table": index_table,
                "rows": _di.build_span_index(
                    c, index_table, c.load_table(table).scan(),
                    id_column, text_column, n=ngram,
                ).scan().count(),
                "message": f"span index {index_table} built from {table}",
            },
        )
        self._add(
            _tool("dedup_index_extend",
                  "Append an accepted batch's band keys to a dedup "
                  "index (completes the build → probe → extend loop)",
                  {"index_table": _S, "batch_table": _S, "id_column": _S,
                   "text_column": _S},
                  ["index_table", "batch_table", "id_column", "text_column"]),
            lambda index_table, batch_table, id_column, text_column: {
                "index_table": index_table,
                "rows_added": _di.extend_dedup_index(
                    c.load_table(index_table),
                    c.load_table(batch_table).scan(),
                    id_column, text_column,
                ),
            },
        )
        self._add(
            _tool("dedup_index_probe",
                  "Near-dup pairs between a new batch table and the "
                  "indexed corpus (broadcast band-key probe + exact "
                  "Jaccard verify)",
                  {"index_table": _S, "batch_table": _S, "corpus_table": _S,
                   "id_column": _S, "text_column": _S, "threshold": _N},
                  ["index_table", "batch_table", "corpus_table",
                   "id_column", "text_column"]),
            lambda index_table, batch_table, corpus_table, id_column,
                   text_column, threshold=0.7: rows_of(
                _di.probe_dedup_index(
                    c.load_table(index_table),
                    c.load_table(batch_table).scan(),
                    c.load_table(corpus_table).scan(),
                    id_column, text_column, threshold=threshold,
                )
            ),
        )

        from .operators import ann_index as _ai

        _VEC = {"type": "array", "items": _N}
        self._add(
            _tool("ann_index_build",
                  "Persist an IVF ANN index (centroids + cell-"
                  "partitioned vector lists) over a table's embedding "
                  "column for repeated similarity probes",
                  {"table": _S, "index_table": _S, "id_column": _S,
                   "vector_column": _S, "n_cells": _I},
                  ["table", "index_table", "id_column", "vector_column"]),
            lambda table, index_table, id_column, vector_column,
                   n_cells=16: {
                "index_table": index_table,
                "rows": _ai.build_ann_index(
                    c, index_table, c.load_table(table).scan(),
                    id_column, vector_column, n_cells=n_cells,
                ).scan().count(),
                "message": f"ANN index {index_table} built from {table}",
            },
        )
        self._add(
            _tool("ann_index_probe",
                  "Top-k most-similar indexed vectors for a query "
                  "vector (stored-centroid routing + file-pruned "
                  "cell scan + exact cosine)",
                  {"index_table": _S, "query_vector": _VEC, "k": _I,
                   "nprobe": _I},
                  ["index_table", "query_vector"]),
            lambda index_table, query_vector, k=10, nprobe=None: rows_of(
                _ai.probe_ann_index(
                    c, index_table, [float(v) for v in query_vector],
                    k=k, nprobe=nprobe,  # None -> pinned ivf.nprobe
                )
            ),
        )
        self._add(
            _tool("ann_index_extend",
                  "Assign a new batch's vectors to the stored centroids "
                  "and append to the index (no re-clustering)",
                  {"index_table": _S, "batch_table": _S, "id_column": _S,
                   "vector_column": _S},
                  ["index_table", "batch_table", "id_column",
                   "vector_column"]),
            lambda index_table, batch_table, id_column, vector_column: {
                "index_table": index_table,
                "rows_added": _ai.extend_ann_index(
                    c, index_table, c.load_table(batch_table).scan(),
                    id_column, vector_column,
                ),
            },
        )
        self._add(
            _tool("ann_index_stats",
                  "Per-cell inverted-list sizes + skew markers (the "
                  "rebuild signal after many extends)",
                  {"index_table": _S}, ["index_table"]),
            lambda index_table: rows_of(_ai.ann_index_stats(c, index_table)),
        )
        self._add(
            _tool("ann_index_rebalance",
                  "Split cells grown past max_ratio x the median list "
                  "size via in-cell 2-means (recall-preserving "
                  "maintenance after drifting extends)",
                  {"index_table": _S, "max_ratio": _N, "kmeans_iters": _I,
                   "max_splits": _I},
                  ["index_table"]),
            lambda index_table, max_ratio=4.0, kmeans_iters=2,
                   max_splits=16: _ai.rebalance_ann_index(
                c, index_table, max_ratio=max_ratio,
                kmeans_iters=kmeans_iters, max_splits=max_splits,
            ),
        )

        self._add(
            _tool("ann_recall_sample",
                  "MEASURED routing recall@k for the plain IVF index: "
                  "sampled stored vectors vs exact brute force (any "
                  "loss is cells-not-probed — the signal that says "
                  "when a rebuild is due)",
                  {"index_table": _S, "k": _I, "nprobe": _I,
                   "sample": _I},
                  ["index_table"]),
            lambda index_table, k=10, nprobe=2, sample=8:
                _ai.ann_recall_sample(c, index_table, k=k,
                                      nprobe=nprobe, sample=sample),
        )
        self._add(
            _tool("ann_index_rebuild",
                  "Full re-cluster of the IVF index from its own "
                  "stored vectors (self-contained): repairs the drift "
                  "class splits cannot — neighborhoods the frozen "
                  "centroids straddled across cells",
                  {"index_table": _S, "n_cells": _I, "kmeans_iters": _I},
                  ["index_table"]),
            lambda index_table, n_cells=None, kmeans_iters=3:
                _ai.rebuild_ann_index(c, index_table, n_cells=n_cells,
                                      kmeans_iters=kmeans_iters),
        )
        self._add(
            _tool("ann_nprobe_tune",
                  "Measured-recall nprobe schedule: doubling ladder of "
                  "probe widths through the recall sampler, returns "
                  "the smallest nprobe whose sampled recall@k meets "
                  "the target (on weakly clustered corpora recall "
                  "tracks scan fraction — measure, don't guess)",
                  {"index_table": _S, "target_recall": _N, "k": _I,
                   "sample": _I, "max_nprobe": _I},
                  ["index_table"]),
            lambda index_table, target_recall=0.8, k=10, sample=8,
                   max_nprobe=None: _ai.tune_nprobe(
                c, index_table, target_recall=target_recall, k=k,
                sample=sample, max_nprobe=max_nprobe,
            ),
        )

        from .operators import media_index as _mi

        self._add(
            _tool("phash_index_build",
                  "Persist a perceptual-hash (dHash) index of a media "
                  "table: one Arrow-batched decode, (d+1) pigeonhole "
                  "segment rows per image — incremental image near-dup "
                  "probing without re-decoding the corpus",
                  {"table": _S, "index_table": _S, "max_distance": _I},
                  ["table", "index_table"]),
            lambda table, index_table, max_distance=6: {
                "index_table": index_table,
                "rows": _mi.build_phash_index(
                    c, index_table, c.load_table(table).scan(),
                    max_distance=max_distance,
                ).scan().count(),
                "message": f"phash index {index_table} built from {table}",
            },
        )
        self._add(
            _tool("phash_index_probe",
                  "Near-duplicate image pairs between a media batch "
                  "table and the indexed corpus (batch segment keys "
                  "broadcast, index scanned map-side, row-wise Hamming "
                  "verify)",
                  {"index_table": _S, "batch_table": _S,
                   "max_distance": _I, "max_rows": _I},
                  ["index_table", "batch_table"]),
            lambda index_table, batch_table, max_distance=None,
                   max_rows=1000: rows_of(
                _mi.probe_phash_index(
                    c.load_table(index_table),
                    c.load_table(batch_table).scan(),
                    max_distance=max_distance,
                ).limit(max_rows)),
        )
        self._add(
            _tool("phash_index_extend",
                  "Append an accepted media batch's fingerprint "
                  "segments to a phash index",
                  {"index_table": _S, "batch_table": _S},
                  ["index_table", "batch_table"]),
            lambda index_table, batch_table: {
                "rows_added": _mi.extend_phash_index(
                    c.load_table(index_table),
                    c.load_table(batch_table).scan()),
            },
        )
        self._add(
            _tool("vframe_index_build",
                  "Persist a VIDEO frame-set index: one (clip, distinct "
                  "frame dHash) row per sampled frame — incremental "
                  "clip near-dup probing (trim/re-mux-robust "
                  "containment) without re-hashing the corpus",
                  {"table": _S, "index_table": _S, "every_nth": _I,
                   "threshold": _N, "max_df": _I},
                  ["table", "index_table"]),
            lambda table, index_table, every_nth=1, threshold=0.5,
                   max_df=1024: {
                "index_table": index_table,
                "rows": _mi.build_vframe_index(
                    c, index_table, c.load_table(table).scan(),
                    every_nth=every_nth, threshold=threshold,
                    max_df=max_df,
                ).scan().count(),
                "message":
                    f"frame-set index {index_table} built from {table}",
            },
        )
        self._add(
            _tool("vframe_index_probe",
                  "Near-duplicate clip pairs between a video batch "
                  "table and the indexed corpus (batch frame hashes "
                  "broadcast, index scanned map-side, containment "
                  "verify with the index-side df cap)",
                  {"index_table": _S, "batch_table": _S,
                   "threshold": _N, "max_rows": _I},
                  ["index_table", "batch_table"]),
            lambda index_table, batch_table, threshold=None,
                   max_rows=1000: rows_of(
                _mi.probe_vframe_index(
                    c.load_table(index_table),
                    c.load_table(batch_table).scan(),
                    threshold=threshold,
                ).limit(max_rows)),
        )
        self._add(
            _tool("vframe_index_extend",
                  "Append an accepted clip batch's distinct frame "
                  "fingerprints to a frame-set index",
                  {"index_table": _S, "batch_table": _S},
                  ["index_table", "batch_table"]),
            lambda index_table, batch_table: {
                "rows_added": _mi.extend_vframe_index(
                    c.load_table(index_table),
                    c.load_table(batch_table).scan()),
            },
        )

        from .operators import index_sync as _isync

        self._add(
            _tool("index_link_source",
                  "Link an index (dedup/ANN/IVFPQ) to its source table "
                  "and baseline the sync cursor at the source's current "
                  "snapshot — prerequisite for index_sync_deletes; "
                  "vector_column enables the unattended IVFPQ "
                  "auto_rebuild_index path, text_column the unattended "
                  "re-extend of updated docs into text indexes",
                  {"index_table": _S, "source_table": _S,
                   "id_column": _S, "vector_column": _S,
                   "text_column": _S},
                  ["index_table", "source_table", "id_column"]),
            lambda index_table, source_table, id_column,
                   vector_column=None, text_column=None:
                _isync.link_index_source(
                    c, index_table, source_table, id_column,
                    vec_col=vector_column, text_col=text_column),
        )
        self._add(
            _tool("index_status",
                  "Inventory of every index table: kind (minhash/span/"
                  "phash/vframe/ivf/ivfpq), rows, family params, and "
                  "the sync-cursor lag vs its linked source (in_sync / "
                  "behind / stale_reinserts / unlinked / "
                  "cursor_expired)",
                  {}, []),
            lambda: _isync.index_status(c),
        )
        self._add(
            _tool("index_sync_deletes",
                  "Remove index rows whose source rows were deleted "
                  "since the last sync (changelog-driven, one "
                  "equality-delete commit; updated ids are reported "
                  "for re-extend and stamped as pending debt)",
                  {"index_table": _S}, ["index_table"]),
            lambda index_table: _isync.sync_index_deletes(c, index_table),
        )
        from .governance import models as _gm

        self._add(
            _tool("quality_model_train",
                  "Train the bit-reproducible logistic quality "
                  "classifier on a source table's CURRENT snapshot "
                  "and register the weights as the next version in a "
                  "model-registry table (promote to make it live)",
                  {"registry_table": _S, "source_table": _S,
                   "text_column": _S, "iters": _I, "promote":
                   {"type": "boolean"}},
                  ["registry_table", "source_table"]),
            lambda registry_table, source_table, text_column="text",
                   iters=8, promote=False:
                _gm.train_and_register(
                    c, registry_table, source_table,
                    text_col=text_column, iters=iters,
                    promote=promote),
        )
        self._add(
            _tool("quality_model_promote",
                  "Point a model registry's live-scoring pointer at a "
                  "version (rollback = re-point)",
                  {"registry_table": _S, "version": _I},
                  ["registry_table", "version"]),
            lambda registry_table, version:
                _gm.promote_model_version(c, registry_table, version),
        )
        self._add(
            _tool("quality_model_retrain",
                  "Unattended retrain: re-train on the latest "
                  "version's source at its CURRENT snapshot with the "
                  "recorded hyperparameters; registers the next "
                  "version UNPROMOTED (the auto_retrain_model "
                  "maintenance policy's action)",
                  {"registry_table": _S}, ["registry_table"]),
            lambda registry_table:
                _gm.retrain_latest(c, registry_table),
        )
        self._add(
            _tool("quality_model_versions",
                  "Audit history of a model registry: every trained "
                  "version with source-snapshot provenance and the "
                  "promoted flag",
                  {"registry_table": _S}, ["registry_table"]),
            lambda registry_table:
                _gm.model_versions(c, registry_table),
        )
        self._add(
            _tool("quality_model_score",
                  "Score a table with the PROMOTED model version (or "
                  "an explicit pin): quality_score/quality_label/"
                  "model_version per row — retraining never changes "
                  "production scoring until promoted",
                  {"registry_table": _S, "table": _S, "text_column": _S,
                   "version": _I, "max_rows": _I},
                  ["registry_table", "table"]),
            lambda registry_table, table, text_column="text",
                   version=None, max_rows=100: rows_of(
                _gm.score_with_latest_model(
                    c, registry_table, c.load_table(table).scan(),
                    text_col=text_column, version=version,
                ).limit(max_rows)),
        )
        self._add(
            _tool("index_reextend",
                  "Repay an index's pending-reinsert debt: re-derive "
                  "the live-updated ids from the pending changelog "
                  "range and upsert their CURRENT source content back "
                  "into the index via the family's extend path",
                  {"index_table": _S}, ["index_table"]),
            lambda index_table: _isync.reextend_index(c, index_table),
        )

        from .operators import pq as _pq

        self._add(
            _tool("pq_index_build",
                  "Persist a product-quantization index (m-subspace "
                  "codebook + per-vector codes): dim x 8 bytes -> m "
                  "bytes per vector, so the index fits executor memory "
                  "at corpus scale",
                  {"table": _S, "index_table": _S, "id_column": _S,
                   "vector_column": _S, "m": _I, "ksub": _I},
                  ["table", "index_table", "id_column", "vector_column"]),
            lambda table, index_table, id_column, vector_column,
                   m=8, ksub=16: {
                "index_table": index_table,
                "rows": _pq.build_pq_index(
                    c, index_table, c.load_table(table).scan(),
                    id_column, vector_column, m=m, ksub=ksub,
                ).scan().count(),
                **_pq.pq_index_stats(c, index_table),
            },
        )
        self._add(
            _tool("pq_index_probe",
                  "Top-k by asymmetric distance (ADC: m lookups per "
                  "candidate, no per-row vector math); pass "
                  "refine_table to re-rank the top candidates by exact "
                  "cosine against the original vectors",
                  {"index_table": _S, "query_vector": _VEC, "k": _I,
                   "refine_table": _S, "id_column": _S,
                   "vector_column": _S, "refine_factor": _I},
                  ["index_table", "query_vector"]),
            lambda index_table, query_vector, k=10, refine_table=None,
                   id_column="vec_id", vector_column="embedding",
                   refine_factor=4: rows_of(
                _pq.probe_pq_index(
                    c, index_table, [float(v) for v in query_vector],
                    k=k,
                    refine_with=(c.load_table(refine_table).scan()
                                 if refine_table else None),
                    id_col=id_column, vec_col=vector_column,
                    refine_factor=refine_factor,
                )
            ),
        )
        self._add(
            _tool("pq_index_extend",
                  "Encode a new batch against the frozen codebook "
                  "(map-only) and append",
                  {"index_table": _S, "batch_table": _S, "id_column": _S,
                   "vector_column": _S},
                  ["index_table", "batch_table", "id_column",
                   "vector_column"]),
            lambda index_table, batch_table, id_column, vector_column: {
                "index_table": index_table,
                "rows_added": _pq.extend_pq_index(
                    c, index_table, c.load_table(batch_table).scan(),
                    id_column, vector_column,
                ),
            },
        )
        self._add(
            _tool("pq_index_stats",
                  "Compression ratio + per-subspace code utilization "
                  "(dead codes = rebuild signal on a drifted corpus)",
                  {"index_table": _S}, ["index_table"]),
            lambda index_table: _pq.pq_index_stats(c, index_table),
        )

        from .operators import ivfpq as _ivfpq

        self._add(
            _tool("ivfpq_index_build",
                  "Persist an IVFADC index (IVF cell routing x PQ "
                  "residual compression): codes partitioned by cell so "
                  "a probe file-prunes to nprobe cells AND holds m "
                  "bytes per vector",
                  {"table": _S, "index_table": _S, "id_column": _S,
                   "vector_column": _S, "n_cells": _I, "m": _I,
                   "ksub": _I},
                  ["table", "index_table", "id_column", "vector_column"]),
            lambda table, index_table, id_column, vector_column,
                   n_cells=16, m=8, ksub=16: {
                "index_table": index_table,
                "rows": _ivfpq.build_ivfpq_index(
                    c, index_table, c.load_table(table).scan(),
                    id_column, vector_column,
                    n_cells=n_cells, m=m, ksub=ksub,
                ).scan().count(),
            },
        )
        self._add(
            _tool("ivfpq_index_probe",
                  "Top-k by IVFADC: centroid route -> file-pruned scan "
                  "of nprobe cells' codes -> per-cell residual LUT ADC "
                  "-> optional exact re-rank via refine_table",
                  {"index_table": _S, "query_vector": _VEC, "k": _I,
                   "nprobe": _I, "refine_table": _S, "id_column": _S,
                   "vector_column": _S, "refine_factor": _I},
                  ["index_table", "query_vector"]),
            lambda index_table, query_vector, k=10, nprobe=None,
                   refine_table=None, id_column="vec_id",
                   vector_column="embedding", refine_factor=4: rows_of(
                _ivfpq.probe_ivfpq_index(
                    c, index_table, [float(v) for v in query_vector],
                    k=k, nprobe=nprobe,  # None -> pinned ivfpq.nprobe
                    refine_with=(c.load_table(refine_table).scan()
                                 if refine_table else None),
                    id_col=id_column, vec_col=vector_column,
                    refine_factor=refine_factor,
                )
            ),
        )
        self._add(
            _tool("ivfpq_index_extend",
                  "Route a new batch to the frozen centroids and encode "
                  "its residuals against the frozen codebook (map-only)",
                  {"index_table": _S, "batch_table": _S, "id_column": _S,
                   "vector_column": _S},
                  ["index_table", "batch_table", "id_column",
                   "vector_column"]),
            lambda index_table, batch_table, id_column, vector_column: {
                "index_table": index_table,
                "rows_added": _ivfpq.extend_ivfpq_index(
                    c, index_table, c.load_table(batch_table).scan(),
                    id_column, vector_column,
                ),
            },
        )
        self._add(
            _tool("ivfpq_index_stats",
                  "Compression ratio, per-cell list sizes (skewed = "
                  "what a rebalance at max_ratio would split) and code "
                  "utilization (dead codes) for an IVFADC index",
                  {"index_table": _S, "max_ratio": _N}, ["index_table"]),
            lambda index_table, max_ratio=4.0: _ivfpq.ivfpq_index_stats(
                c, index_table, max_ratio=max_ratio),
        )
        self._add(
            _tool("ivfpq_index_rebalance",
                  "Split cells grown past max_ratio x the median code-"
                  "list size via 2-means over PQ RECONSTRUCTIONS (no "
                  "corpus access needed; split rows re-encode against "
                  "the frozen codebook). Pass corpus_table to re-derive "
                  "both halves from SOURCE vectors instead",
                  {"index_table": _S, "max_ratio": _N, "kmeans_iters": _I,
                   "max_splits": _I, "corpus_table": _S, "id_column": _S,
                   "vector_column": _S},
                  ["index_table"]),
            lambda index_table, max_ratio=4.0, kmeans_iters=2,
                   max_splits=16, corpus_table=None, id_column="vec_id",
                   vector_column="embedding": _ivfpq.rebalance_ivfpq_index(
                c, index_table, max_ratio=max_ratio,
                kmeans_iters=kmeans_iters, max_splits=max_splits,
                corpus_df=(c.load_table(corpus_table).scan()
                           if corpus_table else None),
                id_col=id_column, vec_col=vector_column,
            ),
        )
        self._add(
            _tool("ivfpq_recall_sample",
                  "MEASURED recall@k for the composed index: sampled "
                  "queries vs exact brute force (corpus mode when a "
                  "corpus table is given; self-contained routing-only "
                  "reconstruction mode otherwise)",
                  {"index_table": _S, "corpus_table": _S, "id_column": _S,
                   "vector_column": _S, "k": _I, "nprobe": _I,
                   "sample": _I, "refine_factor": _I},
                  ["index_table"]),
            lambda index_table, corpus_table=None, id_column="vec_id",
                   vector_column="embedding", k=10, nprobe=2, sample=8,
                   refine_factor=4:
                _ivfpq.ivfpq_recall_sample(
                    c, index_table,
                    corpus_df=(c.load_table(corpus_table).scan()
                               if corpus_table else None),
                    id_col=id_column, vec_col=vector_column,
                    k=k, nprobe=nprobe, sample=sample,
                    refine_factor=refine_factor,
            ),
        )
        self._add(
            _tool("ivfpq_nprobe_tune",
                  "Measured-recall nprobe schedule for the composed "
                  "index (doubling ladder through ivfpq_recall_sample; "
                  "met=False at full width means raise refine_factor — "
                  "ADC truncation, not routing, is binding)",
                  {"index_table": _S, "corpus_table": _S, "id_column": _S,
                   "vector_column": _S, "target_recall": _N, "k": _I,
                   "sample": _I, "refine_factor": _I, "max_nprobe": _I},
                  ["index_table"]),
            lambda index_table, corpus_table=None, id_column="vec_id",
                   vector_column="embedding", target_recall=0.8, k=10,
                   sample=8, refine_factor=4, max_nprobe=None:
                _ivfpq.tune_nprobe(
                    c, index_table,
                    corpus_df=(c.load_table(corpus_table).scan()
                               if corpus_table else None),
                    id_col=id_column, vec_col=vector_column,
                    target_recall=target_recall, k=k, sample=sample,
                    refine_factor=refine_factor, max_nprobe=max_nprobe,
            ),
        )
        self._add(
            _tool("ivfpq_index_rebuild",
                  "Highest-fidelity reset: re-cluster, RETRAIN the "
                  "codebook, re-encode from source vectors — the only "
                  "remedy for drift beyond the frozen codebook's "
                  "training support (rebalance cannot recover it)",
                  {"index_table": _S, "corpus_table": _S, "id_column": _S,
                   "vector_column": _S, "n_cells": _I, "kmeans_iters": _I},
                  ["index_table", "corpus_table"]),
            lambda index_table, corpus_table, id_column="vec_id",
                   vector_column="embedding", n_cells=None,
                   kmeans_iters=2: _ivfpq.rebuild_ivfpq_index(
                c, index_table, c.load_table(corpus_table).scan(),
                id_col=id_column, vec_col=vector_column,
                n_cells=n_cells, kmeans_iters=kmeans_iters,
            ),
        )

        from .functions.bpe import bpe_train_merges as _bpe_train
        from .functions.dedup_text import span_dedup as _span_dedup

        self._add(
            _tool("span_dedup",
                  "Substring-level exact dedup: remove every cross-doc "
                  "repeated >= n-token span from all but its min-id "
                  "keeper document; returns per-doc token counts and "
                  "the rebuilt text",
                  {"table": _S, "id_column": _S, "text_column": _S,
                   "ngram": _I, "min_df": _I, "max_rows": _I},
                  ["table"]),
            lambda table, id_column="doc_id", text_column="text",
                   ngram=8, min_df=2, max_rows=100: rows_of(
                _span_dedup(
                    c.load_table(table).scan(), id_col=id_column,
                    text_col=text_column, n=ngram, min_df=min_df,
                ).orderBy(id_column), cap=max_rows,
            ),
        )
        self._add(
            _tool("bpe_train",
                  "Train a BPE merge table over a text column (N "
                  "iterated merges; returns rank-ordered pairs with "
                  "corpus token totals after each merge)",
                  {"table": _S, "text_column": _S, "n_merges": _I},
                  ["table"]),
            lambda table, text_column="text", n_merges=8: _bpe_train(
                c.load_table(table).scan(), text_col=text_column,
                n_merges=n_merges,
            ),
        )

        # -- streaming multimodal curation (r13 VERDICT #2: the sink had
        # no tool surface) -------------------------------------------------
        def _curate_multimodal_stream(
            source_dir, table, span_index=None, image_index=None,
            audio_index=None, video_index=None, accounting_table=None,
            checkpoint_dir=None, model_registry=None,
            min_quality_score=None, deterministic_fake=False,
            video_threshold=None, timeout_sec=600,
        ):
            from pyspark.sql import functions as F

            from .operators.curation import CURATED_SCHEMA
            from .streaming.sink import curate_multimodal_stream_to_table

            tbl = c.load_table(table)
            if checkpoint_dir is None:
                # one checkpoint lineage per curated table: repeat
                # calls resume the same batch_id identity, so replays
                # reconcile exactly (see the sink's accounting notes).
                # The readable prefix is NOT collision-free ('a-b' and
                # 'a_b' both squash to 'a_b' — the second table would
                # silently resume the first's FileStreamSource log and
                # skip its input), so the exact name is hashed in.
                import hashlib as _hl

                safe = "".join(
                    ch if ch.isalnum() else "_" for ch in table)
                tag = _hl.md5(table.encode()).hexdigest()[:8]
                checkpoint_dir = self._store(
                    f"curation_ckpt_{safe}_{tag}")
            q = curate_multimodal_stream_to_table(
                self.spark.readStream.schema(CURATED_SCHEMA)
                .parquet(source_dir),
                tbl,
                span_index=(c.load_table(span_index)
                            if span_index else None),
                image_index=(c.load_table(image_index)
                             if image_index else None),
                audio_index=(c.load_table(audio_index)
                             if audio_index else None),
                video_index=(c.load_table(video_index)
                             if video_index else None),
                accounting=(c.load_table(accounting_table)
                            if accounting_table else None),
                model_catalog=c if model_registry else None,
                model_registry=model_registry,
                min_quality_score=min_quality_score,
                deterministic_fake=deterministic_fake,
                video_threshold=video_threshold,
                checkpoint_dir=checkpoint_dir,
                available_now=True,
            )
            if not q.awaitTermination(timeout_sec):
                q.stop()
                raise RuntimeError(
                    f"curation stream did not drain in {timeout_sec}s "
                    f"(checkpoint {checkpoint_dir} resumes where it "
                    "stopped)")
            counts = {
                r["modality"]: int(r["n"])
                for r in tbl.scan().groupBy("modality")
                .agg(F.count(F.lit(1)).alias("n")).collect()
            }
            return {
                "table": table,
                "checkpoint_dir": checkpoint_dir,
                "curated_counts": counts,
                "message": f"stream drained into {table} "
                f"({sum(counts.values())} curated rows total)",
            }

        self._add(
            _tool("curate_multimodal_stream",
                  "Drain a directory of unified-schema parquet files "
                  "(modality, item_id, text, content, format) through "
                  "the streaming multimodal curation sink into a "
                  "curated table: per-lane index-ahead dedup (span/"
                  "image/audio/video), optional pinned-model text "
                  "quality gate, optional cross-lane accounting; "
                  "availableNow semantics — one call lands all pending "
                  "batches, repeat calls resume the checkpoint",
                  {"source_dir": _S, "table": _S, "span_index": _S,
                   "image_index": _S, "audio_index": _S,
                   "video_index": _S, "accounting_table": _S,
                   "checkpoint_dir": _S, "model_registry": _S,
                   "min_quality_score": _N, "deterministic_fake": _B,
                   "video_threshold": _N, "timeout_sec": _I},
                  ["source_dir", "table"]),
            _curate_multimodal_stream,
        )

        def _curation_accounting(accounting_table, batch_id=None):
            from pyspark.sql import functions as F

            rows = c.load_table(accounting_table).scan()
            if batch_id is not None:
                rows = rows.where(F.col("batch_id") == int(batch_id))
            per_modality = [
                {k: (int(v) if isinstance(v, int) else v)
                 for k, v in r.asDict().items()}
                for r in rows.groupBy("modality").agg(
                    F.count(F.lit(1)).alias("batches"),
                    F.sum("arrived").alias("arrived"),
                    F.sum("landed").alias("landed"),
                ).orderBy("modality").collect()
            ]
            detail = [
                r.asDict() for r in
                rows.orderBy("batch_id", "modality").collect()
            ]
            return {
                "accounting_table": accounting_table,
                "per_modality": per_modality,
                "rows": detail,
                "note": "landed is a per-batch lower bound under "
                "crash-replay (at-most-once landing log); curated "
                "membership is the source of truth for corpus size",
            }

        self._add(
            _tool("curation_accounting",
                  "Inspect a curation accounting table: per-modality "
                  "arrived/landed totals plus the per-(batch, "
                  "modality) rows the streaming sink appended",
                  {"accounting_table": _S, "batch_id": _I},
                  ["accounting_table"]),
            _curation_accounting,
        )

        # -- dashboard -----------------------------------------------------
        from .governance.advisor import dashboard as dash
        from .governance.audit import AuditLog as _AuditLog
        from .governance.queries_store import SavedQueries as _SavedQueries

        self._add(
            _tool("dashboard", "All-tables health overview", {}, []),
            # same store files the extended registry uses — the
            # dashboard reads them, it never writes
            lambda: dash(c, stats_cache,
                         audit=_AuditLog(self._store("audit.ndjson")),
                         saved=_SavedQueries(self._store("queries.json"))),
        )

        self._register_extended_tools(stats_cache, vm, mm, views, matviews,
                                      pipelines, lineage, wm)

    def _register_extended_tools(
        self, stats_cache, vm, mm, views, matviews, pipelines, lineage, wm
    ) -> None:
        """The reference's full 155-tool surface (reference server.py:
        50-1949) — thin wrappers over engine managers. Kept out of
        `_register_tools` only for readability; same flat registry."""
        from .operators import crud
        from .operators.joins import join_to_table, suggest_joins
        from .operators.sampling_ops import sample_stats, sample_to_table
        from .sources import backup_clone as bc
        from .sources import io as lio
        from .governance import advisor, cdc, schema_evolution as se
        from .governance.audit import AuditLog
        from .governance.auto_refresh import AutoRefreshManager
        from .governance.config import ConfigManager
        from .governance.contracts import ContractManager
        from .governance.policies import (
            MaintenanceManager, NotificationManager, RetentionManager, SlaManager,
        )
        from .governance.queries_store import QueryCache, SavedQueries
        from .governance.stats import (
            QualityMonitor, compute_table_stats, detect_anomalies, quality_score,
        )
        from .governance.tagging import CatalogMetadata, TagManager
        from pyspark.sql import functions as F

        c, eng = self.catalog, self.engine
        audit = AuditLog(self._store("audit.ndjson"))
        config = ConfigManager(self._store("config.json"))
        saved = SavedQueries(self._store("queries.json"))
        cache = QueryCache(self._store("query_cache.json"))
        retention = RetentionManager(self._store("retention.json"))
        maintenance = MaintenanceManager(self._store("maintenance.json"))
        sla = SlaManager(self._store("sla.json"))
        notify = NotificationManager(self._store("notifications.json"))
        tags = TagManager(self._store("tags.json"))
        meta = CatalogMetadata(self._store("catalog_meta.json"))
        contracts = ContractManager(self._store("contracts.json"))
        auto_refresh = AutoRefreshManager(
            self._store("auto_refresh.json"), lineage,
            matviews=matviews, pipelines=pipelines, query_cache=cache,
        )
        eng.history = saved
        eng.query_cache = cache

        ROWS_CAP = 1000  # RPC result cap; truncation checks share it

        def rows_of(df, cap=ROWS_CAP):
            return [r.asDict(recursive=True) for r in df.limit(cap).collect()]

        def T(name):
            return c.load_table(name)

        # -- automatic audit on mutating tools (reference records every
        # CRUD through the audit log) --------------------------------------
        def _audited(tool_name: str, op: str, count_key: str | None):
            spec, fn = self._tools[tool_name]

            def wrapped(**kw):
                res = fn(**kw)
                n = 0
                if isinstance(res, dict):
                    if count_key and count_key in res:
                        n = res[count_key] or 0
                    elif op == "upsert":
                        n = (res.get("updated", 0) or 0) + (res.get("inserted", 0) or 0)
                audit.record(kw.get("table", ""), op, rows_affected=n, source="mcp")
                return res

            self._tools[tool_name] = (spec, wrapped)

        # validation-on-write (reference insert/update consult the rule
        # store and raise before any data lands, tests/test_validation.py
        # TestInsertValidation/TestUpdateValidation). Zero overhead when
        # no rules exist for the table; wrapped BEFORE audit so rejected
        # writes never produce an audit entry.
        def _rules_for(t) -> str | None:
            for key in (f"{t.namespace}.{t.table}", t.table):
                if vm.list_rules(key):
                    return key
            return None

        def _validated(tool_name: str):
            from pyspark.sql import functions as F

            spec, fn = self._tools[tool_name]

            def wrapped(**kw):
                t = c.load_table(kw["table"])
                key = _rules_for(t)
                if key is not None:
                    if "rows" in kw:
                        batch = crud.rows_to_df(t, kw["rows"])
                        # unique-vs-existing applies to pure inserts only:
                        # an upsert legitimately re-sends existing keys
                        existing = t.scan() if tool_name == "insert" else None
                    else:  # update: validate the post-update image of
                        # the matched rows (batch-local rules only)
                        cond = F.expr(kw["filter"])
                        updates = kw["updates"]
                        cols = [
                            F.lit(updates[f.name]).cast(f.dataType).alias(f.name)
                            if f.name in updates
                            else F.col(f.name)
                            for f in t.schema().fields
                        ]
                        batch = t.scan().where(cond).select(*cols)
                        existing = None
                    vm.enforce(key, batch, existing=existing)
                return fn(**kw)

            self._tools[tool_name] = (spec, wrapped)

        _validated("insert")
        _validated("update")
        _validated("upsert")
        # replace_where / overwrite_partitions carry "rows" payloads
        # like insert; uniqueness-vs-existing is skipped (the incoming
        # slice legitimately replaces existing keys)
        _validated("replace_where")
        _validated("overwrite_partitions")

        _audited("insert", "insert", "inserted")
        _audited("update", "update", "updated")
        _audited("delete", "delete", "deleted")
        _audited("upsert", "upsert", None)
        _audited("replace_where", "replace_where", "inserted_rows")
        _audited("overwrite_partitions", "overwrite_partitions",
                 "inserted_rows")
        _audited("add_files", "add_files", None)
        _audited("import_file", "import", "rows")
        _audited("export_table", "export", "rows")
        _audited("rollback", "rollback", None)
        _audited("compact", "compact", None)

        # -- namespaces ----------------------------------------------------
        self._add(_tool("list_namespaces", "List namespaces", {}, []),
                  lambda: c.list_namespaces())
        self._add(_tool("create_namespace", "Create a namespace (optional properties)",
                        {"name": _S, "properties": {"type": "object"}}, ["name"]),
                  lambda name, properties=None: c.create_namespace(
                      name, properties=properties))
        self._add(_tool("drop_namespace", "Drop an empty namespace", {"name": _S}, ["name"]),
                  lambda name: c.drop_namespace(name))
        self._add(_tool("get_namespace_properties", "Namespace properties + tables",
                        {"name": _S}, ["name"]),
                  lambda name: {"namespace": name,
                                "properties": c.namespace_properties(name),
                                "tables": c.list_tables(name)})

        # -- table admin ---------------------------------------------------
        def _alter(table, action, column=None, type=None, new_name=None):
            """Reference alter_table dispatcher (schema.py): guard raises
            use the reference's messages."""
            t = T(table)
            if action == "add_column":
                if not type:
                    raise ValueError("column_type is required for add_column")
                t.add_column(column, type)
                msg = f"Added column '{column}' ({type})"
            elif action == "drop_column":
                t.drop_column(column)
                msg = f"Dropped column '{column}'"
            elif action == "rename_column":
                if not new_name:
                    raise ValueError("new_name is required for rename_column")
                t.rename_column(column, new_name)
                msg = f"Renamed column '{column}' to '{new_name}'"
            else:
                raise ValueError(f"Unknown operation '{action}'")
            return {**t.meta()["schema"], "message": msg}

        self._add(
            _tool("alter_table", "Add/drop/rename a column",
                  {"table": _S, "action": _S, "column": _S, "type": _S, "new_name": _S},
                  ["table", "action"]),
            _alter,
        )
        self._add(
            _tool("set_table_property", "Set a table property",
                  {"table": _S, "key": _S, "value": _S}, ["table", "key", "value"]),
            lambda table, key, value: {"message": T(table).set_property(key, value),
                                       "properties": T(table).properties()},
        )
        self._add(
            _tool("unset_table_property", "Remove a table property (raises if unset)",
                  {"table": _S, "key": _S}, ["table", "key"]),
            lambda table, key: {"message": T(table).remove_property(key),
                                "properties": T(table).properties()},
        )
        self._add(
            _tool("get_table_property", "One table property value (null if unset)",
                  {"table": _S, "key": _S}, ["table", "key"]),
            lambda table, key: {"key": key, "value": T(table).get_property(key)},
        )
        self._add(_tool("refresh", "Re-register table views after external changes", {}, []),
                  lambda: (eng.refresh(), {"refreshed": True})[1])
        self._add(
            _tool("batch", "Sequential CRUD ops; stop on first failure",
                  {"table": _S, "operations": {"type": "array"}}, ["table", "operations"]),
            lambda table, operations: crud.execute_batch(
                [(T(table), op) for op in operations]
            ),
        )
        self._add(
            _tool("maintenance_status", "File stats + whether maintenance is needed",
                  {"table": _S}, ["table"]),
            lambda table: {**T(table).maintenance_status(),
                           "stats": T(table).file_stats(),
                           "check": maintenance.check_needed(T(table))},
        )
        self._add(
            _tool("get_partitions", "Partition spec + distinct values with file counts",
                  {"table": _S}, ["table"]),
            lambda table: {**T(table).partitions_info(),
                           "partitions": T(table).partition_stats()},
        )

        # -- schema evolution (reference server.py:1074-1130 contract:
        # snapshot-addressed diff/migration, proposed-changes compat) ------
        self._add(_tool("schema_history", "Schema versions over time", {"table": _S}, ["table"]),
                  lambda table: se.get_schema_history(T(table)))
        self._add(
            _tool("schema_diff", "Column diff between two snapshots' schemas",
                  {"table": _S, "from_snapshot": _I, "to_snapshot": _I},
                  ["table"]),
            lambda table, from_snapshot=None, to_snapshot=None: se.schema_diff_snapshots(
                T(table), from_snapshot, to_snapshot),
        )
        self._add(
            _tool("schema_migration", "alter_table steps to migrate between versions",
                  {"table": _S, "from_snapshot": _I, "to_snapshot": _I},
                  ["table"]),
            lambda table, from_snapshot=None, to_snapshot=None: se.generate_migration(
                T(table), from_snapshot, to_snapshot),
        )
        self._add(
            _tool("schema_compatibility", "Verdict for proposed schema changes",
                  {"table": _S, "changes": {"type": "array"}},
                  ["table", "changes"]),
            lambda table, changes: se.check_schema_compatibility(T(table), changes),
        )
        self._add(
            _tool("schema_diff_versions", "Column diff between two schema VERSIONS "
                  "(finer-grained than snapshots — every version is addressable)",
                  {"table": _S, "from_version": _I, "to_version": _I},
                  ["table", "from_version", "to_version"]),
            lambda table, from_version, to_version: se.diff_schemas(
                T(table), from_version, to_version),
        )

        # -- format config / conversion (S11-S13 ORC substitution) --------
        self._add(
            _tool("get_format_config", "Resolved write format for a table",
                  {"table": _S}, []),
            lambda table=None: {"format": config.resolve_write_format(c, table)},
        )
        self._add(
            _tool("set_format_config", "Set default write format globally or per table",
                  {"format": _S, "table": _S}, ["format"]),
            lambda format, table=None: (
                config.set_table(table, "write.format.default", format)
                if table else config.set_global("write.format.default", format),
                {"format": format, "scope": table or "global"},
            )[1],
        )
        self._add(
            _tool("convert_format", "Convert a columnar file parquet<->orc",
                  {"source": _S, "dest": _S}, ["source", "dest"]),
            lambda source, dest: lio.convert_file(self.spark, source, dest),
        )
        self._add(
            _tool("query_file", "SQL over a standalone parquet/orc/csv/json file",
                  {"path": _S, "sql": _S, "view_name": _S}, ["path", "sql"]),
            lambda path, sql, view_name="file_view": rows_of(
                eng.query_file(path, sql, view_name)),
        )
        self._add(
            _tool("table_to_orc", "Export a table snapshot as ORC",
                  {"table": _S, "path": _S}, ["table", "path"]),
            lambda table, path: lio.table_to_orc(T(table), path),
        )

        # -- saved queries + history --------------------------------------
        self._add(
            _tool("save_query", "Save a named SQL query (overwrite to replace)",
                  {"name": _S, "sql": _S, "description": _S, "overwrite": _B},
                  ["name", "sql"]),
            lambda name, sql, description=None, overwrite=False: saved.save(
                name, sql, description, overwrite=overwrite),
        )
        self._add(_tool("list_saved_queries", "List saved queries", {}, []),
                  lambda: saved.list())
        self._add(
            _tool("run_saved_query", "Execute a saved query by name",
                  {"name": _S, "max_rows": _I}, ["name"]),
            lambda name, max_rows=100: rows_of(
                eng.execute(saved.get(name)["sql"], max_rows=max_rows)),
        )
        self._add(_tool("delete_saved_query", "Delete a saved query", {"name": _S}, ["name"]),
                  lambda name: saved.delete(name))
        self._add(_tool("get_query_history", "Recent executed queries", {"limit": _I}, []),
                  lambda limit=20: saved.history(limit))
        self._add(_tool("clear_query_history", "Clear the query history", {}, []),
                  lambda: saved.clear_history())

        # -- validation (rest) / audit ------------------------------------
        self._add(_tool("list_validation_rules", "Rules for a table", {"table": _S}, ["table"]),
                  lambda table: vm.list_rules(table.split(".", 1)[-1]))
        self._add(
            _tool("remove_validation_rule", "Remove a rule by name",
                  {"table": _S, "name": _S}, ["table", "name"]),
            lambda table, name: {"removed": vm.remove_rule(table.split(".", 1)[-1], name)},
        )
        self._add(
            _tool("get_audit_log", "Query the audit log",
                  {"table": _S, "operation": _S, "limit": _I,
                   "since": _S}, []),
            lambda table=None, operation=None, limit=100, since=None: audit.query(
                table=table, operation=operation, limit=limit, since=since),
        )
        self._add(_tool("clear_audit_log", "Clear audit entries (older_than "
                        "'30d'/'24h'/'90m'=minutes/'45s'/ISO)", {"older_than": _S}, []),
                  lambda older_than=None: audit.clear(older_than))

        # -- stats / anomalies / quality ----------------------------------
        self._add(_tool("get_table_stats", "Cached table stats", {"table": _S}, ["table"]),
                  lambda table: stats_cache.get(T(table)))
        self._add(_tool("refresh_table_stats", "Force stats recompute", {"table": _S}, ["table"]),
                  lambda table: stats_cache.get(T(table), refresh=True))
        self._add(
            _tool("get_all_stats", "Stats for every table", {}, []),
            lambda: {t: stats_cache.get(T(t)) for t in c.list_tables()},
        )
        self._add(
            _tool("detect_anomalies", "Stat drift between cached and live stats",
                  {"table": _S}, ["table"]),
            # peek under the cache's QUALIFIED key — a bare-name peek
            # always missed, and the get() fallback overwrote the
            # baseline with fresh stats (anomalies compared fresh vs
            # fresh: always empty, baseline destroyed)
            lambda table: (lambda t: detect_anomalies(
                stats_cache.peek(f"{t.namespace}.{t.table}")
                or stats_cache.get(t),
                compute_table_stats(t)))(T(table)),
        )
        self._add(
            _tool("quality_report", "Score + per-column issues",
                  {"table": _S}, ["table"]),
            lambda table: quality_score(compute_table_stats(T(table))),
        )
        self._add(
            _tool("refresh_all_stats", "Recompute stats for every table", {}, []),
            lambda: stats_cache.refresh([T(t) for t in c.list_tables()]),
        )
        quality = QualityMonitor(self._store("quality.json"))
        self._add(
            _tool("compute_quality_score",
                  "Quality score with rule compliance, saved to history",
                  {"table": _S}, ["table"]),
            lambda table: quality.score(T(table), validation=vm),
        )
        self._add(
            _tool("quality_history", "Historical quality scores",
                  {"table": _S}, ["table"]),
            lambda table: quality.history(
                table if "." in table else f"default.{table}"),
        )
        self._add(
            _tool("quality_report_all",
                  "Per-table quality scores + anomaly counts (one or all tables)",
                  {"table": _S}, []),
            lambda table=None: quality.report(
                c, table_name=table, validation=vm, stats_cache=stats_cache),
        )

        # -- retention / maintenance policies ------------------------------
        self._add(
            _tool("set_retention_policy", "Snapshot retention policy",
                  {"table": _S, "max_snapshot_age_hours": _N,
                   "max_snapshot_count": _I, "min_snapshots_to_keep": _I}, ["table"]),
            lambda table, **kw: retention.set_policy(table, **kw),
        )
        self._add(_tool("list_retention_policies", "All retention policies", {}, []),
                  lambda: retention.list_policies())
        self._add(
            _tool("evaluate_retention", "Apply (or dry-run) retention for a table",
                  {"table": _S, "dry_run": _B}, ["table"]),
            lambda table, dry_run=True: retention.apply(T(table), dry_run=dry_run),
        )
        self._add(
            _tool("set_maintenance_policy", "Compaction/expiry thresholds",
                  {"table": _S, "auto_compact_threshold": _I,
                   "auto_expire_retain_last": _I, "auto_cleanup_orphans": _B,
                   "auto_compact_delete_files": _I,
                   "auto_rewrite_delete_files": _I,
                   "auto_analyze": _B,
                   "auto_rebalance_index": _N,
                   "auto_sync_index": _B,
                   "auto_rebuild_index": _N,
                   "auto_retrain_model": _B,
                   "auto_tune_nprobe": _N},
                  ["table"]),
            lambda table, **kw: maintenance.set_policy(table, **kw),
        )
        self._add(_tool("check_maintenance", "Is maintenance needed?", {"table": _S}, ["table"]),
                  lambda table: maintenance.check_needed(T(table)))
        self._add(
            _tool("run_maintenance", "Run needed maintenance actions",
                  {"table": _S, "dry_run": _B}, ["table"]),
            lambda table, dry_run=False: maintenance.run(T(table), dry_run=dry_run),
        )

        # -- catalog enrichment / glossary / tags -------------------------
        self._add(
            _tool("set_column_description", "Describe a column",
                  {"table": _S, "column": _S, "description": _S},
                  ["table", "column", "description"]),
            lambda table, column, description:
                meta.set_column_description(table, column, description),
        )
        self._add(
            _tool("classify_column", "Classify a column (pii/sensitive/public...)",
                  {"table": _S, "column": _S, "classification": _S},
                  ["table", "column", "classification"]),
            lambda table, column, classification:
                meta.classify_column(table, column, classification),
        )
        self._add(
            _tool("get_enriched_schema", "Schema + descriptions + classifications",
                  {"table": _S}, ["table"]),
            lambda table: meta.enrich_schema(T(table)),
        )
        self._add(_tool("get_pii_columns", "Columns classified as PII", {"table": _S}, []),
                  lambda table=None: meta.pii_columns(table))
        self._add(
            _tool("add_glossary_term", "Define a business glossary term",
                  {"term": _S, "definition": _S, "aliases": {"type": "array"}},
                  ["term", "definition"]),
            lambda term, definition, aliases=None: (
                meta.add_glossary_term(term, definition, aliases),
                {"term": term})[1],
        )
        self._add(_tool("search_glossary", "Look up a glossary term or alias",
                        {"term": _S}, ["term"]),
                  lambda term: meta.lookup_term(term) or {"term": term, "found": False})
        self._add(_tool("tag_table", "Add a tag", {"table": _S, "tag": _S}, ["table", "tag"]),
                  lambda table, tag: {"tags": tags.add_tag(table, tag)})
        self._add(_tool("untag_table", "Remove a tag", {"table": _S, "tag": _S}, ["table", "tag"]),
                  lambda table, tag: {"tags": tags.remove_tag(table, tag)})
        self._add(_tool("search_by_tag", "Tables carrying a tag (exact membership)",
                        {"tag": _S}, ["tag"]),
                  lambda tag: tags.search_by_tag(tag))
        self._add(
            _tool("set_table_description", "Describe a table",
                  {"table": _S, "description": _S}, ["table", "description"]),
            lambda table, description: (tags.set_description(table, description),
                                        tags.info(table))[1],
        )
        self._add(_tool("bookmark_table", "Bookmark/unbookmark a table",
                        {"table": _S, "value": _B}, ["table"]),
                  lambda table, value=True: (tags.bookmark(table, value),
                                             {"bookmarks": tags.bookmarks()})[1])
        self._add(_tool("search_tables", "Search tables by name/tag/description",
                        {"term": _S}, ["term"]),
                  lambda term: tags.search(term, c.list_tables()))

        # -- masking (rest) -----------------------------------------------
        self._add(_tool("list_masking_policies", "Masking policies", {"table": _S}, []),
                  lambda table=None: mm.list_policies(table))
        self._add(
            _tool("remove_masking_policy", "Remove a masking policy",
                  {"table": _S, "column": _S}, ["table", "column"]),
            lambda table, column: mm.remove_policy(table, column),
        )
        self._add(
            _tool("preview_masking", "Preview a table with masking applied",
                  {"table": _S, "max_rows": _N}, ["table"]),
            lambda table, max_rows=5: mm.preview(
                _scan_or_missing(c, table), table, max_rows=int(max_rows)
            ),
        )
        self._add(
            _tool("query_with_masking", "Run SQL with masking policies applied",
                  {"sql": _S, "table": _S}, ["sql"]),
            lambda sql, table=None: rows_of(mm.apply(eng.execute(sql), table)),
        )

        # -- watermarks / incremental -------------------------------------
        self._add(
            _tool("get_watermark", "Watermark for (pipeline, table)",
                  {"pipeline": _S, "table": _S}, ["pipeline", "table"]),
            lambda pipeline, table: wm.get(pipeline, table),
        )
        self._add(_tool("list_watermarks", "All watermarks", {"pipeline": _S}, []),
                  lambda pipeline=None: wm.list(pipeline))
        self._add(
            _tool("reset_watermark", "Reset pipeline watermarks",
                  {"pipeline": _S, "table": _S}, ["pipeline"]),
            lambda pipeline, table=None: wm.reset(pipeline, table),
        )
        from .governance.incremental import run_incremental_pipeline

        self._add(
            _tool("run_pipeline_incremental",
                  "Incremental pipeline: per step, read new rows, run SQL, append",
                  {"pipeline": _S, "steps": {"type": "array"}},
                  ["pipeline", "steps"]),
            lambda pipeline, steps: run_incremental_pipeline(
                c, wm, pipeline, steps, eng),
        )

        # -- SLA / notifications ------------------------------------------
        self._add(
            _tool("set_sla", "Freshness/quality/row-count thresholds",
                  {"table": _S, "max_staleness_hours": _N, "min_quality_score": _N,
                   "min_row_count": _I, "max_null_pct": _N}, ["table"]),
            lambda table, **kw: sla.set_sla(table, **kw),
        )
        self._add(_tool("list_slas", "All SLA policies", {}, []),
                  lambda: sla.list_slas())
        self._add(
            _tool("check_sla", "Check a table against its SLA now",
                  {"table": _S}, ["table"]),
            # one stats pass feeds both the SLA check and the score —
            # two compute_table_stats calls were two full table scans
            lambda table: (lambda t, s: sla.check(t, s, quality_score(s)))(
                T(table), compute_table_stats(T(table))),
        )
        self._add(_tool("get_sla_history", "Past SLA checks", {"table": _S}, ["table"]),
                  lambda table: sla.history(table))
        def _handler_config(kind: str, target: str | None) -> dict:
            """Map the tool's flat `target` onto the handler-type's
            required config key; log handlers default to a file next to
            the notification store."""
            if kind == "webhook":
                return {"url": target} if target else {}
            if kind == "shell":
                return {"command": target} if target else {}
            return {"file": target or self._store("events.log")}

        self._add(
            _tool("register_notification", "Handler for table events",
                  {"table": _S, "event": _S, "kind": _S, "target": _S},
                  ["table", "event"]),
            lambda table, event, kind="log", target=None: notify.add_handler(
                table, event, kind, _handler_config(kind, target)),
        )
        self._add(_tool("list_notifications", "Registered handlers", {"table": _S}, []),
                  lambda table=None: notify.list_handlers(table))
        self._add(
            _tool("remove_notification", "Remove handlers for (table, event)",
                  {"table": _S, "event": _S}, ["table", "event"]),
            lambda table, event: {"removed": notify.remove_matching(table, event)},
        )
        self._add(
            _tool("test_notification", "Send a test event to one handler",
                  {"handler_id": _S}, ["handler_id"]),
            lambda handler_id: notify.send_test_event(handler_id),
        )
        self._add(
            _tool("get_notification_history", "Fired notifications",
                  {"table": _S, "limit": _I}, []),
            lambda table=None, limit=100: notify.history(table, limit),
        )
        self._add(
            _tool("fire_event", "Fire a table event through registered handlers",
                  {"table": _S, "event": _S, "payload": {"type": "object"}},
                  ["table", "event"]),
            lambda table, event, payload=None: notify.fire_event(table, event, payload),
        )

        # -- advisor / optimizer ------------------------------------------
        def _all_stats():
            return {t: stats_cache.get(T(t)) for t in c.list_tables()}

        self._add(_tool("analyze_query_patterns", "Hot tables/filters from history", {}, []),
                  lambda: advisor.analyze_patterns(saved.history(1000)))
        self._add(
            _tool("suggest_optimizations", "Partitioning + matview suggestions", {}, []),
            lambda: {
                "partitioning": advisor.suggest_partitioning(saved.history(1000), _all_stats()),
                "materialized_views": advisor.suggest_matviews(saved.history(1000)),
            },
        )
        self._add(_tool("optimization_report", "Full optimizer report", {}, []),
                  lambda: advisor.optimization_report(saved.history(1000), _all_stats()))
        self._add(_tool("estimate_query_cost", "Heuristic cost of a SQL query",
                        {"sql": _S}, ["sql"]),
                  lambda sql: advisor.estimate_cost(sql, _all_stats()))

        # -- query cache ---------------------------------------------------
        self._add(_tool("get_cache_stats", "Hit/miss counters", {}, []),
                  lambda: cache.stats())
        self._add(_tool("list_cached_queries", "Cached query entries", {"limit": _I}, []),
                  lambda limit=20: cache.list(limit))
        self._add(
            _tool("invalidate_cache", "Invalidate by table, or everything",
                  {"table": _S}, []),
            lambda table=None: {"invalidated": (
                cache.invalidate_table(table) if table else cache.invalidate_all())},
        )
        self._add(
            _tool("set_cache_policy", "Enable/disable caching for a table",
                  {"table": _S, "enabled": _B}, ["table", "enabled"]),
            lambda table, enabled: (cache.set_policy(table, enabled),
                                    {"table": table, "enabled": enabled})[1],
        )

        # -- backup / clone ------------------------------------------------
        self._add(
            _tool("backup_table", "Archive a table snapshot",
                  {"table": _S, "archive_path": _S, "as_of": _S},
                  ["table", "archive_path"]),
            lambda table, archive_path, as_of=None: bc.backup_table(
                T(table), archive_path, as_of),
        )
        self._add(_tool("verify_backup", "Check archive integrity",
                        {"archive_path": _S}, ["archive_path"]),
                  lambda archive_path: bc.verify_backup(archive_path))
        self._add(
            _tool("restore_table", "Restore a table from an archive",
                  {"archive_path": _S, "target": _S, "if_exists": _S},
                  ["archive_path", "target"]),
            # if_exists is a MODE string — only 'overwrite'/'replace'
            # grant overwrite (a truthy 'fail' must not)
            lambda archive_path, target, if_exists="fail": bc.restore_table(
                c, archive_path, target,
                overwrite=if_exists in ("overwrite", "replace")),
        )
        self._add(
            _tool("backup_namespace", "Archive every table in a namespace",
                  {"namespace": _S, "archive_path": _S},
                  ["namespace", "archive_path"]),
            lambda namespace, archive_path: bc.backup_namespace(
                c, namespace, archive_path),
        )
        self._add(
            _tool("restore_namespace", "Restore a namespace archive",
                  {"archive_path": _S, "overwrite": _B}, ["archive_path"]),
            lambda archive_path, overwrite=False: bc.restore_namespace(
                c, archive_path, overwrite=overwrite),
        )
        self._add(
            _tool("list_backups", "Archives in a directory with metadata",
                  {"directory": _S}, ["directory"]),
            lambda directory: bc.list_backups(directory),
        )
        _clone_reg = self._store("clones.json")
        self._add(
            _tool("clone_table", "Zero-copy-ish clone for experimentation",
                  {"table": _S, "clone_name": _S, "as_of": _S},
                  ["table", "clone_name"]),
            lambda table, clone_name, as_of=None: bc.clone_table(
                c, table, clone_name, as_of=as_of, registry_path=_clone_reg),
        )
        self._add(
            _tool("list_clones", "Registered clones with sources", {}, []),
            lambda: bc.CloneRegistry(_clone_reg).list(),
        )
        self._add(
            _tool("promote_clone", "Replace target with clone data",
                  {"clone_name": _S, "target": _S}, ["clone_name", "target"]),
            lambda clone_name, target: bc.promote_clone(
                c, clone_name, target, registry_path=_clone_reg),
        )
        self._add(_tool("discard_clone", "Drop a clone", {"clone_name": _S}, ["clone_name"]),
                  lambda clone_name: bc.discard_clone(
                      c, clone_name, registry_path=_clone_reg))

        # -- dedup over tables --------------------------------------------
        from .operators import dedup_ops

        self._add(
            _tool("find_duplicates", "Duplicate groups by columns (default all)",
                  {"table": _S, "columns": {"type": "array"}}, ["table"]),
            lambda table, columns=None: dedup_ops.find_duplicates(
                T(table), columns)["groups"],
        )
        self._add(
            _tool("dedup_summary", "Total vs unique vs duplicate rows",
                  {"table": _S, "columns": {"type": "array"}}, ["table"]),
            lambda table, columns=None: dedup_ops.dedup_summary(
                T(table), columns),
        )
        self._add(
            _tool("remove_duplicates", "Keep one row per key (new snapshot)",
                  {"table": _S, "columns": {"type": "array"}, "dry_run": _B},
                  ["table"]),
            lambda table, columns=None, dry_run=False: dedup_ops.remove_duplicates(
                T(table), columns, dry_run=dry_run),
        )
        self._add(
            _tool("dedup_report", "Duplicate groups + affected-row estimate",
                  {"table": _S, "columns": {"type": "array"}}, ["table"]),
            lambda table, columns=None: (lambda r: {
                "duplicate_groups": r["duplicate_groups"],
                "extra_rows": r["duplicate_count"] - r["duplicate_groups"],
                "examples": r["groups"][:10],
            })(dedup_ops.find_duplicates(T(table), columns)),
        )

        # -- CDC (rest) ----------------------------------------------------
        self._add(
            _tool("get_change_log", "Per-snapshot-pair change summaries",
                  {"table": _S, "limit": _I, "key_columns": {"type": "array"}},
                  ["table"]),
            lambda table, limit=10, key_columns=None: cdc.change_log(
                T(table), limit, key_columns),
        )
        self._add(
            _tool("get_change_summary", "Counts + affected columns between snapshots",
                  {"table": _S, "from_snapshot": _I, "to_snapshot": _I,
                   "key_columns": {"type": "array"}},
                  ["table", "from_snapshot", "to_snapshot"]),
            lambda table, from_snapshot, to_snapshot, key_columns=None:
                cdc.change_summary(T(table), from_snapshot, to_snapshot, key_columns),
        )
        self._add(
            _tool("export_changes", "CDC result as JSON or CSV text",
                  {"table": _S, "from_snapshot": _I, "to_snapshot": _I,
                   "file_format": _S, "key_columns": {"type": "array"}},
                  ["table", "from_snapshot", "to_snapshot"]),
            lambda table, from_snapshot, to_snapshot, file_format="json",
                   key_columns=None: cdc.export_changes(
                cdc.capture_changes(T(table), from_snapshot, to_snapshot, key_columns),
                file_format),
        )
        self._add(
            _tool("replay_changes", "Apply captured changes to another table",
                  {"source": _S, "target": _S, "from_snapshot": _I, "to_snapshot": _I,
                   "key_columns": {"type": "array"}},
                  ["source", "target", "from_snapshot", "to_snapshot"]),
            lambda source, target, from_snapshot, to_snapshot, key_columns=None:
                cdc.replay_changes(T(target), cdc.capture_changes(
                    T(source), from_snapshot, to_snapshot, key_columns)),
        )

        # -- sampling ------------------------------------------------------
        self._add(
            _tool("random_sample", "Bernoulli sample of a table",
                  {"table": _S, "fraction": _N, "seed": _I}, ["table", "fraction"]),
            lambda table, fraction, seed=42: rows_of(
                T(table).scan().sample(fraction=fraction, seed=seed)),
        )
        self._add(
            _tool("stratified_sample", "Per-stratum sample fractions",
                  {"table": _S, "column": _S, "fraction": _N, "seed": _I},
                  ["table", "column", "fraction"]),
            lambda table, column, fraction, seed=42: rows_of(
                (lambda df: df.sampleBy(
                    column,
                    {r[0]: fraction for r in
                     df.select(column).distinct().limit(1000).collect()},
                    seed=seed))(T(table).scan())),
        )
        self._add(
            _tool("sample_to_table", "Persist a sample as a new table",
                  {"table": _S, "target": _S, "fraction": _N, "method": _S,
                   "seed": _I}, ["table", "target", "fraction"]),
            lambda table, target, fraction, method="bernoulli", seed=42:
                sample_to_table(c, table, target, fraction, seed=seed, method=method),
        )
        self._add(
            _tool("get_sample_stats", "Sampled vs full per-column stats",
                  {"table": _S, "sample_table": _S}, ["table", "sample_table"]),
            lambda table, sample_table: sample_stats(
                T(table).scan(), T(sample_table).scan()),
        )
        from .functions import importance as _imp
        from .operators.sampling_ops import (
            deterministic_shuffle as _det_shuffle,
            shuffle_to_table as _shuffle_to_table,
        )

        self._add(
            _tool("importance_score",
                  "DSIR-style hashed n-gram importance: score every "
                  "document's likeness to a target slice (SQL boolean "
                  "predicate) via md5-bucketed bigram profiles — BIGINT "
                  "deterministic scores, highest first",
                  {"table": _S, "id_column": _S, "text_column": _S,
                   "target_predicate": _S, "n_buckets": _I, "max_rows": _I},
                  ["table", "id_column", "text_column", "target_predicate"]),
            lambda table, id_column, text_column, target_predicate,
                   n_buckets=256, max_rows=1000: rows_of(
                _imp.hashed_ngram_importance(
                    T(table).scan(), id_column, text_column,
                    target_predicate, n_buckets,
                ).orderBy(F.desc("importance_score"), id_column),
                cap=max_rows,
            ),
        )
        self._add(
            _tool("importance_resample",
                  "Keep the quota most-target-like documents by hashed "
                  "n-gram importance (deterministic id tie-break) — the "
                  "data-selection step between curation and training",
                  {"table": _S, "id_column": _S, "text_column": _S,
                   "target_predicate": _S, "quota": _I, "n_buckets": _I,
                   "max_rows": _I},
                  ["table", "id_column", "text_column", "target_predicate",
                   "quota"]),
            # the RPC response is capped like every row-returning tool
            # (an uncapped quota-sized collect is a driver-memory risk);
            # quota-scale selections land via sample_to_table-style
            # materialization, not a tool payload
            lambda table, id_column, text_column, target_predicate, quota,
                   n_buckets=256, max_rows=1000: rows_of(
                _imp.importance_resample(
                    T(table).scan(), id_column, text_column,
                    target_predicate, quota, n_buckets,
                ),
                cap=min(int(quota), int(max_rows)),
            ),
        )
        self._add(
            _tool("importance_weights_build",
                  "Freeze a hashed n-gram target profile as a weights "
                  "table (train-once half of train-once/apply-online: "
                  "batch backfills and the streaming importance filter "
                  "score against it without re-reading the target "
                  "corpus; snapshots version the profile)",
                  {"table": _S, "weights_table": _S, "id_column": _S,
                   "text_column": _S, "target_predicate": _S,
                   "n_buckets": _I},
                  ["table", "weights_table", "id_column", "text_column",
                   "target_predicate"]),
            lambda table, weights_table, id_column, text_column,
                   target_predicate, n_buckets=256: (
                lambda t: {
                    "weights_table": weights_table,
                    "n_buckets": n_buckets,
                    "buckets": t.scan().count(),
                    "nonzero_weights":
                        t.scan().where("weight > 0").count(),
                    "target_predicate": target_predicate,
                })(_imp.persist_importance_weights(
                    c, weights_table, T(table).scan(), id_column,
                    text_column, target_predicate, n_buckets)),
        )
        self._add(
            _tool("corpus_shuffle",
                  "Deterministic epoch shuffle: md5-keyed pseudorandom "
                  "permutation with explicit hash-mod shards — same "
                  "order on any cluster/partitioning. With target: land "
                  "it as a table partitioned by shard, pos-sorted; "
                  "without: preview the (shard, pos) assignment",
                  {"table": _S, "id_column": _S, "seed": _I,
                   "n_shards": _I, "target": _S, "max_rows": _I},
                  ["table", "id_column"]),
            lambda table, id_column, seed=7, n_shards=8, target=None,
                   max_rows=100: (
                _shuffle_to_table(c, table, target, id_column,
                                  seed=seed, n_shards=n_shards)
                if target else rows_of(
                    _det_shuffle(T(table).scan(), id_column, seed, n_shards)
                    .orderBy("shard", "pos"),
                    cap=max_rows,
                )
            ),
        )

        # -- auto-refresh --------------------------------------------------
        self._add(
            _tool("set_auto_refresh", "Configure cascade refresh for a table",
                  {"table": _S, "enabled": _B, "cascade_depth": _I,
                   "refresh_matviews": _B, "rerun_pipelines": _B,
                   "invalidate_cache": _B}, ["table"]),
            lambda table, **kw: auto_refresh.configure(table, **kw),
        )
        self._add(_tool("get_refresh_plan", "What a refresh would cascade to",
                        {"table": _S}, ["table"]),
                  lambda table: auto_refresh.plan(table))
        self._add(_tool("trigger_refresh", "Run the cascade now", {"table": _S}, ["table"]),
                  lambda table: auto_refresh.execute(table))
        self._add(_tool("get_refresh_history", "Past cascade runs",
                        {"limit": _I, "table": _S}, []),
                  lambda limit=20, table=None: auto_refresh.history(limit, table))
        self._add(_tool("get_auto_refresh", "Auto-refresh config for a table",
                        {"table": _S}, ["table"]),
                  lambda table: auto_refresh.get_config(table))
        self._add(_tool("list_auto_refresh", "All auto-refresh configs", {}, []),
                  lambda: auto_refresh.list_configs())
        self._add(_tool("remove_auto_refresh", "Remove a table's auto-refresh config",
                        {"table": _S}, ["table"]),
                  lambda table: auto_refresh.remove_config(table))

        # -- contracts -----------------------------------------------------
        self._add(
            _tool("create_contract", "Create a data contract",
                  {"table": _S, "schema": {"type": "object"},
                   "quality": {"type": "object"}, "freshness": {"type": "object"},
                   "constraints": {"type": "array"}, "owner": _S}, ["table"]),
            lambda table, **kw: contracts.create(table, **kw),
        )
        def _cname(table: str) -> str:
            """Contracts are keyed by the full ns.table name."""
            if table in contracts.list():
                return table
            t = T(table)
            return f"{t.namespace}.{t.table}"

        self._add(_tool("get_contract", "Fetch a contract", {"table": _S}, ["table"]),
                  lambda table: contracts.get(_cname(table)))
        self._add(
            _tool("update_contract", "Version-bumping contract update",
                  {"table": _S, "schema": {"type": "object"},
                   "quality": {"type": "object"}, "freshness": {"type": "object"},
                   "constraints": {"type": "array"}, "owner": _S, "status": _S},
                  ["table"]),
            lambda table, **kw: contracts.update(_cname(table), **kw),
        )
        self._add(_tool("deprecate_contract", "Mark a contract deprecated "
                        "(optional reason + sunset date)",
                        {"table": _S, "reason": _S, "sunset_date": _S}, ["table"]),
                  lambda table, reason=None, sunset_date=None: contracts.deprecate(
                      _cname(table), reason=reason, sunset_date=sunset_date))
        self._add(_tool("get_contract_status", "Lifecycle status of a contract",
                        {"table": _S}, ["table"]),
                  lambda table: contracts.status(_cname(table)))
        self._add(_tool("remove_contract", "Delete a contract entirely",
                        {"table": _S}, ["table"]),
                  lambda table: {"removed": contracts.remove(_cname(table))})
        self._add(
            _tool("get_contract_version", "A specific contract version's spec",
                  {"table": _S, "version": _I}, ["table", "version"]),
            lambda table, version: contracts.get_version(_cname(table), version),
        )
        self._add(
            _tool("get_compliance_history", "Raw monitoring entries",
                  {"table": _S}, ["table"]),
            lambda table: contracts.compliance_history(_cname(table)),
        )
        self._add(
            _tool("remove_contract_consumer", "Deregister a consumer",
                  {"table": _S, "consumer": _S}, ["table", "consumer"]),
            lambda table, consumer: {
                "removed": contracts.remove_consumer(_cname(table), consumer)},
        )
        self._add(_tool("list_contracts", "All contracts", {}, []),
                  lambda: contracts.list())
        self._add(
            _tool("get_contract_summary", "Status/version/owner per contract", {}, []),
            lambda: [
                {"table": t, "status": v["status"], "version": v["version"],
                 "owner": v.get("owner")}
                for t, v in contracts.list().items()
            ],
        )
        self._add(_tool("get_contract_history", "Version history", {"table": _S}, ["table"]),
                  lambda table: contracts.get(_cname(table))["history"])
        self._add(
            _tool("diff_contract_versions", "Schema diff between versions",
                  {"table": _S, "v1": _I, "v2": _I}, ["table", "v1", "v2"]),
            lambda table, v1, v2: contracts.diff_versions(_cname(table), v1, v2),
        )
        self._add(_tool("validate_contract", "Schema conformance vs live table",
                        {"table": _S}, ["table"]),
                  lambda table: {"violations": contracts.validate_table(T(table))})
        self._add(
            _tool("validate_data_against_contract", "Row-level constraint check",
                  {"table": _S}, ["table"]),
            lambda table: contracts.validate_rows(_cname(table), T(table).scan()),
        )
        self._add(_tool("get_contract_violations", "All violation kinds now",
                        {"table": _S}, ["table"]),
                  lambda table: contracts.violations(T(table)))
        self._add(_tool("get_compliance_score", "0-100 compliance", {"table": _S}, ["table"]),
                  lambda table: {"score": contracts.compliance_score(T(table))})
        self._add(_tool("monitor_contract", "Record a compliance check",
                        {"table": _S}, ["table"]),
                  lambda table: contracts.monitor(T(table)))
        self._add(_tool("get_contract_trends", "Score trajectory", {"table": _S}, ["table"]),
                  lambda table: contracts.trends(_cname(table)))
        self._add(
            _tool("generate_contract", "Generate + save a contract from live stats",
                  {"table": _S, "strict": _B}, ["table"]),
            lambda table, strict=False: contracts.generate_from_stats(
                T(table), strict=strict),
        )
        self._add(
            _tool("preview_contract", "Generated contract without saving",
                  {"table": _S, "strict": _B}, ["table"]),
            lambda table, strict=False: contracts.generate_from_stats(
                T(table), strict=strict, save=False),
        )
        self._add(
            _tool("dry_run_contract", "What a proposed contract would violate",
                  {"table": _S, "proposed": {"type": "object"}},
                  ["table", "proposed"]),
            lambda table, proposed: contracts.dry_run(T(table), proposed),
        )
        self._add(
            _tool("dry_run_migration", "Introduced/resolved violations for a proposal",
                  {"table": _S, "proposed": {"type": "object"}},
                  ["table", "proposed"]),
            lambda table, proposed: contracts.dry_run_migration(T(table), proposed),
        )
        self._add(
            _tool("dry_run_report", "Per-constraint pass rates for a proposal",
                  {"table": _S, "proposed": {"type": "object"}},
                  ["table", "proposed"]),
            lambda table, proposed: contracts.dry_run_report(T(table), proposed),
        )
        self._add(_tool("get_violation_trends", "Trends across monitored contracts",
                        {}, []),
                  lambda: contracts.trends_all())
        self._add(
            _tool("add_contract_consumer", "Register a downstream consumer",
                  {"table": _S, "consumer": _S}, ["table", "consumer"]),
            lambda table, consumer: (contracts.register_consumer(_cname(table), consumer),
                                     {"consumers": contracts.consumers(_cname(table))})[1],
        )
        self._add(_tool("get_contract_coverage", "Which tables have contracts", {}, []),
                  lambda: contracts.coverage(c.list_tables()))
        self._add(
            _tool("get_contract_dashboard", "Compliance overview across tables", {}, []),
            lambda: contracts.dashboard([T(t) for t in c.list_tables()]),
        )
        self._add(
            _tool("get_contract_health", "One-call health rollup for one table",
                  {"table": _S}, ["table"]),
            lambda table: contracts.health(T(table)),
        )

        # -- views / matviews / pipelines (rest) --------------------------
        self._add(_tool("list_views", "Stored SQL views", {}, []), lambda: views.list())
        self._add(_tool("drop_view", "Drop a stored view", {"name": _S}, ["name"]),
                  lambda name: (views.drop(name), {"dropped": name})[1])
        self._add(
            _tool("create_materialized_view", "Materialize a SQL result as a backed table",
                  {"name": _S, "sql": _S}, ["name", "sql"]),
            lambda name, sql: matviews.create(name, sql),
        )
        self._add(_tool("list_materialized_views", "Materialized views", {}, []),
                  lambda: matviews.list())
        self._add(_tool("query_materialized_view", "Read a matview", {"name": _S}, ["name"]),
                  lambda name: rows_of(matviews.query(name)))
        self._add(_tool("refresh_materialized_view", "Refresh a matview",
                        {"name": _S}, ["name"]),
                  lambda name: matviews.refresh(name))
        self._add(_tool("drop_materialized_view", "Drop a matview", {"name": _S}, ["name"]),
                  lambda name: (matviews.drop(name), {"dropped": name})[1])
        self._add(_tool("list_pipelines", "Stored pipelines", {}, []),
                  lambda: pipelines.list())
        self._add(_tool("dry_run_pipeline", "Validate pipeline steps without running",
                        {"name": _S}, ["name"]),
                  lambda name: pipelines.dry_run(name))
        self._add(_tool("drop_pipeline", "Drop a pipeline", {"name": _S}, ["name"]),
                  lambda name: (pipelines.drop(name), {"dropped": name})[1])

        # -- lineage (rest) / joins ---------------------------------------
        self._add(
            _tool("record_lineage", "Record a lineage edge",
                  {"sources": {"type": "array"}, "target": _S, "kind": _S, "sql": _S},
                  ["sources", "target"]),
            lambda sources, target, kind="manual", sql=None: lineage.record(
                sources, target, kind, sql),
        )
        self._add(_tool("lineage_graph", "Full lineage graph", {}, []),
                  lambda: lineage.graph())
        self._add(_tool("lineage_impact", "Blast radius of changing a table",
                        {"table": _S}, ["table"]),
                  lambda table: lineage.impact(table))
        self._add(
            _tool("execute_join", "Run join SQL and return rows",
                  {"sql": _S, "max_rows": _I}, ["sql"]),
            lambda sql, max_rows=100: rows_of(eng.execute(sql, max_rows=max_rows)),
        )
        self._add(
            _tool("join_to_table", "Materialize join SQL as a table",
                  {"sql": _S, "target": _S, "mode": _S}, ["sql", "target"]),
            lambda sql, target, mode="create": join_to_table(
                c, eng, sql, target, mode, lineage=lineage),
        )
        self._add(_tool("suggest_joins", "Joinable tables by shared columns",
                        {"table": _S}, ["table"]),
                  lambda table: suggest_joins(c, table))

        # -- reference-name aliases: a client migrating from the reference
        # can call every tool under its original name (same handler) -----
        for ref_name, ours in (
            ("compact_table", "compact"),
            ("get_lineage", "lineage"),
            ("get_partition_stats", "partition_stats"),
            ("get_table_changes", "capture_changes"),
            ("query_vortex", "query_file"),  # Vortex -> ORC substitution
            ("validate_data", "validate_table"),
        ):
            spec, fn = self._tools[ours]
            self._add({**spec, "name": ref_name}, fn)

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
    # lazy: initialize/tools/list and metadata-only tools answer without
    # paying JVM startup; the first Spark-touching tools/call resolves it
    LakehouseServer(lazy_spark=True).serve()


if __name__ == "__main__":
    main()

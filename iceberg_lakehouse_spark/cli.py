"""Click CLI — thin adapter over the engine (reference cli.py: 5,583
LoC / 189 command registrations across 26 groups).

Design: instead of hand-writing one function per command, the command
tree is GENERATED from the MCP tool registry (`server.py`), which is
already a complete (name, schema, callable) catalog of the engine
surface — one source of truth for both adapter layers. A manifest maps
tool names into the reference's command groups so `--help` mirrors the
reference tree. The server is constructed with a lazy SparkSession, so
`--help` and pure-metadata commands (contracts, tags, glossary, saved
queries…) never pay JVM startup.

Environment:
  LAKEHOUSE_HOME   warehouse + side-store root (default ~/.lakehouse_spark)
  SPARK_GRAFT_CPUS local parallelism

Output is JSON per command (machine-friendly; the reference's rich
tables are presentation-only).
"""

from __future__ import annotations

import json
import os

import click

DEFAULT_HOME = os.path.expanduser("~/.lakehouse_spark")


class Ctx:
    def __init__(self, home: str):
        self.home = home
        self._server = None

    @property
    def server(self):
        if self._server is None:
            from .server import LakehouseServer

            self._server = LakehouseServer(home=self.home, lazy_spark=True)
        return self._server

    @property
    def engine(self):
        return self.server.engine

    @property
    def catalog(self):
        return self.server.catalog


def _emit(obj) -> None:
    ctx = click.get_current_context(silent=True)
    mode = getattr(ctx.obj, "output", "json") if ctx and ctx.obj else "json"
    if mode == "table":
        txt = _as_table(obj)
        if txt is not None:
            click.echo(txt)
            return
    click.echo(json.dumps(obj, indent=1, default=str))


def _as_table(obj) -> str | None:
    """Aligned-column rendering (reference CLI shows rich tables; this
    is dependency-free). Handles a list of flat dicts or one flat dict;
    nested/other shapes fall back to JSON."""
    rows = None
    if isinstance(obj, list) and obj and all(isinstance(r, dict) for r in obj):
        rows = obj
    elif isinstance(obj, dict) and obj and not any(
        isinstance(v, (dict, list)) for v in obj.values()
    ):
        rows = [obj]
    elif isinstance(obj, list) and obj and all(isinstance(r, str) for r in obj):
        return "\n".join(obj)
    if rows is None:
        return None
    cols: list[str] = []
    for r in rows:
        for k in r:
            if k not in cols:
                cols.append(k)

    def s(v) -> str:
        if v is None:
            return ""
        if isinstance(v, (dict, list)):
            return json.dumps(v, default=str)
        return str(v)

    widths = {c: max(len(c), *(len(s(r.get(c))) for r in rows)) for c in cols}
    head = "  ".join(c.ljust(widths[c]) for c in cols).rstrip()
    sep = "  ".join("-" * widths[c] for c in cols)
    body = [
        "  ".join(s(r.get(c)).ljust(widths[c]) for c in cols).rstrip()
        for r in rows
    ]
    return "\n".join([head, sep, *body])


def _df_out(df, limit: int | None = None) -> None:
    if limit:
        df = df.limit(limit)
    _emit([r.asDict(recursive=True) for r in df.collect()])


@click.group()
@click.option("--home", default=DEFAULT_HOME, envvar="LAKEHOUSE_HOME")
@click.option(
    "--output", "-o", type=click.Choice(["table", "json"]), default="json",
    envvar="LAKEHOUSE_OUTPUT", show_default=True,
    help="table = aligned columns for flat results (reference-style); "
    "json = raw (scriptable, the default)",
)
@click.pass_context
def cli(ctx, home, output):
    """PySpark-native lakehouse CLI."""
    ctx.obj = Ctx(home)
    ctx.obj.output = output


# -- hand-written core (richer UX than the generated bridge) ---------------

@cli.command()
@click.argument("sql")
@click.option("--max-rows", default=100, show_default=True)
@click.option("--as-of", default=None, help="snapshot id or ISO timestamp")
@click.option("--table-name", default=None, help="table the --as-of applies to")
@click.pass_obj
def query(ctx, sql, max_rows, as_of, table_name):
    """Run SQL over all tables (auto-LIMIT like the reference)."""
    if as_of:
        if not table_name:
            raise click.UsageError("--as-of requires --table-name")
        df = ctx.engine.execute_as_of(sql, table_name, as_of, max_rows=max_rows)
    else:
        df = ctx.engine.execute(sql, max_rows=max_rows)
    _df_out(df)


@cli.group()
def tables():
    """Table DDL + metadata."""


@tables.command("list")
@click.pass_obj
def tables_list(ctx):
    _emit(ctx.catalog.list_tables())


@tables.command("create")
@click.argument("name")
@click.argument("schema_json")
@click.option("--partition-by", multiple=True)
@click.pass_obj
def tables_create(ctx, name, schema_json, partition_by):
    schema = [tuple(x) for x in json.loads(schema_json)]
    ctx.catalog.create_table(name, schema, partition_by=list(partition_by) or None)
    _emit({"created": name})


@tables.command("describe")
@click.argument("name")
@click.pass_obj
def tables_describe(ctx, name):
    t = ctx.catalog.load_table(name)
    _emit(
        {
            "schema": t.meta()["schema"],
            "partition_spec": t.meta().get("partition_spec", []),
            "properties": t.properties(),
            "stats": t.file_stats(),
        }
    )


@tables.command("drop")
@click.argument("name")
@click.pass_obj
def tables_drop(ctx, name):
    ctx.catalog.drop_table(name)
    _emit({"dropped": name})


@cli.command("import")
@click.argument("path")
@click.argument("table")
@click.option("--file-format", default=None)
@click.option("--if-exists", default="fail",
              type=click.Choice(["fail", "append", "replace"]))
@click.pass_obj
def import_cmd(ctx, path, table, file_format, if_exists):
    """Import CSV/TSV/JSON/NDJSON/Parquet/ORC into a table."""
    from .sources import io as lio

    _emit(lio.import_file(ctx.catalog, path, table, file_format, if_exists))


@cli.command("export")
@click.argument("table")
@click.argument("path")
@click.option("--file-format", default=None,
              help="auto-detects from the path extension when omitted")
@click.option("--where", default=None)
@click.option("--columns", multiple=True)
@click.option("--limit", type=int, default=None)
@click.pass_obj
def export_cmd(ctx, table, path, file_format, where, columns, limit):
    """Export a table with filter/projection/limit pushdown."""
    from .sources import io as lio

    _emit(
        lio.export_table(
            ctx.catalog.load_table(table), path, file_format,
            where=where, columns=list(columns) or None, limit=limit,
        )
    )


@cli.command()
@click.pass_obj
def serve(ctx):
    """Run the MCP stdio server."""
    from .server import LakehouseServer

    LakehouseServer(home=ctx.home).serve()


@cli.command()
@click.pass_obj
def init(ctx):
    """Initialize the lakehouse home (warehouse + side stores)."""
    os.makedirs(os.path.join(ctx.home, "warehouse"), exist_ok=True)
    _emit({"initialized": ctx.home, "warehouse": os.path.join(ctx.home, "warehouse")})


@cli.command()
@click.argument("sql")
@click.option("--runs", default=3, show_default=True)
@click.pass_obj
def benchmark(ctx, sql, runs):
    """Time a SQL query over `runs` executions (min/avg/max seconds)."""
    import time

    timings = []
    for _ in range(runs):
        t0 = time.perf_counter()
        ctx.engine.execute(sql, max_rows=0).count()
        timings.append(time.perf_counter() - t0)
    _emit(
        {
            "sql": sql,
            "runs": runs,
            "min_s": round(min(timings), 4),
            "avg_s": round(sum(timings) / len(timings), 4),
            "max_s": round(max(timings), 4),
        }
    )


# -- generated bridge: the MCP tool registry IS the command catalog --------
#
# Manifest: tool name -> (group | None, command name). Groups mirror the
# reference CLI tree (cli.py @main.group registrations). Tools absent
# from the manifest surface top-level under their tool name.

_TREE: dict[str, dict[str, str]] = {
    # group -> {command: tool}
    "snapshots": {
        "list": "list_snapshots", "diff": "snapshot_diff",
        "rollback": "rollback", "expire": "expire_snapshots",
        "cherry-pick": "cherry_pick",
    },
    "namespace": {
        "list": "list_namespaces", "create": "create_namespace",
        "drop": "drop_namespace", "properties": "get_namespace_properties",
    },
    "schema": {
        "history": "schema_history", "diff": "schema_diff",
        "migration": "schema_migration", "compatibility": "schema_compatibility",
        "alter": "alter_table",
    },
    "config": {
        "get-format": "get_format_config", "set-format": "set_format_config",
        "set-property": "set_table_property", "unset-property": "unset_table_property",
    },
    "sq": {
        "save": "save_query", "list": "list_saved_queries",
        "run": "run_saved_query", "delete": "delete_saved_query",
        "history": "get_query_history", "clear-history": "clear_query_history",
    },
    "validate": {
        "add": "add_validation_rule", "list": "list_validation_rules",
        "remove": "remove_validation_rule", "check": "validate_table",
    },
    "mask": {
        "add": "add_masking_policy", "list": "list_masking_policies",
        "remove": "remove_masking_policy", "query": "query_with_masking",
        "preview": "preview_masking",
    },
    "audit": {"show": "get_audit_log", "clear": "clear_audit_log"},
    "stats": {
        "show": "get_table_stats", "refresh": "refresh_table_stats",
        "all": "get_all_stats", "anomalies": "detect_anomalies",
        "profile": "profile_table", "analyze": "analyze_table",
        "analyzed": "analyzed_stats",
    },
    "quality": {"score": "quality_score", "report": "quality_report"},
    "retention": {
        "set": "set_retention_policy", "list": "list_retention_policies",
        "evaluate": "evaluate_retention",
    },
    "maintain": {
        "set-policy": "set_maintenance_policy", "check": "check_maintenance",
        "run": "run_maintenance", "status": "maintenance_status",
        "compact": "compact", "orphans": "cleanup_orphans",
        "rewrite-deletes": "rewrite_delete_files",
        "scan-plan": "scan_plan",
        "partitions": "get_partitions",
    },
    "catalog": {
        "describe-column": "set_column_description", "classify": "classify_column",
        "schema": "get_enriched_schema", "pii": "get_pii_columns",
    },
    "glossary": {"add": "add_glossary_term", "lookup": "search_glossary"},
    "tag": {
        "add": "tag_table", "remove": "untag_table", "search": "search_by_tag",
        "describe": "set_table_description", "bookmark": "bookmark_table",
        "find": "search_tables",
    },
    "watermark": {
        "get": "get_watermark", "list": "list_watermarks",
        "reset": "reset_watermark", "run-pipeline": "run_pipeline_incremental",
        "read": "incremental_read",
    },
    "sla": {
        "set": "set_sla", "list": "list_slas", "check": "check_sla",
        "history": "get_sla_history",
    },
    "notify": {
        "add": "register_notification", "list": "list_notifications",
        "remove": "remove_notification", "history": "get_notification_history",
        "fire": "fire_event",
    },
    "optimize": {
        "patterns": "analyze_query_patterns", "suggest": "suggest_optimizations",
        "report": "optimization_report", "cost": "estimate_query_cost",
        "join-strategy": "join_strategy", "explain": "explain_query",
    },
    "cache": {
        "stats": "get_cache_stats", "list": "list_cached_queries",
        "invalidate": "invalidate_cache", "policy": "set_cache_policy",
    },
    "backup": {
        "create": "backup_table", "verify": "verify_backup",
        "restore": "restore_table", "list": "list_backups",
    },
    "clone": {
        "create": "clone_table", "list": "list_clones",
        "promote": "promote_clone", "discard": "discard_clone",
    },
    "dedup": {
        "find": "find_duplicates", "summary": "dedup_summary",
        "remove": "remove_duplicates", "report": "dedup_report",
        "near-docs": "near_dup_docs",
        "near-embeddings": "embedding_near_dup_gated",
    },
    "curate": {
        "stream": "curate_multimodal_stream",
        "accounting": "curation_accounting",
        "importance-score": "importance_score",
        "resample": "importance_resample",
        "weights-build": "importance_weights_build",
    },
    "cdc": {
        "capture": "capture_changes", "log": "get_change_log",
        "summary": "get_change_summary", "export": "export_changes",
        "replay": "replay_changes", "changelog": "changelog_view",
    },
    "sample": {
        "random": "random_sample", "stratified": "stratified_sample",
        "to-table": "sample_to_table", "stats": "get_sample_stats",
        "shuffle": "corpus_shuffle",
    },
    "refresh-cascade": {
        "set": "set_auto_refresh", "plan": "get_refresh_plan",
        "trigger": "trigger_refresh", "history": "get_refresh_history",
    },
    "contract": {
        "create": "create_contract", "show": "get_contract",
        "update": "update_contract", "deprecate": "deprecate_contract",
        "list": "list_contracts", "summary": "get_contract_summary",
        "history": "get_contract_history", "diff": "diff_contract_versions",
        "validate": "validate_contract",
        "validate-data": "validate_data_against_contract",
        "violations": "get_contract_violations", "score": "get_compliance_score",
        "monitor": "monitor_contract", "trends": "get_contract_trends",
        "generate": "generate_contract", "preview": "preview_contract",
        "dry-run": "dry_run_contract", "dry-run-migration": "dry_run_migration",
        "add-consumer": "add_contract_consumer",
        "remove-consumer": "remove_contract_consumer",
        "remove": "remove_contract", "version": "get_contract_version",
        "compliance-history": "get_compliance_history",
        "coverage": "get_contract_coverage",
        "dashboard": "get_contract_dashboard", "health": "get_contract_health",
    },
    "view": {
        "create": "create_view", "list": "list_views",
        "query": "query_view", "drop": "drop_view",
    },
    "matview": {
        "create": "create_materialized_view", "list": "list_materialized_views",
        "query": "query_materialized_view", "refresh": "refresh_materialized_view",
        "drop": "drop_materialized_view", "freshness": "matview_freshness",
        "create-aggregate": "create_aggregate_matview",
        "refresh-incremental": "refresh_matview_incremental",
    },
    "pipeline": {
        "create": "create_pipeline", "list": "list_pipelines",
        "run": "run_pipeline", "dry-run": "dry_run_pipeline",
        "drop": "drop_pipeline",
    },
    "lineage": {
        "show": "lineage", "record": "record_lineage",
        "graph": "lineage_graph", "impact": "lineage_impact",
    },
    "join": {
        "run": "execute_join", "to-table": "join_to_table",
        "suggest": "suggest_joins",
    },
    "index": {
        "ann-build": "ann_index_build", "ann-probe": "ann_index_probe",
        "ann-extend": "ann_index_extend", "ann-stats": "ann_index_stats",
        "ann-rebalance": "ann_index_rebalance",
        "ann-recall": "ann_recall_sample",
        "ann-rebuild": "ann_index_rebuild",
        "ann-tune": "ann_nprobe_tune",
        "pq-build": "pq_index_build", "pq-probe": "pq_index_probe",
        "pq-extend": "pq_index_extend", "pq-stats": "pq_index_stats",
        "ivfpq-build": "ivfpq_index_build",
        "ivfpq-probe": "ivfpq_index_probe",
        "ivfpq-extend": "ivfpq_index_extend",
        "ivfpq-stats": "ivfpq_index_stats",
        "ivfpq-rebalance": "ivfpq_index_rebalance",
        "ivfpq-recall": "ivfpq_recall_sample",
        "ivfpq-rebuild": "ivfpq_index_rebuild",
        "ivfpq-tune": "ivfpq_nprobe_tune",
        "span-build": "span_index_build",
        "phash-build": "phash_index_build",
        "phash-probe": "phash_index_probe",
        "phash-extend": "phash_index_extend",
        "status": "index_status",
        "link-source": "index_link_source",
        "sync-deletes": "index_sync_deletes",
    },
    "refs": {
        "branch": "branch_create", "tag": "tag_create",
        "list": "refs_list", "fast-forward": "branch_fast_forward",
        "drop-branch": "branch_drop", "drop-tag": "tag_drop",
        "insert": "insert_into_branch", "query": "query_branch",
    },
}

# top-level generated commands (tool name -> command name)
_TOP_LEVEL = {
    "insert": "insert", "update": "update", "delete": "delete",
    "delete_by_key": "delete-by-key", "replace_where": "replace-where",
    "overwrite_partitions": "overwrite-partitions",
    "add_files": "add-files",
    "upsert": "upsert", "batch": "batch", "dashboard": "dashboard",
    "convert_format": "convert", "query_file": "query-file",
    "table_to_orc": "table-to-orc", "knn_search": "knn",
    "query_as_of": "query-as-of",
    "span_dedup": "span-dedup", "bpe_train": "bpe-train",
}

_GROUP_HELP = {
    "refs": "Branches + tags (write-audit-publish).",
    "snapshots": "Snapshot history, diff, rollback, expiry.",
    "namespace": "Namespace admin.",
    "schema": "Schema evolution: history, diff, migration, compatibility.",
    "config": "Format + table property configuration.",
    "sq": "Saved queries + query history.",
    "validate": "Validation rules.",
    "mask": "Column masking policies.",
    "audit": "Audit log.",
    "stats": "Table statistics (cached by snapshot).",
    "quality": "Quality scoring.",
    "retention": "Snapshot retention policies.",
    "maintain": "Compaction, orphan cleanup, maintenance policies.",
    "catalog": "Catalog enrichment: column docs, classification, PII.",
    "glossary": "Business glossary.",
    "tag": "Tags, bookmarks, table search.",
    "watermark": "Incremental-processing watermarks.",
    "sla": "Freshness/quality SLAs.",
    "notify": "Event notification handlers.",
    "optimize": "Query-pattern analysis + optimizer advisor.",
    "cache": "Query result cache.",
    "backup": "Table archives.",
    "clone": "Table clones (experiment/promote/discard).",
    "dedup": "Duplicate detection and removal.",
    "curate": "Streaming multimodal curation: drain + accounting.",
    "cdc": "Change data capture between snapshots.",
    "sample": "Random/stratified/systematic sampling.",
    "refresh-cascade": "Auto-refresh cascades for derived objects.",
    "contract": "Data contracts: versions, validation, monitoring.",
    "view": "Stored SQL views.",
    "matview": "Materialized views.",
    "pipeline": "Multi-step SQL pipelines.",
    "lineage": "Lineage edges, graph, impact.",
    "join": "Join execution + suggestions.",
    "index": "Vector ANN indexes: IVF, PQ, and the IVFADC composition.",
}


def _coerce(value: str, json_type):
    if isinstance(json_type, list):
        # union type (e.g. ["integer", "string"]): first member that parses wins
        for t in json_type:
            try:
                return _coerce(value, t)
            except (ValueError, json.JSONDecodeError):
                continue
        return value
    if json_type == "integer":
        return int(value)
    if json_type == "number":
        return float(value)
    if json_type == "boolean":
        return value.lower() in ("1", "true", "yes")
    if json_type in ("array", "object"):
        return json.loads(value)
    # strings that look like JSON containers pass through as strings
    return value


def _make_command(cmd_name: str, tool_name: str, spec: dict) -> click.Command:
    props = spec["inputSchema"]["properties"]
    required = set(spec["inputSchema"]["required"])
    params = []
    for arg, schema in props.items():
        json_type = schema.get("type", "string")
        if isinstance(json_type, list):
            json_type = "|".join(json_type)
        params.append(
            click.Option(
                [f"--{arg.replace('_', '-')}", arg],
                required=arg in required,
                help=json_type,
            )
        )

    @click.pass_obj
    def callback(ctx_obj, **kwargs):
        args = {}
        for k, v in kwargs.items():
            if v is None:
                continue
            args[k] = _coerce(v, props.get(k, {}).get("type", "string"))
        _spec, fn = ctx_obj.server._tools[tool_name]
        _emit(fn(**args))

    return click.Command(
        cmd_name, params=params, callback=callback, help=spec["description"]
    )


def _build_generated_tree() -> None:
    """Attach generated groups/commands. Specs come from a lazy-Spark
    server at the default home (schemas are home-independent); execution
    uses the per-invocation Ctx server so --home is honored."""
    import tempfile

    from .server import LakehouseServer

    # registration is side-effect-free (managers write only on use);
    # a scratch home keeps --help from touching the user's warehouse
    spec_server = LakehouseServer(
        home=os.path.join(tempfile.gettempdir(), "lakehouse_spec_home"),
        lazy_spark=True,
    )
    specs = {name: spec for name, (spec, _fn) in spec_server._tools.items()}

    for group_name, commands in _TREE.items():
        grp = click.Group(group_name, help=_GROUP_HELP.get(group_name))
        for cmd_name, tool_name in commands.items():
            grp.add_command(_make_command(cmd_name, tool_name, specs[tool_name]))
        cli.add_command(grp)
    for tool_name, cmd_name in _TOP_LEVEL.items():
        cli.add_command(_make_command(cmd_name, tool_name, specs[tool_name]))


_build_generated_tree()


def main() -> None:
    cli()


if __name__ == "__main__":
    main()

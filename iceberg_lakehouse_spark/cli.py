"""Click CLI — thin adapter over the engine (reference cli.py, 5.5k LoC
of ~100 commands; this mirrors the core command tree; SURVEY Phase 4).

Environment:
  LAKEHOUSE_HOME   warehouse + side-store root (default ~/.lakehouse_spark)
  SPARK_GRAFT_CPUS local parallelism

Output is JSON per command (machine-friendly; the reference's rich
tables are presentation-only).
"""

from __future__ import annotations

import json
import os
import sys

import click

DEFAULT_HOME = os.path.expanduser("~/.lakehouse_spark")


class Ctx:
    def __init__(self, home: str):
        self.home = home
        os.makedirs(home, exist_ok=True)
        from .catalog import LakehouseCatalog
        from .plans.engine import QueryEngine
        from .session import get_spark

        self.spark = get_spark("lakehouse-cli")
        self.catalog = LakehouseCatalog(self.spark, os.path.join(home, "warehouse"))
        self.engine = QueryEngine(self.catalog)

    def store(self, name: str) -> str:
        return os.path.join(self.home, name)


def _emit(obj) -> None:
    click.echo(json.dumps(obj, indent=1, default=str))


def _df_out(df, limit: int | None = None) -> None:
    if limit:
        df = df.limit(limit)
    _emit([r.asDict(recursive=True) for r in df.collect()])


@click.group()
@click.option("--home", default=DEFAULT_HOME, envvar="LAKEHOUSE_HOME")
@click.pass_context
def cli(ctx, home):
    """PySpark-native lakehouse CLI."""
    ctx.obj = Ctx(home)


# -- query -----------------------------------------------------------------

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


# -- tables ----------------------------------------------------------------

@cli.group()
def tables():
    """Table DDL + metadata."""


@tables.command("list")
@click.pass_obj
def tables_list(ctx):
    _emit(ctx.catalog.list_tables())


@tables.command("create")
@click.argument("name")
@click.option("--schema", "schema_json", required=True,
              help='JSON: [["col","type"], ...]')
@click.option("--partition-by", multiple=True,
              help="transform spec, e.g. month(date), bucket(16, id)")
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
            "name": name,
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


# -- CRUD ------------------------------------------------------------------

@cli.command()
@click.argument("table")
@click.argument("rows_json")
@click.pass_obj
def insert(ctx, table, rows_json):
    """Insert JSON rows: '[{"id":1,...}, ...]'."""
    from .operators import crud

    t = ctx.catalog.load_table(table)
    n = crud.insert_rows(t, json.loads(rows_json))
    _emit({"inserted": n})


@cli.command()
@click.argument("table")
@click.argument("filter_expr")
@click.argument("updates_json")
@click.pass_obj
def update(ctx, table, filter_expr, updates_json):
    from .operators import crud

    n = crud.update_rows(ctx.catalog.load_table(table), filter_expr, json.loads(updates_json))
    _emit({"updated": n})


@cli.command()
@click.argument("table")
@click.argument("filter_expr")
@click.pass_obj
def delete(ctx, table, filter_expr):
    from .operators import crud

    n = crud.delete_rows(ctx.catalog.load_table(table), filter_expr)
    _emit({"deleted": n})


@cli.command()
@click.argument("table")
@click.argument("rows_json")
@click.option("--keys", required=True, help="comma-separated key columns")
@click.pass_obj
def upsert(ctx, table, rows_json, keys):
    from .operators import crud

    res = crud.upsert_rows(
        ctx.catalog.load_table(table), json.loads(rows_json), keys.split(",")
    )
    _emit(res)


# -- snapshots / time travel ----------------------------------------------

@cli.group()
def snapshots():
    """Snapshot history, diff, rollback, expiry."""


@snapshots.command("list")
@click.argument("table")
@click.pass_obj
def snapshots_list(ctx, table):
    t = ctx.catalog.load_table(table)
    _emit([s.to_json() for s in t.snapshots()])


@snapshots.command("diff")
@click.argument("table")
@click.argument("from_snapshot", type=int)
@click.argument("to_snapshot", type=int)
@click.pass_obj
def snapshots_diff(ctx, table, from_snapshot, to_snapshot):
    t = ctx.catalog.load_table(table)
    d = t.snapshot_diff(from_snapshot, to_snapshot)
    _emit(
        {
            "added": [r.asDict() for r in d["added"].collect()],
            "deleted": [r.asDict() for r in d["deleted"].collect()],
        }
    )


@snapshots.command("rollback")
@click.argument("table")
@click.option("--to", "snapshot_id", type=int, required=True)
@click.pass_obj
def snapshots_rollback(ctx, table, snapshot_id):
    snap = ctx.catalog.load_table(table).rollback(snapshot_id=snapshot_id)
    _emit(snap.to_json())


@snapshots.command("expire")
@click.argument("table")
@click.option("--retain-last", type=int, default=None)
@click.option("--dry-run", is_flag=True)
@click.pass_obj
def snapshots_expire(ctx, table, retain_last, dry_run):
    _emit(ctx.catalog.load_table(table).expire_snapshots(
        retain_last=retain_last, dry_run=dry_run))


# -- import / export -------------------------------------------------------

@cli.command("import")
@click.argument("path")
@click.argument("table")
@click.option("--format", "file_format", default=None)
@click.option("--if-exists", default="fail",
              type=click.Choice(["fail", "append", "replace"]))
@click.pass_obj
def import_cmd(ctx, path, table, file_format, if_exists):
    from .sources import io as lio

    _emit(lio.import_file(ctx.catalog, path, table, file_format, if_exists))


@cli.command("export")
@click.argument("table")
@click.argument("path")
@click.option("--format", "file_format", default="csv")
@click.option("--where", default=None)
@click.option("--columns", default=None, help="comma-separated")
@click.option("--limit", type=int, default=None)
@click.pass_obj
def export_cmd(ctx, table, path, file_format, where, columns, limit):
    from .sources import io as lio

    _emit(
        lio.export_table(
            ctx.catalog.load_table(table), path, file_format,
            where=where, columns=columns.split(",") if columns else None, limit=limit,
        )
    )


# -- maintenance -----------------------------------------------------------

@cli.group()
def maintenance():
    """Compaction, orphan cleanup, stats."""


@maintenance.command("compact")
@click.argument("table")
@click.pass_obj
def maintenance_compact(ctx, table):
    _emit(ctx.catalog.load_table(table).compact())


@maintenance.command("orphans")
@click.argument("table")
@click.option("--delete", is_flag=True)
@click.pass_obj
def maintenance_orphans(ctx, table, delete):
    _emit(ctx.catalog.load_table(table).cleanup_orphans(dry_run=not delete))


@maintenance.command("status")
@click.argument("table")
@click.pass_obj
def maintenance_status(ctx, table):
    t = ctx.catalog.load_table(table)
    _emit({**t.file_stats(), "partitions": t.partition_stats()})


# -- profile / stats / dashboard ------------------------------------------

@cli.command()
@click.argument("table")
@click.pass_obj
def profile(ctx, table):
    from .governance.stats import StatsCache

    sc = StatsCache(ctx.store("stats.json"))
    _emit(sc.get(ctx.catalog.load_table(table)))


@cli.command()
@click.pass_obj
def dashboard(ctx):
    from .governance.advisor import dashboard as dash
    from .governance.stats import StatsCache

    _emit(dash(ctx.catalog, StatsCache(ctx.store("stats.json"))))


# -- governance shortcuts --------------------------------------------------

@cli.group()
def mask():
    """Masking policies."""


@mask.command("add")
@click.argument("table")
@click.argument("column")
@click.argument("strategy", type=click.Choice(["hash", "redact", "nullify", "truncate", "expression"]))
@click.option("--expression", default=None)
@click.pass_obj
def mask_add(ctx, table, column, strategy, expression):
    from .governance.masking import MaskingManager

    _emit(MaskingManager(ctx.store("masking.json")).add_policy(
        table, column, strategy, expression=expression))


@cli.group()
def validate():
    """Validation rules."""


@validate.command("add")
@click.argument("table")
@click.argument("rule_type", type=click.Choice(["not_null", "unique", "range", "regex", "expression"]))
@click.option("--column", default=None)
@click.option("--min", "min_value", type=float, default=None)
@click.option("--max", "max_value", type=float, default=None)
@click.option("--pattern", default=None)
@click.option("--expression", default=None)
@click.pass_obj
def validate_add(ctx, table, rule_type, column, min_value, max_value, pattern, expression):
    from .governance.validation import ValidationManager

    _emit(
        ValidationManager(ctx.store("validation.json")).add_rule(
            table, rule_type, column=column, min_value=min_value,
            max_value=max_value, pattern=pattern, expression=expression,
        )
    )


@validate.command("check")
@click.argument("table")
@click.pass_obj
def validate_check(ctx, table):
    from .governance.validation import ValidationManager

    t = ctx.catalog.load_table(table)
    vm = ValidationManager(ctx.store("validation.json"))
    _emit(vm.validate(table.split(".", 1)[-1], t.scan()))


def main() -> None:
    cli(prog_name="lakehouse")


if __name__ == "__main__":
    main()

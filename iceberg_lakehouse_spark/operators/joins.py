"""Join helpers (SURVEY §2.4 J2/J3, reference joins.py).

J1 (arbitrary SQL joins) is the engine itself — Spark resolves
``ns.table`` natively, so the reference's ``ns__t`` string-rewrite
resolver is unnecessary (kept only as the view alias in QueryEngine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..catalog import LakehouseCatalog
from ..governance.lineage import LineageManager, extract_tables


def join_to_table(
    catalog: LakehouseCatalog,
    engine,
    sql: str,
    target: str,
    mode: str = "create",
    lineage: LineageManager | None = None,
) -> dict:
    """J2 (reference joins.py:96-188): run join SQL → materialize as a
    table; lineage recorded from tables referenced in the SQL."""
    df: DataFrame = engine.execute(sql, max_rows=0)
    exists = catalog.table_exists(target)
    if mode == "create":
        if exists:
            raise ValueError(f"table {target!r} already exists")
        t = catalog.create_table(target, df.schema)
        t.append(df)
    elif mode == "overwrite":
        if exists:
            t = catalog.load_table(target)
            t.overwrite(t._align(df))
        else:
            t = catalog.create_table(target, df.schema)
            t.append(df)
    elif mode == "append":
        t = catalog.load_table(target)
        t.append(df)
    else:
        raise ValueError(f"invalid mode {mode!r}")
    rows = t.scan().count()
    sources = extract_tables(sql, catalog.list_tables())
    if lineage and sources:
        lineage.record(sources, target, "join", sql)
    engine.refresh()
    return {
        "target": target,
        "rows": rows,
        "rows_written": rows,
        "sources": sources,
    }


def suggest_joins(catalog: LakehouseCatalog, table: str) -> list[dict]:
    """J3 (reference joins.py:191-237): for every other table, intersect
    column-name sets; emit suggested equi-join SQL. Pure catalog
    metadata — no data touched."""
    base = catalog.load_table(table)
    base_cols = {f.name for f in base.schema().fields}
    short_base = table.split(".", 1)[-1]
    out = []
    for other in catalog.list_tables():
        if other == table or other == f"default.{table}":
            continue
        ot = catalog.load_table(other)
        shared = sorted(base_cols & {f.name for f in ot.schema().fields})
        if not shared:
            continue
        short_other = other.split(".", 1)[-1]
        on = " AND ".join(
            f"{short_base}.{c} = {short_other}.{c}" for c in shared
        )
        sql = f"SELECT * FROM {short_base} JOIN {short_other} ON {on}"
        out.append(
            {
                "table": other,
                "shared_columns": shared,
                "sql": sql,
                "join_sql": sql,
            }
        )
    return out

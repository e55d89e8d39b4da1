"""Join helpers (SURVEY §2.4 J2/J3, reference joins.py).

J1 (arbitrary SQL joins) is the engine itself — Spark resolves
``ns.table`` natively, so the reference's ``ns__t`` string-rewrite
resolver is unnecessary (kept only as the view alias in QueryEngine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import LakehouseCatalog
from ..governance.lineage import LineageManager, extract_tables


def advised_join(
    catalog: LakehouseCatalog,
    left: str,
    right: str,
    on: list[str],
    how: str = "inner",
    config=None,
    broadcast_threshold: int | None = None,
) -> tuple[DataFrame, dict]:
    """Structured equi-join that CONSUMES the metadata-only advice
    ``governance.advisor.join_strategy`` computes: when the advisor
    says broadcast, the small side gets an explicit ``F.broadcast()``
    hint, so the decision is made from persisted file sizes + ANALYZE
    NDVs instead of Spark's sampled size estimate (which, over a
    multi-file lazy scan union, routinely overshoots and silently
    degrades a dim join to a shuffle). The threshold resolves through
    the same config chain as every other knob
    (``join.broadcast_threshold_bytes``) before falling back to the
    advisor default. Returns ``(joined DataFrame, advice dict)`` — the
    advice travels with the result so callers can surface WHY the plan
    looks the way it does."""
    if broadcast_threshold is None:
        thr = config.get("join.broadcast_threshold_bytes") if config else None
        if thr is None:
            from ..governance.advisor import BROADCAST_THRESHOLD_BYTES

            broadcast_threshold = BROADCAST_THRESHOLD_BYTES
        else:
            broadcast_threshold = int(thr)
    from ..governance.advisor import join_strategy

    advice = join_strategy(
        catalog, left, right, on, broadcast_threshold=broadcast_threshold
    )
    ldf = catalog.load_table(left).scan()
    rdf = catalog.load_table(right).scan()
    if advice["strategy"] == "broadcast":
        if advice["broadcast_side"] == "left":
            ldf = F.broadcast(ldf)
        else:
            rdf = F.broadcast(rdf)
    return ldf.join(rdf, on=on, how=how), advice


def join_to_table(
    catalog: LakehouseCatalog,
    engine,
    sql: str | dict,
    target: str,
    mode: str = "create",
    lineage: LineageManager | None = None,
    config=None,
) -> dict:
    """J2 (reference joins.py:96-188): run join SQL → materialize as a
    table; lineage recorded from tables referenced in the SQL.

    ``sql`` may instead be a structured spec ``{"left", "right", "on",
    "how"?}`` — that path routes through :func:`advised_join`, so the
    advisor's broadcast decision lands in the materialization plan."""
    advice = None
    if isinstance(sql, dict):
        spec = sql
        df, advice = advised_join(
            catalog, spec["left"], spec["right"], list(spec["on"]),
            how=spec.get("how", "inner"), config=config,
        )
        # DataFrame join types use underscores (left_outer); the
        # lineage-recorded SQL must spell them as words or replaying it
        # fails to parse. USING (not ON) mirrors DataFrame.join(on=
        # [cols]) semantics — the key columns appear once, coalesced
        # for outer joins — so replaying the recorded SQL reproduces
        # the materialized schema (ADVICE r9: the ON form yields
        # duplicate/ambiguous key columns).
        how_sql = spec.get("how", "inner").upper().replace("_", " ")
        using = ", ".join(spec["on"])
        sql = (f"SELECT * FROM {spec['left']} "
               f"{how_sql} JOIN "
               f"{spec['right']} USING ({using})")
    else:
        df = engine.execute(sql, max_rows=0)
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
        **({"join_advice": advice} if advice else {}),
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

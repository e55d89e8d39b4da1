"""QueryEngine — the SQL surface (SURVEY §3.1-§3.2, P1/P2/S3/S14).

Reference lifecycle (query.py:26-197): eagerly materialize every table
into DuckDB, string-inject LIMIT, execute. Spark-first rebuild:

  * registration is *lazy* — temp views over snapshot scans; nothing is
    materialized until an action, so Catalyst pushes filters into the
    parquet scans of exactly the tables a query touches;
  * auto-LIMIT is ``df.limit(n)`` on the result plan, not string
    surgery (SURVEY §4.2 — no custom Catalyst rule needed);
  * time-travel queries register a snapshot-resolved view (a fresh
    throwaway DuckDB session in the reference, query.py:187-197 — here
    just a different lazy view, no copy);
  * ``refresh()`` re-registers views (the reference must rebuild its
    whole connection because registration copies data; we only need to
    pick up new snapshots).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from ..catalog import LakehouseCatalog

_SELECT_RE = re.compile(r"^\s*(select|with)\b", re.IGNORECASE)
_LIMIT_RE = re.compile(r"\blimit\s+\d+", re.IGNORECASE)


class QueryEngine:
    def __init__(
        self,
        catalog: LakehouseCatalog,
        max_rows: int = 1000,
        history=None,  # governance.queries_store.SavedQueries (G19)
        query_cache=None,  # governance.queries_store.QueryCache (G20)
    ):
        self.catalog = catalog
        self.spark = catalog.spark
        self.max_rows = max_rows
        self.history = history
        self.query_cache = query_cache
        # table name → meta_stamp() at last registration (see _register_tables)
        self._reg_stamps: dict[str, tuple] = {}
        self._tables: list[str] = []  # last registration's listing

    def execute_cached(self, sql: str, max_rows: int | None = None) -> list[dict]:
        """Collected-row execution through the query cache (G20) with
        history recording (G19) — the surface MCP/CLI callers use when
        they want rows rather than a DataFrame."""
        import time as _time

        from ..governance.advisor import extract_query_tables

        tables = extract_query_tables(sql)
        # key includes the effective row cap: a cached result truncated to
        # 100 rows must not serve a later max_rows=10000 call.
        n = max_rows if max_rows is not None else self.max_rows
        keyed_sql = f"{sql}\n--max_rows={n}"
        if self.query_cache and self.query_cache.enabled_for(tables):
            hit = self.query_cache.get(keyed_sql)
            if hit is not None:
                return hit
        t0 = _time.perf_counter()
        rows = [
            r.asDict(recursive=True)
            for r in self.execute(sql, max_rows=max_rows).collect()
        ]
        elapsed = _time.perf_counter() - t0
        if self.history:
            self.history.record_history(sql, elapsed, len(rows))
        if self.query_cache and self.query_cache.enabled_for(tables):
            self.query_cache.put(keyed_sql, rows, tables)
        return rows

    def _register_tables(self) -> None:
        """Every table under its short name, plus ``ns__table`` alias for
        namespace-qualified queries (reference query.py:52-75,
        joins.py:13-41). Incremental: a per-table metadata stamp
        (mtime of table.json/snapshots.json) skips tables whose views
        are already current — execute() runs this per query, and the
        metadata views (files_df reads stats + per-file sizes) are too
        expensive to rebuild for an unchanged catalog."""
        tables = self.catalog.list_tables()
        self._tables = tables
        # unregister DROPPED tables: their data + metadata views would
        # otherwise keep serving stale rows (metadata views are driver-
        # materialized) or die mid-query with 'Path does not exist'
        current = set(tables)
        for full in [n for n in self._reg_stamps if n not in current]:
            ns, t = full.split(".", 1)
            for v in (t, f"{ns}__{t}", f"{t}__snapshots", f"{t}__files",
                      f"{t}__history", f"{t}__refs", f"{t}__delete_files",
                      f"{t}__partitions"):
                try:
                    self.spark.catalog.dropTempView(v)
                except Exception:  # noqa: BLE001
                    pass
            # pop, not del: a same-short-name sibling processed earlier
            # may already have cleared this entry via the loop below
            self._reg_stamps.pop(full, None)
            # a same-short-name table in another namespace just lost its
            # short-name view — clear its stamp so it re-registers below
            for other in [o for o in self._reg_stamps
                          if o.split(".", 1)[1] == t]:
                self._reg_stamps.pop(other, None)
        for full in tables:
            ns, t = full.split(".", 1)
            try:
                table = self.catalog.load_table(full)
                stamp = table.meta_stamp()
            except Exception:  # noqa: BLE001 — skip-and-continue like reference
                continue
            if self._reg_stamps.get(full) == stamp:
                continue
            try:
                df = table.scan()
            except Exception:  # noqa: BLE001
                continue
            df.createOrReplaceTempView(t)
            df.createOrReplaceTempView(f"{ns}__{t}")
            # Iceberg-inspect-style metadata tables (reference exposes
            # snapshots/files/history via PyIceberg, catalog.py:204-237)
            try:
                table.snapshots_df().createOrReplaceTempView(f"{t}__snapshots")
                table.files_df().createOrReplaceTempView(f"{t}__files")
                table.history_df().createOrReplaceTempView(f"{t}__history")
                table.refs_df().createOrReplaceTempView(f"{t}__refs")
                table.delete_files_df().createOrReplaceTempView(
                    f"{t}__delete_files")
                table.partitions_df().createOrReplaceTempView(
                    f"{t}__partitions")
            except Exception:  # noqa: BLE001 — metadata views best-effort
                pass
            self._reg_stamps[full] = stamp

    def refresh(self) -> None:
        self._reg_stamps.clear()
        self._register_tables()

    def _resolve_qualified(self, sql: str) -> str:
        """Rewrite ``ns.table`` refs of KNOWN tables to their
        ``ns__table`` view alias (reference query.py:52-75 resolver).
        Temp views have no namespace, so ``default.users`` would
        otherwise miss the registered view and fall through to the
        (empty) session catalog.

        String literals are left untouched: the SQL is split on quoted
        segments ('' / "" escapes included) and only the code between
        them is rewritten — ``WHERE t = 'default.users'`` keeps its
        literal."""
        import re

        parts = re.split(r"('(?:[^']|'')*'|\"(?:[^\"]|\"\")*\")", sql)
        # the listing from this call's _register_tables pass — no second
        # warehouse walk per query
        tables = self._tables
        for i in range(0, len(parts), 2):  # even indices = outside quotes
            seg = parts[i]
            for full in tables:
                ns, t = full.split(".", 1)
                seg = re.sub(
                    rf"\b{re.escape(ns)}\.{re.escape(t)}\b", f"{ns}__{t}", seg
                )
            parts[i] = seg
        return "".join(parts)

    def execute(self, sql: str, max_rows: int | None = None) -> DataFrame:
        """P1 passthrough + P2 auto-LIMIT (applied as .limit on the
        plan — pushes through to TakeOrderedAndProject etc.)."""
        self._register_tables()
        df = self.spark.sql(self._resolve_qualified(sql))
        n = max_rows if max_rows is not None else self.max_rows
        if n and _SELECT_RE.match(sql) and not _LIMIT_RE.search(sql):
            df = df.limit(n)
        return df

    def execute_as_of(
        self, sql: str, table_name: str, as_of: str, max_rows: int | None = None
    ) -> DataFrame:
        """S2/§3.2: run sql with ``table_name`` bound to its snapshot at
        ``as_of`` (int snapshot-id parsed first, then ISO timestamp)."""
        self._register_tables()
        table = self.catalog.load_table(table_name)
        short = table_name.split(".", 1)[-1]
        alias = f"{table.namespace}__{short}"
        hist = table.scan(as_of=as_of)
        # bind BOTH names the query may use — the short view and the
        # ns__table alias that _resolve_qualified rewrites qualified
        # references to; rebinding only the short name would let
        # 'SELECT … FROM ns.t' silently read CURRENT data
        hist.createOrReplaceTempView(short)
        hist.createOrReplaceTempView(alias)
        try:
            # spark.sql() analyzes eagerly: the returned plan resolves the
            # temp view NOW, so restoring the current-view binding below
            # does not rebind this DataFrame. No driver-side materialization
            # needed (round-1 version collect()ed here — a full-result
            # round-trip through the driver).
            df = self.spark.sql(self._resolve_qualified(sql))
            n = max_rows if max_rows is not None else self.max_rows
            if n and _SELECT_RE.match(sql) and not _LIMIT_RE.search(sql):
                df = df.limit(n)
        finally:
            cur = table.scan()
            cur.createOrReplaceTempView(short)
            cur.createOrReplaceTempView(alias)
        return df

    def query_file(self, path: str, sql: str, view_name: str = "file_view",
                   max_rows: int | None = None) -> DataFrame:
        """S14: query a standalone columnar file (parquet/orc/csv/json)
        registered as a view (reference query.py:103-145)."""
        if path.endswith(".orc"):
            df = self.spark.read.orc(path)
        elif path.endswith(".csv"):
            df = self.spark.read.option("header", True).option("inferSchema", True).csv(path)
        elif path.endswith((".json", ".ndjson")):
            df = self.spark.read.json(path)
        else:
            df = self.spark.read.parquet(path)
        df.createOrReplaceTempView(view_name)
        out = self.spark.sql(sql)
        n = max_rows if max_rows is not None else self.max_rows
        if n and _SELECT_RE.match(sql) and not _LIMIT_RE.search(sql):
            out = out.limit(n)
        return out

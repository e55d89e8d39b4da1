"""SQL views, materialized views, pipelines (SURVEY V1-V3,
reference views.py / matviews.py / pipelines.py).

Views: named SQL resolved at query time. Matviews: SQL → backing table
``mv_<name>``; refresh = overwrite; freshness = stored source snapshot
ids vs current (I8). Pipelines: ordered steps {sql, target_table?,
mode}; dry-run via plan resolution; stop-on-error.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame

from ..catalog import LakehouseCatalog
from .lineage import LineageManager, extract_tables
from .stores import JsonStore

MV_PREFIX = "mv_"
MV_MAX_ROWS = 1_000_000


def _require_name_sql(name: str, sql: str, kind: str) -> None:
    """Reference view/matview create rejects blank names and SQL."""
    if not name or not name.strip():
        raise ValueError(f"{kind} name must be non-empty")
    if not sql or not sql.strip():
        raise ValueError(f"{kind} sql must be non-empty")


class ViewManager:
    def __init__(self, store_path: str, engine):
        self.store = JsonStore(store_path, {})
        self.engine = engine

    def create(self, name: str, sql: str, description: str | None = None) -> dict:
        """Store a named view (reference views.py create_view: result
        carries name/sql/description/created_at and a 'created' message;
        blank name/sql and duplicates raise)."""
        _require_name_sql(name, sql, "view")
        views = self.store.load()
        if name in views:
            raise ValueError(f"view {name!r} already exists")
        views[name] = {
            "sql": sql,
            "description": description,
            "created_at": datetime.now(timezone.utc).isoformat(),
        }
        self.store.save(views)
        return {
            "name": name,
            **views[name],
            "message": f"View '{name}' created",
        }

    def list(self) -> list[dict]:
        """All views as [{name, sql, description, created_at}] (reference
        list_views result rows)."""
        return [
            {"name": n, **entry} for n, entry in self.store.load().items()
        ]

    def get(self, name: str) -> dict:
        views = self.store.load()
        if name not in views:
            raise ValueError(f"view {name!r} not found")
        return {"name": name, **views[name]}

    def drop(self, name: str) -> dict:
        """Drop a view; missing names raise (reference drop_view)."""
        views = self.store.load()
        if name not in views:
            raise ValueError(f"view {name!r} not found")
        del views[name]
        self.store.save(views)
        return {"message": f"View '{name}' dropped"}

    def query(self, name: str, max_rows: int | None = None) -> DataFrame:
        return self.engine.execute(self.get(name)["sql"], max_rows=max_rows)


class MatviewManager:
    def __init__(
        self,
        store_path: str,
        catalog: LakehouseCatalog,
        engine,
        lineage: LineageManager | None = None,
    ):
        self.store = JsonStore(store_path, {})
        self.catalog = catalog
        self.engine = engine
        self.lineage = lineage

    def _backing(self, name: str) -> str:
        return f"default.{MV_PREFIX}{name}"

    def create(self, name: str, sql: str, description: str | None = None) -> dict:
        _require_name_sql(name, sql, "materialized view")
        mviews = self.store.load()
        if name in mviews:
            raise ValueError(f"materialized view {name!r} already exists")
        df = self.engine.execute(sql, max_rows=MV_MAX_ROWS)
        backing = self._backing(name)
        if self.catalog.table_exists(backing):
            raise ValueError(f"backing table {backing!r} already exists")
        table = self.catalog.create_table(backing, df.schema)
        table.append(df)
        rows = table.scan().count()
        sources = extract_tables(sql, self.catalog.list_tables())
        mviews[name] = {
            "sql": sql,
            "description": description,
            "backing_table": backing,
            "row_count": rows,
            "source_snapshot_ids": self._source_snapshots(sources),
            "created_at": datetime.now(timezone.utc).isoformat(),
            "last_refreshed": datetime.now(timezone.utc).isoformat(),
        }
        self.store.save(mviews)
        if self.lineage and sources:
            # constant-only SQL has no source tables; record() rejects
            # empty sources, and the matview is already persisted here
            self.lineage.record(sources, backing, "matview", sql)
        return {
            "name": name,
            **mviews[name],
            "message": f"Materialized view '{name}' created with {rows} rows",
        }

    def _source_snapshots(self, sources: list[str]) -> dict:
        # skip only REGISTERED backing tables (a user table legitimately
        # named mv_* must still be tracked as a staleness source)
        backing = {mv["backing_table"] for mv in self.store.load().values()}
        out = {}
        for t in sources:
            if t in backing:
                continue
            try:
                cur = self.catalog.load_table(t).current_snapshot()
                out[t] = cur.snapshot_id if cur else None
            except ValueError:
                continue
        return out

    def refresh(self, name: str) -> dict:
        mviews = self.store.load()
        if name not in mviews:
            raise ValueError(f"materialized view {name!r} does not exist")
        mv = mviews[name]
        rows_before = mv.get("row_count")
        table = self.catalog.load_table(mv["backing_table"])
        if mv.get("kind") == "aggregate":
            src = self.catalog.load_table(mv["table"])
            df = self._aggregate_df(src, mv)
            cur = src.current_snapshot()
            mv["last_snapshot_id"] = cur.snapshot_id if cur else None
        else:
            df = self.engine.execute(mv["sql"], max_rows=MV_MAX_ROWS)
        table.overwrite(table._align(df))
        rows_after = table.scan().count()
        sources = extract_tables(mv["sql"], self.catalog.list_tables())
        mv["source_snapshot_ids"] = self._source_snapshots(sources)
        mv["row_count"] = rows_after
        mv["last_refreshed"] = datetime.now(timezone.utc).isoformat()
        self.store.save(mviews)
        self.engine.refresh()
        return {
            "name": name,
            **mv,
            "rows_before": rows_before,
            "rows_after": rows_after,
            "message": f"Materialized view '{name}' refreshed: "
                       f"{rows_before} -> {rows_after} rows",
        }

    def query(self, name: str) -> DataFrame:
        mviews = self.store.load()
        if name not in mviews:
            raise ValueError(f"materialized view {name!r} does not exist")
        df = self.catalog.load_table(mviews[name]["backing_table"]).scan()
        if mviews[name].get("kind") == "aggregate":
            # maintenance columns (_mv_rows group size, _mv_nn_* sum
            # null-restore counts) are internal state
            df = df.select([c for c in df.columns
                            if not c.startswith("_mv_")])
        return df

    # -- incremental aggregate matviews (r7; reference analogue: none —
    # the reference recomputes every matview on refresh) -----------------
    #
    # A declared GROUP BY + {sum, count, count_star} spec is
    # SELF-MAINTAINABLE: the row-level changelog between two snapshots
    # converts to signed deltas (+1 insert / −1 delete — updates arrive
    # as pairs), one small aggregate over ONLY the changed rows yields
    # per-group deltas, and a single atomic equality-delete + append
    # commit replaces just the touched groups in the backing table.
    # Refresh cost is O(changed data + changed groups), never
    # O(source table) — the property that makes a matview on a 100 TB
    # fact maintainable. Hidden state per group: _mv_rows (group
    # liveness — a group whose count reaches 0 is deleted) and
    # _mv_nn_<out> per SUM (non-null count, so an all-NULL group's sum
    # stays NULL exactly like a recompute). MIN/MAX are deliberately
    # unsupported: they are not self-maintainable under deletes.

    _AGG_FNS = ("sum", "count", "count_star")
    _BACKING_COMPACT_EQ = 16  # fold backing-table delete debt past this

    def _agg_exprs(self, mv: dict):
        from pyspark.sql import functions as F

        cols = []
        for a in mv["aggs"]:
            fn, col, out = a["fn"], a.get("col"), a["as"]
            if fn == "sum":
                cols.append(F.sum(F.col(col)).alias(out))
            elif fn == "count":
                cols.append(F.count(F.col(col)).alias(out))
            else:
                cols.append(F.count(F.lit(1)).alias(out))
        for a in mv["aggs"]:
            if a["fn"] == "sum":
                cols.append(
                    F.count(F.col(a["col"])).alias(f"_mv_nn_{a['as']}"))
        cols.append(F.count(F.lit(1)).alias("_mv_rows"))
        return cols

    def _aggregate_df(self, table, mv: dict) -> DataFrame:
        return table.scan().groupBy(*mv["group_by"]).agg(
            *self._agg_exprs(mv))

    def create_aggregate(
        self,
        name: str,
        table: str,
        group_by: list[str],
        aggs: list[dict],
        description: str | None = None,
    ) -> dict:
        """``aggs``: [{"fn": "sum"|"count"|"count_star", "col": ...,
        "as": out_name}, ...]."""
        import re as _re

        _require_name_sql(name, table, "materialized view")
        mviews = self.store.load()
        if name in mviews:
            raise ValueError(f"materialized view {name!r} already exists")
        t = self.catalog.load_table(table)
        known = {f.name for f in t.schema().fields}
        if not group_by or not set(group_by) <= known:
            raise ValueError(f"group_by must be non-empty columns of {table}")
        if not aggs:
            raise ValueError("aggs must be non-empty")
        seen = set(group_by)
        for a in aggs:
            if a.get("fn") not in self._AGG_FNS:
                raise ValueError(
                    f"unsupported agg fn {a.get('fn')!r} (self-maintainable "
                    f"fns: {self._AGG_FNS}; MIN/MAX cannot be incrementally "
                    "maintained under deletes)")
            if a["fn"] != "count_star" and a.get("col") not in known:
                raise ValueError(f"agg column {a.get('col')!r} not in {table}")
            out = a.get("as") or ""
            if (not _re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", out)
                    or out.startswith("_mv_") or out in seen):
                raise ValueError(f"bad or duplicate output name {out!r}")
            seen.add(out)
        mv = {"kind": "aggregate", "table": table,
              "group_by": list(group_by), "aggs": [dict(a) for a in aggs]}
        df = self._aggregate_df(t, mv)
        backing = self._backing(name)
        if self.catalog.table_exists(backing):
            raise ValueError(f"backing table {backing!r} already exists")
        bt = self.catalog.create_table(backing, df.schema)
        bt.append(df)
        cur = t.current_snapshot()
        mviews[name] = {
            **mv,
            "sql": f"-- aggregate matview over {table}",
            "description": description,
            "backing_table": backing,
            "row_count": bt.scan().count(),
            "last_snapshot_id": cur.snapshot_id if cur else None,
            "source_snapshot_ids": {table: cur.snapshot_id if cur else None},
            "created_at": datetime.now(timezone.utc).isoformat(),
            "last_refreshed": datetime.now(timezone.utc).isoformat(),
        }
        self.store.save(mviews)
        if self.lineage:
            self.lineage.record([table], backing, "matview",
                                mviews[name]["sql"])
        return {"name": name, **mviews[name],
                "message": f"Aggregate materialized view '{name}' created"}

    def refresh_incremental(self, name: str) -> dict:
        """Apply the source-table changelog since the last refresh as
        per-group deltas; touched groups are replaced in ONE atomic
        equality-delete + append commit. Falls back to a full rebuild
        when the changelog range is gone (expired snapshots)."""
        from functools import reduce

        from pyspark.sql import functions as F

        mviews = self.store.load()
        if name not in mviews:
            raise ValueError(f"materialized view {name!r} does not exist")
        mv = mviews[name]
        if mv.get("kind") != "aggregate":
            raise ValueError(
                f"{name!r} is a SQL matview — incremental refresh needs an "
                "aggregate matview (create_aggregate); use refresh()")
        t = self.catalog.load_table(mv["table"])
        cur = t.current_snapshot()
        head = cur.snapshot_id if cur else None
        last = mv.get("last_snapshot_id")
        backing = self.catalog.load_table(mv["backing_table"])
        if head == last:
            return {"name": name, "mode": "noop", "changed_groups": 0,
                    "row_count": mv.get("row_count")}
        mode, changed = "incremental", 0
        delta = None
        if last is not None and head is not None:
            try:
                from .cdc import changelog_view

                delta = changelog_view(t, last, head)
            except ValueError:
                delta = None  # range expired / rewritten away
        if delta is None:
            mode = "full"
            backing.overwrite(backing._align(self._aggregate_df(t, mv)))
        else:
            gb_cols, sign = mv["group_by"], F.when(
                F.col("_change_type") == "insert", F.lit(1)
            ).otherwise(F.lit(-1))
            d_aggs = []
            for a in mv["aggs"]:
                fn, col, out = a["fn"], a.get("col"), a["as"]
                if fn == "sum":
                    d_aggs.append(F.sum(sign * F.col(col)).alias(f"_d_{out}"))
                    d_aggs.append(F.sum(
                        F.when(F.col(col).isNotNull(), sign).otherwise(0)
                    ).alias(f"_d_nn_{out}"))
                elif fn == "count":
                    d_aggs.append(F.sum(
                        F.when(F.col(col).isNotNull(), sign).otherwise(0)
                    ).alias(f"_d_{out}"))
                else:
                    d_aggs.append(F.sum(sign).alias(f"_d_{out}"))
            d_aggs.append(F.sum(sign).alias("_d_rows"))
            g = delta.groupBy(*gb_cols).agg(*d_aggs).alias("g")
            o = backing.scan().alias("o")
            # null-safe group-key join: a NULL group key is a real group
            cond = reduce(lambda x, y: x & y,
                          [F.col(f"g.{c}").eqNullSafe(F.col(f"o.{c}"))
                           for c in gb_cols])
            j = g.join(o, cond, "left")
            out_cols = [F.col(f"g.{c}").alias(c) for c in gb_cols]
            for a in mv["aggs"]:
                fn, out = a["fn"], a["as"]
                if fn == "sum":
                    nn = (F.coalesce(F.col(f"o._mv_nn_{out}"), F.lit(0))
                          + F.coalesce(F.col(f"g._d_nn_{out}"), F.lit(0)))
                    val = F.when(nn == 0, F.lit(None)).otherwise(
                        F.coalesce(F.col(f"o.{out}"), F.lit(0))
                        + F.coalesce(F.col(f"g._d_{out}"), F.lit(0)))
                    out_cols.append(val.alias(out))
                else:
                    out_cols.append(
                        (F.coalesce(F.col(f"o.{out}"), F.lit(0))
                         + F.coalesce(F.col(f"g._d_{out}"), F.lit(0))
                         ).alias(out))
            for a in mv["aggs"]:
                if a["fn"] == "sum":
                    out = a["as"]
                    out_cols.append(
                        (F.coalesce(F.col(f"o._mv_nn_{out}"), F.lit(0))
                         + F.coalesce(F.col(f"g._d_nn_{out}"), F.lit(0))
                         ).alias(f"_mv_nn_{out}"))
            new_rows = (F.coalesce(F.col("o._mv_rows"), F.lit(0))
                        + F.col("g._d_rows"))
            out_cols.append(new_rows.alias("_mv_rows"))
            survivors = j.select(*out_cols).where(F.col("_mv_rows") > 0)
            keys = g.select(*[F.col(f"g.{c}").alias(c) for c in gb_cols])
            changed = keys.count()
            if changed:
                eq_files = backing.write_eq_deletes(keys, gb_cols)
                backing.commit_eq_upsert(
                    backing._align(survivors), eq_files, gb_cols,
                    summary={"matview_incremental": True,
                             "changed_groups": changed})
                # every refresh adds one eq-delete file and the scan
                # plan grows a branch per delete — fold the debt
                # periodically (the backing table is aggregate-sized,
                # so this compact is cheap)
                if len(backing.current_snapshot().eq_delete_files) \
                        >= self._BACKING_COMPACT_EQ:
                    backing.compact()
            else:
                mode = "noop"
        mv["last_snapshot_id"] = head
        mv["source_snapshot_ids"] = {mv["table"]: head}
        mv["row_count"] = backing.scan().count()
        mv["last_refreshed"] = datetime.now(timezone.utc).isoformat()
        self.store.save(mviews)
        self.engine.refresh()
        return {"name": name, "mode": mode, "changed_groups": changed,
                "row_count": mv["row_count"]}

    def freshness(self, name: str) -> dict:
        """I8: stale if any source table has moved past the stored
        snapshot (reference matviews.py:248-281)."""
        mviews = self.store.load()
        if name not in mviews:
            raise ValueError(f"materialized view {name!r} does not exist")
        mv = mviews[name]
        changed = []
        # legacy stores wrote "source_snapshots" before the key rename;
        # read both so old matviews still report staleness
        tracked = mv.get("source_snapshot_ids") or mv.get("source_snapshots", {})
        for t, snap_id in tracked.items():
            try:
                cur = self.catalog.load_table(t).current_snapshot()
            except ValueError:
                changed.append(t)
                continue
            if (cur.snapshot_id if cur else None) != snap_id:
                changed.append(t)
        return {"name": name, "stale": bool(changed), "changed_tables": changed}

    def drop(self, name: str) -> dict:
        mviews = self.store.load()
        if name not in mviews:
            raise ValueError(f"materialized view {name!r} does not exist")
        mv = mviews.pop(name)
        self.catalog.drop_table(mv["backing_table"], missing_ok=True)
        self.store.save(mviews)
        return {"name": name,
                "message": f"Materialized view '{name}' dropped"}

    def list(self) -> list[dict]:
        """Reference list form: one summary dict per view."""
        return [
            {
                "name": n,
                "sql": mv["sql"],
                "row_count": mv.get("row_count"),
                "backing_table": mv["backing_table"],
                "last_refreshed": mv.get("last_refreshed"),
            }
            for n, mv in self.store.load().items()
        ]


class PipelineManager:
    def __init__(
        self,
        store_path: str,
        catalog: LakehouseCatalog,
        engine,
        lineage: LineageManager | None = None,
        audit=None,
    ):
        self.store = JsonStore(store_path, {})
        self.catalog = catalog
        self.engine = engine
        self.lineage = lineage
        self.audit = audit

    def create(self, name: str, steps: list[dict], description: str | None = None) -> dict:
        if not name or not name.strip():
            raise ValueError("pipeline name must be non-empty")
        if not steps:
            raise ValueError("pipeline must have at least one step")
        for i, s in enumerate(steps):
            if not s.get("sql", "").strip():
                raise ValueError(f"step {i} missing 'sql'")
            if s.get("mode", "overwrite") not in ("overwrite", "append"):
                raise ValueError(f"step {i}: invalid mode {s.get('mode')!r}")
        pipelines = self.store.load()
        if name in pipelines:
            raise ValueError(f"pipeline {name!r} already exists")
        pipelines[name] = {
            "steps": steps,
            "description": description,
            "created_at": datetime.now(timezone.utc).isoformat(),
            "last_run": None,
            "last_run_status": None,
        }
        self.store.save(pipelines)
        return {
            "name": name,
            "steps": len(steps),
            "description": description,
            "message": f"Pipeline '{name}' created with {len(steps)} step(s)",
        }

    def get(self, name: str) -> dict:
        return {"name": name, **self._get(name)}

    def dry_run(self, name: str) -> dict:
        """V3 dry-run: resolve each step's plan without executing
        (reference pipelines.py:154-167). Never touches last_run."""
        pipe = self._get(name)
        results = []
        stand_ins: list[str] = []
        try:
            for i, step in enumerate(pipe["steps"]):
                try:
                    df = self.engine.execute(step["sql"], max_rows=0)
                    results.append({
                        "step": i, "status": "validated",
                        "columns": [f.name for f in df.schema.fields],
                    })
                    # targets of earlier steps may not exist yet — register
                    # an empty stand-in view so later steps resolve
                    target = step.get("target_table")
                    if target and not self.catalog.table_exists(target):
                        short = target.split(".", 1)[-1]
                        empty = self.engine.spark.createDataFrame([], df.schema)
                        empty.createOrReplaceTempView(short)
                        stand_ins.append(short)
                except Exception as e:  # noqa: BLE001
                    results.append({"step": i, "status": "error", "error": str(e)})
        finally:
            for v in stand_ins:
                self.engine.spark.catalog.dropTempView(v)
        return {"name": name, "dry_run": True, "step_results": results}

    def run(self, name: str) -> dict:
        pipe = self._get(name)
        results = []
        completed = failed = 0
        for i, step in enumerate(pipe["steps"]):
            try:
                df = self.engine.execute(step["sql"], max_rows=0)
                target = step.get("target_table")
                if target:
                    mode = step.get("mode", "overwrite")
                    if not self.catalog.table_exists(target):
                        t = self.catalog.create_table(target, df.schema)
                        t.append(df)
                    else:
                        t = self.catalog.load_table(target)
                        if mode == "overwrite":
                            t.overwrite(t._align(df))
                        else:
                            t.append(df)
                    rows = t.scan().count()
                    sources = extract_tables(step["sql"], self.catalog.list_tables())
                    if self.lineage and sources:
                        self.lineage.record(sources, target, f"pipeline:{name}", step["sql"])
                    if self.audit:
                        self.audit.record(target, f"pipeline:{name}:step{i}", rows or 0)
                    self.engine.refresh()
                else:
                    rows = df.count()
                results.append({
                    "step": i, "status": "completed",
                    "rows_affected": rows, "target_table": target,
                })
                completed += 1
            except Exception as e:  # noqa: BLE001
                results.append({"step": i, "status": "error", "error": str(e)})
                failed += 1
                break
        status = "failed" if failed else "completed"
        pipelines = self.store.load()
        pipelines[name]["last_run"] = datetime.now(timezone.utc).isoformat()
        pipelines[name]["last_run_status"] = status
        self.store.save(pipelines)
        return {
            "name": name,
            "status": status,
            "steps_completed": completed,
            "steps_failed": failed,
            "step_results": results,
            "at": pipelines[name]["last_run"],
            "message": f"Pipeline '{name}' {status}: "
                       f"{completed} step(s) completed, {failed} failed",
        }

    def _get(self, name: str) -> dict:
        pipelines = self.store.load()
        if name not in pipelines:
            raise ValueError(f"pipeline {name!r} does not exist")
        return pipelines[name]

    def list(self) -> list[dict]:
        """Reference list form: one summary dict per pipeline."""
        return [
            {
                "name": n,
                "step_count": len(p["steps"]),
                "description": p.get("description"),
                "created_at": p.get("created_at"),
                "last_run": p.get("last_run"),
                "last_run_status": p.get("last_run_status"),
            }
            for n, p in self.store.load().items()
        ]

    def drop(self, name: str) -> dict:
        pipelines = self.store.load()
        if name not in pipelines:
            raise ValueError(f"pipeline {name!r} does not exist")
        del pipelines[name]
        self.store.save(pipelines)
        return {"name": name, "message": f"Pipeline '{name}' dropped"}

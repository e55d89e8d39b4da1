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
        df = self.engine.execute(mv["sql"], max_rows=MV_MAX_ROWS)
        table = self.catalog.load_table(mv["backing_table"])
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
        return self.catalog.load_table(mviews[name]["backing_table"]).scan()

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

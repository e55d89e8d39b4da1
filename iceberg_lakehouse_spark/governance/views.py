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
        _require_name_sql(name, sql, "view")
        views = self.store.load()
        if name in views:
            raise ValueError(f"view {name!r} already exists")
        views[name] = {
            "sql": sql,
            "description": description,
            "created": datetime.now(timezone.utc).isoformat(),
        }
        self.store.save(views)
        return views[name]

    def list(self) -> dict:
        return self.store.load()

    def get(self, name: str) -> dict:
        views = self.store.load()
        if name not in views:
            raise ValueError(f"view {name!r} does not exist")
        return views[name]

    def drop(self, name: str) -> None:
        views = self.store.load()
        views.pop(name, None)
        self.store.save(views)

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

    def create(self, name: str, sql: str) -> dict:
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
        sources = extract_tables(sql, self.catalog.list_tables())
        mviews[name] = {
            "sql": sql,
            "backing_table": backing,
            "source_snapshots": self._source_snapshots(sources),
            "created": datetime.now(timezone.utc).isoformat(),
            "last_refreshed": datetime.now(timezone.utc).isoformat(),
        }
        self.store.save(mviews)
        if self.lineage:
            self.lineage.record(sources, backing, "matview", sql)
        return mviews[name]

    def _source_snapshots(self, sources: list[str]) -> dict:
        out = {}
        for t in sources:
            if t.startswith(f"default.{MV_PREFIX}"):
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
        df = self.engine.execute(mv["sql"], max_rows=MV_MAX_ROWS)
        table = self.catalog.load_table(mv["backing_table"])
        table.overwrite(table._align(df))
        sources = extract_tables(mv["sql"], self.catalog.list_tables())
        mv["source_snapshots"] = self._source_snapshots(sources)
        mv["last_refreshed"] = datetime.now(timezone.utc).isoformat()
        self.store.save(mviews)
        self.engine.refresh()
        return mv

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
        for t, snap_id in mv.get("source_snapshots", {}).items():
            try:
                cur = self.catalog.load_table(t).current_snapshot()
            except ValueError:
                changed.append(t)
                continue
            if (cur.snapshot_id if cur else None) != snap_id:
                changed.append(t)
        return {"name": name, "stale": bool(changed), "changed_tables": changed}

    def drop(self, name: str) -> None:
        mviews = self.store.load()
        mv = mviews.pop(name, None)
        if mv:
            self.catalog.drop_table(mv["backing_table"], missing_ok=True)
        self.store.save(mviews)

    def list(self) -> dict:
        return self.store.load()


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
        for i, s in enumerate(steps):
            if "sql" not in s:
                raise ValueError(f"step {i} missing 'sql'")
            if s.get("mode", "overwrite") not in ("overwrite", "append"):
                raise ValueError(f"step {i}: invalid mode {s.get('mode')!r}")
        pipelines = self.store.load()
        if name in pipelines:
            raise ValueError(f"pipeline {name!r} already exists")
        pipelines[name] = {
            "steps": steps,
            "description": description,
            "created": datetime.now(timezone.utc).isoformat(),
            "last_run": None,
        }
        self.store.save(pipelines)
        return pipelines[name]

    def dry_run(self, name: str) -> list[dict]:
        """V3 dry-run: resolve each step's plan without executing
        (reference uses EXPLAIN, pipelines.py:154-167)."""
        pipe = self._get(name)
        results = []
        stand_ins: list[str] = []
        try:
            for i, step in enumerate(pipe["steps"]):
                try:
                    df = self.engine.execute(step["sql"], max_rows=0)
                    results.append(
                        {"step": i, "ok": True, "columns": [f.name for f in df.schema.fields]}
                    )
                    # targets of earlier steps may not exist yet — register
                    # an empty stand-in view so later steps resolve
                    target = step.get("target_table")
                    if target and not self.catalog.table_exists(target):
                        short = target.split(".", 1)[-1]
                        empty = self.engine.spark.createDataFrame([], df.schema)
                        empty.createOrReplaceTempView(short)
                        stand_ins.append(short)
                except Exception as e:  # noqa: BLE001
                    results.append({"step": i, "ok": False, "error": str(e)})
        finally:
            for v in stand_ins:
                self.engine.spark.catalog.dropTempView(v)
        return results

    def run(self, name: str) -> dict:
        pipe = self._get(name)
        results = []
        status = "success"
        for i, step in enumerate(pipe["steps"]):
            try:
                df = self.engine.execute(step["sql"], max_rows=0)
                target = step.get("target_table")
                rows = None
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
                    if self.lineage:
                        self.lineage.record(sources, target, f"pipeline:{name}", step["sql"])
                    if self.audit:
                        self.audit.record(target, f"pipeline:{name}:step{i}", rows or 0)
                    self.engine.refresh()
                results.append({"step": i, "status": "ok", "rows": rows})
            except Exception as e:  # noqa: BLE001
                results.append({"step": i, "status": "error", "error": str(e)})
                status = "failed"
                break
        pipelines = self.store.load()
        pipelines[name]["last_run"] = {
            "at": datetime.now(timezone.utc).isoformat(),
            "status": status,
            "steps": results,
        }
        self.store.save(pipelines)
        return pipelines[name]["last_run"]

    def _get(self, name: str) -> dict:
        pipelines = self.store.load()
        if name not in pipelines:
            raise ValueError(f"pipeline {name!r} does not exist")
        return pipelines[name]

    def list(self) -> dict:
        return self.store.load()

    def drop(self, name: str) -> None:
        pipelines = self.store.load()
        pipelines.pop(name, None)
        self.store.save(pipelines)

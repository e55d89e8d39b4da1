"""Incremental processing with snapshot watermarks (SURVEY §2.10 I1-I3,
reference incremental.py).

"Watermark" = last-processed snapshot id per (pipeline, table). The
incremental read fast-paths append-only history — if every snapshot
since the watermark is an append, new rows are exactly the files added
since then, read directly with zero diffing (the Iceberg
incremental-scan equivalent; at 100 TB this is the difference between
reading new files and EXCEPT-ing two full table scans). Overwrite
history falls back to the reference's EXCEPT diff.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..catalog import LakehouseCatalog, LakeTable
from .stores import JsonStore


def _qualify(table: str) -> str:
    """Bare names normalize to default.<name>: incremental_read looks
    watermarks up under the qualified name, so a watermark SET under a
    bare name would never be found — every run would re-read the full
    source and duplicate rows into the target."""
    return table if "." in table else f"default.{table}"


class WatermarkStore:
    """I1 (reference incremental.py:33-139)."""

    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {})

    def set(self, pipeline: str, table: str, snapshot_id: int, rows_processed: int = 0) -> dict:
        table = _qualify(table)
        data = self.store.load()
        entry = {
            "snapshot_id": snapshot_id,
            "processed_at": datetime.now(timezone.utc).isoformat(),
            "rows_processed": rows_processed,
        }
        data.setdefault(pipeline, {})[table] = entry
        self.store.save(data)
        return {"pipeline": pipeline, "table": table, **entry}

    def get(self, pipeline: str, table: str) -> dict:
        """Always a dict; snapshot_id None when no watermark exists
        (reference get_watermark semantics)."""
        table = _qualify(table)
        entry = self.store.load().get(pipeline, {}).get(table)
        if entry is None:
            return {
                "pipeline": pipeline, "table": table,
                "snapshot_id": None, "processed_at": None,
                "rows_processed": 0,
            }
        return {"pipeline": pipeline, "table": table, **entry}

    def list(self, pipeline: str | None = None) -> list[dict]:
        """Reference list form: one row per (pipeline, table)."""
        data = self.store.load()
        out = []
        for p, tables in data.items():
            if pipeline and p != pipeline:
                continue
            for t, entry in tables.items():
                out.append({"pipeline": p, "table": t, **entry})
        return out

    def reset(self, pipeline: str, table: str | None = None) -> dict:
        table = _qualify(table) if table else None
        data = self.store.load()
        removed = 0
        if table:
            if data.get(pipeline, {}).pop(table, None) is not None:
                removed = 1
        elif pipeline in data:
            removed = len(data.pop(pipeline))
        self.store.save(data)
        if removed == 0:
            return {"removed": 0,
                    "message": f"No watermarks found for '{pipeline}'"}
        return {"removed": removed,
                "message": f"Reset {removed} watermark(s) for '{pipeline}'"}


def incremental_read(
    table: LakeTable, watermarks: WatermarkStore, pipeline: str
) -> tuple[DataFrame, dict]:
    """I2 (reference incremental.py:142-239): no watermark → full scan;
    same snapshot → empty; else new-rows-since-watermark."""
    cur = table.current_snapshot()
    name = f"{table.namespace}.{table.table}"
    wm = watermarks.get(pipeline, name)
    if cur is None:
        return table.scan(), {"mode": "empty", "from": None, "to": None}
    if wm["snapshot_id"] is None:
        return table.scan(), {"mode": "full", "from": None, "to": cur.snapshot_id}
    if wm["snapshot_id"] == cur.snapshot_id:
        empty = table.spark.createDataFrame([], table.schema())
        return empty, {"mode": "none", "from": wm["snapshot_id"], "to": cur.snapshot_id}

    # additive fast path: scan exactly the files added since the
    # watermark (no diff job at all). Safe for append AND merge-on-read
    # delete/update commits: MoR never rewrites old files, so the
    # added-rows-still-live set is precisely the new files with the
    # head snapshot's position deletes merged (new versions of MoR
    # updates are in the new files; rows deleted since the watermark
    # were present AT the watermark, so — like the EXCEPT diff below —
    # they are simply absent from the result). A CoW rewrite commits
    # as "overwrite" and still takes the diff path.
    snaps = table.snapshots()
    try:
        wm_idx = next(i for i, s in enumerate(snaps) if s.snapshot_id == wm["snapshot_id"])
    except StopIteration:
        wm_idx = None
    # rewrite_deletes only CONSOLIDATES the delete list (same logical
    # deletions, no file changes) and cherry_pick re-applies an
    # additive delta — both preserve the fast path's invariant
    if wm_idx is not None and all(
        s.operation in ("append", "delete", "update",
                        "rewrite_deletes", "cherry_pick")
        for s in snaps[wm_idx + 1 :]
    ):
        old_files = set(snaps[wm_idx].files)
        new_files = [f for f in snaps[-1].files if f not in old_files]
        if not new_files:
            df = table.spark.createDataFrame([], table.schema())
        else:
            df = table.scan_files(new_files, merge_snapshot=snaps[-1])
        return df, {
            "mode": "append_files",
            "from": wm["snapshot_id"],
            "to": cur.snapshot_id,
            "files": len(new_files),
        }

    # overwrite somewhere in between → EXCEPT diff (distinct semantics,
    # reference incremental.py:225-227)
    try:
        old = table.scan_conformed(wm["snapshot_id"])
    except ValueError:  # watermark snapshot expired → full rescan
        return table.scan(), {"mode": "full", "from": None, "to": cur.snapshot_id}
    new = table.scan()
    diff = new.distinct().exceptAll(old.distinct())
    return diff, {"mode": "except_diff", "from": wm["snapshot_id"], "to": cur.snapshot_id}


def read_incremental(
    table: LakeTable, watermarks: WatermarkStore, pipeline: str
) -> dict:
    """Reference read_incremental result shape over the (df, info)
    core: {data, row_count, is_full, mode, from_snapshot, to_snapshot}."""
    df, info = incremental_read(table, watermarks, pipeline)
    return {
        "data": df,
        "row_count": df.count(),
        "is_full": info["mode"] == "full",
        "mode": info["mode"],
        "from_snapshot": info.get("from"),
        "to_snapshot": info.get("to"),
    }


def run_incremental_pipeline(
    catalog: LakehouseCatalog,
    watermarks: WatermarkStore,
    pipeline_name: str,
    steps: list[dict],
    engine,
) -> dict:
    """I3 (reference incremental.py:242-361): per step — incremental
    source read → register temp view → step SQL → append into target →
    advance watermark. Steps with no new rows are 'skipped'."""
    results = []
    total = 0
    for i, step in enumerate(steps):
        src_name = step["source_table"]
        table = catalog.load_table(src_name)
        df, info = incremental_read(table, watermarks, pipeline_name)
        view = step.get("view_name", src_name.split(".", 1)[-1] + "_increment")
        df.createOrReplaceTempView(view)
        out = engine.spark.sql(step["sql"])
        rows = out.count()
        target = step.get("target_table")
        if target and rows:
            if not catalog.table_exists(target):
                t = catalog.create_table(target, out.schema)
            else:
                t = catalog.load_table(target)
            t.append(out)
        cur = table.current_snapshot()
        if cur:
            watermarks.set(pipeline_name, src_name, cur.snapshot_id, rows)
        total += rows
        results.append({
            "step": i, "source": src_name, "mode": info["mode"],
            "rows": rows,
            "status": "skipped" if rows == 0 else "processed",
        })
    return {"status": "success", "total_rows": total, "steps": results}

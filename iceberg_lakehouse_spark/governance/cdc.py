"""Change data capture between snapshots (SURVEY I4-I7, reference
cdc.py).

Classification (cdc.py:19-187): EXCEPT both ways between two snapshots,
then key-match: added row with a removed counterpart on the same key →
UPDATE (with changed_columns); unmatched added → INSERT; unmatched
removed → DELETE. Default key = first schema column (cdc.py:121).

Spark-first: the key-match is a full-outer join on the key between the
two diff sets (diffs, not tables, shuffle), and op-type + changed-column
detection are Column expressions evaluated executor-side. Summary counts
aggregate distributively; row dicts are collected only at the export
edge, capped at ``max_rows`` per category, so change volume is never
driver-bounded.
"""

from __future__ import annotations

import csv
import io
import json
from datetime import datetime, timezone

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import LakeTable
from ..operators import crud


def _classified_changes(
    table: LakeTable,
    from_snapshot: int,
    to_snapshot: int,
    key_columns: list[str] | None = None,
):
    """The classified change DataFrame (one row per INSERT/UPDATE/
    DELETE with _op + _changed columns) plus (keys, schema_cols) —
    shared by capture_changes (row materialization, capped) and
    change_summary (pure aggregation, nothing collected per-row)."""
    schema_cols = [f.name for f in table.schema().fields]
    keys = key_columns or [schema_cols[0]]
    # conformed scans: snapshots straddling a schema change compare on
    # the current schema (renames mapped by field id, adds as NULL)
    old = table.scan_conformed(from_snapshot)
    new = table.scan_conformed(to_snapshot)
    added = new.distinct().exceptAll(old.distinct())
    removed = old.distinct().exceptAll(new.distinct())

    # explicit presence markers: key-column non-nullness would
    # misclassify rows whose KEY VALUE is NULL (an inserted
    # (id=NULL, …) row has no non-null key on the added side and would
    # fall through to DELETE)
    a = added.select(
        [F.col(c).alias(f"a_{c}") for c in schema_cols]
        + [F.lit(True).alias("_a_present")]
    )
    r = removed.select(
        [F.col(c).alias(f"r_{c}") for c in schema_cols]
        + [F.lit(True).alias("_r_present")]
    )
    cond = [a[f"a_{k}"].eqNullSafe(r[f"r_{k}"]) for k in keys]
    joined = a.join(r, on=cond if cond else None, how="full_outer")

    value_cols = [c for c in schema_cols if c not in keys]
    has_added = F.coalesce(F.col("_a_present"), F.lit(False))
    has_removed = F.coalesce(F.col("_r_present"), F.lit(False))
    op = (
        F.when(has_added & has_removed, F.lit("UPDATE"))
        .when(has_added, F.lit("INSERT"))
        .otherwise(F.lit("DELETE"))
    )
    # changed_columns as a Column: python-equality semantics of the old
    # driver loop = "values differ AND not both NULL" == NOT eqNullSafe
    changed_arr = (
        F.filter(
            F.array(*[
                F.when(
                    ~F.col(f"r_{c}").eqNullSafe(F.col(f"a_{c}")), F.lit(c)
                )
                for c in value_cols
            ]),
            lambda x: x.isNotNull(),
        )
        if value_cols
        else F.array().cast("array<string>")
    )
    classified = joined.select(
        op.alias("_op"), changed_arr.alias("_changed"), "*"
    )
    return classified, keys, schema_cols


def capture_changes(
    table: LakeTable,
    from_snapshot: int,
    to_snapshot: int,
    key_columns: list[str] | None = None,
    max_rows: int = 10_000,
) -> dict:
    classified, keys, schema_cols = _classified_changes(
        table, from_snapshot, to_snapshot, key_columns
    )
    classified = classified.persist()
    try:
        counts = {
            row["_op"]: row["n"]
            for row in classified.groupBy("_op").agg(F.count("*").alias("n")).collect()
        }

        def _rows(kind: str) -> list[dict]:
            return [
                row.asDict(recursive=True)
                for row in classified.where(F.col("_op") == kind)
                .limit(max_rows)
                .collect()
            ]

        inserts = [
            {c: d[f"a_{c}"] for c in schema_cols} for d in _rows("INSERT")
        ]
        deletes = [
            {c: d[f"r_{c}"] for c in schema_cols} for d in _rows("DELETE")
        ]
        updates = [
            {
                "key": {k: d[f"a_{k}"] for k in keys},
                "before": {c: d[f"r_{c}"] for c in schema_cols},
                "after": {c: d[f"a_{c}"] for c in schema_cols},
                "changed_columns": d["_changed"],
            }
            for d in _rows("UPDATE")
        ]
    finally:
        classified.unpersist()
    # reference result carries a single typed change list alongside the
    # per-kind lists (cdc.py get_changes "changes" entries)
    changes = (
        [{"type": "INSERT", "row": r} for r in inserts]
        + [
            {
                "type": "UPDATE",
                "key": u["key"],
                "before": u["before"],
                "after": u["after"],
                "changed_columns": u["changed_columns"],
            }
            for u in updates
        ]
        + [{"type": "DELETE", "row": r} for r in deletes]
    )
    return {
        "table": f"{table.namespace}.{table.table}",
        "from_snapshot": from_snapshot,
        "to_snapshot": to_snapshot,
        "key_columns": keys,
        "inserts": inserts,
        "updates": updates,
        "deletes": deletes,
        "changes": changes,
        "summary": {
            # distributed counts — exact even when detail rows are capped
            "inserts": counts.get("INSERT", 0),
            "updates": counts.get("UPDATE", 0),
            "deletes": counts.get("DELETE", 0),
        },
        "captured_at": datetime.now(timezone.utc).isoformat(),
    }


def change_log(table: LakeTable, limit: int = 10, key_columns: list[str] | None = None) -> list[dict]:
    """I5: pairwise snapshot walk, most recent first (cdc.py:190-227).
    Entries carry the reference fields from/to_snapshot, timestamp,
    summary, change_count."""
    snaps = table.snapshots()
    out = []
    for newer, older in zip(reversed(snaps), reversed(snaps[:-1])):
        if len(out) >= limit:
            break
        ch = capture_changes(table, older.snapshot_id, newer.snapshot_id, key_columns)
        out.append(
            {
                "from_snapshot": older.snapshot_id,
                "to_snapshot": newer.snapshot_id,
                "operation": newer.operation,
                "timestamp": datetime.fromtimestamp(
                    newer.timestamp_ms / 1000, tz=timezone.utc
                ).isoformat(),
                "timestamp_ms": newer.timestamp_ms,
                "summary": ch["summary"],
                "change_count": sum(ch["summary"].values()),
                **ch["summary"],
            }
        )
    return out


def change_summary(
    table: LakeTable,
    from_snapshot: int,
    to_snapshot: int,
    key_columns: list[str] | None = None,
) -> dict:
    """Reference get_change_summary: counts + total + the columns any
    update touched (cdc.py:230-268)."""
    classified, _keys, schema_cols = _classified_changes(
        table, from_snapshot, to_snapshot, key_columns
    )
    classified = classified.persist()
    try:
        counts = {
            row["_op"]: row["n"]
            for row in classified.groupBy("_op")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        # union of changed columns, computed distributed — collect is
        # bounded by the column count, never the change count
        affected = {
            row["c"]
            for row in classified.where(F.col("_op") == "UPDATE")
            .select(F.explode("_changed").alias("c"))
            .distinct()
            .collect()
        }
    finally:
        classified.unpersist()
    if counts.get("INSERT") or counts.get("DELETE"):
        affected.update(schema_cols)
    summary = {
        "inserts": counts.get("INSERT", 0),
        "updates": counts.get("UPDATE", 0),
        "deletes": counts.get("DELETE", 0),
    }
    return {
        "table": f"{table.namespace}.{table.table}",
        "from_snapshot": from_snapshot,
        "to_snapshot": to_snapshot,
        **summary,
        "total_changes": sum(summary.values()),
        "affected_columns": sorted(affected),
    }


def export_changes(changes: dict, file_format: str = "json") -> str:
    """I6 (cdc.py:271-325): JSON full structure, or CSV with
    UPDATE_BEFORE/UPDATE_AFTER rows."""
    if file_format == "json":
        return json.dumps(changes, indent=1, default=str)
    if file_format == "csv":
        cols = list(
            (changes["inserts"] or changes["deletes"] or [{}])[0].keys()
        ) or list((changes["updates"][0]["after"] if changes["updates"] else {}).keys())
        buf = io.StringIO()
        w = csv.writer(buf)
        w.writerow(["change_type", *cols])
        for r in changes["inserts"]:
            w.writerow(["INSERT", *[r.get(c) for c in cols]])
        for u in changes["updates"]:
            w.writerow(["UPDATE_BEFORE", *[u["before"].get(c) for c in cols]])
            w.writerow(["UPDATE_AFTER", *[u["after"].get(c) for c in cols]])
        for r in changes["deletes"]:
            w.writerow(["DELETE", *[r.get(c) for c in cols]])
        return buf.getvalue()
    raise ValueError(f"Unsupported format {file_format!r} (json|csv)")


def replay_changes(target: LakeTable, changes: dict) -> dict:
    """I7 (cdc.py:328-389): apply captured changes to another table —
    inserts appended, updates upserted by key, deletes filtered by
    NULL-safe all-column match."""
    applied = {"inserts": 0, "updates": 0, "deletes": 0}
    if changes["inserts"]:
        applied["inserts"] = crud.insert_rows(target, _plain(changes["inserts"]))
    if changes["updates"]:
        rows = _plain([u["after"] for u in changes["updates"]])
        res = crud.upsert_rows(target, rows, changes["key_columns"])
        applied["updates"] = res["updated"] + res["inserted"]
    for d in changes["deletes"]:
        parts = []
        for c, v in d.items():
            if v is None:
                parts.append(f"{c} IS NULL")
            elif isinstance(v, str):
                parts.append(f"{c} = '{v.replace(chr(39), chr(39) * 2)}'")
            elif hasattr(v, "isoformat"):
                parts.append(f"{c} = '{v.isoformat()}'")
            else:
                parts.append(f"{c} = {v}")
        applied["deletes"] += crud.delete_rows(target, " AND ".join(parts))
    return applied


def _plain(rows: list[dict]) -> list[dict]:
    return [dict(r) for r in rows]


def changelog_view(
    table: LakeTable,
    from_snapshot: int,
    to_snapshot: int | None = None,
) -> "DataFrame":
    """Iceberg ``create_changelog_view`` analogue: ONE LAZY DataFrame of
    row-level changes across the snapshot range (from_snapshot,
    to_snapshot], stamped with ``_change_type`` ('insert' | 'delete'),
    ``_commit_snapshot_id`` and ``_change_ordinal`` (1-based commit
    position within the range). Updates surface as delete+insert pairs
    — Iceberg's default changelog granularity without pre/post images.

    Unlike ``capture_changes`` (the reference's collected-dict report,
    max_rows-capped), this never collects: each commit contributes a
    metadata-planned branch —

    * additive commits (append / MoR delete / MoR update / equality
      delete): inserts = a scan of exactly the files the commit added;
      deletes = the commit's NEW delete keys joined back against the
      parent snapshot's live rows (position keys on the reader-reported
      (_mor_file, _mor_pos); equality keys null-safe on their columns).
      No diff job, no full-table read — O(changed data), the property
      that makes a changelog usable on a 100 TB table.
    * rewriting commits (overwrite / CoW update / compact / rollback):
      schema-conformed EXCEPT both ways — compaction nets to zero rows.

    The union stays a plan; consumers filter/aggregate/stream it like
    any DataFrame."""
    from pyspark.sql import DataFrame  # noqa: F401  (annotation only)

    spark = table.spark
    snaps = table.snapshots()
    by_id = {s.snapshot_id: s for s in snaps}
    if to_snapshot is None:
        cur = table.current_snapshot()
        if cur is None:
            raise ValueError("empty table has no changelog")
        to_snapshot = cur.snapshot_id
    if from_snapshot not in by_id or to_snapshot not in by_id:
        raise ValueError("snapshot not found")
    # walk parent links back from `to` until `from` (ancestor check)
    chain: list = []
    cur_id = to_snapshot
    while cur_id is not None and cur_id != from_snapshot:
        s = by_id.get(cur_id)
        if s is None:
            break
        chain.append(s)
        cur_id = s.parent_id
    if cur_id != from_snapshot:
        raise ValueError(
            f"snapshot {from_snapshot} is not an ancestor of {to_snapshot}")
    chain.reverse()

    import os as _os

    schema = table.schema()
    cols = [f.name for f in schema.fields]
    meta = [
        ("_change_type", "string"),
        ("_commit_snapshot_id", "long"),
        ("_change_ordinal", "int"),
    ]
    empty = spark.createDataFrame(
        [], T.StructType(
            list(schema.fields)
            + [T.StructField(n, _parse_meta_t(t)) for n, t in meta]))

    def _stamp(df, kind: str, snap_id: int, ordinal: int):
        return df.select(*cols).withColumns({
            "_change_type": F.lit(kind),
            "_commit_snapshot_id": F.lit(snap_id).cast("long"),
            "_change_ordinal": F.lit(ordinal).cast("int"),
        })

    parts = []
    prev = by_id[from_snapshot]
    for ordinal, snap in enumerate(chain, start=1):
        prev_files = set(prev.files)
        added = [f for f in snap.files if f not in prev_files]
        removed = [f for f in prev.files if f not in set(snap.files)]
        new_pos = [d for d in snap.delete_files
                   if d not in set(prev.delete_files)]
        prev_eq_paths = {d["path"] for d in prev.eq_delete_files}
        new_eq = [d for d in snap.eq_delete_files
                  if d["path"] not in prev_eq_paths]
        same_schema = (
            table._snapshot_schema_version(snap)
            == table._snapshot_schema_version(prev)
        )
        if removed or not same_schema:
            # rewrite (or mid-chain schema change): conformed EXCEPT
            new_df = table.scan_conformed(snap.snapshot_id)
            old_df = table.scan_conformed(prev.snapshot_id)
            parts.append(_stamp(new_df.exceptAll(old_df), "insert",
                                snap.snapshot_id, ordinal))
            parts.append(_stamp(old_df.exceptAll(new_df), "delete",
                                snap.snapshot_id, ordinal))
        else:
            if added:
                parts.append(_stamp(
                    table.scan_files(added), "insert",
                    snap.snapshot_id, ordinal))
            if new_pos or new_eq:
                live_prev = table.scan_files(
                    prev.files, with_pos=bool(new_pos),
                    merge_snapshot=prev)
                if new_pos:
                    keys = spark.read.parquet(
                        *[_os.path.join(table.root, d) for d in new_pos])
                    dead = live_prev.join(
                        keys,
                        (live_prev["_mor_file"] == keys["_file"])
                        & (live_prev["_mor_pos"] == keys["_pos"]),
                        "left_semi",
                    )
                    parts.append(_stamp(dead, "delete",
                                        snap.snapshot_id, ordinal))
                for d in new_eq:
                    keys = spark.read.parquet(
                        _os.path.join(table.root, d["path"]))
                    cond = None
                    for c in d["cols"]:
                        t_ = live_prev[c].eqNullSafe(keys[c])
                        cond = t_ if cond is None else (cond & t_)
                    parts.append(_stamp(
                        live_prev.join(keys, cond, "left_semi"), "delete",
                        snap.snapshot_id, ordinal))
        prev = snap
    if not parts:
        return empty
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _parse_meta_t(t: str):
    return {"string": T.StringType(), "long": T.LongType(),
            "int": T.IntegerType()}[t]

"""CRUD / merge over snapshot tables (SURVEY §2.3 C1-C7).

The reference's motif is read-all → rewrite in DuckDB → overwrite
(reference catalog.py:500-1344). Here every rewrite is a Spark job:
filters are Catalyst expressions (pushed to the scan for the untouched
side), and upsert is a left-anti join + union — the MERGE INTO shape —
with the incoming side broadcast when small.

Row-count semantics match the reference: update/delete return the
number of affected rows (counted before the rewrite); upsert returns
(updated, inserted).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import LakeTable


def rows_to_df(table: LakeTable, rows: list[dict[str, Any]]) -> DataFrame:
    """Dict rows → typed DataFrame against the table schema, rejecting
    unknown columns (reference catalog.py:500-593 coercion surface)."""
    schema = table.schema()
    known = {f.name for f in schema.fields}
    for r in rows:
        unknown = set(r) - known
        if unknown:
            raise ValueError(f"unknown columns: {sorted(unknown)}")
    return table.spark.createDataFrame(
        [tuple(_coerce(r.get(f.name), f.dataType.simpleString()) for f in schema.fields)
         for r in rows],
        schema,
    )


def insert_rows(table: LakeTable, rows: list[dict[str, Any]]) -> int:
    """C1: dict rows → typed DataFrame → append (reference
    catalog.py:500-629; the per-type Python coercion loops collapse into
    one createDataFrame against the table schema)."""
    if not rows:
        return 0
    table.append(rows_to_df(table, rows))
    return len(rows)


def _matched_files(
    table: LakeTable, filter_expr: str, snapshot_id: int | None = None
) -> tuple[int, list[str]]:
    """One pushed-down scan: which data files hold rows matching cond,
    and how many rows match. Two pruning layers: scan(filter=...) plans
    the probe over only the files whose *persisted* stats intersect the
    predicate (no listing/footers for the rest), and parquet footer
    min/max skips non-matching row groups within the survivors — at
    scale the probe touches candidate files only, which is what makes
    CoW update/delete file-pruned instead of whole-table rewrites.
    ``snapshot_id`` pins the probe to the snapshot the caller will CAS
    its commit against.

    The probe groups on the ``_mor_file`` metadata file path, not
    ``input_file_name()``: once a snapshot carries MoR delete files the
    scan has a second source and Spark rejects input_file_name outright
    — and counting over the MERGED scan is also what keeps ``matched``
    honest (already-deleted rows are not re-counted)."""
    src = table.scan(snapshot_id=snapshot_id, filter=filter_expr,
                     with_pos=True)
    per_file = (
        src
        .groupBy(F.col("_mor_file").alias("_f"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()  # one row per touched FILE — bounded by file count
    )
    matched = sum(r["_n"] for r in per_file)
    files = sorted({table.relativize_file(r["_f"]) for r in per_file})
    return matched, files


def _write_mode(table: LakeTable, kind: str) -> str:
    """Mutation mode from Iceberg's table-property names:
    ``write.delete.mode`` / ``write.update.mode`` / ``write.merge.mode``
    in {copy-on-write, merge-on-read}; copy-on-write is the default (oracle parity — MoR
    is the 100 TB amortization for small mutations). MoR requires
    parquet data files: the position key uses parquet's
    _metadata.row_index, which ORC does not expose."""
    mode = table.properties().get(f"write.{kind}.mode", "copy-on-write")
    if mode not in ("copy-on-write", "merge-on-read"):
        raise ValueError(
            f"write.{kind}.mode must be copy-on-write or merge-on-read "
            f"(got {mode!r})"
        )
    if mode == "merge-on-read":
        cur = table.current_snapshot()
        if table.write_format() != "parquet" or (
            cur and any(f.endswith(".orc") for f in cur.files)
        ):
            raise ValueError(
                "merge-on-read requires parquet data files "
                "(_metadata.row_index is parquet-only)"
            )
    return mode


def update_rows(table: LakeTable, filter_expr: str, updates: dict[str, Any]) -> int:
    """C2: UPDATE … SET … WHERE filter as CASE-projection rewrite
    (reference catalog.py:632-762 rewrites the whole table; here only
    the files that actually hold matching rows are rewritten — the
    untouched files carry into the new snapshot by reference). Returns
    matched-row count. Guard raises mirror the reference
    (catalog.py:632-660): empty filter / empty updates / unknown column."""
    if not filter_expr or not filter_expr.strip():
        raise ValueError("Filter expression is required for update")
    if not updates:
        raise ValueError("Updates dictionary cannot be empty")
    schema = table.schema()
    known = {f.name for f in schema.fields}
    unknown = sorted(set(updates) - known)
    if unknown:
        raise ValueError(
            f"Column '{unknown[0]}' does not exist in table schema"
        )
    cond = F.expr(filter_expr)
    # pin the snapshot FIRST: probe, keep-list, and CAS all refer to it
    cur = table.current_snapshot()
    if cur is None:
        return 0
    if _write_mode(table, "update") == "merge-on-read":
        return _mor_update(table, filter_expr, updates, schema, cur)
    matched, touched = _matched_files(table, filter_expr, cur.snapshot_id)
    if matched == 0:
        return 0
    touched_set = set(touched)
    keep = [f for f in cur.files if f not in touched_set]
    # merge pending MoR deletes: rewriting a file WITHOUT applying its
    # position deletes would resurrect deleted rows (mixed-mode tables)
    sub = table.scan_files(touched, merge_snapshot=cur)
    cols = []
    for f in schema.fields:
        if f.name in updates:
            cols.append(
                F.when(cond, F.lit(updates[f.name]).cast(f.dataType))
                .otherwise(F.col(f.name))
                .alias(f.name)
            )
        else:
            cols.append(F.col(f.name))
    # CAS against the snapshot the keep/rewrite split was planned on:
    # a concurrent commit raises CommitConflictError instead of having
    # this overwrite silently drop its files
    table.replace_files(
        keep,
        sub.select(*cols),
        {"updated_rows": matched},
        expected_snapshot_id=cur.snapshot_id,
    )
    return matched


def delete_rows(table: LakeTable, filter_expr: str) -> int:
    """C3: DELETE WHERE filter = keep NOT(filter) (reference
    catalog.py:765-831). NULL-safe: rows where the predicate is NULL are
    kept, matching SQL delete semantics. Only files holding matching
    rows are rewritten."""
    if not filter_expr or not filter_expr.strip():
        raise ValueError("Filter expression is required for delete")
    cond = F.expr(filter_expr)
    cur = table.current_snapshot()
    if cur is None:
        return 0
    if _write_mode(table, "delete") == "merge-on-read":
        return _mor_delete(table, filter_expr, cur)
    matched, touched = _matched_files(table, filter_expr, cur.snapshot_id)
    if matched == 0:
        return 0
    touched_set = set(touched)
    keep = [f for f in cur.files if f not in touched_set]
    sub = table.scan_files(touched, merge_snapshot=cur)
    table.replace_files(
        keep,
        sub.where(~F.coalesce(cond, F.lit(False))),
        {"deleted_rows": matched},
        expected_snapshot_id=cur.snapshot_id,
    )
    return matched


def replace_where(
    table: LakeTable,
    filter_expr: str,
    df: DataFrame,
    enforce: bool = True,
) -> dict[str, int]:
    """Filtered overwrite in ONE atomic commit (Delta ``replaceWhere``
    / Iceberg ``overwrite(overwrite_filter=...)`` analogue; the
    reference has no equivalent — its overwrite is whole-table,
    reference catalog.py:500-1344): delete every row matching
    ``filter_expr`` and insert ``df``, with no intermediate snapshot
    where the partition is missing or doubled. This is the idempotent
    partition-reload primitive — a backfill job recomputes one day and
    swaps it in atomically; rerunning the job converges instead of
    duplicating.

    Copy-on-write and file-pruned: the probe plans over only the files
    whose persisted stats intersect the predicate, untouched files
    carry into the new snapshot by reference, and the rewrite scans
    candidates through the delete-merged reader (pending MoR deletes
    are folded, not resurrected). ``enforce=True`` (default, Delta
    semantics) rejects incoming rows that do NOT satisfy the filter —
    otherwise a bad backfill silently leaks rows into partitions the
    commit claims not to touch. Returns ``{"deleted_rows": n,
    "inserted_rows": m}``. Raises CommitConflictError on a concurrent
    commit (callers wrap in ``retry_on_conflict``)."""
    if not filter_expr or not filter_expr.strip():
        raise ValueError("Filter expression is required for replace_where")
    cond = F.expr(filter_expr)
    # Persist the aligned batch: enforcement and the commit must see
    # the SAME rows — a non-deterministic source (rand(), a changing
    # upstream table) evaluated twice could pass the enforce agg and
    # then commit different rows violating the filter, and the
    # reported counts would describe rows that were never written.
    aligned = table._align(df).persist()
    try:
        # one pass over the incoming batch: row count + violation count
        stats = aligned.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(~F.coalesce(cond, F.lit(False)), 1)).alias("bad"),
        ).first()
        inserted = int(stats["n"])
        if enforce and stats["bad"]:
            raise ValueError(
                "replace_where: incoming rows do not satisfy the filter "
                f"{filter_expr!r} (pass enforce=False to allow)"
            )
        cur = table.current_snapshot()
        if cur is None or not cur.files:
            table.append(aligned)
            return {"deleted_rows": 0, "inserted_rows": inserted}
        matched, touched = _matched_files(table, filter_expr, cur.snapshot_id)
        touched_set = set(touched)
        keep = [f for f in cur.files if f not in touched_set]
        if matched:
            preserved = (
                table.scan_files(touched, merge_snapshot=cur)
                .where(~F.coalesce(cond, F.lit(False)))
            )
            replacement = preserved.unionByName(aligned)
        else:
            replacement = aligned
        table.replace_files(
            keep,
            replacement,
            {"operation_detail": "replace_where",
             "deleted_rows": matched, "inserted_rows": inserted},
            expected_snapshot_id=cur.snapshot_id,
        )
        return {"deleted_rows": matched, "inserted_rows": inserted}
    finally:
        aligned.unpersist()


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def overwrite_partitions(table: LakeTable, df: DataFrame) -> dict[str, int]:
    """Dynamic partition overwrite (Spark ``partitionOverwriteMode =
    dynamic`` / Iceberg ``overwrite_partitions`` analogue): atomically
    replace exactly the partitions PRESENT in ``df`` — whole partition
    directories swap out, untouched partitions carry by reference, all
    in one commit. This is the other idempotent backfill primitive
    next to ``replace_where``: the job does not even need to know
    which partitions it recomputed.

    File matching is pure driver-side metadata: hidden-partitioning
    writes encode the transform values in the data-file paths
    (``_p_day=2024-01-01/part-...``), so the touched-file set comes
    from the incoming batch's distinct partition tuples (one small
    distinct job, bounded by the number of touched partitions) matched
    against path segments — no table scan at any scale. Files written
    under an OLDER partition spec hold rows from many current
    partitions and cannot be swapped wholesale; they raise with a
    pointer to ``compact()`` (which rewrites into the current spec).
    Raises CommitConflictError on a concurrent commit."""
    from urllib.parse import unquote

    pfields = table.partition_fields()
    if not pfields:
        raise ValueError(
            "overwrite_partitions requires a partitioned table "
            "(use replace_where on unpartitioned tables)"
        )
    aligned = table._align(df)
    # Spark's partitioned writer sends EMPTY-STRING partition values to
    # the __HIVE_DEFAULT_PARTITION__ directory too — treating only None
    # as the sentinel would leave old files unmatched and silently
    # append instead of replace.
    tuples = {
        tuple(_HIVE_NULL if v is None or v == "" else v for v in r)
        for r in aligned.select(
            *[pf.expr().cast("string").alias(pf.name) for pf in pfields]
        ).distinct().collect()
    }
    inserted = aligned.count()
    cur = table.current_snapshot()
    if cur is None or not cur.files or not tuples:
        if inserted:
            table.append(aligned)
        return {"replaced_partitions": 0, "dropped_files": 0,
                "inserted_rows": inserted}

    names = [pf.name for pf in pfields]

    def _file_tuple(rel: str) -> tuple | None:
        vals: dict[str, str] = {}
        for seg in rel.split("/"):
            k, eq, v = seg.partition("=")
            if eq:
                vals[k] = unquote(v)
        if any(n not in vals for n in names):
            return None  # written under an older partition spec
        return tuple(vals[n] for n in names)

    matched: list[str] = []
    keep: list[str] = []
    for f in cur.files:
        ft = _file_tuple(f)
        if ft is None:
            raise ValueError(
                f"data file {f!r} predates the current partition spec — "
                "run compact() to rewrite it before overwrite_partitions"
            )
        (matched if ft in tuples else keep).append(f)
    table.replace_files(
        keep,
        aligned,
        {"operation_detail": "overwrite_partitions",
         "replaced_partitions": len(tuples),
         "dropped_files": len(matched),
         "inserted_rows": inserted},
        expected_snapshot_id=cur.snapshot_id,
    )
    return {"replaced_partitions": len(tuples),
            "dropped_files": len(matched), "inserted_rows": inserted}


def _mor_delete(table: LakeTable, filter_expr: str, cur) -> int:
    """Merge-on-read DELETE: instead of rewriting every matched data
    file, record the matched rows' (file path, row index) keys in
    a position-delete file; scans anti-join them away. A one-row
    delete on a 100 TB table writes one tiny file. The scan below is
    stats-pruned by the filter AND already merges earlier delete
    files, so re-deleting rows twice records no duplicate keys."""
    src = table.scan(
        snapshot_id=cur.snapshot_id, filter=filter_expr, with_pos=True
    )
    keys = src.select(
        F.col("_mor_file").alias("_file"), F.col("_mor_pos").alias("_pos")
    ).persist()
    try:
        matched = keys.count()
        if matched == 0:
            return 0
        del_files = table.write_position_deletes(keys)
        table.commit_position_deletes(
            del_files,
            {"deleted_rows": matched},
            expected_snapshot_id=cur.snapshot_id,
        )
    finally:
        keys.unpersist()
    return matched


def delete_rows_by_key(
    table: LakeTable,
    keys: list[dict[str, Any]],
    cols: list[str] | None = None,
) -> int:
    """Equality delete (Iceberg v2 equality-delete-file analogue): the
    streaming-CDC ingestion primitive — delete every row whose key
    columns match any of ``keys``, WITHOUT touching a single data file
    and WITHOUT knowing row positions. A key-value parquet file joins
    the snapshot's equality-delete list stamped with the commit's
    sequence; scans anti-join it against data files with an OLDER
    sequence only, so re-inserting a deleted key later is visible.

    Unlike position deletes this needs no ``_metadata.row_index``, so
    it works on ORC tables too, and it never scans the table on the
    write path — the only job below is the matched-row COUNT kept for
    the reference CRUD contract (delete_rows returns affected rows).

    ``cols`` defaults to the union of the key dicts' fields; every key
    dict must bind exactly those columns. NULL key values match
    null-safely (a key {"k": None} deletes rows where k IS NULL)."""
    if not keys:
        return 0
    cols = list(cols) if cols else sorted({c for row in keys for c in row})
    schema = table.schema()
    known = {f.name for f in schema.fields}
    unknown = [c for c in cols if c not in known]
    if unknown:
        raise ValueError(f"unknown key columns: {unknown}")
    for row in keys:
        if set(row) - set(cols):
            raise ValueError(
                f"key row {row} binds columns outside {cols}"
            )
    cur = table.current_snapshot()
    if cur is None or not cur.files:
        return 0  # no data files can be older than this delete
    sub_schema = [f for f in schema.fields if f.name in set(cols)]
    key_df = table.spark.createDataFrame(
        [tuple(_coerce(r.get(f.name), f.dataType.simpleString())
               for f in sub_schema) for r in keys],
        schema=T.StructType(sub_schema),
    )
    # matched count against the MERGED view of the pinned snapshot
    # (rows already deleted by earlier position/equality deletes must
    # not be counted again)
    scan = table.scan(snapshot_id=cur.snapshot_id)
    probe = key_df.select(
        *[F.col(c).alias(f"_k_{c}") for c in cols]
    ).dropDuplicates()
    cond = None
    for c in cols:
        term = scan[c].eqNullSafe(probe[f"_k_{c}"])
        cond = term if cond is None else (cond & term)
    matched = scan.join(F.broadcast(probe), cond, "left_semi").count()
    eq_files = table.write_eq_deletes(key_df, cols)
    table.commit_eq_deletes(
        eq_files,
        cols,
        {"deleted_rows": matched, "key_rows": len(keys)},
        expected_snapshot_id=cur.snapshot_id,
    )
    return matched


def _mor_update(
    table: LakeTable,
    filter_expr: str,
    updates: dict[str, Any],
    schema,
    cur,
) -> int:
    """Merge-on-read UPDATE: matched rows are position-deleted and
    their updated versions appended as new data files, in ONE commit
    (files + delete files advance together — no torn state). Matched
    rows all satisfy the filter, so the update is a plain projection,
    not the CoW CASE rewrite."""
    src = table.scan(
        snapshot_id=cur.snapshot_id, filter=filter_expr, with_pos=True
    ).persist()
    try:
        matched = src.count()
        if matched == 0:
            return 0
        keys = src.select(
            F.col("_mor_file").alias("_file"),
            F.col("_mor_pos").alias("_pos"),
        )
        cols = [
            F.lit(updates[f.name]).cast(f.dataType).alias(f.name)
            if f.name in updates
            else F.col(f.name)
            for f in schema.fields
        ]
        del_files = table.write_position_deletes(keys)
        table.commit_mor_update(
            src.select(*cols),
            del_files,
            {"updated_rows": matched},
            expected_snapshot_id=cur.snapshot_id,
        )
    finally:
        src.unpersist()
    return matched


def upsert_rows(
    table: LakeTable, rows: list[dict[str, Any]], key_columns: list[str]
) -> dict[str, int]:
    """C4: MERGE semantics — matched rows replaced, new rows appended
    (reference catalog.py:1180-1344: inner-join count, left-anti keep,
    UNION ALL incoming, overwrite). With ``write.merge.mode =
    merge-on-read`` the matched rows are position-deleted and the
    incoming batch appends in one commit — no table rewrite."""
    if not key_columns:
        raise ValueError("key_columns must not be empty")
    schema = table.schema()
    known = {f.name for f in schema.fields}
    for k in key_columns:
        if k not in known:
            raise ValueError(
                f"Key column '{k}' does not exist in table schema"
            )
    if not rows:
        return {"updated": 0, "inserted": 0}
    for r in rows:
        missing = [k for k in key_columns if r.get(k) is None]
        if missing:
            raise ValueError(f"row missing key columns: {missing}")
    incoming = rows_to_df(table, rows)
    # pin the snapshot the merge reads, and CAS the overwrite against
    # it: a concurrent commit surfaces as CommitConflictError instead
    # of being silently erased by the rewrite
    base = table.current_snapshot()
    existing = table.scan(snapshot_id=base.snapshot_id if base else None)
    if existing.isEmpty():
        table.append(incoming)
        return {"updated": 0, "inserted": len(rows)}
    # count matched INCOMING rows (not matched existing rows): if the
    # table holds duplicate key values, counting the existing side could
    # exceed len(rows) and make `inserted` negative
    updated = incoming.join(existing, key_columns, "left_semi").count()
    if _write_mode(table, "merge") == "merge-on-read":
        # MoR MERGE: matched existing rows become position-delete keys
        # and the whole incoming batch appends — ONE commit, no data
        # file rewritten. The CoW path below overwrites the ENTIRE
        # table (kept ∪ incoming), which at 100 TB turns a 10-row
        # merge into a full rewrite; MoR makes it two tiny files.
        if updated == 0:
            table.append(incoming)  # pure insert: no delete file at all
            return {"updated": 0, "inserted": len(rows)}
        src = table.scan(
            snapshot_id=base.snapshot_id if base else None, with_pos=True
        ).join(
            F.broadcast(incoming.select(*key_columns).distinct()),
            key_columns,
            "left_semi",
        )
        keys_df = src.select(
            F.col("_mor_file").alias("_file"),
            F.col("_mor_pos").alias("_pos"),
        )
        del_files = table.write_position_deletes(keys_df)
        table.commit_mor_update(
            incoming,
            del_files,
            {"updated_rows": updated,
             "inserted_rows": len(rows) - updated},
            expected_snapshot_id=base.snapshot_id if base else None,
        )
        return {"updated": updated, "inserted": len(rows) - updated}
    kept = existing.join(F.broadcast(incoming), key_columns, "left_anti")
    table.overwrite(
        kept.unionByName(incoming),
        expected_snapshot_id=base.snapshot_id if base else None,
    )
    return {"updated": updated, "inserted": len(rows) - updated}


def execute_batch(table_ops: list[tuple[LakeTable, dict]]) -> list[dict]:
    """C5: sequential ops, stop-on-first-failure, remainder marked
    skipped; no cross-op rollback (reference catalog.py:1003-1088)."""
    results: list[dict] = []
    failed = False
    for table, op in table_ops:
        if failed:
            results.append({"op": op.get("op"), "status": "skipped"})
            continue
        try:
            kind = op["op"]
            if kind == "insert":
                n = insert_rows(table, op["rows"])
            elif kind == "update":
                n = update_rows(table, op["filter"], op["updates"])
            elif kind == "delete":
                n = delete_rows(table, op["filter"])
            else:
                raise ValueError(f"unknown op {kind!r}")
            results.append({"op": kind, "status": "ok", "rows_affected": n})
        except Exception as e:  # noqa: BLE001
            results.append({
                "op": op.get("op"), "status": "error",
                "error": str(e), "message": str(e),
            })
            failed = True
    return results


def merge_into(
    table: LakeTable,
    source: DataFrame,
    key_columns: list[str],
) -> dict[str, int]:
    """DataFrame-sourced MERGE (used by pipelines/CDC replay): same
    semantics as upsert_rows but the incoming side is a DataFrame and
    may be arbitrarily large — no broadcast hint, AQE decides."""
    base = table.current_snapshot()
    existing = table.scan(snapshot_id=base.snapshot_id if base else None)
    # persist: the batch is consumed by 3-4 actions (semi count, total
    # count, the overwrite write); for a micro-batch derived from a
    # non-trivial transform, re-execution would triple the source cost
    incoming = source.select(
        *[f.name for f in table.schema().fields]
    ).persist()
    try:
        if existing.isEmpty():
            n = incoming.count()
            table.append(incoming)
            return {"updated": 0, "inserted": n}
        updated = incoming.join(existing, key_columns, "left_semi").count()
        kept = existing.join(incoming, key_columns, "left_anti")
        total = incoming.count()
        # CAS against the pinned snapshot (see upsert_rows)
        table.overwrite(
            kept.unionByName(incoming),
            expected_snapshot_id=base.snapshot_id if base else None,
        )
        return {"updated": updated, "inserted": total - updated}
    finally:
        incoming.unpersist()


def _coerce(value: Any, type_name: str) -> Any:
    """ISO-string convenience coercion for date/timestamp dict inputs
    (reference catalog.py:565-593); everything else is handled by
    createDataFrame against the typed schema."""
    if value is None:
        return None
    if type_name == "date" and isinstance(value, str):
        from datetime import date

        return date.fromisoformat(value)
    if type_name.startswith("timestamp") and isinstance(value, str):
        from datetime import datetime

        return datetime.fromisoformat(value)
    if type_name in ("bigint", "long", "int") and isinstance(value, str):
        return int(value)
    if type_name in ("double", "float") and isinstance(value, (str, int)):
        return float(value)
    return value

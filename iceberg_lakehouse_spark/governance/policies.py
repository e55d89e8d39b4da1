"""Retention, maintenance, SLA, notifications (SURVEY G8-G11,
reference retention.py / maintenance.py / sla.py / notifications.py)."""

from __future__ import annotations

import time
from datetime import datetime, timezone

from ..catalog import LakeTable
from .stores import JsonStore

# grace window for AUTOMATED orphan detection + deletion: files younger
# than this are presumed to belong to an in-flight (not-yet-committed)
# writer and are neither counted nor removed (catalog.cleanup_orphans)
_ORPHAN_GRACE_S = 300


def _normalize_table(name: str) -> str:
    return name if "." in name else f"default.{name}"


class RetentionManager:
    """G10 (reference retention.py:34-259): policies
    {max_snapshot_age_hours>0, max_snapshot_count≥1,
    min_snapshots_to_keep≥1} with created_at/last_evaluated; evaluate
    computes the expire set by age∪count, clamps to min-keep, and acts
    (or reports would_expire on dry-run) with the reference action
    vocabulary no_action/would_expire/expired/error."""

    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {})

    def set_policy(
        self,
        table: str,
        max_snapshot_age_hours: float | None = None,
        max_snapshot_count: int | None = None,
        min_snapshots_to_keep: int = 1,
    ) -> dict:
        if not table or not table.strip():
            raise ValueError("Table name cannot be empty")
        table = _normalize_table(table)
        if max_snapshot_age_hours is not None and (
            not isinstance(max_snapshot_age_hours, (int, float))
            or max_snapshot_age_hours <= 0
        ):
            raise ValueError("max_snapshot_age_hours must be a positive number")
        if max_snapshot_count is not None and (
            not isinstance(max_snapshot_count, int) or max_snapshot_count < 1
        ):
            raise ValueError("max_snapshot_count must be a positive integer")
        if not isinstance(min_snapshots_to_keep, int) or min_snapshots_to_keep < 1:
            raise ValueError("min_snapshots_to_keep must be a positive integer")
        data = self.store.load()
        data[table] = {
            "max_snapshot_age_hours": max_snapshot_age_hours,
            "max_snapshot_count": max_snapshot_count,
            "min_snapshots_to_keep": min_snapshots_to_keep,
            "created_at": datetime.now(timezone.utc).isoformat(),
            "last_evaluated": None,
        }
        self.store.save(data)
        return {
            "table": table,
            "policy": data[table],
            "message": f"Retention policy set for '{table}'",
        }

    def get_policy(self, table: str) -> dict | None:
        return self.store.load().get(_normalize_table(table))

    def list_policies(self) -> list[dict]:
        return [
            {"table": t, **pol} for t, pol in self.store.load().items()
        ]

    def remove_policy(self, table: str) -> dict:
        table = _normalize_table(table)
        data = self.store.load()
        if table in data:
            del data[table]
            self.store.save(data)
            return {
                "table": table,
                "message": f"Retention policy removed for '{table}'",
            }
        return {
            "table": table,
            "message": f"No retention policy found for '{table}'",
        }

    def apply(self, table: LakeTable, dry_run: bool = False) -> dict:
        """Evaluate the table's policy. Single-table form of the
        reference's evaluate_retention; same result vocabulary."""
        name = f"{table.namespace}.{table.table}"
        # legacy stores keyed policies by bare table name; those stores
        # predate namespaces, so the fallback applies ONLY to the
        # default namespace — matching a bare 'events' policy against
        # analytics.events would expire history on the wrong table
        pol = self.get_policy(name)
        if pol is None and table.namespace == "default":
            pol = self.store.load().get(table.table)
        if not pol:
            return {"table": name, "action": "no_policy",
                    "message": f"No retention policy for '{name}'"}
        snapshots = sorted(table.snapshots(), key=lambda s: s.timestamp_ms)
        total = len(snapshots)
        min_keep = pol.get("min_snapshots_to_keep", 1)
        to_expire: set = set()
        if pol.get("max_snapshot_age_hours") is not None:
            cutoff_ms = int(
                (time.time() - pol["max_snapshot_age_hours"] * 3600) * 1000
            )
            to_expire.update(
                s.snapshot_id for s in snapshots if s.timestamp_ms < cutoff_ms
            )
        max_count = pol.get("max_snapshot_count")
        if max_count is not None and total > max_count:
            to_expire.update(s.snapshot_id for s in snapshots[: total - max_count])
        # clamp: never drop below min_snapshots_to_keep — discard the
        # NEWEST candidates first so the kept set stays most-recent
        if to_expire and total - len(to_expire) < min_keep:
            ordered = [s.snapshot_id for s in snapshots if s.snapshot_id in to_expire]
            needed = min_keep - (total - len(to_expire))
            for sid in reversed(ordered):
                if needed <= 0:
                    break
                to_expire.discard(sid)
                needed -= 1
        n = len(to_expire)
        if n == 0:
            return {
                "table": name, "action": "no_action",
                "total_snapshots": total, "expired": 0, "remaining": total,
                "dry_run": dry_run,
                "message": f"No snapshots to expire for '{name}'",
            }
        if dry_run:
            return {
                "table": name, "action": "would_expire",
                "total_snapshots": total, "would_expire": n,
                "would_remain": total - n, "dry_run": True,
                "message": f"Would expire {n} snapshot(s) from '{name}' "
                           f"(keeping {total - n})",
            }
        table.expire_snapshots(retain_last=total - n)
        data = self.store.load()
        if name in data:
            data[name]["last_evaluated"] = datetime.now(timezone.utc).isoformat()
            self.store.save(data)
        return {
            "table": name, "action": "expired",
            "total_snapshots": total, "expired": n, "remaining": total - n,
            "dry_run": False,
            "message": f"Expired {n} snapshot(s) from '{name}' "
                       f"(keeping {total - n})",
        }

    def evaluate_all(self, catalog, dry_run: bool = False) -> list[dict]:
        """Reference evaluate_retention with no table: every table that
        has a policy, skipping tables that fail to load as 'error'."""
        results = []
        for entry in self.list_policies():
            name = entry["table"]
            try:
                t = catalog.load_table(name)
            except Exception as e:  # noqa: BLE001
                results.append({"table": name, "action": "error",
                                "message": f"Could not load table: {e}"})
                continue
            results.append(self.apply(t, dry_run=dry_run))
        return results


class MaintenanceManager:
    """G11 (reference maintenance.py DEFAULT_POLICY + policies):
    {auto_compact_threshold=10, auto_expire_retain_last=5,
    auto_expire_older_than=None, auto_cleanup_orphans=True} with
    created_at/last_run; check_needed reports has_policy +
    needs_compact/needs_expire + an actions_needed list; run executes
    needed actions (status completed) or previews them (status
    dry_run) and stamps last_run on real runs."""

    DEFAULTS = {
        "auto_compact_threshold": 10,
        "auto_expire_retain_last": 5,
        "auto_expire_older_than": None,
        "auto_cleanup_orphans": True,
        # merge-on-read debt trigger (r7, no reference analogue): when
        # set, pending position-delete files >= this ALSO schedule a
        # compact (which folds them back into plain data files). None
        # preserves the reference's exact trigger set.
        "auto_compact_delete_files": None,
        # cheaper MoR debt response (r7): when set, position-delete
        # files >= this schedule rewrite_delete_files — the MINOR
        # compaction that consolidates delete files and drops dead
        # keys WITHOUT rewriting data. A needed full compact takes
        # precedence (it folds the deletes anyway).
        "auto_rewrite_delete_files": None,
        # truthy: re-run ANALYZE (column NDV stats) whenever the table
        # has committed past the last analyzed snapshot — keeps
        # join_strategy / optimizer food fresh without manual calls
        "auto_analyze": None,
        # a max_ratio number (e.g. 4.0): when this table is an ANN
        # index (ivf.* / ivfpq.* properties), split cells grown past
        # max_ratio x the median inverted-list size — extends never
        # re-cluster, so a drifting corpus needs this or probe
        # selectivity decays (r9; ties the index surface into the same
        # governance loop as auto_compact / auto_analyze)
        "auto_rebalance_index": None,
        # truthy: when this table is an index LINKED to a source table
        # (operators.index_sync.link_index_source), consume the
        # source's delete events since the last sync and remove the
        # matching index rows (one equality-delete commit) — without
        # it a curation loop that deletes near-dups re-probes stale
        # candidates forever (r10). When the sync reports live
        # UPDATES (reinserted_ids > 0), the run re-extends those ids'
        # current content back into the index (r11) — links on
        # text/vector indexes should name text_col/vec_col so that
        # can succeed unattended
        "auto_sync_index": None,
        # truthy: when this table is a quality-model REGISTRY
        # (governance.models — it has the model.promoted_version
        # property), retrain whenever the latest version's source
        # table has committed past the snapshot it was trained on.
        # The new version is REGISTERED, NEVER PROMOTED — production
        # scoring stays pinned until a human (or an explicit caller)
        # promotes, which is the lifecycle discipline the registry
        # exists for (r11)
        "auto_retrain_model": None,
        # a min-recall number in (0, 1]: when this table is an ANN /
        # IVFPQ index whose MEASURED sampled recall@10 (nprobe=2,
        # sample=8 — ann_recall_sample / ivfpq_recall_sample) falls
        # below it, schedule a REBUILD — the repair splits cannot
        # provide (straddled neighborhoods for plain IVF; for IVFPQ
        # the rebuild retrains the codebook from the LINKED source,
        # so it requires link_index_source(..., vec_col=...)). The
        # IVFPQ check runs in reconstruction mode (routing health;
        # self-contained) — codebook drift needs a corpus-mode
        # ivfpq_recall_sample by hand, documented honestly (r10)
        "auto_rebuild_index": None,
        # a target recall in (0, 1] (r14): when this table is an ANN /
        # IVFPQ index with no pinned probe width, or the index has
        # committed past the state it was last tuned at (extends,
        # rebuilds, syncs — property-only writes don't re-arm), or the
        # target changed, run the measured-recall tune_nprobe ladder
        # and PIN the result as the index's ivf.nprobe / ivfpq.nprobe
        # property — probes called without an explicit nprobe then
        # default to the tuned width. Closes the loop the samplers
        # opened: recall drifts → the policy re-measures → probe
        # configuration follows, no human in the loop.
        "auto_tune_nprobe": None,
    }

    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {})

    def set_policy(self, table: str, **kwargs) -> dict:
        unknown = set(kwargs) - set(self.DEFAULTS)
        if unknown:
            raise ValueError(f"unknown policy keys: {sorted(unknown)}")
        table = _normalize_table(table)
        data = self.store.load()
        data[table] = {
            **self.DEFAULTS,
            **kwargs,
            "created_at": datetime.now(timezone.utc).isoformat(),
            "last_run": None,
        }
        self.store.save(data)
        return {"table": table, "policy": data[table]}

    def get_policy(self, table: str) -> dict | None:
        """None when the table has no policy (reference semantics)."""
        return self.store.load().get(_normalize_table(table))

    def remove_policy(self, table: str) -> dict:
        table = _normalize_table(table)
        data = self.store.load()
        if table in data:
            del data[table]
            self.store.save(data)
            return {"table": table,
                    "message": f"Maintenance policy removed for '{table}'"}
        return {"table": table,
                "message": f"No policy found for '{table}'"}

    def list_policies(self) -> list[dict]:
        return [{"table": t, **pol} for t, pol in self.store.load().items()]

    def check_needed(self, table: LakeTable) -> dict:
        name = f"{table.namespace}.{table.table}"
        pol = self.get_policy(name)
        fs = table.file_stats()
        if pol is None:
            return {
                "table": name, "has_policy": False,
                "needs_compact": False, "needs_expire": False,
                "needs_orphan_cleanup": False, "actions_needed": [],
                "stats": fs,
            }
        cur_snap = table.current_snapshot()
        # both MoR delete kinds count as read-amplification debt
        n_dels = (
            len(cur_snap.delete_files) + len(cur_snap.eq_delete_files)
            if cur_snap else 0
        )
        del_thresh = pol.get("auto_compact_delete_files")
        needs_compact = (
            fs["file_count"] >= pol["auto_compact_threshold"]
            or (del_thresh is not None and n_dels >= del_thresh))
        needs_expire = fs["snapshot_count"] > pol["auto_expire_retain_last"]
        # detection must use the SAME grace window the automated cleanup
        # applies (r5 review): counting grace-shielded fresh files would
        # report needs_orphan_cleanup=True while the cleanup (correctly)
        # removes nothing — a perpetual no-op action every cycle
        graced_orphans = (
            len(table.orphan_files(grace_seconds=_ORPHAN_GRACE_S))
            if pol["auto_cleanup_orphans"] else 0
        )
        needs_orphans = graced_orphans > 0
        actions = []
        if needs_compact:
            if fs["file_count"] >= pol["auto_compact_threshold"]:
                actions.append(
                    f"compact ({fs['file_count']} files >= "
                    f"{pol['auto_compact_threshold']} threshold)"
                )
            else:
                actions.append(
                    f"compact ({n_dels} merge-on-read delete files >= "
                    f"{del_thresh} threshold)"
                )
        if needs_expire:
            actions.append(
                f"expire_snapshots ({fs['snapshot_count']} snapshots > "
                f"{pol['auto_expire_retain_last']} retained)"
            )
        rw_thresh = pol.get("auto_rewrite_delete_files")
        n_pos = len(cur_snap.delete_files) if cur_snap else 0
        needs_rewrite = (
            not needs_compact
            and rw_thresh is not None and n_pos >= rw_thresh
        )
        if needs_rewrite:
            actions.append(
                f"rewrite_delete_files ({n_pos} position-delete files >= "
                f"{rw_thresh} threshold)"
            )
        if needs_orphans:
            actions.append(f"cleanup_orphans ({graced_orphans} orphans)")
        needs_analyze = False
        if pol.get("auto_analyze"):
            a = table.analyzed_stats()
            needs_analyze = a is None or a.get("stale", True)
            if needs_analyze:
                actions.append(
                    "analyze (no column stats)" if a is None
                    else "analyze (stats stale — table committed past "
                         "the analyzed snapshot)"
                )
        needs_rebalance = False
        ratio = pol.get("auto_rebalance_index")
        if ratio:
            kind = self._index_kind(table)
            if kind:
                from pyspark.sql import functions as F

                from ..operators.ann_index import _hot_cells

                counts = {
                    int(r["cell"]): int(r["n"])
                    for r in table.scan().groupBy("cell")
                    .agg(F.count(F.lit(1)).alias("n")).collect()
                }
                # the ONE shared rule — a flagged cell is exactly one
                # the rebalance at this ratio will split
                hot, median = _hot_cells(counts, float(ratio))
                if hot:
                    needs_rebalance = True
                    actions.append(
                        f"rebalance_{kind}_index ({len(hot)} cell(s) "
                        f"> {ratio}x median list size {median})"
                    )
        needs_retrain = False
        if pol.get("auto_retrain_model"):
            props = table.properties()
            if "model.promoted_version" in props:
                from pyspark.sql import functions as F

                latest = (
                    table.scan()
                    .orderBy(F.desc("version"))
                    .select("version", "source_table",
                            "source_snapshot_id")
                    .first()
                )
                if latest is not None:
                    try:
                        src = table.catalog.load_table(
                            latest["source_table"])
                        scur = src.current_snapshot()
                        if (scur is not None and scur.snapshot_id
                                != int(latest["source_snapshot_id"])):
                            needs_retrain = True
                            actions.append(
                                f"retrain_model (source "
                                f"{latest['source_table']} at snapshot "
                                f"{scur.snapshot_id}, version "
                                f"{latest['version']} trained at "
                                f"{latest['source_snapshot_id']})"
                            )
                    except ValueError:
                        needs_retrain = True
                        actions.append(
                            f"retrain_model (source "
                            f"{latest['source_table']} missing)")
        needs_rebuild = False
        rebuild_pre_recall = None
        rebuild_suppressed = False
        min_recall = pol.get("auto_rebuild_index")
        if min_recall:
            kind = self._index_kind(table)
            # r13 damping (r12 ADVICE): a prior auto-rebuild at THIS
            # exact (index, source) snapshot state measured WORSE and
            # was rolled back — repeating it would burn the same
            # rebuild + recall-sample + rollback round trip for the
            # same answer. Skip (recall sample included) until either
            # side commits new data and the state string changes.
            stamp = table.properties().get(
                "index.rebuild_regressed_state")
            if kind and stamp and stamp == self._rebuild_state(table):
                rebuild_suppressed = True
                actions.append(
                    f"rebuild_{kind}_index suppressed (a rebuild at "
                    f"this index/source state {stamp} regressed and "
                    "was rolled back; waiting for new data)")
                kind = None
            if kind:
                if kind == "ivfpq":
                    from ..operators.ivfpq import ivfpq_recall_sample

                    # r11 (closes r10's "corpus-mode by hand" note):
                    # when the index is LINKED to its source vectors,
                    # measure TRUE recall against the corpus —
                    # reconstruction mode isolates routing only and
                    # cannot see codebook-drift loss
                    props = table.properties()
                    src_name = props.get("index.source_table")
                    vec_col = props.get("index.source_vec_col")
                    corpus = None
                    if src_name and vec_col:
                        try:
                            corpus = table.catalog.load_table(
                                src_name).scan()
                        except ValueError:
                            corpus = None  # dropped source: fall back
                    if corpus is not None:
                        rec = ivfpq_recall_sample(
                            table.catalog,
                            f"{table.namespace}.{table.table}",
                            corpus_df=corpus,
                            id_col=props["index.source_id_col"],
                            vec_col=vec_col)
                        rec["mode"] = "corpus"
                    else:
                        rec = ivfpq_recall_sample(
                            table.catalog,
                            f"{table.namespace}.{table.table}")
                        rec["mode"] = "reconstruction"
                else:
                    from ..operators.ann_index import ann_recall_sample

                    rec = ann_recall_sample(
                        table.catalog,
                        f"{table.namespace}.{table.table}")
                    rec["mode"] = "stored-vectors"
                measured = rec.get("recall_at_k")
                rebuild_pre_recall = measured
                if measured is not None and measured < float(min_recall):
                    needs_rebuild = True
                    actions.append(
                        f"rebuild_{kind}_index (sampled "
                        f"{rec['mode']}-mode recall@{rec['k']} = "
                        f"{measured:.2f} < {float(min_recall):.2f})"
                    )
        needs_nprobe_tune = False
        tune_target = pol.get("auto_tune_nprobe")
        if tune_target:
            kind = self._index_kind(table)
            if kind:
                props = table.properties()
                key = "ivfpq.nprobe" if kind == "ivfpq" else "ivf.nprobe"
                snap = table.current_snapshot()
                cur = str(snap.snapshot_id) if snap else "none"
                tuned_state = props.get("index.nprobe_tuned_state")
                tuned_target = props.get("index.nprobe_target_recall")
                stale = (
                    key not in props
                    or tuned_state != cur
                    or tuned_target != str(float(tune_target))
                )
                if stale:
                    needs_nprobe_tune = True
                    why = (
                        f"{key} unset" if key not in props
                        else f"tuned at state {tuned_state}, index now "
                             f"{cur}"
                        if tuned_state != cur
                        else f"target changed to {float(tune_target):.2f}"
                    )
                    actions.append(
                        f"tune_nprobe ({why}; target recall "
                        f"{float(tune_target):.2f})")
        needs_sync = False
        if pol.get("auto_sync_index"):
            props = table.properties()
            src_name = props.get("index.source_table")
            if src_name:
                try:
                    src = table.catalog.load_table(src_name)
                    scur = src.current_snapshot()
                    synced = props.get("index.synced_snapshot_id")
                    if (scur is not None and synced is not None
                            and scur.snapshot_id != int(synced)):
                        needs_sync = True
                        actions.append(
                            f"sync_index_deletes (source {src_name} at "
                            f"snapshot {scur.snapshot_id}, index synced "
                            f"to {synced})"
                        )
                except ValueError:
                    # dropped source: surface rather than swallow — a
                    # sync can never succeed again
                    needs_sync = True
                    actions.append(
                        f"sync_index_deletes (source {src_name} missing)")
        return {
            "table": name, "has_policy": True,
            "needs_compact": needs_compact, "needs_expire": needs_expire,
            "needs_rewrite_deletes": needs_rewrite,
            "needs_orphan_cleanup": needs_orphans,
            "needs_analyze": needs_analyze,
            "needs_rebalance": needs_rebalance,
            "needs_index_sync": needs_sync,
            "needs_index_rebuild": needs_rebuild,
            "needs_nprobe_tune": needs_nprobe_tune,
            "rebuild_pre_recall": rebuild_pre_recall,
            "rebuild_suppressed": rebuild_suppressed,
            "needs_model_retrain": needs_retrain,
            "actions_needed": actions, "stats": fs,
        }

    @staticmethod
    def _index_kind(table: LakeTable) -> str | None:
        props = table.properties()
        if "ivfpq.n_cells" in props:
            return "ivfpq"
        if "ivf.n_cells" in props:
            return "ann"
        return None

    @staticmethod
    def _rebuild_state(table: LakeTable) -> str:
        """The (index, source) snapshot state a regressed auto-rebuild
        is stamped against: ``<index_snapshot>:<source_snapshot>``.
        Either side committing new data changes the string and re-arms
        ``auto_rebuild_index``; property-only writes don't (the catalog
        stores properties in metadata, not snapshots)."""
        snap = table.current_snapshot()
        idx = str(snap.snapshot_id) if snap else "none"
        src = "none"
        src_name = table.properties().get("index.source_table")
        if src_name:
            try:
                ssnap = table.catalog.load_table(
                    src_name).current_snapshot()
                src = str(ssnap.snapshot_id) if ssnap else "none"
            except ValueError:
                src = "missing"
        return f"{idx}:{src}"

    def run(self, table: LakeTable, dry_run: bool = False) -> dict:
        name = f"{table.namespace}.{table.table}"
        pol = self.get_policy(name)
        needed = self.check_needed(table)
        actions = []
        if needed["needs_compact"]:
            if dry_run:
                actions.append({"action": "compact", "status": "dry_run"})
            else:
                # compact CASes against the snapshot it scanned; a
                # concurrent append mid-compaction raises a conflict —
                # re-planning (re-invoking) is the standard response
                from ..catalog import retry_on_conflict

                res = retry_on_conflict(table.compact)
                actions.append({"action": "compact", "status": "completed", **res})
        if needed.get("needs_rewrite_deletes"):
            if dry_run:
                actions.append({"action": "rewrite_delete_files",
                                "status": "dry_run"})
            else:
                from ..catalog import retry_on_conflict

                res = retry_on_conflict(table.rewrite_delete_files)
                actions.append({"action": "rewrite_delete_files",
                                "status": "completed", **res})
        if needed["needs_expire"]:
            if dry_run:
                actions.append({"action": "expire", "status": "dry_run"})
            else:
                res = table.expire_snapshots(
                    retain_last=pol["auto_expire_retain_last"]
                )
                actions.append({"action": "expire", "status": "completed", **res})
        if needed.get("needs_analyze"):
            if dry_run:
                actions.append({"action": "analyze", "status": "dry_run"})
            else:
                res = table.analyze()
                actions.append({"action": "analyze", "status": "completed",
                                "row_count": res["row_count"],
                                "columns": len(res["columns"])})
        if needed.get("needs_index_sync"):
            # BEFORE rebalance: removals change cell sizes, so the
            # split decision should see the post-sync distribution
            if dry_run:
                actions.append({"action": "sync_index_deletes",
                                "status": "dry_run"})
            else:
                from ..operators.index_sync import sync_index_deletes

                full_name = f"{table.namespace}.{table.table}"
                try:
                    res = sync_index_deletes(table.catalog, full_name)
                except ValueError as e:
                    # unrecoverable sync (dropped source, expired
                    # cursor snapshot): record the failure and let the
                    # REST of the maintenance run proceed — aborting
                    # here lost the completed actions' report and
                    # skipped rebalance every cycle (r10 review)
                    actions.append({
                        "action": "sync_index_deletes",
                        "status": "failed",
                        "error": str(e)[:300],
                    })
                else:
                    actions.append({
                        "action": "sync_index_deletes",
                        "status": "completed",
                        "deleted_ids": res["deleted_ids"],
                        "removed_index_rows": res["removed_index_rows"],
                        "reinserted_ids": res["reinserted_ids"],
                    })
                    if res["reinserted_ids"] > 0:
                        # r11 (r10 ADVICE): updated docs' final state
                        # is live — without this they silently vanish
                        # from the index. Re-derive their CURRENT
                        # content into the index; a link missing the
                        # content column lands as a FAILED action
                        # with the remedy, and index_status keeps
                        # reporting stale_reinserts until repaid.
                        from ..operators.index_sync import (
                            reextend_index,
                        )

                        try:
                            rex = reextend_index(
                                table.catalog, full_name)
                            actions.append({
                                "action": "reextend_index",
                                "status": "completed",
                                "reextended_ids":
                                    rex["reextended_ids"],
                                "index_rows_added":
                                    rex["index_rows_added"],
                            })
                        except ValueError as e:
                            actions.append({
                                "action": "reextend_index",
                                "status": "failed",
                                "error": str(e)[:300],
                            })
        if needed.get("needs_model_retrain"):
            if dry_run:
                actions.append({"action": "retrain_model",
                                "status": "dry_run"})
            else:
                from .models import retrain_latest

                full_name = f"{table.namespace}.{table.table}"
                try:
                    res = retrain_latest(table.catalog, full_name)
                    actions.append({
                        "action": "retrain_model",
                        "status": "completed",
                        "version": res["version"],
                        "n": res["n"],
                        # never promoted by policy — see DEFAULTS note
                        "promoted": res["promoted"],
                    })
                except ValueError as e:
                    actions.append({
                        "action": "retrain_model",
                        "status": "failed",
                        "error": str(e)[:300],
                    })
        if needed.get("needs_index_rebuild"):
            kind = self._index_kind(table)
            if dry_run:
                actions.append({"action": f"rebuild_{kind}_index",
                                "status": "dry_run"})
            else:
                full_name = f"{table.namespace}.{table.table}"
                props = table.properties()
                from ..catalog import retry_on_conflict

                rolled_back = False
                try:
                    if kind == "ivfpq":
                        src_name = props.get("index.source_table")
                        vec_col = props.get("index.source_vec_col")
                        if not src_name or not vec_col:
                            raise ValueError(
                                "IVFPQ rebuild needs the source corpus "
                                "— link_index_source(..., vec_col=...) "
                                "first (the frozen codebook cannot be "
                                "retrained from reconstructions)")
                        from ..operators.ivfpq import (
                            ivfpq_recall_sample,
                            rebuild_ivfpq_index,
                            record_ivfpq_version,
                            rollback_ivfpq_version,
                        )

                        res = retry_on_conflict(
                            lambda: rebuild_ivfpq_index(
                                table.catalog, full_name,
                                table.catalog.load_table(src_name)
                                .scan(),
                                id_col=props["index.source_id_col"],
                                vec_col=vec_col,
                            ))
                        # r12 (VERDICT missing #3): promote by
                        # MEASUREMENT, not by construction — re-check
                        # corpus-mode recall on the rebuilt index and
                        # compare against the PRE-rebuild measurement
                        # that triggered this cycle; a rebuild that
                        # measured strictly WORSE is restored from the
                        # version the rebuild pinned, instead of
                        # being left as the only state
                        post = ivfpq_recall_sample(
                            table.catalog, full_name,
                            corpus_df=table.catalog
                            .load_table(src_name).scan(),
                            id_col=props["index.source_id_col"],
                            vec_col=vec_col)
                        post_recall = post.get("recall_at_k")
                        pre_recall = needed.get("rebuild_pre_recall")
                        regressed = (post_recall is not None
                                     and pre_recall is not None
                                     and post_recall < pre_recall)
                        if regressed and res.get("saved_version"):
                            rollback_ivfpq_version(
                                table.catalog, full_name,
                                res["saved_version"])
                            # r13 (r12 ADVICE): damp the rebuild →
                            # regress → rollback loop. The restored
                            # recall is the same below-threshold value
                            # that triggered this cycle, so without a
                            # marker every maintenance run repeats the
                            # expensive round trip. Stamp the exact
                            # (index, source) snapshot state the
                            # regression was measured at; check_needed
                            # skips auto_rebuild_index (and the recall
                            # sample) while that state is unchanged.
                            # Property writes don't bump snapshots, so
                            # the stamp holds until real data commits.
                            table.set_properties({
                                "index.rebuild_regressed_state":
                                    self._rebuild_state(table),
                            })
                            actions.append({
                                "action": "rebuild_ivfpq_index",
                                "status": "rolled_back",
                                "pre_recall": pre_recall,
                                "post_recall": post_recall,
                                "restored_version":
                                    res["saved_version"],
                            })
                            rolled_back = True
                        elif regressed:
                            # measured worse but nothing to restore
                            # (the rebuild repaired a CRASHED rebuild,
                            # so no pre-state was pinnable) — ship it,
                            # but say the regression out loud instead
                            # of recording a 'promoted' version
                            # (r12 review)
                            # same damping as the rollback branch:
                            # the shipped state still measures below
                            # threshold, so an unstamped next cycle
                            # would rebuild again for the same answer
                            table.set_properties({
                                "index.rebuild_regressed_state":
                                    self._rebuild_state(table),
                            })
                            actions.append({
                                "action": "rebuild_ivfpq_index",
                                "status": "completed",
                                "rows": res["rows"],
                                "n_cells_after": res["n_cells_after"],
                                "recall_regressed": True,
                                "pre_recall": pre_recall,
                                "post_recall": post_recall,
                                "note": "no pre-rebuild version was "
                                "pinnable (crash-repair rebuild) — "
                                "nothing to restore",
                            })
                            rolled_back = True  # suppress the plain
                            # 'completed' append below; this action
                            # entry already reported the rebuild
                        else:
                            # measured-good rebuild: record it as the
                            # new promoted version, recall attached;
                            # any stale regression stamp is moot (the
                            # state changed) — drop it for hygiene
                            record_ivfpq_version(
                                table.catalog, full_name,
                                recall_at_k=post_recall,
                                note="auto: post-rebuild (promoted)")
                            if table.properties().get(
                                    "index.rebuild_regressed_state"):
                                table.unset_properties(
                                    ["index.rebuild_regressed_state"])
                    else:
                        from ..operators.ann_index import (
                            rebuild_ann_index,
                        )

                        res = retry_on_conflict(
                            lambda: rebuild_ann_index(
                                table.catalog, full_name))
                    if not rolled_back:
                        actions.append({
                            "action": f"rebuild_{kind}_index",
                            "status": "completed",
                            "rows": res["rows"],
                            "n_cells_after": res["n_cells_after"],
                        })
                    # a rebuild re-clusters everything — the pending
                    # rebalance decision is stale, drop it this cycle
                    needed["needs_rebalance"] = False
                except Exception as e:  # noqa: BLE001 — a failed
                    # rebuild (unlinked source, exhausted CAS retries,
                    # emptied index) must land as a FAILED action, not
                    # abort the rest of the maintenance run (r10
                    # review: ValueError-only let CommitConflictError
                    # through)
                    actions.append({
                        "action": f"rebuild_{kind}_index",
                        "status": "failed",
                        "error": str(e)[:300],
                    })
        if needed.get("needs_rebalance"):
            kind = self._index_kind(table)
            if dry_run:
                actions.append({"action": f"rebalance_{kind}_index",
                                "status": "dry_run"})
            else:
                ratio = float(pol["auto_rebalance_index"])
                full_name = f"{table.namespace}.{table.table}"
                if kind == "ivfpq":
                    from ..operators.ivfpq import rebalance_ivfpq_index

                    res = rebalance_ivfpq_index(
                        table.catalog, full_name, max_ratio=ratio)
                else:
                    from ..operators.ann_index import rebalance_ann_index

                    res = rebalance_ann_index(
                        table.catalog, full_name, max_ratio=ratio)
                actions.append({
                    "action": f"rebalance_{kind}_index",
                    "status": "completed",
                    "split_cells": res["split_cells"],
                    "n_cells_after": res["n_cells_after"],
                })
        if needed.get("needs_nprobe_tune"):
            # AFTER rebuild/rebalance on purpose: both change the cell
            # geometry, and the tuned width should be measured against
            # the index as it will actually be probed. The pinned
            # state is read AFTER those ops, so this cycle's own
            # commits don't immediately re-arm the tune.
            kind = self._index_kind(table)
            if dry_run:
                actions.append({"action": "tune_nprobe",
                                "status": "dry_run"})
            else:
                full_name = f"{table.namespace}.{table.table}"
                target = float(pol["auto_tune_nprobe"])
                try:
                    if kind == "ivfpq":
                        from ..operators.ivfpq import tune_nprobe

                        # corpus mode when linked (the honest space —
                        # same preference as auto_rebuild_index)
                        props = table.properties()
                        src_name = props.get("index.source_table")
                        vec_col = props.get("index.source_vec_col")
                        corpus = None
                        if src_name and vec_col:
                            try:
                                corpus = table.catalog.load_table(
                                    src_name).scan()
                            except ValueError:
                                corpus = None
                        rep = tune_nprobe(
                            table.catalog, full_name,
                            corpus_df=corpus,
                            id_col=props.get(
                                "index.source_id_col", "vec_id"),
                            vec_col=vec_col or "embedding",
                            target_recall=target)
                        key = "ivfpq.nprobe"
                    else:
                        from ..operators.ann_index import tune_nprobe

                        rep = tune_nprobe(
                            table.catalog, full_name,
                            target_recall=target)
                        key = "ivf.nprobe"
                    snap = table.current_snapshot()
                    table.set_properties({
                        key: str(rep["nprobe"]),
                        "index.nprobe_tuned_state":
                            str(snap.snapshot_id) if snap else "none",
                        "index.nprobe_target_recall":
                            str(target),
                        "index.nprobe_met":
                            str(bool(rep["met"])).lower(),
                    })
                    actions.append({
                        "action": "tune_nprobe",
                        "status": "completed",
                        "nprobe": rep["nprobe"],
                        "met": rep["met"],
                        "ladder_rungs": len(rep["ladder"]),
                        "measured_recall":
                            rep["ladder"][-1]["recall_at_k"],
                    })
                except Exception as e:  # noqa: BLE001 — same
                    # failed-action discipline as rebuild/sync
                    actions.append({
                        "action": "tune_nprobe",
                        "status": "failed",
                        "error": str(e)[:300],
                    })
        if needed["needs_orphan_cleanup"]:
            # AUTOMATED deletion path: the grace window shields a
            # concurrent writer's just-materialized (not-yet-committed)
            # files — without it auto-maintenance could corrupt the
            # table (r5 review finding #2)
            orphans = table.cleanup_orphans(
                dry_run=dry_run, grace_seconds=_ORPHAN_GRACE_S
            )
            actions.append({
                "action": "cleanup_orphans",
                "status": "dry_run" if dry_run else "completed",
                "removed": len(orphans),
            })
        if pol is not None and not dry_run:
            data = self.store.load()
            if name in data:
                data[name]["last_run"] = datetime.now(timezone.utc).isoformat()
                self.store.save(data)
        return {"table": name, "actions": actions}

    def run_all(self, catalog, dry_run: bool = False) -> list[dict]:
        """Run maintenance for every table with a policy."""
        out = []
        for entry in self.list_policies():
            try:
                t = catalog.load_table(entry["table"])
            except Exception as e:  # noqa: BLE001
                out.append({"table": entry["table"], "actions": [],
                            "error": str(e)})
                continue
            out.append(self.run(t, dry_run=dry_run))
        return out


class SlaManager:
    """G8 (reference sla.py): thresholds {max_staleness_hours>0,
    min_quality_score∈[0,100], min_row_count, max_null_pct}; check
    reports status passing/violation with human-readable violations +
    per-violation recommendations; history ≤ 50 per table."""

    ALLOWED = {
        "max_staleness_hours",
        "min_quality_score",
        "min_row_count",
        "max_null_pct",
    }

    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {"policies": {}, "history": {}})

    def set_sla(self, table: str, **thresholds) -> dict:
        if not table or not table.strip():
            raise ValueError("Table name cannot be empty")
        unknown = set(thresholds) - self.ALLOWED
        if unknown:
            raise ValueError(f"unknown thresholds: {sorted(unknown)}")
        stale = thresholds.get("max_staleness_hours")
        if stale is not None and (
            not isinstance(stale, (int, float)) or stale <= 0
        ):
            raise ValueError("max_staleness_hours must be a positive number")
        q = thresholds.get("min_quality_score")
        if q is not None and not (0 <= q <= 100):
            raise ValueError("min_quality_score must be between 0 and 100")
        table = _normalize_table(table)
        data = self.store.load()
        data["policies"][table] = {
            **thresholds,
            "created_at": datetime.now(timezone.utc).isoformat(),
        }
        self.store.save(data)
        return {
            "table": table,
            "sla": data["policies"][table],
            "message": f"SLA set for '{table}'",
        }

    def get_sla(self, table: str) -> dict:
        table = _normalize_table(table)
        sla = self.store.load()["policies"].get(table)
        return {"table": table, "sla": sla}

    def list_slas(self) -> list[dict]:
        return [
            {"table": t, **sla}
            for t, sla in self.store.load()["policies"].items()
        ]

    def remove_sla(self, table: str) -> dict:
        table = _normalize_table(table)
        data = self.store.load()
        if table in data["policies"]:
            del data["policies"][table]
            self.store.save(data)
            return {"table": table, "message": f"SLA removed for '{table}'"}
        return {"table": table, "message": f"No SLA found for '{table}'"}

    def check(self, table: LakeTable, stats: dict, quality: dict | None = None) -> dict:
        name = f"{table.namespace}.{table.table}"
        data = self.store.load()
        pol = data["policies"].get(name, {})
        violations: list[str] = []
        recommendations: list[str] = []
        if "min_row_count" in pol and stats["row_count"] < pol["min_row_count"]:
            violations.append(
                f"Row count {stats['row_count']} below minimum "
                f"{pol['min_row_count']}"
            )
            recommendations.append(
                "Investigate upstream loads — the table is missing rows"
            )
        if "max_null_pct" in pol:
            for col, cstats in stats.get("columns", {}).items():
                if cstats["null_pct"] > pol["max_null_pct"]:
                    violations.append(
                        f"Null percentage {cstats['null_pct']}% in column "
                        f"'{col}' exceeds maximum {pol['max_null_pct']}%"
                    )
                    recommendations.append(
                        f"Add a not-null validation rule for column '{col}'"
                    )
        if "max_staleness_hours" in pol:
            cur = table.current_snapshot()
            if cur:
                age_h = (time.time() * 1000 - cur.timestamp_ms) / 3.6e6
                if age_h > pol["max_staleness_hours"]:
                    violations.append(
                        f"Data is stale: {age_h:.1f}h since last write exceeds "
                        f"{pol['max_staleness_hours']}h"
                    )
                    recommendations.append(
                        "Schedule more frequent refreshes or check the "
                        "ingestion pipeline"
                    )
        if "min_quality_score" in pol and quality:
            if quality["score"] < pol["min_quality_score"]:
                violations.append(
                    f"Quality score {quality['score']} below minimum "
                    f"{pol['min_quality_score']}"
                )
                recommendations.append(
                    "Review quality sub-scores to find the failing dimension"
                )
        result = {
            "table": name,
            "ok": not violations,
            "status": "violation" if violations else "passing",
            "violations": violations,
            "recommendations": recommendations,
            "checked_at": datetime.now(timezone.utc).isoformat(),
        }
        hist = data["history"].setdefault(name, [])
        hist.append(result)
        data["history"][name] = hist[-50:]
        self.store.save(data)
        return result

    def check_all(self, tables: list, stats_by_name: dict,
                  quality_by_name: dict | None = None) -> dict:
        """Reference check_slas summary: {tables: [...], passing, total}."""
        results = []
        for t in tables:
            name = f"{t.namespace}.{t.table}"
            results.append(
                self.check(t, stats_by_name[name],
                           (quality_by_name or {}).get(name))
            )
        return {
            "tables": results,
            "passing": sum(1 for r in results if r["status"] == "passing"),
            "total": len(results),
        }

    def history(self, table: str) -> list[dict]:
        return self.store.load()["history"].get(_normalize_table(table), [])


class NotificationManager:
    """G9 (reference notifications.py:13-263): typed handlers keyed by
    a 12-hex handler_id; fire_event EXECUTES each matching handler
    best-effort (log append / shell subprocess / webhook POST) and
    appends a history entry with per-handler results."""

    VALID_EVENT_TYPES = {
        "write", "schema_change", "sla_violation", "maintenance",
        "contract_violation", "all",
    }
    VALID_HANDLER_TYPES = {"webhook", "shell", "log"}
    MAX_HISTORY = 1000

    def __init__(self, store_path: str):
        self.store = JsonStore(store_path, {"handlers": {}, "history": []})
        self._migrate_legacy()

    def _migrate_legacy(self) -> None:
        """Stores written before the typed-handler rework kept handlers
        as a LIST of {table, event, kind, target}; convert them once so
        every read path can assume the keyed-dict format."""
        data = self.store.load()
        if not isinstance(data.get("handlers"), list):
            return
        import uuid

        migrated = {}
        for h in data["handlers"]:
            hid = uuid.uuid4().hex[:12]
            handler_type = h.get("handler_type", h.get("kind", "log"))
            config = h.get("config")
            if not config and h.get("target"):
                # the legacy single 'target' field becomes the typed key
                key = {"log": "file", "webhook": "url", "shell": "command"}
                config = {key.get(handler_type, "target"): h["target"]}
            migrated[hid] = {
                "handler_id": hid,
                "table": self._normalize(h.get("table", "*")),
                "event_type": h.get("event_type", h.get("event", "all")),
                "handler_type": handler_type,
                "config": config or {},
                "created_at": h.get("created_at"),
            }
        data["handlers"] = migrated
        self.store.save(data)

    @staticmethod
    def _normalize(name: str) -> str:
        if name == "*":
            return name
        return name if "." in name else f"default.{name}"

    def add_handler(
        self, table: str, event_type: str, handler_type: str = "log",
        config: dict | None = None,
    ) -> dict:
        if not table or not table.strip():
            raise ValueError("Table name cannot be empty")
        table = self._normalize(table)
        if event_type not in self.VALID_EVENT_TYPES:
            raise ValueError(
                f"Invalid event type '{event_type}'. Must be one of: "
                f"{sorted(self.VALID_EVENT_TYPES)}"
            )
        if handler_type not in self.VALID_HANDLER_TYPES:
            raise ValueError(
                f"Invalid handler type '{handler_type}'. Must be one of: "
                f"{sorted(self.VALID_HANDLER_TYPES)}"
            )
        config = config or {}
        if handler_type == "webhook" and "url" not in config:
            raise ValueError("Webhook handler requires 'url' in config")
        if handler_type == "shell" and "command" not in config:
            raise ValueError("Shell handler requires 'command' in config")
        if handler_type == "log" and "file" not in config:
            raise ValueError("Log handler requires 'file' in config")
        import uuid

        data = self.store.load()
        handler_id = uuid.uuid4().hex[:12]
        data["handlers"][handler_id] = {
            "table": table,
            "event_type": event_type,
            "handler_type": handler_type,
            "config": config,
            "created_at": datetime.now(timezone.utc).isoformat(),
        }
        self.store.save(data)
        return {
            "handler_id": handler_id,
            "table": table,
            "event_type": event_type,
            "handler_type": handler_type,
            "message": f"Registered {handler_type} handler for '{table}' "
                       f"on {event_type} events",
        }

    def list_handlers(self, table: str | None = None) -> list[dict]:
        handlers = self.store.load()["handlers"]
        out = [{"handler_id": hid, **h} for hid, h in handlers.items()]
        if table is not None:
            t = self._normalize(table)
            out = [h for h in out if h["table"] == t]
        return out

    def remove_handler(self, handler_id: str) -> dict:
        data = self.store.load()
        if handler_id not in data["handlers"]:
            return {
                "handler_id": handler_id,
                "message": f"No handler found with ID '{handler_id}'",
            }
        del data["handlers"][handler_id]
        self.store.save(data)
        return {
            "handler_id": handler_id,
            "message": f"Removed handler '{handler_id}'",
        }

    def remove_matching(self, table: str, event_type: str) -> int:
        """Remove every handler registered for (table, event_type);
        returns removed count (server/CLI convenience)."""
        t = self._normalize(table)
        data = self.store.load()
        doomed = [
            hid
            for hid, h in data["handlers"].items()
            if h["table"] == t and h["event_type"] == event_type
        ]
        for hid in doomed:
            del data["handlers"][hid]
        self.store.save(data)
        return len(doomed)

    def _execute_handler(
        self, handler: dict, table: str, event_type: str, payload: dict
    ) -> dict:
        """Best-effort execution: errors are returned, never raised
        (reference notifications.py:168-232)."""
        import json as _json

        handler_type = handler["handler_type"]
        config = handler["config"]
        event_data = _json.dumps(
            {
                "table": table,
                "event_type": event_type,
                "timestamp": datetime.now(timezone.utc).isoformat(),
                "payload": payload,
            },
            default=str,
        )
        try:
            if handler_type == "webhook":
                import urllib.request

                req = urllib.request.Request(
                    config["url"],
                    data=event_data.encode("utf-8"),
                    headers={"Content-Type": "application/json"},
                    method=config.get("method", "POST"),
                )
                try:
                    with urllib.request.urlopen(req, timeout=5) as resp:
                        return {"status": "success", "http_status": resp.status}
                except Exception as e:  # noqa: BLE001
                    return {"status": "error", "error": str(e)}
            elif handler_type == "shell":
                import subprocess

                import os as _os

                result = subprocess.run(
                    config["command"], shell=True, capture_output=True,
                    text=True, timeout=10,
                    # inherit the environment (commands need PATH/HOME);
                    # the event payload rides alongside
                    env={**_os.environ, "LAKEHOUSE_EVENT": event_data},
                )
                return {
                    "status": "success" if result.returncode == 0 else "error",
                    "returncode": result.returncode,
                    "stdout": result.stdout[:500],
                    "stderr": result.stderr[:500],
                }
            elif handler_type == "log":
                import os

                log_file = config["file"]
                parent = os.path.dirname(log_file)
                if parent:
                    os.makedirs(parent, exist_ok=True)
                with open(log_file, "a", encoding="utf-8") as f:
                    f.write(event_data + "\n")
                return {"status": "success", "file": log_file}
        except Exception as e:  # noqa: BLE001
            return {"status": "error", "error": str(e)}
        return {"status": "error", "error": f"Unknown handler type: {handler_type}"}

    def fire_event(self, table: str, event_type: str, payload: dict | None = None) -> dict:
        table = self._normalize(table)
        payload = payload or {}
        data = self.store.load()
        results = []
        for hid, h in data["handlers"].items():
            table_match = h["table"] in (table, "default.*", "*")
            event_match = h["event_type"] in (event_type, "all")
            if table_match and event_match:
                result = self._execute_handler(h, table, event_type, payload)
                results.append({"handler_id": hid, **result})
        entry = {
            "table": table,
            "event_type": event_type,
            "fired_at": datetime.now(timezone.utc).isoformat(),
            "handlers_triggered": len(results),
            "results": results,
        }
        data["history"].append(entry)
        data["history"] = data["history"][-self.MAX_HISTORY:]
        self.store.save(data)
        return {
            **entry,
            "message": f"Fired '{event_type}' event for '{table}': "
                       f"{len(results)} handlers triggered",
        }

    def history(
        self, table: str | None = None, limit: int = 50,
        event_type: str | None = None,
    ) -> list[dict]:
        hist = self.store.load()["history"]
        if table:
            t = self._normalize(table)
            hist = [h for h in hist if h["table"] == t]
        if event_type:
            hist = [h for h in hist if h["event_type"] == event_type]
        return list(reversed(hist[-limit:]))

    def send_test_event(self, handler_id: str) -> dict:
        data = self.store.load()
        if handler_id not in data["handlers"]:
            return {
                "handler_id": handler_id,
                "message": f"No handler found with ID '{handler_id}'",
            }
        handler = data["handlers"][handler_id]
        result = self._execute_handler(
            handler, handler["table"], "test",
            {"test": True, "message": "This is a test event from the lakehouse"},
        )
        return {
            "handler_id": handler_id,
            "handler_type": handler["handler_type"],
            "result": result,
            "message": f"Test event sent to handler '{handler_id}': "
                       f"{result['status']}",
        }

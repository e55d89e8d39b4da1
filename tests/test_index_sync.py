"""Index lifecycle under source deletes (round 10, VERDICT r9 #3):
link_index_source + sync_index_deletes over the changelog view, the
stale-candidate regression the feature exists to kill, the update
(reinsert) discipline, idempotency, and the auto_sync_index
maintenance policy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.operators import crud, dedup_index as di
from iceberg_lakehouse_spark.operators import ann_index as ai
from iceberg_lakehouse_spark.operators.index_sync import (
    link_index_source,
    sync_index_deletes,
)

_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "pack my box with five dozen liquor jugs for the long trip"),
    (3, "sphinx of black quartz judge my vow before the night falls"),
    (4, "how vexingly quick daft zebras jump over the sleeping fence"),
    (5, "a completely different document about spark query planning"),
]


def _corpus(spark, cat, name="default.docs"):
    t = cat.create_table(name, [("doc_id", "long"), ("text", "string")])
    crud.insert_rows(t, [{"doc_id": i, "text": s} for i, s in _DOCS])
    return t


def test_sync_kills_stale_dedup_candidates(spark, tmp_warehouse):
    """The motivating loop: delete a doc from the corpus, probe a
    near-dup of it. Unsynced, the probe RAISES (its desync guard sees
    an indexed candidate with no corpus text). Synced, the probe runs
    clean and the deleted doc never surfaces as a candidate — while a
    live doc's near-dup still does."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = _corpus(spark, cat)
    idx = di.build_dedup_index(
        cat, "default.docs_lsh", t.scan(), "doc_id", "text")
    link_index_source(cat, "default.docs_lsh", "default.docs", "doc_id")
    n_idx = idx.scan().count()

    batch = spark.createDataFrame(
        [(101, _DOCS[0][1] + " extra"),      # near-dup of doc 1 (deleted)
         (102, _DOCS[2][1] + " tonight")],   # near-dup of doc 3 (live)
        "doc_id long, text string")
    crud.delete_rows(t, "doc_id = 1")
    with pytest.raises(ValueError, match="out of sync"):
        di.probe_dedup_index(
            idx, batch, t.scan(), "doc_id", "text", threshold=0.5
        ).collect()

    rep = sync_index_deletes(cat, "default.docs_lsh")
    assert rep["deleted_ids"] == 1
    assert rep["reinserted_ids"] == 0
    assert rep["removed_index_rows"] > 0
    assert idx.scan().count() == n_idx - rep["removed_index_rows"]
    assert idx.scan().where(F.col("id") == 1).count() == 0

    pairs = di.probe_dedup_index(
        idx, batch, t.scan(), "doc_id", "text", threshold=0.5).collect()
    lefts = {r["left_id"] for r in pairs}
    assert 1 not in lefts
    assert 3 in lefts


def test_sync_reports_updates_for_reextend(spark, tmp_warehouse):
    """An UPDATE is delete+insert in the changelog: sync removes the
    stale index rows and reports the id under reinserted_ids; after
    the documented re-extend the index matches the NEW text, not the
    old."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = _corpus(spark, cat)
    idx = di.build_dedup_index(
        cat, "default.docs_lsh", t.scan(), "doc_id", "text")
    link_index_source(cat, "default.docs_lsh", "default.docs", "doc_id")
    new_text = "rewritten content that shares nothing with the original"
    crud.update_rows(t, "doc_id = 2", {"text": new_text})
    rep = sync_index_deletes(cat, "default.docs_lsh")
    assert rep["deleted_ids"] == 1 and rep["reinserted_ids"] == 1
    assert idx.scan().where(F.col("id") == 2).count() == 0
    di.extend_dedup_index(
        idx, t.scan().where("doc_id = 2"), "doc_id", "text")
    probe_new = di.probe_dedup_index(
        idx,
        spark.createDataFrame([(201, new_text + " too")],
                              "doc_id long, text string"),
        t.scan(), "doc_id", "text", threshold=0.5).collect()
    assert {r["left_id"] for r in probe_new} == {2}
    probe_old = di.probe_dedup_index(
        idx,
        spark.createDataFrame([(202, _DOCS[1][1] + " too")],
                              "doc_id long, text string"),
        t.scan(), "doc_id", "text", threshold=0.5).collect()
    assert all(r["left_id"] != 2 for r in probe_old)


def test_sync_idempotent_and_error_paths(spark, tmp_warehouse):
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = _corpus(spark, cat)
    idx = di.build_dedup_index(
        cat, "default.docs_lsh", t.scan(), "doc_id", "text")
    with pytest.raises(ValueError, match="not linked"):
        sync_index_deletes(cat, "default.docs_lsh")
    link_index_source(cat, "default.docs_lsh", "default.docs", "doc_id")
    rep = sync_index_deletes(cat, "default.docs_lsh")
    assert rep.get("up_to_date") and rep["removed_index_rows"] == 0
    crud.delete_rows(t, "doc_id = 4")
    rep1 = sync_index_deletes(cat, "default.docs_lsh")
    assert rep1["deleted_ids"] == 1
    rep2 = sync_index_deletes(cat, "default.docs_lsh")
    assert rep2.get("up_to_date")
    # an append-only commit advances the cursor without any delete
    crud.insert_rows(t, [{"doc_id": 9, "text": "brand new appended doc"}])
    rep3 = sync_index_deletes(cat, "default.docs_lsh")
    assert rep3["deleted_ids"] == 0 and "up_to_date" not in rep3
    assert sync_index_deletes(cat, "default.docs_lsh").get("up_to_date")
    # link validation
    with pytest.raises(ValueError, match="integral"):
        link_index_source(cat, "default.docs_lsh", "default.docs", "text")
    with pytest.raises(ValueError, match="not found"):
        link_index_source(cat, "default.docs_lsh", "default.docs", "nope")


def test_sync_ann_index_removes_deleted_vectors(spark, tmp_warehouse):
    """Same machinery over the IVF vectors table: delete source
    vectors, sync, and the probe never returns them."""
    import math

    cat = LakehouseCatalog(spark, tmp_warehouse)
    vecs = [(i, [math.sin(i * 1.7 + d) for d in range(8)])
            for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    t = cat.create_table("default.vecs", df.schema)
    t.append(df)
    ai.build_ann_index(cat, "default.vivf", t.scan(), "vec_id",
                       "embedding", n_cells=4, kmeans_iters=1)
    link_index_source(cat, "default.vivf", "default.vecs", "vec_id")
    q = vecs[7][1]
    before = [r["id"] for r in
              ai.probe_ann_index(cat, "default.vivf", q, k=5, nprobe=4)
              .collect()]
    assert 7 in before
    crud.delete_rows(t, "vec_id IN (7, 11)")
    rep = sync_index_deletes(cat, "default.vivf")
    assert rep["deleted_ids"] == 2
    after = [r["id"] for r in
             ai.probe_ann_index(cat, "default.vivf", q, k=40, nprobe=4)
             .collect()]
    assert 7 not in after and 11 not in after


def test_auto_sync_index_policy(spark, tmp_warehouse, tmp_path):
    """Governance loop: auto_sync_index schedules and runs the sync
    exactly when the source has committed past the index cursor."""
    from iceberg_lakehouse_spark.governance.policies import (
        MaintenanceManager,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = _corpus(spark, cat)
    idx = di.build_dedup_index(
        cat, "default.docs_lsh", t.scan(), "doc_id", "text")
    link_index_source(cat, "default.docs_lsh", "default.docs", "doc_id")
    mm = MaintenanceManager(str(tmp_path / "maint.json"))
    mm.set_policy("default.docs_lsh", auto_sync_index=True)
    assert not mm.check_needed(idx)["needs_index_sync"]
    crud.delete_rows(t, "doc_id = 5")
    need = mm.check_needed(idx)
    assert need["needs_index_sync"]
    assert any("sync_index_deletes" in a for a in need["actions_needed"])
    rec = mm.run(idx)
    done = [a for a in rec["actions"]
            if a["action"] == "sync_index_deletes"]
    assert done and done[0]["status"] == "completed"
    assert done[0]["deleted_ids"] == 1
    assert idx.scan().where(F.col("id") == 5).count() == 0
    assert not mm.check_needed(idx)["needs_index_sync"]


def test_sync_ivfpq_codes_table(spark, tmp_warehouse):
    """The composed index syncs through the same path (its codes table
    is keyed id) — and the cell-pruned probe still honors the
    equality delete."""
    import math

    from iceberg_lakehouse_spark.operators import ivfpq

    cat = LakehouseCatalog(spark, tmp_warehouse)
    vecs = [(i, [math.cos(i * 0.9 + d) for d in range(16)])
            for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    t = cat.create_table("default.vecs", df.schema)
    t.append(df)
    ivfpq.build_ivfpq_index(cat, "default.vpq", t.scan(), "vec_id",
                            "embedding", n_cells=4, m=8, ksub=8,
                            kmeans_iters=1)
    link_index_source(cat, "default.vpq", "default.vecs", "vec_id")
    q = vecs[13][1]
    before = [r["id"] for r in
              ivfpq.probe_ivfpq_index(cat, "default.vpq", q, k=5,
                                      nprobe=4).collect()]
    assert 13 in before
    crud.delete_rows(t, "vec_id = 13")
    rep = sync_index_deletes(cat, "default.vpq")
    assert rep["deleted_ids"] == 1 and rep["removed_index_rows"] == 1
    after = [r["id"] for r in
             ivfpq.probe_ivfpq_index(cat, "default.vpq", q, k=60,
                                     nprobe=4).collect()]
    assert 13 not in after


def test_sync_expired_cursor_raises_actionable_error(spark, tmp_warehouse):
    """r10 review: expiring the source snapshot the cursor points at
    makes the delete history unrecoverable — the sync must say so (and
    say what to do), not die inside the changelog walk."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = _corpus(spark, cat)
    idx = di.build_dedup_index(
        cat, "default.docs_lsh", t.scan(), "doc_id", "text")
    link_index_source(cat, "default.docs_lsh", "default.docs", "doc_id")
    crud.delete_rows(t, "doc_id = 1")
    crud.insert_rows(t, [{"doc_id": 7, "text": "more rows to expire past"}])
    t.expire_snapshots(retain_last=1)
    with pytest.raises(ValueError, match="expired"):
        sync_index_deletes(cat, "default.docs_lsh")


def test_maintenance_records_failed_sync_and_continues(
    spark, tmp_warehouse, tmp_path
):
    """r10 review: an unrecoverable sync must land as a FAILED action
    in the maintenance report, not abort the run."""
    from iceberg_lakehouse_spark.governance.policies import (
        MaintenanceManager,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = _corpus(spark, cat)
    idx = di.build_dedup_index(
        cat, "default.docs_lsh", t.scan(), "doc_id", "text")
    link_index_source(cat, "default.docs_lsh", "default.docs", "doc_id")
    crud.delete_rows(t, "doc_id = 1")
    crud.insert_rows(t, [{"doc_id": 7, "text": "pad commit for expiry"}])
    t.expire_snapshots(retain_last=1)
    mm = MaintenanceManager(str(tmp_path / "maint.json"))
    mm.set_policy("default.docs_lsh", auto_sync_index=True)
    rec = mm.run(idx)  # must not raise
    failed = [a for a in rec["actions"]
              if a["action"] == "sync_index_deletes"]
    assert failed and failed[0]["status"] == "failed"
    assert "expired" in failed[0]["error"]


def test_sync_span_and_phash_indexes(spark, tmp_warehouse):
    """The sync machinery really is index-family-generic: the r10
    span-gram and perceptual-hash indexes (both keyed id) drop their
    rows when source docs/images are deleted."""
    from iceberg_lakehouse_spark.operators.dedup_index import (
        build_span_index,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = _corpus(spark, cat)
    sidx = build_span_index(cat, "default.docs_grams", t.scan(),
                            "doc_id", "text", n=8)
    link_index_source(cat, "default.docs_grams", "default.docs", "doc_id")
    n0 = sidx.scan().count()
    n_doc1 = sidx.scan().where(F.col("id") == 1).count()
    assert n_doc1 > 0
    crud.delete_rows(t, "doc_id = 1")
    rep = sync_index_deletes(cat, "default.docs_grams")
    assert rep["deleted_ids"] == 1
    assert rep["removed_index_rows"] == n_doc1
    assert sidx.scan().count() == n0 - n_doc1

    # phash index over a media table
    from iceberg_lakehouse_spark.functions import multimodal as mm
    from iceberg_lakehouse_spark.operators import media_index as mi
    from tests.test_perceptual_dedup import _img

    media = spark.createDataFrame(
        [(i, _img(f"s{i}"), "image", "ppm", 0) for i in range(4)],
        mm.MEDIA_SCHEMA)
    mt = cat.create_table("default.media", media.schema)
    mt.append(media)
    pidx = mi.build_phash_index(cat, "default.media_ph",
                                mt.scan(), max_distance=4)
    link_index_source(cat, "default.media_ph", "default.media",
                      "media_id")
    crud.delete_rows(mt, "media_id IN (0, 2)")
    rep2 = sync_index_deletes(cat, "default.media_ph")
    assert rep2["deleted_ids"] == 2
    assert rep2["removed_index_rows"] == 2 * 5   # (d+1) rows per image
    assert pidx.scan().where(F.col("id").isin([0, 2])).count() == 0
    # probing a near-dup of a DELETED image returns nothing stale
    probe = mi.probe_phash_index(
        pidx,
        spark.createDataFrame(
            [(100, _img("s0", bump_cell=7), "image", "ppm", 0)],
            mm.MEDIA_SCHEMA))
    assert probe.collect() == []


def test_auto_rebuild_index_policy(spark, tmp_warehouse, tmp_path):
    """r10: recall-threshold-triggered rebuilds through the governance
    loop — plain IVF rebuilds self-contained; IVFPQ requires the
    vec_col link (failed action with the remedy otherwise, then
    completes once linked). This pins the WIRING; the recall-recovery
    semantics of the rebuilds themselves are pinned in
    test_llm_ops.test_ann_recall_telemetry_and_rebuild and
    test_ivfpq_index.test_recall_telemetry_and_rebuild_recovery."""
    import math

    from iceberg_lakehouse_spark.governance.policies import (
        MaintenanceManager,
    )
    from iceberg_lakehouse_spark.operators import ivfpq

    cat = LakehouseCatalog(spark, tmp_warehouse)
    vecs = [(i, [math.sin(i * 1.3 + d) for d in range(8)])
            for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    t = cat.create_table("default.vecs", df.schema)
    t.append(df)
    ai.build_ann_index(cat, "default.rbp", t.scan(), "vec_id",
                       "embedding", n_cells=4, kmeans_iters=2)
    # wide drifted blob straddling cells → routing recall drops
    base = [0.9 - 0.2 * d for d in range(8)]
    blob = spark.range(700000, 700300).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            F.lit(base[d])
            + (((F.col("id") * (d + 2)) % 401).cast("double")
               / 401.0 - 0.5) * F.lit(1.1)
            for d in range(8)
        ]).alias("embedding"),
    )
    ai.extend_ann_index(cat, "default.rbp", blob, "vec_id", "embedding")
    mm_ = MaintenanceManager(str(tmp_path / "maint.json"))
    idx = cat.load_table("default.rbp")
    n_rows = idx.scan().count()
    # a threshold no finite sampled recall can satisfy always fires —
    # the wiring under test, independent of this fixture's geometry
    mm_.set_policy("default.rbp", auto_rebuild_index=1.01)
    need = mm_.check_needed(idx)
    assert need["needs_index_rebuild"]
    assert any("rebuild_ann_index" in a for a in need["actions_needed"])
    rec = mm_.run(idx)
    done = [a for a in rec["actions"] if a["action"] == "rebuild_ann_index"]
    assert done and done[0]["status"] == "completed"
    assert done[0]["rows"] == n_rows        # nothing lost in the rewrite
    # below-threshold recall does NOT fire
    mm_.set_policy("default.rbp", auto_rebuild_index=0.01)
    assert not mm_.check_needed(idx)["needs_index_rebuild"]

    # IVFPQ: triggers, but fails with the remedy until vec_col linked
    ivfpq.build_ivfpq_index(cat, "default.rbq", t.scan(), "vec_id",
                            "embedding", n_cells=4, m=8, ksub=8,
                            kmeans_iters=1)
    qidx = cat.load_table("default.rbq")
    mm_.set_policy("default.rbq", auto_rebuild_index=1.01)  # always fire
    assert mm_.check_needed(qidx)["needs_index_rebuild"]
    rec2 = mm_.run(qidx)
    failed = [a for a in rec2["actions"]
              if a["action"] == "rebuild_ivfpq_index"]
    assert failed and failed[0]["status"] == "failed"
    assert "link_index_source" in failed[0]["error"]
    link_index_source(cat, "default.rbq", "default.vecs", "vec_id",
                      vec_col="embedding")
    rec3 = mm_.run(qidx)
    ok = [a for a in rec3["actions"]
          if a["action"] == "rebuild_ivfpq_index"]
    assert ok and ok[0]["status"] == "completed"
    assert ok[0]["rows"] == 60


def test_index_status_inventory(spark, tmp_warehouse):
    """r10: one pane over every index family — kind detection, row
    counts, and sync-cursor lag states (in_sync / behind / unlinked /
    cursor_expired)."""
    from iceberg_lakehouse_spark.operators.dedup_index import (
        build_span_index,
    )
    from iceberg_lakehouse_spark.operators.index_sync import index_status

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = _corpus(spark, cat)
    di.build_dedup_index(cat, "default.mh", t.scan(), "doc_id", "text")
    build_span_index(cat, "default.sp", t.scan(), "doc_id", "text", n=8)
    link_index_source(cat, "default.mh", "default.docs", "doc_id")
    st = {e["index"]: e for e in index_status(cat)}
    assert set(st) == {"default.mh", "default.sp"}
    assert st["default.mh"]["kind"] == "minhash"
    assert st["default.mh"]["sync_state"] == "in_sync"
    assert st["default.mh"]["sync_lag"] == 0
    assert st["default.sp"]["kind"] == "span"
    assert st["default.sp"]["sync_state"] == "unlinked"
    assert st["default.mh"]["rows"] > 0
    # two source commits later: lag counts them
    crud.delete_rows(t, "doc_id = 1")
    crud.insert_rows(t, [{"doc_id": 9, "text": "nine"}])
    st2 = {e["index"]: e for e in index_status(cat)}
    assert st2["default.mh"]["sync_state"] == "behind"
    assert st2["default.mh"]["sync_lag"] == 2
    sync_index_deletes(cat, "default.mh")
    st3 = {e["index"]: e for e in index_status(cat)}
    assert st3["default.mh"]["sync_state"] == "in_sync"
    # expired cursor surfaces as its own state
    crud.insert_rows(t, [{"doc_id": 10, "text": "ten"}])
    crud.insert_rows(t, [{"doc_id": 11, "text": "eleven"}])
    t.expire_snapshots(retain_last=1)
    st4 = {e["index"]: e for e in index_status(cat)}
    assert st4["default.mh"]["sync_state"] == "cursor_expired"


# ---------------------------------------------------------------------------
# Auto re-extension of live updates (round 11 — r10 VERDICT #3 / ADVICE)
# ---------------------------------------------------------------------------


def test_reextend_minhash_after_update(spark, tmp_warehouse):
    """Update a doc, sync (index rows gone, stale_reinserts debt
    stamped and visible in index_status), reextend_index: the index
    carries the NEW text, the probe finds it, the debt clears, and a
    replayed re-extend is a no-op."""
    from iceberg_lakehouse_spark.operators.index_sync import (
        index_status,
        reextend_index,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = _corpus(spark, cat)
    idx = di.build_dedup_index(
        cat, "default.docs_lsh", t.scan(), "doc_id", "text")
    link_index_source(cat, "default.docs_lsh", "default.docs",
                      "doc_id", text_col="text")
    new_text = "rewritten content that shares nothing with the original"
    crud.update_rows(t, "doc_id = 2", {"text": new_text})
    rep = sync_index_deletes(cat, "default.docs_lsh")
    assert rep["reinserted_ids"] == 1
    st = {e["index"]: e for e in index_status(cat)}["default.docs_lsh"]
    assert st["sync_state"] == "stale_reinserts"
    assert st["pending_reinserts"] == 1
    assert idx.scan().where(F.col("id") == 2).count() == 0

    rex = reextend_index(cat, "default.docs_lsh")
    assert rex["reextended_ids"] == 1
    assert rex["index_rows_added"] > 0
    assert idx.scan().where(F.col("id") == 2).count() > 0
    probe = di.probe_dedup_index(
        idx,
        spark.createDataFrame([(201, new_text + " too")],
                              "doc_id long, text string"),
        t.scan(), "doc_id", "text", threshold=0.5).collect()
    assert {r["left_id"] for r in probe} == {2}
    st2 = {e["index"]: e for e in index_status(cat)}["default.docs_lsh"]
    assert st2["sync_state"] == "in_sync"
    assert st2["pending_reinserts"] == 0
    again = reextend_index(cat, "default.docs_lsh")
    assert again.get("up_to_date") and again["reextended_ids"] == 0


def test_reextend_accumulates_unpaid_ranges(spark, tmp_warehouse):
    """Two syncs with unpaid reinsert debt widen the pending range;
    ONE re-extend repays both updates, and the second update of the
    same doc lands its FINAL content (no duplicate index rows)."""
    from iceberg_lakehouse_spark.operators.index_sync import (
        reextend_index,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = _corpus(spark, cat)
    idx = di.build_dedup_index(
        cat, "default.docs_lsh", t.scan(), "doc_id", "text")
    link_index_source(cat, "default.docs_lsh", "default.docs",
                      "doc_id", text_col="text")
    final_text = ("second rewrite wins with plenty of additional "
                  "shared words in this much longer document body")
    crud.update_rows(t, "doc_id = 2", {"text": "first rewrite of two"})
    sync_index_deletes(cat, "default.docs_lsh")
    crud.update_rows(t, "doc_id = 2", {"text": final_text})
    crud.update_rows(t, "doc_id = 3", {"text": "three also rewritten"})
    rep2 = sync_index_deletes(cat, "default.docs_lsh")
    assert rep2["reinserted_ids"] == 2
    props = idx.properties()
    assert int(props["index.pending_reinserts"]) == 3  # 1 + 2 unpaid
    rex = reextend_index(cat, "default.docs_lsh")
    assert rex["reextended_ids"] == 2  # distinct ids across the range
    # exactly one band-key set per doc: no duplicate index rows
    per_doc = dict(
        idx.scan().where(F.col("id").isin([2, 3]))
        .groupBy("id").count().collect())
    k_bands = int(idx.properties()["dedup.bands"])
    assert per_doc == {2: k_bands, 3: k_bands}
    probe = di.probe_dedup_index(
        idx,
        spark.createDataFrame([(301, final_text + " indeed")],
                              "doc_id long, text string"),
        t.scan(), "doc_id", "text", threshold=0.4).collect()
    assert {r["left_id"] for r in probe} == {2}


def test_reextend_requires_content_column_link(spark, tmp_warehouse):
    """A link without text_col cannot re-derive a text index — the
    re-extend fails LOUDLY with the remedy, and the maintenance run
    records it as a failed action instead of silently dropping
    coverage."""
    from iceberg_lakehouse_spark.governance.policies import (
        MaintenanceManager,
    )
    from iceberg_lakehouse_spark.operators.index_sync import (
        reextend_index,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = _corpus(spark, cat)
    idx = di.build_dedup_index(
        cat, "default.docs_lsh", t.scan(), "doc_id", "text")
    link_index_source(cat, "default.docs_lsh", "default.docs", "doc_id")
    crud.update_rows(t, "doc_id = 2", {"text": "changed it"})
    sync_index_deletes(cat, "default.docs_lsh")
    with pytest.raises(ValueError, match="text_col"):
        reextend_index(cat, "default.docs_lsh")
    # the policy path: failed action recorded, run continues
    crud.update_rows(t, "doc_id = 3", {"text": "changed too"})
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        mm = MaintenanceManager(f"{d}/maint.json")
        mm.set_policy("default.docs_lsh", auto_sync_index=True)
        rec = mm.run(idx)
    acts = {a["action"]: a for a in rec["actions"]}
    assert acts["sync_index_deletes"]["status"] == "completed"
    assert acts["reextend_index"]["status"] == "failed"
    assert "text_col" in acts["reextend_index"]["error"]


def test_auto_sync_policy_reextends_updates(spark, tmp_warehouse,
                                            tmp_path):
    """The VERDICT done-criterion: update source rows -> policy run ->
    probe finds the NEW content, not nothing."""
    from iceberg_lakehouse_spark.governance.policies import (
        MaintenanceManager,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = _corpus(spark, cat)
    idx = di.build_dedup_index(
        cat, "default.docs_lsh", t.scan(), "doc_id", "text")
    link_index_source(cat, "default.docs_lsh", "default.docs",
                      "doc_id", text_col="text")
    mm = MaintenanceManager(str(tmp_path / "maint.json"))
    mm.set_policy("default.docs_lsh", auto_sync_index=True)
    new_text = "entirely novel replacement body for document four"
    crud.update_rows(t, "doc_id = 4", {"text": new_text})
    rec = mm.run(idx)
    acts = {a["action"]: a for a in rec["actions"]}
    assert acts["sync_index_deletes"]["reinserted_ids"] == 1
    assert acts["reextend_index"]["status"] == "completed"
    assert acts["reextend_index"]["reextended_ids"] == 1
    probe = di.probe_dedup_index(
        idx,
        spark.createDataFrame([(401, new_text + " also")],
                              "doc_id long, text string"),
        t.scan(), "doc_id", "text", threshold=0.5).collect()
    assert {r["left_id"] for r in probe} == {4}


def test_reextend_ann_vectors_after_update(spark, tmp_warehouse):
    """Vector family: an updated embedding re-lands in the IVF index
    at its NEW location (probe near the new vector returns the id)."""
    import math

    from iceberg_lakehouse_spark.operators.index_sync import (
        reextend_index,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    vecs = [(i, [math.sin(i * 1.7 + d) for d in range(8)])
            for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    t = cat.create_table("default.vecs", df.schema)
    t.append(df)
    ai.build_ann_index(cat, "default.vivf", t.scan(), "vec_id",
                       "embedding", n_cells=4, kmeans_iters=1)
    link_index_source(cat, "default.vivf", "default.vecs", "vec_id",
                      vec_col="embedding")
    # ~vec 20's neighborhood: phase offset ~pi from vec 7, i.e. the
    # far side of the sin lattice (33 would wrap back next to 7)
    new_vec = [math.sin(20 * 1.7 + d) for d in range(8)]
    crud.update_rows(t, "vec_id = 7", {"embedding": new_vec})
    sync_index_deletes(cat, "default.vivf")
    assert reextend_index(cat, "default.vivf")["reextended_ids"] == 1
    near_new = [r["id"] for r in
                ai.probe_ann_index(cat, "default.vivf", new_vec,
                                   k=3, nprobe=4).collect()]
    assert 7 in near_new
    near_old = [r["id"] for r in
                ai.probe_ann_index(cat, "default.vivf", vecs[7][1],
                                   k=3, nprobe=4).collect()]
    assert 7 not in near_old


def test_reextend_span_and_phash_after_update(spark, tmp_warehouse):
    """Family-generic: span grams of the NEW text land keyed by the
    updated doc (existing keepers untouched), and an updated image's
    fresh fingerprint probes positive while the old one is gone."""
    from iceberg_lakehouse_spark.functions import multimodal as mm
    from iceberg_lakehouse_spark.operators import media_index as mi
    from iceberg_lakehouse_spark.operators.dedup_index import (
        build_span_index,
    )
    from iceberg_lakehouse_spark.operators.index_sync import (
        reextend_index,
    )
    from tests.test_perceptual_dedup import _img

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = _corpus(spark, cat)
    sidx = build_span_index(cat, "default.docs_grams", t.scan(),
                            "doc_id", "text", n=8)
    link_index_source(cat, "default.docs_grams", "default.docs",
                      "doc_id", text_col="text")
    new_text = ("a wholly new paragraph with enough words to produce "
                "several eight gram windows for the span index here")
    crud.update_rows(t, "doc_id = 1", {"text": new_text})
    sync_index_deletes(cat, "default.docs_grams")
    assert sidx.scan().where(F.col("id") == 1).count() == 0
    rex = reextend_index(cat, "default.docs_grams")
    assert rex["reextended_ids"] == 1 and rex["index_rows_added"] > 0
    assert sidx.scan().where(F.col("id") == 1).count() > 0

    media = spark.createDataFrame(
        [(i, _img(f"s{i}"), "image", "ppm", 0) for i in range(4)],
        mm.MEDIA_SCHEMA)
    mt = cat.create_table("default.media", media.schema)
    mt.append(media)
    pidx = mi.build_phash_index(cat, "default.media_ph",
                                mt.scan(), max_distance=4)
    link_index_source(cat, "default.media_ph", "default.media",
                      "media_id")
    crud.update_rows(mt, "media_id = 1",
                     {"content": _img("fresh-image")})
    sync_index_deletes(cat, "default.media_ph")
    assert reextend_index(cat, "default.media_ph")[
        "reextended_ids"] == 1
    probe = mi.probe_phash_index(
        pidx,
        spark.createDataFrame(
            [(500, _img("fresh-image", bump_cell=3), "image", "ppm", 0)],
            mm.MEDIA_SCHEMA))
    assert {r["left_id"] for r in probe.collect()} == {1}


def test_auto_rebuild_recall_mode_selection(spark, tmp_warehouse,
                                            tmp_path):
    """r11: the rebuild policy measures TRUE corpus-mode recall when
    the IVFPQ index is linked to its source vectors (codebook-drift
    loss is invisible in reconstruction mode), and says which mode it
    used in the action string; unlinked falls back to reconstruction
    mode, also labeled."""
    import math

    from iceberg_lakehouse_spark.governance.policies import (
        MaintenanceManager,
    )
    from iceberg_lakehouse_spark.operators import ivfpq

    cat = LakehouseCatalog(spark, tmp_warehouse)
    vecs = [(i, [math.sin(i * 1.7 + d) for d in range(8)])
            for i in range(64)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    t = cat.create_table("default.vecs", df.schema)
    t.append(df)
    ivfpq.build_ivfpq_index(cat, "default.pq", t.scan(), "vec_id",
                            "embedding", n_cells=4, m=8, ksub=16,
                            kmeans_iters=1)
    mm = MaintenanceManager(str(tmp_path / "maint.json"))
    # recall can never reach 1.01 -> the check always fires
    mm.set_policy("default.pq", auto_rebuild_index=1.01)
    reg = cat.load_table("default.pq")
    need = mm.check_needed(reg)
    assert need["needs_index_rebuild"]
    act = [a for a in need["actions_needed"]
           if "rebuild_ivfpq_index" in a][0]
    assert "reconstruction-mode recall" in act
    link_index_source(cat, "default.pq", "default.vecs", "vec_id",
                      vec_col="embedding")
    act2 = [a for a in mm.check_needed(reg)["actions_needed"]
            if "rebuild_ivfpq_index" in a][0]
    assert "corpus-mode recall" in act2


def test_reextend_preserves_racing_sync_debt(
        spark, tmp_warehouse, monkeypatch):
    """A sync that stamps NEW reinsert debt while reextend_index is
    repaying an older range must not be erased by the marker clear
    (r11 ADVICE: the clear wrote "0" unconditionally). The clear now
    decrements by the amount read at start and keeps the unrepaid
    tail of the range, so a follow-up re-extend repays the raced
    update too."""
    from iceberg_lakehouse_spark.operators import index_sync

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = _corpus(spark, cat)
    idx = di.build_dedup_index(
        cat, "default.docs_lsh", t.scan(), "doc_id", "text")
    link_index_source(cat, "default.docs_lsh", "default.docs",
                      "doc_id", text_col="text")
    crud.update_rows(t, "doc_id = 2", {"text": "first rewritten doc"})
    sync_index_deletes(cat, "default.docs_lsh")
    hi_before = int(idx.properties()["index.pending_reinserts_to"])

    real_extend = index_sync._extend_for_kind
    raced = {}

    def extend_then_race(*args, **kwargs):
        n = real_extend(*args, **kwargs)
        # simulate a concurrent maintenance writer: a second update +
        # sync lands BETWEEN reextend's extend and its marker clear
        if not raced:
            raced["done"] = True
            crud.update_rows(t, "doc_id = 3",
                             {"text": "three raced the reextend"})
            sync_index_deletes(cat, "default.docs_lsh")
        return n

    monkeypatch.setattr(index_sync, "_extend_for_kind",
                        extend_then_race)
    rex = index_sync.reextend_index(cat, "default.docs_lsh")
    assert rex["reextended_ids"] == 1
    assert rex["pending_remaining"] == 1  # the raced sync's debt
    props = idx.properties()
    assert int(props["index.pending_reinserts"]) == 1
    assert int(props["index.pending_reinserts_from"]) == hi_before
    st = {e["index"]: e for e in index_sync.index_status(cat)}[
        "default.docs_lsh"]
    assert st["sync_state"] == "stale_reinserts"

    monkeypatch.setattr(index_sync, "_extend_for_kind", real_extend)
    rex2 = index_sync.reextend_index(cat, "default.docs_lsh")
    assert rex2["reextended_ids"] == 1  # doc 3 repaid
    assert int(idx.properties()["index.pending_reinserts"]) == 0
    assert idx.scan().where(F.col("id") == 3).count() > 0


def test_auto_tune_nprobe_policy(spark, tmp_warehouse, tmp_path):
    """r14: measured-recall probe-width tuning through the governance
    loop — an untuned index fires, the run pins ivf.nprobe + the tuned
    state, property-only writes stay quiet, a target change and new
    data both re-arm, and probe_ann_index(nprobe=None) probes at the
    pinned width."""
    import math

    from iceberg_lakehouse_spark.governance.policies import (
        MaintenanceManager,
    )
    from iceberg_lakehouse_spark.operators import ivfpq

    cat = LakehouseCatalog(spark, tmp_warehouse)
    vecs = [(i, [math.sin(i * 1.3 + d) for d in range(8)])
            for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    t = cat.create_table("default.tvecs", df.schema)
    t.append(df)
    ai.build_ann_index(cat, "default.tnp", t.scan(), "vec_id",
                       "embedding", n_cells=4, kmeans_iters=2)
    mm_ = MaintenanceManager(str(tmp_path / "maint_tnp.json"))
    idx = cat.load_table("default.tnp")
    mm_.set_policy("default.tnp", auto_tune_nprobe=1.0)
    need = mm_.check_needed(idx)
    assert need["needs_nprobe_tune"]
    assert any("tune_nprobe" in a for a in need["actions_needed"])
    rec = mm_.run(idx)
    done = [a for a in rec["actions"] if a["action"] == "tune_nprobe"]
    assert done and done[0]["status"] == "completed", rec["actions"]
    props = idx.properties()
    pinned = int(props["ivf.nprobe"])
    assert 1 <= pinned <= 4 and pinned == done[0]["nprobe"]
    assert props["index.nprobe_met"] == "true"  # full width is exact
    # property-only writes don't re-arm: the tuned state is the data
    # snapshot, and pinning the properties changed no snapshot
    assert not mm_.check_needed(idx)["needs_nprobe_tune"]
    # the default probe width IS the pinned width
    q = vecs[5][1]
    got = {r["id"] for r in ai.probe_ann_index(
        cat, "default.tnp", q, k=5).collect()}
    want = {r["id"] for r in ai.probe_ann_index(
        cat, "default.tnp", q, k=5, nprobe=pinned).collect()}
    assert got == want and got
    # a changed target re-arms
    mm_.set_policy("default.tnp", auto_tune_nprobe=0.5)
    assert mm_.check_needed(idx)["needs_nprobe_tune"]
    rec2 = mm_.run(idx)
    assert [a for a in rec2["actions"]
            if a["action"] == "tune_nprobe"][0]["status"] == "completed"
    assert not mm_.check_needed(idx)["needs_nprobe_tune"]
    # new data re-arms
    ai.extend_ann_index(
        cat, "default.tnp",
        spark.createDataFrame([(900, vecs[0][1])], df.schema),
        "vec_id", "embedding")
    assert mm_.check_needed(cat.load_table("default.tnp"))[
        "needs_nprobe_tune"]

    # IVFPQ: corpus-linked tune pins ivfpq.nprobe, default probe uses it
    ivfpq.build_ivfpq_index(cat, "default.tnq", t.scan(), "vec_id",
                            "embedding", n_cells=4, m=4, ksub=8,
                            kmeans_iters=1)
    link_index_source(cat, "default.tnq", "default.tvecs", "vec_id",
                      vec_col="embedding")
    mm_.set_policy("default.tnq", auto_tune_nprobe=0.4)
    qidx = cat.load_table("default.tnq")
    assert mm_.check_needed(qidx)["needs_nprobe_tune"]
    rec3 = mm_.run(qidx)
    done3 = [a for a in rec3["actions"] if a["action"] == "tune_nprobe"]
    assert done3 and done3[0]["status"] == "completed", rec3["actions"]
    qprops = qidx.properties()
    assert 1 <= int(qprops["ivfpq.nprobe"]) <= 4
    assert not mm_.check_needed(qidx)["needs_nprobe_tune"]
    top = ivfpq.probe_ivfpq_index(cat, "default.tnq", q, k=3).collect()
    assert len(top) == 3


def test_recall_samplers_measure_at_pinned_width(
        spark, tmp_warehouse, tmp_path):
    """r14 review: the auto_rebuild_index recall floor must be
    measured at the SAME probe width production uses — with a pinned
    ivf.nprobe, the samplers' default resolves to it (not the old
    fixed 2), so auto_tune_nprobe + auto_rebuild_index can't churn
    (tune meets the target at width 6, floor measured at width 2
    fires a pointless rebuild every cycle)."""
    import math

    from iceberg_lakehouse_spark.operators import ivfpq

    cat = LakehouseCatalog(spark, tmp_warehouse)
    vecs = [(i, [math.sin(i * 1.7 + d) for d in range(8)])
            for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    t = cat.create_table("default.rsw_vecs", df.schema)
    t.append(df)

    ai.build_ann_index(cat, "default.rsw", t.scan(), "vec_id",
                       "embedding", n_cells=4, kmeans_iters=2)
    idx = cat.load_table("default.rsw")
    # unpinned: default stays the historical width 2
    assert ai.ann_recall_sample(cat, "default.rsw", sample=4)["nprobe"] == 2
    idx.set_properties({"ivf.nprobe": "4"})
    rec = ai.ann_recall_sample(cat, "default.rsw", sample=4)
    assert rec["nprobe"] == 4
    # full width on a 4-cell index is exhaustive: recall is exact
    assert rec["recall_at_k"] == 1.0
    # explicit width still overrides
    assert ai.ann_recall_sample(
        cat, "default.rsw", sample=4, nprobe=1)["nprobe"] == 1

    ivfpq.build_ivfpq_index(cat, "default.rswq", t.scan(), "vec_id",
                            "embedding", n_cells=4, m=4, ksub=8,
                            kmeans_iters=1)
    qidx = cat.load_table("default.rswq")
    assert ivfpq.ivfpq_recall_sample(
        cat, "default.rswq", sample=4)["nprobe"] == 2
    qidx.set_properties({"ivfpq.nprobe": "3"})
    assert ivfpq.ivfpq_recall_sample(
        cat, "default.rswq", sample=4)["nprobe"] == 3

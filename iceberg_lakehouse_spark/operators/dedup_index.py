"""Persisted near-dup index: MinHash band keys stored in a LakeTable
so INCREMENTAL batches probe the index instead of recomputing the
whole corpus's signatures per batch — the production flow for a corpus
that grows by appends (the batch twin of the streaming curation sink's
fingerprint dedup, but for NEAR duplicates).

Build once over the existing corpus, extend per batch, probe each new
batch BEFORE appending it. Intra-batch near-dups are the caller's
first step (``dedup_corpus``/``minhash_dedup`` over the batch alone —
the index only answers new-vs-EXISTING):

    batch = dt.dedup_corpus(raw_batch, "doc_id", "text")   # new-vs-new
    idx = build_dedup_index(catalog, "default.docs_lsh", corpus,
                            "doc_id", "text")
    pairs = probe_dedup_index(idx, batch, corpus, "doc_id", "text",
                              threshold=0.7)               # new-vs-old
    # drop near-dup new docs, append survivors to the corpus, then:
    extend_dedup_index(idx, survivors, "doc_id", "text")

Scale shape: the index is an ordinary snapshot table of
(id, band, band_key) rows — O(bands) rows per document, uniform keys.
The probe BROADCASTS the new batch's band keys (a batch is small by
definition), so the index side is scanned map-side with no shuffle of
either corpus or index; hot collision keys (mass-duplicated content)
are size-gated like ``lsh_candidate_pairs`` — an over-cap key pairs
each new doc with ONE representative (the cluster's min indexed id)
instead of the whole cluster. Exact-Jaccard verification then touches
only candidate documents' texts. The index parameters (k, bands, n)
persist as table properties and are validated on every extend/probe so
an index can never be silently probed with mismatched hashing, and the
probe raises if the supplied corpus is missing any candidate indexed
doc (an index/corpus desync would otherwise read as false negatives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..catalog import LakehouseCatalog, LakeTable
from ..functions import dedup_text as dt

_PROPS = ("dedup.k", "dedup.bands", "dedup.ngram")


_INTEGRAL = ("byte", "short", "int", "integer", "long", "bigint")


def _check_id_type(df: DataFrame, id_col: str) -> None:
    # The index schema stores ids as long. A string/UUID (or lossy
    # float/decimal) id column would cast to all-NULL/truncated ids
    # with no error, silently corrupting the index so every probe
    # reports every near-dup as novel (r5 advice) — and the MCP server
    # exposes id_column as a free-form argument. Validate the TYPE
    # eagerly (no data scan): only integral ids are accepted.
    dtype = dict(df.dtypes).get(id_col)
    if dtype is None:
        raise ValueError(f"id column {id_col!r} not found in batch schema")
    if dtype not in _INTEGRAL:
        raise ValueError(
            f"dedup index requires an integral id column; {id_col!r} is "
            f"{dtype} (a string/UUID id would cast to NULL and corrupt "
            "the index — map it to a long id first)"
        )


def _banded(df: DataFrame, id_col: str, text_col: str,
            k: int, bands: int, n: int) -> DataFrame:
    _check_id_type(df, id_col)
    sigs = dt.minhash_signatures(df, id_col, text_col, k=k, n=n)
    return dt._banded_keys(sigs, id_col, k, bands).select(
        F.col(id_col).cast("long").alias("id"),
        F.col("band").cast("int").alias("band"),
        F.col("band_key"),
    )


def build_dedup_index(
    catalog: LakehouseCatalog,
    name: str,
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
) -> LakeTable:
    """Create the index table and load the corpus's band keys."""
    if bands <= 0 or k % bands != 0:
        # validate BEFORE create_table: failing after would leave a
        # poisoned zero-row index with plausible-looking properties
        raise ValueError(f"bands must divide k (got k={k}, bands={bands})")
    _check_id_type(df, id_col)
    t = catalog.create_table(
        name,
        [("id", "long"), ("band", "int"), ("band_key", "string")],
        properties={
            "dedup.k": str(k), "dedup.bands": str(bands), "dedup.ngram": str(n)
        },
    )
    t.append(_banded(df, id_col, text_col, k, bands, n))
    return t


def _params(index: LakeTable) -> tuple[int, int, int]:
    props = index.properties()
    missing = [p for p in _PROPS if p not in props]
    if missing:
        raise ValueError(
            f"table {index.namespace}.{index.table} is not a dedup index "
            f"(missing properties: {missing})"
        )
    return (
        int(props["dedup.k"]), int(props["dedup.bands"]), int(props["dedup.ngram"])
    )


def extend_dedup_index(
    index: LakeTable, new_df: DataFrame, id_col: str, text_col: str
) -> int:
    """Append the new batch's band keys (after its docs were accepted
    into the corpus). Returns the number of index rows added."""
    k, bands, n = _params(index)
    # persist: count + the append's write job would otherwise each run
    # the full signature pipeline over the batch
    rows = _banded(new_df, id_col, text_col, k, bands, n).persist()
    try:
        n_rows = rows.count()
        index.append(rows)
    finally:
        rows.unpersist()
    return n_rows


def probe_dedup_index(
    index: LakeTable,
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    max_bucket: int = 1024,
) -> DataFrame:
    """Near-dup pairs between the NEW batch and the indexed corpus:
    (left_id = existing doc, right_id = new doc, jaccard).

    Candidates come from band-key equality against the stored index —
    the new batch's keys broadcast, the index scans map-side. A
    collision key matched by more than ``max_bucket`` indexed docs is
    treated as a mass-dup cluster: each new doc pairs with the
    cluster's min indexed id only (the same recall semantics as
    ``lsh_candidate_pairs`` overflow buckets — verifying against one
    representative of a near-identical cluster suffices, and the
    expansion stays linear). Exact Jaccard is verified over candidate
    docs' texts; a new doc re-probing an id already in the index is
    excluded (idempotent re-runs). When a batch doc REUSES an existing
    corpus id, the batch's text wins deterministically.

    Raises if ``corpus_df`` lacks any candidate indexed doc — a silent
    drop there would report a real near-duplicate as novel."""
    k, bands, n = _params(index)
    new_banded = _banded(new_df, id_col, text_col, k, bands, n)
    batch_keys = new_banded.select("band", "band_key").distinct()
    # index rows on keys the batch actually hits (map-side: keys broadcast)
    hits = index.scan().select(
        F.col("id").alias("_idx_id"), "band", "band_key"
    ).join(F.broadcast(batch_keys), ["band", "band_key"])
    wn = Window.partitionBy("band", "band_key")
    sized = hits.select(
        "_idx_id", "band", "band_key",
        F.count("*").over(wn).alias("_n"),
        F.min("_idx_id").over(wn).alias("_mn"),
    )
    gated = sized.where(
        (F.col("_n") <= max_bucket) | (F.col("_idx_id") == F.col("_mn"))
    )
    cand = (
        gated.join(F.broadcast(new_banded), ["band", "band_key"])
        .where(F.col("_idx_id") != F.col("id"))
        .select(
            F.col("_idx_id").alias("left_id"), F.col("id").alias("right_id")
        )
        .distinct()
    )
    new_ids = new_df.select(F.col(id_col).cast("long").alias(id_col)).distinct()
    # batch text wins on id collision; the anti join broadcasts the tiny
    # batch id set — no corpus-wide shuffle (vs dropDuplicates)
    texts = (
        corpus_df.select(
            F.col(id_col).cast("long").alias(id_col), F.col(text_col)
        )
        .join(F.broadcast(new_ids), id_col, "left_anti")
        .unionByName(
            new_df.select(
                F.col(id_col).cast("long").alias(id_col), F.col(text_col)
            ).dropDuplicates([id_col])
        )
    )
    # desync guard: every candidate indexed doc must have a text row
    n_missing = (
        cand.select(F.col("left_id").alias(id_col)).distinct()
        .join(texts, id_col, "left_anti")
        .count()
    )
    if n_missing:
        raise ValueError(
            f"{n_missing} indexed doc(s) in candidate pairs are absent "
            "from corpus_df — the index and corpus are out of sync; "
            "probing would silently misreport their near-dups as novel"
        )
    verified = dt.jaccard_pairs(texts, cand, id_col, text_col, n)
    return verified.where(F.col("jaccard") >= threshold)


# --------------------------------------------------------------------------
# Persisted span-gram index (round 10) — the substring-level sibling of
# the MinHash band-key index above: one row per DISTINCT corpus n-gram,
# (gh = xxhash64 of the canonical gram string, id = keeper doc).
# Feeds streaming.span_dedup_stream_to_table; probes broadcast the
# batch's gram hashes so the index side stays a map-side, two-long-
# column pruned scan. Keyed ``id`` like every other index here, so
# operators.index_sync works on it unchanged.

_SPAN_PROPS = ("span.ngram",)


def build_span_index(
    catalog: LakehouseCatalog,
    name: str,
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> LakeTable:
    """Create the span-gram index over an already-landed (and ideally
    already span-deduped — ``functions.dedup_text.span_dedup``) corpus:
    every distinct n-gram hash with its keeper (min doc id). Index
    rows are O(corpus tokens) — by design: this is the structure that
    makes per-batch substring dedup O(batch) instead of a corpus
    re-scan."""
    from ..functions.dedup_text import _span_grams, _span_tokens

    if n < 2:
        raise ValueError(f"span ngram must be >= 2 (got {n})")
    _check_id_type(df, id_col)
    t = catalog.create_table(
        name,
        [("gh", "long"), ("id", "long")],
        properties={"span.ngram": str(n)},
    )
    grams = (
        _span_grams(_span_tokens(df, id_col, text_col), n)
        .select(F.xxhash64("g").alias("gh"),
                F.col("_id").cast("long").alias("_id"))
        .groupBy("gh")
        .agg(F.min("_id").alias("id"))
    )
    t.append(grams)
    return t


def _span_params(index: LakeTable) -> int:
    props = index.properties()
    missing = [p for p in _SPAN_PROPS if p not in props]
    if missing:
        raise ValueError(
            f"table {index.namespace}.{index.table} is not a span index "
            f"(missing properties: {missing})"
        )
    return int(props["span.ngram"])

"""Persisted near-dup index: MinHash band keys stored in a LakeTable
so INCREMENTAL batches probe the index instead of recomputing the
whole corpus's signatures per batch — the production flow for a corpus
that grows by appends (the batch twin of the streaming curation sink's
fingerprint dedup, but for NEAR duplicates).

Build once over the existing corpus, extend per batch, probe each new
batch BEFORE appending it:

    idx = build_dedup_index(catalog, "default.docs_lsh", corpus,
                            "doc_id", "text")
    pairs = probe_dedup_index(idx, new_batch, corpus, "doc_id", "text",
                              threshold=0.7)   # new vs existing
    # drop near-dup new docs, append survivors, then:
    extend_dedup_index(idx, survivors, "doc_id", "text")

Scale shape: the index is an ordinary snapshot table of
(id, band, band_key) rows — O(bands) rows per document, uniform keys.
The probe BROADCASTS the new batch's band keys (a batch is small by
definition), so the index side is scanned map-side with no shuffle of
either corpus or index; exact-Jaccard verification then touches only
candidate documents' texts. The index parameters (k, bands, n) persist
as table properties and are validated on every extend/probe so an
index can never be silently probed with mismatched hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import LakehouseCatalog, LakeTable
from ..functions import dedup_text as dt

_PROPS = ("dedup.k", "dedup.bands", "dedup.ngram")


def _banded(df: DataFrame, id_col: str, text_col: str,
            k: int, bands: int, n: int) -> DataFrame:
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
    rows = _banded(new_df, id_col, text_col, k, bands, n)
    n_rows = rows.count()
    index.append(rows)
    return n_rows


def probe_dedup_index(
    index: LakeTable,
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-dup pairs between the NEW batch and the indexed corpus:
    (left_id = existing doc, right_id = new doc, jaccard). Candidates
    come from band-key equality against the stored index — the new
    batch's keys broadcast, the index scans map-side; exact Jaccard is
    verified over the union of corpus + new texts for candidate docs
    only. A new doc re-probing an id already in the index is excluded
    (idempotent re-runs)."""
    k, bands, n = _params(index)
    new_banded = _banded(new_df, id_col, text_col, k, bands, n)
    idx = index.scan().select(
        F.col("id").alias("_idx_id"), "band", "band_key"
    )
    cand = (
        idx.join(F.broadcast(new_banded), ["band", "band_key"])
        .where(F.col("_idx_id") != F.col("id"))
        .select(
            F.col("_idx_id").alias("left_id"), F.col("id").alias("right_id")
        )
        .distinct()
    )
    texts = corpus_df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    ).unionByName(
        new_df.select(
            F.col(id_col).cast("long").alias(id_col), F.col(text_col)
        )
    ).dropDuplicates([id_col])
    verified = dt.jaccard_pairs(texts, cand, id_col, text_col, n)
    return verified.where(F.col("jaccard") >= threshold)

"""Persisted PERCEPTUAL-HASH index (round 10): the image sibling of
the MinHash band-key index — dHash/aHash fingerprints stored with
their pigeonhole segments so incremental media batches probe for
near-duplicate images against the whole landed corpus without ever
re-decoding it.

Layout: one LakeTable (id, seg, seg_key, phash) with (d+1) rows per
image — by pigeonhole, any pair within Hamming distance d agrees on at
least one of d+1 segments, so candidate generation is segment-key
equality. The probe BROADCASTS the batch's segment keys (a batch is
small by definition) so the index side is a map-side, column-pruned
scan; verification is the row-wise Hamming distance against the full
stored fingerprint (no bucket gathering — the candidate row already
carries both fingerprints). Keyed ``id``, so
``operators.index_sync.sync_index_deletes`` works on it unchanged.

Index parameters (algo, max_distance → segment count, fp width)
persist as table properties and are validated on every extend/probe —
an index can never be silently probed with mismatched hashing.
Reference analogue: none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import LakehouseCatalog, LakeTable

_PROPS = ("phash.algo", "phash.max_distance")
_FP_LEN = 64


def _seg_rows(fps: DataFrame, max_distance: int) -> DataFrame:
    """(id, seg, seg_key, phash): pigeonhole segment expansion of a
    (media_id, phash) fingerprint set — same single-pass inline()
    shape as ``simhash_hamming_pairs`` (never a union-of-selects,
    which would re-evaluate the decode per segment)."""
    segs = max_distance + 1
    seg_len = _FP_LEN // segs
    seg_structs = ", ".join(
        f"struct({s} AS seg, "
        f"substring(phash, {s * seg_len + 1}, {seg_len}) AS seg_key)"
        for s in range(segs)
    )
    return fps.selectExpr(
        "media_id AS id", "phash", f"inline(array({seg_structs}))"
    ).select("id", "seg", "seg_key", "phash")


def _hash_batch(media_df: DataFrame, algo: str,
                deterministic_fake: bool = False) -> DataFrame:
    from ..functions.multimodal import perceptual_hash

    return (
        perceptual_hash(media_df, algo=algo,
                        deterministic_fake=deterministic_fake)
        .where(F.col("phash").isNotNull())
        .select("media_id", "phash")
    )


def build_phash_index(
    catalog: LakehouseCatalog,
    name: str,
    media_df: DataFrame | None = None,
    algo: str | None = None,
    max_distance: int = 6,
    deterministic_fake: bool = False,
    fps: DataFrame | None = None,
) -> LakeTable:
    """Create the index and load the corpus's fingerprints (one
    Arrow-batched decode pass — the LAST time these blobs are read for
    dedup purposes). ``algo`` defaults to dhash for the media_df path;
    with ``fps`` (media_id, phash) rows from another 64-bit family —
    e.g. ``multimodal.audio_perceptual_hash`` — the caller MUST name
    the family explicitly: the recorded algo is what stops a later
    media_df probe from silently dHashing image blobs against audio
    fingerprints (the mismatched-hashing guard every index here
    carries), because a non-image algo makes that probe fail loudly
    inside ``perceptual_hash``."""
    if not 0 < max_distance < _FP_LEN:
        raise ValueError(
            f"max_distance must be in (0, {_FP_LEN}) (got {max_distance})")
    if fps is None:
        if media_df is None:
            raise ValueError("pass media_df or precomputed fps")
        algo = algo or "dhash"
        fps = _hash_batch(media_df, algo, deterministic_fake)
    elif algo is None:
        raise ValueError(
            "fps-built indexes must name their fingerprint family "
            "explicitly (e.g. algo='audio_gradient') — a defaulted "
            "'dhash' would let image probes silently compare against "
            "non-image fingerprints")
    t = catalog.create_table(
        name,
        [("id", "long"), ("seg", "int"), ("seg_key", "string"),
         ("phash", "string")],
        properties={"phash.algo": algo,
                    "phash.max_distance": str(max_distance)},
    )
    t.append(_seg_rows(
        fps.where(F.col("phash").isNotNull())
        .select("media_id", "phash"), max_distance))
    return t


def _params(index: LakeTable) -> tuple[str, int]:
    props = index.properties()
    missing = [p for p in _PROPS if p not in props]
    if missing:
        raise ValueError(
            f"table {index.namespace}.{index.table} is not a phash "
            f"index (missing properties: {missing})")
    return props["phash.algo"], int(props["phash.max_distance"])


def extend_phash_index(
    index: LakeTable, media_df: DataFrame | None = None,
    deterministic_fake: bool = False,
    fps: DataFrame | None = None,
) -> int:
    """Append an accepted batch's fingerprint segments. Returns index
    rows added. Pass ``fps`` — precomputed (media_id, phash) rows — to
    skip the decode (the streaming sink already hashed the batch once;
    re-decoding the blobs is the dominant per-batch cost)."""
    algo, d = _params(index)
    if fps is None:
        if media_df is None:
            raise ValueError("pass media_df or precomputed fps")
        fps = _hash_batch(media_df, algo, deterministic_fake)
    rows = _seg_rows(
        fps.where(F.col("phash").isNotNull())
        .select("media_id", "phash"), d).persist()
    try:
        n = rows.count()
        index.append(rows)
    finally:
        rows.unpersist()
    return n


def probe_phash_index(
    index: LakeTable,
    media_df: DataFrame | None = None,
    max_distance: int | None = None,
    deterministic_fake: bool = False,
    fps: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs between a NEW media batch and the indexed
    corpus: (left_id = indexed image, right_id = batch image, hamming).
    Batch segment keys broadcast → map-side index scan → row-wise
    Hamming verify at ``max_distance`` (defaults to, and may not
    exceed, the index's blocking distance — the pigeonhole guarantee
    only covers pairs within it). A batch image re-probing its own id
    is excluded (idempotent replays). ``fps`` as in
    ``extend_phash_index`` — decode once, probe and extend from the
    same fingerprints."""
    from ..functions.dedup_text import _hamming_sql

    algo, d = _params(index)
    if max_distance is None:
        max_distance = d
    if max_distance > d:
        raise ValueError(
            f"probe distance {max_distance} exceeds the index blocking "
            f"distance {d} — candidates beyond it are not guaranteed")
    if fps is None:
        if media_df is None:
            raise ValueError("pass media_df or precomputed fps")
        fps = _hash_batch(media_df, algo, deterministic_fake)
    batch = _seg_rows(
        fps.where(F.col("phash").isNotNull())
        .select("media_id", "phash"), d)
    ham = _hamming_sql("l_phash", "r_phash")
    return (
        index.scan()
        .withColumnRenamed("id", "left_id")
        .withColumnRenamed("phash", "l_phash")
        .join(
            F.broadcast(
                batch.select(
                    F.col("id").alias("right_id"), "seg", "seg_key",
                    F.col("phash").alias("r_phash"))),
            ["seg", "seg_key"],
        )
        .where(F.col("left_id") != F.col("right_id"))
        .selectExpr("left_id", "right_id", f"{ham} AS hamming")
        .distinct()
        .where(F.col("hamming") <= max_distance)
    )


# ---------------------------------------------------------------------------
# Persisted VIDEO frame-set index (round 11 — r10 VERDICT #4)
# ---------------------------------------------------------------------------

_VF_PROPS = ("vframe.every_nth", "vframe.threshold", "vframe.max_df")


def _vf_hashes(video_df: DataFrame, every_nth: int) -> DataFrame:
    from ..functions.multimodal import video_frame_hashes

    return (
        video_frame_hashes(video_df, every_nth=every_nth)
        .select("media_id", "fhash")
        .distinct()
    )


def build_vframe_index(
    catalog: LakehouseCatalog,
    name: str,
    video_df: DataFrame,
    every_nth: int = 1,
    threshold: float = 0.5,
    max_df: int = 1024,
) -> LakeTable:
    """Create the persisted frame-set index over an already-landed
    video corpus: one (id, fhash) row per clip × DISTINCT sampled
    frame fingerprint — ``video_near_dup_pairs``' candidate structure
    made incremental, so per-batch clip dedup probes frame-hash
    equality against the whole landed corpus WITHOUT re-hashing it
    (the corpus re-decode was the r10 gap). Keyed ``id``:
    ``index_sync`` (delete sync, stale-reinsert re-extend) works
    unchanged. Sampling/threshold/df-cap persist as properties and are
    validated on every probe — an index can never be silently probed
    with mismatched sampling."""
    if every_nth < 1:
        raise ValueError(f"every_nth must be >= 1 (got {every_nth})")
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1] (got {threshold})")
    t = catalog.create_table(
        name,
        [("id", "long"), ("fhash", "string")],
        properties={"vframe.every_nth": str(every_nth),
                    "vframe.threshold": repr(float(threshold)),
                    "vframe.max_df": str(max_df)},
    )
    rows = _vf_hashes(video_df, every_nth) \
        .select(F.col("media_id").cast("long").alias("id"), "fhash")
    t.append(rows)
    return t


def _vf_params(index: LakeTable) -> tuple[int, float, int]:
    props = index.properties()
    missing = [p for p in _VF_PROPS if p not in props]
    if missing:
        raise ValueError(
            f"table {index.namespace}.{index.table} is not a frame-set "
            f"index (missing properties: {missing})")
    return (int(props["vframe.every_nth"]),
            float(props["vframe.threshold"]),
            int(props["vframe.max_df"]))


def extend_vframe_index(
    index: LakeTable,
    video_df: DataFrame | None = None,
    fhashes: DataFrame | None = None,
) -> int:
    """Append an accepted clip batch's distinct frame fingerprints.
    Returns index rows added. Pass ``fhashes`` — precomputed DISTINCT
    (media_id, fhash) rows — to skip the decode (the streaming sink
    hashes the batch once; re-reading the clip blobs is the dominant
    per-batch cost)."""
    every_nth, _t, _d = _vf_params(index)
    if fhashes is None:
        if video_df is None:
            raise ValueError("pass video_df or precomputed fhashes")
        fhashes = _vf_hashes(video_df, every_nth)
    rows = fhashes.select(
        F.col("media_id").cast("long").alias("id"), "fhash").persist()
    try:
        n = rows.count()
        index.append(rows)
    finally:
        rows.unpersist()
    return n


def probe_vframe_index(
    index: LakeTable,
    video_df: DataFrame | None = None,
    threshold: float | None = None,
    max_df: int | None = None,
    fhashes: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate clip pairs between a NEW video batch and the
    indexed corpus: (left_id = indexed clip, right_id = batch clip,
    shared_frames, containment) — the same trim/re-mux-robust
    containment semantics as ``video_near_dup_pairs``, incremental.

    Scale shape: the batch's distinct frame hashes BROADCAST and the
    index scan is map-side + column-pruned to (id, fhash) — only
    index rows whose fingerprint occurs in the batch ever leave the
    scan, so per-batch cost is O(batch + hits), never a corpus
    re-hash. The df-cap is applied INDEX-side over the hit set
    (a fingerprint carried by more clips than ``max_df`` — test
    patterns, black frames — generates no candidates), while the
    containment verify counts EVERY shared distinct fingerprint of a
    candidate pair, exactly like the batch operator. The denominator
    |left clip| comes from one id-pruned index aggregate over the
    candidate clips only. A batch clip re-probing its own id is
    excluded (idempotent replays)."""
    every_nth, t0, d0 = _vf_params(index)
    threshold = t0 if threshold is None else threshold
    max_df = d0 if max_df is None else max_df
    if fhashes is None:
        if video_df is None:
            raise ValueError("pass video_df or precomputed fhashes")
        fhashes = _vf_hashes(video_df, every_nth)
    batch = fhashes.select(
        F.col("media_id").cast("long").alias("right_id"), "fhash")
    # hits: every index row sharing a fingerprint with the batch —
    # batch keys broadcast, index side map-side
    hits = (
        index.scan().withColumnRenamed("id", "left_id")
        .join(F.broadcast(batch.select("fhash").distinct()), "fhash")
    )
    # candidate GENERATION under the df-cap, computed over the hit
    # set only (O(hits), not O(index))
    hot = (
        hits.groupBy("fhash")
        .agg(F.countDistinct("left_id").alias("_df"))
        .where(F.col("_df") > max_df)
        .select("fhash")
    )
    cand = (
        hits.join(F.broadcast(hot), "fhash", "left_anti")
        .join(batch, "fhash")
        .where(F.col("left_id") != F.col("right_id"))
        .select("left_id", "right_id")
        .distinct()
    )
    # VERIFY counts every shared distinct fingerprint (cap-free)
    shared = (
        hits.join(batch, "fhash")
        .join(cand, ["left_id", "right_id"], "left_semi")
        .groupBy("left_id", "right_id")
        .agg(F.countDistinct("fhash").alias("shared_frames"))
    )
    left_sizes = (
        index.scan().select(F.col("id").alias("left_id"))
        .join(F.broadcast(cand.select("left_id").distinct()),
              "left_id", "left_semi")
        .groupBy("left_id")
        .agg(F.count(F.lit(1)).alias("_na"))
    )
    right_sizes = batch.groupBy("right_id").agg(
        F.count(F.lit(1)).alias("_nb"))
    return (
        shared.join(left_sizes, "left_id")
        .join(right_sizes, "right_id")
        .select(
            "left_id", "right_id", "shared_frames",
            F.round(
                F.col("shared_frames")
                / F.least(F.col("_na"), F.col("_nb")), 6
            ).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )

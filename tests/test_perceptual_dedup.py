"""Perceptual image dedup (round 10): dHash/aHash fingerprints over
the real pure-Python pixel decode, near-dup pairs via the shared
Hamming pigeonhole blocking, and the plan gate proving the comparison
is blocked (segment-equality shuffle), never all-pairs.

No reference analogue — this closes the dedup × multimodal cell of
the LLM-pipeline mandate."""

from __future__ import annotations

import pytest

from iceberg_lakehouse_spark.functions import multimodal as mm

from tests.test_llm_ops import _bmp_bytes, _ppm_bytes


def _gradient_px(h, w, step=10, bump=0):
    """Pixels increasing left→right: dHash grid cells (one pixel each
    at h=8, w=9) are strictly increasing, so every dhash bit is 1."""
    return [
        ((min(255, c * step + bump),) * 3)
        for r in range(h) for c in range(w)
    ]


def test_dhash_bits_hand_computed(spark):
    """8×9 image = one pixel per dHash grid cell: strictly increasing
    rows → all 64 bits are 1; strictly decreasing → all 0; bumping the
    single pixel (0,0) above its right neighbour flips EXACTLY bit
    (0,0) → hamming 1."""
    inc = _gradient_px(8, 9)
    dec = [t for t in reversed(inc)]
    bump = list(inc)
    bump[0] = (200, 200, 200)  # > pixel (0,1)=10 → bit (0,0) flips
    rows = [
        (1, _ppm_bytes(9, 8, inc), "image", "ppm", 0),
        (2, _ppm_bytes(9, 8, dec), "image", "ppm", 0),
        (3, _ppm_bytes(9, 8, bump), "image", "ppm", 0),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r["phash"]
           for r in mm.perceptual_hash(df, algo="dhash").collect()}
    assert got[1] == "1" * 64
    assert len(got[2]) == 64 and got[2].count("1") == 0
    assert sum(a != b for a, b in zip(got[1], got[3])) == 1


def test_ahash_bits_hand_computed(spark):
    """8×8 image, top half bright / bottom half dark → aHash is 32
    ones then 32 zeros (cells above the global mean)."""
    px = [((200,) * 3) if r < 4 else ((50,) * 3)
          for r in range(8) for c in range(8)]
    df = spark.createDataFrame(
        [(1, _ppm_bytes(8, 8, px), "image", "ppm", 0)], mm.MEDIA_SCHEMA)
    got = mm.perceptual_hash(df, algo="ahash").first()["phash"]
    assert got == "1" * 32 + "0" * 32


def test_dhash_invariances(spark):
    """The properties that make dHash a DEDUP fingerprint rather than
    a checksum: identical pixels through DIFFERENT containers (PPM vs
    BMP) hash identically; a uniform brightness shift (no clamping)
    hashes identically; a 2× upscale (block means preserved) hashes
    identically."""
    base = _gradient_px(8, 9)
    up = [base[(r // 2) * 9 + (c // 2)]
          for r in range(16) for c in range(18)]
    rows = [
        (1, _ppm_bytes(9, 8, base), "image", "ppm", 0),
        (2, _bmp_bytes(9, 8, base), "image", "bmp", 0),
        (3, _ppm_bytes(9, 8, _gradient_px(8, 9, bump=30)), "image", "ppm", 0),
        (4, _ppm_bytes(18, 16, up), "image", "ppm", 0),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r["phash"]
           for r in mm.perceptual_hash(df).collect()}
    assert got[1] == got[2] == got[3] == got[4]


def test_media_near_dup_pairs_planted(spark):
    """Planted corpus: an exact dup (hamming 0), a near dup (1 flipped
    grid cell → hamming 1), a far image (inverted gradient), a corrupt
    blob (NULL phash, silently excluded), and two byte-identical
    unrecognized-format blobs (content-hash fake tier → exact dup).
    Pairs at max_distance=6 must be exactly the planted ones."""
    inc = _gradient_px(8, 9)
    bump = list(inc)
    bump[0] = (200, 200, 200)
    rows = [
        (1, _ppm_bytes(9, 8, inc), "image", "ppm", 0),
        (2, _bmp_bytes(9, 8, inc), "image", "bmp", 0),          # exact dup
        (3, _ppm_bytes(9, 8, bump), "image", "ppm", 0),         # near dup
        (4, _ppm_bytes(9, 8, list(reversed(inc))), "image", "ppm", 0),
        (5, _ppm_bytes(9, 8, inc)[:20], "image", "ppm", 0),     # corrupt
        (6, b"GIF89a same bytes", "image", "gif", 0),           # fake tier
        (7, b"GIF89a same bytes", "image", "gif", 0),           # fake tier
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    pairs = {
        (r["left_id"], r["right_id"]): r["hamming"]
        for r in mm.media_near_dup_pairs(df, max_distance=6).collect()
    }
    assert pairs == {(1, 2): 0, (1, 3): 1, (2, 3): 1, (6, 7): 0}, pairs
    # corrupt blob produced a NULL phash, not a crash / phantom pair
    ph = {r["media_id"]: r["phash"]
          for r in mm.perceptual_hash(df).collect()}
    assert ph[5] is None
    assert all(5 not in p for p in pairs)


def test_media_near_dup_plan_is_blocked_not_all_pairs(spark):
    """Plan gate: the pairs join is a segment-equality hash shuffle
    (pigeonhole blocking) — the physical plan must contain NO
    cartesian / nested-loop join, which is what an all-pairs hamming
    comparison would compile to."""
    rows = [(i, _ppm_bytes(9, 8, _gradient_px(8, 9, bump=i)), "image",
             "ppm", 0) for i in range(8)]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    plan = mm.media_near_dup_pairs(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_perceptual_hash_tiers_and_errors(spark):
    """Contract edges: unknown algo raises; require_codec=True turns
    the fake tier into the honest NotImplementedError; the
    deterministic_fake tier is stable and content-keyed."""
    with pytest.raises(ValueError, match="unknown algo"):
        mm.perceptual_hash(spark.range(0).selectExpr(
            "id AS media_id", "CAST(NULL AS BINARY) AS content",
            "'image' AS media_type", "'ppm' AS format",
            "0L AS size_bytes"), algo="md5")
    rows = [(1, b"GIF89a no parser", "image", "gif", 0)]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    if not mm._pil_available():
        with pytest.raises(Exception, match="no codec"):
            mm.perceptual_hash(df, require_codec=True).collect()
    a = mm.perceptual_hash(df, deterministic_fake=True).first()["phash"]
    b = mm.perceptual_hash(df, deterministic_fake=True).first()["phash"]
    assert a == b and len(a) == 64 and set(a) <= {"0", "1"}


def _media_rows(spark, rows):
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def _img(seed, bump_cell=None):
    """9×8 PPM with a per-seed pseudo-random luminance grid; bump_cell
    re-lights one grid cell (<=2 dHash bits — a re-encode artifact)."""
    import hashlib

    d = hashlib.sha256(f"img-{seed}".encode()).digest()
    while len(d) < 72:
        d += hashlib.sha256(d).digest()
    cells = [10 + (b % 236) for b in d[:72]]
    if bump_cell is not None:
        i = bump_cell % 72
        cells[i] = 10 + ((cells[i] - 10) + 118) % 236
    return _ppm_bytes(9, 8, [(v, v, v) for v in cells])


def test_phash_index_build_probe_extend(spark, tmp_warehouse):
    from iceberg_lakehouse_spark.catalog import LakehouseCatalog
    from iceberg_lakehouse_spark.operators import media_index as mi

    cat = LakehouseCatalog(spark, tmp_warehouse)
    corpus = _media_rows(spark, [
        (1, _img("a"), "image", "ppm", 0),
        (2, _img("b"), "image", "ppm", 0),
        (3, _img("c"), "image", "ppm", 0),
    ])
    idx = mi.build_phash_index(cat, "default.phash", corpus,
                               max_distance=4)
    assert idx.scan().count() == 3 * 5  # (d+1) segment rows per image
    batch = _media_rows(spark, [
        (10, _img("a", bump_cell=5), "image", "ppm", 0),  # near-dup of 1
        (11, _img("zz"), "image", "ppm", 0),              # novel
    ])
    pairs = {(r["left_id"], r["right_id"]): r["hamming"]
             for r in mi.probe_phash_index(idx, batch).collect()}
    assert set(pairs) == {(1, 10)} and pairs[(1, 10)] <= 2, pairs
    # extend with the novel image; a later near-dup of IT now matches
    mi.extend_phash_index(idx, batch.where("media_id = 11"))
    batch2 = _media_rows(spark, [
        (20, _img("zz", bump_cell=9), "image", "ppm", 0)])
    pairs2 = {(r["left_id"], r["right_id"])
              for r in mi.probe_phash_index(idx, batch2).collect()}
    assert pairs2 == {(11, 20)}
    # contract edges
    with pytest.raises(ValueError, match="exceeds the index"):
        mi.probe_phash_index(idx, batch2, max_distance=60).collect()
    other = cat.create_table("default.notphash", [("id", "long")])
    with pytest.raises(ValueError, match="not a phash index"):
        mi.probe_phash_index(other, batch2)


def test_media_dedup_stream_two_batches(spark, tmp_path, tmp_warehouse):
    """Streaming × multimodal × dedup end-to-end: intra-batch keeper
    semantics, cross-batch near-dup drops via the extended index,
    corrupt blobs passing through, and replay idempotence."""
    from pyspark.sql import types as T

    from iceberg_lakehouse_spark.catalog import LakehouseCatalog
    from iceberg_lakehouse_spark.operators import media_index as mi
    from iceberg_lakehouse_spark.streaming.sink import (
        media_dedup_stream_to_table,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    schema = T.StructType(
        list(mm.MEDIA_SCHEMA.fields)
        + [T.StructField("phash", T.StringType())])
    t = cat.create_table("media_corpus", schema)
    corpus = _media_rows(spark, [(1, _img("base"), "image", "ppm", 0)])
    idx = mi.build_phash_index(cat, "default.phash", corpus,
                               max_distance=4)
    t.append(mm.perceptual_hash(corpus).select("media_id", "phash")
             .join(corpus, "media_id").select(*[f.name for f in schema]))

    rows1 = [
        (10, _img("fresh"), "image", "ppm", 0),              # lands
        (11, _img("base", bump_cell=3), "image", "ppm", 0),  # dup of 1
        (12, _img("pair"), "image", "ppm", 0),               # keeper
        (13, _img("pair", bump_cell=8), "image", "ppm", 0),  # dup of 12
        (14, b"GIF89a undecodable", "image", "gif", 0),      # fake tier
        (15, _img("x")[:20], "image", "ppm", 0),             # corrupt
    ]
    d1 = str(tmp_path / "m1")
    _media_rows(spark, rows1).write.parquet(d1)
    q = media_dedup_stream_to_table(
        spark.readStream.schema(mm.MEDIA_SCHEMA).parquet(d1),
        t, idx, checkpoint_dir=str(tmp_path / "ck1"), available_now=True)
    q.awaitTermination(180)
    got = {r["media_id"]: r["phash"] for r in t.scan().collect()}
    assert set(got) == {1, 10, 12, 14, 15}, sorted(got)
    assert got[15] is None                 # corrupt blob passed through
    assert got[10] is not None and len(got[10]) == 64

    # batch 2: near-dup of batch-1 SURVIVOR 12 drops via the extended
    # index; novel image lands
    rows2 = [
        (20, _img("pair", bump_cell=30), "image", "ppm", 0),
        (21, _img("novel2"), "image", "ppm", 0),
    ]
    d2 = str(tmp_path / "m2")
    _media_rows(spark, rows2).write.parquet(d2)
    q2 = media_dedup_stream_to_table(
        spark.readStream.schema(mm.MEDIA_SCHEMA).parquet(d2),
        t, idx, checkpoint_dir=str(tmp_path / "ck2"), available_now=True)
    q2.awaitTermination(180)
    assert set(r["media_id"] for r in t.scan().collect()) \
        == {1, 10, 12, 14, 15, 21}

    # replay batch 2 (fresh checkpoint): nothing new lands, index
    # row count stable
    n_idx = idx.scan().count()
    q3 = media_dedup_stream_to_table(
        spark.readStream.schema(mm.MEDIA_SCHEMA).parquet(d2),
        t, idx, checkpoint_dir=str(tmp_path / "ck3"), available_now=True)
    q3.awaitTermination(180)
    assert t.scan().count() == 6
    assert idx.scan().count() == n_idx


def _wav(samples, channels=1, rate=8000):
    from tests.test_llm_ops import _wav_bytes

    return _wav_bytes(samples, channels=channels, rate=rate)


def test_audio_perceptual_hash_and_pairs(spark):
    """Audio dedup cell (r10): the envelope-gradient fingerprint is a
    GAIN-INVARIANT 64-bit hash (signs of adjacent energy deltas), a
    tiny local edit flips few bits, a different energy shape is far,
    and corrupt blobs yield NULL — pairs via the shared pigeonhole
    blocking, never all-pairs."""
    import math

    import pyspark.sql.functions as F

    n = 6500  # 65 bins × 100 frames
    base = [int(8000 * abs(math.sin(i / 37.0))) for i in range(n)]
    half = [v // 2 for v in base]               # uniform gain change
    edit = list(base)
    edit[1300:1400] = [12000] * 100             # one re-lit bin
    ramp = [i for i in range(n)]                # monotone energy
    rows = [
        (1, _wav(base), "audio", "wav", 0),
        (2, _wav(half), "audio", "wav", 0),     # exact dup by gradient
        (3, _wav(edit), "audio", "wav", 0),     # near dup
        (4, _wav(ramp), "audio", "wav", 0),     # far (all-ones hash)
        (5, b"RIFFjunk", "audio", "wav", 0),    # corrupt
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    ph = {r["media_id"]: r["phash"]
          for r in mm.audio_perceptual_hash(df).collect()}
    assert ph[1] == ph[2] and len(ph[1]) == 64   # gain invariance
    assert ph[5] is None
    d13 = sum(a != b for a, b in zip(ph[1], ph[3]))
    assert 1 <= d13 <= 4, d13                    # local edit = few bits
    assert ph[4] == "1" * 64                     # monotone ramp
    pairs = {(r["left_id"], r["right_id"]): r["hamming"]
             for r in mm.audio_near_dup_pairs(df, max_distance=6)
             .collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 0
    assert (1, 3) in pairs and (2, 3) in pairs
    assert all(4 not in p and 5 not in p for p in pairs)
    # blocked plan, like every other fingerprint family
    plan = mm.audio_near_dup_pairs(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_video_frame_hash_dedup(spark):
    """Video dedup cell (r10): clips as documents of frame fingerprints
    — a re-encoded copy (per-frame brightness shift: dHash-invariant)
    matches fully, a TRIMMED copy matches by containment, a clip
    sharing only a ubiquitous black frame does not pair (df cap drops
    it from candidates), and disjoint clips never pair."""
    def frame(seed):
        import hashlib

        d = hashlib.sha256(f"vf-{seed}".encode()).digest()
        while len(d) < 72:
            d += hashlib.sha256(d).digest()
        return _ppm_bytes(9, 8, [((10 + b % 200,) * 3) for b in d[:72]])

    def bright(seed, up):
        import hashlib

        d = hashlib.sha256(f"vf-{seed}".encode()).digest()
        while len(d) < 72:
            d += hashlib.sha256(d).digest()
        return _ppm_bytes(9, 8, [((10 + b % 200 + up,) * 3)
                                 for b in d[:72]])

    black = _ppm_bytes(9, 8, [(0, 0, 0)] * 72)
    a = frame("a1") + frame("a2") + frame("a3") + frame("a4")
    a_re = (bright("a1", 30) + bright("a2", 30) + bright("a3", 30)
            + bright("a4", 30))                       # re-encode
    a_trim = frame("a2") + frame("a3")                # 2 of 4 frames
    other = frame("z1") + black                       # shares nothing real
    withblk = frame("q1") + black                     # shares only black
    rows = [
        (1, a, "video", "ppmv", 0),
        (2, a_re, "video", "ppmv", 0),
        (3, a_trim, "video", "ppmv", 0),
        (4, other, "video", "ppmv", 0),
        (5, withblk, "video", "ppmv", 0),
        # two more black-bearing clips push the black frame's document
        # frequency over max_df=3 — genuinely ubiquitous, like a test
        # pattern
        (6, frame("r1") + black, "video", "ppmv", 0),
        (7, frame("s1") + black, "video", "ppmv", 0),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    hashes = mm.video_frame_hashes(df)
    got = {(r["media_id"], r["frame_index"]): r["fhash"]
           for r in hashes.collect()}
    assert got[(1, 0)] == got[(2, 0)]          # brightness-invariant
    assert got[(1, 1)] == got[(3, 0)]          # trim preserves hashes
    pairs = {(r["left_id"], r["right_id"]): r["containment"]
             for r in mm.video_near_dup_pairs(df, threshold=0.5,
                                              max_df=3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert pairs[(1, 3)] == 1.0                # full containment of trim
    assert pairs[(2, 3)] == 1.0
    assert (4, 5) not in pairs                 # only-black-frame pair cut
    assert all(4 not in p or 5 in p for p in pairs)  # 4 pairs with nobody
    # plan gate: equality-join candidates, no cartesian
    plan = mm.video_near_dup_pairs(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_raw_pixels_pillow_corrupt_vs_unrecognized(monkeypatch):
    """r10 ADVICE: the corrupt-recognized-format contract must hold
    for the Pillow tier too. A stub PIL distinguishes the two failure
    modes: UnidentifiedImageError -> None (fall to fake tier), while a
    recognized-but-corrupt blob -> (None, None, None) (NULL phash).
    Runs with or without real Pillow (sys.modules is stubbed)."""
    import sys
    import types

    class _Unidentified(Exception):
        pass

    class _StubImg:
        def __init__(self, corrupt):
            self._corrupt = corrupt
            self.size = (2, 2)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def convert(self, mode):
            if self._corrupt:
                raise OSError("broken data stream")
            return self

        def getdata(self):
            return [(0, 0, 0)] * 4

    def _open(buf):
        data = buf.read()
        if data.startswith(b"STUB"):
            return _StubImg(corrupt=b"CORRUPT" in data)
        raise _Unidentified("cannot identify image file")

    pil = types.ModuleType("PIL")
    pil.Image = types.SimpleNamespace(open=_open)
    pil.UnidentifiedImageError = _Unidentified
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setattr(mm, "_pil_available", lambda: True)

    # unrecognized -> None (caller substitutes the content-hash fake)
    assert mm._raw_pixels(b"\x00\x01not an image") is None
    # recognized + readable -> real pixels
    h, w, px = mm._raw_pixels(b"STUB ok")
    assert (h, w) == (2, 2) and len(px) == 4
    # recognized + CORRUPT -> the NULL-phash sentinel, not the fake
    assert mm._raw_pixels(b"STUB CORRUPT") == (None, None, None)


# ---------------------------------------------------------------------------
# Persisted VIDEO frame-set index (round 11 — r10 VERDICT #4)
# ---------------------------------------------------------------------------


def _vframe(seed, up=0):
    import hashlib

    d = hashlib.sha256(f"vf-{seed}".encode()).digest()
    while len(d) < 72:
        d += hashlib.sha256(d).digest()
    return _ppm_bytes(9, 8, [((10 + b % 200 + up,) * 3) for b in d[:72]])


def _clip(*seeds, up=0):
    return b"".join(_vframe(s, up) for s in seeds)


def test_vframe_index_build_probe_extend(spark, tmp_warehouse):
    """Planted fixtures: a TRIMMED copy of an indexed clip probes
    positive by containment, a RE-ENCODED (brightness-shifted,
    dHash-invariant) copy matches fully, a disjoint clip does not
    pair, a ubiquitous frame (black, over the df-cap) generates no
    candidates, and extend makes a new clip probe-able."""
    from iceberg_lakehouse_spark.catalog import LakehouseCatalog
    from iceberg_lakehouse_spark.operators import media_index as mi

    cat = LakehouseCatalog(spark, tmp_warehouse)
    black = _ppm_bytes(9, 8, [(0, 0, 0)] * 72)
    corpus = _media_rows(spark, [
        (1, _clip("a1", "a2", "a3", "a4"), "video", "ppmv", 0),
        (2, _clip("b1", "b2") + black, "video", "ppmv", 0),
        (3, _clip("c1") + black, "video", "ppmv", 0),
        (4, _clip("d1") + black, "video", "ppmv", 0),
        (5, _clip("e1") + black, "video", "ppmv", 0),
    ])
    idx = mi.build_vframe_index(cat, "default.vf", corpus,
                                threshold=0.5, max_df=3)
    # (id, fhash) rows, distinct per clip
    assert idx.scan().where("id = 1").count() == 4
    # trimmed copy of clip 1 (2 of 4 frames): full containment
    batch = _media_rows(spark, [
        (101, _clip("a2", "a3"), "video", "ppmv", 0),      # trim of 1
        (102, _clip("a1", "a2", "a3", "a4", up=30), "video",
         "ppmv", 0),                                       # re-encode of 1
        (103, _clip("z1", "z2"), "video", "ppmv", 0),      # disjoint
        (104, _clip("q1") + black, "video", "ppmv", 0),    # only black
    ])
    pairs = {(r["left_id"], r["right_id"]): r["containment"]
             for r in mi.probe_vframe_index(idx, batch).collect()}
    assert pairs[(1, 101)] == 1.0
    assert pairs[(1, 102)] == 1.0
    assert not any(r == 103 for (_l, r) in pairs)
    # clip 104 shares ONLY the ubiquitous black frame (df 4 > cap 3)
    assert not any(r == 104 for (_l, r) in pairs)

    # extend with the disjoint clip, then a trim of IT probes positive
    added = mi.extend_vframe_index(
        idx, video_df=batch.where("media_id = 103"))
    assert added == 2
    pairs2 = {(r["left_id"], r["right_id"])
              for r in mi.probe_vframe_index(
                  idx,
                  _media_rows(spark, [(201, _clip("z1"), "video",
                                       "ppmv", 0)])).collect()}
    assert (103, 201) in pairs2
    # param validation: probing a non-vframe table fails loudly
    other = cat.create_table("default.notvf",
                             [("id", "long"), ("fhash", "string")])
    with pytest.raises(ValueError, match="frame-set index"):
        mi.probe_vframe_index(other, batch)


def test_vframe_index_status_and_sync(spark, tmp_warehouse):
    """The frame-set index is a first-class index family: index_status
    reports it (kind vframe, sync states), sync_index_deletes drops a
    deleted clip's rows, and reextend_index re-lands an updated clip's
    NEW fingerprints."""
    from iceberg_lakehouse_spark.catalog import LakehouseCatalog
    from iceberg_lakehouse_spark.operators import crud
    from iceberg_lakehouse_spark.operators import media_index as mi
    from iceberg_lakehouse_spark.operators.index_sync import (
        index_status,
        link_index_source,
        reextend_index,
        sync_index_deletes,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    media = _media_rows(spark, [
        (1, _clip("a1", "a2"), "video", "ppmv", 0),
        (2, _clip("b1", "b2"), "video", "ppmv", 0),
        (3, _clip("c1", "c2"), "video", "ppmv", 0),
    ])
    mt = cat.create_table("default.clips", media.schema)
    mt.append(media)
    idx = mi.build_vframe_index(cat, "default.clips_vf", mt.scan())
    link_index_source(cat, "default.clips_vf", "default.clips",
                      "media_id")
    st = {e["index"]: e for e in index_status(cat)}["default.clips_vf"]
    assert st["kind"] == "vframe" and st["sync_state"] == "in_sync"
    # delete clip 2 -> sync drops its 2 rows
    crud.delete_rows(mt, "media_id = 2")
    rep = sync_index_deletes(cat, "default.clips_vf")
    assert rep["deleted_ids"] == 1 and rep["removed_index_rows"] == 2
    assert idx.scan().where("id = 2").count() == 0
    # update clip 3 -> sync + reextend land the NEW frames
    crud.update_rows(mt, "media_id = 3",
                     {"content": _clip("n1", "n2", "n3")})
    sync_index_deletes(cat, "default.clips_vf")
    rex = reextend_index(cat, "default.clips_vf")
    assert rex["reextended_ids"] == 1 and rex["index_rows_added"] == 3
    probe = mi.probe_vframe_index(
        idx, _media_rows(spark, [(301, _clip("n1", "n2"), "video",
                                  "ppmv", 0)]))
    assert {(r["left_id"], r["right_id"])
            for r in probe.collect()} == {(3, 301)}


def test_video_dedup_stream_two_batches(spark, tmp_path, tmp_warehouse):
    """Streaming clip dedup: intra-batch keeper semantics, cross-batch
    trim drops via the extended index, undecodable clips pass through,
    and replay idempotence — without ever re-hashing the corpus."""
    from iceberg_lakehouse_spark.catalog import LakehouseCatalog
    from iceberg_lakehouse_spark.operators import media_index as mi
    from iceberg_lakehouse_spark.streaming.sink import (
        video_dedup_stream_to_table,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("clip_corpus", mm.MEDIA_SCHEMA)
    corpus = _media_rows(spark, [
        (1, _clip("a1", "a2", "a3", "a4"), "video", "ppmv", 0)])
    idx = mi.build_vframe_index(cat, "default.vfidx", corpus,
                                threshold=0.5)
    t.append(corpus)

    rows1 = [
        (10, _clip("f1", "f2"), "video", "ppmv", 0),        # lands
        (11, _clip("a2", "a3"), "video", "ppmv", 0),        # trim of 1
        (12, _clip("p1", "p2", "p3"), "video", "ppmv", 0),  # keeper
        (13, _clip("p2", "p3"), "video", "ppmv", 0),        # trim of 12
        (14, b"not a ppm stream at all", "video", "raw", 0),  # undecodable
    ]
    d1 = str(tmp_path / "v1")
    _media_rows(spark, rows1).write.parquet(d1)
    q = video_dedup_stream_to_table(
        spark.readStream.schema(mm.MEDIA_SCHEMA).parquet(d1),
        t, idx, checkpoint_dir=str(tmp_path / "ck1"), available_now=True)
    q.awaitTermination(180)
    assert {r["media_id"] for r in t.scan().collect()} \
        == {1, 10, 12, 14}

    # batch 2: trim of batch-1 SURVIVOR 12 drops via the extended
    # index; novel clip lands
    rows2 = [
        (20, _clip("p1", "p2"), "video", "ppmv", 0),
        (21, _clip("w1", "w2"), "video", "ppmv", 0),
    ]
    d2 = str(tmp_path / "v2")
    _media_rows(spark, rows2).write.parquet(d2)
    q2 = video_dedup_stream_to_table(
        spark.readStream.schema(mm.MEDIA_SCHEMA).parquet(d2),
        t, idx, checkpoint_dir=str(tmp_path / "ck2"), available_now=True)
    q2.awaitTermination(180)
    assert {r["media_id"] for r in t.scan().collect()} \
        == {1, 10, 12, 14, 21}

    # replay batch 2 (fresh checkpoint): nothing new, index stable
    n_idx = idx.scan().count()
    q3 = video_dedup_stream_to_table(
        spark.readStream.schema(mm.MEDIA_SCHEMA).parquet(d2),
        t, idx, checkpoint_dir=str(tmp_path / "ck3"), available_now=True)
    q3.awaitTermination(180)
    assert t.scan().count() == 5
    assert idx.scan().count() == n_idx


def test_vframe_probe_plan_is_broadcast_not_corpus_rehash(
        spark, tmp_warehouse):
    """Plan gate (the test_plans.py discipline applied to the new
    index family): the frame-set probe must reach the index through a
    BROADCAST of the batch's hashes — map-side, column-pruned — with
    no cartesian or nested-loop join anywhere, and the index-side
    ReadSchema pruned to (id, fhash)."""
    from iceberg_lakehouse_spark.catalog import LakehouseCatalog
    from iceberg_lakehouse_spark.operators import media_index as mi

    cat = LakehouseCatalog(spark, tmp_warehouse)
    corpus = _media_rows(spark, [
        (i, _clip(f"a{i}", f"b{i}"), "video", "ppmv", 0)
        for i in range(6)])
    idx = mi.build_vframe_index(cat, "default.vfp", corpus)
    batch = _media_rows(spark, [(100, _clip("a1"), "video", "ppmv", 0)])
    plan = (mi.probe_vframe_index(idx, batch)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_vframe_build_casts_id_like_extend_and_probe(
        spark, tmp_warehouse):
    """build_vframe_index must apply the same .cast("long") to
    media_id that extend/probe do (r11 ADVICE): an INT media_id
    column builds a long-typed index and the round-trip probe works."""
    from pyspark.sql import functions as F

    from iceberg_lakehouse_spark.catalog import LakehouseCatalog
    from iceberg_lakehouse_spark.operators import media_index as mi

    cat = LakehouseCatalog(spark, tmp_warehouse)
    corpus = _media_rows(spark, [
        (1, _clip("x1", "x2"), "video", "ppmv", 0),
    ]).withColumn("media_id", F.col("media_id").cast("int"))
    idx = mi.build_vframe_index(cat, "default.vf_int", corpus,
                                threshold=0.5)
    assert [f.dataType.simpleString() for f in idx.scan().schema.fields
            if f.name == "id"] == ["bigint"]
    batch = _media_rows(spark, [
        (101, _clip("x1"), "video", "ppmv", 0),
    ]).withColumn("media_id", F.col("media_id").cast("int"))
    pairs = {(r["left_id"], r["right_id"])
             for r in mi.probe_vframe_index(idx, batch).collect()}
    assert (1, 101) in pairs


def test_pair_budget_binds_loudly(spark):
    """r11 VERDICT #2: the perceptual pair surfaces carry an
    evidence-ranked max_pairs budget — when it binds, EXACTLY
    max_pairs rows come back, every row says pair_truncated=True,
    and the kept pairs are the (hamming, left_id, right_id)-smallest
    of the full result; when it doesn't bind, the flag is False and
    the pair set is unchanged."""
    from pyspark.sql import functions as F

    from iceberg_lakehouse_spark.functions.multimodal import (
        media_near_dup_pairs,
    )

    # one planted group of 40 re-encode variants → C(40,2) = 780 pairs
    corpus = _media_rows(spark, [
        (i, _img("budget", bump_cell=(i % 7)), "image", "ppm", 0)
        for i in range(40)
    ])
    full = media_near_dup_pairs(corpus, max_distance=6).collect()
    assert len(full) > 100
    expected_top = {
        (r["left_id"], r["right_id"])
        for r in sorted(
            full,
            key=lambda r: (r["hamming"], r["left_id"], r["right_id"])
        )[:100]
    }
    capped = media_near_dup_pairs(
        corpus, max_distance=6, max_pairs=100).collect()
    assert len(capped) == 100
    assert all(r["pair_truncated"] for r in capped)
    assert {(r["left_id"], r["right_id"]) for r in capped} == expected_top

    uncapped = media_near_dup_pairs(
        corpus, max_distance=6, max_pairs=10_000).collect()
    assert len(uncapped) == len(full)
    assert not any(r["pair_truncated"] for r in uncapped)

    import pytest as _pt
    with _pt.raises(ValueError, match="max_pairs"):
        media_near_dup_pairs(corpus, max_pairs=0).collect()


def test_pair_budget_exact_boundary_untruncated(spark):
    """r12 review follow-up: when the full pair count EQUALS
    max_pairs, the budget returns all of them with
    pair_truncated=False — 'exactly max_pairs rows' alone does not
    imply truncation (the sentinel row, not the width, is the
    signal)."""
    from iceberg_lakehouse_spark.functions.multimodal import (
        media_near_dup_pairs,
    )

    corpus = _media_rows(spark, [
        (i, _img("edge", bump_cell=(i % 5)), "image", "ppm", 0)
        for i in range(6)
    ])
    total = media_near_dup_pairs(corpus, max_distance=6).count()
    assert total > 0
    rows = media_near_dup_pairs(
        corpus, max_distance=6, max_pairs=int(total)).collect()
    assert len(rows) == total
    assert not any(r["pair_truncated"] for r in rows)


def test_pair_budget_large_stays_distributed(spark, monkeypatch):
    """r13 ADVICE: max_pairs is caller-controlled — budgets above the
    collect cap must keep the bounded slice on executors (the
    localCheckpoint path), never collect it to the driver, and return
    the same evidence-ranked pair set with the same truncation flag
    semantics as the collect path."""
    from iceberg_lakehouse_spark.functions import multimodal as mmod

    corpus = _media_rows(spark, [
        (i, _img("dist", bump_cell=(i % 7)), "image", "ppm", 0)
        for i in range(40)
    ])
    full = mmod.media_near_dup_pairs(corpus, max_distance=6).collect()
    expected_top = {
        (r["left_id"], r["right_id"])
        for r in sorted(
            full,
            key=lambda r: (r["hamming"], r["left_id"], r["right_id"])
        )[:100]
    }
    calls = {"n": 0}
    orig = mmod.DataFrame.collect

    def counting_collect(self):
        calls["n"] += 1
        return orig(self)

    # force every budget through the distributed branch and assert the
    # pair pipeline itself never routes through DataFrame.collect
    monkeypatch.setattr(mmod, "_BUDGET_COLLECT_CAP", 0)
    monkeypatch.setattr(mmod.DataFrame, "collect", counting_collect)
    capped = mmod.media_near_dup_pairs(
        corpus, max_distance=6, max_pairs=100)
    assert calls["n"] == 0  # construction collected nothing
    rows = orig(capped)
    assert len(rows) == 100
    assert all(r["pair_truncated"] for r in rows)
    assert {(r["left_id"], r["right_id"]) for r in rows} == expected_top

    # untruncated boundary on the distributed path
    uncapped = orig(mmod.media_near_dup_pairs(
        corpus, max_distance=6, max_pairs=10_000))
    assert len(uncapped) == len(full)
    assert not any(r["pair_truncated"] for r in uncapped)
    assert calls["n"] == 0


def test_curate_multimodal_stream_two_batches(spark, tmp_path,
                                              tmp_warehouse):
    """r12 VERDICT #3: the composed streaming curation sink — one
    mixed stream, four lanes running the SAME factored landing bodies
    as the standalone sinks, one curated table, cross-lane accounting,
    index-ahead cross-batch dedup, and fresh-checkpoint replay
    idempotence (curated membership, accounting, and indexes all
    stable)."""
    import pytest

    from iceberg_lakehouse_spark.catalog import LakehouseCatalog
    from iceberg_lakehouse_spark.operators import dedup_index as di
    from iceberg_lakehouse_spark.operators import media_index as mi
    from iceberg_lakehouse_spark.operators.curation import (
        CURATED_SCHEMA,
        CURATION_ACCOUNTING_SCHEMA,
    )
    from iceberg_lakehouse_spark.streaming.sink import (
        curate_multimodal_stream_to_table,
    )

    cat = LakehouseCatalog(spark, tmp_warehouse)
    t = cat.create_table("curated_mm", CURATED_SCHEMA)
    acct = cat.create_table("curated_acct", CURATION_ACCOUNTING_SCHEMA)
    sgrams = di.build_span_index(
        cat, "default.sgrams",
        spark.createDataFrame([], "doc_id long, text string"),
        "doc_id", "text", n=3)
    img_idx = mi.build_phash_index(
        cat, "default.imgidx",
        spark.createDataFrame([], mm.MEDIA_SCHEMA), max_distance=4)
    aud_idx = mi.build_phash_index(
        cat, "default.audidx",
        fps=spark.createDataFrame([], "media_id long, phash string"),
        algo="audio_gradient", max_distance=4)
    vid_idx = mi.build_vframe_index(
        cat, "default.vididx",
        spark.createDataFrame([], mm.MEDIA_SCHEMA), threshold=0.5)

    ramp = list(range(0, 500, 2))
    alt = [1000 if i % 2 else 10 for i in range(250)]
    rows1 = [
        ("text", 1, "a b c d e f g h", None, "text"),
        ("text", 2, "a b c x y z w q", None, "text"),  # span cut
        ("image", 10, None, _img("pair"), "ppm"),
        ("image", 11, None, _img("pair", bump_cell=8), "ppm"),  # dup
        ("audio", 20, None, _wav(ramp), "wav"),
        ("audio", 21, None, _wav([s * 2 for s in ramp]), "wav"),  # gain dup
        ("video", 30, None, _clip("p1", "p2", "p3"), "ppmv"),
        ("video", 31, None, _clip("p2", "p3"), "ppmv"),  # trim dup
    ]
    unified = ("modality string, item_id long, text string, "
               "content binary, format string")
    src = tmp_path / "mixed"
    src.mkdir()
    spark.createDataFrame(
        [(m, i, tx, c, f) for m, i, tx, c, f in rows1], unified
    ).select("modality", "item_id", "text", "content", "format") \
        .write.parquet(str(src / "b1"))
    ck = str(tmp_path / "ck")

    # wiring validations (against a real source path)
    with pytest.raises(ValueError, match="at least one"):
        curate_multimodal_stream_to_table(
            spark.readStream.schema(CURATED_SCHEMA).parquet(
                str(src) + "/*"), t)
    with pytest.raises(ValueError, match="come together"):
        curate_multimodal_stream_to_table(
            spark.readStream.schema(CURATED_SCHEMA).parquet(
                str(src) + "/*"), t, span_index=sgrams,
            model_registry="default.m")

    def run(checkpoint):
        q = curate_multimodal_stream_to_table(
            spark.readStream.schema(CURATED_SCHEMA).parquet(
                str(src) + "/*"),
            t, span_index=sgrams, image_index=img_idx,
            audio_index=aud_idx, video_index=vid_idx,
            accounting=acct, checkpoint_dir=checkpoint,
            available_now=True)
        q.awaitTermination(300)

    run(ck)
    landed = {(r["modality"], r["item_id"]) for r in t.scan().collect()}
    assert landed == {("text", 1), ("text", 2), ("image", 10),
                      ("audio", 20), ("video", 30)}, sorted(landed)
    by_id = {(r["modality"], r["item_id"]): r for r in t.scan().collect()}
    assert by_id[("text", 1)]["text"] == "a b c d e f g h"
    assert by_id[("text", 2)]["text"] == "x y z w q"  # span cut landed
    assert by_id[("text", 1)]["content"] is None
    assert by_id[("image", 10)]["content"] is not None
    assert by_id[("image", 10)]["text"] is None
    a1 = {(r["batch_id"], r["modality"]): (r["arrived"], r["landed"])
          for r in acct.scan().collect()}
    assert a1 == {(0, "text"): (2, 2), (0, "image"): (2, 1),
                  (0, "audio"): (2, 1), (0, "video"): (2, 1)}, a1

    # batch 2 (same checkpoint lineage): cross-batch dedup via the
    # extended indexes; novel items land
    rows2 = [
        ("text", 3, "x y z n m o p r", None, "text"),  # 'x y z' indexed
        ("image", 12, None, _img("pair", bump_cell=3), "ppm"),  # dup of 10
        ("image", 13, None, _img("novel"), "ppm"),
        ("audio", 22, None, _wav([s * 4 for s in ramp]), "wav"),  # dup
        ("audio", 23, None, _wav(alt), "wav"),
        ("video", 32, None, _clip("p1", "p2"), "ppmv"),  # trim of 30
        ("video", 33, None, _clip("w1", "w2"), "ppmv"),
    ]
    spark.createDataFrame(rows2, unified).write.parquet(str(src / "b2"))
    run(ck)
    landed2 = {(r["modality"], r["item_id"]) for r in t.scan().collect()}
    assert landed2 == landed | {("text", 3), ("image", 13),
                                ("audio", 23), ("video", 33)}, \
        sorted(landed2)
    by_id2 = {(r["modality"], r["item_id"]): r
              for r in t.scan().collect()}
    assert by_id2[("text", 3)]["text"] == "n m o p r"  # indexed grams cut
    a2 = {(r["batch_id"], r["modality"]): (r["arrived"], r["landed"])
          for r in acct.scan().collect()}
    assert a2[(1, "text")] == (1, 1)
    assert a2[(1, "image")] == (2, 1)
    assert a2[(1, "audio")] == (2, 1)
    assert a2[(1, "video")] == (2, 1)

    # at-least-once replay: a FRESH checkpoint re-processes every file
    # as batch 0 — curated membership, accounting, and all four
    # indexes must not move
    n_idx = (sgrams.scan().count(), img_idx.scan().count(),
             aud_idx.scan().count(), vid_idx.scan().count())
    run(str(tmp_path / "ck_replay"))
    assert {(r["modality"], r["item_id"])
            for r in t.scan().collect()} == landed2
    assert {(r["batch_id"], r["modality"]): (r["arrived"], r["landed"])
            for r in acct.scan().collect()} == a2
    assert (sgrams.scan().count(), img_idx.scan().count(),
            aud_idx.scan().count(), vid_idx.scan().count()) == n_idx

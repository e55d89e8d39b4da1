"""Baseline-JPEG decoder tests (VERDICT r6 missing #2).

The container has no Pillow and no JPEG library, so the tests carry a
minimal baseline SOF0 *encoder*: float FDCT (the decoder's orthonormal
basis transposed), all-ones or uniform quant tables, and canonical
Huffman tables built from the symbols actually emitted (all at code
length 9 — the decoder reads whatever DHT declares, so no Annex K
transcription is needed). Roundtrip error with unit quantizers is
bounded by coefficient rounding (±0.5 per coefficient) plus color
conversion rounding → a few counts per pixel, asserted tightly.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from iceberg_lakehouse_spark.functions.jpeg import _DCT_M, _ZIGZAG, parse_jpeg


# ---------------------------------------------------------------- encoder

def _rgb_to_ycbcr(rgb: np.ndarray) -> list[np.ndarray]:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    return [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
    ]


def _downsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Box-average by (fy, fx), edge-padding to full boxes first."""
    if fy == 1 and fx == 1:
        return plane
    h, w = plane.shape
    ph, pw = -(-h // fy) * fy, -(-w // fx) * fx
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))


def _pad_to(plane: np.ndarray, th: int, tw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, th - h), (0, tw - w)), mode="edge")


def _block_tokens(block: np.ndarray, q: np.ndarray, pred: int):
    """FDCT + quantize one 8×8 block → (tokens, new DC pred); tokens
    are ('d', dc_size, dc_bits) then ('a', runsize, bits) items."""
    coeffs = _DCT_M @ (block - 128.0) @ _DCT_M.T
    zz = np.rint(coeffs.reshape(64)[_ZIGZAG] / q).astype(np.int64)
    tokens = []

    def _mag(v: int) -> tuple[int, int]:
        t = int(abs(v)).bit_length()
        return t, (v if v >= 0 else v + (1 << t) - 1)

    t, bits = _mag(int(zz[0]) - pred)
    tokens.append(("d", t, bits))
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            tokens.append(("a", 0xF0, 0))  # ZRL
            run -= 16
        t, bits = _mag(v)
        tokens.append(("a", (run << 4) | t, bits))
        run = 0
    if run:
        tokens.append(("a", 0x00, 0))  # EOB
    return tokens, int(zz[0])


class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int):
        for i in reversed(range(length)):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self) -> bytes:
        while self.n:
            self.put(1, 1)  # spec pads with 1-bits
        return bytes(self.out)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dht(tc: int, th: int, syms: list[int]) -> tuple[bytes, dict]:
    """Canonical table with every symbol at code length 9 (≤256 syms →
    the all-ones code is never assigned). Returns (segment, sym→code)."""
    syms = sorted(set(syms))
    assert len(syms) <= 256
    counts = [0] * 16
    counts[8] = len(syms)  # length 9
    payload = bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms)
    return _seg(0xC4, payload), {s: (i, 9) for i, s in enumerate(syms)}


def _jpeg_bytes(
    img: np.ndarray,
    luma_samp: tuple[int, int] = (1, 1),
    dri: int = 0,
    quant: int = 1,
) -> bytes:
    """Minimal baseline JPEG encoder. ``img`` is h×w (grayscale) or
    h×w×3 (RGB uint8); ``luma_samp`` = (hs, vs) of the Y component
    ((2, 2) → 4:2:0, (2, 1) → 4:2:2); chroma is always (1, 1)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    hs, vs = (1, 1) if gray else luma_samp
    planes = (
        [img.astype(np.float64)]
        if gray
        else [
            p if i == 0 else _downsample(p, vs, hs)
            for i, p in enumerate(_rgb_to_ycbcr(img))
        ]
    )
    comps = [(1, hs, vs, 0)] + ([] if gray else [(2, 1, 1, 1), (3, 1, 1, 1)])
    mcux, mcuy = -(-w // (8 * hs)), -(-h // (8 * vs))
    padded = [
        _pad_to(p, mcuy * 8 * cvs, mcux * 8 * chs)
        for p, (_, chs, cvs, _) in zip(planes, comps)
    ]
    q = np.full(64, float(quant))

    # pass 1: tokens per restart interval
    n_mcu = mcux * mcuy
    per = dri if dri else n_mcu
    intervals, cur = [], []
    preds = [0] * len(comps)
    for m in range(n_mcu):
        if m and m % per == 0:
            intervals.append(cur)
            cur, preds = [], [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (_, chs, cvs, _) in enumerate(comps):
            for by in range(cvs):
                for bx in range(chs):
                    y0, x0 = (my * cvs + by) * 8, (mx * chs + bx) * 8
                    toks, preds[ci] = _block_tokens(
                        padded[ci][y0 : y0 + 8, x0 : x0 + 8], q, preds[ci]
                    )
                    cur.extend((ci, t) for t in toks)
    intervals.append(cur)

    # Huffman tables from the emitted symbols (luma=id 0, chroma=id 1)
    def _syms(kind: str, table_id: int) -> list[int]:
        out = [
            tok[1]
            for iv in intervals
            for ci, tok in iv
            if tok[0] == kind and (0 if ci == 0 else 1) == table_id
        ]
        return out or [0]

    segs, codes = b"", {}
    for tid in range(1 if gray else 2):
        s, c = _dht(0, tid, _syms("d", tid))
        segs += s
        codes[("d", tid)] = c
        s, c = _dht(1, tid, _syms("a", tid))
        segs += s
        codes[("a", tid)] = c

    # pass 2: serialize
    body = b""
    for i, iv in enumerate(intervals):
        if i:
            body += bytes([0xFF, 0xD0 + ((i - 1) % 8)])
        bw = _BitW()
        for ci, (kind, sym, _bits) in ((ci, t) for ci, t in iv):
            tid = 0 if ci == 0 else 1
            code, length = codes[(kind, tid)][sym]
            bw.put(code, length)
            nbits = sym if kind == "d" else sym & 0x0F
            if nbits:
                bw.put(_bits, nbits)
        body += bw.flush()

    dqt = _seg(0xDB, bytes([0x00]) + bytes([quant] * 64))
    if not gray:
        dqt += _seg(0xDB, bytes([0x01]) + bytes([quant] * 64))
    sof = _seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, len(comps))
        + b"".join(
            bytes([cid, (chs << 4) | cvs, tq])
            for cid, chs, cvs, tq in comps
        ),
    )
    sos = _seg(
        0xDA,
        bytes([len(comps)])
        + b"".join(
            bytes([cid, (tid << 4) | tid])
            for tid, cid in (
                [(0, 1)] if gray else [(0, 1), (1, 2), (1, 3)]
            )
        )
        + bytes([0, 63, 0]),
    )
    out = b"\xff\xd8" + dqt + sof + segs
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    return out + sos + body + b"\xff\xd9"


def _rt_err(img: np.ndarray, **kw) -> float:
    """Max abs roundtrip error; also asserts dims/channels."""
    data = _jpeg_bytes(img, **kw)
    h, w, nch, px = parse_jpeg(data)
    assert (h, w) == img.shape[:2]
    got = np.array(px, dtype=np.float64).reshape(h, w, 3)
    want = (
        np.repeat(img[..., None], 3, axis=2)
        if img.ndim == 2
        else img
    ).astype(np.float64)
    assert nch == (1 if img.ndim == 2 else 3)
    return float(np.max(np.abs(got - want)))


# ----------------------------------------------------------------- tests

def test_solid_color_rgb_exact():
    img = np.full((16, 16, 3), 0, np.uint8)
    img[...] = (200, 30, 90)
    assert _rt_err(img) <= 2.0


def test_gradient_non_multiple_of_8():
    """19×13 (MCU padding + crop) smooth gradient, 4:4:4."""
    y, x = np.mgrid[0:19, 0:13]
    img = np.stack(
        [(y * 9) % 256, (x * 17) % 256, ((y + x) * 5) % 256], axis=2
    ).astype(np.uint8)
    assert _rt_err(img) <= 4.0


def test_random_noise_bounded_error():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8).astype(np.uint8)
    assert _rt_err(img) <= 6.0  # worst case: 64 coeff roundings align


def test_grayscale_single_component():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (17, 9), dtype=np.uint8).astype(np.uint8)
    assert _rt_err(img) <= 3.0


def test_chroma_subsampling_420_and_422():
    """Chroma-constant image → subsampling is lossless; luma varies."""
    y, x = np.mgrid[0:20, 0:18]
    lum = ((y * 7 + x * 3) % 200 + 20).astype(np.float64)
    img = np.stack(
        [
            np.clip(np.rint(lum + 1.402 * 20), 0, 255),
            np.clip(np.rint(lum - 0.344136 * -30 - 0.714136 * 20), 0, 255),
            np.clip(np.rint(lum + 1.772 * -30), 0, 255),
        ],
        axis=2,
    ).astype(np.uint8)
    assert _rt_err(img, luma_samp=(2, 2)) <= 6.0  # 4:2:0
    assert _rt_err(img, luma_samp=(2, 1)) <= 6.0  # 4:2:2


def test_restart_intervals():
    y, x = np.mgrid[0:32, 0:24]
    img = np.stack(
        [(y * 11) % 256, (x * 7) % 256, (y + x) % 256], axis=2
    ).astype(np.uint8)
    assert _rt_err(img, dri=2) <= 4.0
    assert _rt_err(img, luma_samp=(2, 2), dri=1) <= 8.0


def test_uniform_quantizer_dequant():
    """quant=4: decoder must multiply coefficients back up."""
    y, x = np.mgrid[0:16, 0:16]
    img = np.stack([(y * 8) % 256] * 3, axis=2).astype(np.uint8)
    assert _rt_err(img, quant=4) <= 2 + 4 * 8  # DC step /2 · basis sum


def test_rejects_progressive_and_garbage():
    img = np.full((8, 8, 3), 128, np.uint8)
    data = bytearray(_jpeg_bytes(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # masquerade as progressive
    with pytest.raises(ValueError):
        parse_jpeg(bytes(data))
    with pytest.raises(ValueError):
        parse_jpeg(b"\xff\xd8truncated nonsense")
    with pytest.raises(ValueError):
        parse_jpeg(b"not a jpeg at all")


def test_decode_media_jpeg_real_path(spark):
    """End-to-end through the Arrow-batched mapInPandas tier: a real
    baseline JPEG decodes (dims + luminance features), a corrupt one
    yields the all-None row, and the deterministic fake is NOT used
    for either (fake dims derive from the hash, almost surely ≠ 20)."""
    from iceberg_lakehouse_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        _pool_features,
        decode_media,
    )

    y, x = np.mgrid[0:20, 0:20]
    img = np.stack(
        [(y * 12) % 256, (x * 12) % 256, ((y * x) // 2) % 256], axis=2
    ).astype(np.uint8)
    good = _jpeg_bytes(img)
    rows = [
        (1, good, "image", "jpg", len(good)),
        (2, good[:40], "image", "jpg", 40),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decode_media(df).collect()}
    assert (out[1]["height"], out[1]["width"], out[1]["n_channels"]) == (
        20, 20, 3,
    )
    _, _, _, px = parse_jpeg(good)
    want = _pool_features(px, 20, 20)
    got = out[1]["features"]
    assert max(abs(a - b) for a, b in zip(got, want)) < 1e-6
    assert out[2]["height"] is None and out[2]["features"] is None

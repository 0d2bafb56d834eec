"""Baseline JPEG codec tests (functions/jpegcodec.py): real DCT +
Huffman encode/decode with no PIL/libjpeg anywhere. The decoder is also
exercised on a HAND-ASSEMBLED 4:2:0 stream (not our encoder's output) so
subsampling/upsampling and the MCU interleave don't ride only on
self-consistency."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rtdl_spark.functions.jpegcodec import (
    AC_CHROMA,
    AC_LUMA,
    DC_CHROMA,
    DC_LUMA,
    QUANT_CHROMA,
    QUANT_LUMA,
    ZIGZAG,
    _BitWriter,
    _canonical_codes,
    _magnitude,
    make_jpeg,
    parse_jpeg,
)


def test_huffman_tables_are_consistent():
    """Annex-K BITS counts must match the symbol lists (a mismatch would
    silently skew every code) and the canonical assignment is prefix-free."""
    for bits, values in (DC_LUMA, DC_CHROMA, AC_LUMA, AC_CHROMA):
        assert sum(bits) == len(values)
        codes = _canonical_codes(bits, values)
        assert len(codes) == len(values)
        seen = set()
        for code, ln in codes.values():
            # prefix-freedom: no code is a prefix of a longer one
            for c2, l2 in codes.values():
                if l2 > ln:
                    assert (c2 >> (l2 - ln)) != code or (code, ln) == (
                        c2,
                        l2,
                    )
            assert (code, ln) not in seen
            seen.add((code, ln))


def test_constant_and_tiled_blocks_exact_at_q100():
    """quality=100 scales every quant entry to 1, so constant 8x8 blocks
    round-trip bit-exactly — including a 6-tile image whose distinct DCs
    walk the DC differential predictor."""
    img = bytes([77]) * (24 * 16)
    w, h, ch, px = parse_jpeg(make_jpeg(img, 24, 16, 1, quality=100))
    assert (w, h, ch) == (24, 16, 1)
    assert px == img

    a = np.zeros((16, 24), np.uint8)
    for t, v in enumerate([3, 250, 128, 17, 99, 201]):
        ty, tx = divmod(t, 3)
        a[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8] = v
    _, _, _, px = parse_jpeg(make_jpeg(a.tobytes(), 24, 16, 1, quality=100))
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(16, 24), a)


def test_gray_gradient_q100_near_lossless_and_deterministic():
    g = (np.arange(32 * 32, dtype=np.int64).reshape(32, 32) % 256).astype(
        np.uint8
    )
    j1 = make_jpeg(g.tobytes(), 32, 32, 1, quality=100)
    j2 = make_jpeg(g.tobytes(), 32, 32, 1, quality=100)
    assert j1 == j2  # encoder is deterministic
    _, _, _, px = parse_jpeg(j1)
    got = np.frombuffer(px, np.uint8).reshape(32, 32).astype(int)
    assert np.abs(got - g.astype(int)).max() <= 1


def test_rgb_roundtrip_tolerance_and_odd_dims():
    """Color path (YCbCr both ways) and non-multiple-of-8 dims (edge
    padding) — lossy as JPEG is, bounded as JPEG should be."""
    rng = np.random.RandomState(7)
    base = rng.randint(0, 64, (3, 4, 3))
    rgb = np.kron(base, np.ones((7, 9, 1))).astype(np.uint8) * 4
    h, w, _ = rgb.shape  # 21 x 36
    j = make_jpeg(rgb.tobytes(), w, h, 3, quality=95)
    w2, h2, ch, px = parse_jpeg(j)
    assert (w2, h2, ch) == (w, h, 3)
    got = np.frombuffer(px, np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(got - rgb.astype(int)).mean() < 4.0


def test_quality_knob_trades_bytes_for_error():
    g = (np.arange(64 * 64, dtype=np.int64).reshape(64, 64) * 7 % 256
         ).astype(np.uint8)
    sizes, errs = [], []
    for q in (20, 60, 95):
        j = make_jpeg(g.tobytes(), 64, 64, 1, quality=q)
        _, _, _, px = parse_jpeg(j)
        sizes.append(len(j))
        errs.append(
            np.abs(
                np.frombuffer(px, np.uint8).astype(int) - g.reshape(-1)
            ).mean()
        )
    assert sizes[0] < sizes[1] < sizes[2]
    assert errs[0] > errs[2]


def _emit_dc_only_block(bw, dc_diff, dc_codes, ac_codes):
    ssss, bits = _magnitude(dc_diff)
    code, ln = dc_codes[ssss]
    bw.put(code, ln)
    if ssss:
        bw.put(bits, ssss)
    c, ln = ac_codes[0x00]  # EOB
    bw.put(c, ln)


def test_hand_built_420_subsampled_stream_decodes():
    """A 16x16 4:2:0 color JPEG assembled BY HAND (luma 2x2 blocks per
    MCU + one Cb + one Cr, all DC-only): the decoder must interleave the
    MCU correctly and replicate chroma 2x. Constant YCbCr planes make the
    expected RGB exact up to the +-1 of the color transform rounding."""
    Y, CB, CR = 120, 90, 160
    dc_l = _canonical_codes(*DC_LUMA)
    ac_l = _canonical_codes(*AC_LUMA)
    dc_c = _canonical_codes(*DC_CHROMA)
    ac_c = _canonical_codes(*AC_CHROMA)
    bw = _BitWriter()
    # one MCU: 4 luma blocks (diffs Y*8-0 then 0,0,0), cb, cr
    _emit_dc_only_block(bw, (Y - 128) * 8, dc_l, ac_l)
    for _ in range(3):
        _emit_dc_only_block(bw, 0, dc_l, ac_l)
    _emit_dc_only_block(bw, (CB - 128) * 8, dc_c, ac_c)
    _emit_dc_only_block(bw, (CR - 128) * 8, dc_c, ac_c)
    scan = bw.flush()

    q1 = np.ones(64, dtype=np.uint8)
    out = bytearray(b"\xff\xd8")
    for ti in range(2):
        out += b"\xff\xdb" + struct.pack(">HB", 67, ti) + bytes(q1)
    comps = (
        struct.pack("BBB", 1, 0x22, 0)  # luma h=v=2
        + struct.pack("BBB", 2, 0x11, 1)
        + struct.pack("BBB", 3, 0x11, 1)
    )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 16, 16, 3) + comps
    for tc_th, (bits, values) in (
        (0x00, DC_LUMA), (0x10, AC_LUMA), (0x01, DC_CHROMA), (0x11, AC_CHROMA)
    ):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 3 + 16 + len(values), tc_th
        ) + bytes(bits) + bytes(values)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += struct.pack("BB", 1, 0x00) + struct.pack(
        "BB", 2, 0x11
    ) + struct.pack("BB", 3, 0x11) + b"\x00\x3f\x00"
    out += scan + b"\xff\xd9"

    w, h, ch, px = parse_jpeg(bytes(out))
    assert (w, h, ch) == (16, 16, 3)
    got = np.frombuffer(px, np.uint8).reshape(16, 16, 3).astype(float)
    # expected RGB from the JFIF inverse transform of constant YCbCr
    exp_r = Y + 1.402 * (CR - 128)
    exp_g = Y - 0.344136 * (CB - 128) - 0.714136 * (CR - 128)
    exp_b = Y + 1.772 * (CB - 128)
    for c, exp in enumerate((exp_r, exp_g, exp_b)):
        assert np.all(np.abs(got[:, :, c] - exp) <= 1.0)
    # every channel constant across the frame (upsampling is uniform)
    assert all(
        len(np.unique(got[:, :, c])) == 1 for c in range(3)
    )


def test_unsupported_features_rejected_by_name():
    base = make_jpeg(bytes(64), 8, 8, 1, quality=90)
    # corrupt SOF0 marker into SOF2 (progressive)
    prog = base.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive"):
        parse_jpeg(prog)
    arith = base.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(ValueError, match="arithmetic"):
        parse_jpeg(arith)
    with pytest.raises(ValueError, match="not a JPEG"):
        parse_jpeg(b"\x89PNG1234")


def test_annex_k_tables_shipped_verbatim():
    """Spot-pin the public tables so a typo can't silently change every
    file we write (values from ITU T.81 Annex K)."""
    assert QUANT_LUMA[0, 0] == 16 and QUANT_LUMA[7, 7] == 99
    assert QUANT_LUMA[4, 5] == 109 and QUANT_CHROMA[0, 0] == 17
    assert int(ZIGZAG[1]) == 1 and int(ZIGZAG[2]) == 8
    assert int(ZIGZAG[63]) == 63 and int(ZIGZAG[35]) == 56
    assert len(AC_LUMA[1]) == 162 and len(AC_CHROMA[1]) == 162


def test_lane_integration_resize_and_phash(spark):
    """codec='jpeg' through the Spark lanes: resize_media re-encodes at
    quality 100 (constant tiles exact) and perceptual_hash decodes for
    the integer ahash."""
    from rtdl_spark.operators.multimodal import perceptual_hash, resize_media

    def tile_img(seed: int) -> bytes:
        a = np.zeros((16, 16), np.uint8)
        a[:8, :8] = (seed * 5) % 256
        a[:8, 8:] = (seed * 11 + 3) % 256
        a[8:, :8] = (seed * 23 + 7) % 256
        a[8:, 8:] = (seed * 3 + 101) % 256
        return make_jpeg(a.tobytes(), 16, 16, 1, quality=100)

    df = spark.createDataFrame(
        [(i, bytearray(tile_img(i))) for i in range(8)],
        "doc_id long, payload binary",
    )
    resized = resize_media(df, 8, 8, codec="jpeg")
    rows = {
        r["doc_id"]: bytes(r["payload"]) for r in resized.collect()
    }
    w, h, ch, px = parse_jpeg(rows[3])
    assert (w, h, ch) == (8, 8, 1)
    # 16->8 nearest-neighbor of the 4-tile image = 4 expected 4x4 quads;
    # the resized frame is ONE 8x8 block with four values in it, so the
    # q100 re-encode is near-lossless (+-1), not bit-exact — exactness
    # needs block-aligned constant content (the oracle query's shape)
    a = np.frombuffer(px, np.uint8).reshape(8, 8).astype(int)
    for (ys, xs), exp in (
        ((slice(0, 4), slice(0, 4)), (3 * 5) % 256),
        ((slice(0, 4), slice(4, 8)), (3 * 11 + 3) % 256),
        ((slice(4, 8), slice(0, 4)), (3 * 23 + 7) % 256),
        ((slice(4, 8), slice(4, 8)), (3 * 3 + 101) % 256),
    ):
        assert np.all(np.abs(a[ys, xs] - exp) <= 1)

    hashed = perceptual_hash(df, codec="jpeg").collect()
    assert all(r["phash"] is not None for r in hashed)
    # determinism across runs
    again = perceptual_hash(df, codec="jpeg").collect()
    assert {r["doc_id"]: r["phash"] for r in hashed} == {
        r["doc_id"]: r["phash"] for r in again
    }

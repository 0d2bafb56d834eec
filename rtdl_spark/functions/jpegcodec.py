"""Pure-Python/numpy BASELINE JPEG codec (ITU T.81): encode + decode,
no PIL, no libjpeg.

This retires the last big compressed-codec plug point in the multimodal
lanes (WAV r3, PPM/BMP r4, PNG r5 — JPEG was "a library call away" until
now). Everything here is from the published standard: Annex K quantization
and Huffman tables, canonical Huffman code construction, zig-zag scan,
level-shifted 8×8 DCT-II, JFIF YCbCr. The decoder handles real-world
baseline files (multi-component, 4:2:0/4:2:2 subsampling via pixel
replication, restart markers, byte stuffing, ancillary APPn/COM skipping)
and rejects what it cannot honor BY NAME (progressive SOF2, arithmetic
coding, 12-bit precision) rather than decoding wrong.

Determinism discipline (how a LOSSY codec still gets an exact oracle):
at quality=100 every Annex-K table entry scales to 1, so a CONSTANT
8×8 block survives bit-exactly — DC = 8·(c−128) is an integer, AC = 0,
and the IDCT of a DC-only block is uniform c. A per-document
constant-gray JPEG therefore round-trips to EXACT pixels through the
full entropy-coded pipeline (marker grammar, Huffman, bit stuffing,
DCT), which is what `multimodal_image_jpeg_roundtrip` hash-verifies
against SQL. Non-constant content is lossy as JPEG always is; those
paths are pinned by tolerance + determinism tests instead.

Scale shape: this codec runs INSIDE the mapInPandas batch lanes
(operators/multimodal.py) — per-image work on executor workers, nothing
driver-side. DCT/IDCT and quantization are vectorized over all blocks of
an image with one einsum; only the entropy coding walks blocks in Python
(the same lane swaps in libjpeg-turbo via PIL, when an image ships it,
with zero plan changes).
"""

from __future__ import annotations

import struct

import numpy as np

# -- Annex K tables -----------------------------------------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# (BITS counts per code length 1..16, HUFFVAL symbol list) — T.81 K.3
DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II matrix (float64, deterministic)
_N = 8
_DCT = np.zeros((_N, _N))
for _k in range(_N):
    for _n in range(_N):
        _DCT[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / (2 * _N))
_DCT *= np.sqrt(2.0 / _N)
_DCT[0, :] *= np.sqrt(0.5)


def _scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 100 → every entry 1 (the lossless-for-
    constant-blocks regime the oracle query relies on)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (table * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 C.2: symbol → (code, length), codes assigned in order of
    increasing length then listing order."""
    if sum(bits) != len(values):
        raise ValueError("Huffman BITS/HUFFVAL mismatch")
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """value → (ssss category, additional bits per T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    ssss = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << ssss) - 1
    return ssss, bits


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane → (n_blocks, 8, 8) float64 with edge-replicated
    padding to 8-multiples; blocks in raster MCU order."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
    hh, ww = p.shape
    return (
        p.reshape(hh // 8, 8, ww // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _unblocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    """(n_blocks, 8, 8) → (h, w), dropping padding."""
    bh, bw = (h + 7) // 8, (w + 7) // 8
    full = (
        blocks.reshape(bh, bw, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(bh * 8, bw * 8)
    )
    return full[:h, :w]


def make_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    quality: int = 90,
) -> bytes:
    """Encode raw row-major pixel bytes (grayscale or RGB) as a baseline
    JFIF JPEG: 4:4:4 sampling, Annex-K tables scaled by ``quality``,
    standard Huffman tables, byte-stuffed entropy stream. Short input is
    zero-padded, long truncated."""
    if channels not in (1, 3):
        raise ValueError(f"JPEG encoder supports 1 or 3 channels, got {channels}")
    n = width * height * channels
    pix = pixels[:n] + bytes(max(n - len(pixels), 0))
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(height, width, channels)

    if channels == 1:
        planes = [arr[:, :, 0].astype(np.float64)]
    else:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [
            np.clip(np.rint(p), 0, 255) for p in (y, cb, cr)
        ]

    qtabs = [_scale_quant(QUANT_LUMA, quality)]
    if channels == 3:
        qtabs.append(_scale_quant(QUANT_CHROMA, quality))

    # vectorized forward DCT + quantization per plane
    coeffs = []
    for ci, plane in enumerate(planes):
        q = qtabs[0 if ci == 0 else 1].astype(np.float64)
        blocks = _blocks_of(plane) - 128.0
        dct = np.einsum("ij,bjk,lk->bil", _DCT, blocks, _DCT)
        # rint = IEEE round-half-even on the same doubles everywhere —
        # deterministic across runs and hosts
        coeffs.append(np.rint(dct / q).astype(np.int32))

    dc_tabs = [_canonical_codes(*DC_LUMA)]
    ac_tabs = [_canonical_codes(*AC_LUMA)]
    if channels == 3:
        dc_tabs.append(_canonical_codes(*DC_CHROMA))
        ac_tabs.append(_canonical_codes(*AC_CHROMA))

    bw = _BitWriter()
    pred = [0] * channels
    n_blocks = coeffs[0].shape[0]
    zz = ZIGZAG
    for bi in range(n_blocks):  # 4:4:4 → one block per component per MCU
        for ci in range(channels):
            ti = 0 if ci == 0 else 1
            dct, act = dc_tabs[ti], ac_tabs[ti]
            block = coeffs[ci][bi].reshape(64)[zz]
            dc = int(block[0])
            diff = dc - pred[ci]
            pred[ci] = dc
            ssss, bits = _magnitude(diff)
            code, length = dct[ssss]
            bw.put(code, length)
            if ssss:
                bw.put(bits, ssss)
            run = 0
            last_nz = int(np.max(np.nonzero(block)[0])) if np.any(block) else 0
            for k in range(1, 64):
                v = int(block[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = act[0xF0]  # ZRL
                    bw.put(c, ln)
                    run -= 16
                ssss, bits = _magnitude(v)
                c, ln = act[(run << 4) | ssss]
                bw.put(c, ln)
                bw.put(bits, ssss)
                run = 0
            if last_nz < 63:
                c, ln = act[0x00]  # EOB
                bw.put(c, ln)
    scan = bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H5sBBBHHBB", 16, b"JFIF\x00", 1, 1, 0, 1, 1, 0, 0
    )
    for ti, q in enumerate(qtabs):
        out += b"\xff\xdb" + struct.pack(">HB", 67, ti)
        out += bytes(int(v) for v in q.reshape(64)[ZIGZAG])
    comps = b"".join(
        struct.pack(
            "BBB", ci + 1, 0x11, 0 if ci == 0 else 1
        )
        for ci in range(channels)
    )
    out += b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * channels, 8, height, width, channels
    ) + comps
    huff = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if channels == 3:
        huff += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tc_th, (bits, values) in huff:
        out += b"\xff\xc4" + struct.pack(
            ">HB", 3 + 16 + len(values), tc_th
        ) + bytes(bits) + bytes(values)
    sos_comps = b"".join(
        struct.pack("BB", ci + 1, 0x00 if ci == 0 else 0x11)
        for ci in range(channels)
    )
    out += b"\xff\xda" + struct.pack(
        ">HB", 6 + 2 * channels, channels
    ) + sos_comps + b"\x00\x3f\x00"
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder ------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with byte-unstuffing; stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0xFF  # pad past end
                self.nbits += 8
                continue
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: consumed by align_restart
                else:
                    break  # real marker: segment over
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                self.acc = 0xFF
                self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Drop partial byte, consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("JPEG: expected restart marker, hit end of scan")


def _decode_tree(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol lookup for the decoder."""
    return {
        (ln, code): sym
        for sym, (code, ln) in _canonical_codes(bits, values).items()
    }


def _read_huff(br: _BitReader, tree: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = tree.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid Huffman code in scan")


def _extend(bits: int, ssss: int) -> int:
    if ssss == 0:
        return 0
    return bits if bits >= (1 << (ssss - 1)) else bits - (1 << ssss) + 1


def parse_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a BASELINE JPEG → (width, height, channels, row-major
    pixel bytes — grayscale for 1 component, RGB for 3). Handles 4:4:4 /
    4:2:2 / 4:2:0 (chroma upsampled by pixel replication), restart
    intervals, multi-segment DQT/DHT, and skips APPn/COM. Progressive
    (SOF2), arithmetic coding (SOF9+), 12-bit precision and 4-component
    (CMYK) scans are rejected by name — use a library build for those."""
    if data[:2] != b"\xff\xd8":
        raise ValueError(f"not a JPEG: magic {data[:2]!r}")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", data, pos)[0]
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq != 0:
                    raise ValueError("16-bit JPEG quant tables unsupported")
                tab = np.zeros(64, dtype=np.int32)
                tab[ZIGZAG] = np.frombuffer(
                    body[b + 1 : b + 65], dtype=np.uint8
                )
                qtabs[tq] = tab.reshape(8, 8)
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                values = list(body[b + 17 : b + 17 + nv])
                htabs[(tc, th)] = _decode_tree(bits, values)
                b += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = body[0]
            if precision != 8:
                raise ValueError(f"{precision}-bit JPEG unsupported (8 only)")
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            if nc not in (1, 3):
                raise ValueError(
                    f"{nc}-component JPEG unsupported (grayscale/YCbCr only)"
                )
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            kind = "progressive" if marker == 0xC2 else (
                "arithmetic-coded" if marker >= 0xC9 else "extended"
            )
            raise ValueError(
                f"{kind} JPEG (SOF{marker - 0xC0}) unsupported — baseline only"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = body[0]
            scan_sel = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                comp = next(
                    c for c in frame["comps"] if c["id"] == cs
                )
                scan_sel.append(
                    (comp, tdta >> 4, tdta & 0xF)
                )
            pixels = _decode_scan(
                data, pos + seglen, frame, scan_sel, qtabs, htabs,
                restart_interval,
            )
            return frame["w"], frame["h"], len(frame["comps"]), pixels
        pos += seglen
    raise ValueError("JPEG: no SOS scan found")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: dict,
    scan_sel: list,
    qtabs: dict,
    htabs: dict,
    restart_interval: int,
) -> bytes:
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    br = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    # per component: list of zigzag-order quantized blocks (filled in MCU
    # order), plus geometry for reassembly
    store = {
        c["id"]: np.zeros(
            (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32
        )
        for c in comps
    }
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                br.align_restart()
                pred = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for comp, td, ta in scan_sel:
                dct = htabs.get((0, td))
                act = htabs.get((1, ta))
                if dct is None or act is None:
                    raise ValueError("JPEG: scan references missing DHT")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        ssss = _read_huff(br, dct)
                        diff = _extend(br.receive(ssss), ssss)
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = _read_huff(br, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "JPEG: AC run past block end"
                                )
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        store[comp["id"]][
                            my * comp["v"] + by, mx * comp["h"] + bx
                        ] = zz

    # dequantize + batch IDCT per component, then upsample to full size
    planes = []
    for comp in comps:
        grid = store[comp["id"]]
        gy, gx, _ = grid.shape
        blocks = np.zeros((gy * gx, 8, 8), dtype=np.float64)
        flat = grid.reshape(-1, 64)
        deq = flat * qtabs[comp["tq"]].reshape(64)[ZIGZAG][None, :]
        blocks.reshape(-1, 64)[:, ZIGZAG] = deq
        idct = np.einsum("ji,bjk,kl->bil", _DCT, blocks, _DCT)
        plane = _unblocks(
            idct.reshape(gy, gx, 8, 8)
            .reshape(-1, 8, 8),
            gy * 8,
            gx * 8,
        ) + 128.0
        # component raster covers ceil(w*h_i/hmax) — crop, then replicate
        cw = (w * comp["h"] + hmax - 1) // hmax
        ch = (h * comp["v"] + vmax - 1) // vmax
        plane = plane[:ch, :cw]
        if comp["h"] != hmax or comp["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // comp["v"], axis=0),
                hmax // comp["h"],
                axis=1,
            )[:h, :w]
        else:
            plane = plane[:h, :w]
        planes.append(plane)

    if len(planes) == 1:
        out = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return out.tobytes()
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.rint(p), 0, 255) for p in (r, g, b)], axis=-1
    ).astype(np.uint8)
    return rgb.tobytes()

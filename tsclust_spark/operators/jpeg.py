"""Dependency-free baseline JPEG (ITU-T T.81) encoder + decoder.

The container ships no PIL/opencv/libjpeg, so the engine's multimodal
column could previously only fake-decode JPEG payloads.  This module
implements the baseline sequential DCT process from the public spec
(ITU-T Recommendation T.81, 1992) with numpy + stdlib only:

- encoder: level shift, 8x8 forward DCT (orthonormal matrix form),
  Annex-K quantization tables scaled by the libjpeg quality formula,
  zigzag, canonical Huffman coding with the Annex-K typical tables,
  byte stuffing; grayscale or 4:4:4 YCbCr color.
- decoder: full marker parse (DQT 8/16-bit, SOF0, DHT, DRI/RSTn, SOS),
  canonical Huffman decode, dequant, inverse zigzag, IDCT, chroma
  upsampling for 4:4:4 / 4:2:2 / 4:2:0, YCbCr->RGB.

Scope: baseline sequential (SOF0/1) and progressive (SOF2, spectral
selection + successive approximation per T.81 Annex G, incl. EOBRUN
and AC refinement) 8-bit decode; arithmetic coding, hierarchical and
lossless modes raise ``NotImplementedError`` (the same explicit
contract the PNG decoder uses for interlace).  A progressive ENCODER
(``encode_jpeg_progressive``, grayscale + 4:4:4 color, configurable
scan script) exists so the progressive decode path is round-trip
testable without any external JPEG library.

The entropy-coded walk is per-symbol Python (inherent to Huffman); the
DCT/dequant/color math is vectorized numpy per block batch.  This is a
correctness surface for the multimodal plumbing, not a hot path — the
hot path remains the Spark-side batching around it.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K — public spec tables)
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1/K.2 example quantization tables (luminance, chrominance)
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: FDCT = T @ B @ T.T, IDCT = T.T @ F @ T
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _T[_k, _n] = np.sqrt((1 if _k == 0 else 2) / 8.0) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16.0
        )


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling (public formula): 1..100 -> table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    qt = (base * scale + 50) // 100
    return np.clip(qt, 1, 255)


# ---------------------------------------------------------------------------
# canonical Huffman code construction (T.81 Annex C)
# ---------------------------------------------------------------------------

def _build_codes(bits, vals):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} canonical codes."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits, vals):
    """(BITS, HUFFVAL) -> {(length, code): symbol}."""
    return {
        (length, code): sym
        for sym, (code, length) in _build_codes(bits, vals).items()
    }


def _category(v: int) -> int:
    """Magnitude category (number of amplitude bits) of a coefficient."""
    return int(abs(v)).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    """Entropy-coded-segment reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        p = self.pos
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1]
            if nxt == 0x00:
                self.pos = p + 2
            else:
                raise _MarkerHit(0xFF00 | nxt)
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


class _MarkerHit(Exception):
    def __init__(self, marker):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit amplitude to signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane -> (H/8*W/8, 8, 8) DCT coefficient blocks."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    ).reshape(-1, 8, 8)
    return np.einsum("ij,bjk,lk->bil", _T, blocks, _T)


def _encode_plane(
    writer: _BitWriter,
    coeffs: np.ndarray,
    qt: np.ndarray,
    dc_codes,
    ac_codes,
    pred: int,
) -> int:
    """Huffman-encode quantized blocks of one plane (in raster block
    order); returns the updated DC predictor."""
    q = np.round(coeffs / qt[None, :, :]).astype(np.int64)
    zz = q.reshape(-1, 64)[:, ZIGZAG]
    for row in zz:
        dc = int(row[0])
        diff = dc - pred
        pred = dc
        t = _category(diff)
        code, length = dc_codes[t]
        writer.write(code, length)
        if t:
            writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        nz = np.nonzero(row[1:])[0]
        last = nz[-1] + 1 if nz.size else 0
        for k in range(1, last + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            t = _category(v)
            code, length = ac_codes[(run << 4) | t]
            writer.write(code, length)
            writer.write(v if v >= 0 else v + (1 << t) - 1, t)
            run = 0
        if last < 63:
            code, length = ac_codes[0x00]  # EOB
            writer.write(code, length)
    return pred


def _pad_to_8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _box_downsample(plane: np.ndarray, sx: int, sy: int) -> np.ndarray:
    """Mean-pool by (sy, sx) with edge padding to a full multiple."""
    if sx == 1 and sy == 1:
        return plane
    h, w = plane.shape
    plane = np.pad(plane, ((0, (-h) % sy), (0, (-w) % sx)), mode="edge")
    h2, w2 = plane.shape
    return plane.reshape(h2 // sy, sy, w2 // sx, sx).mean(axis=(1, 3))


def encode_jpeg(
    pixels: np.ndarray, quality: int = 85, subsampling: str = "444"
) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 -> baseline JPEG
    bytes.  ``subsampling``: "444", "422" or "420" (color only)."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8:
        raise ValueError("pixels must be uint8")
    gray = px.ndim == 2
    h, w = px.shape[:2]
    qt_l = _scaled_qt(QT_LUMA, quality)
    qt_c = _scaled_qt(QT_CHROMA, quality)
    h1, v1 = (
        (1, 1)
        if gray
        else {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]
    )

    if gray:
        planes = [px.astype(np.float64) - 128.0]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [
            y - 128.0,
            _box_downsample(cb, h1, v1) - 128.0,
            _box_downsample(cr, h1, v1) - 128.0,
        ]

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">HH", marker, len(body) + 2))
        out.extend(body)

    def qt_body(tid: int, qt: np.ndarray) -> bytes:
        return bytes([tid]) + bytes(
            int(v) for v in qt.reshape(64)[ZIGZAG]
        )

    seg(0xFFDB, qt_body(0, qt_l))
    if not gray:
        seg(0xFFDB, qt_body(1, qt_c))

    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        hv = (h1 << 4) | v1 if cid == 1 else 0x11
        sof += bytes([cid, hv, 0 if cid == 1 else 1])
    seg(0xFFC0, sof)

    def dht_body(tclass: int, tid: int, bits, vals) -> bytes:
        return bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)

    seg(0xFFC4, dht_body(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    seg(0xFFC4, dht_body(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    if not gray:
        seg(0xFFC4, dht_body(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
        seg(0xFFC4, dht_body(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))

    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xFFDA, sos)

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    writer = _BitWriter()
    # interleaved MCUs: h1*v1 luma blocks + one block per chroma
    # component; the luma plane is padded to full MCUs, chroma to full
    # 8x8 blocks
    ph_l = ((h + 8 * v1 - 1) // (8 * v1)) * 8 * v1
    pw_l = ((w + 8 * h1 - 1) // (8 * h1)) * 8 * h1
    luma = np.pad(
        planes[0],
        ((0, ph_l - h), (0, pw_l - w)),
        mode="edge",
    )
    padded = [luma] + [_pad_to_8(p) for p in planes[1:]]
    # chroma planes must span the same MCU grid as luma
    n_mcx, n_mcy = pw_l // (8 * h1), ph_l // (8 * v1)
    for ci in range(1, ncomp):
        p = padded[ci]
        padded[ci] = np.pad(
            p,
            ((0, n_mcy * 8 - p.shape[0]), (0, n_mcx * 8 - p.shape[1])),
            mode="edge",
        )
    coeffs = [_fdct_blocks(p) for p in padded]
    bw = [p.shape[1] // 8 for p in padded]  # blocks per row, per plane
    preds = [0] * ncomp
    for my in range(n_mcy):
        for mx in range(n_mcx):
            for by in range(v1):
                for bx in range(h1):
                    i = (my * v1 + by) * bw[0] + (mx * h1 + bx)
                    preds[0] = _encode_plane(
                        writer, coeffs[0][i : i + 1], qt_l, dc_l, ac_l,
                        preds[0],
                    )
            for c in range(1, ncomp):
                i = my * bw[c] + mx
                preds[c] = _encode_plane(
                    writer, coeffs[c][i : i + 1], qt_c, dc_c, ac_c,
                    preds[c],
                )
    out.extend(writer.flush())
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode JPEG bytes -> uint8 (H, W) grayscale or (H, W, 3) RGB.

    Supports SOF0/1 (baseline/extended sequential) and SOF2
    (progressive: spectral selection + successive approximation, DC and
    AC first/refinement scans, EOBRUN — T.81 Annex G), 8-bit precision,
    1 or 3 components, subsampling up to 2x2 (4:4:4 / 4:2:2 / 4:2:0),
    DRI/RST restart intervals.  Arithmetic-coded / hierarchical /
    lossless / 12-bit raise ``NotImplementedError``.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart_interval = 0

    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq == 0:
                    tab = np.frombuffer(
                        body[p : p + 64], dtype=np.uint8
                    ).astype(np.int64)
                    p += 64
                else:
                    tab = np.frombuffer(
                        body[p : p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                qt = np.zeros(64, dtype=np.int64)
                qt[ZIGZAG] = tab
                qts[tq] = qt.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(body[p + 17 : p + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _build_decoder(
                    bits, vals
                )
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (sequential), SOF2
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {
                "h": h,
                "w": w,
                "comps": comps,
                "progressive": marker == 0xC2,
            }
            if marker == 0xC2:
                # per-component quantized-coefficient store (zigzag
                # order), MCU-padded so interleaved DC scans fit
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
                mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
                frame["coef"] = [
                    np.zeros(
                        (mcus_y * c["v"], mcus_x * c["h"], 64),
                        dtype=np.int64,
                    )
                    for c in comps
                ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} (unsupported process)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                ci, comp = next(
                    (j, c)
                    for j, c in enumerate(frame["comps"])
                    if c["id"] == cs
                )
                scan.append(
                    {
                        "comp": comp,
                        "ci": ci,
                        # progressive DC-refinement scans need no DC
                        # table; AC-only scans need no... resolve lazily
                        "td": tdta >> 4,
                        "ta": tdta & 0x0F,
                    }
                )
            data_pos = pos + seglen
            if not frame.get("progressive"):
                for s in scan:
                    s["dc"] = dc_tabs[s["td"]]
                    s["ac"] = ac_tabs[s["ta"]]
                return _decode_scan(
                    payload, data_pos, frame, scan, qts, restart_interval
                )
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            for s in scan:
                s["dc"] = dc_tabs.get(s["td"]) if ss == 0 else None
                s["ac"] = ac_tabs.get(s["ta"]) if se > 0 else None
            pos = _decode_progressive_scan(
                payload, data_pos, frame, scan, ss, se, ah, al,
                restart_interval,
            )
            # skip to the next true marker (entropy bytes may contain
            # stuffed 0xFF00, which the outer loop must not parse)
            while pos < len(payload) - 1 and not (
                payload[pos] == 0xFF and payload[pos + 1] != 0x00
            ):
                pos += 1
            continue
        pos += seglen
    if frame is not None and frame.get("progressive"):
        return _progressive_reconstruct(frame, qts)
    raise ValueError("no SOS marker found")


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _decode_block(reader: _BitReader, dc_tab, ac_tab, pred: int):
    zz = np.zeros(64, dtype=np.int64)
    t = _huff_decode(reader, dc_tab)
    diff = _extend(reader.receive(t), t) if t else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.receive(s), s)
        k += 1
    return zz, pred


def _decode_scan(data, pos, frame, scan, qts, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors > 2 unsupported")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    planes = []
    for s in scan:
        c = s["comp"]
        pw = mcus_x * c["h"] * 8
        ph = mcus_y * c["v"] * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))

    reader = _BitReader(data, pos)
    preds = [0] * len(scan)
    n_mcu = mcus_x * mcus_y
    mcu = 0
    try:
        while mcu < n_mcu:
            if restart_interval and mcu and mcu % restart_interval == 0:
                # expect RSTn: byte-align and consume the marker
                reader.align()
                p = reader.pos
                while data[p] == 0xFF and data[p + 1] == 0xFF:
                    p += 1
                if data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7:
                    reader.pos = p + 2
                preds = [0] * len(scan)
            my, mx = divmod(mcu, mcus_x)
            for si, s in enumerate(scan):
                c = s["comp"]
                qt = qts[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz, preds[si] = _decode_block(
                            reader, s["dc"], s["ac"], preds[si]
                        )
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = zz * qt.reshape(64)[ZIGZAG]
                        blk = blk.reshape(8, 8)
                        pix = _T.T @ blk @ _T
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[si][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu += 1
    except _MarkerHit:
        if mcu < n_mcu:
            raise ValueError("entropy data ended early") from None

    out_planes = []
    for s, plane in zip(scan, planes):
        c = s["comp"]
        plane = plane + 128.0
        sx, sy = hmax // c["h"], vmax // c["v"]
        if sx > 1 or sy > 1:
            plane = np.repeat(np.repeat(plane, sy, axis=0), sx, axis=1)
        out_planes.append(plane[:h, :w])

    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive mode (T.81 Annex G) — decoder
# ---------------------------------------------------------------------------

def _comp_block_grid(frame, c):
    """(blocks_high, blocks_wide) of a component's OWN sampling grid
    (T.81 A.1.1: ceil of the scaled dimensions) — the block order of
    non-interleaved scans."""
    hmax = max(x["h"] for x in frame["comps"])
    vmax = max(x["v"] for x in frame["comps"])
    cw = (frame["w"] * c["h"] + hmax - 1) // hmax
    ch = (frame["h"] * c["v"] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _refine_nonzero(reader, zz, k, se, p1):
    """EOB-region AC refinement: one correction bit per already-nonzero
    coefficient in [k, se] (G.1.2.3)."""
    while k <= se:
        if zz[k] != 0 and reader.read_bit():
            if not (abs(int(zz[k])) & p1):
                zz[k] += p1 if zz[k] > 0 else -p1
        k += 1


def _decode_ac_first(reader, ac_tab, zz, ss, se, al, eobrun):
    """AC first scan for one block (G.1.2.2); returns updated EOBRUN."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) + (reader.receive(r) if r else 0)
            return eobrun - 1
        k += r
        if k > se:
            raise ValueError("AC run past spectral band")
        zz[k] = _extend(reader.receive(s), s) << al
        k += 1
    return 0


def _decode_ac_refine(reader, ac_tab, zz, ss, se, al, eobrun):
    """AC refinement scan for one block (G.1.2.3); returns EOBRUN."""
    p1 = 1 << al
    if eobrun > 0:
        _refine_nonzero(reader, zz, ss, se, p1)
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        val = 0
        if s == 0:
            if r < 15:
                eobrun = (1 << r) + (reader.receive(r) if r else 0)
                break
            # r == 15: ZRL — pass 16 zero-history coefficients
        else:
            # per G.1.2.3 s must be 1 in a refinement scan
            val = p1 if reader.read_bit() else -p1
        # advance: refine nonzeros en route, counting zero-history
        # positions against r; land on the (r+1)-th zero-history one
        while k <= se:
            if zz[k] != 0:
                if reader.read_bit():
                    if not (abs(int(zz[k])) & p1):
                        zz[k] += p1 if zz[k] > 0 else -p1
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if val and k <= se:
            zz[k] = val
        k += 1
    if eobrun > 0:
        _refine_nonzero(reader, zz, k, se, p1)
        return eobrun - 1
    return 0


def _decode_progressive_scan(
    data, pos, frame, scan, ss, se, ah, al, restart_interval
):
    """Decode one progressive scan into frame["coef"]; returns the
    byte position after the scan's entropy-coded segment."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    reader = _BitReader(data, pos)
    preds = [0] * len(scan)
    eobrun = 0
    unit = 0  # restart unit counter: MCUs (interleaved) or blocks

    def maybe_restart():
        nonlocal preds, eobrun
        reader.align()
        p = reader.pos
        while data[p] == 0xFF and data[p + 1] == 0xFF:
            p += 1
        if data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7:
            reader.pos = p + 2
        preds = [0] * len(scan)
        eobrun = 0

    def dc_block(si, zz):
        s = scan[si]
        if ah == 0:
            t = _huff_decode(reader, s["dc"])
            diff = _extend(reader.receive(t), t) if t else 0
            preds[si] += diff
            zz[0] = preds[si] << al
        else:
            if reader.read_bit():
                zz[0] |= 1 << al

    try:
        if ss == 0 and len(scan) > 1:
            # interleaved DC scan over MCUs
            for mcu in range(mcus_x * mcus_y):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    maybe_restart()
                my, mx = divmod(mcu, mcus_x)
                for si, s in enumerate(scan):
                    c = s["comp"]
                    coef = frame["coef"][s["ci"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            dc_block(
                                si,
                                coef[my * c["v"] + by, mx * c["h"] + bx],
                            )
        else:
            # non-interleaved: single component, its own block grid
            s = scan[0]
            c = s["comp"]
            coef = frame["coef"][s["ci"]]
            bh, bw = _comp_block_grid(frame, c)
            for blk in range(bh * bw):
                if restart_interval and blk and blk % restart_interval == 0:
                    maybe_restart()
                by, bx = divmod(blk, bw)
                zz = coef[by, bx]
                if ss == 0:
                    dc_block(0, zz)
                elif ah == 0:
                    eobrun = _decode_ac_first(
                        reader, s["ac"], zz, ss, se, al, eobrun
                    )
                else:
                    eobrun = _decode_ac_refine(
                        reader, s["ac"], zz, ss, se, al, eobrun
                    )
    except _MarkerHit:
        raise ValueError("progressive scan entropy data ended early")
    return reader.pos


def _progressive_reconstruct(frame, qts):
    """All scans consumed: dequantize + IDCT + assemble, mirroring the
    baseline tail (upsample per component, crop, YCbCr->RGB)."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out_planes = []
    for ci, c in enumerate(comps):
        coef = frame["coef"][ci]
        bh, bw = coef.shape[:2]
        qz = qts[c["tq"]].reshape(64)[ZIGZAG].astype(np.float64)
        deq = coef.astype(np.float64) * qz[None, None, :]
        nat = np.zeros_like(deq)
        nat[:, :, ZIGZAG] = deq
        blocks = nat.reshape(bh, bw, 8, 8)
        pix = np.einsum("ji,yxjk,kl->yxil", _T, blocks, _T)
        plane = (
            pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + 128.0
        )
        sx, sy = hmax // c["h"], vmax // c["v"]
        if sx > 1 or sy > 1:
            plane = np.repeat(np.repeat(plane, sy, axis=0), sx, axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive mode — encoder (fixture-grade, grayscale / 4:4:4 color)
# ---------------------------------------------------------------------------

def _emit_ac_first(writer, zz, ss, se, al, ac_codes):
    """AC first scan, one block (G.1.2.2 encoder; EOBRUN policy: a
    run never spans blocks — always the plain EOB symbol, valid if
    slightly less compressed)."""
    run = 0
    wrote_any = False
    last_nonzero = ss - 1
    mags = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        mag = abs(v) >> al
        mags.append(mag if v >= 0 else -mag)
        if mag:
            last_nonzero = k
    for k in range(ss, last_nonzero + 1):
        val = mags[k - ss]
        if val == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            writer.write(c, ln)
            run -= 16
        t = _category(val)
        c, ln = ac_codes[(run << 4) | t]
        writer.write(c, ln)
        writer.write(val if val >= 0 else val + (1 << t) - 1, t)
        run = 0
        wrote_any = True
    if last_nonzero < se:
        c, ln = ac_codes[0x00]  # EOB, run of exactly 1 block
        writer.write(c, ln)


def _emit_ac_refine(writer, zz, ss, se, al, ac_codes):
    """AC refinement scan, one block (G.1.2.3 encoder). Correction
    bits are emitted POSITIONALLY to mirror the decoder's walk: each
    ZRL/coded symbol is followed by exactly the correction bits of the
    already-nonzero coefficients the decoder passes while consuming
    that symbol's zero-history run."""
    p1 = 1 << al
    # classify the band: list of ('z' | ('p', bit) | ('n', sign))
    events = []
    for k in range(ss, se + 1):
        a = abs(int(zz[k]))
        if a >> (al + 1):
            events.append(("p", (a >> al) & 1))
        elif (a >> al) == 1:
            events.append(("n", 1 if zz[k] > 0 else 0))
        else:
            events.append(("z",))
    i = 0
    n = len(events)
    while i < n:
        # locate next newly-significant coefficient
        j = i
        zeros = 0
        while j < n and events[j][0] != "n":
            if events[j][0] == "z":
                zeros += 1
            j += 1
        if j == n:
            # trailing region: EOB (run 1) + correction bits for the
            # remaining previously-nonzero coefficients
            if i < n:
                c, ln = ac_codes[0x00]
                writer.write(c, ln)
                for ev in events[i:]:
                    if ev[0] == "p":
                        writer.write(ev[1], 1)
            return
        while zeros > 15:
            c, ln = ac_codes[0xF0]  # ZRL: decoder consumes 16 zeros
            writer.write(c, ln)
            zc = 0
            while zc < 16:
                ev = events[i]
                if ev[0] == "p":
                    writer.write(ev[1], 1)
                elif ev[0] == "z":
                    zc += 1
                i += 1
            zeros -= 16
        c, ln = ac_codes[(zeros << 4) | 1]
        writer.write(c, ln)
        writer.write(events[j][1], 1)  # sign bit read right after rs
        while i < j:  # correction bits consumed during the walk
            if events[i][0] == "p":
                writer.write(events[i][1], 1)
            i += 1
        i = j + 1


def encode_jpeg_progressive(
    pixels: np.ndarray,
    quality: int = 85,
    scans: list | None = None,
) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 -> progressive
    JPEG (SOF2) bytes. No subsampling (4:4:4) — the point is a
    spec-true multi-scan stream for round-trip tests, not rate
    control.

    ``scans``: list of ``(comp_indices, Ss, Se, Ah, Al)``. The default
    script exercises every progressive decode path: interleaved DC
    first (Al=1) -> DC refinement -> split-band AC first (Al=1) ->
    full-band AC refinement (Ah=1, Al=0).
    """
    px = np.asarray(pixels)
    if px.dtype != np.uint8:
        raise ValueError("pixels must be uint8")
    gray = px.ndim == 2
    h, w = px.shape[:2]
    ncomp = 1 if gray else 3
    qt_l = _scaled_qt(QT_LUMA, quality)
    qt_c = _scaled_qt(QT_CHROMA, quality)

    if gray:
        planes = [px.astype(np.float64) - 128.0]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b - 128.0,
            -0.168736 * r - 0.331264 * g + 0.5 * b,
            0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    padded = [_pad_to_8(p) for p in planes]
    bh, bw = padded[0].shape[0] // 8, padded[0].shape[1] // 8
    qts = [qt_l] + [qt_c] * (ncomp - 1)
    zzs = []
    for p, qt in zip(padded, qts):
        q = np.round(_fdct_blocks(p) / qt[None, :, :]).astype(np.int64)
        zzs.append(q.reshape(-1, 64)[:, ZIGZAG])

    if scans is None:
        scans = [(list(range(ncomp)), 0, 0, 0, 1),
                 (list(range(ncomp)), 0, 0, 1, 0)]
        for c in range(ncomp):
            scans += [([c], 1, 5, 0, 1), ([c], 6, 63, 0, 1)]
        for c in range(ncomp):
            scans += [([c], 1, 63, 1, 0)]

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">HH", marker, len(body) + 2))
        out.extend(body)

    seg(0xFFDB, bytes([0]) + bytes(int(v) for v in qt_l.reshape(64)[ZIGZAG]))
    if not gray:
        seg(0xFFDB, bytes([1]) + bytes(
            int(v) for v in qt_c.reshape(64)[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])
    seg(0xFFC2, sof)
    seg(0xFFC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    seg(0xFFC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    if not gray:
        seg(0xFFC4, bytes([0x01]) + bytes(DC_CHROMA_BITS)
            + bytes(DC_CHROMA_VALS))
        seg(0xFFC4, bytes([0x11]) + bytes(AC_CHROMA_BITS)
            + bytes(AC_CHROMA_VALS))

    dc_codes = [_build_codes(DC_LUMA_BITS, DC_LUMA_VALS)] + [
        _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ] * (ncomp - 1)
    ac_codes = [_build_codes(AC_LUMA_BITS, AC_LUMA_VALS)] + [
        _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    ] * (ncomp - 1)

    for comp_idx, ss, se, ah, al in scans:
        sos = bytes([len(comp_idx)])
        for c in comp_idx:
            t = 0 if c == 0 else 1  # luma tables for comp 0, chroma else
            sos += bytes([c + 1, (t << 4) | t])
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xFFDA, sos)
        writer = _BitWriter()
        if ss == 0:
            preds = [0] * ncomp
            for blk in range(bh * bw):
                for c in comp_idx:
                    zz = zzs[c][blk]
                    if ah == 0:
                        v = int(zz[0]) >> al
                        diff = v - preds[c]
                        preds[c] = v
                        t = _category(diff)
                        code, ln = dc_codes[c][t]
                        writer.write(code, ln)
                        if t:
                            writer.write(
                                diff if diff >= 0
                                else diff + (1 << t) - 1, t)
                    else:
                        writer.write((int(zz[0]) >> al) & 1, 1)
        else:
            c = comp_idx[0]
            for blk in range(bh * bw):
                if ah == 0:
                    _emit_ac_first(writer, zzs[c][blk], ss, se, al,
                                   ac_codes[c])
                else:
                    _emit_ac_refine(writer, zzs[c][blk], ss, se, al,
                                    ac_codes[c])
        out.extend(writer.flush())
    out.extend(b"\xff\xd9")
    return bytes(out)

"""Dependency-free AVI (RIFF) container parser for uncompressed video.

The video sibling of :mod:`operators/wav`: an AVI file is the same
RIFF container (nested LISTs: ``hdrl`` headers, ``movi`` frame
chunks), and the ``DIB``/raw codec stores frames as bottom-up BGR24
bitmaps — exactly the pixel layout the engine's BMP decoder already
handles. So uncompressed AVI decodes FOR REAL here: header parse,
frame chunk walk, per-frame pixel extraction to the same grayscale
luma the image path uses. Codec-compressed video (H.264/VP9/…) still
needs external codecs and stays behind the documented fake-decode
guard.

Spark surface: :func:`extract_frames` samples every Nth frame inside
ONE ``mapInPandas`` and emits a typed row per kept frame (index,
timestamp from the header's microseconds-per-frame, mean luma) — the
real twin of the plumbing-only ``sample_frames``.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def encode_avi(frames: np.ndarray, us_per_frame: int = 40000) -> bytes:
    """Minimal uncompressed AVI writer: frames is (n, h, w) uint8
    grayscale, stored as bottom-up BGR24 '00db' chunks."""
    n, h, w = frames.shape
    row_bytes = (w * 3 + 3) & ~3
    frame_bytes = row_bytes * h

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, frame_bytes, 0, 0x10, n, 0, 1, frame_bytes, w, h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, us_per_frame, 1_000_000, 0, n,
        frame_bytes, 0xFFFFFFFF, 0, 0, 0, int(w), int(h),
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(kind: bytes, body: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", 4 + len(body)) + kind + body

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)

    movi_body = b""
    pad = b"\x00" * (row_bytes - w * 3)
    for f in frames:
        rows = []
        for y in range(h - 1, -1, -1):  # bottom-up
            bgr = np.repeat(f[y], 3).astype(np.uint8).tobytes()  # gray->BGR
            rows.append(bgr + pad)
        movi_body += chunk(b"00db", b"".join(rows))
    movi = lst(b"movi", movi_body)

    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk(payload: bytes, pos: int, end: int):
    """Yield (tag, body_start, size) for chunks in [pos, end)."""
    while pos + 8 <= end:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(f"chunk {tag!r} overruns container")
        yield tag, body, size
        pos = body + size + (size & 1)


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse an uncompressed AVI to ``(frames, us_per_frame)`` where
    frames is (n, h, w) uint8 grayscale (integer ITU-R 601 luma, the
    same formula as the BMP/PNG/JPEG path).

    Raises ``ValueError`` for malformed containers and
    ``NotImplementedError`` for codec-compressed streams ('00dc'
    chunks or a non-DIB/raw handler) — distinct failures, routed
    differently by callers.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width = height = n_frames = None
    us_per_frame = 0
    handler = None
    frames_raw: list[bytes] = []

    def walk_list(pos: int, end: int):
        nonlocal width, height, n_frames, us_per_frame, handler
        for tag, body, size in _walk(payload, pos, end):
            if tag == b"LIST":
                kind = payload[body : body + 4]
                if kind in (b"hdrl", b"strl", b"movi"):
                    walk_list(body + 4, body + size)
            elif tag == b"avih" and size >= 40:
                (us_per_frame, _, _, _, n_frames) = struct.unpack_from(
                    "<IIIII", payload, body
                )
                width, height = struct.unpack_from("<II", payload, body + 32)
            elif tag == b"strh" and size >= 8:
                fcc_type, fcc_handler = struct.unpack_from("<4s4s", payload, body)
                if fcc_type == b"vids":
                    handler = fcc_handler
            elif tag == b"00dc":
                raise NotImplementedError(
                    "codec-compressed AVI stream needs external codecs; "
                    "only uncompressed DIB frames decode in this container"
                )
            elif tag == b"00db":
                frames_raw.append(payload[body : body + size])

    walk_list(12, len(payload))
    if width is None or not frames_raw:
        raise ValueError("missing avih header or frame chunks")
    if handler is not None and handler not in (b"DIB ", b"\x00\x00\x00\x00"):
        raise NotImplementedError(f"AVI codec {handler!r} unsupported")
    row_bytes = (width * 3 + 3) & ~3
    out = np.empty((len(frames_raw), height, width), dtype=np.uint8)
    for i, raw in enumerate(frames_raw):
        if len(raw) < row_bytes * height:
            raise ValueError(f"frame {i} truncated")
        grid = np.frombuffer(raw[: row_bytes * height], dtype=np.uint8).reshape(
            height, row_bytes
        )[::-1, : width * 3].reshape(height, width, 3)
        b32 = grid.astype(np.uint32)
        out[i] = (
            (114 * b32[:, :, 0] + 587 * b32[:, :, 1] + 299 * b32[:, :, 2]) // 1000
        ).astype(np.uint8)
    return out, us_per_frame


FRAME_FIELDS = [
    ("frame_idx", T.IntegerType()),
    ("ts_us", T.LongType()),
    ("mean_luma", T.DoubleType()),
]


def extract_frames(
    df: DataFrame,
    every_n: int = 2,
    payload_col: str = "payload",
    id_cols: tuple = ("doc_id",),
) -> DataFrame:
    """REAL frame sampling over uncompressed-AVI payloads: decode, keep
    frames 0, every_n, 2*every_n, ..., emit (id..., frame_idx, ts_us,
    mean_luma) — one mapInPandas, binary stays executor-side."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name in id_cols]
        + [T.StructField(n, t) for n, t in FRAME_FIELDS]
    )
    id_list = list(id_cols)

    def compute(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                frames, uspf = decode_avi(row[payload_col])
                for idx in range(0, frames.shape[0], every_n):
                    rows.append(
                        [row[c] for c in id_list]
                        + [int(idx), int(idx) * int(uspf),
                           float(frames[idx].mean())]
                    )
            yield pd.DataFrame(
                rows, columns=id_list + [n for n, _ in FRAME_FIELDS]
            )

    return df.select(*id_list, payload_col).mapInPandas(compute, out_schema)

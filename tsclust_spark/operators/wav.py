"""Dependency-free WAV (RIFF/PCM) codec + audio feature extraction.

Narrows the multimodal audio stub the same way round-3/4 narrowed
images (BMP/PNG/baseline-JPEG): uncompressed PCM WAV is a trivial
container — RIFF chunk walk, ``fmt `` header, ``data`` payload — so
this container decodes it FOR REAL with stdlib ``struct`` + numpy.
Compressed audio (MP3/AAC/…) still needs codec libraries that are not
in this sandbox and remains behind the documented fake-decode guard.

Supported: format tag 1 (integer PCM) at 8/16/32-bit depth, any
channel count and rate; chunk walking skips unknown chunks (LIST,
fact, …) including odd-size pad bytes per the RIFF spec.

The Spark surface (:func:`audio_features`) is the multimodal recipe:
payloads stay an opaque ``binary`` column, decode runs inside ONE
``mapInPandas`` (Arrow batches, no per-row Python UDF), and the
output is a flat typed feature row per clip.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers' convenience)
from pyspark.sql import types as T

_DEPTH_DTYPE = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal RIFF/PCM16 writer: mono or (n, channels) int16."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n_channels = s.shape[1]
    data = s.tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a PCM WAV payload to ``(samples, sample_rate)``.

    ``samples`` is int-typed ``(n_frames, n_channels)``. Raises
    ``ValueError`` on a malformed container and ``NotImplementedError``
    on compressed format tags — malformed and unsupported are different
    failures and callers route them differently.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt_fields = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_at = pos + 8
        if body_at + size > len(payload):
            raise ValueError(f"chunk {tag!r} overruns payload")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt_fields = struct.unpack_from("<HHIIHH", payload, body_at)
        elif tag == b"data":
            data = payload[body_at : body_at + size]
        pos = body_at + size + (size & 1)  # RIFF pads odd chunks
    if fmt_fields is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, n_channels, rate, _, _, depth = fmt_fields
    if audio_fmt != 1:
        raise NotImplementedError(
            f"WAV format tag {audio_fmt} (compressed) needs codec libs; "
            "only integer PCM decodes in this container"
        )
    if depth not in _DEPTH_DTYPE or n_channels < 1:
        raise ValueError(f"unsupported PCM depth {depth} / channels {n_channels}")
    frame_bytes = n_channels * depth // 8
    n_frames = len(data) // frame_bytes
    arr = np.frombuffer(
        data[: n_frames * frame_bytes], dtype=_DEPTH_DTYPE[depth]
    ).reshape(n_frames, n_channels)
    if depth == 8:  # PCM8 is unsigned, center to signed like the rest
        arr = arr.astype(np.int16) - 128
    return arr, rate


AUDIO_FEATURE_FIELDS = [
    ("sample_rate", T.IntegerType()),
    ("n_frames", T.LongType()),
    ("n_channels", T.IntegerType()),
    ("duration_s", T.DoubleType()),
    ("rms", T.DoubleType()),
    ("peak", T.DoubleType()),
]


def audio_features(
    df: DataFrame, payload_col: str = "payload", id_cols: tuple = ("doc_id",)
) -> DataFrame:
    """Decode WAV payloads and emit one typed feature row per clip:
    rate/frames/channels/duration plus RMS and peak of the (channel-
    averaged) signal. One mapInPandas over Arrow batches — the binary
    column never leaves the executor, no per-row UDF."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name in id_cols]
        + [T.StructField(n, t) for n, t in AUDIO_FEATURE_FIELDS]
    )
    id_list = list(id_cols)

    def compute(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                samples, rate = decode_wav(row[payload_col])
                mono = samples.mean(axis=1, dtype=np.float64)
                n = samples.shape[0]
                rows.append(
                    [row[c] for c in id_list]
                    + [
                        int(rate),
                        int(n),
                        int(samples.shape[1]),
                        float(n / rate) if rate else 0.0,
                        float(np.sqrt(np.mean(mono * mono))) if n else 0.0,
                        float(np.max(np.abs(mono))) if n else 0.0,
                    ]
                )
            yield pd.DataFrame(
                rows, columns=id_list + [n for n, _ in AUDIO_FEATURE_FIELDS]
            )

    return df.select(*id_list, payload_col).mapInPandas(compute, out_schema)

"""WAV codec: roundtrip bit-exact, stdlib `wave` cross-check, RIFF
chunk-walk edge cases, Spark feature extraction."""

import io
import struct
import wave

import numpy as np
import pytest

from tsclust_spark.operators.wav import audio_features, decode_wav, encode_wav

RNG = np.random.default_rng(73)


def _sine(n=4800, rate=16000, hz=440.0, amp=12000):
    t = np.arange(n) / rate
    return (amp * np.sin(2 * np.pi * hz * t)).astype(np.int16)


def test_roundtrip_bit_exact_mono_and_stereo():
    mono = _sine()
    s, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and s.shape == (mono.size, 1)
    assert (s[:, 0] == mono).all()

    stereo = np.stack([mono, (mono // 2)], axis=1)
    s2, _ = decode_wav(encode_wav(stereo, 8000))
    assert s2.shape == stereo.shape and (s2 == stereo).all()


def test_decodes_stdlib_wave_output():
    mono = _sine(n=1000, rate=22050)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(mono.tobytes())
    s, rate = decode_wav(buf.getvalue())
    assert rate == 22050 and (s[:, 0] == mono).all()


def test_chunk_walk_skips_unknown_and_odd_chunks():
    mono = _sine(n=64)
    base = encode_wav(mono, 16000)
    # splice an odd-sized LIST chunk (plus pad byte) between fmt and data
    head, rest = base[:12], base[12:]
    fmt_chunk = rest[: 8 + 16]
    data_chunk = rest[8 + 16 :]
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd + pad
    assert head[:4] == b"RIFF"
    spliced = b"RIFF" + struct.pack(
        "<I", 4 + len(fmt_chunk) + len(junk) + len(data_chunk)
    ) + b"WAVE" + fmt_chunk + junk + data_chunk
    s, rate = decode_wav(spliced)
    assert rate == 16000 and (s[:, 0] == mono).all()


def test_error_taxonomy():
    with pytest.raises(ValueError):
        decode_wav(b"nope")
    mono = _sine(n=16)
    good = encode_wav(mono, 16000)
    mutated = bytearray(good)
    mutated[20] = 85  # format tag 1 -> 0x55 (MP3): unsupported, not malformed
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(mutated))
    with pytest.raises(ValueError):
        decode_wav(good[:30])  # truncated chunk overruns payload


def test_pcm8_centering():
    raw = np.array([0, 128, 255], dtype=np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", 3) + raw.tobytes() + b"\x00"
    s, _ = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert s[:, 0].tolist() == [-128, 0, 127]


def test_spark_audio_features(spark):
    clips = []
    for i, (hz, rate) in enumerate([(440.0, 16000), (880.0, 8000)]):
        clips.append((i, bytearray(encode_wav(_sine(rate // 2, rate, hz), rate))))
    df = spark.createDataFrame(clips, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in audio_features(df).collect()}
    for i, (hz, rate) in enumerate([(440.0, 16000), (880.0, 8000)]):
        r = out[i]
        assert r["sample_rate"] == rate
        assert r["n_frames"] == rate // 2
        assert r["n_channels"] == 1
        assert r["duration_s"] == pytest.approx(0.5)
        # sine RMS = amp/sqrt(2), peak = amp
        assert r["rms"] == pytest.approx(12000 / np.sqrt(2), rel=1e-2)
        assert r["peak"] == pytest.approx(12000, rel=1e-3)

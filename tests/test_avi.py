"""AVI container: roundtrip, error taxonomy, Spark frame extraction."""

import struct

import numpy as np
import pytest

from tsclust_spark.operators.avi import decode_avi, encode_avi, extract_frames

RNG = np.random.default_rng(79)


def _clip(n=6, h=9, w=13):  # odd width exercises DIB row padding
    return RNG.integers(0, 256, (n, h, w)).astype(np.uint8)


def test_roundtrip_bit_exact():
    frames = _clip()
    out, uspf = decode_avi(encode_avi(frames, us_per_frame=33367))
    assert uspf == 33367
    assert out.shape == frames.shape
    # gray->BGR->luma is identity: (114g + 587g + 299g)//1000 == g
    assert (out == frames).all()


def test_error_taxonomy():
    with pytest.raises(ValueError):
        decode_avi(b"RIFFxxxxWAVE")  # wrong RIFF kind
    good = encode_avi(_clip(n=2))
    with pytest.raises(ValueError):
        decode_avi(good[:60])  # truncated header chunk
    # flip a frame chunk tag to the compressed '00dc' form
    mutated = bytearray(good)
    at = bytes(mutated).find(b"00db")
    mutated[at : at + 4] = b"00dc"
    with pytest.raises(NotImplementedError):
        decode_avi(bytes(mutated))


def test_spark_extract_frames(spark):
    frames = _clip(n=7)
    df = spark.createDataFrame(
        [(1, bytearray(encode_avi(frames, us_per_frame=40000)))],
        "doc_id long, payload binary",
    )
    out = sorted(
        extract_frames(df, every_n=3).collect(), key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in out] == [0, 3, 6]
    assert [r["ts_us"] for r in out] == [0, 120000, 240000]
    for r in out:
        assert r["mean_luma"] == pytest.approx(frames[r["frame_idx"]].mean())

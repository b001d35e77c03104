"""Baseline JPEG codec (operators/jpeg.py): encode->decode round trips
within DCT-quantization error, spec edges, and decode_image routing."""

import numpy as np
import pytest

from tsclust_spark.operators.jpeg import decode_jpeg, encode_jpeg

RNG = np.random.default_rng(19)


def _smooth_gray(h, w):
    """Band-limited test image (JPEG round-trips smooth content with
    small error; white noise would not separate codec bugs from
    quantization)."""
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        128
        + 80 * np.sin(2 * np.pi * xx / w * 2.3)
        + 40 * np.cos(2 * np.pi * yy / h * 1.7)
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def test_gray_roundtrip_quality90():
    img = _smooth_gray(64, 64)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape and out.dtype == np.uint8
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 3.0 and err.max() < 25, (err.mean(), err.max())


def test_color_roundtrip():
    h, w = 48, 40
    img = np.stack(
        [_smooth_gray(h, w), _smooth_gray(w, h).T, 255 - _smooth_gray(h, w)],
        axis=2,
    )
    out = decode_jpeg(encode_jpeg(img, quality=92))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 4.0, err.mean()


@pytest.mark.parametrize("sub", ["420", "422"])
def test_subsampled_roundtrip(sub):
    """2x2 / 2x1 chroma subsampling exercises the decoder's MCU
    interleave + chroma upsampling path."""
    h, w = 40, 56
    img = np.stack(
        [_smooth_gray(h, w), _smooth_gray(w, h).T, 255 - _smooth_gray(h, w)],
        axis=2,
    )
    blob = encode_jpeg(img, quality=92, subsampling=sub)
    out = decode_jpeg(blob)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    # chroma is genuinely downsampled, so allow more color error than
    # 4:4:4 — luma (approximated by the channel mean) stays tight
    assert err.mean() < 8.0, (sub, err.mean())
    assert len(blob) < len(encode_jpeg(img, quality=92, subsampling="444"))


def test_constant_image_exact_dc():
    img = np.full((16, 24), 137, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=85))
    assert np.abs(out.astype(int) - 137).max() <= 1


def test_odd_dimensions_padded_and_cropped():
    img = _smooth_gray(33, 17)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == (33, 17)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 4.0


def test_quality_controls_size():
    img = _smooth_gray(64, 64)
    lo = encode_jpeg(img, quality=10)
    hi = encode_jpeg(img, quality=95)
    assert len(lo) < len(hi)
    # low quality still decodes to roughly the same picture
    out = decode_jpeg(lo)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 20


def test_not_jpeg_raises():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")


def test_arithmetic_sof_raises_not_implemented():
    # stream whose first real marker is SOF9 (arithmetic sequential)
    payload = b"\xff\xd8" + b"\xff\xc9" + b"\x00\x0b" + bytes(9)
    with pytest.raises(NotImplementedError):
        decode_jpeg(payload)


def test_restart_markers():
    """DRI/RSTn handling: insert a restart interval via a hand-built
    re-encode (encoder emits none, so splice DRI in and verify the
    decoder still works on a stream WITHOUT restarts after parsing
    DRI=0)."""
    img = _smooth_gray(32, 32)
    blob = encode_jpeg(img, quality=90)
    # DRI with interval 0 (no restarts) spliced after SOI — decoder
    # must parse the segment and proceed unchanged
    dri = b"\xff\xdd\x00\x04\x00\x00"
    spliced = blob[:2] + dri + blob[2:]
    out = decode_jpeg(spliced)
    np.testing.assert_array_equal(out, decode_jpeg(blob))


def test_decode_image_routes_jpeg():
    from tsclust_spark.operators.multimodal import decode_image

    img = _smooth_gray(24, 24)
    px = decode_image(encode_jpeg(img, quality=90), 24, 24)
    assert px.shape == (24, 24) and px.dtype == np.uint8
    assert np.abs(px.astype(int) - img.astype(int)).mean() < 3.0
    # color JPEG collapses through the same integer luma as BMP/PNG
    rgb = np.stack([img, img, img], axis=2)
    px2 = decode_image(encode_jpeg(rgb, quality=90), 24, 24)
    assert px2.shape == (24, 24)


# ---------------------------------------------------------------------------
# progressive (SOF2) — decode must be BIT-IDENTICAL to the baseline
# decode of the same quantized coefficients
# ---------------------------------------------------------------------------

def _prog_identical(img, scans=None, quality=85):
    from tsclust_spark.operators.jpeg import encode_jpeg_progressive

    base = decode_jpeg(encode_jpeg(img, quality=quality))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=quality, scans=scans)
    )
    assert np.array_equal(base, prog)


def test_progressive_gray_default_script():
    rng = np.random.default_rng(0)
    _prog_identical(rng.integers(0, 256, (24, 17), dtype=np.uint8))
    _prog_identical(
        np.tile(np.arange(16, dtype=np.uint8) * 16, (16, 1))
    )


def test_progressive_color_default_script():
    rng = np.random.default_rng(2)
    _prog_identical(rng.integers(0, 256, (19, 13, 3), dtype=np.uint8))


def test_progressive_spectral_selection_only():
    rng = np.random.default_rng(1)
    scans = [([0], 0, 0, 0, 0), ([0], 1, 5, 0, 0),
             ([0], 6, 20, 0, 0), ([0], 21, 63, 0, 0)]
    _prog_identical(
        rng.integers(0, 256, (32, 32), dtype=np.uint8), scans
    )


def test_progressive_three_level_successive_approximation():
    rng = np.random.default_rng(3)
    scans = [([0], 0, 0, 0, 2), ([0], 0, 0, 2, 1), ([0], 0, 0, 1, 0),
             ([0], 1, 63, 0, 2), ([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0)]
    _prog_identical(
        rng.integers(0, 256, (24, 24), dtype=np.uint8), scans
    )


def test_progressive_sparse_zrl_eob_paths():
    # mostly-flat image with isolated impulses: long zero-history runs
    # (ZRL) in first AND refinement scans, plus EOB tails
    img = np.full((48, 48), 128, dtype=np.uint8)
    img[5, 40] = 255
    img[30, 7] = 0
    img[47, 47] = 255
    scans = [([0], 0, 0, 0, 2), ([0], 0, 0, 2, 1), ([0], 0, 0, 1, 0),
             ([0], 1, 63, 0, 2), ([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0)]
    _prog_identical(img, scans)
    _prog_identical(img)


def test_progressive_quality_extremes():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (33, 31), dtype=np.uint8)
    _prog_identical(img, quality=95)
    _prog_identical(img, quality=10)

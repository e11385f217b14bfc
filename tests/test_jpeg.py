"""Baseline-JPEG codec (core/jpeg.py, VERDICT r2 item 9): lossy-bounded
round-trips on gray + RGB, loud refusal of everything outside the baseline
4:4:4 subset, and the labeled-fallback contract through decode_image."""
from __future__ import annotations

import numpy as np
import pytest

from post_ocr_corretion_spark.core.jpeg import decode_jpeg_baseline, encode_jpeg_baseline


def test_gray_roundtrip_bounded_error():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(13, 21), dtype=np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=100))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_rgb_roundtrip_bounded_error():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(18, 10, 3), dtype=np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=100))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4  # YCbCr rounding


def test_quality_trades_size_for_error():
    y, x = np.mgrid[0:32, 0:32]
    img = ((x * 3 + y * 5) % 256).astype(np.uint8)
    hi = encode_jpeg_baseline(img, quality=100)
    lo = encode_jpeg_baseline(img, quality=30)
    assert len(lo) < len(hi)
    err_hi = np.abs(decode_jpeg_baseline(hi).astype(int) - img.astype(int)).max()
    err_lo = np.abs(decode_jpeg_baseline(lo).astype(int) - img.astype(int)).max()
    assert err_hi <= err_lo
    assert err_hi <= 2


def test_non_multiple_of_8_and_tiny_shapes():
    for shape in [(1, 1), (7, 9), (8, 8), (9, 17, 3), (3, 3, 3)]:
        rng = np.random.RandomState(sum(shape))
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        out = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=100))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_deterministic_bytes():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert encode_jpeg_baseline(img) == encode_jpeg_baseline(img)


def test_unsupported_subsets_refuse_loudly():
    img = np.zeros((8, 8), dtype=np.uint8)
    data = encode_jpeg_baseline(img)
    # progressive frame marker (SOF2 = 0xFFC2 instead of SOF0 0xFFC0)
    prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg_baseline(prog)
    # subsampled chroma: patch the sampling byte of component 1 (0x11→0x22)
    rgbd = encode_jpeg_baseline(np.zeros((8, 8, 3), dtype=np.uint8))
    sof_at = rgbd.find(b"\xff\xc0")
    sub = bytearray(rgbd)
    assert sub[sof_at + 11] == 0x11
    sub[sof_at + 11] = 0x22
    with pytest.raises(ValueError, match="subsampled"):
        decode_jpeg_baseline(bytes(sub))
    # restart interval (DRI with Ri > 0) injected before SOS
    sos_at = data.find(b"\xff\xda")
    dri = data[:sos_at] + b"\xff\xdd\x00\x04\x00\x08" + data[sos_at:]
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg_baseline(dri)
    # not a JPEG at all
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_baseline(b"\x89PNG....")
    # truncated entropy data (a noisy image so the scan genuinely needs
    # its bytes — the all-zero fixture decodes from almost nothing)
    noisy = encode_jpeg_baseline(
        np.random.RandomState(3).randint(0, 256, size=(24, 24), dtype=np.uint8)
    )
    with pytest.raises(ValueError):
        decode_jpeg_baseline(noisy[: len(noisy) - 40])


def test_decode_image_sniffs_jpeg_and_falls_back_on_corrupt():
    from post_ocr_corretion_spark.operators.multimodal import decode_image

    img = np.stack([np.full((12, 16), v, dtype=np.uint8) for v in (10, 120, 240)], axis=2)
    feats, dec = decode_image(encode_jpeg_baseline(img))
    assert dec == "jpeg"
    assert feats[0] == 12.0 and feats[1] == 16.0 and feats[2] == 3.0
    # corrupt JPEG bytes → labeled fallback, strict raises
    bad = b"\xff\xd8\xff\xe0garbage-no-frame"
    feats2, dec2 = decode_image(bad)
    assert dec2 == "fake"
    with pytest.raises((ValueError, NotImplementedError)):
        decode_image(bad, strict=True)


def test_jpeg_roundtrip_property():
    """Property sweep: random shapes/content at q=100 round-trip within
    the DCT+color rounding bound (gray ≤2, RGB ≤4)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(min_value=1, max_value=20),
        st.integers(min_value=1, max_value=20),
        st.sampled_from([1, 3]),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    def inner(h, w, c, seed):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, size=(h, w) if c == 1 else (h, w, c), dtype=np.uint8)
        out = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=100))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= (2 if c == 1 else 4)

    inner()

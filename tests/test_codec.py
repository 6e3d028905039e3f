"""Codec + phash unit tests (no Ray) — the engine's conformance-corpus
analog of the reference's TNM regex tests (Tests.scala:61-113)."""

import numpy as np
import pytest

from mtb_validation_service_ray.functions import codec


@pytest.mark.parametrize("dims", [(32, 32), (61, 47), (128, 96), (8, 8), (7, 9), (16, 128)])
@pytest.mark.parametrize("fmt", codec.FORMATS)
def test_roundtrip_and_sniff(dims, fmt):
    w, h = dims
    px = codec.pixels_for_id(f"id-{w}x{h}", w, h)
    payload = codec.encode(px, fmt)
    assert codec.sniff_format(payload, w, h) == fmt
    decoded = codec.decode(payload, fmt, w, h)
    assert decoded.shape == (h, w, 3)
    if fmt in ("raw", "png"):
        # lossless codecs: exact pixel equality (input_hint invariant)
        assert np.array_equal(px, decoded)
        assert codec.phash(px) == codec.phash(decoded)
    else:
        # lossy codec: PSNR must clear the 40 dB budget
        assert codec.psnr(px, decoded) >= 40.0
        assert codec.hamming64(codec.phash(px), codec.phash(decoded)) <= 8


def test_pixels_deterministic():
    a = codec.pixels_for_id("img-0123", 64, 48)
    b = codec.pixels_for_id("img-0123", 64, 48)
    c = codec.pixels_for_id("img-0124", 64, 48)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_phash_flips_on_corruption():
    px = codec.pixels_for_id("x", 64, 64)
    bad = px.copy()
    bad[:32] = 255 - bad[:32]
    assert codec.hamming64(codec.phash(px), codec.phash(bad)) > 8
    assert codec.psnr(px, bad) < 40


def test_raw_length_contract():
    px = codec.pixels_for_id("y", 10, 6)
    assert len(codec.encode_raw(px)) == 10 * 6 * 3
    with pytest.raises(ValueError):
        codec.decode_raw(codec.encode_raw(px)[:-1], 10, 6)


def test_sniff_rejects_garbage():
    assert codec.sniff_format(b"\x00\x01\x02", 10, 10) is None


def test_phash_constant_image_nonzero():
    """Constant images must NOT hash to the 0 sentinel (R-RG-PHASH would
    false-positive on legitimate uniform images — ADVICE r1); they share
    the canonical hash 1, and batch/scalar paths agree."""
    flat = np.full((16, 16, 3), 77, dtype=np.uint8)
    other = np.full((32, 8, 3), 200, dtype=np.uint8)
    assert codec.phash(flat) == 1
    assert codec.phash(other) == 1
    batch = codec.phash_batch(np.stack([flat, flat]))
    assert batch.tolist() == [1, 1]

"""Deterministic image codecs + perceptual hash, pure numpy + stdlib.

The sandbox has no Pillow / image libraries (SURVEY.md §7.1), so the
engine ships a tiny deterministic codec family shared by the fixture
generator and the validator:

  raw    — interleaved RGB8, ``len(bytes) == w*h*3`` (no magic header)
  png    — real PNG (stdlib ``zlib``): 8-bit RGB, filter 0 rows; decoder
           handles exactly what the encoder emits
  lossy  — toy lossy format ``LSY1``: uniform quantization to step
           QUANT_STEP then zlib.  Step 4 bounds per-pixel error at 2 ⇒
           PSNR ≥ ~46 dB, comfortably above the 40 dB invariant from
           BASELINE.json ``input_hint``.

``phash`` is an average-hash: 8×8 box-downsampled luminance thresholded
at its median → 64 bits packed into a signed int64.  It is exact under
raw/png round-trips and moves ≤ a few bits under lossy quantization,
which is what the R-XF-PSNR integrity rule relies on
(rules/registry.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

QUANT_STEP = 4  # lossy quantization step; max abs error = QUANT_STEP // 2

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
LSY_MAGIC = b"LSY1"

FORMATS = ("raw", "png", "lossy")


# --- deterministic pixel source (fixtures + tests) -------------------------


def pixels_for_id(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixel pattern keyed by image_id.

    Philox counter-based PRNG → platform-stable, seedable from a hash of
    the id (the engine analog of the reference's seed-pinned record
    generators, Tests.scala:26-31).
    """
    seed = zlib.crc32(image_id.encode()) & 0xFFFFFFFF
    rng = np.random.Generator(np.random.Philox(key=seed))
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    # add smooth structure so phash isn't pure noise
    yy = np.linspace(0, 255, h, dtype=np.float32)[:, None]
    xx = np.linspace(0, 255, w, dtype=np.float32)[None, :]
    grad = ((yy + xx) / 2).astype(np.uint8)[:, :, None]
    return ((base.astype(np.uint16) + grad) // 2).astype(np.uint8)


# --- raw -------------------------------------------------------------------


def encode_raw(px: np.ndarray) -> bytes:
    return px.astype(np.uint8).tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    expected = w * h * 3
    if len(data) != expected:
        raise ValueError(f"raw payload length {len(data)} != w*h*3 = {expected}")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


# --- png (encoder-subset decoder) ------------------------------------------


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    rows = px.astype(np.uint8)
    filtered = np.empty((h, w * 3 + 1), dtype=np.uint8)
    filtered[:, 0] = 0  # filter type 0 per row
    filtered[:, 1:] = rows.reshape(h, w * 3)
    idat = zlib.compress(filtered.tobytes(), 6)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            if bit_depth != 8 or color_type != 2:
                raise ValueError("unsupported PNG variant (encoder emits 8-bit RGB)")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    flat = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    if np.any(flat[:, 0] != 0):
        raise ValueError("unsupported PNG row filter (encoder emits filter 0)")
    return flat[:, 1:].reshape(h, w, 3)


# --- toy lossy -------------------------------------------------------------


def encode_lossy(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    q = ((px.astype(np.int32) // QUANT_STEP) * QUANT_STEP + QUANT_STEP // 2).clip(
        0, 255
    ).astype(np.uint8)
    return LSY_MAGIC + struct.pack(">IIB", w, h, QUANT_STEP) + zlib.compress(
        q.tobytes(), 6
    )


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] != LSY_MAGIC:
        raise ValueError("not an LSY1 payload")
    w, h, _step = struct.unpack(">IIB", data[4:13])
    return np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8).reshape(h, w, 3)


# --- dispatch --------------------------------------------------------------

_ENCODERS = {"raw": encode_raw, "png": encode_png, "lossy": encode_lossy}


def encode(px: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](px)


def decode(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt == "raw":
        return decode_raw(data, w, h)
    if fmt == "png":
        return decode_png(data)
    if fmt == "lossy":
        return decode_lossy(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def sniff_format(data: bytes, w: int, h: int) -> str | None:
    """Magic-byte sniff — the engine analog of the reference's
    observation-method equality check (MTBValidators.scala:366-371)."""
    if data[:8] == PNG_MAGIC:
        return "png"
    if data[:4] == LSY_MAGIC:
        return "lossy"
    if len(data) == w * h * 3:
        return "raw"
    return None


# --- metrics ---------------------------------------------------------------


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def phash(px: np.ndarray) -> int:
    """64-bit average hash of 8×8 box-downsampled luminance (signed
    int64).  Single-image wrapper over ``_phash_batch_inner`` — ONE
    source of truth for the bit layout (r4: the former separate scalar
    path duplicated the kernel and was slower than the batch path even
    per image)."""
    return int(_phash_batch_inner(px[None, ...])[0])


def phash_batch(stack: np.ndarray, _chunk: int = 64) -> np.ndarray:
    """Vectorized ``phash`` over a (n, h, w, 3) stack of same-dims
    images.  Processed in small chunks: this sandbox's memory subsystem
    page-faults fresh large allocations at ~80 MB/s, so small reused
    buffers beat one big vectorized pass (measured 10x)."""
    n = stack.shape[0]
    if n > _chunk:
        return np.concatenate(
            [phash_batch(stack[i : i + _chunk]) for i in range(0, n, _chunk)]
        )
    return _phash_batch_inner(stack)


def _phash_batch_inner(stack: np.ndarray) -> np.ndarray:
    """8×8 box sums via two ``add.reduceat`` passes over EXACT integer
    channel sums (r4; previously a float64 integral image, whose cumsum
    rounding both cost ~2× the memory traffic and made near-tie bits
    depend on summation order).  means = cells / (3·area) — one float
    division at the very end."""
    n, h, w, _ = stack.shape
    lum = stack.sum(axis=3, dtype=np.int32)  # ≤ 765 per pixel: exact
    if h < 8:
        lum = np.repeat(lum, -(-8 // h), axis=1)
        h = lum.shape[1]
    if w < 8:
        lum = np.repeat(lum, -(-8 // w), axis=2)
        w = lum.shape[2]
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    rows = np.add.reduceat(lum, ys[:-1], axis=1, dtype=np.int64)
    cells = np.add.reduceat(rows, xs[:-1], axis=2, dtype=np.int64)
    areas = np.outer(np.diff(ys), np.diff(xs)).astype(np.float64)
    means = (cells / (3.0 * areas)).reshape(n, 64)
    medians = np.median(means, axis=1, keepdims=True)
    # tie epsilon: float division rounding must not turn a constant
    # image into random bits
    bits = (means > medians + 1e-6).astype(np.uint64)
    weights = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
    values = (bits * weights).sum(axis=1, dtype=np.uint64)
    # constant images hash to all-bits-off; 0 is reserved as the
    # R-RG-PHASH forbidden sentinel, so remap to the canonical non-zero
    # constant-image hash (1) — deterministic and shared by all constant
    # images, so dup-grouping still clusters them
    return np.where(values == 0, np.uint64(1), values).astype(np.int64)


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1"))


def hamming64_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise 64-bit hamming distance (popcount via unpackbits)."""
    x = (np.asarray(a, dtype=np.int64) ^ np.asarray(b, dtype=np.int64)).astype(
        np.uint64
    )
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)

"""Multimodal (image/audio/video) actor-pool stages.

Payloads are opaque ``binary`` columns with typed metadata — the
engine's own codecs (raw/PNG/toy-lossy, functions/codec.py) are decoded
for real; external codecs (JPEG/WebP/MP3/H.264) are STUBBED behind
clearly-marked ``NotImplementedError`` because no image/audio library
exists in this container (SURVEY.md §7.1).  The Ray-side plumbing —
schema, batch sizing, actor signature, output layout — is real and
tested, so dropping in a real decoder is a one-function change.

All stages follow the decode-pass scale rules: small batches, decode →
derive → drop (pixels never become a dataset column unless the stage's
explicit output IS the derived feature), actor pools with per-actor
setup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions import codec

EXTERNAL_FORMATS = frozenset({"jpeg", "jpg", "webp", "gif", "mp3", "wav", "mp4"})


def _decode_row(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt in EXTERNAL_FORMATS:
        # STUB: container has no image/audio codecs — the real system
        # plugs Pillow/ffmpeg here; everything around this call is live.
        raise NotImplementedError(
            f"external codec {fmt!r} not available in this environment"
        )
    return codec.decode(data, fmt, w, h)


class ImageResizeStage:
    """Decode → box-resample to (out_w, out_h) → re-encode.

    Output schema mirrors the input with ``bytes/w/h`` replaced and
    ``phash`` recomputed — a real transform for the engine codecs."""

    def __init__(self, out_w: int = 32, out_h: int = 32, out_fmt: str = "png"):
        self.out_w, self.out_h, self.out_fmt = out_w, out_h, out_fmt

    @staticmethod
    def _box_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
        h, w, _ = px.shape
        ys = (np.arange(out_h + 1) * h) // out_h
        xs = (np.arange(out_w + 1) * w) // out_w
        integral = np.zeros((h + 1, w + 1, 3), dtype=np.float64)
        integral[1:, 1:] = px.astype(np.float64).cumsum(0).cumsum(1)
        cells = (
            integral[np.ix_(ys[1:], xs[1:])]
            - integral[np.ix_(ys[:-1], xs[1:])]
            - integral[np.ix_(ys[1:], xs[:-1])]
            + integral[np.ix_(ys[:-1], xs[:-1])]
        )
        areas = np.outer(np.diff(ys), np.diff(xs)).astype(np.float64)[:, :, None]
        return np.clip(cells / areas, 0, 255).astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        out_bytes, out_phash = [], []
        for data, fmt, w, h in zip(payloads, fmts, ws, hs):
            px = _decode_row(data, fmt, w, h)
            small = self._box_resize(px, self.out_w, self.out_h)
            out_bytes.append(codec.encode(small, self.out_fmt))
            out_phash.append(codec.phash(small))
        n = len(ids)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(out_bytes, pa.binary()),
                "w": pa.array([self.out_w] * n, pa.int32()),
                "h": pa.array([self.out_h] * n, pa.int32()),
                "fmt": pa.array([self.out_fmt] * n, pa.string()),
                "phash": pa.array(out_phash, pa.int64()),
            }
        )


class ImageFeatureStage:
    """Decode → fixed-length feature vector (``list<float32>``).

    The feature is a deterministic stand-in for a model embedding — 64
    phash bits + 4 luminance moments + 3 channel means — real enough to
    drive the similarity stages end-to-end; swap ``_features`` for a
    model forward pass (loaded once per actor in ``__init__``) in a GPU
    environment."""

    FEATURE_DIM = 71

    def __init__(self):
        self._bit_idx = np.arange(64, dtype=np.uint64)

    def _features(self, px: np.ndarray) -> np.ndarray:
        ph = np.uint64(codec.phash(px) & 0xFFFFFFFFFFFFFFFF)
        bits = ((ph >> self._bit_idx) & np.uint64(1)).astype(np.float32)
        lum = px.astype(np.float32).mean(axis=2)
        moments = np.array(
            [lum.mean(), lum.std(), np.median(lum), np.percentile(lum, 90)],
            dtype=np.float32,
        ) / 255.0
        channels = px.reshape(-1, 3).astype(np.float32).mean(axis=0) / 255.0
        return np.concatenate([bits, moments, channels])

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for data, fmt, w, h in zip(
            batch.column("bytes").to_pylist(),
            batch.column("fmt").to_pylist(),
            batch.column("w").to_pylist(),
            batch.column("h").to_pylist(),
        ):
            px = _decode_row(data, fmt, w, h)
            feats.append(self._features(px))
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "embedding": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


class FrameSampleStage:
    """Video frame sampling — STUB (no video codec in the container).

    Real plumbing: takes ``bytes`` (container) + ``n_frames``; returns
    one row per sampled frame with a frame index column.  The decode
    call raises ``NotImplementedError``; the schema and explode logic
    are exercised in tests via a fake single-frame 'video' (our own
    codecs treated as 1-frame containers)."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_frame, out_bytes = [], [], []
        for rid, data, fmt, w, h in zip(
            batch.column("image_id").to_pylist(),
            batch.column("bytes").to_pylist(),
            batch.column("fmt").to_pylist(),
            batch.column("w").to_pylist(),
            batch.column("h").to_pylist(),
        ):
            px = _decode_row(data, fmt, w, h)  # 1-frame container
            frames = [px] * min(self.n_frames, 1)
            for i, f in enumerate(frames):
                out_id.append(rid)
                out_frame.append(i)
                out_bytes.append(codec.encode_png(f))
        return pa.table(
            {
                "image_id": pa.array(out_id, pa.string()),
                "frame_idx": pa.array(out_frame, pa.int32()),
                "bytes": pa.array(out_bytes, pa.binary()),
            }
        )


def image_features(
    ds: rd.Dataset,
    *,
    batch_size: int = 256,
    concurrency: int | tuple[int, int] | None = None,
) -> rd.Dataset:
    if concurrency is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
        # never cover every CPU: a pool summing to the cluster starves
        # the read tasks and deadlocks the pipeline
        concurrency = max(1, min(cpus // 2, cpus - 1))
    return ds.map_batches(
        ImageFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def resize_images(
    ds: rd.Dataset,
    *,
    out_w: int = 32,
    out_h: int = 32,
    out_fmt: str = "png",
    batch_size: int = 256,
    concurrency: int | tuple[int, int] | None = None,
) -> rd.Dataset:
    if concurrency is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
        # never cover every CPU: a pool summing to the cluster starves
        # the read tasks and deadlocks the pipeline
        concurrency = max(1, min(cpus // 2, cpus - 1))
    return ds.map_batches(
        ImageResizeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h, "out_fmt": out_fmt},
        concurrency=concurrency,
    )

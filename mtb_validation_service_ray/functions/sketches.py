"""Mergeable sketches for per-partition column statistics.

The reference's only aggregations are counts/max-by/fold-to-set
(SURVEY.md §2.3 "Aggregations"); the north rule adds column statistics
at 10^12 scale: count / null-rate / min / max, HyperLogLog distinct,
t-digest quantiles and KS/PSI drift (BASELINE.json ``north_star``).
All of these are **mergeable partials**: each actor accumulates a
partial per (partition, batch), the partials are merged by a small
``groupby`` — never a row-level shuffle of the input.

Pure numpy implementations (public algorithms: Flajolet et al. 2007
HyperLogLog; Dunning & Ertl 2019 t-digest, simplified merging variant).
Hashing uses ``pandas.util.hash_array`` — deterministic, vectorized,
64-bit, stable across processes (unlike builtin ``hash``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def hash64(values) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of an array-like."""
    arr = np.asarray(values)
    if arr.dtype == object or arr.dtype.kind in "US":
        return pd.util.hash_array(arr.astype(object), categorize=False)
    return pd.util.hash_array(np.ascontiguousarray(arr))


_MIX64 = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 golden-ratio constant


def hash64_pair(values) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hash streams for double hashing (h2
    forced odd so probe sequences never degenerate).  Shared by the
    Bloom filter and count-min probes."""
    h1 = hash64(values).astype(np.uint64, copy=False)
    h2 = hash64((h1 ^ (h1 >> np.uint64(31))) * _MIX64) | np.uint64(1)
    return h1, h2


class CountMinSketch:
    """Mergeable count-min sketch: ``depth`` rows of ``width``
    counters; point estimate = min over rows (one-sided: never
    underestimates, overestimates by ≤ e/width · total_weight with
    probability 1 − e^-depth)."""

    __slots__ = ("width", "depth", "counts")

    def __init__(
        self, width: int = 16384, depth: int = 4,
        counts: np.ndarray | None = None,
    ):
        self.width = width
        self.depth = depth
        self.counts = (
            counts if counts is not None
            else np.zeros((depth, width), dtype=np.int64)
        )

    def _idx(self, values) -> np.ndarray:
        h1, h2 = hash64_pair(values)
        return np.stack([
            ((h1 + np.uint64(d) * h2) % np.uint64(self.width)).astype(np.int64)
            for d in range(self.depth)
        ])

    def add(self, values, weights: np.ndarray) -> None:
        idx = self._idx(values)
        w = np.asarray(weights, dtype=np.int64)
        for d in range(self.depth):
            np.add.at(self.counts[d], idx[d], w)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        return CountMinSketch(
            self.width, self.depth, self.counts + other.counts
        )

    def estimate(self, values) -> np.ndarray:
        idx = self._idx(values)
        return np.min(
            np.stack([self.counts[d][idx[d]] for d in range(self.depth)]),
            axis=0,
        )


def hll_idx_rank(hashes: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized HLL (register index, rank) per hash: the top ``p``
    bits pick the register; rank = 1 + leading zeros of the rest."""
    h = hashes.astype(np.uint64, copy=False)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64(1 << (p - 1))
    lz = np.zeros(len(h), dtype=np.uint8)
    probe = np.uint64(1) << np.uint64(63)
    mask = np.ones(len(h), dtype=bool)
    for r in range(64 - p + 1):
        hit = mask & ((rest & probe) != 0)
        lz[hit] = r
        mask &= ~hit
        probe >>= np.uint64(1)
    return idx, (lz + 1).astype(np.uint8)


def hll_estimate_2d(registers: np.ndarray) -> np.ndarray:
    """Vectorized HLL estimate per ROW of a (groups, m) register
    matrix — same alpha/linear-counting corrections as
    ``HyperLogLog.estimate``."""
    m = float(registers.shape[1])
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(
        2.0 ** (-registers.astype(np.float64)), axis=1
    )
    zeros = np.count_nonzero(registers == 0, axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lin = m * np.log(m / np.maximum(zeros, 1))
    return np.where(small, lin, est)


class HyperLogLog:
    """Dense HLL, p=12 (4096 registers, ~1.6% standard error)."""

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, hashes: np.ndarray) -> None:
        idx, rank = hll_idx_rank(hashes, self.p)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** (-self.registers.astype(np.float64)))
        if est <= 2.5 * m:  # small-range linear counting
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * np.log(m / zeros)
        return float(est)


class TDigest:
    """Simplified merging t-digest (bounded centroid count)."""

    __slots__ = ("max_centroids", "means", "weights", "_buf")

    def __init__(self, max_centroids: int = 128,
                 means: np.ndarray | None = None, weights: np.ndarray | None = None):
        self.max_centroids = max_centroids
        self.means = means if means is not None else np.empty(0)
        self.weights = weights if weights is not None else np.empty(0)
        self._buf: list[np.ndarray] = []

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v):
            self._buf.append(v)
        if sum(len(b) for b in self._buf) > 8 * self.max_centroids:
            self._compress()

    def _compress(self) -> None:
        if not self._buf and len(self.means) <= self.max_centroids:
            return
        all_means = np.concatenate([self.means] + self._buf) if self._buf else self.means
        all_weights = np.concatenate(
            [self.weights] + [np.ones(len(b)) for b in self._buf]
        ) if self._buf else self.weights
        self._buf = []
        order = np.argsort(all_means, kind="stable")
        means, weights = all_means[order], all_weights[order]
        total = weights.sum()
        if total == 0:
            self.means, self.weights = means, weights
            return
        # k1 scale: centroid bounded by quantile-dependent capacity
        q_limits = np.sin(
            np.linspace(-np.pi / 2, np.pi / 2, self.max_centroids + 1)
        ) / 2 + 0.5
        out_m, out_w = [], []
        li = 0
        cum = np.cumsum(weights)
        for k in range(self.max_centroids):
            hi_q = q_limits[k + 1]
            hi = int(np.searchsorted(cum, hi_q * total, side="right")) + 1
            hi = max(hi, li + 1)
            hi = min(hi, len(means))
            if li >= hi:
                continue
            wslice = weights[li:hi]
            wsum = wslice.sum()
            if wsum > 0:
                out_m.append(float(np.dot(means[li:hi], wslice) / wsum))
                out_w.append(float(wsum))
            li = hi
            if li >= len(means):
                break
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def merge(self, other: "TDigest") -> "TDigest":
        self._compress()
        other._compress()
        out = TDigest(self.max_centroids)
        out.means = np.concatenate([self.means, other.means])
        out.weights = np.concatenate([self.weights, other.weights])
        out._compress()
        return out

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        order = np.argsort(self.means)
        m, w = self.means[order], self.weights[order]
        cum = np.cumsum(w) - w / 2
        target = q * w.sum()
        return float(np.interp(target, cum, m))

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]


# --- drift metrics ---------------------------------------------------------


def histogram(values: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """Counts per bin (values outside edges clamp into the end bins)."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    v = np.clip(v, edges[0], edges[-1])
    counts, _ = np.histogram(v, bins=edges)
    return counts.astype(np.int64)


def ks_statistic(counts_a: np.ndarray, counts_b: np.ndarray) -> float:
    """Two-sample KS statistic from same-binned histograms."""
    a = np.asarray(counts_a, dtype=np.float64)
    b = np.asarray(counts_b, dtype=np.float64)
    if a.sum() == 0 or b.sum() == 0:
        return 0.0
    return float(np.max(np.abs(np.cumsum(a) / a.sum() - np.cumsum(b) / b.sum())))


def psi(counts_expected: np.ndarray, counts_actual: np.ndarray,
        eps: float = 1e-6) -> float:
    """Population stability index between same-binned histograms."""
    e = np.asarray(counts_expected, dtype=np.float64)
    a = np.asarray(counts_actual, dtype=np.float64)
    if e.sum() == 0 or a.sum() == 0:
        return 0.0
    p = np.clip(e / e.sum(), eps, None)
    q = np.clip(a / a.sum(), eps, None)
    return float(np.sum((q - p) * np.log(q / p)))

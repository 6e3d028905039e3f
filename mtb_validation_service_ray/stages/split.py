"""Deterministic dataset partitioning for training pipelines: hash
train/val/test splits and per-key caps.

The reference service (request/response validation) has no notion of
dataset splits; these are the training-data-pipeline operators the
brief asks for beyond reference parity.  Both are deterministic pure
functions of the data — rerunning a failed 100 TB job reproduces the
same assignment with no stored state, and the int-key hash is plain
modular arithmetic so a SQL oracle can recompute it exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

# Knuth multiplicative hash constant (2^32 / golden ratio); public
# domain folklore, used here because SQL can recompute it exactly.
_KNUTH = 2654435761
_MOD = 1 << 32


def split_hash_u32(keys: np.ndarray, salt: int = 0) -> np.ndarray:
    """Deterministic 32-bit mix of integer keys: ``(((k + salt) % 2^32)
    * KNUTH) % 2^32``.  The salt shifts the key BEFORE the multiply so
    a different salt reshuffles every band assignment (an additive
    post-multiply salt would only move keys within ``salt`` of a band
    boundary).  Reduced mod 2^32 before the multiply so the product
    fits uint64 for any int64 key — the SQL equivalent is
    ``(((k + salt) % 4294967296) * 2654435761) % 4294967296``."""
    keys = np.asarray(keys)
    if np.issubdtype(keys.dtype, np.floating):
        # a nullable int column arrives as float64 with NaN, and
        # NaN.astype(uint64) is PLATFORM-DEPENDENT garbage (review
        # finding r4).  Pin null keys to the TOP of the hash space:
        # they land in the LAST split band (the SQL CASE's ELSE arm,
        # since NULL comparisons are never true) and are not sampled by
        # `h < bound` for any fraction < 1 — matching the oracle's NULL
        # semantics on every platform.
        mask = np.isnan(keys)
        filled = np.where(mask, 0.0, keys).astype(np.int64)
        k = (filled.astype(np.uint64) + np.uint64(salt)) % np.uint64(_MOD)
        h = (k * np.uint64(_KNUTH)) % np.uint64(_MOD)
        h[mask] = np.uint64(_MOD - 1)
        return h
    k = (keys.astype(np.uint64) + np.uint64(salt)) % np.uint64(_MOD)
    return (k * np.uint64(_KNUTH)) % np.uint64(_MOD)


def hash_split(
    ds: rd.Dataset,
    *,
    key_col: str,
    fractions: dict[str, float] | None = None,
    salt: int = 0,
) -> rd.Dataset:
    """Append a deterministic ``split`` column ("train"/"val"/...):
    rows whose hashed key falls in the first ``fractions["train"]`` of
    [0, 1) are train, the next band val, etc.  All rows sharing a key
    land in the same split (no leakage across splits for grouped data).

    Pure ``map_batches`` — no shuffle, no state, streams at any scale;
    the assignment depends only on (key, salt)."""
    if fractions is None:
        fractions = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    names = list(fractions)
    # cumulative upper bounds scaled to the 32-bit hash space
    bounds = np.cumsum([fractions[n] for n in names]) * _MOD
    bounds[-1] = _MOD  # guard against float rounding at the top end

    def assign(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = split_hash_u32(keys, salt).astype(np.float64)
        idx = np.searchsorted(bounds, h, side="right")
        arr = np.array(names, dtype=object)[idx]
        return batch.append_column("split", pa.array(arr, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def hash_sample(
    ds: rd.Dataset,
    *,
    key_col: str,
    fraction: float,
    salt: int = 0,
) -> rd.Dataset:
    """Deterministic Bernoulli sample: keep rows whose hashed key falls
    in the first ``fraction`` of the 32-bit hash space.  Unlike
    ``Dataset.random_sample`` the decision is a pure function of
    ``(key, salt)`` — reruns, retried tasks and downstream joins all see
    the SAME sample, and all rows of one key are kept or dropped
    together.  Pure ``map_batches`` filter: no shuffle, no state."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    bound = fraction * _MOD

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = split_hash_u32(keys, salt).astype(np.float64)
        return batch.filter(pa.array(h < bound))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def cap_per_key(
    ds: rd.Dataset,
    *,
    key_col: str,
    n: int,
    order_cols: str | list[str],
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Keep at most ``n`` rows per key, chosen deterministically as the
    smallest ``order_cols`` values (include a unique id as the last
    order column to break ties — or a precomputed hash of it for an
    unbiased sample).
    The "cap documents per domain" primitive of web-scale corpus
    curation.

    Keys are hash-bucketed (one shuffle, B ≈ #CPUs buckets); each
    bucket ranks ALL its keys in one vectorized pandas body (lexsort +
    per-key cumcount), so per-group Python scales with #buckets, never
    #keys.  A key hotter than a worker's heap would need a pre-cap
    inside ``map_batches`` first (same partial trick as the windowed
    aggregates); with B buckets ≫ that is rare."""
    from ..functions.sketches import hash64

    if num_buckets is None:
        import ray

        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(key_col).to_numpy(zero_copy_only=False))
        return batch.append_column(
            "_bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    oc = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    def cap_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, *oc], kind="stable")
        # dropna=False: the default cumcount yields NaN for null-key
        # rows, and NaN < n is False — silently DELETING every null-key
        # row instead of capping them as one group (review finding r4)
        rank = g.groupby(key_col, sort=False, dropna=False).cumcount()
        return g[rank < n].drop(columns=["_bucket"])

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(cap_bucket, batch_format="pandas")
    )


def stratified_sample(
    ds: rd.Dataset,
    *,
    key_col: str,
    n: int,
    id_col: str,
    salt: int = 0,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Deterministic stratified sample: exactly ``min(n, group_size)``
    rows per key, chosen as the ``n`` smallest hashed ids — an unbiased
    per-group sample that is a pure function of ``(id, salt)``, so
    reruns and retries see the same rows and a SQL oracle can recompute
    the selection exactly.  Composes ``cap_per_key`` ordered by the
    split hash (ties broken by id)."""

    def add_h(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_h", pa.array(split_hash_u32(ids, salt).astype(np.int64))
        )

    capped = cap_per_key(
        ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True),
        key_col=key_col,
        n=n,
        order_cols=["_h", id_col],
        num_buckets=num_buckets,
    )
    return capped.drop_columns(["_h"])


def bottomk_sample(
    ds: rd.Dataset,
    *,
    key_col: str,
    n: int,
    salt: int = 0,
) -> pa.Table:
    """EXACT-size deterministic uniform sample: the ``n`` rows whose
    hashed INTEGER key is globally smallest (ties broken by the key
    itself — pass a unique key for a total order).  Complements
    ``hash_sample``: Bernoulli gives a deterministic FRACTION, bottom-k
    gives a deterministic COUNT, both pure functions of (key, salt) so
    reruns and retried tasks reproduce the same rows.

    Distributed shape: each batch keeps its local bottom-n (vectorized
    lexsort), the driver merges the tiny ``#blocks × n`` candidate
    stream — the same top-k merge pattern as ``top_terms``; the full
    table is never collected.  The hash is the SQL-recomputable Knuth
    mix, so a DuckDB ``ORDER BY hash, key LIMIT n`` oracle matches
    row-for-row.  Null keys hash to the top of the space and are never
    sampled while ≥ n non-null keys exist."""
    import ray

    def local(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = split_hash_u32(keys, salt)
        order = np.lexsort((keys, h))[:n]
        return batch.take(pa.array(np.sort(order)))

    cands = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    tables = [t for t in ray.get(cands.to_arrow_refs()) if t.num_rows]
    if not tables:
        schema = ds.schema()
        return getattr(schema, "base_schema", schema).empty_table()
    merged = pa.concat_tables(tables)
    keys = merged.column(key_col).to_numpy(zero_copy_only=False)
    h = split_hash_u32(keys, salt)
    order = np.lexsort((keys, h))[:n]
    return merged.take(pa.array(order))

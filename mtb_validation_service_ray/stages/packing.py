"""Sequence packing: assign documents to fixed token-budget training
sequences — the step between a curated corpus and a tokenized training
shard (no reference analog; brief-driven like the rest of the
training-data family).

Semantics (deterministic, layout-invariant): order the corpus by
``order_col``, take the EXCLUSIVE running sum of per-doc token counts,
and assign ``seq_id = running_sum // budget``.  Docs may straddle a
boundary (their tokens spill into the next sequence) — the simple
contiguous-chunking contract every data loader can consume, and exactly
reproducible in SQL as ``SUM(...) OVER (ORDER BY ... ROWS BETWEEN
UNBOUNDED PRECEDING AND 1 PRECEDING) // budget``, which is what the
driver oracle checks.

Distributed plan — an ordered GLOBAL prefix sum without a global sort:

  1. one cheap aggregate gets ``order_col``'s min/max; the key range is
     cut into ``num_buckets`` equal-width slabs (bucket of a row is
     pure arithmetic — no sampling, no sort);
  2. a ``map_batches`` pass emits per-(batch, bucket) partial token
     sums (nonzero buckets only); a tiny ``groupby(bucket)`` reduces
     them to one row per bucket and the driver folds B rows into
     EXCLUSIVE bucket offsets (the classic two-level scan);
  3. one bucket-grouped pass sorts each slab by ``order_col``
     (vectorized, in-bucket), adds its broadcast offset to the local
     exclusive cumsum, and emits ``seq_id``.

Partitioning assumption: equal-WIDTH key slabs are balanced only under
roughly uniform key density (true for the dense ids an ingest pipeline
assigns).  A pathologically clustered key concentrates rows in one
slab — raise ``num_buckets`` or densify ids upstream; the slab pass is
the only place a whole slab must fit in a worker.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

from ..functions.textfn import token_counts


def pack_sequences(
    ds: rd.Dataset,
    *,
    budget: int,
    order_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
    out_col: str = "seq_id",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Append ``out_col`` (int64 sequence index) and ``n_tokens`` (when
    derived from ``text_col``) to ``ds``; see the module docstring for
    the exact contract.  ``tokens_col`` skips the token count and packs
    an existing integer column instead.  ``order_col`` must be numeric
    and unique (ties would make the running sum order-ambiguous)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if num_buckets is None:
        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)) * 4)

    def with_tokens(batch: pa.Table) -> pa.Table:
        if tokens_col is not None:
            return batch.append_column(
                "_nt", batch.column(tokens_col).cast(pa.int64())
            )
        n = token_counts(batch.column(text_col)).cast(pa.int64())
        batch = batch.append_column("n_tokens", n)
        return batch.append_column("_nt", n)

    tokened = ds.map_batches(
        with_tokens, batch_format="pyarrow", zero_copy_batch=True
    )

    # pass 1: key range (metadata-light aggregate over the pruned column)
    bounds = ds.select_columns([order_col]).aggregate(
        Min(order_col), Max(order_col)
    )
    lo, hi = bounds[f"min({order_col})"], bounds[f"max({order_col})"]
    if lo is None:  # empty dataset
        return tokened.map_batches(
            lambda b: b.drop_columns(["_nt"]).append_column(
                out_col, pa.array(np.zeros(b.num_rows, np.int64))
            ),
            batch_format="pyarrow",
        )
    lo_i, hi_i = int(lo), int(hi)
    width = max(1, (hi_i - lo_i) // num_buckets + 1)

    def bucket_of(col: pa.ChunkedArray) -> np.ndarray:
        v = col.to_numpy(zero_copy_only=False).astype(np.int64)
        return (v - lo_i) // width

    # pass 2: per-bucket token totals → exclusive bucket offsets
    def partial_sums(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch.column(order_col))
        nt = batch.column("_nt").to_numpy(zero_copy_only=False)
        sums = np.bincount(b, weights=nt, minlength=num_buckets).astype(np.int64)
        nz = np.flatnonzero(sums)
        return pa.table(
            {"_bucket": pa.array(nz.astype(np.int32)),
             "_sum": pa.array(sums[nz])}
        )

    per_bucket = (
        tokened.map_batches(
            partial_sums, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("_bucket")
        .aggregate(Sum("_sum", alias_name="_total"))
    )
    totals = np.zeros(num_buckets, dtype=np.int64)
    for b in per_bucket.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        if b.num_rows and "_bucket" in b.column_names:
            totals[b.column("_bucket").to_numpy(zero_copy_only=False)] = (
                b.column("_total").to_numpy(zero_copy_only=False)
            )
    offsets = np.zeros(num_buckets, dtype=np.int64)
    np.cumsum(totals[:-1], out=offsets[1:])
    offsets_ref = ray.put(offsets)

    # pass 3: per-slab ordered cumsum + broadcast offset
    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_pbucket",
            pa.array(bucket_of(batch.column(order_col)).astype(np.int32)),
        )

    def pack_slab(group: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(offsets_ref)
        g = group.sort_values(order_col, kind="stable")
        nt = g["_nt"].to_numpy(dtype=np.int64)
        excl = offs[int(g["_pbucket"].iloc[0])] + np.concatenate(
            [[0], np.cumsum(nt)[:-1]]
        )
        g[out_col] = excl // budget
        return g.drop(columns=["_nt", "_pbucket"])

    return (
        tokened.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pbucket")
        .map_groups(pack_slab, batch_format="pandas")
    )

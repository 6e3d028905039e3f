"""Bucket-actor hash reduce — a custom aggregation exchange that
sidesteps Ray Data's sort-based Aggregate floor.

Ray's generic ``groupby(key).aggregate(...)`` is a sort-based exchange
costing ~0.3 s per output partition on this hardware regardless of row
count (BASELINE.md "Performance decisions") — for a pre-aggregated
triple stream that floor dominates.  This stage is the classic hash
aggregation instead: N reducer ACTORS each own ``hash(key) % N`` of the
key space; map tasks split each (already partially-aggregated) batch by
bucket and append the slices to their reducers; reducers fold with a
vectorized Arrow ``group_by`` (compacting incrementally so memory stays
bounded by live distinct keys, not received batches).  One-sided
mailbox shuffle, no sort, no per-key Python.

This is the deliberate raw-``@ray.remote`` escape hatch the brief
allows for "a shared mutable index" — everything around it stays
Dataset-shaped: the result comes back as ``ray.data.from_arrow_refs``
over the reducers' outputs, so downstream stages keep streaming.

Aggregation functions must be re-entrant under re-aggregation
(sum-of-sums, min-of-mins, max-of-maxes): pre-convert counts to
partial sums upstream (the uniqueness pass's `_batch_counts` does).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.sketches import hash64

_COMPACT_EVERY = 64  # received slices per incremental fold

# per-worker-process guard: each process sends the (empty) schema slice
# to every reducer once per hash_reduce call, not once per batch
_SCHEMA_SENT: set[str] = set()


# ZERO reserved CPUs: reducers are mailbox actors (append + occasional
# brief fold); any positive reservation can deadlock a small cluster —
# e.g. 8 actors × 0.5 CPU on a 4-CPU session leaves nothing for the
# routing map tasks, whose in-task ray.get then waits forever (pools
# summing to every CPU deadlock the pipeline, BASELINE.md).  The folds
# briefly oversubscribe instead, which is harmless.
@ray.remote(num_cpus=0)
class _ReduceActor:
    def __init__(self, key_cols: list[str], aggs: list[tuple[str, str]]):
        self.key_cols = key_cols
        self.aggs = aggs
        self.parts: list[pa.Table] = []
        self.schema: pa.Schema | None = None
        self.received = 0

    def _fold(self) -> None:
        if not self.parts:
            return
        # always aggregate — even a single slice may repeat keys
        t = pa.concat_tables(self.parts, promote_options="default")
        g = t.group_by(self.key_cols).aggregate(
            [(col, fn) for col, fn in self.aggs]
        )
        cols = {k: g.column(k) for k in self.key_cols}
        # rename f"{col}_{fn}" back to col so folding is idempotent
        for col, fn in self.aggs:
            cols[col] = g.column(f"{col}_{fn}")
        self.parts = [pa.table(cols)]

    def add(self, table: pa.Table) -> int:
        if self.schema is None:
            self.schema = table.schema  # learned even from empty slices
        if table.num_rows:
            self.parts.append(table)
            self.received += 1
            if len(self.parts) >= _COMPACT_EVERY:
                self._fold()
        return self.received

    def has_schema(self) -> bool:
        return self.schema is not None

    def finalize(self) -> pa.Table:
        self._fold()
        if not self.parts:
            return self.schema.empty_table()
        return self.parts[0]


def hash_reduce(
    ds: rd.Dataset,
    key_cols: list[str] | str,
    aggs: list[tuple[str, str]],
    *,
    num_actors: int | None = None,
) -> rd.Dataset:
    """Aggregate ``ds`` (already partially aggregated per batch) by
    ``key_cols`` with re-entrant Arrow aggregate functions
    (``[("cnt", "sum"), ("pid", "min"), ...]``) through a bucket-actor
    hash exchange.  Returns a Dataset with one block per reducer."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    if num_actors is None:
        num_actors = max(2, min(cpus // 2, 16))
    # more reducers than cores only adds mailbox hops
    num_actors = max(1, min(num_actors, max(cpus, 1)))
    actors = [
        _ReduceActor.remote(key_cols, list(aggs)) for _ in range(num_actors)
    ]

    import uuid

    call_id = uuid.uuid4().hex

    def route(batch: pa.Table, *, actors=actors, n=num_actors) -> pa.Table:
        # teach every reducer the input schema (empty slice) so an
        # all-empty key space still finalizes with typed empty blocks —
        # once per worker process, not per batch
        schema_refs = []
        if call_id not in _SCHEMA_SENT:
            _SCHEMA_SENT.add(call_id)
            schema_refs = [a.add.remote(batch.slice(0, 0)) for a in actors]
        if batch.num_rows == 0:
            ray.get(schema_refs)
            return pa.table({"_routed": pa.array([], pa.int64())})
        h = np.zeros(len(batch), dtype=np.uint64)
        for c in key_cols:
            h = h * np.uint64(1099511628211) ^ hash64(
                batch.column(c).to_numpy(zero_copy_only=False)
            ).astype(np.uint64)
        bucket = (h % np.uint64(n)).astype(np.int64)
        pending = list(schema_refs)
        for b in np.unique(bucket):
            pending.append(
                actors[int(b)].add.remote(batch.filter(pa.array(bucket == b)))
            )
        # block until the reducers own the slices — when the routing
        # dataset is fully consumed, every add has landed
        ray.get(pending)
        return pa.table({"_routed": pa.array([len(pending)], pa.int64())})

    # drive the routing to completion (the stream's only consumer).
    # Exactly-once discipline: the adds are side effects, so a RETRIED
    # route task would re-send its slices and double-count — the stage
    # is marked non-retryable (max_retries=0); a worker crash fails this
    # call instead, and the caller re-runs the whole (idempotent) stage
    # with fresh reducers.
    for _ in ds.map_batches(
        route, batch_format="pyarrow", max_retries=0
    ).iter_batches(batch_size=1 << 16):
        pass
    flags = ray.get([a.has_schema.remote() for a in actors])
    refs = [a.finalize.remote() for a, f in zip(actors, flags) if f]
    if refs:
        # block references stay in the object store (task returns are
        # owned by the driver, so killing the reducers is safe); the
        # reduced result never funnels through driver memory
        out = rd.from_arrow_refs(refs)
        ray.wait(refs, num_returns=len(refs))  # materialized before kill
    else:
        # fully-empty input: no batch ever reached a reducer, so no
        # schema was learned.  The empty result must still be typed and
        # carry BOTH the key and the aggregate columns, or downstream
        # column reads (e.g. uniqueness' `cnt`) KeyError on empty data.
        try:
            in_schema = ds.schema()
            base = getattr(in_schema, "base_schema", None) or pa.schema(
                [pa.field(n, t) for n, t in zip(in_schema.names, in_schema.types)]
            )
        except Exception:
            base = None
        fields = []
        for name in key_cols + [c for c, _ in aggs]:
            if base is not None and name in base.names:
                fields.append(base.field(name))
            else:
                fields.append(pa.field(name, pa.string()))
        out = rd.from_arrow(pa.schema(fields).empty_table())
    for a in actors:
        ray.kill(a)
    return out

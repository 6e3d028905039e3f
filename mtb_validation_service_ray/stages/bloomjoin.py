"""Bloom-prefiltered distributed semi / anti join.

The reference's only join shapes are in-record lookup resolution and
the orphan anti-join (MTBValidators.scala:563-569,621-623), covered by
``stages/referential.py``.  This module adds the join-REDUCTION pattern
a 100 TB fact-table pipeline needs: when the key side is too large to
broadcast raw but its *membership* compresses into a few MiB of Bloom
filter, prefilter the fact side before any exchange so the expensive
exact verification only ever sees (matches + false positives), not the
whole table.

Plan:

  1. **Distributed build** — ``map_batches`` over the key side emits
     one fixed-size partial bitmap per batch; a fan-in ``map_batches``
     pass ORs them 64-at-a-time; the driver ORs the handful of
     survivors.  Driver traffic is ``O(#blocks / fan_in)`` bitmaps, not
     ``O(rows)``.
  2. **Broadcast prefilter** — the merged bitmap ships once via
     ``ray.put``; every left batch tests membership vectorized (numpy
     gather on the word array, k double-hash probes).  No shuffle.
     A Bloom "no" is definite: for ``mode="semi"`` those rows drop
     immediately; for ``mode="anti"`` they are kept immediately.  Only
     Bloom "maybe" rows (matches + ~``fp_rate`` false positives)
     continue to exact verification, so the result is EXACT — the
     filter only shrinks the verify input, never decides membership.
  3. **Exact verify** — distinct maybe-keys and distinct right keys
     meet in one int-bucketed exchange (``bucketed_group_agg`` — the
     engine's high-cardinality reduce); the resulting matched-key set
     is byte-gated: broadcast filter when small (the common case — it
     is bounded by the keys the fact side actually references),
     bucketed per-group ``is_in`` filter when not.

Null semantics: a null left key never matches — dropped in ``semi``,
kept in ``anti`` (SQL ``NOT EXISTS``, not ``NOT IN``).  Null right keys
are ignored at build and verify.

Partitioning assumption (per the brief): one bucket's maybe-rows fit in
a worker's heap on the fallback arm; keys spread over ``num_buckets``
buckets, so only a single pathological hot key breaks it — same
assumption as ``stages/joins.py``.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.sketches import hash64, hash64_pair


def bloom_params(expected_keys: int, fp_rate: float) -> tuple[int, int]:
    """(m_bits, k_hashes) sized for ``expected_keys`` at ``fp_rate``;
    m is rounded up to whole uint64 words, k clamped to [1, 16]."""
    n = max(1, expected_keys)
    m = int(math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2)))
    m = max(1024, (m + 63) // 64 * 64)
    k = max(1, min(16, round(m / n * math.log(2))))
    return m, k


_probe_hashes = hash64_pair


def _set_bits(words: np.ndarray, keys_np: np.ndarray, m: int, k: int) -> None:
    h1, h2 = _probe_hashes(keys_np)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
        np.bitwise_or.at(
            words, (idx >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (idx & np.uint64(63)),
        )


def _test_bits(words: np.ndarray, keys_np: np.ndarray, m: int, k: int) -> np.ndarray:
    h1, h2 = _probe_hashes(keys_np)
    hit = np.ones(len(keys_np), dtype=bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
        bit = (
            words[(idx >> np.uint64(6)).astype(np.int64)]
            >> (idx & np.uint64(63))
        ) & np.uint64(1)
        hit &= bit.astype(bool)
        if not hit.any():
            break
    return hit


def build_bloom(
    keys: rd.Dataset, key_col: str, m_bits: int, k_hashes: int,
    *, fan_in: int = 64,
) -> np.ndarray:
    """Merged Bloom bitmap (uint64 words) over ``keys[key_col]``,
    nulls skipped.  One partial bitmap per input batch, one fan-in OR
    pass, driver ORs the remainder."""

    def partial(batch: pa.Table) -> pa.Table:
        words = np.zeros(m_bits // 64, dtype=np.uint64)
        col = batch.column(key_col).drop_null()
        if len(col):
            _set_bits(words, col.to_numpy(zero_copy_only=False), m_bits, k_hashes)
        return pa.table({"bloom": pa.array([words.tobytes()], pa.large_binary())})

    def or_merge(batch: pa.Table) -> pa.Table:
        acc = np.zeros(m_bits // 64, dtype=np.uint64)
        for buf in batch.column("bloom"):
            acc |= np.frombuffer(buf.as_py(), dtype=np.uint64)
        return pa.table({"bloom": pa.array([acc.tobytes()], pa.large_binary())})

    partials = keys.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
    ).map_batches(or_merge, batch_format="pyarrow", batch_size=fan_in)

    acc = np.zeros(m_bits // 64, dtype=np.uint64)
    for b in partials.iter_batches(batch_size=fan_in, batch_format="pyarrow"):
        for buf in b.column("bloom"):
            acc |= np.frombuffer(buf.as_py(), dtype=np.uint64)
    return acc


def bloom_semi_join(
    left: rd.Dataset,
    right_keys: rd.Dataset,
    *,
    on: tuple[str, str],
    mode: str = "semi",
    expected_keys: int | None = None,
    fp_rate: float = 0.01,
    num_buckets: int | None = None,
    broadcast_max_bytes: int = 64 << 20,
) -> rd.Dataset:
    """Rows of ``left`` whose ``on[0]`` key does (``mode="semi"``) or
    does not (``mode="anti"``) appear in ``right_keys[on[1]]``.  Exact
    result; the Bloom filter only prunes the exact-verify input.

    ``expected_keys`` sizes the filter (defaults to
    ``right_keys.count()`` — metadata-cheap on a plain read).

    Cost note: ``semi`` scans the fact side once (the maybe set is
    pinned and reused); ``anti`` scans it twice — once for maybes,
    once for the definite keeps — because Ray Data has no one-pass
    multi-output operator and materializing a tagged copy of the
    whole fact table would cost more than the second scan."""
    if mode not in ("semi", "anti"):
        raise ValueError(f"mode must be 'semi' or 'anti', got {mode!r}")
    lcol, rcol = on
    right_keys = right_keys.select_columns([rcol])
    if expected_keys is None:
        expected_keys = right_keys.count()
    m_bits, k_hashes = bloom_params(expected_keys, fp_rate)
    words_ref = ray.put(build_bloom(right_keys, rcol, m_bits, k_hashes))

    def split_mask(batch: pa.Table) -> np.ndarray:
        """True where the Bloom filter says MAYBE (valid key, all probe
        bits set); null keys are always False."""
        words = ray.get(words_ref)
        col = batch.column(lcol)
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        out = np.zeros(batch.num_rows, dtype=bool)
        if valid.any():
            vals = pc.fill_null(col, _zero_of(col.type)).to_numpy(
                zero_copy_only=False
            )
            out[valid] = _test_bits(words, vals[valid], m_bits, k_hashes)
        return out

    def keep_definite(batch: pa.Table) -> pa.Table:
        # anti mode: Bloom "no" (and null keys) are definite keeps
        return batch.filter(pa.array(~split_mask(batch)))

    def keep_maybe(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(split_mask(batch)))

    # The maybe set feeds both the matched-key reduce and the final
    # filter; pin it once (it is bounded by matches + ~fp_rate of the
    # input — output-sized, and the object store spills if large)
    # instead of re-running the read + prefilter per consumer.
    maybes = left.map_batches(
        keep_maybe, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    schema = maybes.schema()
    schema = getattr(schema, "base_schema", schema)
    key_type = schema.field(lcol).type

    matched = _matched_keys(
        maybes, lcol, right_keys, rcol, key_type, num_buckets
    )
    filtered = _filter_by_keys(
        maybes, lcol, matched, key_type, mode=mode,
        num_buckets=num_buckets, broadcast_max_bytes=broadcast_max_bytes,
    )
    if mode == "semi":
        return filtered
    definite = left.map_batches(
        keep_definite, batch_format="pyarrow", zero_copy_batch=True
    )
    return definite.union(filtered)


def _zero_of(t: pa.DataType):
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.scalar("", t)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pa.scalar(b"", t)
    return pa.scalar(0, t)


def _matched_keys(
    maybes: rd.Dataset, lcol: str, right_keys: rd.Dataset, rcol: str,
    key_type: pa.DataType, num_buckets: int | None,
) -> rd.Dataset:
    """EXACT intersection of distinct maybe-keys and right keys: tagged
    union (right keys cast to the left key type so the union schema is
    stable), per-batch dedupe (partial), one int-bucketed reduce keyed
    by the key value, keep keys seen on both sides."""
    from .groupagg import bucketed_group_agg

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            col = batch.column(lcol if side == 0 else rcol).drop_null()
            u = pc.unique(col.cast(key_type) if side == 1 else col)
            return pa.table({
                "_key": u,
                "_l": pa.array(np.full(len(u), 1 - side, dtype=np.int8)),
                "_r": pa.array(np.full(len(u), side, dtype=np.int8)),
            })
        return fn

    tagged = maybes.map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(right_keys.map_batches(
        tag(1), batch_format="pyarrow", zero_copy_batch=True
    ))
    both = bucketed_group_agg(
        tagged, ["_key"],
        [("_has_l", "_l", "max"), ("_has_r", "_r", "max")],
        num_buckets=num_buckets, partial=False,
    )

    def keep_both(batch: pa.Table) -> pa.Table:
        hit = pc.and_(
            pc.equal(batch.column("_has_l"), 1),
            pc.equal(batch.column("_has_r"), 1),
        )
        return batch.filter(hit).select(["_key"])

    return both.map_batches(
        keep_both, batch_format="pyarrow", zero_copy_batch=True
    )


def _filter_by_keys(
    maybes: rd.Dataset, lcol: str, matched: rd.Dataset,
    key_type: pa.DataType, *, mode: str,
    num_buckets: int | None, broadcast_max_bytes: int,
) -> rd.Dataset:
    """Filter ``maybes`` to rows whose key is (semi) / is not (anti) in
    ``matched``.  Byte-gated broadcast arm; bucketed ``is_in`` arm when
    the matched-key set exceeds the gate."""
    matched = matched.materialize()  # distinct matched keys — bounded
    tot_bytes = matched.size_bytes() or 0

    if tot_bytes <= broadcast_max_bytes:
        tbls = [t for t in ray.get(matched.to_arrow_refs()) if t.num_rows]
        keys_arr = (
            pa.concat_tables(tbls).column("_key").combine_chunks()
            if tbls else pa.array([], type=key_type)
        )
        keys_ref = ray.put(keys_arr)

        def bfilter(batch: pa.Table) -> pa.Table:
            keys = ray.get(keys_ref)
            hit = pc.is_in(batch.column(lcol), value_set=keys)
            hit = pc.fill_null(hit, False)
            return batch.filter(hit if mode == "semi" else pc.invert(hit))

        return maybes.map_batches(
            bfilter, batch_format="pyarrow", zero_copy_batch=True
        )

    # scale arm: co-bucket rows and matched keys, per-bucket is_in.
    if num_buckets is None:
        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))
    schema = maybes.schema()
    schema = getattr(schema, "base_schema", schema)

    def bucket_of(col: pa.ChunkedArray) -> pa.Array:
        vals = pc.fill_null(col, _zero_of(col.type)).to_numpy(zero_copy_only=False)
        return pa.array((hash64(vals) % np.uint64(num_buckets)).astype(np.int32))

    def row_side(batch: pa.Table) -> pa.Table:
        b = batch.append_column("_bucket", bucket_of(batch.column(lcol)))
        return b.append_column("_is_key", pa.array(np.zeros(b.num_rows, bool)))

    def key_side(batch: pa.Table) -> pa.Table:
        cols = {n: pa.nulls(batch.num_rows, schema.field(n).type)
                for n in schema.names}
        cols[lcol] = batch.column("_key").cast(schema.field(lcol).type)
        t = pa.table(cols)
        t = t.append_column("_bucket", bucket_of(t.column(lcol)))
        return t.append_column("_is_key", pa.array(np.ones(t.num_rows, bool)))

    tagged = maybes.map_batches(
        row_side, batch_format="pyarrow", zero_copy_batch=True
    ).union(matched.map_batches(
        key_side, batch_format="pyarrow", zero_copy_batch=True
    ))

    def filter_bucket(group: pa.Table) -> pa.Table:
        is_key = group.column("_is_key")
        keys = pc.unique(group.filter(is_key).column(lcol))
        rows = group.filter(pc.invert(is_key))
        hit = pc.fill_null(pc.is_in(rows.column(lcol), value_set=keys), False)
        out = rows.filter(hit if mode == "semi" else pc.invert(hit))
        return out.drop_columns(["_bucket", "_is_key"])

    return (
        tagged.repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(filter_bucket, batch_format="pyarrow")
    )

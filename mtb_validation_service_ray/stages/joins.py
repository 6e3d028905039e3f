"""Temporal joins Ray Data lacks natively: distributed as-of join.

The reference service is request/response and has no joins at all; this
operator covers the "enrich every event with the latest dimension row
at or before its timestamp" shape a training-data pipeline needs (e.g.
captions ↔ the model-version row active when the image was ingested).

Plan (one shuffle, then vectorized per-bucket merges):

  1. project both sides to ONE common schema — ``_key``, ``_ts``,
     ``_side`` (0=left, 1=right), the left's output columns (null on
     right rows) and the right payload columns (null on left rows);
  2. hash-bucket on ``_key`` (``hash(key) % B``, B ≈ #CPUs) — the one
     all-to-all exchange; both sides of a key land in the same bucket;
  3. per bucket, ONE ``pd.merge_asof(by=_key)`` over the time-sorted
     sides matches every key in the bucket vectorized — per-group
     Python scales with #buckets, never #keys.

Partitioning assumption (documented per the brief): a key's full
left+right history fits in one bucket's worker memory.  Keys are spread
over B buckets, so only a single pathological key exceeding worker
memory breaks this — the same assumption ``session_windows`` makes.

Tie semantics: right rows sharing (key, ts) are resolved by
``tiebreak`` — rows are time-sorted with the tiebreak as secondary key
and ``merge_asof`` keeps the LAST, i.e. the max-tiebreak row, matching
``arg_max(payload, tiebreak)`` in SQL.  Null left keys/timestamps can
never match and are emitted with null payload.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pac
import ray.data as rd

from ..functions.sketches import hash64


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    key: tuple[str, str],
    ts: tuple[str, str],
    right_payload: list[str],
    direction: str = "backward",
    tiebreak: str | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """LEFT as-of join: every left row, plus ``right_payload`` from the
    latest (``direction="backward"``) right row with the same key and
    ``right.ts <= left.ts`` (or the earliest ``>=`` for "forward").

    ``key``/``ts`` are (left_col, right_col) name pairs.  Output: all
    left columns + ``right_payload`` (null where no right row
    qualifies)."""
    if num_buckets is None:
        import ray

        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    lkey, rkey = key
    lts, rts = ts
    left_schema = left.schema()
    left_schema = getattr(left_schema, "base_schema", left_schema)
    right_schema = right.schema()
    right_schema = getattr(right_schema, "base_schema", right_schema)
    left_cols = list(left_schema.names)
    payload_types = {c: right_schema.field(c).type for c in right_payload}
    key_type = left_schema.field(lkey).type
    ts_type = left_schema.field(lts).type

    def common(batch: pa.Table, side: int) -> pa.Table:
        n = batch.num_rows
        cols: dict[str, pa.Array | pa.ChunkedArray] = {}
        if side == 0:
            cols["_key"] = batch.column(lkey)
            cols["_ts"] = batch.column(lts)
        else:
            cols["_key"] = batch.column(rkey).cast(key_type)
            cols["_ts"] = batch.column(rts).cast(ts_type)
        cols["_side"] = pa.array(np.full(n, side, dtype=np.int8))
        for c in left_cols:
            cols[f"_l_{c}"] = (
                batch.column(c) if side == 0
                else pa.nulls(n, left_schema.field(c).type)
            )
        for c in right_payload:
            cols[f"_r_{c}"] = (
                batch.column(c) if side == 1 else pa.nulls(n, payload_types[c])
            )
        # fill key nulls with a typed zero BEFORE to_numpy: a nullable
        # int64 column otherwise converts to float64 and hashes into a
        # different bucket than the other side's int64 rows (null rows
        # themselves never match, so their bucket is arbitrary)
        if pa.types.is_string(key_type) or pa.types.is_binary(key_type):
            zero = pa.scalar("", key_type)
        else:
            zero = pa.scalar(0, key_type)
        k_np = pac.fill_null(cols["_key"], zero).to_numpy(zero_copy_only=False)
        h = hash64(k_np)
        cols["_bucket"] = pa.array(
            (h % np.uint64(num_buckets)).astype(np.int32)
        )
        return pa.table(cols)

    tagged = left.map_batches(
        lambda b: common(b, 0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(
            lambda b: common(b, 1), batch_format="pyarrow", zero_copy_batch=True
        )
    )

    out_names = left_cols + right_payload

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lmask = group["_side"].to_numpy() == 0
        l = group[lmask]
        r = group[~lmask]
        # null key/ts on the left can never match — carried through
        # with null payload; merge_asof would reject NaN in its keys
        l_ok = l[l["_key"].notna() & l["_ts"].notna()]
        l_nul = l[~(l["_key"].notna() & l["_ts"].notna())]
        r = r[r["_key"].notna() & r["_ts"].notna()]
        r_sort = ["_ts"] + ([f"_r_{tiebreak}"] if tiebreak else [])
        r = r.sort_values(r_sort, kind="stable")
        rcols = ["_key", "_ts"] + [f"_r_{c}" for c in right_payload]
        l_ok = l_ok.sort_values("_ts", kind="stable")
        if len(r):
            merged = pd.merge_asof(
                l_ok.drop(columns=[f"_r_{c}" for c in right_payload]),
                r[rcols],
                on="_ts", by="_key", direction=direction,
            )
        else:
            merged = l_ok
        parts = [merged] + ([l_nul] if len(l_nul) else [])
        out = pd.concat(parts, ignore_index=True) if len(parts) > 1 else merged
        out = out.rename(
            columns={f"_l_{c}": c for c in left_cols}
            | {f"_r_{c}": c for c in right_payload}
        )
        return out[out_names]

    # coalesce to ~num_buckets blocks first: the groupby's sort costs
    # per block, and read auto-split leaves many tiny blocks on small
    # inputs; at scale num_buckets ≈ #CPUs is the width the sort wants
    merged = (
        tagged.repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(merge_bucket, batch_format="pandas")
    )

    want_types = {c: left_schema.field(c).type for c in left_cols}
    want_types.update(payload_types)

    def restore_types(batch: pa.Table) -> pa.Table:
        # pandas promotes nullable ints to float64 in the mixed-side
        # bucket frame; cast every output column back to its source
        # arrow type (nulls preserved)
        cols = {}
        for c in out_names:
            col = batch.column(c)
            want = want_types.get(c)
            if want is not None and col.type != want:
                if pa.types.is_integer(want):
                    col = col.cast(pa.int64(), safe=False).cast(want)
                else:
                    col = col.cast(want)
            cols[c] = col
        return pa.table(cols)

    return merged.map_batches(restore_types, batch_format="pyarrow")

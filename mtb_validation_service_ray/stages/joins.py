"""Temporal joins Ray Data lacks natively: as-of and interval (range).

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
``tiebreak`` to the MAX-tiebreak row — matching ``arg_max(payload,
tiebreak)`` in SQL.  ``merge_asof`` keeps the LAST qualifying row
going backward and the FIRST going forward, so the secondary sort is
ascending for ``direction="backward"`` and descending for
``"forward"``.  Null left keys/timestamps can never match and are
emitted with null payload.

Int-precision bound: the mixed-side bucket frame promotes null-padded
int64 columns to float64, which is exact only up to ±2^53; columns
carrying larger magnitudes (e.g. raw 64-bit hashes) raise a loud
ValueError instead of silently rounding ids.
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
    left, left_schema = _as_arrow(left)
    right, right_schema = _as_arrow(right)
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
            for c in left_cols:
                _assert_f64_safe(batch.column(c), c)
        else:
            cols["_key"] = batch.column(rkey).cast(key_type)
            cols["_ts"] = batch.column(rts).cast(ts_type)
            for c in right_payload:
                _assert_f64_safe(batch.column(c), c)
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
        return _with_bucket(cols, key_type, num_buckets)

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
        # tiebreak order depends on direction: merge_asof keeps the
        # LAST qualifying row going backward but the FIRST going
        # forward, so max-tiebreak needs ascending order backward and
        # DESCENDING forward (review finding r4)
        if tiebreak:
            r = r.sort_values(
                ["_ts", f"_r_{tiebreak}"], kind="stable",
                ascending=[True, direction == "backward"],
            )
        else:
            r = r.sort_values("_ts", kind="stable")
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


def interval_join(
    points: rd.Dataset,
    intervals: rd.Dataset,
    *,
    ts: str,
    bounds: tuple[str, str],
    payload: list[str],
    key: tuple[str, str] | None = None,
    closed: str = "left",
    num_buckets: int | None = None,
    slab_us: int | None = None,
) -> rd.Dataset:
    """INNER range join: every (point, interval) pair where
    ``start <= point.ts < end`` (``closed="left"``; "both" makes the
    upper bound inclusive), optionally also requiring key equality.

    Two plans, both one shuffle:

    * **keyed** (``key=(point_col, interval_col)``): hash-bucket both
      sides on the key — an equijoin-shaped exchange — then one
      vectorized ``pd.merge`` on the key per bucket with the range mask
      applied on the merged frame.  The per-bucket intermediate is the
      KEY-equijoin size (points_k × intervals_k summed over the bucket's
      keys), the same working set any equijoin-then-filter plan carries;
      the assumption (documented per the brief) is that one bucket's
      share of that intermediate fits in a worker's heap — keys are
      spread over B buckets so only a pathologically hot key breaks it.

    * **unkeyed**: time-slab partitioning.  Points route to slab
      ``ts // slab_us``; each interval replicates to every slab it
      overlaps (``slab_us`` defaults to the observed max interval
      length, capping replication at 2 copies per interval).  Per slab,
      points are ts-sorted once and every interval finds its matches
      with two ``np.searchsorted`` calls; match emission is an
      O(#matches) repeat/arange gather — no per-interval Python, no
      cross product anywhere.

    Output: all point columns + ``payload`` from the interval side,
    one row per qualifying pair."""
    import ray

    if num_buckets is None:
        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))
    start_col, end_col = bounds
    right_incl = closed == "both"

    points, p_schema = _as_arrow(points)
    intervals, i_schema = _as_arrow(intervals)
    point_cols = list(p_schema.names)
    payload_types = {c: i_schema.field(c).type for c in payload}
    ts_type = p_schema.field(ts).type
    out_names = point_cols + payload

    def _ts_np(col) -> np.ndarray:
        a = col.cast(ts_type).to_numpy(zero_copy_only=False)
        return a.view("int64") if a.dtype.kind == "M" else a.astype(np.int64)

    if key is not None:
        pkey, ikey = key
        key_type = p_schema.field(pkey).type

        def tag_points(batch: pa.Table) -> pa.Table:
            for c in point_cols:
                _assert_f64_safe(batch.column(c), c)
            cols = {f"_p_{c}": batch.column(c) for c in point_cols}
            cols["_key"] = batch.column(pkey)
            cols["_ts"] = pa.array(_ts_np(batch.column(ts)))
            cols["_side"] = pa.array(
                np.zeros(batch.num_rows, dtype=np.int8))
            for c in payload:
                cols[f"_r_{c}"] = pa.nulls(batch.num_rows, payload_types[c])
            cols["_start"] = pa.nulls(batch.num_rows, pa.int64())
            cols["_end"] = pa.nulls(batch.num_rows, pa.int64())
            return _with_bucket(cols, key_type, num_buckets)

        def tag_intervals(batch: pa.Table) -> pa.Table:
            for c in payload:
                _assert_f64_safe(batch.column(c), c)
            n = batch.num_rows
            cols = {
                f"_p_{c}": pa.nulls(n, p_schema.field(c).type)
                for c in point_cols
            }
            cols["_key"] = batch.column(ikey).cast(key_type)
            cols["_ts"] = pa.nulls(n, pa.int64())
            cols["_side"] = pa.array(np.ones(n, dtype=np.int8))
            for c in payload:
                cols[f"_r_{c}"] = batch.column(c)
            cols["_start"] = pa.array(_ts_np(batch.column(start_col)))
            cols["_end"] = pa.array(_ts_np(batch.column(end_col)))
            return _with_bucket(cols, key_type, num_buckets)

        tagged = points.map_batches(
            tag_points, batch_format="pyarrow", zero_copy_batch=True
        ).union(
            intervals.map_batches(
                tag_intervals, batch_format="pyarrow", zero_copy_batch=True
            )
        )

        def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
            lmask = group["_side"].to_numpy() == 0
            p = group[lmask]
            iv = group[~lmask]
            p = p[p["_key"].notna() & p["_ts"].notna()]
            iv = iv[iv["_key"].notna() & iv["_start"].notna()
                    & iv["_end"].notna()]
            if not len(p) or not len(iv):
                return pd.DataFrame(
                    {c: pd.Series(dtype=group[c].dtype)
                     for c in [f"_p_{x}" for x in point_cols]
                     + [f"_r_{x}" for x in payload]}
                ).rename(columns=_unprefix(point_cols, payload))
            m = p[["_key", "_ts"] + [f"_p_{c}" for c in point_cols]].merge(
                iv[["_key", "_start", "_end"] + [f"_r_{c}" for c in payload]],
                on="_key",
            )
            t = m["_ts"].to_numpy()
            ok = (m["_start"].to_numpy() <= t) & (
                (t <= m["_end"].to_numpy()) if right_incl
                else (t < m["_end"].to_numpy())
            )
            m = m[ok]
            return m.rename(columns=_unprefix(point_cols, payload))[out_names]

        merged = (
            tagged.repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(merge_bucket, batch_format="pandas")
        )
    else:
        if slab_us is None:
            # one tiny pass over the interval side: the max length
            # bounds replication at <= 2 slabs per interval, and the
            # overall span bounds the SLAB COUNT — without the span
            # floor, all-zero-length intervals degrade to 1 µs slabs,
            # i.e. one map_groups group per distinct point timestamp
            # (review finding r4)
            import pyarrow.compute as _pc

            def _stats(b: pa.Table) -> pa.Table:
                if b.num_rows == 0:
                    return pa.table(
                        {
                            "mx": pa.array([], pa.int64()),
                            "lo": pa.array([], pa.int64()),
                            "hi": pa.array([], pa.int64()),
                        }
                    )
                s = b.column(start_col).cast(ts_type).cast(pa.int64())
                e = b.column(end_col).cast(ts_type).cast(pa.int64())
                ln = _pc.max(_pc.subtract(e, s)).as_py()
                return pa.table(
                    {
                        "mx": pa.array([int(ln or 0)], pa.int64()),
                        "lo": pa.array(
                            [int(_pc.min(s).as_py() or 0)], pa.int64()
                        ),
                        "hi": pa.array(
                            [int(_pc.max(e).as_py() or 0)], pa.int64()
                        ),
                    }
                )

            stats = intervals.select_columns([start_col, end_col]).map_batches(
                _stats, batch_format="pyarrow"
            ).to_pandas()
            if not len(stats):
                # no intervals at all → the inner join is empty
                empty = pa.table(
                    {
                        **{c: pa.array([], p_schema.field(c).type)
                           for c in point_cols},
                        **{c: pa.array([], payload_types[c])
                           for c in payload},
                    }
                )
                return rd.from_arrow(empty)
            span = int(stats["hi"].max()) - int(stats["lo"].min())
            slab_us = max(
                1,
                int(stats["mx"].max()),
                span // (64 * num_buckets),
            )

        def slab_points(batch: pa.Table) -> pa.Table:
            for c in point_cols:
                _assert_f64_safe(batch.column(c), c)
            t = _ts_np(batch.column(ts))
            cols = {f"_p_{c}": batch.column(c) for c in point_cols}
            cols["_ts"] = pa.array(t)
            cols["_side"] = pa.array(np.zeros(batch.num_rows, dtype=np.int8))
            for c in payload:
                cols[f"_r_{c}"] = pa.nulls(batch.num_rows, payload_types[c])
            cols["_start"] = pa.nulls(batch.num_rows, pa.int64())
            cols["_end"] = pa.nulls(batch.num_rows, pa.int64())
            cols["_slab"] = pa.array(t // slab_us)
            return pa.table(cols)

        def slab_intervals(batch: pa.Table) -> pa.Table:
            for c in payload:
                _assert_f64_safe(batch.column(c), c)
            s = _ts_np(batch.column(start_col))
            e = _ts_np(batch.column(end_col))
            lo = s // slab_us
            # last slab a point could match in: end is exclusive unless
            # closed="both"
            hi = (e if right_incl else np.maximum(e - 1, s)) // slab_us
            counts = (hi - lo + 1).astype(np.int64)
            idx = np.repeat(np.arange(batch.num_rows), counts)
            offs = np.arange(counts.sum()) - np.repeat(
                np.cumsum(counts) - counts, counts)
            n = len(idx)
            cols = {
                f"_p_{c}": pa.nulls(n, p_schema.field(c).type)
                for c in point_cols
            }
            cols["_ts"] = pa.nulls(n, pa.int64())
            cols["_side"] = pa.array(np.ones(n, dtype=np.int8))
            for c in payload:
                cols[f"_r_{c}"] = batch.column(c).take(pa.array(idx))
            cols["_start"] = pa.array(s[idx])
            cols["_end"] = pa.array(e[idx])
            cols["_slab"] = pa.array(lo[idx] + offs)
            return pa.table(cols)

        tagged = points.map_batches(
            slab_points, batch_format="pyarrow", zero_copy_batch=True
        ).union(
            intervals.map_batches(
                slab_intervals, batch_format="pyarrow", zero_copy_batch=True
            )
        )

        def stab_slab(group: pd.DataFrame) -> pd.DataFrame:
            lmask = group["_side"].to_numpy() == 0
            p = group[lmask]
            iv = group[~lmask]
            empty = pd.DataFrame(
                {c: pd.Series(dtype=group[c].dtype)
                 for c in [f"_p_{x}" for x in point_cols]
                 + [f"_r_{x}" for x in payload]}
            ).rename(columns=_unprefix(point_cols, payload))
            if not len(p) or not len(iv):
                return empty
            t = p["_ts"].to_numpy().astype(np.int64)
            order = np.argsort(t, kind="stable")
            t_s = t[order]
            lo = np.searchsorted(t_s, iv["_start"].to_numpy().astype(np.int64))
            hi = np.searchsorted(
                t_s, iv["_end"].to_numpy().astype(np.int64),
                side="right" if right_incl else "left",
            )
            counts = (hi - lo).clip(min=0)
            total = int(counts.sum())
            if not total:
                return empty
            iv_idx = np.repeat(np.arange(len(iv)), counts)
            offs = np.arange(total) - np.repeat(
                np.cumsum(counts) - counts, counts)
            pt_idx = order[np.repeat(lo, counts) + offs]
            out = {
                f"_p_{c}": p[f"_p_{c}"].to_numpy()[pt_idx]
                for c in point_cols
            }
            for c in payload:
                out[f"_r_{c}"] = iv[f"_r_{c}"].to_numpy()[iv_idx]
            return pd.DataFrame(out).rename(
                columns=_unprefix(point_cols, payload))

        merged = (
            tagged.repartition(num_buckets)
            .groupby("_slab")
            .map_groups(stab_slab, batch_format="pandas")
        )

    want_types = {c: p_schema.field(c).type for c in point_cols}
    want_types.update(payload_types)

    def restore(batch: pa.Table) -> pa.Table:
        cols = {}
        for c in out_names:
            col = batch.column(c)
            want = want_types[c]
            if col.type != want:
                if pa.types.is_integer(want) or pa.types.is_timestamp(want):
                    col = col.cast(pa.int64(), safe=False).cast(want)
                else:
                    col = col.cast(want)
            cols[c] = col
        return pa.table(cols)

    return merged.map_batches(restore, batch_format="pyarrow")


def _as_arrow(ds: rd.Dataset) -> tuple[rd.Dataset, pa.Schema]:
    """Return (ds, arrow schema), coercing pandas-block datasets (e.g.
    the output of ``map_groups(batch_format="pandas")``) to Arrow blocks
    so downstream batch fns see stable pyarrow types."""
    schema = ds.schema()
    schema = getattr(schema, "base_schema", schema)
    if isinstance(schema, pa.Schema):
        return ds, schema
    ds = ds.map_batches(lambda b: b, batch_format="pyarrow")
    schema = ds.schema()
    return ds, getattr(schema, "base_schema", schema)


def _unprefix(point_cols: list[str], payload: list[str]) -> dict[str, str]:
    return {f"_p_{c}": c for c in point_cols} | {f"_r_{c}": c for c in payload}


_F64_SAFE = 1 << 53


def _assert_f64_safe(col, name: str) -> None:
    """Refuse int columns whose magnitude exceeds float64's exact-int
    range: the mixed-side bucket frame null-pads them into float64, and
    values beyond ±2^53 would round silently (review finding r4)."""
    t = col.type
    if not (pa.types.is_integer(t) and t.bit_width == 64):
        return
    if col.null_count == len(col):
        return
    mm = pac.min_max(col)
    lo, hi = mm["min"].as_py(), mm["max"].as_py()
    if (hi is not None and hi > _F64_SAFE) or (
        lo is not None and lo < -_F64_SAFE
    ):
        raise ValueError(
            f"asof/interval join column {name!r} holds int64 values "
            f"beyond ±2^53; they would round through the float64 bucket "
            f"frame. Cast the column to string (or rescale ids) first."
        )


def _with_bucket(
    cols: dict, key_type: pa.DataType, num_buckets: int
) -> pa.Table:
    if pa.types.is_string(key_type) or pa.types.is_binary(key_type):
        zero = pa.scalar("", key_type)
    else:
        zero = pa.scalar(0, key_type)
    k_np = pac.fill_null(cols["_key"], zero).to_numpy(zero_copy_only=False)
    cols["_bucket"] = pa.array(
        (hash64(k_np) % np.uint64(num_buckets)).astype(np.int32)
    )
    return pa.table(cols)

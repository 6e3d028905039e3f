"""Windowed / grouped-temporal operators over the events table.

The reference is strictly request/response batch-of-one — no windows,
watermarks or late data (SURVEY.md §2.3 "Streaming-only: none").  These
operators cover the stream-shaped workloads a training-data pipeline
still needs on a bounded log: tumbling windows as vectorized
``groupby`` over a truncated-timestamp key, grouped arg-max ("latest
event per key" — the dataset promotion of the reference's
``lastResponsesByTherapy`` grouped arg-max, MTBValidators.scala:686-692)
and session windows per key.

Ordering assumption: session windows sort each key's group by
timestamp inside ``map_groups`` — correctness does not depend on input
order; skewed keys are bounded by the per-user event count.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from .groupagg import append_bucket_column


def tumbling_window_agg(
    ds: rd.Dataset,
    *,
    ts_col: str = "ts",
    key_col: str | None = "event_type",
    window: str = "day",
    value_col: str = "value",
) -> rd.Dataset:
    """Tumbling-window aggregate: truncate the timestamp to the window
    start, then one vectorized hash ``groupby`` — no per-group Python,
    no ordering requirement (the Ray analog of
    ``GROUP BY date_trunc(window, ts), key``)."""

    def add_window(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch.column(ts_col), unit=window)
        return batch.append_column("window_start", win)

    keys = ["window_start"] + ([key_col] if key_col else [])
    return (
        ds.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(keys)
        .aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="sum_value"),
            Mean(value_col, alias_name="avg_value"),
            Min(value_col, alias_name="min_value"),
            Max(value_col, alias_name="max_value"),
        )
    )


def latest_event_per_key(
    ds: rd.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> rd.Dataset:
    """Grouped arg-max: last timestamp + event count per key.
    (Reference analog: responses.groupBy(therapy)
    .map(maxBy(effectiveDate)), MTBValidators.scala:686-692.)

    Partial-aggregate inside map_batches (max-of-maxes, sum-of-counts
    are re-entrant), then merge the partial stream with the bucketed
    reduce (stages/groupagg.py).  The raw whole-table groupby paid the
    sort-exchange floor on every input block, and the native aggregate
    additionally pays a per-OUTPUT-GROUP Python cost — fatal when the
    key is near-unique (measured ~25 s for 2M int-key groups).  The
    bucketed reduce keeps parallelism at any key cardinality (ADVICE
    r3: no fixed narrow coalesce) and stays fully lazy — no
    materialize, no driver-side sizing pass."""
    from .groupagg import bucketed_group_agg

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by([key_col]).aggregate(
            [(ts_col, "max"), ([], "count_all")]
        )
        return pa.table(
            {
                key_col: g.column(key_col),
                "last_ts": g.column(f"{ts_col}_max"),
                "n_events": g.column("count_all").cast(pa.int64()),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucketed_group_agg(
        partials,
        [key_col],
        [("last_ts", "last_ts", "max"), ("n_events", "n_events", "sum")],
        partial=False,
    )


def session_windows(
    ds: rd.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 3600.0,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Session windows: per key, sort by timestamp and split where the
    gap exceeds ``gap_seconds``; emits one row per session.

    Keys are hash-bucketed (one shuffle on ``hash(key) % B``, B ≈ #CPUs)
    and each bucket sessionizes ALL its keys in one vectorized pandas
    body — sort by (key, ts), session boundary = key change OR gap —
    so per-group Python scales with #buckets, never #keys (10^9 users
    ⇒ still B Python calls)."""
    import numpy as np

    if num_buckets is None:
        import ray

        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def add_bucket(batch: pa.Table) -> pa.Table:
        # shared helper: null-stable key hashing (a nullable int batch
        # must not split a key's partition across buckets)
        return append_bucket_column(batch, [key_col], num_buckets)

    def sessionize_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col], kind="stable")
        new_key = g[key_col].ne(g[key_col].shift())
        gaps = g[ts_col].diff().dt.total_seconds().fillna(0.0)
        session_id = (new_key | (gaps > gap_seconds)).cumsum()
        out = g.groupby(session_id).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size"),
            **{key_col: (key_col, "first")},
        )
        return out.reset_index(drop=True)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(sessionize_bucket, batch_format="pandas")
    )


def sliding_window_agg(
    ds: rd.Dataset,
    *,
    ts_col: str = "ts",
    key_col: str | None = None,
    size_us: int,
    slide_us: int,
    value_col: str = "value",
) -> rd.Dataset:
    """Sliding (hopping) window aggregate: windows of ``size_us`` every
    ``slide_us`` microseconds, aligned to epoch multiples of the slide.
    ``size_us`` must be a multiple of ``slide_us``, so every event lands
    in exactly ``k = size/slide`` windows.

    Scale shape: the k-fold replication happens inside ``map_batches``
    AND is immediately collapsed to per-(window, key) PARTIALS in the
    same batch body (count/sum/min/max via lexsort + ``reduceat``), so
    the shuffle moves at most ``k × distinct(window, key)`` partial rows
    per batch — not k× the event stream.  One small hash groupby then
    merges partials; avg is derived after the merge.  No ordering
    requirement, no per-row Python."""
    import numpy as np

    if size_us % slide_us != 0:
        raise ValueError("size_us must be a multiple of slide_us")
    k = size_us // slide_us

    def partials(batch: pa.Table) -> pa.Table:
        t = batch.column(ts_col).cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).view("int64")
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        n = len(t)
        # window j of event t starts at (t//slide - j) * slide, j<k
        base = t // slide_us
        win = (
            np.repeat(base, k) - np.tile(np.arange(k, dtype=np.int64), n)
        ) * slide_us
        vv = np.repeat(v, k)
        if key_col is not None:
            keys = batch.column(key_col)
            kcodes, kuniq = (
                pd.factorize(pd.Series(keys.to_pandas()), sort=False)
            )
            # factorize codes nulls as -1, which would WRAP to the last
            # unique key on the gather below — give nulls their own
            # group (index len(kuniq), value None), matching Ray's
            # native groupby null semantics
            kcodes = kcodes.astype(np.int64)
            null_code = len(kuniq)
            kcodes[kcodes < 0] = null_code
            kuniq_vals = np.append(
                np.asarray(kuniq, dtype=object), None
            )
            kk = np.repeat(kcodes, k)
            order = np.lexsort((kk, win))
            win_s, kk_s = win[order], kk[order]
            change = np.r_[
                True, (win_s[1:] != win_s[:-1]) | (kk_s[1:] != kk_s[:-1])
            ]
        else:
            order = np.argsort(win, kind="stable")
            win_s = win[order]
            change = np.r_[True, win_s[1:] != win_s[:-1]]
        vv_s = vv[order]
        starts = np.flatnonzero(change)
        cnt = np.diff(np.r_[starts, len(vv_s)])
        sums = np.add.reduceat(vv_s, starts)
        mins = np.minimum.reduceat(vv_s, starts)
        maxs = np.maximum.reduceat(vv_s, starts)
        out = {
            "window_start": pa.array(
                win_s[starts].view("datetime64[us]")
            ),
            "_n": pa.array(cnt.astype(np.int64)),
            "_sum": pa.array(sums),
            "_min": pa.array(mins),
            "_max": pa.array(maxs),
        }
        if key_col is not None:
            out[key_col] = pa.array(
                kuniq_vals[kk_s[starts]]
            ).cast(batch.schema.field(key_col).type)
        return pa.table(out)

    keys = ["window_start"] + ([key_col] if key_col else [])
    merged = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(keys)
        .aggregate(
            Sum("_n", alias_name="n_events"),
            Sum("_sum", alias_name="sum_value"),
            Min("_min", alias_name="min_value"),
            Max("_max", alias_name="max_value"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        avg = pc.divide(
            batch.column("sum_value"),
            pc.cast(batch.column("n_events"), pa.float64()),
        )
        return batch.append_column("avg_value", avg)

    return merged.map_batches(finish, batch_format="pyarrow")


def rolling_window_per_key(
    ds: rd.Dataset,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_rows: int,
    tiebreak_col: str | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Row-based rolling aggregate per key: for each row, the
    count/sum of the last ``window_rows`` rows of the SAME key ordered
    by ``(ts, tiebreak)`` — the SQL ``ROWS BETWEEN w-1 PRECEDING AND
    CURRENT ROW`` window, as a distributed operator.

    Keys are hash-bucketed (one shuffle); each bucket computes every
    key's rolling windows in one vectorized pandas body (grouped
    ``rolling`` over the bucket-sorted frame).  Per-key state never
    crosses buckets, so this scales with #keys, bounded per worker by
    the hottest key's row count (same contract as ``session_windows``)."""
    if num_buckets is None:
        import ray

        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def add_bucket(batch: pa.Table) -> pa.Table:
        # shared helper: null-stable key hashing (a nullable int batch
        # must not split a key's partition across buckets)
        return append_bucket_column(batch, [key_col], num_buckets)

    order = [key_col, ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def roll_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(order, kind="stable").reset_index(drop=True)
        # dropna=False: a null key must form its own rolling partition —
        # the default silently DROPS those rows and the shorter result
        # then fails to align with g (review finding r4)
        r = g.groupby(key_col, sort=False, dropna=False)[value_col].rolling(
            window_rows, min_periods=1
        )
        g["roll_n"] = r.count().to_numpy().astype("int64")
        g["roll_sum"] = r.sum().to_numpy()
        return g.drop(columns=["_bucket"])

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(roll_bucket, batch_format="pandas")
    )


def ranked_window_per_key(
    ds: rd.Dataset,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Ranked running window per key: ``row_num`` (1-based rank by
    ``(ts, tiebreak)`` within the key) and ``run_sum`` (cumulative sum
    of ``value`` in that order) — SQL ``ROW_NUMBER() OVER w`` and
    ``SUM(value) OVER (w ROWS UNBOUNDED PRECEDING)``, distributed.

    Same physical shape as ``rolling_window_per_key``: ONE key-hash
    bucket shuffle, then each bucket ranks all its keys in one
    vectorized pandas body (sort + grouped cumcount/cumsum).  Null
    keys form their own partition (``dropna=False``)."""
    if num_buckets is None:
        import ray

        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def add_bucket(batch: pa.Table) -> pa.Table:
        # shared helper: null-stable key hashing (a nullable int batch
        # must not split a key's partition across buckets)
        return append_bucket_column(batch, [key_col], num_buckets)

    order = [key_col, ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def rank_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(order, kind="stable").reset_index(drop=True)
        gb = g.groupby(key_col, sort=False, dropna=False)
        g["row_num"] = (gb.cumcount() + 1).astype("int64")
        g["run_sum"] = gb[value_col].cumsum()
        return g.drop(columns=["_bucket"])

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(rank_bucket, batch_format="pandas")
    )


def ntile_per_key(
    ds: rd.Dataset,
    *,
    key_col: str,
    ts_col: str,
    n_tiles: int,
    tiebreak_col: str | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """SQL ``NTILE(n) OVER (PARTITION BY key ORDER BY ts, tiebreak)``,
    distributed: one key-hash bucket shuffle, then each bucket tiles
    all its keys vectorized.  Exact SQL remainder semantics — with
    ``c`` rows and ``q, r = divmod(c, n)``, the first ``r`` tiles get
    ``q+1`` rows, the rest ``q``.  Null keys tile as their own
    partition."""
    if num_buckets is None:
        import ray

        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def add_bucket(batch: pa.Table) -> pa.Table:
        # shared helper: null-stable key hashing (a nullable int batch
        # must not split a key's partition across buckets)
        return append_bucket_column(batch, [key_col], num_buckets)

    order = [key_col, ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def tile_bucket(group: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = group.sort_values(order, kind="stable").reset_index(drop=True)
        gb = g.groupby(key_col, sort=False, dropna=False)
        row0 = gb.cumcount().to_numpy()  # 0-based rank within key
        cnt = gb[key_col].transform("size").to_numpy()
        # fill null-key rows (transform yields NaN count for the null
        # group under dropna-default paths) defensively, then SQL tile
        cnt = np.nan_to_num(cnt, nan=0).astype(np.int64)
        q, r = cnt // n_tiles, cnt % n_tiles
        big = r * (q + 1)  # rows covered by the (q+1)-sized tiles
        in_big = row0 < big
        with np.errstate(divide="ignore", invalid="ignore"):
            tile_big = row0 // np.maximum(q + 1, 1)
            tile_small = r + (row0 - big) // np.maximum(q, 1)
        g["tile"] = (np.where(in_big, tile_big, tile_small) + 1).astype(
            "int64"
        )
        return g.drop(columns=["_bucket"])

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(tile_bucket, batch_format="pandas")
    )


def lag_lead_per_key(
    ds: rd.Dataset,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """SQL ``LAG(value)`` / ``LEAD(value)`` and the inter-event time
    delta per key over ``(ts, tiebreak)`` order — the sessionization
    features (previous value, next value, microseconds since previous
    event; null at partition edges).  Same physical shape as the other
    per-key windows: one key-hash bucket shuffle, vectorized grouped
    ``shift`` per bucket."""
    if num_buckets is None:
        import ray

        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def add_bucket(batch: pa.Table) -> pa.Table:
        # shared helper: null-stable key hashing (a nullable int batch
        # must not split a key's partition across buckets)
        return append_bucket_column(batch, [key_col], num_buckets)

    order = [key_col, ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def shift_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(order, kind="stable").reset_index(drop=True)
        gb = g.groupby(key_col, sort=False, dropna=False)
        g["lag_value"] = gb[value_col].shift(1)
        g["lead_value"] = gb[value_col].shift(-1)
        prev_ts = gb[ts_col].shift(1)
        delta = g[ts_col] - prev_ts
        # timestamps yield Timedelta; ints subtract directly.  Convert
        # via integer microseconds — total_seconds() is a float and
        # drops sub-second precision on multi-day deltas
        if hasattr(delta.dtype, "kind") and delta.dtype.kind == "m":
            import numpy as np

            ns = delta.to_numpy()
            nat = np.isnat(ns)
            us = np.where(
                nat,
                0,
                ns.astype("timedelta64[us]").astype(np.int64),
            ).astype(np.float64)
            g["delta_us"] = np.where(nat, np.nan, us)
        else:
            g["delta_us"] = delta.astype("float64")
        return g.drop(columns=["_bucket"])

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(shift_bucket, batch_format="pandas")
    )


def percent_rank_per_key(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """SQL ``PERCENT_RANK()`` and ``CUME_DIST()`` over
    ``(PARTITION BY key ORDER BY value)`` — rank-based feature scaling.
    Ties follow SQL semantics exactly: percent_rank uses the MIN rank
    of the tie group over (n−1), cume_dist the MAX rank over n, so both
    are ratios of integers and hash-compare exactly against the oracle.
    Rows with a null key or value are EXCLUDED from the output (the SQL
    analog windows over a ``WHERE value IS NOT NULL`` subquery); a
    single-row key gets percent_rank 0.  Same physical shape as the
    other per-key windows: one key-hash bucket shuffle, one vectorized
    pandas body per bucket."""
    import numpy as np

    if num_buckets is None:
        import ray

        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def keep(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.is_valid(batch.column(key_col)),
            pc.is_valid(batch.column(value_col)),
        )
        return batch.filter(ok)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return append_bucket_column(batch, [key_col], num_buckets)

    def rank_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns=["_bucket"]).reset_index(drop=True)
        gb = g.groupby(key_col, sort=False)
        rmin = gb[value_col].rank(method="min").to_numpy()
        rmax = gb[value_col].rank(method="max").to_numpy()
        n = gb[key_col].transform("size").to_numpy().astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            pr = np.where(n > 1, (rmin - 1) / (n - 1), 0.0)
        g["pr"] = pr
        g["cd"] = rmax / n
        return g

    return (
        ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(rank_bucket, batch_format="pandas")
    )


def argmax_row_per_key(
    ds: rd.Dataset,
    *,
    key_col: str,
    order_col: str,
    tiebreak_col: str | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Full-row grouped arg-max: each key's ENTIRE row at the maximum
    ``(order_col, tiebreak_col)`` — the SQL ``row_number() OVER
    (PARTITION BY key ORDER BY order DESC, tiebreak DESC) = 1`` pattern
    (``latest_event_per_key`` keeps only (max ts, count); this keeps
    the payload columns).  Distributed as partial-argmax inside each
    batch (per-key tail of a vectorized sort — max-of-maxes is
    re-entrant) then one bucketed reduce, so the shuffle carries at
    most one row per (key, batch).  Rows with a null key or null order
    value are excluded; without ``tiebreak_col`` ties resolve
    arbitrarily (pass one for determinism)."""
    if num_buckets is None:
        import ray

        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    order = [key_col, order_col] + ([tiebreak_col] if tiebreak_col else [])

    def partial(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.is_valid(batch.column(key_col)),
            pc.is_valid(batch.column(order_col)),
        )
        batch = batch.filter(ok)
        if batch.num_rows == 0:
            return batch
        g = (
            batch.to_pandas()
            .sort_values(order, kind="stable")
            .groupby(key_col, sort=False)
            .tail(1)
        )
        return pa.Table.from_pandas(
            g, schema=batch.schema, preserve_index=False
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return append_bucket_column(batch, [key_col], num_buckets)

    def reduce_bucket(tbl: pa.Table) -> pa.Table:
        want = tbl.schema
        idx = want.get_field_index("_bucket")
        want = want.remove(idx)
        g = (
            tbl.to_pandas()
            .drop(columns=["_bucket"])
            .sort_values(order, kind="stable")
            .groupby(key_col, sort=False)
            .tail(1)
        )
        return pa.Table.from_pandas(g, schema=want, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pyarrow")
    )


def mode_per_key(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Most frequent value per key (grouped MODE), deterministic ties:
    highest count wins, equal counts resolve to the SMALLEST value.
    Two-level reduce: per-batch (key, value) partial counts, one
    bucketed exchange keyed on ``key`` (so a key's counts co-locate),
    then a vectorized per-bucket count-merge + arg-max — never a
    per-group Python call, never a full-row shuffle.  Null keys or
    values are excluded."""
    import numpy as np

    if num_buckets is None:
        import ray

        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def partial(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.is_valid(batch.column(key_col)),
            pc.is_valid(batch.column(value_col)),
        )
        t = batch.select([key_col, value_col]).filter(ok)
        g = t.group_by([key_col, value_col]).aggregate([([], "count_all")])
        return pa.table(
            {
                key_col: g.column(key_col),
                value_col: g.column(value_col),
                "_n": g.column("count_all").cast(pa.int64()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return append_bucket_column(batch, [key_col], num_buckets)

    def mode_bucket(tbl: pa.Table) -> pa.Table:
        want = pa.schema(
            [
                tbl.schema.field(key_col),
                tbl.schema.field(value_col).with_name("mode_value"),
                pa.field("n", pa.int64()),
            ]
        )
        g = (
            tbl.to_pandas()
            .groupby([key_col, value_col], sort=False)["_n"]
            .sum()
            .reset_index()
        )
        # arg-max with deterministic ties: sort by (key, -n, value) and
        # take the first row per key
        g = g.sort_values(
            [key_col, "_n", value_col], ascending=[True, False, True],
            kind="stable",
        ).groupby(key_col, sort=False).head(1)
        out = g.rename(columns={value_col: "mode_value", "_n": "n"})
        return pa.Table.from_pandas(out, schema=want, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(mode_bucket, batch_format="pyarrow")
    )


def transition_counts(
    ds: rd.Dataset,
    *,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Markov transition counts: for each key's event sequence in
    ``(ts, tiebreak)`` order, count consecutive ``(from_state,
    to_state)`` pairs over ALL keys — the sequence-mining staple (user
    journeys, token bigrams).  One key-hash bucket shuffle co-locates
    each key's events; each bucket forms pairs with a vectorized
    grouped shift, collapses them to partial counts, and one final
    small groupby merges buckets.  Rows with null key/state/ts are
    excluded; sequences shorter than 2 emit nothing."""
    if num_buckets is None:
        import ray

        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    order = [key_col, ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def keep(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.and_(
                pc.is_valid(batch.column(key_col)),
                pc.is_valid(batch.column(state_col)),
            ),
            pc.is_valid(batch.column(ts_col)),
        )
        cols = [key_col, state_col, ts_col] + (
            [tiebreak_col] if tiebreak_col else []
        )
        return batch.select(cols).filter(ok)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return append_bucket_column(batch, [key_col], num_buckets)

    def pairs_bucket(tbl: pa.Table) -> pa.Table:
        state_type = tbl.schema.field(state_col).type
        want = pa.schema(
            [
                pa.field("from_state", state_type),
                pa.field("to_state", state_type),
                pa.field("n", pa.int64()),
            ]
        )
        g = (
            tbl.to_pandas()
            .sort_values(order, kind="stable")
            .reset_index(drop=True)
        )
        gb = g.groupby(key_col, sort=False)
        frm = gb[state_col].shift(1)
        mask = frm.notna() & (
            gb.ngroup().shift(1) == gb.ngroup()
        )  # same key as previous row
        p = (
            pd.DataFrame({"from_state": frm[mask], "to_state": g[state_col][mask]})
            .groupby(["from_state", "to_state"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(p, schema=want, preserve_index=False)

    pairs = (
        ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(pairs_bucket, batch_format="pyarrow")
    )
    from .groupagg import bucketed_group_agg

    return bucketed_group_agg(
        pairs, ["from_state", "to_state"], [("n", "n", "sum")], partial=False
    )


def topk_rows_per_key(
    ds: rd.Dataset,
    *,
    key_col: str,
    order_col: str,
    k: int,
    tiebreak_col: str | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """The k full rows with the LARGEST ``(order_col, tiebreak_col)``
    per key, plus their 1-based ``rank`` (1 = largest) — the SQL
    ``row_number() OVER (PARTITION BY key ORDER BY v DESC, tie DESC)
    <= k`` pattern, generalizing ``argmax_row_per_key`` beyond k=1.
    Distributed the same way: per-batch partial top-k (vectorized sort
    + grouped tail), one bucketed reduce — the shuffle carries at most
    ``k`` rows per (key, batch).  Rows with null key/order excluded;
    pass a unique ``tiebreak_col`` for determinism."""
    import numpy as np

    if num_buckets is None:
        import ray

        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    order = [key_col, order_col] + ([tiebreak_col] if tiebreak_col else [])

    def partial(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.is_valid(batch.column(key_col)),
            pc.is_valid(batch.column(order_col)),
        )
        batch = batch.filter(ok)
        if batch.num_rows == 0:
            return batch
        g = (
            batch.to_pandas()
            .sort_values(order, kind="stable")
            .groupby(key_col, sort=False)
            .tail(k)
        )
        return pa.Table.from_pandas(
            g, schema=batch.schema, preserve_index=False
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return append_bucket_column(batch, [key_col], num_buckets)

    def reduce_bucket(tbl: pa.Table) -> pa.Table:
        want = tbl.schema.remove(tbl.schema.get_field_index("_bucket"))
        want = want.append(pa.field("rank", pa.int64()))
        g = (
            tbl.to_pandas()
            .drop(columns=["_bucket"])
            .sort_values(order, kind="stable", ascending=False)
            .groupby(key_col, sort=False)
            .head(k)
        )
        # descending sort puts the largest first; cumcount ranks it 1
        g["rank"] = (
            g.groupby(key_col, sort=False).cumcount() + 1
        ).astype(np.int64)
        return pa.Table.from_pandas(g, schema=want, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pyarrow")
    )


def funnel_counts(
    ds: rd.Dataset,
    *,
    key_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Ordered funnel: for each step ``i``, how many keys performed
    ``steps[0..i]`` as a STRICTLY time-increasing chain (each step
    after the earliest feasible time of the previous one) — the
    product-analytics conversion funnel, promoted to one key-hash
    bucket shuffle.  Each bucket resolves all its keys vectorized
    (per-step masked ``minimum.at`` over user codes — k passes, no
    per-user Python); per-bucket step counts then merge in one tiny
    bounded groupby.  Rows with null key/type/ts are excluded."""
    import numpy as np

    if num_buckets is None:
        import ray

        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    _SENT = np.int64(1 << 62)

    def keep(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.and_(
                pc.is_valid(batch.column(key_col)),
                pc.is_valid(batch.column(type_col)),
            ),
            pc.is_valid(batch.column(ts_col)),
        )
        return batch.select([key_col, type_col, ts_col]).filter(ok)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return append_bucket_column(batch, [key_col], num_buckets)

    def funnel_bucket(tbl: pa.Table) -> pa.Table:
        ts = (
            tbl.column(ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        types = tbl.column(type_col).to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(
            pd.Series(tbl.column(key_col).to_pandas())
        )
        n_users = len(uniq)
        prev = np.full(n_users, -_SENT, dtype=np.int64)
        counts = []
        for s in steps:
            mask = (types == s) & (ts > prev[codes])
            t = np.full(n_users, _SENT, dtype=np.int64)
            if mask.any():
                np.minimum.at(t, codes[mask], ts[mask])
            reached = t != _SENT
            counts.append(int(reached.sum()))
            # unreached users block all later steps (ts > SENT is never
            # true), reached users must beat their step-i time
            prev = np.where(reached, t, _SENT)
        return pa.table(
            {
                "step": pa.array(
                    np.arange(1, len(steps) + 1, dtype=np.int64)
                ),
                "step_type": pa.array(steps, pa.string()),
                "n_users": pa.array(np.array(counts, dtype=np.int64)),
            }
        )

    partials = (
        ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(funnel_bucket, batch_format="pyarrow")
    )
    # ≤ len(steps) groups: the native bounded aggregate is fine here
    return (
        partials.groupby(["step", "step_type"])
        .sum("n_users")
        .map_batches(
            lambda t: pa.table(
                {
                    "step": t.column("step"),
                    "step_type": t.column("step_type"),
                    "n_users": t.column("sum(n_users)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def string_agg_per_key(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    sep: str = ",",
    distinct: bool = False,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """SQL ``string_agg(value, sep ORDER BY value)`` per key — the
    grouped ordered concat.  One key-hash bucket shuffle; each bucket
    sorts once, finds group boundaries with a shifted compare, wraps
    the value buffer as ``ListArray`` slices and joins with ONE Arrow
    ``binary_join`` call — no per-group Python string building.  Null
    keys/values are excluded; ``distinct=True`` drops duplicate
    (key, value) pairs before joining (pre-dedupe, matching a SQL
    DISTINCT subquery)."""
    import numpy as np

    if num_buckets is None:
        import ray

        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def keep(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.is_valid(batch.column(key_col)),
            pc.is_valid(batch.column(value_col)),
        )
        return batch.select([key_col, value_col]).filter(ok)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return append_bucket_column(batch, [key_col], num_buckets)

    def concat_bucket(tbl: pa.Table) -> pa.Table:
        t = tbl.drop_columns(["_bucket"]).combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], t.schema.field(key_col).type),
                    "agg": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(
            t,
            sort_keys=[(key_col, "ascending"), (value_col, "ascending")],
        )
        t = t.take(idx).combine_chunks()
        keys = t.column(key_col).chunk(0) if t.column(key_col).num_chunks else t.column(key_col)
        vals = t.column(value_col)
        n = len(t)
        same_key = np.zeros(n, dtype=bool)
        if n > 1:
            same_key[1:] = pc.equal(
                keys.slice(1), keys.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        if distinct and n > 1:
            same_val = np.zeros(n, dtype=bool)
            same_val[1:] = pc.equal(
                vals.combine_chunks().slice(1),
                vals.combine_chunks().slice(0, n - 1),
            ).to_numpy(zero_copy_only=False)
            keep_mask = ~(same_key & same_val)
            t = t.filter(pa.array(keep_mask)).combine_chunks()
            keys = t.column(key_col).chunk(0) if t.column(key_col).num_chunks else t.column(key_col)
            vals = t.column(value_col)
            n = len(t)
            same_key = np.zeros(n, dtype=bool)
            if n > 1:
                same_key[1:] = pc.equal(
                    keys.slice(1), keys.slice(0, n - 1)
                ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(~same_key)
        offsets = np.r_[starts, n].astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets), vals.combine_chunks()
        )
        joined = pc.binary_join(lists, sep)
        counts = np.diff(offsets).astype(np.int64)
        return pa.table(
            {
                key_col: keys.take(pa.array(starts.astype(np.int64))),
                "agg": joined,
                "n": pa.array(counts),
            }
        )

    return (
        ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(concat_bucket, batch_format="pyarrow")
    )

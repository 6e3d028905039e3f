"""Streaming keyed session windows with watermarks.

The reference is strictly batch-of-one (SURVEY.md §2.3 "Streaming-only:
none") and `stages/windows.py` covers the bounded-log case with one
shuffle.  This stage covers the UNBOUNDED-log semantics a training-data
ingest pipeline needs — per-key session state that lives across
batches, closed by an advancing watermark — which Ray Data's Dataset
API cannot express (state must survive between batches of a never-
ending stream).  Per the brief's escalation ladder this is the
deliberate raw-actor design: N ``@ray.remote`` shard actors each own
``hash(key) % N`` of the key space (the same partitioning contract as
stages/hashreduce.py).

Two ingest frontends share the shard actors:

* ``StreamingSessionizer`` — driver-fed bounded-log replay harness
  (``feed`` batches in arrival order, then ``finish``).  Deterministic
  late-event accounting; good for tests and replays.
* ``stream_sessions_distributed`` — the scale path: ``M`` parallel
  feeder TASKS each consume a ``streaming_split`` iterator and route
  key-sliced batches DIRECTLY to the shard actors; the driver only
  launches feeders and merges results.  A zero-CPU watermark actor
  folds per-feeder progress (watermark = min over feeders of local max
  event time − allowed lateness, the multi-channel watermark rule) so
  shard state stays bounded on an unbounded log.

Session state is a per-key list of disjoint INTERVALS ``(start, last,
n_events)`` pairwise separated by more than ``gap``.  New events merge
by gap-chained interval union — an order-independent fold, so the
result equals offline sessionization over the accepted events no
matter how batches interleave across feeders (adding events to a set
can only ever merge sessions, never split them).  This also fixes the
cross-batch bug where an out-of-order event more than ``gap`` BEFORE an
open session's start was glued onto it (ADVICE r2: gap=10s,
lateness=600s, events t=1000s then t=500s must yield TWO sessions).

Semantics (event-time):
* rows with ``ts < watermark − gap`` at arrival are LATE: counted and
  side-channelled, never silently dropped;
* an interval closes when ``last < watermark − 2·gap`` — beyond that no
  acceptable event (``ts ≥ watermark − gap``) can chain to it on either
  side, so early emission can never disagree with offline results;
* ``flush()`` closes all remaining sessions at end-of-stream;
* closed sessions over the ACCEPTED event set equal the offline
  ``windows.session_windows`` result (asserted in tests, including
  shuffled arrival orders).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray

from ..functions.sketches import hash64

SESSION_SCHEMA = pa.schema(
    [
        pa.field("key", pa.string()),
        pa.field("session_start", pa.timestamp("us")),
        pa.field("session_end", pa.timestamp("us")),
        pa.field("n_events", pa.int64()),
    ]
)

_NEG_INF = -(1 << 62)


def _empty_sessions() -> pa.Table:
    return SESSION_SCHEMA.empty_table()


# zero reserved CPUs: shard actors are mailbox state holders (brief
# vectorized folds); positive reservations can starve the upstream
# read/sort tasks on small clusters (see stages/hashreduce.py)
@ray.remote(num_cpus=0)
class SessionShard:
    """Owns the open-session state for its slice of the key space."""

    def __init__(self, key_col: str, ts_col: str, gap_seconds: float):
        import pandas as pd

        self.key_col, self.ts_col = key_col, ts_col
        self.gap_us = int(gap_seconds * 1_000_000)
        # open intervals as PARALLEL ARRAYS (code → key via key_index):
        # disjoint per code, pairwise separated by > gap, sorted by
        # (code, start).  The former dict-of-lists state cost a Python
        # `_merge` per key per batch plus a full Python scan in
        # `_close_expired` — the shard hot loop (ROADMAP r4 #3); every
        # per-batch step below is one lexsort + grouped-cummax chain
        # merge + reduceat, O(open+batch) vectorized.
        self.key_index: "pd.Index" = pd.Index([], dtype=object)
        self.iv_code = np.empty(0, dtype=np.int64)
        self.iv_start = np.empty(0, dtype=np.int64)
        self.iv_last = np.empty(0, dtype=np.int64)
        self.iv_n = np.empty(0, dtype=np.int64)
        self.n_late = 0
        self.n_null_keys = 0
        # max watermark THIS SHARD has seen — lateness and closes must
        # use the same monotone clock, or (multi-feeder) an event judged
        # against one feeder's stale watermark could chain into an
        # interval another feeder's newer watermark already closed
        self.max_wm_us = _NEG_INF

    def _merge_segments(
        self, seg_code: np.ndarray, seg_s: np.ndarray,
        seg_e: np.ndarray, seg_n: np.ndarray,
    ) -> None:
        """Gap-chained interval union of (state ∪ new segments) —
        order-independent, so arrival order across batches/feeders
        cannot change the final result.  Fully vectorized, and only the
        TOUCHED slice of the state (keys present in this batch) enters
        the sort: untouched open intervals pass through unchanged, so
        per-batch cost is O(state) boolean masking + O(touched·log)
        merge, never a re-sort of the whole key space."""
        touched_lut = np.zeros(len(self.key_index), dtype=bool)
        touched_lut[seg_code] = True
        hit = touched_lut[self.iv_code] if len(self.iv_code) else np.empty(0, bool)
        keep = ~hit
        code = np.concatenate([self.iv_code[hit], seg_code])
        start = np.concatenate([self.iv_start[hit], seg_s])
        last = np.concatenate([self.iv_last[hit], seg_e])
        cnt = np.concatenate([self.iv_n[hit], seg_n])
        order = np.lexsort((start, code))
        code, start, last, cnt = (
            code[order], start[order], last[order], cnt[order]
        )
        # chain rule needs the running max of `last` WITHIN each key:
        # two interleaved disjoint interval sets can nest (a long open
        # interval spanning several new segments), so the previous
        # element's `last` alone is not enough.  Grouped cummax in pure
        # numpy: remap groups to ranks, offset each rank into its own
        # value band, one global maximum.accumulate — later bands are
        # strictly larger, so earlier groups can never leak in.
        grp_start = np.empty(len(code), dtype=bool)
        grp_start[0] = True
        grp_start[1:] = code[1:] != code[:-1]
        g = np.cumsum(grp_start) - 1
        base = int(last.min())
        span = int(last.max()) - base + 1
        n_groups = int(g[-1]) + 1
        if n_groups * span < (1 << 62):
            y = (last - base) + g * span
            run_max = np.maximum.accumulate(y) - g * span + base
        else:  # astronomically wide ts range: exact but slower path
            import pandas as pd

            run_max = (
                pd.Series(last).groupby(pd.Series(code), sort=False)
                .cummax().to_numpy()
            )
        new_chain = grp_start.copy()
        new_chain[1:] |= start[1:] > run_max[:-1] + self.gap_us
        starts_idx = np.flatnonzero(new_chain)
        self.iv_code = np.concatenate([self.iv_code[keep], code[starts_idx]])
        self.iv_start = np.concatenate([self.iv_start[keep], start[starts_idx]])
        self.iv_last = np.concatenate(
            [self.iv_last[keep], np.maximum.reduceat(last, starts_idx)]
        )
        self.iv_n = np.concatenate(
            [self.iv_n[keep], np.add.reduceat(cnt, starts_idx)]
        )

    def _close_expired(self, watermark_us: int) -> pa.Table:
        # safe-close rule: any future ACCEPTED event has
        # ts ≥ watermark − gap, and chains to an interval only within
        # gap of either end — so last < watermark − 2·gap is untouchable
        cutoff = watermark_us - 2 * self.gap_us
        done = self.iv_last < cutoff
        if not done.any():
            return _empty_sessions()
        out = self._to_table(
            self.iv_code[done], self.iv_start[done],
            self.iv_last[done], self.iv_n[done],
        )
        keep = ~done
        self.iv_code = self.iv_code[keep]
        self.iv_start = self.iv_start[keep]
        self.iv_last = self.iv_last[keep]
        self.iv_n = self.iv_n[keep]
        return out

    def on_batch(
        self, table: pa.Table, arrival_watermark_us: int, watermark_us: int
    ) -> pa.Table:
        """Fold one batch into the state; emit sessions closed by the
        advanced watermark.  Lateness is judged against the watermark AT
        ARRIVAL (before this batch advanced it) — a batch can never make
        its own events late."""
        # the shard's clock is monotone over everything it has seen —
        # arrival lateness is judged against it (never a stale feeder
        # watermark), so an accepted event can never chain into an
        # interval a newer watermark already closed
        self.max_wm_us = max(self.max_wm_us, arrival_watermark_us)
        if table.num_rows:
            import pandas as pd

            keys = table.column(self.key_col).to_numpy(zero_copy_only=False)
            ts = (
                table.column(self.ts_col)
                .cast(pa.timestamp("us"))
                .to_numpy(zero_copy_only=False)
                .astype("int64")
            )
            # null keys cannot be sessionized: factorize would code
            # them -1, colliding with valid codes downstream (review
            # finding) — drop them with an explicit counter instead
            null_keys = pd.isna(keys)
            if null_keys.any():
                self.n_null_keys += int(null_keys.sum())
                keys, ts = keys[~null_keys], ts[~null_keys]
            late = ts < (self.max_wm_us - self.gap_us)
            self.n_late += int(late.sum())
            if late.any():
                keys, ts = keys[~late], ts[~late]
            if len(ts):
                # vectorized segment detection over one (key, ts) sort:
                # a new segment starts on a key change or an in-batch gap
                codes, uniq = pd.factorize(keys)
                # keys are registered as STRINGS (the session schema's
                # key column); coerce uniques once, then re-factorize so
                # distinct raws colliding as strings merge exactly like
                # the former str()-keyed dict did
                codes2, uniq2 = pd.factorize(pd.Index(uniq).astype(str))
                batch_codes = codes2[codes]
                gidx = self.key_index.get_indexer(uniq2)
                miss = gidx == -1
                if miss.any():
                    base = len(self.key_index)
                    self.key_index = self.key_index.append(uniq2[miss])
                    gidx[miss] = np.arange(base, len(self.key_index))
                order = np.lexsort((ts, batch_codes))
                c, t = batch_codes[order], ts[order]
                start_flag = np.empty(len(c), dtype=bool)
                start_flag[0] = True
                start_flag[1:] = (c[1:] != c[:-1]) | ((t[1:] - t[:-1]) > self.gap_us)
                starts = np.flatnonzero(start_flag)
                ends = np.concatenate([starts[1:], [len(c)]])
                self._merge_segments(
                    gidx[c[starts]], t[starts], t[ends - 1],
                    (ends - starts).astype(np.int64),
                )
        self.max_wm_us = max(self.max_wm_us, watermark_us)
        return self._close_expired(self.max_wm_us)

    def advance(self, watermark_us: int) -> pa.Table:
        """Watermark-only tick for shards that received no rows this
        batch — idle sessions still expire."""
        self.max_wm_us = max(self.max_wm_us, watermark_us)
        return self._close_expired(self.max_wm_us)

    def flush(self) -> pa.Table:
        out = self._to_table(self.iv_code, self.iv_start, self.iv_last, self.iv_n)
        self.iv_code = np.empty(0, dtype=np.int64)
        self.iv_start = np.empty(0, dtype=np.int64)
        self.iv_last = np.empty(0, dtype=np.int64)
        self.iv_n = np.empty(0, dtype=np.int64)
        return out

    def late_count(self) -> int:
        return self.n_late

    def null_key_count(self) -> int:
        return self.n_null_keys

    def _to_table(
        self, code: np.ndarray, start: np.ndarray,
        last: np.ndarray, n: np.ndarray,
    ) -> pa.Table:
        if len(code) == 0:
            return _empty_sessions()
        return pa.table(
            {
                "key": pa.array(
                    self.key_index.take(code).to_numpy(), pa.string()
                ),
                "session_start": pa.array(start.astype("datetime64[us]")),
                "session_end": pa.array(last.astype("datetime64[us]")),
                "n_events": pa.array(n, pa.int64()),
            },
            schema=SESSION_SCHEMA,
        )


@dataclass
class StreamResult:
    sessions: pa.Table
    n_late: int
    n_null_keys: int = 0
    # distributed path only: the largest closed-session row count any
    # feeder ever held in memory before spilling — the bounded-state
    # evidence (flat across stream length, asserted in tests)
    peak_feeder_buffer_rows: int = 0
    # set when ``output_dir`` routed closed sessions to parquet parts
    # instead of the in-memory table (the unbounded-log sink)
    session_files: list[str] | None = None


def _default_num_shards() -> int:
    # shards are the STATE-CAPACITY axis (each owns a key-space slice);
    # after the r4 array-state fold the per-event compute is so cheap
    # that more shards mostly mean smaller per-call slices — 4-8 shards
    # measured FASTER than 16 on a 1M-event log (504k vs 354k ev/s at
    # batch_size=64k).  Default to a modest count; raise it when open-
    # key state per shard, not wall time, is the concern.
    return max(2, min(int(ray.cluster_resources().get("CPU", 8)), 8))


def _route_batch(
    batch: pa.Table, key_col: str, n: int
) -> tuple[np.ndarray, np.ndarray]:
    keys = batch.column(key_col).to_numpy(zero_copy_only=False)
    shard = (hash64(keys) % np.uint64(n)).astype(np.int64)
    return shard, np.unique(shard)


def _split_batch(
    batch: pa.Table, key_col: str, n: int
) -> list[tuple[int, pa.Table]]:
    """Split one batch into per-shard slices with ONE stable sort +
    take, then zero-copy slices — the former per-shard ``filter`` made
    #shards full passes over the batch and was the feeder's routing
    cost (ROADMAP r4 #4).  Stable order preserves within-shard arrival
    order, so results are unchanged."""
    shard, _ = _route_batch(batch, key_col, n)
    order = np.argsort(shard, kind="stable")
    sorted_batch = batch.take(pa.array(order))
    bounds = np.searchsorted(shard[order], np.arange(n + 1))
    return [
        (s, sorted_batch.slice(bounds[s], bounds[s + 1] - bounds[s]))
        for s in range(n)
        if bounds[s + 1] > bounds[s]
    ]


class StreamingSessionizer:
    """Driver-side coordinator: route event batches to shard actors and
    advance the watermark.  ``feed`` any number of Arrow batches (a live
    source, ``ds.iter_batches``, a socket reader…), then ``finish``.
    Bounded-replay harness — for parallel ingest at scale use
    ``stream_sessions_distributed``."""

    def __init__(
        self,
        *,
        key_col: str = "user_id",
        ts_col: str = "ts",
        gap_seconds: float = 3600.0,
        allowed_lateness_seconds: float = 0.0,
        num_shards: int | None = None,
    ):
        if num_shards is None:
            num_shards = _default_num_shards()
        self.key_col, self.ts_col = key_col, ts_col
        self.lateness_us = int(allowed_lateness_seconds * 1_000_000)
        self.shards = [
            SessionShard.remote(key_col, ts_col, gap_seconds)
            for _ in range(num_shards)
        ]
        self.n = num_shards
        self.watermark_us = _NEG_INF
        self.closed: list[pa.Table] = []

    def feed(self, batch: pa.Table) -> None:
        if batch.num_rows == 0:
            return
        slices = _split_batch(batch, self.key_col, self.n)
        ts = (
            batch.column(self.ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("int64")
        )
        # watermark: max event time seen, minus allowed lateness;
        # lateness of THIS batch's rows is judged against the watermark
        # as it stood on arrival
        arrival_wm = self.watermark_us
        self.watermark_us = max(self.watermark_us, int(ts.max()) - self.lateness_us)
        hit_set = {s for s, _ in slices}
        refs = [
            self.shards[s].on_batch.remote(sl, arrival_wm, self.watermark_us)
            for s, sl in slices
        ]
        # shards with no rows this batch still see the watermark advance
        refs.extend(
            self.shards[s].advance.remote(self.watermark_us)
            for s in range(self.n)
            if s not in hit_set
        )
        self.closed.extend(t for t in ray.get(refs) if t.num_rows)

    def finish(self) -> StreamResult:
        self.closed.extend(
            t for t in ray.get([s.flush.remote() for s in self.shards]) if t.num_rows
        )
        n_late = sum(ray.get([s.late_count.remote() for s in self.shards]))
        n_null = sum(ray.get([s.null_key_count.remote() for s in self.shards]))
        for s in self.shards:
            ray.kill(s)
        out = (
            pa.concat_tables(self.closed) if self.closed else _empty_sessions()
        )
        return StreamResult(
            sessions=out.sort_by(
                [("key", "ascending"), ("session_start", "ascending")]
            ),
            n_late=n_late,
            n_null_keys=n_null,
        )


# --- distributed ingest (driver out of the hot path) -----------------------


@ray.remote(num_cpus=0)
class _WatermarkActor:
    """Multi-channel watermark: global = min over LIVE feeders of
    (local max event time) − lateness.  Zero-CPU mailbox actor.

    Every feeder id is seeded at construction and a feeder that
    exhausts its source reports ``finish`` — a done channel can emit
    nothing further, so its watermark is +∞ and it drops out of the
    min.  Without both, a feeder handed an empty ``streaming_split``
    (equal=False can produce one) or one that drains early would
    freeze the global watermark at −∞ forever, so no session would
    close before flush and shard state would grow unbounded — exactly
    the guarantee the distributed path exists for (ADVICE r3)."""

    def __init__(self, n_feeders: int, lateness_us: int):
        self.lateness_us = lateness_us
        self.maxes: dict[int, int] = {i: _NEG_INF for i in range(n_feeders)}
        self.done: set[int] = set()

    def _wm(self) -> int:
        live = [v for i, v in self.maxes.items() if i not in self.done]
        if not live:
            # all channels done: watermark = max progress ever seen
            hi = max(self.maxes.values(), default=_NEG_INF)
            return _NEG_INF if hi == _NEG_INF else hi - self.lateness_us
        lo = min(live)
        return _NEG_INF if lo == _NEG_INF else lo - self.lateness_us

    def update(self, feeder_id: int, local_max_us: int) -> int:
        self.maxes[feeder_id] = max(
            self.maxes.get(feeder_id, _NEG_INF), local_max_us
        )
        return self._wm()

    def finish(self, feeder_id: int) -> int:
        self.done.add(feeder_id)
        return self._wm()


@ray.remote
def _feeder(
    it,
    shards: list,
    wm_actor,
    feeder_id: int,
    key_col: str,
    ts_col: str,
    batch_size: int,
    max_inflight: int,
    spill_rows: int,
    output_dir: str | None,
) -> tuple[list, int, int]:
    """One ingest channel: consume a streaming_split iterator, route
    key-sliced batches DIRECTLY to the shard actors (no driver hop),
    report progress to the watermark actor, and SPILL closed sessions
    out of task memory as they accumulate (VERDICT r3 #3 — previously
    every closed session lived in this task's heap for the stream's
    lifetime).  Spill target: ``ray.put`` object-store refs by default,
    parquet part files when ``output_dir`` is set (the true unbounded
    sink — nothing ever concatenates in memory).  Backpressure: at most
    ``max_inflight`` un-acked shard sends.

    Returns (spilled refs-or-paths, rows routed, peak buffered rows) —
    the peak is the bounded-state evidence tests assert on."""
    n = len(shards)
    out: list = []
    buf: list[pa.Table] = []
    buf_rows = 0
    peak_buf = 0
    n_spills = 0
    inflight: list = []
    inflight_max: dict = {}  # send ref -> its batch's max event time
    acked_max = _NEG_INF  # max event time across ACKED shard sends
    n_rows = 0

    def spill(force: bool = False) -> None:
        nonlocal buf, buf_rows, n_spills
        if not buf or (not force and buf_rows < spill_rows):
            return
        t = pa.concat_tables(buf)
        if output_dir is not None:
            import os

            import pyarrow.parquet as pq

            path = os.path.join(
                output_dir, f"sessions-f{feeder_id:03d}-{n_spills:05d}.parquet"
            )
            pq.write_table(t, path + ".tmp")
            os.replace(path + ".tmp", path)
            out.append(path)
        else:
            out.append(ray.put(t))
        n_spills += 1
        buf, buf_rows = [], 0

    def drain(limit: int) -> None:
        nonlocal inflight, buf_rows, peak_buf, acked_max
        while len(inflight) > limit:
            ready, inflight = ray.wait(inflight, num_returns=1)
            for r, t in zip(ready, ray.get(ready)):
                acked_max = max(acked_max, inflight_max.pop(r, _NEG_INF))
                if t.num_rows:
                    buf.append(t)
                    buf_rows += t.num_rows
                    peak_buf = max(peak_buf, buf_rows)
        spill()

    wm = _NEG_INF
    for batch in it.iter_batches(batch_format="pyarrow", batch_size=batch_size):
        if batch.num_rows == 0:
            continue
        ts = (
            batch.column(ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("int64")
        )
        arrival_wm = wm
        if wm_actor is not None:
            # one tiny RPC per batch.  Report the max event time of the
            # ACKED sends only, never this batch's own max: the global
            # watermark another channel reads must not cover events
            # still in flight to a shard, or that channel's next send
            # could raise the shard clock past them and falsely mark
            # them late (watermark race — caught by the lateness=0
            # ordered-log test).  Acked sends are folded into shard
            # state already, and this channel's later batches only
            # carry newer timestamps (per-channel order), so the
            # reported max is safe by construction; it merely lags one
            # inflight window, which is the usual watermark trade.
            wm = ray.get(wm_actor.update.remote(feeder_id, acked_max))
        batch_max = int(ts.max())
        for s, sl in _split_batch(batch, key_col, n):
            ref = shards[s].on_batch.remote(sl, arrival_wm, wm)
            inflight.append(ref)
            inflight_max[ref] = batch_max
        n_rows += batch.num_rows
        drain(max_inflight)
    drain(0)
    if wm_actor is not None:
        # done marker: this channel can emit nothing further, so it
        # leaves the watermark min (ADVICE r3) — then tick every shard
        # with the new global watermark so sessions the other channels
        # were waiting on close NOW, not at flush.  Everything is acked
        # by now, so the final progress report covers the whole channel.
        ray.get(wm_actor.update.remote(feeder_id, acked_max))
        wm = ray.get(wm_actor.finish.remote(feeder_id))
        for t in ray.get([s.advance.remote(wm) for s in shards]):
            if t.num_rows:
                buf.append(t)
                buf_rows += t.num_rows
                peak_buf = max(peak_buf, buf_rows)
    spill(force=True)
    return out, n_rows, peak_buf


def stream_sessions_distributed(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 3600.0,
    allowed_lateness_seconds: float | None = None,
    num_shards: int | None = None,
    num_feeders: int = 4,
    batch_size: int = 16384,
    max_inflight: int = 16,
    spill_rows: int = 100_000,
    output_dir: str | None = None,
) -> StreamResult:
    """Parallel-ingest sessionization over a Dataset: ``num_feeders``
    reader tasks stream disjoint splits straight into the shard actors.
    The driver only launches feeders and merges results.

    Scaling axes, measured on a 1M-event log (BASELINE.md): after the
    r4 array-state shard fold the per-event compute is no longer the
    bottleneck — 4 feeders / 4 shards sustain ~500k ev/s at
    ``batch_size=65536`` (vs ~240k for the old per-key-Python fold at
    its best shard count), and ADDING shards now mostly shrinks
    per-call slices (16 shards ≈ 354k ev/s).  Shard count is the
    STATE-capacity axis: size it to bound open-interval state per
    actor, not to buy wall time.  Feeder count remains the source-I/O
    axis (remote storage, many files, multi-node ingest).  Larger
    ``batch_size`` amortizes per-call overhead at the cost of coarser
    watermark granularity.

    ``allowed_lateness_seconds=None`` (default) disables late drops:
    every event is accepted and the result is EXACTLY the offline
    sessionization, independent of feeder interleaving (the interval
    fold is order-independent).  With a finite lateness the multi-
    channel watermark (min over feeders) bounds shard state on an
    unbounded log; late counts then depend on arrival timing and the
    result covers the accepted set only.

    Memory (VERDICT r3 #3): a feeder holds at most ~``spill_rows``
    closed-session rows before spilling them to the object store (or,
    with ``output_dir`` set, to parquet part files — the unbounded-log
    sink, where the driver never assembles one table; it returns the
    part paths in ``session_files`` and an EMPTY ``sessions`` table,
    read them back with ``ray.data.read_parquet``)."""
    if num_shards is None:
        num_shards = _default_num_shards()
    if output_dir is not None:
        import os

        os.makedirs(output_dir, exist_ok=True)
    shards = [
        SessionShard.remote(key_col, ts_col, gap_seconds)
        for _ in range(num_shards)
    ]
    wm_actor = None
    if allowed_lateness_seconds is not None:
        wm_actor = _WatermarkActor.remote(
            num_feeders, int(allowed_lateness_seconds * 1_000_000)
        )
    splits = ds.streaming_split(num_feeders, equal=False)
    results = ray.get(
        [
            _feeder.remote(
                it, shards, wm_actor, i, key_col, ts_col, batch_size,
                max_inflight, spill_rows, output_dir,
            )
            for i, it in enumerate(splits)
        ]
    )
    peak_buf = max((p for _, _, p in results), default=0)
    flush_tabs = [
        t for t in ray.get([s.flush.remote() for s in shards]) if t.num_rows
    ]
    n_late = sum(ray.get([s.late_count.remote() for s in shards]))
    n_null = sum(ray.get([s.null_key_count.remote() for s in shards]))
    for s in shards:
        ray.kill(s)
    if wm_actor is not None:
        ray.kill(wm_actor)
    if output_dir is not None:
        import os

        import pyarrow.parquet as pq

        files = [p for parts, _, _ in results for p in parts]
        if flush_tabs:
            path = os.path.join(output_dir, "sessions-flush.parquet")
            pq.write_table(pa.concat_tables(flush_tabs), path + ".tmp")
            os.replace(path + ".tmp", path)
            files.append(path)
        return StreamResult(
            sessions=_empty_sessions(),
            n_late=n_late,
            n_null_keys=n_null,
            peak_feeder_buffer_rows=peak_buf,
            session_files=sorted(files),
        )
    closed = [ray.get(r) for parts, _, _ in results for r in parts]
    closed.extend(flush_tabs)
    out = pa.concat_tables(closed) if closed else _empty_sessions()
    return StreamResult(
        sessions=out.sort_by(
            [("key", "ascending"), ("session_start", "ascending")]
        ),
        n_late=n_late,
        n_null_keys=n_null,
        peak_feeder_buffer_rows=peak_buf,
    )

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
stages/hashreduce.py), the driver streams batches and routes vectorized
slices, and a watermark (max event time − allowed lateness) closes
sessions whose gap has expired.

Semantics (event-time):
* rows with ``ts < watermark − gap`` at arrival are LATE: counted and
  side-channelled, never silently dropped;
* a session closes when the watermark passes ``last_ts + gap``;
* ``flush()`` closes all remaining sessions at end-of-stream;
* given per-key event-time-ordered delivery, closed sessions equal the
  offline ``windows.session_windows`` result (asserted in tests).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
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


def _empty_sessions() -> pa.Table:
    return SESSION_SCHEMA.empty_table()


# zero reserved CPUs: shard actors are mailbox state holders (brief
# vectorized folds); positive reservations can starve the upstream
# read/sort tasks on small clusters (see stages/hashreduce.py)
@ray.remote(num_cpus=0)
class SessionShard:
    """Owns the open-session state for its slice of the key space."""

    def __init__(self, key_col: str, ts_col: str, gap_seconds: float):
        self.key_col, self.ts_col = key_col, ts_col
        self.gap_us = int(gap_seconds * 1_000_000)
        # key -> (session_start_us, last_ts_us, n_events)
        self.open: dict[str, tuple[int, int, int]] = {}
        self.n_late = 0

    def on_batch(
        self, table: pa.Table, arrival_watermark_us: int, watermark_us: int
    ) -> pa.Table:
        """Fold one batch into the state; emit sessions closed by the
        batch content or the advanced watermark.  Lateness is judged
        against the watermark AT ARRIVAL (before this batch advanced
        it) — a batch can never make its own events late."""
        closed: list[tuple[str, int, int, int]] = []
        if table.num_rows:
            g = table.to_pandas()
            ts_us = g[self.ts_col].astype("datetime64[us]").astype("int64")
            late = ts_us < (arrival_watermark_us - self.gap_us)
            self.n_late += int(late.sum())
            g = g[~late.to_numpy()]
            ts_us = ts_us[~late.to_numpy()]
            if len(g):
                g = g.assign(_ts=ts_us).sort_values(
                    [self.key_col, "_ts"], kind="stable"
                )
                for key, sub in g.groupby(self.key_col, sort=False):
                    t = sub["_ts"].to_numpy()
                    state = self.open.get(str(key))
                    # in-batch session splits
                    splits = np.nonzero(np.diff(t) > self.gap_us)[0]
                    bounds = np.concatenate(([0], splits + 1, [len(t)]))
                    segs = [
                        (int(t[a]), int(t[b - 1]), int(b - a))
                        for a, b in zip(bounds[:-1], bounds[1:])
                    ]
                    if state is not None:
                        s0, last, n = state
                        if segs and segs[0][0] - last <= self.gap_us:
                            first = segs[0]
                            # an in-gap out-of-order event (allowed
                            # lateness > 0) must never move the session
                            # end backwards
                            segs[0] = (
                                min(s0, first[0]),
                                max(last, first[1]),
                                n + first[2],
                            )
                        else:
                            closed.append((str(key), s0, last, n))
                    for seg in segs[:-1]:
                        closed.append((str(key), *seg))
                    self.open[str(key)] = segs[-1] if segs else state
        # watermark closes idle sessions
        expired = [
            k for k, (_, last, _) in self.open.items()
            if last + self.gap_us < watermark_us
        ]
        for k in expired:
            s0, last, n = self.open.pop(k)
            closed.append((k, s0, last, n))
        return self._to_table(closed)

    def advance(self, watermark_us: int) -> pa.Table:
        """Watermark-only tick for shards that received no rows this
        batch — idle sessions still expire."""
        empty = pa.table(
            {
                self.key_col: pa.array([], pa.string()),
                self.ts_col: pa.array([], pa.timestamp("us")),
            }
        )
        return self.on_batch(empty, watermark_us, watermark_us)

    def flush(self) -> pa.Table:
        closed = [(k, *v) for k, v in sorted(self.open.items())]
        self.open.clear()
        return self._to_table(closed)

    def late_count(self) -> int:
        return self.n_late

    @staticmethod
    def _to_table(closed) -> pa.Table:
        if not closed:
            return _empty_sessions()
        return pa.table(
            {
                "key": pa.array([c[0] for c in closed], pa.string()),
                "session_start": pa.array(
                    np.array([c[1] for c in closed], dtype="datetime64[us]")
                ),
                "session_end": pa.array(
                    np.array([c[2] for c in closed], dtype="datetime64[us]")
                ),
                "n_events": pa.array([c[3] for c in closed], pa.int64()),
            },
            schema=SESSION_SCHEMA,
        )


@dataclass
class StreamResult:
    sessions: pa.Table
    n_late: int


class StreamingSessionizer:
    """Driver-side coordinator: route event batches to shard actors and
    advance the watermark.  ``feed`` any number of Arrow batches (a live
    source, ``ds.iter_batches``, a socket reader…), then ``finish``."""

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
            num_shards = max(2, min(int(ray.cluster_resources().get("CPU", 8)) // 2, 8))
        self.key_col, self.ts_col = key_col, ts_col
        self.lateness_us = int(allowed_lateness_seconds * 1_000_000)
        self.shards = [
            SessionShard.remote(key_col, ts_col, gap_seconds)
            for _ in range(num_shards)
        ]
        self.n = num_shards
        self.watermark_us = -(1 << 62)
        self.closed: list[pa.Table] = []

    def feed(self, batch: pa.Table) -> None:
        if batch.num_rows == 0:
            return
        keys = batch.column(self.key_col).to_numpy(zero_copy_only=False)
        shard = (hash64(keys) % np.uint64(self.n)).astype(np.int64)
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
        hit = set(int(s) for s in np.unique(shard))
        refs = [
            self.shards[s].on_batch.remote(
                batch.filter(pa.array(shard == s)), arrival_wm, self.watermark_us
            )
            for s in hit
        ]
        # shards with no rows this batch still see the watermark advance
        refs.extend(
            self.shards[s].advance.remote(self.watermark_us)
            for s in range(self.n)
            if s not in hit
        )
        self.closed.extend(t for t in ray.get(refs) if t.num_rows)

    def finish(self) -> StreamResult:
        self.closed.extend(
            t for t in ray.get([s.flush.remote() for s in self.shards]) if t.num_rows
        )
        n_late = sum(ray.get([s.late_count.remote() for s in self.shards]))
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
        )

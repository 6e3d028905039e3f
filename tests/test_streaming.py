"""Streaming keyed session windows (stages/streaming.py): equivalence
with the offline sessionizer on an ordered feed, watermark closure, and
late-event accounting."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from mtb_validation_service_ray.stages.streaming import StreamingSessionizer
from mtb_validation_service_ray.stages.windows import session_windows


def _events(n_users=20, n_events=400, seed=11):
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + np.sort(rng.integers(0, 3_600_000, n_events)) * np.timedelta64(
        1000, "us"
    )  # spread over ~1h in ms steps
    # occasional big jumps to force multiple sessions
    jumps = np.cumsum(rng.random(n_events) < 0.01) * np.timedelta64(2, "h")
    ts = ts + jumps
    users = rng.integers(0, n_users, n_events)
    return pa.table(
        {
            "user_id": pa.array([f"u{u:03d}" for u in users], pa.string()),
            "ts": pa.array(ts),
        }
    )


def test_streaming_matches_offline_on_ordered_feed():
    t = _events()
    # offline reference over the same events
    offline = (
        session_windows(
            rd.from_arrow(t), key_col="user_id", ts_col="ts", gap_seconds=600.0
        )
        .to_pandas()
        .rename(columns={"user_id": "key"})
        .sort_values(["key", "session_start"])
        .reset_index(drop=True)[["key", "session_start", "session_end", "n_events"]]
    )

    s = StreamingSessionizer(
        key_col="user_id", ts_col="ts", gap_seconds=600.0, num_shards=3
    )
    # globally ts-ordered feed in uneven batches
    df = t.to_pandas().sort_values("ts", kind="stable").reset_index(drop=True)
    ordered = pa.Table.from_pandas(df, preserve_index=False)
    i = 0
    sizes = [37, 101, 13, 7, 61]
    while i < ordered.num_rows:
        n = sizes[i % len(sizes)]
        s.feed(ordered.slice(i, n))
        i += n
    res = s.finish()
    got = (
        res.sessions.to_pandas()
        .sort_values(["key", "session_start"])
        .reset_index(drop=True)
    )
    got["session_start"] = got["session_start"].astype("datetime64[us]")
    got["session_end"] = got["session_end"].astype("datetime64[us]")
    offline["session_start"] = offline["session_start"].astype("datetime64[us]")
    offline["session_end"] = offline["session_end"].astype("datetime64[us]")
    assert res.n_late == 0
    assert got.equals(offline), f"\n{got}\n{offline}"


def test_streaming_watermark_and_late_events():
    base = np.datetime64("2024-01-01T00:00:00", "us")

    def tbl(rows):
        return pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array([base + np.timedelta64(r[1], "s") for r in rows]),
            }
        )

    s = StreamingSessionizer(
        key_col="user_id", ts_col="ts", gap_seconds=60.0, num_shards=2
    )
    s.feed(tbl([("a", 0), ("a", 30)]))
    # watermark jumps far ahead → a's session must close mid-stream
    s.feed(tbl([("b", 10_000)]))
    mid_closed = sum(t_.num_rows for t_ in s.closed)
    assert mid_closed >= 1
    # an event 2h before the watermark is LATE (beyond gap): counted,
    # never merged into a new session
    s.feed(tbl([("a", 2_800)]))
    res = s.finish()
    assert res.n_late == 1
    a_rows = res.sessions.to_pandas().query("key == 'a'")
    assert len(a_rows) == 1 and a_rows.n_events.iloc[0] == 2

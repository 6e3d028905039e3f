"""asof_join: match semantics vs a pandas merge_asof reference, plus
the edge cases the bucket plan must not break (nulls, ties, unmatched
rows, forward direction)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from mtb_validation_service_ray.stages.joins import asof_join


def _ts(*days):
    return pd.to_datetime([f"2024-01-{d:02d}" for d in days])


def test_asof_backward_basic_ties_and_unmatched():
    left = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([10, 10, 20, 30], pa.int64()),
            "ts": pa.array(_ts(5, 2, 7, 7)),
        }
    )
    # user 10: orders on day 1 (key 100) and TWO on day 4 (101, 102 —
    # tie resolves to max orderkey); user 20: order after the event
    # only (unmatched); user 30: no orders at all
    right = pa.table(
        {
            "o_custkey": pa.array([10, 10, 10, 20], pa.int64()),
            "o_orderdate": pa.array(_ts(1, 4, 4, 9)),
            "o_orderkey": pa.array([100, 101, 102, 200], pa.int64()),
        }
    )
    out = (
        asof_join(
            rd.from_arrow(left), rd.from_arrow(right),
            key=("user_id", "o_custkey"), ts=("ts", "o_orderdate"),
            right_payload=["o_orderkey"], tiebreak="o_orderkey",
            num_buckets=4,
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert out.event_id.tolist() == [1, 2, 3, 4]
    got = out.o_orderkey.tolist()
    assert got[0] == 102  # day 5 → the day-4 tie, max orderkey wins
    assert got[1] == 100  # day 2 → day-1 order
    assert pd.isna(got[2])  # user 20's only order is in the future
    assert pd.isna(got[3])  # user 30 has no orders


def test_asof_null_keys_and_ts_pass_through():
    left = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([10, None, 10], pa.int64()),
            "ts": pa.array(_ts(5, 5, 5)[:2].append(pd.DatetimeIndex([pd.NaT]))),
        }
    )
    right = pa.table(
        {
            "o_custkey": pa.array([10], pa.int64()),
            "o_orderdate": pa.array(_ts(1)),
            "o_orderkey": pa.array([100], pa.int64()),
        }
    )
    out = (
        asof_join(
            rd.from_arrow(left), rd.from_arrow(right),
            key=("user_id", "o_custkey"), ts=("ts", "o_orderdate"),
            right_payload=["o_orderkey"], num_buckets=2,
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert len(out) == 3  # every left row survives
    assert out.o_orderkey.tolist()[0] == 100
    assert pd.isna(out.o_orderkey.tolist()[1])  # null key: no match
    assert pd.isna(out.o_orderkey.tolist()[2])  # null ts: no match


def test_asof_matches_pandas_reference_randomized():
    rng = np.random.default_rng(11)
    n_l, n_r = 2000, 800
    lkeys = rng.integers(0, 50, n_l)
    rkeys = rng.integers(0, 60, n_r)
    base = np.datetime64("2024-01-01", "us")
    lts = base + rng.integers(0, 10**9, n_l).astype("timedelta64[us]")
    rts = base + rng.integers(0, 10**9, n_r).astype("timedelta64[us]")
    payload = rng.integers(0, 10**6, n_r)
    left = pa.table(
        {
            "eid": pa.array(np.arange(n_l), pa.int64()),
            "k": pa.array(lkeys, pa.int64()),
            "t": pa.array(lts),
        }
    )
    right = pa.table(
        {
            "rk": pa.array(rkeys, pa.int64()),
            "rt": pa.array(rts),
            "p": pa.array(payload, pa.int64()),
        }
    )
    for direction in ("backward", "forward"):
        got = (
            asof_join(
                rd.from_arrow(left).repartition(5),
                rd.from_arrow(right).repartition(3),
                key=("k", "rk"), ts=("t", "rt"), right_payload=["p"],
                direction=direction, tiebreak="p", num_buckets=8,
            )
            .to_pandas().sort_values("eid").reset_index(drop=True)
        )
        ldf = left.to_pandas().sort_values("t", kind="stable")
        rdf = (
            right.to_pandas()
            .sort_values(["rt", "p"], kind="stable")
            .rename(columns={"rk": "k", "rt": "t"})
        )
        want = (
            pd.merge_asof(ldf, rdf, on="t", by="k", direction=direction)
            .sort_values("eid").reset_index(drop=True)
        )
        assert got.eid.equals(want.eid)
        assert got.p.fillna(-1).astype(np.int64).equals(
            want.p.fillna(-1).astype(np.int64)
        ), direction


def _brute_interval(ldf, idf, *, keyed, right_incl=False):
    rows = []
    for _, p in ldf.iterrows():
        for _, iv in idf.iterrows():
            if keyed and p.k != iv.ik:
                continue
            hi_ok = p.t <= iv.e if right_incl else p.t < iv.e
            if iv.s <= p.t and hi_ok:
                rows.append((p.eid, iv.p))
    return sorted(rows)


def test_interval_join_keyed_matches_brute_force():
    from mtb_validation_service_ray.stages.joins import interval_join

    rng = np.random.default_rng(3)
    n_p, n_i = 1500, 300
    base = np.datetime64("2024-01-01", "us")
    pts = pa.table(
        {
            "eid": pa.array(np.arange(n_p), pa.int64()),
            "k": pa.array(rng.integers(0, 40, n_p), pa.int64()),
            "t": pa.array(base + rng.integers(0, 10**8, n_p).astype("timedelta64[us]")),
        }
    )
    s = rng.integers(0, 10**8, n_i)
    ln = rng.integers(1, 5 * 10**6, n_i)
    ivs = pa.table(
        {
            "ik": pa.array(rng.integers(0, 50, n_i), pa.int64()),
            "s": pa.array(base + s.astype("timedelta64[us]")),
            "e": pa.array(base + (s + ln).astype("timedelta64[us]")),
            "p": pa.array(np.arange(n_i) + 1000, pa.int64()),
        }
    )
    got = (
        interval_join(
            rd.from_arrow(pts).repartition(4),
            rd.from_arrow(ivs).repartition(3),
            ts="t", bounds=("s", "e"), payload=["p"],
            key=("k", "ik"), num_buckets=8,
        )
        .to_pandas()
    )
    assert list(got.columns) == ["eid", "k", "t", "p"]
    want = _brute_interval(pts.to_pandas(), ivs.to_pandas(), keyed=True)
    assert sorted(zip(got.eid, got.p)) == want
    assert got.t.dtype.kind == "M"


def test_interval_join_unkeyed_slab_matches_brute_force():
    from mtb_validation_service_ray.stages.joins import interval_join

    rng = np.random.default_rng(5)
    n_p, n_i = 1200, 120
    base = np.datetime64("2024-01-01", "us")
    pts = pa.table(
        {
            "eid": pa.array(np.arange(n_p), pa.int64()),
            "k": pa.array(np.zeros(n_p), pa.float64()),
            "t": pa.array(base + rng.integers(0, 10**8, n_p).astype("timedelta64[us]")),
        }
    )
    s = rng.integers(0, 10**8, n_i)
    ln = rng.integers(1, 3 * 10**6, n_i)
    ivs = pa.table(
        {
            "ik": pa.array(np.zeros(n_i), pa.float64()),
            "s": pa.array(base + s.astype("timedelta64[us]")),
            "e": pa.array(base + (s + ln).astype("timedelta64[us]")),
            "p": pa.array(np.arange(n_i) + 1000, pa.int64()),
        }
    )
    for closed, incl in (("left", False), ("both", True)):
        got = (
            interval_join(
                rd.from_arrow(pts).repartition(4),
                rd.from_arrow(ivs).repartition(3),
                ts="t", bounds=("s", "e"), payload=["p"],
                closed=closed, num_buckets=6,
            )
            .to_pandas()
        )
        want = _brute_interval(
            pts.to_pandas(), ivs.to_pandas(), keyed=False, right_incl=incl
        )
        assert sorted(zip(got.eid, got.p)) == want, closed

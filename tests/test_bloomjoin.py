"""bloom_semi_join: exactness under false positives, arm equality,
NOT-EXISTS null semantics, degenerate inputs."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from mtb_validation_service_ray.stages.bloomjoin import (
    bloom_params,
    bloom_semi_join,
    build_bloom,
)


def _left(n=500, seed=7):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 200, n).astype(object)
    keys[::50] = None  # null keys sprinkled in
    return pa.table({
        "k": pa.array(list(keys), pa.int64()),
        "payload": pa.array(rng.integers(0, 10**6, n), pa.int64()),
        "row": pa.array(np.arange(n), pa.int64()),
    })


def _right():
    # keys 0..99 present, 100..199 absent
    return pa.table({"rk": pa.array(np.arange(100), pa.int64())})


def _rows(ds):
    return sorted(
        (r["row"], r["k"]) for r in ds.take_all()
    )


def _expected(left, mode):
    rset = set(range(100))
    out = []
    for row, k in zip(
        left.column("row").to_pylist(), left.column("k").to_pylist()
    ):
        hit = k is not None and k in rset
        if (mode == "semi" and hit) or (mode == "anti" and not hit):
            out.append((row, k))
    return sorted(out)


@pytest.mark.parametrize("mode", ["semi", "anti"])
def test_matches_reference_both_arms(mode):
    left, right = _left(), _right()
    for gate in (64 << 20, 0):  # broadcast arm, then forced scale arm
        out = bloom_semi_join(
            rd.from_arrow(left), rd.from_arrow(right),
            on=("k", "rk"), mode=mode, broadcast_max_bytes=gate,
        )
        assert _rows(out) == _expected(left, mode), (mode, gate)


@pytest.mark.parametrize("mode", ["semi", "anti"])
def test_exact_under_heavy_false_positives(mode):
    """A deliberately undersized filter (fp ≈ 50%) must not change the
    result — the Bloom is a prefilter, the verify decides membership."""
    left, right = _left(), _right()
    out = bloom_semi_join(
        rd.from_arrow(left), rd.from_arrow(right),
        on=("k", "rk"), mode=mode, expected_keys=2, fp_rate=0.5,
    )
    assert _rows(out) == _expected(left, mode)


def test_anti_keeps_null_keys():
    left = pa.table({
        "k": pa.array([1, None, 300, None], pa.int64()),
        "row": pa.array([0, 1, 2, 3], pa.int64()),
    })
    out = bloom_semi_join(
        rd.from_arrow(left), rd.from_arrow(_right()),
        on=("k", "rk"), mode="anti",
    )
    kept = sorted(r["row"] for r in out.take_all())
    assert kept == [1, 2, 3]  # NOT EXISTS: nulls kept, 1 matched out


def test_empty_right_side():
    left = rd.from_arrow(_left(50))
    right = rd.from_arrow(pa.table({"rk": pa.array([], pa.int64())}))
    assert bloom_semi_join(left, right, on=("k", "rk")).count() == 0
    anti = bloom_semi_join(left, right, on=("k", "rk"), mode="anti")
    assert anti.count() == 50


def test_string_keys_round_trip():
    left = pa.table({
        "k": pa.array(["a", "b", "c", None, "d"], pa.string()),
        "row": pa.array(range(5), pa.int64()),
    })
    right = pa.table({"rk": pa.array(["b", "d", "zz"], pa.string())})
    out = bloom_semi_join(
        rd.from_arrow(left), rd.from_arrow(right), on=("k", "rk")
    )
    assert sorted(r["k"] for r in out.take_all()) == ["b", "d"]


def test_bloom_has_no_false_negatives():
    m, k = bloom_params(1000, 0.01)
    keys = rd.from_arrow(pa.table({"x": pa.array(np.arange(1000) * 7)}))
    words = build_bloom(keys, "x", m, k)
    from mtb_validation_service_ray.stages.bloomjoin import _test_bits

    assert _test_bits(words, (np.arange(1000) * 7), m, k).all()
    # and the fp rate on disjoint probes is in the designed ballpark
    fp = _test_bits(words, np.arange(1000) * 7 + 3, m, k).mean()
    assert fp < 0.05


# --- set_op (stages/setops.py) lives with the other two-sided ops ---


def _setop_tables():
    a = pa.table({
        "x": pa.array([1, 1, 2, None, 3], pa.int64()),
        "y": pa.array(["p", "p", "q", "r", None], pa.string()),
    })
    b = pa.table({
        "x": pa.array([1, None, 4], pa.int64()),
        "y": pa.array(["p", "r", "s"], pa.string()),
    })
    return a, b


def test_set_op_intersect_nulls_group_as_values():
    from mtb_validation_service_ray.stages.setops import set_op

    a, b = _setop_tables()
    out = set_op(rd.from_arrow(a), rd.from_arrow(b), "intersect", num_buckets=3)
    rows = sorted(
        [(r["x"], r["y"]) for r in out.take_all()],
        key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]),
    )
    # (1,p) in both; (None,r) matches by IS NOT DISTINCT FROM semantics
    assert rows == [(1, "p"), (None, "r")]


def test_set_op_except_distinct():
    from mtb_validation_service_ray.stages.setops import set_op

    a, b = _setop_tables()
    out = set_op(rd.from_arrow(a), rd.from_arrow(b), "except", num_buckets=3)
    rows = sorted(
        [(r["x"], r["y"]) for r in out.take_all()],
        key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]),
    )
    assert rows == [(2, "q"), (3, None)]


def test_set_op_empty_side():
    from mtb_validation_service_ray.stages.setops import set_op

    a, _ = _setop_tables()
    empty = pa.table({
        "x": pa.array([], pa.int64()), "y": pa.array([], pa.string())
    })
    assert set_op(rd.from_arrow(a), rd.from_arrow(empty), "intersect").count() == 0
    # a EXCEPT empty = distinct(a) — 4 distinct rows
    assert set_op(rd.from_arrow(a), rd.from_arrow(empty), "except").count() == 4

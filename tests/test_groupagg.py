"""bucketed_group_agg: equivalence with a pandas reference across key
types, spec kinds, and both partial modes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from mtb_validation_service_ray.stages.groupagg import bucketed_group_agg


def _ref(df, keys, specs):
    named = {
        out: (src, "size" if kind == "count" else kind)
        for out, src, kind in specs
    }
    g = df.groupby(keys, sort=False, dropna=False).agg(**named).reset_index()
    for out, _, kind in specs:
        if kind == "count":
            g[out] = g[out].astype("int64")
    return g.sort_values(keys).reset_index(drop=True)


def test_string_pair_keys_all_kinds():
    rng = np.random.default_rng(7)
    n = 20000
    a = np.array([f"doc-{i:05d}" for i in rng.integers(0, 2000, n)])
    b = np.array([f"doc-{i:05d}" for i in rng.integers(0, 2000, n)])
    df = pd.DataFrame(
        {
            "doc_a": a, "doc_b": b,
            "v": rng.integers(0, 100, n).astype(np.int64),
        }
    )
    specs = [
        ("n", "v", "count"), ("mn", "v", "min"),
        ("mx", "v", "max"), ("s", "v", "sum"),
    ]
    for partial in (True, False):
        out = (
            bucketed_group_agg(
                rd.from_pandas(df), ["doc_a", "doc_b"], specs,
                num_buckets=16, partial=partial,
            )
            .to_pandas()
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )
        ref = _ref(df, ["doc_a", "doc_b"], specs)
        pd.testing.assert_frame_equal(
            out[ref.columns], ref, check_dtype=False
        )


def test_null_keys_form_their_own_group():
    df = pd.DataFrame(
        {
            "k": pd.array(["a", None, "a", None, "b"], dtype="object"),
            "v": [1, 2, 3, 4, 5],
        }
    )
    out = (
        bucketed_group_agg(
            rd.from_pandas(df), ["k"], [("n", "v", "count"), ("s", "v", "sum")],
            num_buckets=4,
        )
        .to_pandas()
    )
    null_row = out[out.k.isna()]
    assert len(null_row) == 1
    assert null_row.n.iloc[0] == 2 and null_row.s.iloc[0] == 6
    assert out[out.k == "a"].s.iloc[0] == 4


# --- hypothesis property: random tables vs the pandas reference ------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _tables(draw):
    n = draw(st.integers(min_value=1, max_value=120))
    key_kind = draw(st.sampled_from(["int", "str", "int_null", "str_null"]))
    if key_kind.startswith("int"):
        keys = draw(st.lists(
            st.integers(min_value=-3, max_value=3), min_size=n, max_size=n
        ))
        keys = pd.array(keys, dtype="Int64")
    else:
        keys = draw(st.lists(
            st.sampled_from(["a", "b", "c", "", "0"]), min_size=n, max_size=n
        ))
        keys = pd.array(keys, dtype="object")
    if key_kind.endswith("null"):
        mask = draw(st.lists(st.booleans(), min_size=n, max_size=n))
        keys = pd.array(
            [None if m else k for k, m in zip(keys, mask)],
            dtype="Int64" if key_kind.startswith("int") else "object",
        )
    vals = draw(st.lists(
        st.integers(min_value=-10**6, max_value=10**6),
        min_size=n, max_size=n,
    ))
    partial = draw(st.booleans())
    buckets = draw(st.sampled_from([1, 2, 8]))
    return pd.DataFrame({"k": keys, "v": np.array(vals, np.int64)}), partial, buckets


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_tables())
def test_bucketed_group_agg_property(case):
    """Any key dtype (nullable int / string incl. '' and '0'), any
    bucket count, both partial modes: results equal the pandas
    reference groupby, and a null key is exactly one group that never
    merges with the zero value's group."""
    df, partial, buckets = case
    specs = [
        ("n", "v", "count"), ("mn", "v", "min"),
        ("mx", "v", "max"), ("s", "v", "sum"),
    ]
    out = (
        bucketed_group_agg(
            rd.from_pandas(df), ["k"], specs,
            num_buckets=buckets, partial=partial,
        )
        .to_pandas()
    )
    ref = _ref(df, ["k"], specs)
    out = out.sort_values("k").reset_index(drop=True)
    # compare as aligned dicts keyed by the (nullable) key value
    def keyed(frame):
        return {
            (None if pd.isna(r.k) else r.k): (r.n, r.mn, r.mx, r.s)
            for r in frame.itertuples()
        }
    assert keyed(out) == keyed(ref)

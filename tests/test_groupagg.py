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

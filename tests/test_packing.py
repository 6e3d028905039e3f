"""Sequence packing: distributed ordered prefix sum vs brute force,
layout invariance, pre-counted tokens arm, and clustered-key slabs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from mtb_validation_service_ray.stages.packing import pack_sequences


def _brute(ids, tokens, budget):
    order = np.argsort(ids, kind="stable")
    excl = np.concatenate([[0], np.cumsum(np.asarray(tokens)[order])[:-1]])
    out = dict(zip(np.asarray(ids)[order], excl // budget))
    return [int(out[i]) for i in ids]


def test_pack_sequences_matches_bruteforce():
    rng = np.random.default_rng(9)
    n = 500
    ids = rng.permutation(n) * 7 + 3  # non-contiguous, shuffled
    texts = [" ".join(["tok"] * int(k)) for k in rng.integers(0, 40, n)]
    tokens = [len(t.split()) if t else 0 for t in texts]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    out = (
        pack_sequences(rd.from_arrow(t).repartition(5), budget=100)
        .to_pandas()
        .sort_values("doc_id")
    )
    expect = pd.DataFrame(
        {"doc_id": ids, "seq_id": _brute(ids, tokens, 100)}
    ).sort_values("doc_id")
    assert out.seq_id.tolist() == expect.seq_id.tolist()
    assert out.n_tokens.tolist() == [
        t for _, t in sorted(zip(ids, tokens))
    ]


def test_pack_sequences_layout_invariant():
    rng = np.random.default_rng(3)
    ids = np.arange(200)
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 30, 200)]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    a = (
        pack_sequences(rd.from_arrow(t).repartition(2), budget=64)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        pack_sequences(rd.from_arrow(t).repartition(13), budget=64,
                       num_buckets=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a[["doc_id", "seq_id"]].equals(b[["doc_id", "seq_id"]])


def test_pack_sequences_tokens_col_and_clustered_keys():
    # keys clustered in one narrow range plus one far outlier: the
    # equal-width slabs degrade to one hot slab — result still exact
    ids = np.concatenate([np.arange(100, 160), [10_000_000]])
    tokens = np.concatenate([np.full(60, 10, np.int64), [5]])
    t = pa.table(
        {"doc_id": pa.array(ids, pa.int64()),
         "n_tok": pa.array(tokens, pa.int64())}
    )
    out = (
        pack_sequences(
            rd.from_arrow(t).repartition(3), budget=100,
            tokens_col="n_tok",
        )
        .to_pandas().sort_values("doc_id")
    )
    assert out.seq_id.tolist() == _brute(ids, tokens, 100)
    # budget 100 over 60×10 tokens → ids pack 10 per sequence
    assert out.seq_id.iloc[0] == 0 and out.seq_id.iloc[59] == 5
    assert out.seq_id.iloc[60] == 6  # outlier starts at 600 // 100


def test_pack_sequences_empty_and_null_text():
    t = pa.table(
        {"doc_id": pa.array([1, 2, 3], pa.int64()),
         "text": pa.array(["a b c", None, ""])}
    )
    out = (
        pack_sequences(rd.from_arrow(t), budget=2)
        .to_pandas().sort_values("doc_id")
    )
    assert out.n_tokens.tolist() == [3, 0, 0]
    assert out.seq_id.tolist() == [0, 1, 1]

"""Eval-set decontamination: planted contamination must be caught,
clean and sub-n-token docs must survive, and the broadcast and Bloom
arms must agree exactly."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from mtb_validation_service_ray.stages.decontaminate import (
    decontaminate,
    eval_gram_hashes,
)

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lam", "mu",
]


def _fixture(n: int = 13):
    rng = np.random.default_rng(11)
    eval_texts = [
        " ".join(rng.choice(WORDS, 40)) + f" evalmark{i}" for i in range(5)
    ]
    train, ids = [], []
    for i in range(30):  # clean docs: unique suffix breaks any overlap
        train.append(" ".join(rng.choice(WORDS, 40)) + f" trainmark{i}")
        ids.append(i)
    # planted contamination: 13 consecutive eval tokens inside noise
    leak = " ".join(eval_texts[2].split()[10 : 10 + n])
    train.append("noise starts here " + leak + " and noise resumes after")
    ids.append(100)
    # verbatim eval doc
    train.append(eval_texts[0])
    ids.append(101)
    # sub-n-token doc: can never share an n-gram
    train.append("tiny doc")
    ids.append(102)
    train_t = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(train)}
    )
    eval_t = pa.table({"text": pa.array(eval_texts)})
    return train_t, eval_t


def test_decontaminate_drop_and_flag():
    train_t, eval_t = _fixture()
    ds = rd.from_arrow(train_t).repartition(3)
    ev = rd.from_arrow(eval_t)

    kept = decontaminate(ds, ev, n=13, mode="drop").to_pandas()
    assert set(kept.doc_id) == set(range(30)) | {102}

    flagged = decontaminate(ds, ev, n=13, mode="flag").to_pandas()
    assert set(flagged[flagged.contaminated].doc_id) == {100, 101}
    assert len(flagged) == 33  # flag mode keeps every row


def test_decontaminate_bloom_arm_equivalence():
    """Force the Bloom arm (zero broadcast budget) — must match the
    broadcast arm row-for-row, in both modes."""
    train_t, eval_t = _fixture()
    ds = rd.from_arrow(train_t).repartition(3)
    ev = rd.from_arrow(eval_t)

    fast = decontaminate(ds, ev, n=13, mode="drop").to_pandas()
    slow = decontaminate(
        ds, ev, n=13, mode="drop", broadcast_max_bytes=0
    ).to_pandas()
    assert sorted(fast.doc_id) == sorted(slow.doc_id)

    f2 = (
        decontaminate(ds, ev, n=13, mode="flag", broadcast_max_bytes=0)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert set(f2[f2.contaminated].doc_id) == {100, 101}
    assert len(f2) == 33


def test_decontaminate_no_overlap_noop():
    train_t, eval_t = _fixture()
    ds = rd.from_arrow(train_t.slice(0, 30))  # clean docs only
    ev = rd.from_arrow(eval_t)
    kept = decontaminate(ds, ev, n=13, mode="drop").to_pandas()
    assert len(kept) == 30


from hypothesis import given, settings
from hypothesis import strategies as st

_W = ["aa", "bb", "cc", "dd"]
_DOC = st.lists(st.sampled_from(_W), min_size=0, max_size=9).map(" ".join)


@settings(max_examples=20, deadline=None)
@given(
    train=st.lists(_DOC, min_size=1, max_size=8),
    evals=st.lists(_DOC, min_size=1, max_size=3),
)
def test_decontaminate_matches_bruteforce(train, evals):
    """Property: flag mode over a tiny 4-word vocabulary (dense 3-gram
    collisions by construction) matches a per-doc set-intersection
    reference exactly."""
    n = 3

    def grams(text):
        toks = text.lower().split()
        return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    ev_grams = set().union(*(grams(t) for t in evals)) if evals else set()
    expect = [bool(grams(t) & ev_grams) for t in train]

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(train)), pa.int64()),
                  "text": pa.array(train)})
    )
    ev = rd.from_arrow(pa.table({"text": pa.array(evals)}))
    got = (
        decontaminate(ds, ev, n=n, mode="flag")
        .to_pandas()
        .sort_values("doc_id")["contaminated"]
        .tolist()
    )
    assert got == expect


def test_eval_gram_hashes_short_docs_empty():
    ev = rd.from_arrow(pa.table({"text": pa.array(["too short", None])}))
    out = eval_gram_hashes(ev, n=13).to_pandas()
    assert len(out) == 0

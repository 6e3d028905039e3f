"""Dedup-family tests with planted duplicates/near-duplicates."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from mtb_validation_service_ray.stages.dedup import (
    dedup_exact,
    duplicate_groups,
    minhash_lsh_candidates,
    simhash_candidates,
    verify_jaccard_pairs,
)


def _docs_table():
    base = (
        "the quick brown fox jumps over the lazy dog near the quiet river bank "
        "while morning light settles on the tall grass and the air stays cool"
    )
    near = base.replace("quiet", "silent").replace("cool", "cold")
    other = (
        "completely different content about distributed query engines and "
        "columnar formats with vectorized execution pipelines at scale"
    )
    docs = []
    for i in range(40):
        docs.append(f"unique document number {i} with its own words " + "x" * i)
    rows = {
        "doc_id": list(range(40)) + [100, 101, 102, 103, 104],
        "text": docs + [base, near, base, other, other],
    }
    return pa.table(rows)


def test_duplicate_groups_and_dedup_exact():
    t = _docs_table()
    ds = rd.from_arrow(t)
    groups = duplicate_groups(ds, ["text"], id_col="doc_id").to_pandas()
    # base appears twice (100, 102), other twice (103, 104)
    assert len(groups) == 2
    assert set(groups.keep_id) == {100, 103}
    assert set(groups.n) == {2}

    deduped = dedup_exact(ds, ["text"], id_col="doc_id").to_pandas()
    assert len(deduped) == t.num_rows - 2
    assert 102 not in set(deduped.doc_id) and 104 not in set(deduped.doc_id)
    assert {100, 101, 103} <= set(deduped.doc_id)


def test_minhash_lsh_finds_near_dups():
    t = _docs_table()
    ds = rd.from_arrow(t)
    cands = minhash_lsh_candidates(ds, concurrency=1).to_pandas()
    pairs = set(map(tuple, cands[["doc_a", "doc_b"]].to_numpy()))
    assert (100, 102) in pairs  # exact dup
    assert (100, 101) in pairs  # near dup
    assert (103, 104) in pairs
    # verification: jaccard filter keeps the planted pairs, drops noise
    docs = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    verified = verify_jaccard_pairs(
        pa.Table.from_pandas(cands[["doc_a", "doc_b"]]), docs, threshold=0.5
    )
    vp = set(zip(verified.column("doc_a").to_pylist(), verified.column("doc_b").to_pylist()))
    assert {(100, 101), (100, 102), (103, 104)} <= vp
    for a, b in vp:
        assert a >= 100  # no false positives among the unique docs


def test_simhash_finds_near_dups():
    t = _docs_table()
    ds = rd.from_arrow(t)
    pairs = simhash_candidates(ds, concurrency=1, max_hamming=4).to_pandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    assert (100, 102) in got
    assert (103, 104) in got
    ham = dict(zip(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()), pairs.hamming))
    assert ham[(100, 102)] == 0

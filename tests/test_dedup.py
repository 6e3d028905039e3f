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
    # (distributed: candidates joined back to the text column)
    verified = verify_jaccard_pairs(
        pa.Table.from_pandas(cands[["doc_a", "doc_b"]]), ds,
        threshold=0.5, num_partitions=4,
    ).to_pandas()
    vp = set(zip(verified.doc_a, verified.doc_b))
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


def test_minhash_hot_bucket_cap():
    """A boilerplate-heavy group (2k identical docs) must NOT generate
    O(k^2) pairs: overflow groups emit a star to the min id (k-1 edges,
    connectivity preserved) tagged sampled=1, and overflow_report
    surfaces the capped group (VERDICT r1 #1)."""
    from mtb_validation_service_ray.stages.dedup import overflow_report

    k = 2000
    t = pa.table(
        {
            "doc_id": list(range(k)),
            "text": ["identical boilerplate text repeated across the corpus"] * k,
        }
    )
    ds = rd.from_arrow(t)
    cands = minhash_lsh_candidates(
        ds, concurrency=1, max_bucket_pairs=500
    ).materialize()
    df = cands.to_pandas()
    # star: every doc pairs with doc 0 exactly once, nothing else
    assert len(df) == k - 1
    assert (df.doc_a == 0).all()
    assert set(df.doc_b) == set(range(1, k))
    assert (df.sampled == 1).all()
    assert (df.n_members == k).all()
    rep = overflow_report(cands).to_pandas()
    assert list(rep.n_members) == [k]
    assert rep.n_pairs_emitted.iloc[0] == k - 1


def test_minhash_under_cap_unsampled():
    """Groups under the cap still emit full pairs, sampled=0."""
    t = _docs_table()
    cands = minhash_lsh_candidates(rd.from_arrow(t), concurrency=1).to_pandas()
    assert (cands.sampled == 0).all()


def test_simhash_hot_bucket_cap():
    k = 800
    t = pa.table(
        {
            "doc_id": list(range(k)),
            "text": ["the same exact document body every single time"] * k,
        }
    )
    pairs = simhash_candidates(
        rd.from_arrow(t), concurrency=1, max_hamming=3, max_bucket_pairs=100
    ).to_pandas()
    assert len(pairs) == k - 1
    assert (pairs.doc_a == 0).all()
    assert (pairs.hamming == 0).all()
    assert (pairs.sampled == 1).all()


def test_verify_jaccard_strategies_agree():
    """Broadcast (candidate-texts-only) and double-hash-join verification
    produce identical verified pair sets."""
    t = _docs_table()
    ds = rd.from_arrow(t)
    cands = minhash_lsh_candidates(ds, concurrency=1)
    a = (
        verify_jaccard_pairs(cands, ds, threshold=0.5, strategy="broadcast")
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    b = (
        verify_jaccard_pairs(cands, ds, threshold=0.5, strategy="join",
                             num_partitions=4)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    assert a.equals(b)
    assert len(a) > 0

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
    O(k^2) pairs: with the cap below even star+ring (2k-3 > 500) the
    group degrades to the star-only connectivity floor (k-1 edges to
    the min id, ADVICE r3) tagged sampled=1, and overflow_report
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
    # star only (2k-3 > max_pairs): every doc pairs with doc 0, nothing else
    assert len(df) == k - 1
    assert set(df.doc_a) == {0}
    assert set(df.doc_b) == set(range(1, k))
    assert (df.sampled == 1).all()
    assert (df.n_members == k).all()
    rep = overflow_report(cands).to_pandas()
    assert list(rep.n_members) == [k]
    assert rep.n_pairs_emitted.iloc[0] == k - 1


def test_group_pair_cap_degrade_ladder():
    """ADVICE r3: the per-group cap degrades C(k,2) -> star+ring ->
    star-only, and emitted pairs never exceed max(max_pairs, k-1)."""
    from mtb_validation_service_ray.stages.dedup import _group_pair_indices

    i, j, sampled = _group_pair_indices(10, 1000)  # C(10,2)=45 fits
    assert len(i) == 45 and not sampled
    i, j, sampled = _group_pair_indices(100, 1000)  # 4950 > 1000 ≥ 197
    assert len(i) == 2 * 100 - 3 and sampled
    i, j, sampled = _group_pair_indices(100, 150)  # 197 > 150: star only
    assert len(i) == 99 and sampled
    assert (i == 0).all() and (j == np.arange(1, 100)).all()
    for k, cap in [(5, 4), (50, 10), (1000, 999), (1000, 5000)]:
        i, j, _ = _group_pair_indices(k, cap)
        assert len(i) <= max(cap, k - 1)
        # connectivity floor: every member appears in at least one pair
        assert set(np.concatenate([i, j])) == set(range(k))


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
    assert len(pairs) == k - 1  # 2k-3 > 100: star-only connectivity floor
    assert set(pairs[pairs.doc_a == 0].doc_b) == set(range(1, k))
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


def test_simhash64_matches_naive_reference():
    """The slab-vectorized simhash64 must equal a per-doc reference."""
    import numpy as np

    from mtb_validation_service_ray.functions.textfn import shingle_hashes
    from mtb_validation_service_ray.stages.dedup import simhash64

    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [
        " ".join(rng.choice(words, rng.integers(1, 40)))
        for _ in range(50)
    ] + [None, "", "xy"]  # degenerate docs

    def naive(text, k=3):
        if not text:
            return 0
        h = shingle_hashes(text, k).astype(np.uint64)
        if not len(h):
            return 0
        val = 0
        for b in range(64):
            ones = int(((h >> np.uint64(b)) & np.uint64(1)).sum())
            if 2 * ones - len(h) > 0:
                val |= 1 << b
        return np.uint64(val).astype(np.int64)

    got = simhash64(texts, 3)
    exp = np.array([naive(t) for t in texts], dtype=np.int64)
    assert (got == exp).all()


def test_minhash_batched_signature_matches_per_doc():
    """Slab-batched reduceat signatures equal the per-doc kernel."""
    import numpy as np
    import pyarrow as pa

    from mtb_validation_service_ray.functions.textfn import shingle_hashes
    from mtb_validation_service_ray.stages.dedup import (
        MinHashStage,
        minhash_signature,
    )

    rng = np.random.default_rng(7)
    words = ["lorem", "ipsum", "dolor", "sit", "amet", "consectetur"]
    texts = [
        " ".join(rng.choice(words, rng.integers(1, 60))) for _ in range(40)
    ] + [None, ""]
    stage = MinHashStage("text", "doc_id", num_perm=32, bands=8)
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = stage(batch).to_pandas()

    # reference: per-doc signature -> per-band hash via the same path
    # (compare band rows indirectly: identical band hashes per doc)
    import pandas as pd

    for i, t in enumerate(texts):
        if t is None:
            assert i not in set(got.doc_id)
            continue
        sig = minhash_signature(shingle_hashes(t, stage.k), stage.a, stage.b)
        bands_m = sig.reshape(stage.bands, stage.rows_per_band)
        for b in range(stage.bands):
            arr = np.ascontiguousarray(bands_m[b][None, :])
            exp_h = pd.util.hash_array(
                arr.view([("", arr.dtype)] * stage.rows_per_band).ravel()
            ).astype(np.int64)[0]
            row = got[(got.doc_id == i) & (got.band_id == b)]
            assert len(row) == 1 and row.band_hash.iloc[0] == exp_h, (i, b)


def test_verify_jaccard_bytes_gate_falls_back_to_join():
    """Huge candidate texts must trip the byte gate (pair count small)
    and produce the same verified pairs via the join arm."""
    import pyarrow as pa

    big = "word " * 20_000  # ~100 KB per doc
    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [big, big, "tiny different", "tiny different"],
        }
    )
    pairs = pa.table({"doc_a": [1, 3], "doc_b": [2, 4]})
    ds = rd.from_arrow(t)
    gated = (
        verify_jaccard_pairs(
            pairs, ds, threshold=0.5, strategy="broadcast",
            broadcast_max_bytes=10_000,
        )
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    plain = (
        verify_jaccard_pairs(pairs, ds, threshold=0.5, strategy="join",
                             num_partitions=2)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    assert gated.equals(plain)
    assert set(zip(gated.doc_a, gated.doc_b)) == {(1, 2), (3, 4)}


def test_hash_hamming_candidates_matches_brute_force():
    """phash-hamming candidates over a precomputed hash column equal
    the exact hamming ball from an n^2 numpy sweep (uncapped)."""
    import numpy as np
    import pyarrow as pa

    from mtb_validation_service_ray.stages.dedup import hash_hamming_candidates

    rng = np.random.default_rng(7)
    h = rng.integers(0, 2**63, 400).astype(np.int64)
    # plant near-dups at hamming 0..4 (4 must be excluded at budget 3)
    h[10] = h[11]
    h[20] = h[21] ^ (1 << 2)
    h[30] = h[31] ^ ((1 << 9) | (1 << 50))
    h[40] = h[41] ^ ((1 << 1) | (1 << 33) | (1 << 62))
    h[50] = h[51] ^ ((1 << 0) | (1 << 15) | (1 << 31) | (1 << 47))
    ids = np.array([f"i{k:04d}" for k in range(400)])
    t = pa.table({"image_id": pa.array(ids), "phash": pa.array(h)})
    got = (
        hash_hamming_candidates(
            rd.from_arrow(t), hash_col="phash", id_col="image_id",
            max_hamming=3, max_bucket_pairs=1_000_000,
        )
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    # brute force
    x = h.astype(np.uint64)
    d = np.bitwise_xor(x[:, None], x[None, :])
    cnt = np.zeros_like(d, dtype=np.int64)
    for s in range(64):
        cnt += ((d >> np.uint64(s)) & np.uint64(1)).astype(np.int64)
    ii, jj = np.where(np.triu(cnt <= 3, k=1))
    want = sorted(zip(ids[ii], ids[jj], cnt[ii, jj]))
    assert list(zip(got.doc_a, got.doc_b, got.hamming)) == want
    assert (got.sampled == 0).all()

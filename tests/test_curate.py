"""End-to-end curation pipeline golden: induced junk/exact/near
duplicates must vanish, clean documents must all survive, and the
per-stage accounting must add up."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from mtb_validation_service_ray.pipelines.curate import curate_documents

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa",
]


def _corpus():
    rng = np.random.default_rng(3)
    base = [
        " ".join(rng.choice(WORDS, 60)) + f" unique{i}" for i in range(40)
    ]
    docs, ids = list(base), [f"d{i:03d}a" for i in range(40)]
    for i in range(10):  # exact copies up to case/whitespace
        docs.append(base[i].upper() + "  ")
        ids.append(f"d{i:03d}x")
    for i in range(10, 20):  # near copies: ONE out-of-vocab word swap
        # (an in-vocab swap can be a no-op and collapse at the EXACT
        # stage instead; one changed word keeps Jaccard >= ~0.83)
        toks = base[i].split()
        toks[5] = "omega"
        docs.append(" ".join(toks))
        ids.append(f"d{i:03d}n")
    for i in range(5):  # junk: punct/digit-heavy
        docs.append("!!! 123 ## " * 2)
        ids.append(f"junk{i}")
    return pa.table({"doc_id": pa.array(ids), "text": pa.array(docs)})


def test_curate_documents_golden():
    res = curate_documents(
        rd.from_arrow(_corpus()).repartition(4), jaccard_threshold=0.7
    )
    surv = set(res.documents.to_pandas().doc_id)
    s = res.stats
    assert s["n_input"] == 65
    assert s["n_quality_dropped"] == 5
    # case/space copies collapse at the EXACT stage (trimmed+lowered
    # fingerprint), word-swapped copies at the NEAR stage
    assert s["n_exact_dropped"] == 10
    assert s["n_near_dropped"] == 10
    assert s["n_survivors"] == 40
    assert surv == {f"d{i:03d}a" for i in range(40)}
    # accounting closes
    assert (
        s["n_input"] - s["n_quality_dropped"] - s["n_language_dropped"]
        - s["n_exact_dropped"] - s["n_near_dropped"] == s["n_survivors"]
    )
    # no collision group was anywhere near the cap on this tiny corpus
    assert s["n_capped_groups"] == 0
    assert s["n_sampled_pairs"] == 0


def test_curate_cc_stays_distributed(monkeypatch):
    """The near-dup tail must never funnel label rows through the
    driver: curate asks connected_components for a DATASET and derives
    the loser set with a map_batches filter — the driver only ever
    receives counts (VERDICT r4 #1)."""
    import mtb_validation_service_ray.stages.dedup as dd

    seen = {}
    orig = dd.connected_components

    def spy(pairs, **kw):
        seen["as_dataset"] = kw.get("as_dataset", False)
        out = orig(pairs, **kw)
        seen["returns_dataset"] = isinstance(out, rd.Dataset)
        return out

    monkeypatch.setattr(dd, "connected_components", spy)
    res = curate_documents(
        rd.from_arrow(_corpus()).repartition(4), jaccard_threshold=0.7
    )
    assert seen == {"as_dataset": True, "returns_dataset": True}
    assert res.stats["n_near_dropped"] == 10
    assert all(isinstance(v, int) for v in res.stats.values())


def test_curate_distributed_cc_arm(monkeypatch):
    """Force the DISTRIBUTED connected-components arm through the full
    curate path: the label Dataset comes straight from the fixpoint's
    blocks (no driver collect anywhere) and the goldens are unchanged."""
    import mtb_validation_service_ray.stages.dedup as dd

    orig = dd.connected_components

    def force_distributed(pairs, **kw):
        kw["strategy"] = "distributed"
        out = orig(pairs, **kw)
        assert isinstance(out, rd.Dataset)
        return out

    monkeypatch.setattr(dd, "connected_components", force_distributed)
    res = curate_documents(
        rd.from_arrow(_corpus()).repartition(4), jaccard_threshold=0.7
    )
    assert res.stats["n_near_dropped"] == 10
    assert set(res.documents.to_pandas().doc_id) == {
        f"d{i:03d}a" for i in range(40)
    }


def test_curate_spill_dir_parquet_arm(tmp_path):
    """spill_dir keeps the multi-consumer deduped corpus on disk
    (partitioned Parquet) instead of the object store — same goldens."""
    res = curate_documents(
        rd.from_arrow(_corpus()).repartition(4),
        jaccard_threshold=0.7,
        spill_dir=str(tmp_path / "exact"),
    )
    assert set(res.documents.to_pandas().doc_id) == {
        f"d{i:03d}a" for i in range(40)
    }
    assert res.stats["n_survivors"] == 40
    assert (tmp_path / "exact").exists()


def test_curate_with_decontamination():
    """decontaminate_against drops docs overlapping the eval set inside
    the fused filter pass (broadcast arm) — and the forced Bloom-arm
    fallback produces identical survivors and stats."""
    corpus = _corpus()
    # eval set = the full text of two clean originals
    texts = corpus.column("text").to_pylist()
    ids = corpus.column("doc_id").to_pylist()
    ev = pa.table(
        {"text": pa.array([texts[ids.index("d030a")], texts[ids.index("d031a")]])}
    )
    results = {}
    for arm, gate in (("broadcast", 64 << 20), ("bloom", 0)):
        res = curate_documents(
            rd.from_arrow(corpus).repartition(4),
            jaccard_threshold=0.7,
            decontaminate_against=rd.from_arrow(ev),
            decontam_n=13,
            decontam_broadcast_max_bytes=gate,
        )
        surv = set(res.documents.to_pandas().doc_id)
        results[arm] = (surv, dict(res.stats))
        s = res.stats
        assert s["n_decontam_dropped"] == 2
        assert s["n_survivors"] == 38
        assert surv == {f"d{i:03d}a" for i in range(40)} - {"d030a", "d031a"}
        # accounting still closes with the extra stage
        assert (
            s["n_input"] - s["n_quality_dropped"] - s["n_language_dropped"]
            - s["n_decontam_dropped"] - s["n_exact_dropped"]
            - s["n_near_dropped"] == s["n_survivors"]
        )
    assert results["broadcast"] == results["bloom"]


def test_curate_capped_group_audit():
    """A planted hot near-dup cluster pushed past max_bucket_pairs must
    (a) still dedupe to its min-id representative (the star keeps
    connectivity) and (b) surface in stats, never silently
    (VERDICT r4 #4)."""
    rng = np.random.default_rng(5)
    base = " ".join(rng.choice(WORDS, 60))
    ids = [f"h{i:02d}" for i in range(12)]
    docs = [base + f" variant{i}" for i in range(12)]
    for i in range(5):  # clean bystanders
        ids.append(f"c{i:02d}")
        docs.append(" ".join(rng.choice(WORDS, 60)) + f" clean{i}")
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(docs)})
    res = curate_documents(
        rd.from_arrow(t).repartition(3),
        jaccard_threshold=0.7,
        max_bucket_pairs=3,
    )
    s = res.stats
    assert s["n_capped_groups"] >= 1
    assert s["n_sampled_pairs"] > 0
    assert s["n_near_dropped"] == 11
    surv = set(res.documents.to_pandas().doc_id)
    assert surv == {"h00"} | {f"c{i:02d}" for i in range(5)}


def test_curate_language_filter():
    t = pa.table({
        "doc_id": pa.array(["en1", "de1", "en2"]),
        "text": pa.array([
            "the cat sat on the mat and it was that kind of day for it",
            "der hund und die katze sind nicht mit von der partie zu haus",
            "it is the end of the day and that was it for the work",
        ]),
    })
    res = curate_documents(
        rd.from_arrow(t), languages=("en",), min_quality=0.0
    )
    assert set(res.documents.to_pandas().doc_id) == {"en1", "en2"}
    assert res.stats["n_language_dropped"] == 1

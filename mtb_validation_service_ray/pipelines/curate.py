"""End-to-end training-data curation over a documents table.

The capstone composition of the engine's LLM-data operators — the
pipeline a user would actually run to turn a raw crawl into a training
corpus (the north rule's training-data mandate; no reference analog —
the reference validates single records, SURVEY.md §2.3):

  1. **annotate + filter** — quality score and language-ID, both
     vectorized Arrow kernels (functions/textfn.py); drop low-quality
     and out-of-language rows in the same pass.  Optional eval-set
     DECONTAMINATION (``decontaminate_against=``) probes the broadcast
     eval gram set inside this same pass (stages/decontaminate.py
     semantics; byte-gated fallback to the standalone Bloom operator).
  2. **exact dedup** — case/whitespace-normalized 64-bit fingerprint
     (``polyhash_utf8``), keep the smallest id per fingerprint via the
     bucketed keep-first (stages/dedup.py::dedup_exact).
  3. **near dedup** — MinHash-LSH candidates → exact Jaccard
     verification at ``jaccard_threshold`` → connected components
     (Dataset-returning arm — the label rows stay in their blocks) →
     every cluster member except the min-id representative is dropped
     through the Bloom-prefiltered ANTI join (stages/bloomjoin.py).
     The loser set never exists on the driver: losers are a vectorized
     ``map_batches`` filter over the label Dataset and feed straight
     into the anti join, whose right side streams (VERDICT r4 #1).

Scale accounting (VERDICT r4 #2): per-stage drop counts come from a
zero-CPU counter actor incremented once per batch inside the single
annotate+filter pass, plus arithmetic over the two counts the pipeline
needs anyway (the deduped corpus and the loser set) — NOT from
materializing the full annotated corpus once per stage just to make
``count()`` cheap.  The only full-corpus pin left is the deduped
corpus itself, which three downstream consumers (candidate generation,
pair verification, the anti join's fact side) would otherwise each
recompute through the dedup shuffle; pass ``spill_dir`` to keep even
that copy on disk as partitioned Parquet (the resumable 100 TB shape)
instead of in the object store.

Counter caveat: increments are at-least-once under Ray task *retries*
(a re-executed batch re-counts).  Retries only happen on worker loss;
for exact accounting after a failure, re-run the stage from its
checkpoint (pipelines/checkpoint.py) — the counts here are job
telemetry, the corpus itself is exact either way.

Every stage is the already-tested distributed operator; this module
only composes them.  Results are deterministic for a fixed seed set
(MinHash params are seed-pinned); the pair CANDIDATE set is
probabilistic in principle, so the pipeline is verified by pytest
goldens (induced duplicates must vanish, clean docs must survive)
rather than a SQL oracle.  Capped collision groups are never silent:
``stats`` carries ``n_capped_groups`` / ``n_sampled_pairs`` from the
candidate stage's ``overflow_report``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


@dataclass
class CurationResult:
    """Surviving corpus + per-stage accounting."""

    documents: rd.Dataset
    stats: dict[str, int] = field(default_factory=dict)


@ray.remote(num_cpus=0)
class _StageCounters:
    """Zero-CPU accumulator for per-batch stage counters.  One blocking
    ``add`` RPC per *batch* (not per row) — sub-millisecond against
    16k-row batches, and the blocking ``ray.get`` is what guarantees
    every increment landed before the driver reads the totals."""

    def __init__(self) -> None:
        self._c: dict[str, int] = {}

    def add(self, **counts: int) -> None:
        for k, v in counts.items():
            self._c[k] = self._c.get(k, 0) + int(v)

    def get(self) -> dict[str, int]:
        return dict(self._c)


def curate_documents(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.35,
    languages: tuple[str, ...] | None = None,
    jaccard_threshold: float = 0.8,
    shingle_k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    max_bucket_pairs: int | None = None,
    spill_dir: str | None = None,
    cc_strategy: str = "auto",
    decontaminate_against: rd.Dataset | None = None,
    decontam_n: int = 13,
    decontam_broadcast_max_bytes: int = 64 << 20,
) -> CurationResult:
    """Run the full curation pipeline; see the module docstring.

    ``languages=None`` skips the language filter.  ``spill_dir`` (a
    local/shared path) spills the deduped corpus to partitioned Parquet
    instead of pinning it in the object store — the multi-consumer
    checkpoint a 100 TB run wants.

    ``decontaminate_against`` adds eval-set decontamination (drop any
    doc sharing a word ``decontam_n``-gram with the given corpus —
    stages/decontaminate.py semantics) between the quality/language
    filter and dedup.  While the eval gram set fits
    ``decontam_broadcast_max_bytes`` (benchmarks are small — the
    overwhelmingly common case) the membership probe runs INSIDE the
    same fused annotate+filter pass: zero extra passes, exact counts.
    A larger eval set falls back to the standalone Bloom-arm operator,
    which scans its input twice — the filtered corpus is then pinned
    (or spilled to ``<spill_dir>_prefilter``) so the counter actor
    still sees every batch exactly once.

    Returns the surviving documents (original columns, LAZY — consume
    with ``write_parquet`` or ``iter_batches``) plus a ``stats`` dict
    with ``n_input, n_quality_dropped, n_language_dropped,
    n_decontam_dropped, n_exact_dropped, n_near_dropped, n_survivors,
    n_capped_groups, n_sampled_pairs``."""
    from ..functions.textfn import detect_language, fingerprint64, quality_score
    from ..stages.bloomjoin import bloom_semi_join
    from ..stages.dedup import (
        capped_group_stats,
        connected_components,
        dedup_exact,
        minhash_lsh_candidates,
        overflow_report,
        verify_jaccard_pairs,
    )

    counters = _StageCounters.remote()
    lang_values = (
        pa.array(sorted(set(languages)), pa.string())
        if languages is not None
        else None
    )

    # eval-set decontamination setup: build the (distinct-per-batch)
    # gram-hash set once; the common small case broadcasts a sorted
    # uint64 array probed inside the fused pass below
    ev_ref = None
    decontam_fallback = False
    if decontaminate_against is not None:
        import numpy as np

        from ..stages.decontaminate import eval_gram_hashes

        ev_grams = eval_gram_hashes(
            decontaminate_against, text_col=text_col, n=decontam_n
        ).materialize()
        if (ev_grams.size_bytes() or 0) <= decontam_broadcast_max_bytes:
            tabs = [t for t in ray.get(ev_grams.to_arrow_refs()) if t.num_rows]
            ev = (
                np.unique(
                    np.concatenate(
                        [t.column("_g").to_numpy(zero_copy_only=False)
                         for t in tabs]
                    ).view(np.uint64)
                )
                if tabs
                else np.empty(0, dtype=np.uint64)
            )
            ev_ref = ray.put(ev)
        else:
            decontam_fallback = True

    def annotate_filter(batch: pa.Table) -> pa.Table:
        n_in = batch.num_rows
        q = quality_score(batch.column(text_col))
        keep_q = pc.fill_null(pc.greater_equal(q, min_quality), False)
        batch_q = batch.filter(keep_q)
        n_qdrop = n_in - batch_q.num_rows
        if lang_values is not None:
            keep_l = pc.fill_null(
                pc.is_in(
                    detect_language(batch_q.column(text_col)),
                    value_set=lang_values,
                ),
                False,
            )
            batch_l = batch_q.filter(keep_l)
        else:
            batch_l = batch_q
        n_ldrop = batch_q.num_rows - batch_l.num_rows
        n_ddrop = 0
        if ev_ref is not None:
            import numpy as np

            from ..stages.decontaminate import _gram_flat, _per_doc_any

            ev_sorted = ray.get(ev_ref)
            flat, offsets = _gram_flat(
                batch_l.column(text_col).to_pylist(), decontam_n
            )
            if len(ev_sorted) and len(flat):
                idx = np.minimum(
                    np.searchsorted(ev_sorted, flat), len(ev_sorted) - 1
                )
                flags = ev_sorted[idx] == flat
            else:
                flags = np.zeros(len(flat), dtype=bool)
            hit = _per_doc_any(flags, offsets)
            batch_l = batch_l.filter(pa.array(~hit))
            n_ddrop = int(hit.sum())
        ray.get(
            counters.add.remote(
                n_input=n_in,
                n_quality_dropped=n_qdrop,
                n_language_dropped=n_ldrop,
                n_decontam_dropped=n_ddrop,
            )
        )
        return batch_l.append_column(
            "_fp", fingerprint64(batch_l.column(text_col))
        )

    filtered = ds.map_batches(
        annotate_filter, batch_format="pyarrow", zero_copy_batch=True
    )

    if decontam_fallback:
        from ..stages.decontaminate import decontaminate

        # the Bloom-arm operator scans its input twice (maybes +
        # definite keeps) — pin the filtered corpus so the counters
        # above saw every batch exactly once
        if spill_dir is not None:
            pre = spill_dir.rstrip("/") + "_prefilter"
            filtered.write_parquet(pre)
            filtered = rd.read_parquet(pre)
        else:
            filtered = filtered.materialize()
        cleaned = decontaminate(
            filtered,
            decontaminate_against,
            id_col=id_col,
            text_col=text_col,
            n=decontam_n,
            mode="drop",
            broadcast_max_bytes=decontam_broadcast_max_bytes,
        )

        def count_through(batch: pa.Table) -> pa.Table:
            ray.get(counters.add.remote(n_after_decontam=batch.num_rows))
            return batch

        filtered = cleaned.map_batches(
            count_through, batch_format="pyarrow", zero_copy_batch=True
        )

    # the deduped corpus feeds THREE consumers (LSH candidates, pair
    # verification texts, anti-join fact side) — pin it once rather
    # than re-running the read + filter + dedup shuffle per consumer
    exact = dedup_exact(filtered, ["_fp"], id_col=id_col)
    if spill_dir is not None:
        exact.write_parquet(spill_dir)
        exact = rd.read_parquet(spill_dir)
    else:
        exact = exact.materialize()

    # upstream has now executed exactly once (dedup_exact is a single
    # linear pipeline into the pin above) — the counters are final
    stats: dict[str, int] = ray.get(counters.get.remote())
    stats.setdefault("n_input", 0)
    stats.setdefault("n_quality_dropped", 0)
    stats.setdefault("n_language_dropped", 0)
    stats.setdefault("n_decontam_dropped", 0)
    n_after_filter = (
        stats["n_input"]
        - stats["n_quality_dropped"]
        - stats["n_language_dropped"]
    )
    if decontam_fallback:
        # the fused pass couldn't see the Bloom-arm drops — derive them
        # from the pass-through count on the decontaminated stream
        # key absent ⇔ zero rows survived (no batch flowed through)
        stats["n_decontam_dropped"] = n_after_filter - stats.pop(
            "n_after_decontam", 0
        )
    n_after_decontam = n_after_filter - stats["n_decontam_dropped"]
    n_exact_kept = exact.count()
    stats["n_exact_dropped"] = n_after_decontam - n_exact_kept

    from ..stages.dedup import DEFAULT_MAX_BUCKET_PAIRS

    cap = max_bucket_pairs or DEFAULT_MAX_BUCKET_PAIRS
    candidates = minhash_lsh_candidates(
        exact,
        text_col=text_col,
        id_col=id_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        max_bucket_pairs=cap,
    )
    # skew audit (VERDICT r4 #4): capped collision groups change which
    # docs survive — surface them instead of discarding the trail.
    # candidates' pair stream is pinned inside _dedupe_pair_stream, so
    # this extra consumer re-runs only the tiny sampled-pairs aggregate.
    stats.update(capped_group_stats(overflow_report(candidates), max_pairs=cap))

    verified = verify_jaccard_pairs(
        candidates,
        exact,
        id_col=id_col,
        text_col=text_col,
        threshold=jaccard_threshold,
        shingle_k=shingle_k,
    )
    clusters = connected_components(
        verified, as_dataset=True, strategy=cc_strategy
    )

    def losers_only(batch: pa.Table) -> pa.Table:
        keep = pc.invert(
            pc.equal(batch.column("id"), batch.column("cluster"))
        )
        return batch.filter(pc.fill_null(keep, False)).select(["id"])

    # id-only, O(duplicate docs) — pinned because the anti join's Bloom
    # build + exact verify read it more than once; never on the driver
    losers = clusters.map_batches(
        losers_only, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_near = losers.count()
    stats["n_near_dropped"] = n_near

    if n_near:
        survivors = bloom_semi_join(
            exact,
            losers,
            on=(id_col, "id"),
            mode="anti",
            expected_keys=n_near,
        )
    else:
        survivors = exact
    # the anti join removes exactly the loser ids (each present once in
    # the deduped corpus by construction) — no counting pass needed
    stats["n_survivors"] = n_exact_kept - n_near

    def strip(batch: pa.Table) -> pa.Table:
        drop = [c for c in ("_fp",) if c in batch.column_names]
        return batch.drop_columns(drop)

    out = survivors.map_batches(
        strip, batch_format="pyarrow", zero_copy_batch=True
    )
    return CurationResult(documents=out, stats=stats)

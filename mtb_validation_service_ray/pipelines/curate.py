"""End-to-end training-data curation over a documents table.

The capstone composition of the engine's LLM-data operators — the
pipeline a user would actually run to turn a raw crawl into a training
corpus (the north rule's training-data mandate; no reference analog —
the reference validates single records, SURVEY.md §2.3):

  1. **annotate + filter** — quality score and language-ID, both
     vectorized Arrow kernels (functions/textfn.py); drop low-quality
     and out-of-language rows in the same pass.
  2. **exact dedup** — case/whitespace-normalized 64-bit fingerprint
     (``polyhash_utf8``), keep the smallest id per fingerprint via the
     bucketed keep-first (stages/dedup.py::dedup_exact).
  3. **near dedup** — MinHash-LSH candidates → exact Jaccard
     verification at ``jaccard_threshold`` → connected components →
     every cluster member except the min-id representative is dropped
     through the Bloom-prefiltered ANTI join (stages/bloomjoin.py), so
     the loser set never has to fit on the driver.

Every stage is the already-tested distributed operator; this module
only composes them and accounts per-stage row drops.  Results are
deterministic for a fixed seed set (MinHash params are seed-pinned);
the pair CANDIDATE set is probabilistic in principle, so the pipeline
is verified by pytest goldens (induced duplicates must vanish, clean
docs must survive) rather than a SQL oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


@dataclass
class CurationResult:
    """Surviving corpus + per-stage accounting."""

    documents: rd.Dataset
    stats: dict[str, int] = field(default_factory=dict)


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
) -> CurationResult:
    """Run the full curation pipeline; see the module docstring.

    ``languages=None`` skips the language filter.  Returns the
    surviving documents (original columns) plus a ``stats`` dict with
    ``n_input, n_quality_dropped, n_language_dropped, n_exact_dropped,
    n_near_dropped, n_survivors``."""
    from ..functions.textfn import detect_language, fingerprint64, quality_score
    from ..stages.bloomjoin import bloom_semi_join
    from ..stages.dedup import (
        connected_components,
        dedup_exact,
        minhash_lsh_candidates,
        verify_jaccard_pairs,
    )

    stats: dict[str, int] = {}

    def annotate(batch: pa.Table) -> pa.Table:
        q = quality_score(batch.column(text_col))
        batch = batch.append_column("_quality", q)
        if languages is not None:
            batch = batch.append_column(
                "_lang", detect_language(batch.column(text_col))
            )
        return batch

    annotated = ds.map_batches(
        annotate, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    stats["n_input"] = annotated.count()

    quality_ok = annotated.filter(
        expr=f"_quality >= {min_quality!r}"
    ).materialize()
    stats["n_quality_dropped"] = stats["n_input"] - quality_ok.count()

    if languages is not None:
        lang_set = set(languages)

        def lang_filter(batch: pa.Table) -> pa.Table:
            keep = pc.is_in(
                batch.column("_lang"),
                value_set=pa.array(sorted(lang_set), pa.string()),
            )
            return batch.filter(pc.fill_null(keep, False))

        in_lang = quality_ok.map_batches(
            lang_filter, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    else:
        in_lang = quality_ok
    stats["n_language_dropped"] = quality_ok.count() - in_lang.count()

    def add_fp(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_fp", fingerprint64(batch.column(text_col))
        )

    exact = dedup_exact(
        in_lang.map_batches(add_fp, batch_format="pyarrow", zero_copy_batch=True),
        ["_fp"],
        id_col=id_col,
    ).materialize()
    stats["n_exact_dropped"] = in_lang.count() - exact.count()

    candidates = minhash_lsh_candidates(
        exact,
        text_col=text_col,
        id_col=id_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
    )
    verified = verify_jaccard_pairs(
        candidates,
        exact,
        id_col=id_col,
        text_col=text_col,
        threshold=jaccard_threshold,
        shingle_k=shingle_k,
    )
    clusters = connected_components(verified)  # (id, cluster) pa.Table
    losers = clusters.filter(
        pc.invert(pc.equal(clusters.column("id"), clusters.column("cluster")))
    ).select(["id"])
    stats["n_near_dropped"] = losers.num_rows

    if losers.num_rows:
        survivors = bloom_semi_join(
            exact,
            rd.from_arrow(losers),
            on=(id_col, "id"),
            mode="anti",
        )
    else:
        survivors = exact

    def strip(batch: pa.Table) -> pa.Table:
        drop = [c for c in ("_quality", "_lang", "_fp") if c in batch.column_names]
        return batch.drop_columns(drop)

    out = survivors.map_batches(
        strip, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    stats["n_survivors"] = out.count()
    return CurationResult(documents=out, stats=stats)

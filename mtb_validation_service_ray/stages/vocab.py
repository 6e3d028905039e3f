"""Corpus vocabulary aggregation: distributed term counting and top-k
terms.

The tokenizer is Arrow-native (``utf8_lower`` + ``utf8_split_whitespace``
+ ``list_flatten`` — no per-document Python), partial counts collapse
inside each batch before the shuffle, and the top-k merge is the same
local-topk → tiny-candidate-stream pattern as the engine's other
distributed top-k reduces (the full vocabulary never lands on the
driver).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _local_term_counts(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-batch term→count partial: Arrow-native tokenize (lower +
    whitespace split) then ``value_counts`` on the flattened tokens."""
    toks = pc.list_flatten(
        pc.utf8_split_whitespace(pc.utf8_lower(batch.column(text_col)))
    )
    toks = pc.drop_null(toks)
    if len(toks) == 0:
        return pa.table(
            {"term": pa.array([], pa.string()), "_n": pa.array([], pa.int64())}
        )
    vc = toks.combine_chunks().value_counts()
    t = pa.table(
        {
            "term": vc.field("values"),
            "_n": vc.field("counts").cast(pa.int64()),
        }
    )
    # utf8_split_whitespace never emits empty tokens, but guard the
    # empty-string term anyway so the contract is explicit
    return t.filter(pc.not_equal(t.column("term"), ""))


def term_counts(ds: rd.Dataset, *, text_col: str = "text") -> rd.Dataset:
    """Distributed term→count aggregate over a text column.

    Scale shape: each batch tokenizes vectorized and emits its LOCAL
    term counts (``value_counts`` on the flattened token array), so the
    shuffle moves at most ``distinct_terms_per_batch`` rows per batch —
    for natural language that is Zipf-bounded far below the token
    count.  The partials merge through ``bucketed_group_agg``, not
    Ray's native aggregate: ``term`` is a high-cardinality STRING key,
    the exact shape whose per-output-group sort-aggregate cost the
    engine measured at the 1M skew drill (stages/groupagg.py)."""
    from .groupagg import bucketed_group_agg

    partials = ds.map_batches(
        lambda b: _local_term_counts(b, text_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    # partials are already collapsed per batch; skip the second pass
    return bucketed_group_agg(
        partials, ["term"], [("n", "_n", "sum")], partial=False
    )


def top_terms(
    ds: rd.Dataset, *, text_col: str = "text", k: int = 20
) -> pa.Table:
    """Top-``k`` most frequent terms (ties broken by term ascending).

    Each block of the merged term counts keeps only its local top-k
    (vectorized lexsort select); the driver merges the tiny
    ``#blocks × k`` candidate stream."""
    counts = term_counts(ds, text_col=text_col)

    def local_topk(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        terms = batch.column("term").to_numpy(zero_copy_only=False)
        order = np.lexsort((terms, -n))[:k]
        return pa.table(
            {
                "term": pa.array(terms[order], pa.string()),
                "n": pa.array(n[order], pa.int64()),
            }
        )

    # driver merge of the tiny #blocks × k candidate stream; drop
    # zero-row blocks first (Ray's sort aggregate can emit schema-less
    # empties that would poison concat_tables)
    import ray

    tables = [
        t
        for t in ray.get(
            counts.map_batches(local_topk, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not tables:
        return pa.table(
            {"term": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    merged = pa.concat_tables(tables)
    n = merged.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    terms = merged.column("term").to_numpy(zero_copy_only=False)
    order = np.lexsort((terms, -n))[:k]
    return pa.table(
        {
            "term": pa.array(terms[order], pa.string()),
            "n": pa.array(n[order], pa.int64()),
        }
    )


def term_doc_stats(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-(document, term) stats: ``(doc_id, term, tf, df)`` with
    ``tf`` = occurrences of term in doc and ``df`` = number of distinct
    docs containing the term — the exact integer core of tf-idf,
    kept log-free so a SQL oracle matches bit-for-bit.

    Scale shape: tokenize Arrow-native and pre-collapse each batch to
    (doc, term) partial counts, then ONE term-hash bucket shuffle;
    because every row of a term lands in one bucket, a single
    vectorized pandas body per bucket finishes tf (groupby sum) AND df
    (per-term transform) with no second shuffle or driver-side
    vocabulary.  Skew bound: a stopword-scale term concentrates its
    (doc, term) partials in one bucket — rows per bucket ≤ Σ docs over
    its terms; raise ``num_buckets`` (and rely on the per-batch
    collapse) before sharding hot terms."""
    from ..functions.sketches import hash64

    if num_buckets is None:
        import ray

        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def explode(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(
                pc.utf8_lower(pc.fill_null(batch.column(text_col), ""))
            )
        )
        flat = pc.list_flatten(toks)
        ids = batch.column(id_col).take(pc.list_parent_indices(toks))
        t = pa.table({id_col: ids, "term": flat})
        t = t.filter(pc.not_equal(t.column("term"), ""))
        # per-batch partial collapse before the shuffle
        g = (
            t.to_pandas()
            .groupby([id_col, "term"], sort=False)
            .size()
            .rename("tf")
            .reset_index()
        )
        out = pa.Table.from_pandas(g, preserve_index=False)
        h = hash64(out.column("term").to_numpy(zero_copy_only=False))
        return out.append_column(
            "_bucket", pa.array((h % np.uint64(num_buckets)).astype("int32"))
        )

    def finish_bucket(group):
        import pandas as pd

        g = (
            group.drop(columns=["_bucket"])
            .groupby([id_col, "term"], sort=False)
            .agg(tf=("tf", "sum"))
            .reset_index()
        )
        g["tf"] = g["tf"].astype("int64")
        g["df"] = (
            g.groupby("term", sort=False)["term"].transform("size").astype("int64")
        )
        return g

    return (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(finish_bucket, batch_format="pandas")
    )


def doc_top_term(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """The most DISTINCTIVE term per document: max tf, ties broken by
    min df (rarer corpus-wide wins), then term ascending — an exact,
    integer-only stand-in for tf-idf argmax (no log ⇒ no FP rounding
    ties against the SQL oracle).  One more doc-keyed shuffle on top of
    ``term_doc_stats`` (``cap_per_key`` n=1)."""
    from .split import cap_per_key

    stats = term_doc_stats(ds, id_col=id_col, text_col=text_col)

    def add_neg(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_neg_tf",
            pc.negate(batch.column("tf")),
        )

    top = cap_per_key(
        stats.map_batches(add_neg, batch_format="pyarrow", zero_copy_batch=True),
        key_col=id_col,
        n=1,
        order_cols=["_neg_tf", "df", "term"],
    )
    return top.drop_columns(["_neg_tf"])


def cms_top_terms(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    k: int = 20,
    candidates_per_batch: int | None = None,
    width: int = 1 << 15,
    depth: int = 4,
) -> pa.Table:
    """Approximate top-``k`` terms via count-min sketch — the scale
    path when even the Zipf-bounded distinct-term stream of
    ``top_terms`` is too wide to reduce exactly.

    One pass over the corpus emits, per batch, (a) its local top-C
    candidate terms and (b) ONE fixed-size CMS blob folding the
    batch's full term counts.  CMS blobs merge by elementwise sum
    (fan-in ``map_batches`` pass, driver sums the tail — same shape as
    the Bloom build); the merged sketch broadcasts once and scores the
    deduplicated candidate union vectorized.  CMS estimates are
    one-sided (never under-count), so a true top-k term loses only if
    it missed every batch's top-C — C defaults to ``4k``.

    Output: ``{term, n_est}``, n_est = CMS estimate, ties broken by
    term ascending.  Tolerance vs the exact ``top_terms`` twin is
    asserted in tests."""
    import ray

    from ..functions.sketches import CountMinSketch
    from .groupagg import bucketed_group_agg

    C = candidates_per_batch or 4 * k

    def partial(batch: pa.Table) -> pa.Table:
        counts = _local_term_counts(batch, text_col)
        n = counts.column("_n").to_numpy(zero_copy_only=False)
        terms = counts.column("term").to_numpy(zero_copy_only=False)
        cms = CountMinSketch(width, depth)
        if len(terms):
            cms.add(terms, n)
        order = np.lexsort((terms, -n))[:C]
        cand = terms[order]
        return pa.table({
            "term": pa.array(
                np.concatenate([cand, [""]]), pa.string()
            ),
            "_blob": pa.array(
                [None] * len(cand) + [cms.counts.tobytes()],
                pa.large_binary(),
            ),
        })

    # candidate rows + one sketch row per batch — tiny; pin it so the
    # two consumers below don't re-tokenize the corpus
    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def keep_blobs(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch.column("_blob"))).select(["_blob"])

    def sum_blobs(batch: pa.Table) -> pa.Table:
        acc = np.zeros((depth, width), dtype=np.int64)
        for buf in batch.column("_blob"):
            acc += np.frombuffer(buf.as_py(), dtype=np.int64).reshape(depth, width)
        return pa.table({"_blob": pa.array([acc.tobytes()], pa.large_binary())})

    acc = np.zeros((depth, width), dtype=np.int64)
    merged = partials.map_batches(
        keep_blobs, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(sum_blobs, batch_format="pyarrow", batch_size=64)
    for b in merged.iter_batches(batch_size=64, batch_format="pyarrow"):
        for buf in b.column("_blob"):
            acc += np.frombuffer(buf.as_py(), dtype=np.int64).reshape(depth, width)
    cms_ref = ray.put(acc)

    cands = bucketed_group_agg(
        partials.map_batches(
            lambda b: b.filter(pc.is_null(b.column("_blob"))).select(["term"]),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        ["term"], [("_c", "term", "count")], partial=False,
    )

    def score(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_numpy(zero_copy_only=False)
        cms = CountMinSketch(width, depth, ray.get(cms_ref))
        est = cms.estimate(terms) if len(terms) else np.array([], np.int64)
        order = np.lexsort((terms, -est))[:k]
        return pa.table({
            "term": pa.array(terms[order], pa.string()),
            "n_est": pa.array(est[order], pa.int64()),
        })

    tables = [
        t for t in ray.get(
            cands.map_batches(score, batch_format="pyarrow").to_arrow_refs()
        ) if t.num_rows
    ]
    if not tables:
        return pa.table(
            {"term": pa.array([], pa.string()), "n_est": pa.array([], pa.int64())}
        )
    m = pa.concat_tables(tables)
    est = m.column("n_est").to_numpy(zero_copy_only=False).astype(np.int64)
    terms = m.column("term").to_numpy(zero_copy_only=False)
    order = np.lexsort((terms, -est))[:k]
    return pa.table({
        "term": pa.array(terms[order], pa.string()),
        "n_est": pa.array(est[order], pa.int64()),
    })

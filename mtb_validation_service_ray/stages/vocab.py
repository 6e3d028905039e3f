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
from ray.data.aggregate import Sum


def term_counts(ds: rd.Dataset, *, text_col: str = "text") -> rd.Dataset:
    """Distributed term→count aggregate over a text column.

    Scale shape: each batch tokenizes vectorized and emits its LOCAL
    term counts (``value_counts`` on the flattened token array), so the
    shuffle moves at most ``distinct_terms_per_batch`` rows per batch —
    for natural language that is Zipf-bounded far below the token
    count.  One hash ``groupby(term).sum`` merges the partials."""

    def local_counts(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.utf8_split_whitespace(pc.utf8_lower(batch.column(text_col)))
        )
        toks = pc.drop_null(toks)
        if len(toks) == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "_n": pa.array([], pa.int64()),
                }
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

    return (
        ds.map_batches(local_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("_n", alias_name="n"))
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

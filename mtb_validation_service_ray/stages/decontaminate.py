"""Eval-set decontamination: flag or drop training documents that share
any word n-gram with a benchmark / eval corpus.

The standard LLM-training-data hygiene operator (GPT-3 §C / PaLM-style
13-gram overlap): a training doc that contains ANY n-gram also present
in an evaluation set leaks the benchmark into training.  No reference
analog — brief-driven, like the rest of the dedup family (VERDICT r4
missing #2).

Semantics: word n-grams over the lowercased, whitespace-split text
(``functions/textfn.shingle_hashes_batch`` with the char-gram fallback
OFF — a doc with fewer than ``n`` tokens shares no n-gram with
anything, exactly what SQL ``len(tokens) >= n`` reproduces).  Gram
identity is the engine's 64-bit rolling polynomial over token hashes:
equal token windows hash equal; distinct windows collide at ~2^-64, so
an oracle comparing gram *strings* agrees with the hash comparison.

Plan (the broadcast/Bloom split the engine uses everywhere):

* **broadcast arm** — the eval gram set usually compresses to a few
  MiB of distinct uint64s (benchmarks are small).  Collect the
  distinct hashes once (byte-gated), ``ray.put`` the sorted array, and
  every training batch does one vectorized ``searchsorted`` membership
  probe + a cumsum-diff per-doc ANY — one streaming pass, no shuffle.
* **Bloom arm** — when the eval grams exceed the gate, build a Bloom
  bitmap over them (``stages/bloomjoin.build_bloom`` — fixed-size
  fan-in merge), prefilter every training gram, and emit only the
  (doc_id, gram) MAYBE pairs — true matches + ``fp_rate`` of the gram
  volume — into ``bloom_semi_join`` for exact verification.  The
  verified contaminated-id set (bounded by truly contaminated docs) is
  then applied to the corpus with the byte-gated broadcast filter or
  the streaming anti join.  Result is EXACT on both arms; the Bloom
  only shrinks the verify input.

Partitioning assumption: none beyond ``bloom_semi_join``'s — no stage
here keys anything by doc, so skew cannot concentrate (the gram
exchange keys by gram hash, uniform by construction).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.textfn import shingle_hashes_batch


def _gram_flat(texts: list, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Flattened word-n-gram hashes (uint64) + per-doc offsets for one
    batch of texts.  Docs with < n tokens contribute zero grams."""
    hs = shingle_hashes_batch(texts, n, char_fallback=False)
    lens = np.fromiter((len(h) for h in hs), dtype=np.int64, count=len(hs))
    offsets = np.zeros(len(hs) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = (
        np.concatenate(hs).astype(np.uint64)
        if offsets[-1]
        else np.empty(0, dtype=np.uint64)
    )
    return flat, offsets


def _per_doc_any(flags: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-doc ANY over flat per-gram booleans — cumsum-diff, safe on
    zero-gram docs (where reduceat misbehaves)."""
    cs = np.zeros(len(flags) + 1, dtype=np.int64)
    np.cumsum(flags, out=cs[1:])
    return (cs[offsets[1:]] - cs[offsets[:-1]]) > 0


def eval_gram_hashes(
    eval_ds: rd.Dataset, *, text_col: str = "text", n: int = 13
) -> rd.Dataset:
    """Distinct-per-batch word-n-gram hashes of the eval corpus as a
    one-column (``_g`` int64) Dataset.  Cross-batch duplicates are fine
    for every consumer (broadcast collect re-uniques; Bloom ORs)."""

    def grams(batch: pa.Table) -> pa.Table:
        flat, _ = _gram_flat(batch.column(text_col).to_pylist(), n)
        u = np.unique(flat)
        return pa.table({"_g": pa.array(u.view(np.int64), pa.int64())})

    return eval_ds.select_columns([text_col]).map_batches(
        grams, batch_format="pyarrow", zero_copy_batch=True
    )


def decontaminate(
    ds: rd.Dataset,
    eval_ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
    n: int = 13,
    mode: str = "drop",
    broadcast_max_bytes: int = 64 << 20,
    fp_rate: float = 1e-4,
) -> rd.Dataset:
    """Remove (``mode="drop"``) or mark (``mode="flag"``, appends a
    ``contaminated`` bool column) training docs sharing any word
    ``n``-gram with ``eval_ds``.  Exact on both arms; see module
    docstring for the byte-gated broadcast ↔ Bloom switch.

    ``fp_rate`` sizes the Bloom arm's bitmap — keep it well below
    ``1 / grams_per_doc`` so clean docs rarely pay the exact-verify
    detour (the default 1e-4 keeps the maybe volume at ~0.01% of the
    corpus gram count plus true matches)."""
    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")
    grams = eval_gram_hashes(
        eval_ds, text_col=eval_text_col or text_col, n=n
    ).materialize()

    if (grams.size_bytes() or 0) <= broadcast_max_bytes:
        tabs = [t for t in ray.get(grams.to_arrow_refs()) if t.num_rows]
        ev = (
            np.unique(
                np.concatenate(
                    [t.column("_g").to_numpy(zero_copy_only=False) for t in tabs]
                ).view(np.uint64)
            )
            if tabs
            else np.empty(0, dtype=np.uint64)
        )
        ev_ref = ray.put(ev)

        def probe(batch: pa.Table) -> pa.Table:
            ev_sorted = ray.get(ev_ref)
            flat, offsets = _gram_flat(batch.column(text_col).to_pylist(), n)
            if len(ev_sorted) and len(flat):
                idx = np.minimum(
                    np.searchsorted(ev_sorted, flat), len(ev_sorted) - 1
                )
                flags = ev_sorted[idx] == flat
            else:
                flags = np.zeros(len(flat), dtype=bool)
            hit = _per_doc_any(flags, offsets)
            if mode == "flag":
                return batch.append_column("contaminated", pa.array(hit))
            return batch.filter(pa.array(~hit))

        return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)

    # --- Bloom arm ---------------------------------------------------------
    from .bloomjoin import _test_bits, bloom_params, bloom_semi_join, build_bloom

    n_grams = grams.count()
    m_bits, k_hashes = bloom_params(n_grams, fp_rate)
    words_ref = ray.put(build_bloom(grams, "_g", m_bits, k_hashes))
    id_type = _schema(ds).field(id_col).type

    def maybe_pairs(batch: pa.Table) -> pa.Table:
        words = ray.get(words_ref)
        flat, offsets = _gram_flat(batch.column(text_col).to_pylist(), n)
        if len(flat):
            flags = _test_bits(
                words, flat.view(np.int64), m_bits, k_hashes
            )
        else:
            flags = np.zeros(0, dtype=bool)
        doc_of = np.repeat(
            np.arange(batch.num_rows, dtype=np.int64),
            np.diff(offsets),
        )[flags]
        return pa.table(
            {
                "_id": batch.column(id_col).take(pa.array(doc_of)),
                "_g": pa.array(flat[flags].view(np.int64), pa.int64()),
            }
        )

    confirmed = bloom_semi_join(
        ds.select_columns([id_col, text_col]).map_batches(
            maybe_pairs, batch_format="pyarrow", zero_copy_batch=True
        ),
        grams,
        on=("_g", "_g"),
        expected_keys=n_grams,
        fp_rate=fp_rate,
    )

    def distinct_ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "_id" not in batch.column_names:
            return pa.table({"_id": pa.array([], id_type)})
        return pa.table({"_id": pc.unique(batch.column("_id"))})

    # bounded by TRULY contaminated docs (exact post-verify) — tiny
    contaminated = confirmed.map_batches(
        distinct_ids, batch_format="pyarrow"
    ).materialize()

    if mode == "drop":
        return bloom_semi_join(
            ds, contaminated, on=(id_col, "_id"), mode="anti",
            expected_keys=max(1, contaminated.count()),
        )
    if (contaminated.size_bytes() or 0) <= broadcast_max_bytes:
        tabs = [t for t in ray.get(contaminated.to_arrow_refs()) if t.num_rows]
        ids_arr = (
            pc.unique(pa.concat_tables(tabs).column("_id").combine_chunks())
            if tabs
            else pa.array([], id_type)
        )
        ids_ref = ray.put(ids_arr)

        def mark(batch: pa.Table) -> pa.Table:
            hit = pc.fill_null(
                pc.is_in(batch.column(id_col), value_set=ray.get(ids_ref)),
                False,
            )
            return batch.append_column("contaminated", hit)

        return ds.map_batches(mark, batch_format="pyarrow", zero_copy_batch=True)

    # contaminated-id set too large to broadcast: two streaming passes
    def lit(flag: bool):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "contaminated", pa.array(np.full(batch.num_rows, flag))
            )

        return fn

    kw = dict(on=(id_col, "_id"), expected_keys=max(1, contaminated.count()))
    return (
        bloom_semi_join(ds, contaminated, mode="anti", **kw)
        .map_batches(lit(False), batch_format="pyarrow")
        .union(
            bloom_semi_join(ds, contaminated, mode="semi", **kw).map_batches(
                lit(True), batch_format="pyarrow"
            )
        )
    )


def _schema(ds: rd.Dataset) -> pa.Schema:
    s = ds.schema()
    return getattr(s, "base_schema", s)

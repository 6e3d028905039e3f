"""Decode pass — every rule that reads the ``bytes`` payload.

Evaluates (a) vectorized payload rules (presence of ``bytes``, the
raw-length cross-field check) and (b) per-image decode rules
(``magic_fmt``, ``pixel_integrity``): sniff the container magic, decode,
recompute the perceptual hash, compare against the declared ``fmt`` /
``phash`` columns — the engine analog of the reference's "observation
method must equal the expected constant" check
(MTBValidators.scala:366-371) and of the decoded-pixel PSNR≥40dB
invariant (BASELINE.json ``input_hint``).

`andThen` gating: shared row-local prerequisites (presence / value-set /
range) are re-evaluated vectorized on the same batch — microseconds
against the milliseconds of decoding — so children of a failed
precondition are never double-reported (MTBValidators.scala:243,252-254,
302-305).  The metadata pass emits those rules; this pass only emits
payload rules (``emit=rule_needs_bytes``) — no duplicates.

Scale notes (SURVEY.md §4):
* decode → check → drop inside one UDF; no pixel column is ever added
  to the dataset (wide-binary-row trap, SURVEY.md §7.3 #4).
* small ``batch_size`` (default 256) keeps decoded pixels × concurrency
  inside worker heaps; the payload column stays zero-copy Arrow until a
  row is actually decoded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions import codec
from ..rules.core import (
    KERNELS,
    RuleContext,
    RuleSet,
    evaluate_rules,
    rule_needs_bytes,
)
from ..schema import PARTITION_COL, VIOLATION_SCHEMA, violations_table

DECODE_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "phash", PARTITION_COL]

_LOOP_KINDS = ("magic_fmt", "pixel_integrity")


class DecodePass:
    def __init__(self, ruleset: RuleSet, broadcast: dict | None = None):
        self.ctx = RuleContext(ruleset, broadcast=broadcast)
        self.loop_rules = [r for r in ruleset.rules if r.kind in _LOOP_KINDS]

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec_violations, fired = evaluate_rules(
            batch, self.ctx, emit=lambda r: rule_needs_bytes(r) and r.kind in KERNELS
        )
        out = [vec_violations] if vec_violations.num_rows else []
        out.extend(self.run_loop_rules(batch, fired))
        if not out:
            return VIOLATION_SCHEMA.empty_table()
        return pa.concat_tables(out)

    def run_loop_rules(
        self, batch: pa.Table, fired: dict[str, np.ndarray]
    ) -> list[pa.Table]:
        """Per-image decode rules (magic sniff, phash/PSNR integrity),
        gated by the shared ``fired`` masks; returns violation tables."""
        n = len(batch)
        ids = batch.column("image_id").to_pylist()
        # one bulk copy of the payloads: on the designed hot path (valid
        # rows) BOTH loop rules touch every payload, so a single
        # to_pylist beats per-row Arrow scalar fetches (which would copy
        # each payload once per rule); only heavily-corrupted batches
        # (most rows gated out) would favor lazy access
        payloads = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        phashes = batch.column("phash").to_pylist()
        pids = (
            batch.column(PARTITION_COL).to_pylist()
            if PARTITION_COL in batch.column_names
            else [None] * n
        )

        out: list[pa.Table] = []
        for rule in self.loop_rules:
            gate = np.ones(n, dtype=bool)
            for dep in rule.requires:
                if dep in fired:
                    gate &= ~fired[dep]
            violated = np.zeros(n, dtype=bool)
            messages: list[str] = [""] * n
            decoded_px: list[tuple[int, np.ndarray]] = []
            for i in np.nonzero(gate)[0]:
                data, w, h, fmt = payloads[i], ws[i], hs[i], fmts[i]
                if data is None or fmt is None or w is None or h is None:
                    continue
                if rule.kind == "magic_fmt":
                    sniffed = codec.sniff_format(data, w, h)
                    if sniffed != fmt:
                        violated[i] = True
                        messages[i] = (
                            f"declared fmt={fmt!r} but payload sniffs as {sniffed!r}"
                        )
                elif rule.kind == "pixel_integrity":
                    try:
                        px = codec.decode(data, fmt, w, h)
                    except Exception as exc:  # undecodable ⇒ integrity violation
                        violated[i] = True
                        messages[i] = f"decode failed: {exc}"
                        continue
                    if px.shape != (h, w, 3):
                        violated[i] = True
                        messages[i] = (
                            f"decoded dims {px.shape[1]}x{px.shape[0]} != declared {w}x{h}"
                        )
                        continue
                    if phashes[i] is None:
                        continue  # phash presence is the metadata pass's business
                    decoded_px.append((i, px))
            if decoded_px:
                # phash recompute: batch-vectorized per dims group (the
                # hot dimension mode makes most rows stackable)
                tol = rule.params.get("hamming_tolerance_lossy", 8)
                by_dims: dict[tuple[int, int], list[tuple[int, np.ndarray]]] = {}
                for i, px in decoded_px:
                    by_dims.setdefault(px.shape[:2], []).append((i, px))
                for items in by_dims.values():
                    idx_arr = np.array([i for i, _ in items])
                    # always the batch kernel: since the r4 integer
                    # reduceat rewrite it beats the scalar path even at
                    # n=1, so the long-tail-dims fork is gone
                    recomputed = codec.phash_batch(
                        np.stack([px for _, px in items])
                    )
                    stored = np.array([phashes[i] for i in idx_arr], dtype=np.int64)
                    dists = codec.hamming64_batch(recomputed, stored)
                    budgets = np.array(
                        [tol if fmts[i] == "lossy" else 0 for i in idx_arr]
                    )
                    bad = dists > budgets
                    for j in np.nonzero(bad)[0]:
                        i = int(idx_arr[j])
                        violated[i] = True
                        messages[i] = (
                            f"phash hamming distance {int(dists[j])} exceeds "
                            f"budget {int(budgets[j])}"
                        )
            fired[rule.rule_id] = violated
            if violated.any():
                idx = np.nonzero(violated)[0]
                out.append(
                    violations_table(
                        [ids[i] for i in idx],
                        rule.rule_id,
                        rule.severity,
                        rule.path,
                        [messages[i] or rule.render_message() for i in idx],
                        pa.array([pids[i] for i in idx], pa.int32()),
                    )
                )
        return out


def run_decode_pass(
    ds: rd.Dataset,
    ruleset: RuleSet,
    *,
    batch_size: int = 256,
    concurrency: int | tuple[int, int] | None = None,
) -> rd.Dataset:
    if concurrency is None:
        import ray

        concurrency = max(2, (int(ray.cluster_resources().get("CPU", 8)) * 3) // 5)
    return ds.map_batches(
        DecodePass,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        fn_constructor_kwargs={"ruleset": ruleset},
        concurrency=concurrency,
    )

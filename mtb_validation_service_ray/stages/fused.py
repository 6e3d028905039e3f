"""Fused single-read validation pass.

The modular pipeline (pipelines/validate.py) reads the input once per
pass family — ideal when passes prune different columns at 100 TB, but
at moderate scale the repeated reads and per-pass actor pools dominate.
This fused pass reads the input ONCE with all columns and evaluates the
complete row-local rule set (metadata kernels + decode rules + broadcast
referential + broadcast orphan anti-join) in a single actor pool,
emitting

  * one violation row per issue (VIOLATION_SCHEMA), and
  * one **id-marker row** per input record (``rule_id = "__id__"``)

into one combined stream.  Downstream, uniqueness, verdict roll-up and
the partition report all derive from that combined stream — which is
tiny relative to the input (ids + issues, no payloads) — after a single
``materialize()``.

Scale trade-off (documented for the 100 TB case): materializing the id
stream costs ~40 bytes/row in the object store (spilling beyond RAM).
When the id stream itself is too large to spill comfortably, use the
modular pipeline, which re-reads the id column from storage instead —
the two share every kernel.
"""

from __future__ import annotations

from typing import Any, Iterable

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..rules.core import RuleContext, RuleSet, evaluate_rules
from ..schema import PARTITION_COL, VIOLATION_SCHEMA
from ..stages.decode_pass import DecodePass
from ..stages.referential import ORPHAN_RULE

ID_MARKER = "__id__"
# sorted-tail rule markers (stages/positional.py semantics, fused):
# per-batch partial heads + missing-both candidates ride the combined
# stream; the driver folds them after the single materialize()
TAIL_HEAD_MARKER = "__tail_head__"
TAIL_CAND_MARKER = "__tail_cand__"
MARKER_RULE_IDS = (ID_MARKER, TAIL_HEAD_MARKER, TAIL_CAND_MARKER)

ALL_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash", PARTITION_COL]


def _marker_rows(record_ids, rule_id: str, pids) -> pa.Table:
    n = len(record_ids)
    return pa.table(
        {
            "record_id": record_ids,
            "rule_id": pa.array([rule_id] * n, pa.string()),
            "severity": pa.array([""] * n, pa.string()),
            "path": pa.array([""] * n, pa.string()),
            "message": pa.array([""] * n, pa.string()),
            PARTITION_COL: pids,
        },
        schema=VIOLATION_SCHEMA,
    )


class FusedValidationPass(DecodePass):
    """One actor pool, every row-local rule.

    Reuses DecodePass's decode loop and gating; additionally evaluates
    (and emits) the metadata kernels — the batch carries every column —
    plus the broadcast orphan anti-join, and appends id-marker rows."""

    def __init__(
        self,
        ruleset: RuleSet,
        broadcast: dict[str, Any] | None = None,
        annotation_keys: Any | None = None,
        emit_id_rows: bool = True,
        emit_tail_rows: bool = False,
    ):
        resolved = {}
        for k, v in (broadcast or {}).items():
            resolved[k] = ray.get(v) if isinstance(v, ray.ObjectRef) else v
        # one RuleContext build (regex compile + value-set arrays happen
        # once per actor) — DecodePass accepts the broadcast directly
        super().__init__(ruleset, broadcast=resolved)
        if isinstance(annotation_keys, ray.ObjectRef):
            annotation_keys = ray.get(annotation_keys)
        if annotation_keys is not None and not isinstance(annotation_keys, pa.Array):
            annotation_keys = pa.array(sorted(annotation_keys), pa.string())
        self.annotation_keys = annotation_keys
        self.emit_id_rows = emit_id_rows
        self.emit_tail_rows = emit_tail_rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        # metadata kernels: evaluate + emit ALL vectorized rules (the
        # batch has every column); decode-loop rules ride on the shared
        # fired dict exactly as in DecodePass
        vec_violations, fired = evaluate_rules(batch, self.ctx)
        out = [vec_violations] if vec_violations.num_rows else []
        out.extend(self.run_loop_rules(batch, fired))

        pids = (
            batch.column(PARTITION_COL)
            if PARTITION_COL in batch.column_names
            else pa.nulls(n, pa.int32())
        )
        if self.annotation_keys is not None:
            ids = batch.column("image_id")
            missing = pc.and_(
                pc.invert(pc.is_in(ids, value_set=self.annotation_keys)),
                pc.is_valid(ids),
            )
            if pc.any(missing).as_py():
                bad = batch.filter(missing)
                bad_pids = (
                    bad.column(PARTITION_COL)
                    if PARTITION_COL in bad.column_names
                    else pa.nulls(bad.num_rows, pa.int32())
                )
                from ..schema import violations_table

                out.append(
                    violations_table(
                        bad.column("image_id"),
                        ORPHAN_RULE.rule_id, ORPHAN_RULE.severity, ORPHAN_RULE.path,
                        ORPHAN_RULE.render_message(), bad_pids,
                    )
                )
        if self.emit_tail_rows and {"caption", "phash", PARTITION_COL} <= set(
            batch.column_names
        ):
            heads = (
                batch.select([PARTITION_COL, "image_id"])
                .group_by(PARTITION_COL)
                .aggregate([("image_id", "min")])
            )
            out.append(
                _marker_rows(
                    heads.column("image_id_min").cast(pa.string()),
                    TAIL_HEAD_MARKER,
                    heads.column(PARTITION_COL).combine_chunks().cast(pa.int32()),
                )
            )
            missing_both = pc.and_(
                pc.is_null(batch.column("caption")), pc.is_null(batch.column("phash"))
            )
            if pc.any(missing_both).as_py():
                cand = batch.filter(missing_both)
                out.append(
                    _marker_rows(
                        cand.column("image_id").cast(pa.string()),
                        TAIL_CAND_MARKER,
                        cand.column(PARTITION_COL).cast(pa.int32()),
                    )
                )
        if self.emit_id_rows:
            out.append(
                _marker_rows(
                    batch.column("image_id").cast(pa.string()),
                    ID_MARKER,
                    pids.cast(pa.int32()),
                )
            )
        if not out:
            return VIOLATION_SCHEMA.empty_table()
        return pa.concat_tables(out)


def run_fused_pass(
    ds: rd.Dataset,
    ruleset: RuleSet,
    broadcast: dict[str, Any] | None = None,
    *,
    annotation_keys: Iterable[str] | pa.Array | None = None,
    batch_size: int = 1024,
    concurrency: int | tuple[int, int] | None = None,
    emit_id_rows: bool = True,
    emit_tail_rows: bool = False,
) -> rd.Dataset:
    refs = {
        k: (v if isinstance(v, ray.ObjectRef) else ray.put(v))
        for k, v in (broadcast or {}).items()
    }
    ann_ref = None
    if annotation_keys is not None:
        if not isinstance(annotation_keys, pa.Array):
            annotation_keys = pa.array(sorted(set(annotation_keys)), pa.string())
        ann_ref = ray.put(annotation_keys)
    if concurrency is None:
        # FIXED pool size: autoscaling (1, N) pools ramp up too slowly
        # for bounded jobs (measured 3x wall-time); ~5/8 of the CPUs
        # leaves headroom for the read tasks and the reduce stages
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(2, (cpus * 5) // 8)
    return ds.map_batches(
        FusedValidationPass,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        fn_constructor_kwargs={
            "ruleset": ruleset,
            "broadcast": refs,
            "annotation_keys": ann_ref,
            "emit_id_rows": emit_id_rows,
            "emit_tail_rows": emit_tail_rows,
        },
        concurrency=concurrency,
    )

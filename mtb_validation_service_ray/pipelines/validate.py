"""End-to-end validation pipeline (reference EP1, SURVEY.md §3).

``run_validation`` is the engine's ``Validate(DataUpload(record))``
analog at dataset scale: every rule family runs as a streaming Ray Data
pass, the union of their violation datasets is rolled up into
per-record verdicts and a per-partition pass/fail report, and fatal
issues mark records rejected (FatalIssuesDetected, Tests.scala:45-56).

Pass structure (each pass prunes its own columns at the read — the
``bytes`` column is only ever read by the decode pass):

  A. metadata row pass   map_batches actor pool, zero-copy Arrow
  B. decode pass         map_batches actor pool, small batches
  C. uniqueness          partial-agg → one hash groupby
  D. referential orphan  broadcast or tagged-union shuffle anti-join
  E. verdict roll-up     tagged-union hash aggregate

The streaming executor pipelines A-D concurrently with backpressure;
nothing materializes the full input.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterable

import pyarrow as pa
import ray.data as rd

from ..rules.core import RuleSet
from ..rules.registry import default_image_ruleset
from ..schema import PARTITION_COL
from ..sources import io as io_shim
from ..sources.fixtures import CAPTION_KEYS
from ..stages.decode_pass import DECODE_COLUMNS, run_decode_pass
from ..stages.row_pass import META_COLUMNS, run_row_pass
from ..stages.referential import orphan_violations
from ..stages.unique import duplicate_id_violations
from .verdicts import partition_report, verdicts


@dataclass
class ValidationResult:
    violations: rd.Dataset
    verdicts: rd.Dataset

    def partition_report(self) -> pa.Table:
        return partition_report(self.verdicts)


def _source(source: Any, columns: list[str]) -> rd.Dataset:
    """Column-pruned view of the input — a fresh ``read_parquet`` with
    ``columns=[...]`` per pass when given a URI (row groups for unused
    columns never leave storage), a ``select_columns`` otherwise."""
    if isinstance(source, (str, list)):
        return io_shim.read_table(source, columns=columns)
    if isinstance(source, pa.Table):
        avail = [c for c in columns if c in source.column_names]
        return rd.from_arrow(source.select(avail))
    return source.select_columns([c for c in columns if c in source.schema().names])


def run_validation(
    source: Any,
    *,
    ruleset: RuleSet | None = None,
    caption_refs: Iterable[str] | pa.Array | None = None,
    annotations: rd.Dataset | pa.Table | Iterable[str] | None = None,
    include_unique: bool = True,
    include_decode: bool = True,
    include_positional: bool = True,
    orphan_strategy: str = "broadcast",
    row_batch_size: int = 8192,
    decode_batch_size: int = 256,
    concurrency: int | tuple[int, int] | None = None,
    materialize: bool = False,
) -> ValidationResult:
    """Run the full rule set; returns lazy violation + verdict Datasets.

    ``source`` is a URI/path (preferred — enables per-pass column
    pruning), a pyarrow Table (tests) or a Dataset."""
    ruleset = ruleset if ruleset is not None else default_image_ruleset()
    broadcast = {
        "caption_refs": (
            caption_refs
            if caption_refs is not None
            else frozenset(CAPTION_KEYS)
        )
    }

    # budget the actor pools so their sum stays within the cluster: the
    # decode pass gets the lion's share (it does the per-image work),
    # the metadata pass a sliver, and the read/shuffle/reduce tasks keep
    # headroom — two pools each sized to #CPUs would oversubscribe and
    # serialize everything (measured 20x UDF slowdown).
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8))
    # fixed pools (autoscaling ramps too slowly for bounded jobs), with
    # the SUM capped below the cluster so read/shuffle tasks always have
    # a CPU — pools covering every core deadlock the pipeline
    row_conc = concurrency if concurrency is not None else max(1, cpus // 4)
    decode_conc = (
        concurrency
        if concurrency is not None
        else max(1, min((cpus * 3) // 5, cpus - max(1, cpus // 4) - 1))
    )

    passes: list[rd.Dataset] = []
    meta_ds = _source(source, META_COLUMNS)
    passes.append(
        run_row_pass(
            meta_ds, ruleset, broadcast,
            batch_size=row_batch_size, concurrency=row_conc,
        )
    )
    if include_decode:
        decode_ds = _source(source, DECODE_COLUMNS)
        passes.append(
            run_decode_pass(
                decode_ds, ruleset,
                batch_size=decode_batch_size, concurrency=decode_conc,
            )
        )
    if include_unique:
        id_ds = _source(source, ["image_id", PARTITION_COL])
        passes.append(duplicate_id_violations(id_ds))
    if include_positional:
        from ..stages.positional import TAIL_COLUMNS, tail_either_violations

        passes.append(tail_either_violations(_source(source, TAIL_COLUMNS)))
    if annotations is not None:
        ann = (
            rd.from_arrow(annotations)
            if isinstance(annotations, pa.Table)
            else annotations
        )
        id_ds = _source(source, ["image_id", PARTITION_COL])
        passes.append(
            orphan_violations(id_ds, ann, strategy=orphan_strategy)
        )

    violations = passes[0]
    for p in passes[1:]:
        violations = violations.union(p)

    ids = _source(source, ["image_id", PARTITION_COL])
    if materialize:
        # pin the (small) violations result so the verdict roll-up reuses
        # it instead of re-executing every pass
        violations = violations.materialize()
    return ValidationResult(violations=violations, verdicts=verdicts(ids, violations))


def run_validation_fused(
    source: Any,
    *,
    ruleset: RuleSet | None = None,
    caption_refs: Iterable[str] | pa.Array | None = None,
    annotations: rd.Dataset | pa.Table | Iterable[str] | None = None,
    include_unique: bool = True,
    include_positional: bool = True,
    batch_size: int = 512,
    concurrency: int | tuple[int, int] | None = None,
) -> ValidationResult:
    """Single-read variant: ONE actor pool evaluates every row-local
    rule and emits id-marker rows alongside violations; uniqueness and
    the verdict roll-up derive from that (small) combined stream after
    one ``materialize()``.  Fastest when (ids + issues) fit the object
    store / spill budget; at id-stream scales beyond that, use
    ``run_validation`` which re-reads the id column from storage
    (stages/fused.py docstring)."""
    import pyarrow.compute as _pc

    from ..stages.fused import ALL_COLUMNS as ALL_COLUMNS_FUSED
    from ..stages.fused import (
        ID_MARKER,
        MARKER_RULE_IDS,
        TAIL_CAND_MARKER,
        TAIL_HEAD_MARKER,
        run_fused_pass,
    )

    ruleset = ruleset if ruleset is not None else default_image_ruleset()
    broadcast = {
        "caption_refs": (
            caption_refs if caption_refs is not None else frozenset(CAPTION_KEYS)
        )
    }
    annotation_keys = None
    if annotations is not None:
        if isinstance(annotations, rd.Dataset):
            annotations = pa.concat_tables(
                annotations.select_columns(["image_id"]).iter_batches(
                    batch_format="pyarrow", batch_size=1 << 16
                )
            )
        if isinstance(annotations, pa.Table):
            annotation_keys = _pc.unique(
                annotations.column("image_id").combine_chunks()
                if isinstance(annotations.column("image_id"), pa.ChunkedArray)
                else annotations.column("image_id")
            )
        else:
            annotation_keys = pa.array(sorted(set(annotations)), pa.string())

    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8))
    if isinstance(source, (str, list)):
        # scale read parallelism with the cluster (a fixed-width read
        # becomes the non-scaling term between cluster sizes)
        input_ds = io_shim.read_table(
            source, columns=ALL_COLUMNS_FUSED, override_num_blocks=2 * cpus
        )
    else:
        input_ds = _source(source, ALL_COLUMNS_FUSED)
    combined = run_fused_pass(
        input_ds, ruleset, broadcast,
        annotation_keys=annotation_keys,
        batch_size=batch_size, concurrency=concurrency,
        emit_tail_rows=include_positional,
    ).materialize()

    def _only_ids(batch: pa.Table) -> pa.Table:
        sub = batch.filter(_pc.equal(batch.column("rule_id"), ID_MARKER))
        return pa.table(
            {
                "image_id": sub.column("record_id"),
                PARTITION_COL: sub.column(PARTITION_COL),
            }
        )

    def _only_violations(batch: pa.Table) -> pa.Table:
        return batch.filter(
            _pc.invert(
                _pc.is_in(
                    batch.column("rule_id"),
                    value_set=pa.array(MARKER_RULE_IDS, pa.string()),
                )
            )
        )

    id_rows = combined.map_batches(_only_ids, batch_format="pyarrow")
    row_violations = combined.map_batches(_only_violations, batch_format="pyarrow")
    if include_positional:
        # resolve the sorted-tail markers the fused pass emitted: fold
        # the per-batch partial heads, drop candidates that are their
        # partition's head (both streams are tiny — markers, not data)
        from ..schema import violations_table
        from ..stages import positional as pos

        def _tail_markers(batch: pa.Table) -> pa.Table:
            return batch.filter(
                _pc.is_in(
                    batch.column("rule_id"),
                    value_set=pa.array(
                        [TAIL_HEAD_MARKER, TAIL_CAND_MARKER], pa.string()
                    ),
                )
            )

        marker_tabs = [
            b
            for b in combined.map_batches(
                _tail_markers, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow", batch_size=1 << 16)
            if b.num_rows
        ]
        tail_v = None
        if marker_tabs:
            mt = pa.concat_tables(marker_tabs)
            hrows = mt.filter(_pc.equal(mt.column("rule_id"), TAIL_HEAD_MARKER))
            heads = pos.fold_heads(
                hrows.column(PARTITION_COL).to_pylist(),
                hrows.column("record_id").to_pylist(),
            )
            crows = mt.filter(_pc.equal(mt.column("rule_id"), TAIL_CAND_MARKER))
            keep = pos.non_head_mask(
                crows.column(PARTITION_COL).to_pylist(),
                crows.column("record_id").to_pylist(),
                heads,
            )
            crows = crows.filter(pa.array(keep, pa.bool_())) if crows.num_rows else crows
            if crows.num_rows:
                tail_v = violations_table(
                    crows.column("record_id"),
                    pos.RULE_ID, pos.SEVERITY, pos.PATH, pos.MESSAGE,
                    crows.column(PARTITION_COL),
                )
        if tail_v is not None:
            row_violations = row_violations.union(rd.from_arrow(tail_v))
    if include_unique:
        from .verdicts import verdicts_with_unique

        verdict_ds, uq_violations = verdicts_with_unique(id_rows, row_violations)
        return ValidationResult(
            violations=row_violations.union(uq_violations), verdicts=verdict_ds
        )
    return ValidationResult(
        violations=row_violations, verdicts=verdicts(id_rows, row_violations)
    )

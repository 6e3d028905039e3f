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
    orphan_strategy: str = "broadcast",
    row_batch_size: int = 8192,
    decode_batch_size: int = 256,
    concurrency: int | tuple[int, int] | None = None,
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

    passes: list[rd.Dataset] = []
    meta_ds = _source(source, META_COLUMNS)
    passes.append(
        run_row_pass(
            meta_ds, ruleset, broadcast,
            batch_size=row_batch_size, concurrency=concurrency,
        )
    )
    if include_decode:
        decode_ds = _source(source, DECODE_COLUMNS)
        passes.append(
            run_decode_pass(
                decode_ds, ruleset,
                batch_size=decode_batch_size, concurrency=concurrency,
            )
        )
    if include_unique:
        id_ds = _source(source, ["image_id", PARTITION_COL])
        passes.append(duplicate_id_violations(id_ds))
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
    return ValidationResult(violations=violations, verdicts=verdicts(ids, violations))

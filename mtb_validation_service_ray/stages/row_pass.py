"""Row-local metadata rule pass — the engine's core `map_batches` stage.

One actor pool evaluates every metadata-only rule (presence, value-set,
regex, range, equality, cross-field arithmetic, broadcast referential)
over zero-copy Arrow batches.  The actor holds the compiled rule context
— regexes, value-set arrays, broadcast reference-key sets — built once
per actor in ``__init__``, mirroring the reference's load-once-per-JVM
code-system catalogs (MTBValidators.scala:747-770; SURVEY.md EP2).

Scale notes:
* This pass reads ONLY the metadata columns (no ``bytes``) — column
  pruning at the read is the dominant 100 TB win (SURVEY.md §7.3 #4).
* Broadcast sets ship via ``ray.put`` once; actors ``ray.get`` in
  ``__init__`` — never re-shipped per batch.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import ray
import ray.data as rd

from ..rules.core import RuleContext, RuleSet, evaluate_row_rules
from ..schema import PARTITION_COL

META_COLUMNS = ["image_id", "w", "h", "fmt", "caption", "phash", PARTITION_COL]


class RowPass:
    """Callable-class UDF for ``map_batches`` (actor pool).

    ``broadcast`` values may be plain picklable sets or
    ``ray.ObjectRef``s (resolved here, once per actor)."""

    def __init__(self, ruleset: RuleSet, broadcast: dict[str, Any] | None = None):
        resolved = {}
        for k, v in (broadcast or {}).items():
            resolved[k] = ray.get(v) if isinstance(v, ray.ObjectRef) else v
        self.ctx = RuleContext(ruleset, broadcast=resolved)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return evaluate_row_rules(batch, self.ctx)


def run_row_pass(
    ds: rd.Dataset,
    ruleset: RuleSet,
    broadcast: dict[str, Any] | None = None,
    *,
    batch_size: int = 8192,
    concurrency: int | tuple[int, int] | None = None,
) -> rd.Dataset:
    """Metadata rule pass over a Dataset (columns already pruned by the
    caller via ``read_table(columns=META_COLUMNS)``)."""
    refs = {
        k: (v if isinstance(v, ray.ObjectRef) else ray.put(v))
        for k, v in (broadcast or {}).items()
    }
    if concurrency is None:
        # fixed pool sized to the cluster (autoscaling ramps too slowly
        # for bounded jobs); callers doing multi-pass pipelines pass an
        # explicit budget
        cpus = int(ray.cluster_resources().get("CPU", 8))
        # never cover every CPU: a pool summing to the cluster starves
        # the read tasks and deadlocks the pipeline
        concurrency = max(1, min(cpus // 2, cpus - 1))
    return ds.map_batches(
        RowPass,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        fn_constructor_kwargs={"ruleset": ruleset, "broadcast": refs},
        concurrency=concurrency,
    )

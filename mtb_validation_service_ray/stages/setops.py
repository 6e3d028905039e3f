"""Distinct set operations over full row tuples: UNION / INTERSECT / EXCEPT.

SQL's bag-to-set operators, distributed with the engine's standard
high-cardinality reduce: tag each side, pre-dedupe rows per batch
(partial), then ONE int-bucketed exchange keyed by the row tuple; a
row survives by which sides it appeared on.  Nothing ever gathers on
the driver and per-bucket Python cost scales with #buckets, never
#distinct rows (stages/groupagg.py rationale).

Null columns group as values (SQL set ops use IS NOT DISTINCT FROM
semantics — (1, NULL) INTERSECT (1, NULL) yields the row), which
``bucketed_group_agg``'s ``dropna=False`` grouping matches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def set_op(
    a: rd.Dataset,
    b: rd.Dataset,
    op: str,
    *,
    columns: list[str] | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """``a UNION b`` / ``a INTERSECT b`` / ``a EXCEPT b`` (distinct) over ``columns``
    (default: ``a``'s full schema; ``b`` must carry the same names and
    castable types).  Output: the distinct surviving rows."""
    if op not in ("union", "intersect", "except"):
        raise ValueError(
            f"op must be 'union', 'intersect' or 'except', got {op!r}"
        )
    from .groupagg import bucketed_group_agg

    schema = a.schema()
    schema = getattr(schema, "base_schema", schema)
    cols = columns or list(schema.names)
    types = {c: schema.field(c).type for c in cols}

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = pa.table({c: batch.column(c).cast(types[c]) for c in cols})
            # partial dedupe before the exchange
            t = t.group_by(cols, use_threads=False).aggregate([])
            return t.append_column(
                "_side",
                pa.array(np.full(t.num_rows, side, dtype=np.int8)),
            )
        return fn

    tagged = a.map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(b.map_batches(
        tag(1), batch_format="pyarrow", zero_copy_batch=True
    ))
    agg = bucketed_group_agg(
        tagged, cols,
        [("_min_side", "_side", "min"), ("_max_side", "_side", "max")],
        num_buckets=num_buckets, partial=False,
    )

    def survive(batch: pa.Table) -> pa.Table:
        lo = batch.column("_min_side")
        hi = batch.column("_max_side")
        if op == "union":  # distinct rows from either side
            keep = pc.less_equal(lo, hi)  # every group survives
        elif op == "intersect":
            keep = pc.and_(pc.equal(lo, 0), pc.equal(hi, 1))
        else:  # except: on side a only
            keep = pc.and_(pc.equal(lo, 0), pc.equal(hi, 0))
        return batch.filter(keep).select(cols)

    return agg.map_batches(
        survive, batch_format="pyarrow", zero_copy_batch=True
    )

"""Order-dependent (sorted-tail) positional rule.

Reference analog: care plans are sorted by ``issuedOn``, the FIRST one
is exempt, and every *tail* element must carry recommendations or an
explicit no-target reason (MTBValidators.scala:710-717).  Image-table
re-expression (R-TAIL-EITHER): within each partition, rows ordered by
``image_id``; the head row (minimum id) is exempt, every tail row must
have ``caption`` OR ``phash`` present.

Scale design — "skip the first element of the sort order" needs no
actual sort: the head of each partition is its *minimum* order key, so
one tiny ``groupby(partition).min(order_col)`` (one row per partition)
is broadcast into a fully vectorized ``map_batches`` stream.  No
per-group Python, no global sort, no shuffle of the data rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Min

from ..schema import PARTITION_COL, VIOLATION_SCHEMA, violations_table

RULE_ID = "R-TAIL-EITHER"
SEVERITY = "error"
PATH = "/record/tail"
MESSAGE = "tail row (non-head of its partition) has neither caption nor phash"

TAIL_COLUMNS = ["image_id", "caption", "phash", PARTITION_COL]


def partition_heads(ds: rd.Dataset, *, order_col: str = "image_id") -> dict[int, str]:
    """min(order_col) per partition — one row per partition, collected
    driver-side (tiny: #partitions entries) for broadcast."""
    agg = ds.groupby(PARTITION_COL).aggregate(Min(order_col, alias_name="_head"))
    heads: dict[int, str] = {}
    for batch in agg.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        for pid, head in zip(
            batch.column(PARTITION_COL).to_pylist(), batch.column("_head").to_pylist()
        ):
            if pid is not None:
                heads[int(pid)] = head
    return heads


def tail_either_violations(
    ds: rd.Dataset, *, order_col: str = "image_id"
) -> rd.Dataset:
    """The R-TAIL-EITHER pass: broadcast the per-partition head ids and
    stream a vectorized mask over (caption, phash) nullity."""
    heads_ref = ray.put(partition_heads(ds, order_col=order_col))

    def check(batch: pa.Table) -> pa.Table:
        heads = ray.get(heads_ref)
        missing_both = pc.and_(
            pc.is_null(batch.column("caption")), pc.is_null(batch.column("phash"))
        ).to_numpy(zero_copy_only=False).astype(bool)
        if not missing_both.any():
            return VIOLATION_SCHEMA.empty_table()
        ids = batch.column(order_col).to_numpy(zero_copy_only=False)
        pids = batch.column(PARTITION_COL).to_numpy(zero_copy_only=False)
        head_arr = np.array(
            [heads.get(int(p)) if p is not None and not (isinstance(p, float) and np.isnan(p)) else None
             for p in pids],
            dtype=object,
        )
        is_head = ids == head_arr
        violated = missing_both & ~is_head
        if not violated.any():
            return VIOLATION_SCHEMA.empty_table()
        idx = pa.array(np.nonzero(violated)[0])
        return violations_table(
            batch.column(order_col).take(idx),
            RULE_ID, SEVERITY, PATH, MESSAGE,
            batch.column(PARTITION_COL).take(idx).cast(pa.int32()),
        )

    return ds.map_batches(check, batch_format="pyarrow", zero_copy_batch=True)

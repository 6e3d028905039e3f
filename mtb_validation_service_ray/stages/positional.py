"""Order-dependent (sorted-tail) positional rule.

Reference analog: care plans are sorted by ``issuedOn``, the FIRST one
is exempt, and every *tail* element must carry recommendations or an
explicit no-target reason (MTBValidators.scala:710-717).  Image-table
re-expression (R-TAIL-EITHER): within each partition, rows ordered by
``image_id``; the head row (minimum id) is exempt, every tail row must
have ``caption`` OR ``phash`` present.

Scale design — "skip the first element of the sort order" needs no
actual sort OR shuffle: ONE streaming ``map_batches`` pass emits, per
batch, (a) the per-partition minimum order key (≤ #partitions tiny
rows) and (b) the rows missing both fields (violation candidates —
rare by assumption, like every violation stream).  The driver folds the
partial minima into the global heads and drops the candidates that turn
out to be their partition's head.  Cost ≈ one pruned 4-column read; no
groupby exchange, no second pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..schema import PARTITION_COL, violations_table

RULE_ID = "R-TAIL-EITHER"
SEVERITY = "error"
PATH = "/record/tail"
MESSAGE = "tail row (non-head of its partition) has neither caption nor phash"

TAIL_COLUMNS = ["image_id", "caption", "phash", PARTITION_COL]


def fold_heads(pids, oids) -> dict[int, str]:
    """Fold per-batch partial heads into the global per-partition
    minimum order key (null-safe: null pids/oids are skipped).  Shared
    by the standalone pass below and the fused marker-row resolution
    (pipelines/validate.py)."""
    heads: dict[int, str] = {}
    for pid, oid in zip(pids, oids):
        if pid is None or oid is None:
            continue
        if pid not in heads or oid < heads[pid]:
            heads[pid] = oid
    return heads


def non_head_mask(pids, oids, heads: dict[int, str]) -> list[bool]:
    """True for candidates that are NOT their partition's head (rows
    with a null pid have no head and count as tail)."""
    return [
        pid is None or heads.get(pid) != oid for pid, oid in zip(pids, oids)
    ]


def tail_either_violations(
    ds: rd.Dataset, *, order_col: str = "image_id"
) -> rd.Dataset:
    """The R-TAIL-EITHER pass (eager: the head set must be complete
    before candidates can be judged — mirrors the adaptive driver
    reduce's small-result assumption: candidates are a violation
    stream, not the data)."""

    def scan(batch: pa.Table) -> pa.Table:
        heads = (
            batch.select([PARTITION_COL, order_col])
            .group_by(PARTITION_COL)
            .aggregate([(order_col, "min")])
        )
        missing = pc.and_(
            pc.is_null(batch.column("caption")), pc.is_null(batch.column("phash"))
        )
        cand = batch.filter(missing)
        return pa.table(
            {
                "pid": pa.concat_arrays(
                    [
                        heads.column(PARTITION_COL).combine_chunks().cast(pa.int32()),
                        cand.column(PARTITION_COL).combine_chunks().cast(pa.int32()),
                    ]
                ),
                "oid": pa.concat_arrays(
                    [
                        heads.column(f"{order_col}_min").combine_chunks(),
                        cand.column(order_col).combine_chunks(),
                    ]
                ),
                "is_head": pa.array(
                    [1] * heads.num_rows + [0] * cand.num_rows, pa.int8()
                ),
            }
        )

    parts = [
        b
        for b in ds.map_batches(scan, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=1 << 16
        )
        if b.num_rows
    ]
    if not parts:
        from ..schema import VIOLATION_SCHEMA

        return rd.from_arrow(VIOLATION_SCHEMA.empty_table())
    t = pa.concat_tables(parts)
    head_rows = t.filter(pc.equal(t.column("is_head"), 1))
    heads = fold_heads(
        head_rows.column("pid").to_pylist(), head_rows.column("oid").to_pylist()
    )
    cand = t.filter(pc.equal(t.column("is_head"), 0))
    keep = np.array(
        non_head_mask(
            cand.column("pid").to_pylist(), cand.column("oid").to_pylist(), heads
        ),
        dtype=bool,
    ) if cand.num_rows else np.array([], dtype=bool)
    idx = pa.array(np.nonzero(keep)[0])
    from ..schema import VIOLATION_SCHEMA

    if len(idx) == 0:
        return rd.from_arrow(VIOLATION_SCHEMA.empty_table())
    return rd.from_arrow(
        violations_table(
            cand.column("oid").take(idx),
            RULE_ID, SEVERITY, PATH, MESSAGE,
            cand.column("pid").take(idx),
        )
    )

"""Dataset-level cardinality guards.

The reference checks collection counts inside one record: 8
"collection non-empty" warnings and the cross-collection inequality
``#performanceStatus ≥ #followUps`` (MTBValidators.scala:699-710,
718-733).  At dataset scale these become partition-level count guards:

* ``partition_cardinality_violations`` — R-CARD-PART: every expected
  partition must hold at least ``min_rows`` rows (an empty or thin
  partition usually means an upstream shard was lost);
* ``count_ratio_violations`` — R-CARD-RATIO: per partition, the
  companion collection must be at least as large as the primary
  (the #performanceStatus ≥ #followUps analog).

Both reduce each input to one tiny (partition, count) aggregate —
vectorized per-batch partial counts, driver fold of ≤ #partitions rows
— and emit partition-level violation rows
(``record_id = "partition=<pid>"``), the same convention as the
R-DRIFT family.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ..schema import PARTITION_COL, VIOLATION_SCHEMA, violations_table

PART_RULE_ID = "R-CARD-PART"
PART_SEVERITY = "warning"
PART_PATH = "/partition"

RATIO_RULE_ID = "R-CARD-RATIO"
RATIO_SEVERITY = "warning"
RATIO_PATH = "/partition/companion"


def _partition_counts(ds: rd.Dataset) -> dict[int, int]:
    """Tiny (partition, count) fold: per-batch vectorized group_by, the
    ≤ #partitions result folded on the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        return (
            batch.select([PARTITION_COL])
            .group_by([PARTITION_COL])
            .aggregate([([], "count_all")])
        )

    counts: dict[int, int] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=1 << 16
    ):
        for pid, n in zip(
            b.column(PARTITION_COL).to_pylist(), b.column("count_all").to_pylist()
        ):
            if pid is not None:
                counts[int(pid)] = counts.get(int(pid), 0) + int(n)
    return counts


def partition_cardinality_violations(
    ds: rd.Dataset,
    *,
    expected_partitions: list[int] | range,
    min_rows: int = 1,
) -> rd.Dataset:
    """R-CARD-PART: expected partitions below ``min_rows`` (including
    entirely absent ones) each yield a partition-level warning."""
    counts = _partition_counts(ds)
    bad = [
        (pid, counts.get(pid, 0))
        for pid in expected_partitions
        if counts.get(pid, 0) < min_rows
    ]
    if not bad:
        return rd.from_arrow(VIOLATION_SCHEMA.empty_table())
    return rd.from_arrow(
        violations_table(
            [f"partition={pid}" for pid, _ in bad],
            PART_RULE_ID, PART_SEVERITY, PART_PATH,
            [f"partition holds {n} rows (< {min_rows})" for _, n in bad],
            pa.array([pid for pid, _ in bad], pa.int32()),
        )
    )


def count_ratio_violations(
    primary: rd.Dataset,
    companion: rd.Dataset,
    *,
    rule_id: str = RATIO_RULE_ID,
) -> rd.Dataset:
    """R-CARD-RATIO: per partition, ``count(companion) >= count(primary)``
    must hold (MTBValidators.scala:718-722 analog)."""
    p_counts = _partition_counts(primary)
    c_counts = _partition_counts(companion)
    bad = [
        (pid, n, c_counts.get(pid, 0))
        for pid, n in sorted(p_counts.items())
        if c_counts.get(pid, 0) < n
    ]
    if not bad:
        return rd.from_arrow(VIOLATION_SCHEMA.empty_table())
    return rd.from_arrow(
        violations_table(
            [f"partition={pid}" for pid, _, _ in bad],
            rule_id, RATIO_SEVERITY, RATIO_PATH,
            [
                f"companion has {c} rows for {n} primary rows"
                for _, n, c in bad
            ],
            pa.array([pid for pid, _, _ in bad], pa.int32()),
        )
    )

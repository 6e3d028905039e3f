"""Uniqueness check — the dataset-level promotion of the reference's
"exactly one Main diagnosis" cardinality constraint
(MTBValidators.scala:696-698) to a 10^12-row identifier-uniqueness scan
(north rule R-UQ-ID).

Physical plan (SURVEY.md §4 "Uniqueness"):
  1. **partial aggregation inside map_batches** — count occurrences per
     (image_id, partition_id) within each batch with a vectorized
     pyarrow ``group_by`` (no Python per row), shrinking the shuffle
     payload to one small triple per distinct key per block;
  2. **one hash-shuffle groupby** on ``image_id`` over the triples with
     vectorized aggregates only (Sum/Min/Max — never per-group Python:
     at 10^12 rows one ``map_groups`` call per id would be the
     bottleneck);
  3. rows with total count > 1 become violations.

Skew: identifiers are unique-by-construction, so the groupby key has no
hot groups; the pre-aggregation additionally collapses any adversarial
duplicate floods to one triple per block before the exchange.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..schema import PARTITION_COL, VIOLATION_SCHEMA, violations_table

RULE_ID = "R-UQ-ID"
SEVERITY = "error"
PATH = "/record/image_id"


def _batch_counts(batch: pa.Table, id_col: str) -> pa.Table:
    cols = [id_col] + ([PARTITION_COL] if PARTITION_COL in batch.column_names else [])
    grouped = batch.select(cols).group_by(cols).aggregate([([], "count_all")])
    out = {
        id_col: grouped.column(id_col),
        "cnt": grouped.column("count_all").cast(pa.int64()),
        PARTITION_COL: (
            grouped.column(PARTITION_COL).cast(pa.int32())
            if PARTITION_COL in batch.column_names
            else pa.nulls(grouped.num_rows, pa.int32())
        ),
    }
    return pa.table(out)


def _to_violations(batch: pa.Table, id_col: str) -> pa.Table:
    dup = batch.filter(pc.greater(batch.column("n"), 1))
    if dup.num_rows == 0:
        return VIOLATION_SCHEMA.empty_table()
    lo = dup.column("pid_min").to_pylist()
    hi = dup.column("pid_max").to_pylist()
    ns = dup.column("n").to_pylist()
    messages = [
        f"image_id occurs {n} times"
        + ("" if a == b else f" across partitions [{a}..{b}]")
        for n, a, b in zip(ns, lo, hi)
    ]
    # attribute the violation to a partition only when unambiguous
    pids = pa.array([a if a == b else None for a, b in zip(lo, hi)], pa.int32())
    return violations_table(dup.column(id_col), RULE_ID, SEVERITY, PATH, messages, pids)


def _shuffle_partitions() -> int:
    """Shuffle width for the pre-aggregated (small) exchange.  Ray's
    sort-based aggregate creates an all-to-all of input-blocks ×
    output-partitions objects — coalescing the tiny partial-count blocks
    first keeps that quadratic term bounded.  Scale with the cluster,
    not with the input block count."""
    import ray

    return max(8, int(ray.cluster_resources().get("CPU", 8)))


def duplicate_id_violations(
    ds: rd.Dataset, *, id_col: str = "image_id", strategy: str = "groupby"
) -> rd.Dataset:
    """Violations for every identifier that occurs more than once.

    strategy="groupby" (default, lazy): pre-aggregated triples through
    the bucketed reduce (stages/groupagg.py) — composes into lazy
    validation pipelines.  Identifiers are near-UNIQUE keys, the exact
    regime where Ray's native sort aggregate pays a per-output-group
    Python cost (measured ~25 s for 2M int-key groups — ROADMAP r4);
    the bucketed reduce's per-bucket pandas groupby scales with
    #buckets instead.
    strategy="hash_actors" (eager): the custom bucket-actor hash reduce
    (stages/hashreduce.py) — no sort-based Aggregate floor at all, but
    consumes the input at call time, so use it for standalone scans,
    not inside lazily-composed pipelines."""
    triples = ds.map_batches(
        _batch_counts,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"id_col": id_col},
    )
    if strategy == "hash_actors":
        from .hashreduce import hash_reduce

        def widen(batch: pa.Table) -> pa.Table:
            # distinct columns per aggregate so re-folding stays
            # idempotent (min-of-mins / max-of-maxes)
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "cnt": batch.column("cnt"),
                    "pid_min": batch.column(PARTITION_COL),
                    "pid_max": batch.column(PARTITION_COL),
                }
            )

        agg = hash_reduce(
            triples.map_batches(widen, batch_format="pyarrow"), id_col,
            [("cnt", "sum"), ("pid_min", "min"), ("pid_max", "max")],
        ).map_batches(
            lambda b: pa.table(
                {
                    id_col: b.column(id_col),
                    "n": b.column("cnt"),
                    "pid_min": b.column("pid_min"),
                    "pid_max": b.column("pid_max"),
                }
            ),
            batch_format="pyarrow",
        )
    else:
        from .groupagg import bucketed_group_agg, pin_column_types

        agg = bucketed_group_agg(
            triples,
            [id_col],
            [
                ("n", "cnt", "sum"),
                ("pid_min", PARTITION_COL, "min"),
                ("pid_max", PARTITION_COL, "max"),
                ("n_blocks", "cnt", "count"),
            ],
            # triples are already one row per (id, partition) per batch
            partial=False,
        ).map_batches(
            # an all-null partition column degrades to float64 NaN in
            # the per-bucket pandas reduce; pin back so _to_violations'
            # a == b null compare (None == None) stays true
            lambda t: pin_column_types(
                t,
                {
                    "n": pa.int64(),
                    "pid_min": pa.int32(),
                    "pid_max": pa.int32(),
                    "n_blocks": pa.int64(),
                },
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return agg.map_batches(
        _to_violations, batch_format="pyarrow", fn_kwargs={"id_col": id_col}
    )


def duplicate_id_violations_sortscan(
    ds: rd.Dataset, *, id_col: str = "image_id", num_buckets: int | None = None
) -> rd.Dataset:
    """Hash-repartition + **sorted-run duplicate scan** — the north
    rule's literal plan (BASELINE.json ``north_star``): co-locate each
    id by hash bucket, sort the bucket, and scan adjacent runs with a
    vectorized shift-compare.  Equivalent output to
    ``duplicate_id_violations`` (asserted in tests); the count-based
    aggregate is the default because it ships pre-aggregated triples,
    but the sorted-run scan wins when per-id payloads must stay attached
    (e.g. keep-first dedup emitting surviving rows)."""
    import numpy as np
    import pandas as pd

    from ..functions.sketches import hash64

    buckets = num_buckets if num_buckets is not None else _shuffle_partitions()

    def add_bucket(batch: pa.Table) -> pa.Table:
        cols = [id_col] + (
            [PARTITION_COL] if PARTITION_COL in batch.column_names else []
        )
        t = batch.select(cols)
        h = hash64(t.column(id_col).to_numpy(zero_copy_only=False))
        return t.append_column(
            "_bucket", pa.array((h % np.uint64(buckets)).astype(np.int32))
        )

    def sorted_run_scan(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col, kind="stable").reset_index(drop=True)
        ids = g[id_col].to_numpy()
        run_start = np.ones(len(g), dtype=bool)
        run_start[1:] = ids[1:] != ids[:-1]
        run_id = np.cumsum(run_start) - 1
        sizes = np.bincount(run_id)
        dup_runs = np.nonzero(sizes > 1)[0]
        if len(dup_runs) == 0:
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in (
                    ("record_id", "string"), ("rule_id", "string"),
                    ("severity", "string"), ("path", "string"),
                    ("message", "string"), (PARTITION_COL, "Int32"),
                )}
            )
        first_idx = np.nonzero(run_start)[0]
        rows = []
        pid_col = g[PARTITION_COL] if PARTITION_COL in g.columns else None
        for r in dup_runs:
            lo = first_idx[r]
            n = int(sizes[r])
            pids = (
                pid_col.iloc[lo : lo + n].dropna().unique() if pid_col is not None else []
            )
            rows.append(
                {
                    "record_id": str(ids[lo]),
                    "rule_id": RULE_ID,
                    "severity": SEVERITY,
                    "path": PATH,
                    "message": f"image_id occurs {n} times"
                    + ("" if len(pids) <= 1 else
                       f" across partitions [{int(min(pids))}..{int(max(pids))}]"),
                    PARTITION_COL: int(pids[0]) if len(pids) == 1 else None,
                }
            )
        out = pd.DataFrame(rows)
        out[PARTITION_COL] = out[PARTITION_COL].astype("Int32")
        return out

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(sorted_run_scan, batch_format="pandas")
    )
    return out.map_batches(
        lambda t: t.cast(VIOLATION_SCHEMA) if t.num_rows else VIOLATION_SCHEMA.empty_table(),
        batch_format="pyarrow",
    )

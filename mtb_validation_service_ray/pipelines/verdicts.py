"""Verdict roll-up — per-record max severity + per-partition report.

Mirrors the reference's outcome partitioning: a validation report's
worst severity decides the outcome, and fatal issues reject the record
(`FatalIssuesDetected`, Tests.scala:45-56; SURVEY.md §2.2 #33).

Physical plan: one tagged-union bucketed reduce.  Every record id
(with its partition) enters as a rank −1 row; every violation enters
with its severity rank; a key-hash bucketed max/sum/max fold
(stages/groupagg.py — record_id is near-unique, so the native sort
aggregate's per-output-group cost would dominate; measured 1.7 s for
2M records vs the ~29 s native-plan class) yields verdicts for BOTH
clean and violating records in a single exchange.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .. import SEVERITY_RANK
from ..schema import PARTITION_COL, VERDICT_SCHEMA

RANK_TO_VERDICT = {-1: "pass", 0: "info", 1: "warning", 2: "error", 3: "fatal"}
FATAL_RANK = SEVERITY_RANK["fatal"]

_SEV_RANK_ARR = pa.array(["info", "warning", "error", "fatal"], pa.string())

# null record ids must survive the shuffle as ONE group, but Ray's
# sort-based groupby cannot order None against strings — encode through
# the exchange, decode at finalize (the driver fast path groups nulls
# natively via factorize(use_na_sentinel=False))
NULL_ID_SENTINEL = "\x00__null_record_id__"


def _encode_null_ids(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    return pc.fill_null(col, NULL_ID_SENTINEL)


def _decode_null_ids(col):
    return pc.if_else(
        pc.equal(col, NULL_ID_SENTINEL), pa.scalar(None, pa.string()), col
    )


def _id_rows(batch: pa.Table) -> pa.Table:
    n = len(batch)
    return pa.table(
        {
            "record_id": _encode_null_ids(
                batch.column("image_id").cast(pa.string())
            ),
            "rank": pa.array([-1] * n, pa.int8()),
            "cnt": pa.array([0] * n, pa.int64()),
            PARTITION_COL: (
                batch.column(PARTITION_COL).cast(pa.int32())
                if PARTITION_COL in batch.column_names
                else pa.nulls(n, pa.int32())
            ),
        }
    )


def _violation_rows(batch: pa.Table) -> pa.Table:
    n = len(batch)
    rank = pc.index_in(batch.column("severity"), value_set=_SEV_RANK_ARR).cast(pa.int8())
    return pa.table(
        {
            "record_id": _encode_null_ids(
                batch.column("record_id").cast(pa.string())
            ),
            "rank": rank,
            "cnt": pa.array([1] * n, pa.int64()),
            PARTITION_COL: batch.column(PARTITION_COL).cast(pa.int32()),
        }
    )


def _finalize(batch: pa.Table) -> pa.Table:
    rank = pc.fill_null(batch.column("max_rank"), -1)
    verdict = pc.case_when(
        pc.make_struct(
            pc.equal(rank, -1), pc.equal(rank, 0), pc.equal(rank, 1), pc.equal(rank, 2)
        ),
        "pass", "info", "warning", "error", "fatal",
    )
    return pa.table(
        {
            "record_id": _decode_null_ids(batch.column("record_id")),
            "verdict": verdict,
            "n_issues": batch.column("n_issues").cast(pa.int64()),
            "accepted": pc.less(rank, FATAL_RANK),
            PARTITION_COL: batch.column("pid").cast(pa.int32()),
        },
        schema=VERDICT_SCHEMA,
    )


def verdicts(ids: rd.Dataset, violations: rd.Dataset) -> rd.Dataset:
    """Per-record verdicts over the union of all record ids and all
    violation rows (``ids`` needs image_id + partition_id).

    One coarse bucketed exchange: tagged rows are hashed into ≈#CPU
    buckets and each bucket reduces with a vectorized pandas groupby —
    far cheaper than a generic per-key aggregate at this shape."""
    from ..stages.groupagg import bucketed_group_agg, pin_column_types

    tagged = ids.map_batches(_id_rows, batch_format="pyarrow").union(
        violations.map_batches(_violation_rows, batch_format="pyarrow")
    )
    # bucketed reduce, not the native sort aggregate: record_id is a
    # near-unique key, where the native aggregate pays a per-output-
    # group Python cost (stages/groupagg.py scale finding, r4)
    agg = bucketed_group_agg(
        tagged,
        ["record_id"],
        [
            ("max_rank", "rank", "max"),
            ("n_issues", "cnt", "sum"),
            ("pid", PARTITION_COL, "max"),
        ],
        partial=False,
    ).map_batches(
        lambda t: pin_column_types(
            t,
            {"max_rank": pa.int8(), "n_issues": pa.int64(),
             "pid": pa.int32()},
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return agg.map_batches(_finalize, batch_format="pyarrow")


# above this row count the verdict reduce stays distributed; below it a
# single vectorized numpy pass on the driver is ~30x faster than the
# generic aggregate (measured 0.08 s vs 2.5 s at 120k records)
DRIVER_REDUCE_MAX_ROWS = 5_000_000


def _driver_reduce(
    ids: rd.Dataset, violations: rd.Dataset, limit: int | None
) -> tuple[rd.Dataset, rd.Dataset] | None:
    """Small-side fast path: stream both inputs to the driver (bounded
    by ``limit``), reduce with one vectorized numpy pass.  Returns None
    when the stream exceeds the limit — caller falls back to the
    distributed aggregate."""
    import numpy as np
    import pandas as pd

    from ..stages.unique import PATH as UQ_PATH
    from ..stages.unique import RULE_ID as UQ_RULE_ID
    from ..stages.unique import SEVERITY as UQ_SEVERITY

    rid_chunks, rank_chunks, isid_chunks, pid_chunks = [], [], [], []
    total = 0

    def _pull(ds: rd.Dataset, is_ids: bool) -> bool:
        nonlocal total
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=1 << 18):
            n = len(b)
            total += n
            if limit is not None and total > limit:
                return False
            if is_ids:
                rid_chunks.append(
                    b.column("image_id").to_numpy(zero_copy_only=False)
                )
                rank_chunks.append(np.full(n, -1, dtype=np.int8))
                isid_chunks.append(np.ones(n, dtype=bool))
            else:
                rid_chunks.append(
                    b.column("record_id").to_numpy(zero_copy_only=False)
                )
                sev = b.column("severity").to_numpy(zero_copy_only=False)
                rank = np.full(n, -1, dtype=np.int8)
                for s, r in SEVERITY_RANK.items():
                    rank[sev == s] = r
                rank_chunks.append(rank)
                isid_chunks.append(np.zeros(n, dtype=bool))
            if PARTITION_COL in b.column_names:
                pid = b.column(PARTITION_COL).to_numpy(zero_copy_only=False)
                pid_chunks.append(
                    np.where(pd.isna(pid), -1, pid).astype(np.int64)
                )
            else:  # partition-less inputs are valid (distributed path parity)
                pid_chunks.append(np.full(n, -1, dtype=np.int64))
        return True

    if not _pull(ids, True) or not _pull(violations, False):
        return None

    if total == 0:
        empty_v = rd.from_arrow(VERDICT_SCHEMA.empty_table())
        from ..schema import VIOLATION_SCHEMA

        return empty_v, rd.from_arrow(VIOLATION_SCHEMA.empty_table())

    rid = np.concatenate(rid_chunks)
    rank = np.concatenate(rank_chunks)
    is_id = np.concatenate(isid_chunks)
    pid = np.concatenate(pid_chunks)
    # use_na_sentinel=False: a NULL record id must be its own group
    # (sentinel -1 would alias np.add.at/maximum.at onto the LAST real
    # record, corrupting its verdict) — matches the distributed
    # groupby, which also groups nulls together
    codes, uniq = pd.factorize(rid, sort=False, use_na_sentinel=False)
    n = len(uniq)
    max_rank = np.full(n, -1, dtype=np.int8)
    np.maximum.at(max_rank, codes, rank)
    n_occ = np.zeros(n, dtype=np.int64)
    np.add.at(n_occ, codes, is_id.astype(np.int64))
    n_iss = np.zeros(n, dtype=np.int64)
    np.add.at(n_iss, codes, (~is_id).astype(np.int64))
    pmax = np.full(n, -1, dtype=np.int64)
    np.maximum.at(pmax, codes, pid)

    # single source of truth with the distributed path: the uniqueness
    # escalation rank comes from the rule's declared severity
    uq_rank = SEVERITY_RANK[UQ_SEVERITY]
    dup = n_occ > 1
    final_rank = np.maximum(max_rank, np.where(dup, uq_rank, -1).astype(np.int8))
    n_iss = n_iss + dup.astype(np.int64)
    verdict_names = np.array(
        [RANK_TO_VERDICT[r] for r in range(-1, 4)], dtype=object
    )
    pid_arr = pd.array(np.where(pmax < 0, pd.NA, pmax), dtype="Int32")
    # factorize's uniques may contain NaN/None for the null-id group
    uniq_list = [
        None if u is None or (isinstance(u, float) and np.isnan(u)) else u
        for u in uniq
    ]
    verdict_tbl = pa.table(
        {
            "record_id": pa.array(uniq_list, pa.string()),
            "verdict": pa.array(verdict_names[final_rank + 1], pa.string()),
            "n_issues": pa.array(n_iss, pa.int64()),
            "accepted": pa.array(final_rank < FATAL_RANK),
            PARTITION_COL: pa.array(pid_arr, pa.int32()),
        },
        schema=VERDICT_SCHEMA,
    )
    from ..schema import VIOLATION_SCHEMA, violations_table

    if dup.any():
        d_idx = np.nonzero(dup)[0]
        uq_tbl = violations_table(
            pa.array([uniq_list[i] for i in d_idx], pa.string()),
            UQ_RULE_ID, UQ_SEVERITY, UQ_PATH,
            [f"image_id occurs {int(k)} times" for k in n_occ[d_idx]],
            pa.array(
                pd.array(np.where(pmax[d_idx] < 0, pd.NA, pmax[d_idx]), dtype="Int32"),
                pa.int32(),
            ),
        )
    else:
        uq_tbl = VIOLATION_SCHEMA.empty_table()
    return rd.from_arrow(verdict_tbl), rd.from_arrow(uq_tbl)


def verdicts_with_unique(
    ids: rd.Dataset, violations: rd.Dataset, *, strategy: str = "auto"
) -> tuple[rd.Dataset, rd.Dataset]:
    """Verdict roll-up AND identifier-uniqueness scan in ONE reduce: the
    id-marker rows carry an occurrence counter, so a record id seen more
    than once yields an R-UQ-ID violation (error) and its verdict is
    escalated accordingly.

    strategy="auto": vectorized driver reduce while the stream fits
    ``DRIVER_REDUCE_MAX_ROWS`` (~30x faster), distributed hash aggregate
    beyond; "driver"/"shuffle" force a path."""
    if strategy in ("auto", "driver"):
        fast = _driver_reduce(
            ids, violations,
            limit=None if strategy == "driver" else DRIVER_REDUCE_MAX_ROWS,
        )
        if fast is not None:
            return fast
    import ray

    from ..stages.unique import PATH as UQ_PATH
    from ..stages.unique import RULE_ID as UQ_RULE_ID
    from ..stages.unique import SEVERITY as UQ_SEVERITY

    uq_rank = SEVERITY_RANK[UQ_SEVERITY]

    def id_rows_occ(batch: pa.Table) -> pa.Table:
        t = _id_rows(batch)
        return t.append_column("occ", pa.array([1] * len(t), pa.int64()))

    def violation_rows_occ(batch: pa.Table) -> pa.Table:
        t = _violation_rows(batch)
        return t.append_column("occ", pa.array([0] * len(t), pa.int64()))

    from ..stages.groupagg import bucketed_group_agg, pin_column_types

    tagged = ids.map_batches(id_rows_occ, batch_format="pyarrow").union(
        violations.map_batches(violation_rows_occ, batch_format="pyarrow")
    )
    # bucketed reduce over the near-unique record_id (see verdicts())
    agg = bucketed_group_agg(
        tagged,
        ["record_id"],
        [
            ("max_rank", "rank", "max"),
            ("n_issues", "cnt", "sum"),
            ("pid", PARTITION_COL, "max"),
            ("n_occ", "occ", "sum"),
        ],
        partial=False,
    ).map_batches(
        lambda t: pin_column_types(
            t,
            {"max_rank": pa.int8(), "n_issues": pa.int64(),
             "pid": pa.int32(), "n_occ": pa.int64()},
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    def finalize_with_uq(batch: pa.Table) -> pa.Table:
        dup = pc.greater(pc.fill_null(batch.column("n_occ"), 0), 1)
        rank = pc.max_element_wise(
            pc.fill_null(batch.column("max_rank"), -1).cast(pa.int8()),
            pc.if_else(dup, pa.scalar(uq_rank, pa.int8()), pa.scalar(-1, pa.int8())),
        )
        n_issues = pc.add(
            batch.column("n_issues").cast(pa.int64()),
            pc.cast(dup, pa.int64()),
        )
        adjusted = pa.table(
            {
                "record_id": batch.column("record_id"),
                "max_rank": rank,
                "n_issues": n_issues,
                "pid": batch.column("pid"),
            }
        )
        return _finalize(adjusted)

    def uq_violations(batch: pa.Table) -> pa.Table:
        dup = batch.filter(pc.greater(pc.fill_null(batch.column("n_occ"), 0), 1))
        if dup.num_rows == 0:
            from ..schema import VIOLATION_SCHEMA

            return VIOLATION_SCHEMA.empty_table()
        from ..schema import violations_table

        return violations_table(
            _decode_null_ids(dup.column("record_id").combine_chunks()
                             if isinstance(dup.column("record_id"), pa.ChunkedArray)
                             else dup.column("record_id")),
            UQ_RULE_ID, UQ_SEVERITY, UQ_PATH,
            [f"image_id occurs {n} times" for n in dup.column("n_occ").to_pylist()],
            dup.column("pid").cast(pa.int32()),
        )

    return (
        agg.map_batches(finalize_with_uq, batch_format="pyarrow"),
        agg.map_batches(uq_violations, batch_format="pyarrow"),
    )


def partition_report(verdict_ds: rd.Dataset) -> pa.Table:
    """Per-partition pass/fail roll-up (small result, driver-side pivot):
    a partition fails when any record in it is not accepted —
    the dataset-level mirror of the per-record outcome partitioning."""
    counts = (
        verdict_ds.groupby([PARTITION_COL, "verdict"])
        .count()
        .to_pandas()
    )
    # records without a partition must not vanish from the report
    # (pivot_table drops NaN index rows): bucket them as -2, the same
    # unpartitioned sentinel the stats pass uses
    counts[PARTITION_COL] = (
        counts[PARTITION_COL].fillna(-2).astype("int64")
    )
    pivot = (
        counts.pivot_table(
            index=PARTITION_COL, columns="verdict", values="count()", fill_value=0
        )
        .reindex(columns=["pass", "info", "warning", "error", "fatal"], fill_value=0)
        .reset_index()
    )
    pivot.columns.name = None
    for c in ["pass", "info", "warning", "error", "fatal"]:
        pivot[c] = pivot[c].fillna(0).astype("int64")
    pivot["n_records"] = pivot[["pass", "info", "warning", "error", "fatal"]].sum(axis=1)
    pivot["status"] = (pivot["fatal"] == 0).map({True: "pass", False: "fail"})
    pivot = pivot.rename(columns={c: f"n_{c}" for c in ["pass", "info", "warning", "error", "fatal"]})
    return pa.Table.from_pandas(pivot, preserve_index=False)

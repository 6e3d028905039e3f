"""Referential checks — semi/anti joins against a referenced key set.

The reference resolves in-record ``Reference(Id[T])`` foreign keys
against lookup maps, with Fatal on a dangling reference
(MTBRecommendationValidator, MTBValidators.scala:563-568) and a Warning
anti-join for claims without a matching claim-response
(claimValidator, MTBValidators.scala:621-623).  Promoted to dataset
scale these become:

* **semi-join** (must exist): broadcast the referenced key set
  (``ray.put`` once, read in every actor) and check membership inside
  the row pass — no shuffle (strategy="broadcast", the default for the
  small side), or a tagged-union shuffle when the key side is too big to
  broadcast (strategy="shuffle").
* **anti-join** (flag rows WITHOUT a partner): same two strategies, with
  the match inverted.

The shuffle strategy is a single hash ``groupby`` over tagged key rows
with vectorized aggregates only (bucketed max/min/sum reduce) — no per-group Python, no
second exchange — so it scales to both sides being 10^12 rows.  Keys are
pre-deduplicated per batch before the exchange (partial aggregation), so
a skewed key (one annotation referenced by millions of rows) ships once
per block, not once per row.
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..rules.core import Rule
from ..schema import PARTITION_COL, VIOLATION_SCHEMA, violations_table

ORPHAN_RULE = Rule(
    "R-REF-ORPHAN",
    "anti_join",
    "warning",
    "/record",
    message="no companion annotation row for this image_id",
    description="anti-join orphan warning (claimValidator, MTBValidators.scala:621-623)",
)


def _broadcast_missing(
    ds: rd.Dataset, key_col: str, keys_ref, rule: Rule
) -> rd.Dataset:
    def check(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
        if not isinstance(keys, pa.Array):
            keys = pa.array(sorted(keys), pa.string())
        col = batch.column(key_col)
        missing = pc.and_(pc.invert(pc.is_in(col, value_set=keys)), pc.is_valid(col))
        bad = batch.filter(missing)
        if bad.num_rows == 0:
            return VIOLATION_SCHEMA.empty_table()
        pids = (
            bad.column(PARTITION_COL)
            if PARTITION_COL in bad.column_names
            else pa.nulls(bad.num_rows, pa.int32())
        )
        return violations_table(
            bad.column(key_col) if key_col == "image_id" else bad.column("image_id"),
            rule.rule_id, rule.severity, rule.path, rule.render_message(), pids,
        )

    return ds.map_batches(check, batch_format="pyarrow", zero_copy_batch=True)


def _shuffle_missing(
    ds: rd.Dataset, key_col: str, keys: rd.Dataset, rule: Rule
) -> rd.Dataset:
    """Tagged-union anti-join: left rows tag=0, key rows tag=1; after a
    groupby on the key, groups with max(tag)==0 are unmatched lefts."""

    def left_rows(batch: pa.Table) -> pa.Table:
        # partial dedup per batch shrinks the exchange
        cols = [key_col] + (
            [PARTITION_COL] if PARTITION_COL in batch.column_names else []
        )
        g = batch.select(cols).group_by(cols).aggregate([([], "count_all")])
        n = g.num_rows
        return pa.table(
            {
                "key": g.column(key_col).cast(pa.string()),
                "tag": pa.array([0] * n, pa.int8()),
                PARTITION_COL: (
                    g.column(PARTITION_COL).cast(pa.int32())
                    if PARTITION_COL in batch.column_names
                    else pa.nulls(n, pa.int32())
                ),
            }
        )

    def key_rows(batch: pa.Table) -> pa.Table:
        uniq = pc.unique(batch.column(key_col))
        n = len(uniq)
        return pa.table(
            {
                "key": uniq.cast(pa.string()),
                "tag": pa.array([1] * n, pa.int8()),
                PARTITION_COL: pa.nulls(n, pa.int32()),
            }
        )

    tagged = ds.map_batches(left_rows, batch_format="pyarrow").union(
        keys.map_batches(key_rows, batch_format="pyarrow")
    )
    # bucketed reduce, not the native sort aggregate: the key column is
    # an IDENTIFIER (near-unique), where the native aggregate pays a
    # per-output-group Python cost (stages/groupagg.py scale finding)
    from .groupagg import bucketed_group_agg, pin_column_types

    agg = bucketed_group_agg(
        tagged,
        ["key"],
        [
            ("has_match", "tag", "max"),
            ("min_tag", "tag", "min"),
            ("pid", PARTITION_COL, "min"),
            ("_ntag", "tag", "sum"),
        ],
        # left_rows/key_rows already dedupe per batch
        partial=False,
    ).map_batches(
        # all-null pid buckets degrade to float64 in pandas; pin back
        lambda t: pin_column_types(
            t,
            {
                "has_match": pa.int8(),
                "min_tag": pa.int8(),
                "pid": pa.int32(),
                "_ntag": pa.int64(),
            },
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def to_violations(batch: pa.Table) -> pa.Table:
        unmatched = batch.filter(pc.equal(batch.column("has_match"), 0))
        if unmatched.num_rows == 0:
            return VIOLATION_SCHEMA.empty_table()
        return violations_table(
            unmatched.column("key"),
            rule.rule_id, rule.severity, rule.path, rule.render_message(),
            unmatched.column("pid").cast(pa.int32()),
        )

    return agg.map_batches(to_violations, batch_format="pyarrow")


def _hashjoin_missing(
    ds: rd.Dataset, key_col: str, keys: rd.Dataset, rule: Rule
) -> rd.Dataset:
    """Native ``Dataset.join(left_anti)``-style path via left_outer +
    null filter (Ray 2.49's hash-partitioned join operator)."""
    import ray as _ray

    n_parts = max(8, int(_ray.cluster_resources().get("CPU", 8)))
    right = keys.select_columns([key_col]).map_batches(
        lambda b: pa.table(
            {key_col: pc.unique(b.column(key_col)),
             "_present": pa.array([1] * len(pc.unique(b.column(key_col))), pa.int8())}
        ),
        batch_format="pyarrow",
    )
    joined = ds.select_columns(
        [key_col] + ([PARTITION_COL] if PARTITION_COL in ds.schema().names else [])
    ).join(
        right, join_type="left_outer", num_partitions=n_parts,
        on=(key_col,),
    )

    def to_violations(batch: pa.Table) -> pa.Table:
        missing = pc.is_null(batch.column("_present"))
        bad = batch.filter(missing)
        if bad.num_rows == 0:
            return VIOLATION_SCHEMA.empty_table()
        pids = (
            bad.column(PARTITION_COL)
            if PARTITION_COL in bad.column_names
            else pa.nulls(bad.num_rows, pa.int32())
        )
        return violations_table(
            bad.column(key_col), rule.rule_id, rule.severity, rule.path,
            rule.render_message(), pids,
        )

    return joined.map_batches(to_violations, batch_format="pyarrow")


def orphan_violations(
    ds: rd.Dataset,
    annotations: rd.Dataset | Iterable[str] | pa.Array,
    *,
    key_col: str = "image_id",
    rule: Rule = ORPHAN_RULE,
    strategy: str = "broadcast",
) -> rd.Dataset:
    """Rows of ``ds`` with no partner key in ``annotations``.

    strategy="broadcast": annotation key set fits in the object store →
    ship once with ``ray.put``; strategy="shuffle": both sides large →
    tagged-union groupby (one exchange); strategy="hashjoin": Ray's
    native hash-partitioned join operator (left_outer + null filter)."""
    if strategy == "shuffle":
        if not isinstance(annotations, rd.Dataset):
            raise ValueError("shuffle strategy needs the key side as a Dataset")
        return _shuffle_missing(ds, key_col, annotations, rule)
    if strategy == "hashjoin":
        if not isinstance(annotations, rd.Dataset):
            raise ValueError("hashjoin strategy needs the key side as a Dataset")
        return _hashjoin_missing(ds, key_col, annotations, rule)
    if isinstance(annotations, rd.Dataset):
        keys = pc.unique(
            pa.concat_arrays(
                [
                    pa.concat_arrays(b.column(key_col).cast(pa.string()).chunks)
                    for b in annotations.select_columns([key_col]).iter_batches(
                        batch_format="pyarrow", batch_size=1 << 16
                    )
                ]
            )
        )
    elif isinstance(annotations, pa.Array):
        keys = annotations
    else:
        keys = pa.array(sorted(set(annotations)), pa.string())
    keys_ref = ray.put(keys)
    return _broadcast_missing(ds, key_col, keys_ref, rule)

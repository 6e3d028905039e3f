"""Referential join stages: broadcast vs tagged-union shuffle must
produce identical orphan sets."""

import pyarrow as pa
import ray.data as rd

from mtb_validation_service_ray.sources.fixtures import (
    annotations_table,
    make_image_rows,
)
from mtb_validation_service_ray.stages.referential import orphan_violations


def test_broadcast_and_shuffle_strategies_agree():
    t = make_image_rows(0, 300, seed=21, total=300)
    ids = t.column("image_id").to_pylist()
    dropped = sorted([ids[10], ids[150], ids[299]])
    ann = annotations_table(t, drop_ids=dropped)

    id_ds = rd.from_arrow(t.select(["image_id", "partition_id"]))
    b = orphan_violations(id_ds, rd.from_arrow(ann), strategy="broadcast").to_pandas()
    s = orphan_violations(id_ds, rd.from_arrow(ann), strategy="shuffle").to_pandas()

    assert sorted(b.record_id) == dropped
    assert sorted(s.record_id) == dropped
    bb = b.sort_values("record_id").reset_index(drop=True)
    ss = s.sort_values("record_id").reset_index(drop=True)
    assert bb[["record_id", "rule_id", "severity", "path"]].equals(
        ss[["record_id", "rule_id", "severity", "path"]]
    )
    # partition attribution survives the shuffle path
    assert set(ss.partition_id) == set(bb.partition_id)


def test_shuffle_ignores_extra_annotation_keys():
    t = make_image_rows(0, 50, seed=22, total=50)
    ann = annotations_table(t)
    extra = pa.table(
        {
            "image_id": pa.array(
                ann.column("image_id").to_pylist() + ["img-notintable000001"]
            ),
            "note": pa.array([""] * (ann.num_rows + 1)),
        }
    )
    id_ds = rd.from_arrow(t.select(["image_id", "partition_id"]))
    out = orphan_violations(id_ds, rd.from_arrow(extra), strategy="shuffle")
    assert out.count() == 0


def test_sorted_run_scan_matches_count_aggregate():
    """North-star sorted-run duplicate scan ≡ count-based aggregate."""
    import pyarrow.compute as pc

    from mtb_validation_service_ray.stages.unique import (
        duplicate_id_violations,
        duplicate_id_violations_sortscan,
    )

    t = make_image_rows(0, 200, seed=30, total=200)
    # plant duplicates: two copies of row 5, three of row 9
    dup = pa.concat_tables([t, t.slice(5, 1), t.slice(9, 1), t.slice(9, 1)])
    ids = rd.from_arrow(dup.select(["image_id", "partition_id"]))
    a = duplicate_id_violations(ids).to_pandas().sort_values("record_id").reset_index(drop=True)
    b = (
        duplicate_id_violations_sortscan(ids)
        .to_pandas().sort_values("record_id").reset_index(drop=True)
    )
    cols = ["record_id", "rule_id", "severity", "path", "message", "partition_id"]
    assert a[cols].equals(b[cols]), f"\n{a}\n{b}"
    assert len(a) == 2
    assert set(a.message) == {"image_id occurs 2 times", "image_id occurs 3 times"}


def test_hashjoin_strategy_matches_broadcast():
    """Native Dataset.join path agrees with broadcast anti-join."""
    t = make_image_rows(0, 200, seed=23, total=200)
    ids = t.column("image_id").to_pylist()
    dropped = sorted([ids[7], ids[120]])
    ann = annotations_table(t, drop_ids=dropped)
    id_ds = rd.from_arrow(t.select(["image_id", "partition_id"]))
    out = orphan_violations(
        id_ds, rd.from_arrow(ann), strategy="hashjoin"
    ).to_pandas()
    assert sorted(out.record_id) == dropped
    assert set(out.rule_id) == {"R-REF-ORPHAN"}


def test_hash_actor_reduce_matches_groupby():
    """Custom bucket-actor hash reduce ≡ the groupby plan, including
    partition attribution and messages."""
    from mtb_validation_service_ray.stages.unique import duplicate_id_violations

    t = make_image_rows(0, 200, seed=31, total=200)
    dup = pa.concat_tables([t, t.slice(5, 1), t.slice(9, 1), t.slice(9, 1)])
    ids = rd.from_arrow(dup.select(["image_id", "partition_id"]))
    cols = ["record_id", "rule_id", "severity", "path", "message", "partition_id"]
    a = (
        duplicate_id_violations(ids)
        .to_pandas().sort_values("record_id").reset_index(drop=True)
    )
    b = (
        duplicate_id_violations(ids, strategy="hash_actors")
        .to_pandas().sort_values("record_id").reset_index(drop=True)
    )
    assert a[cols].equals(b[cols]), f"\n{a}\n{b}"


def test_hash_reduce_sum_min_max_and_empty():
    from mtb_validation_service_ray.stages.hashreduce import hash_reduce

    t = pa.table(
        {
            "k": ["a", "a", "b", "c", "c", "c"],
            "v": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "lo": pa.array([9, 2, 3, None, 5, 1], pa.int64()),
        }
    )
    out = (
        hash_reduce(rd.from_arrow(t), "k", [("v", "sum"), ("lo", "min")],
                    num_actors=3)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert list(out.k) == ["a", "b", "c"]
    assert list(out.v) == [3, 3, 15]
    assert list(out.lo) == [2, 3, 1]  # nulls skipped, min over group
    # empty input → empty result, no hang
    empty = hash_reduce(
        rd.from_arrow(t.slice(0, 0)), "k", [("v", "sum")], num_actors=2
    )
    assert empty.count() == 0

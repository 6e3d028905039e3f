"""JSONL ingestion round-trip + connected-components clustering."""

import os

import numpy as np
import pyarrow as pa

from mtb_validation_service_ray.sources.fixtures import make_image_rows
from mtb_validation_service_ray.sources.ingest import (
    ingest_jsonl,
    read_jsonl_images,
    write_jsonl_images,
)
from mtb_validation_service_ray.stages.dedup import connected_components


def test_jsonl_ingest_roundtrip(tmp_path):
    t = make_image_rows(0, 120, seed=8, total=120)
    path = os.path.join(tmp_path, "drop.jsonl")
    write_jsonl_images(t, path)

    ds = read_jsonl_images(path)
    got = pa.concat_tables(ds.iter_batches(batch_format="pyarrow", batch_size=1000))
    got = got.sort_by("image_id")
    exp = t.sort_by("image_id")
    assert got.schema.equals(exp.schema)
    assert got.equals(exp)

    out = os.path.join(tmp_path, "parquet")
    n = ingest_jsonl(path, out)
    assert n == 120

    # ingested table validates clean end-to-end
    from mtb_validation_service_ray.pipelines.validate import run_validation_fused

    res = run_validation_fused(out)
    assert res.violations.count() == 0
    assert res.verdicts.count() == 120


def test_connected_components_clusters():
    # components: {1,2,3,4} via chain, {10,11}, singleton edges absent
    pairs = pa.table(
        {
            "doc_a": pa.array([1, 2, 3, 10], pa.int64()),
            "doc_b": pa.array([2, 3, 4, 11], pa.int64()),
        }
    )
    out = connected_components(pairs).to_pandas().set_index("id")
    assert out.loc[[1, 2, 3, 4], "cluster"].nunique() == 1
    assert out.loc[1, "cluster"] == 1
    assert out.loc[[10, 11], "cluster"].tolist() == [10, 10]
    assert len(out) == 6


def test_connected_components_long_chain_converges():
    n = 500
    pairs = pa.table(
        {
            "doc_a": pa.array(np.arange(n - 1), pa.int64()),
            "doc_b": pa.array(np.arange(1, n), pa.int64()),
        }
    )
    out = connected_components(pairs).to_pandas()
    assert (out.cluster == 0).all()


def test_connected_components_max_rounds_raises():
    """Exhausting an explicit max_rounds is an error, never a silent
    half-merged labelling (ADVICE r1)."""
    import pytest

    n = 5000  # long chain: needs more than 1 round even with pointer jumps
    pairs = pa.table(
        {
            "doc_a": pa.array(np.arange(n - 1), pa.int64()),
            "doc_b": pa.array(np.arange(1, n), pa.int64()),
        }
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_rounds=1)


def test_connected_components_distributed_equivalence():
    """The Dataset-pipeline fallback labels components identically to
    the driver path on a multi-component fixture (VERDICT r1 #8)."""
    rng = np.random.default_rng(5)
    edges_a, edges_b = [], []
    # 4 components: a chain, a star, a clique, an isolated pair
    chain = np.arange(100, 110)
    edges_a += chain[:-1].tolist(); edges_b += chain[1:].tolist()
    star = np.arange(200, 208)
    edges_a += [200] * 7; edges_b += star[1:].tolist()
    clique = np.arange(300, 305)
    for i in range(5):
        for j in range(i + 1, 5):
            edges_a.append(300 + i); edges_b.append(300 + j)
    edges_a += [400]; edges_b += [401]
    perm = rng.permutation(len(edges_a))
    pairs = pa.table(
        {
            "doc_a": pa.array(np.array(edges_a)[perm], pa.int64()),
            "doc_b": pa.array(np.array(edges_b)[perm], pa.int64()),
        }
    )
    drv = connected_components(pairs, strategy="driver").to_pandas()
    dist = connected_components(pairs, strategy="distributed").to_pandas()
    drv = drv.sort_values("id").reset_index(drop=True)
    dist = dist.sort_values("id").reset_index(drop=True)
    assert drv.equals(dist)
    assert set(drv[drv.id.isin(chain)].cluster) == {100}
    assert set(drv[drv.id.isin(star)].cluster) == {200}
    assert set(drv[drv.id.isin(clique)].cluster) == {300}
    assert set(drv[drv.id.isin([400, 401])].cluster) == {400}


def test_connected_components_string_ids_distributed():
    """String document ids through BOTH arms (the distributed fixpoint
    detector used an integer label sum until r5 — it must fingerprint
    non-numeric labels instead of crashing), plus the as_dataset
    contract on each arm."""
    import ray.data as rd

    pairs = pa.table(
        {
            "doc_a": pa.array(["a1", "b1", "b2", "z9"]),
            "doc_b": pa.array(["a2", "b2", "b3", "z8"]),
        }
    )
    drv = connected_components(pairs, strategy="driver").to_pandas()
    dist = connected_components(pairs, strategy="distributed").to_pandas()
    drv = drv.sort_values("id").reset_index(drop=True)
    dist = dist.sort_values("id").reset_index(drop=True)
    assert drv.equals(dist)
    m = dict(zip(drv.id, drv.cluster))
    assert m == {"a1": "a1", "a2": "a1", "b1": "b1", "b2": "b1",
                 "b3": "b1", "z8": "z8", "z9": "z8"}
    for strat in ("driver", "distributed"):
        ds = connected_components(pairs, strategy=strat, as_dataset=True)
        assert isinstance(ds, rd.Dataset)
        got = ds.to_pandas().sort_values("id").reset_index(drop=True)
        assert got.equals(drv)


def test_cc_strategies_agree_on_event_pair_graph():
    """Driver and distributed CC agree on the same SQL-derivable edge
    set the dedup_cc_pairs oracle query uses (sf0.001 events)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    from mtb_validation_service_ray.stages.dedup import connected_components

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["user_id", "ts", "event_type"],
    )

    def add_minute(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                # hour buckets: sf0.001 is too sparse for 2-user MINUTES
                "minute": pc.floor_temporal(batch.column("ts"), unit="hour"),
                "user_id": batch.column("user_id"),
            }
        )

    per_bucket = (
        ds.map_batches(add_minute, batch_format="pyarrow")
        .groupby(["event_type", "minute", "user_id"])
        .aggregate(Count(alias_name="_n"))
        .groupby(["event_type", "minute"])
        .aggregate(
            Min("user_id", alias_name="u_min"),
            Max("user_id", alias_name="u_max"),
            Count(alias_name="n_users"),
        )
    )

    def edges(batch: pa.Table) -> pa.Table:
        two = batch.filter(pc.equal(batch.column("n_users"), 2))
        return pa.table(
            {
                "doc_a": two.column("u_min").cast(pa.int64()),
                "doc_b": two.column("u_max").cast(pa.int64()),
            }
        )

    e = per_bucket.map_batches(edges, batch_format="pyarrow").materialize()
    assert e.count() > 0
    a = connected_components(e, strategy="driver").sort_by([("id", "ascending")])
    b = connected_components(e, strategy="distributed").sort_by(
        [("id", "ascending")]
    )
    assert a.equals(b)

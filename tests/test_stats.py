"""Sketch + stats/drift pass tests."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from mtb_validation_service_ray.functions.sketches import (
    HyperLogLog,
    TDigest,
    hash64,
    histogram,
    ks_statistic,
    psi,
)
from mtb_validation_service_ray.sources.fixtures import make_image_rows
from mtb_validation_service_ray.stages.stats import (
    drift_violations,
    profile_stats,
    reference_histograms,
    stats_report,
)


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 1 << 40, 100_000)
    true = len(np.unique(vals))
    parts = [HyperLogLog() for _ in range(4)]
    for i, p in enumerate(parts):
        p.add_hashes(hash64(vals[i * 25_000 : (i + 1) * 25_000]))
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    assert abs(merged.estimate() - true) / true < 0.05
    # merge is order-insensitive
    alt = parts[3].merge(parts[1]).merge(parts[2]).merge(parts[0])
    assert alt.estimate() == merged.estimate()


def test_tdigest_accuracy_and_merge():
    rng = np.random.default_rng(2)
    data = rng.gamma(3.0, 20.0, 200_000)
    a, b = TDigest(), TDigest()
    a.add(data[:100_000])
    b.add(data[100_000:])
    m = a.merge(b)
    for q in (0.05, 0.5, 0.95):
        assert abs(m.quantile(q) - np.quantile(data, q)) < 0.05 * np.quantile(data, q) + 1


def test_drift_metrics_directionality():
    rng = np.random.default_rng(3)
    base = rng.normal(50, 5, 50_000)
    edges = np.linspace(0, 100, 26)
    ref = histogram(base, edges)
    same = histogram(rng.normal(50, 5, 50_000), edges)
    shifted = histogram(base + 15, edges)
    assert psi(ref, same) < 0.02 < psi(ref, shifted)
    assert ks_statistic(ref, same) < 0.02 < ks_statistic(ref, shifted)


def test_profile_stats_and_report():
    table = make_image_rows(0, 2000, seed=7, total=2000, n_partitions=4)
    meta = table.drop_columns(["bytes"])
    stats_ds = profile_stats(rd.from_arrow(meta), concurrency=1)
    report = stats_report(stats_ds).to_pandas().set_index("partition_id")
    assert set(report.index) == {-1, 0, 1, 2, 3}
    glob = report.loc[-1]
    assert glob["n_rows"] == 2000
    assert report.drop(index=-1)["n_rows"].sum() == 2000
    # ids are unique → HLL estimate near 2000
    assert abs(glob["distinct_ids_est"] - 2000) / 2000 < 0.05
    assert glob["min_w"] >= 16 and glob["max_w"] <= 128
    assert glob["null_caption"] == 0
    # hot dim mode (64) dominates → median is 64
    assert glob["p50_w"] == 64


def test_drift_violation_emission():
    clean = make_image_rows(0, 3000, seed=11, total=3000, n_partitions=3)
    meta = clean.drop_columns(["bytes"])
    ref_stats = profile_stats(rd.from_arrow(meta), concurrency=1)
    ref = reference_histograms(ref_stats)

    # same distribution → no drift violations
    none = drift_violations(profile_stats(rd.from_arrow(meta), concurrency=1), ref)
    assert none.num_rows == 0

    # shift w in partition 2 → drift violation for exactly that partition
    import pyarrow.compute as pc

    shifted_w = pc.if_else(
        pc.equal(meta.column("partition_id"), 2),
        pc.add(meta.column("w"), 400),
        meta.column("w"),
    ).cast(pa.int32())
    drifted = meta.set_column(meta.column_names.index("w"), "w", shifted_w)
    v = drift_violations(profile_stats(rd.from_arrow(drifted), concurrency=1), ref)
    got = v.to_pandas()
    w_rows = got[got.rule_id == "R-DRIFT-W"]
    assert list(w_rows.record_id) == ["partition=2"]
    assert set(got.partition_id) == {2}


def test_stats_pass_null_partition_id():
    """Null partition ids fold into the -1 sentinel bucket instead of
    crashing on int(NaN) (ADVICE r1)."""
    import pyarrow as pa

    from mtb_validation_service_ray.stages.stats import StatsPass

    batch = pa.table(
        {
            "image_id": ["a", "b", "c"],
            "w": pa.array([10, 20, 30], pa.int32()),
            "partition_id": pa.array([0, None, None], pa.int32()),
        }
    )
    out = StatsPass()(batch)
    pids = sorted(out.column("partition_id").to_pylist())
    assert pids == [-2, 0]  # -2 = null-pid bucket (-1 is the global row)
    assert sum(out.column("n_rows").to_pylist()) == 3


def test_grouped_hll_distinct_tolerance_and_nulls():
    """Per-group HLL estimate within ±5% of exact at cardinalities past
    the linear-counting regime; null values ignored, null keys grouped."""
    from mtb_validation_service_ray.stages.stats import grouped_hll_distinct

    rng = np.random.default_rng(11)
    n = 120_000
    keys = rng.choice(["a", "b", "c"], n)
    # per-key distinct targets spanning the small->raw estimator range
    vals = np.where(
        keys == "a", rng.integers(0, 200, n),
        np.where(keys == "b", rng.integers(0, 20_000, n),
                 rng.integers(0, 60_000, n)),
    ).astype(object)
    vals[::97] = None  # ignored nulls
    key_col = keys.astype(object)
    key_col[::101] = None  # null keys form their own group
    t = pa.table({
        "k": pa.array(list(key_col), pa.string()),
        "v": pa.array(list(vals), pa.int64()),
    })
    out = {
        r["k"]: r["n_distinct_est"]
        for r in grouped_hll_distinct(
            rd.from_arrow(t), "k", "v", num_buckets=4
        ).take_all()
    }
    import pandas as pd

    df = pd.DataFrame({"k": key_col, "v": vals})
    exact = df[df.v.notna()].groupby("k", dropna=False).v.nunique()
    assert set(out) == {"a", "b", "c", None}
    for k, ex in exact.items():
        k = None if pd.isna(k) else k
        assert abs(out[k] - ex) / ex < 0.05, (k, out[k], ex)


def test_grouped_tdigest_quantiles_tolerance():
    """Per-key t-digest quantiles within ±3% of exact on a skewed
    distribution; all-null value keys yield NaN; null keys grouped."""
    from mtb_validation_service_ray.stages.stats import grouped_tdigest_quantiles

    rng = np.random.default_rng(5)
    n = 60_000
    keys = rng.choice(["a", "b"], n).astype(object)
    keys[::311] = None
    vals = np.where(
        keys == "a", rng.lognormal(3.0, 1.0, n), rng.normal(50, 10, n)
    )
    t = pa.table({
        "k": pa.array(list(keys), pa.string()),
        "v": pa.array(vals, pa.float64()),
    })
    out = {
        r["k"]: (r["q25"], r["q50"], r["q75"], r["q90"])
        for r in grouped_tdigest_quantiles(
            rd.from_arrow(t), "k", "v", num_buckets=4
        ).take_all()
    }
    import pandas as pd

    df = pd.DataFrame({"k": keys, "v": vals})
    assert set(out) == {"a", "b", None}
    for key, grp in df.groupby("k", dropna=False):
        key = None if pd.isna(key) else key
        exact = grp.v.quantile([0.25, 0.5, 0.75, 0.9]).to_numpy()
        got = np.asarray(out[key])
        assert (np.abs(got - exact) / np.abs(exact) < 0.03).all(), (key, got, exact)

    # a key whose values are all null yields NaN quantiles
    t2 = pa.table({
        "k": pa.array(["x", "x", "y"], pa.string()),
        "v": pa.array([None, None, 1.0], pa.float64()),
    })
    rows = {
        r["k"]: r["q50"]
        for r in grouped_tdigest_quantiles(
            rd.from_arrow(t2), "k", "v", num_buckets=2
        ).take_all()
    }
    assert rows["y"] == 1.0 and (rows["x"] is None or np.isnan(rows["x"]))


def test_zscore_per_key_edges():
    """Zero-variance and singleton keys yield null z; null values null;
    values normalize to mean 0 / std 1 per key."""
    from mtb_validation_service_ray.stages.stats import zscore_per_key

    t = pa.table({
        "k": pa.array(["a"] * 4 + ["b"] * 3 + ["c"], pa.string()),
        "v": pa.array([1.0, 2.0, 3.0, None, 5.0, 5.0, 5.0, 9.0], pa.float64()),
    })
    out = (
        zscore_per_key(rd.from_arrow(t), "k", "v", num_buckets=2)
        .to_pandas()
    )
    a = out[out.k == "a"].sort_values("v")
    az = a.z.to_numpy()
    assert np.isnan(az[-1])  # null value
    got = az[:3]
    vals = np.array([1.0, 2.0, 3.0])
    exp = (vals - vals.mean()) / vals.std()
    assert np.allclose(got, np.round(exp, 6))
    assert out[out.k == "b"].z.isna().all()  # zero variance
    assert out[out.k == "c"].z.isna().all()  # singleton


def test_zscore_per_key_large_magnitude_stable():
    """Values around 1e8 with unit variance: the centered/Chan-merged
    moments stay accurate where naive E[x2]-mean^2 would cancel."""
    from mtb_validation_service_ray.stages.stats import zscore_per_key

    rng = np.random.default_rng(2)
    v = 1e8 + rng.normal(0.0, 1.0, 20_000)
    t = pa.table({
        "k": pa.array(["a"] * 20_000, pa.string()),
        "v": pa.array(v, pa.float64()),
    })
    out = (
        zscore_per_key(
            rd.from_arrow(t).repartition(5), "k", "v", num_buckets=3
        )
        .to_pandas()
    )
    exact = (v - v.mean()) / v.std()
    got = out.sort_values("v").z.to_numpy()
    exp = np.sort(exact)
    assert np.abs(got - exp).max() < 1e-4


def test_zscore_null_keys_get_null_z():
    from mtb_validation_service_ray.stages.stats import zscore_per_key

    t = pa.table({
        "k": pa.array([1, 1, 1, None, None], pa.int64()),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0], pa.float64()),
    })
    out = zscore_per_key(rd.from_arrow(t), "k", "v", num_buckets=2).to_pandas()
    assert out[out.k.isna()].z.isna().all()
    assert out[out.k.notna()].z.notna().all()


def test_nullable_int_key_does_not_split_partitions():
    """Regression (review r4): a batch containing a null used to coerce
    int64 keys to float64, hash differently, and split a key's rows
    across buckets in every bucketed operator."""
    from mtb_validation_service_ray.stages.groupagg import bucketed_group_agg
    from mtb_validation_service_ray.stages.windows import ranked_window_per_key

    clean = pa.table({
        "k": pa.array([7, 7, 7], pa.int64()),
        "ts": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array([10, 10, 10], pa.int64()),
    })
    dirty = pa.table({
        "k": pa.array([7, None], pa.int64()),
        "ts": pa.array([4, 5], pa.int64()),
        "v": pa.array([10, 10], pa.int64()),
    })
    ds = rd.from_arrow(clean).union(rd.from_arrow(dirty))
    # grouped sum: key 7 must reduce to ONE row of 40
    agg = {
        r["k"]: r["total"]
        for r in bucketed_group_agg(
            ds, ["k"], [("total", "v", "sum")], num_buckets=8
        ).take_all()
    }
    assert agg[7] == 40 and agg[None] == 10
    # ranked window: key 7's row_num must be a single 1..4 chain
    ranked = ranked_window_per_key(
        ds, key_col="k", ts_col="ts", value_col="v", num_buckets=8
    ).to_pandas()
    k7 = ranked[ranked.k == 7].sort_values("ts")
    assert k7.row_num.tolist() == [1, 2, 3, 4]


def test_robust_scale_per_key_edges():
    """Zero-IQR keys, null keys/values, and all-null groups yield null;
    normal keys match the (v - median) / IQR formula exactly."""
    from mtb_validation_service_ray.stages.stats import robust_scale_per_key

    t = pa.table({
        "k": pa.array(["a"] * 5 + ["b"] * 3 + [None, "a", "c"], pa.string()),
        "v": pa.array(
            [1.0, 2.0, 3.0, 4.0, 5.0] + [7.0, 7.0, 7.0] + [9.0, None, None],
            pa.float64(),
        ),
    })
    out = (
        robust_scale_per_key(rd.from_arrow(t).repartition(3), "k", "v")
        .to_pandas()
    )
    a = out[(out.k == "a") & out.v.notna()].sort_values("v")
    # a: sorted [1..5], q1 = rank ceil(.25*5)=2 -> 2.0, med = rank 3 ->
    # 3.0, q3 = rank ceil(.75*5)=4 -> 4.0, IQR = 2
    exp = (a.v.to_numpy() - 3.0) / 2.0
    assert np.allclose(a.r.to_numpy(), np.round(exp, 6))
    assert out[out.k == "b"].r.isna().all()      # zero IQR
    assert out[out.k.isna()].r.isna().all()      # null key
    assert out[(out.k == "a") & out.v.isna()].r.isna().all()  # null value
    assert out[out.k == "c"].r.isna().all()      # all-null group: unseen


def test_histogram_fixed_edges_and_nulls():
    from mtb_validation_service_ray.stages.stats import histogram_fixed

    t = pa.table({
        "v": pa.array(
            [-5.0, 0.0, 9.99, 10.0, 95.0, 200.0, None, None], pa.float64()
        ),
    })
    out = (
        histogram_fixed(rd.from_arrow(t).repartition(3), "v",
                        lo=0.0, hi=100.0, nbins=10)
        .to_pandas().set_index("bucket").n.to_dict()
    )
    # -5 clamps to 0; 10.0 is bucket 1's left edge; 200 clamps to 9
    assert out == {-1: 2, 0: 3, 1: 1, 9: 2}


def test_rollup_agg_matches_pandas():
    from mtb_validation_service_ray.stages.stats import rollup_agg

    rng = np.random.default_rng(6)
    n = 500
    t = pa.table({
        "a": pa.array(rng.choice(["x", "y"], n), pa.string()),
        "b": pa.array(rng.integers(0, 5, n), pa.int64()),
        "v": pa.array(np.round(rng.uniform(0, 10, n), 2), pa.float64()),
    })
    out = rollup_agg(
        rd.from_arrow(t).repartition(4), ["a", "b"], "v", num_buckets=3
    ).to_pandas()
    df = t.to_pandas()
    df["cents"] = np.floor(df.v * 100 + 0.5).astype(np.int64)
    fine = out[out.a.notna() & out.b.notna()]
    assert len(fine) == df.groupby(["a", "b"]).ngroups
    exp = df.groupby(["a", "b"]).cents.sum()
    got = fine.set_index(["a", "b"]).sum_cents
    assert (got.sort_index() == exp.sort_index()).all()
    mid = out[out.a.notna() & out.b.isna()].set_index("a")
    assert (mid.n.sort_index().to_numpy()
            == df.groupby("a").size().sort_index().to_numpy()).all()
    total = out[out.a.isna() & out.b.isna()]
    assert len(total) == 1
    assert total.n.iloc[0] == n and total.sum_cents.iloc[0] == df.cents.sum()


def test_grouped_quantiles_cont_matches_numpy():
    from mtb_validation_service_ray.stages.stats import grouped_quantiles_cont

    rng = np.random.default_rng(8)
    t = pa.table({
        "k": pa.array(rng.choice(["a", "b"], 400), pa.string()),
        "v": pa.array(np.round(rng.uniform(0, 100, 400), 2), pa.float64()),
    })
    out = (
        grouped_quantiles_cont(
            rd.from_arrow(t).repartition(4), key_col="k", value_col="v"
        )
        .to_pandas().set_index(["k", "q"]).value
    )
    df = t.to_pandas()
    for k, g in df.groupby("k"):
        for q in (0.25, 0.5, 0.75):
            exp = np.quantile(g.v.to_numpy(), q)
            assert abs(out.loc[(k, q)] - round(exp, 6)) < 1e-9, (k, q)


def test_corr_per_key_large_magnitude_stable():
    """Correlation of unit-scale y against ~1.7e15-scale x (epoch µs):
    the Chan-merged centered comoments must match numpy's corrcoef
    where naive E[xy]-E[x]E[y] would cancel catastrophically."""
    from mtb_validation_service_ray.stages.stats import corr_per_key

    rng = np.random.default_rng(4)
    n = 30_000
    x = 1.7e15 + np.sort(rng.uniform(0, 1e12, n))
    y = 0.5 * (x - x.mean()) / 1e12 + rng.normal(0, 1.0, n)
    t = pa.table({
        "k": pa.array(["a"] * n, pa.string()),
        "x": pa.array(x, pa.float64()),
        "y": pa.array(y, pa.float64()),
    })
    out = (
        corr_per_key(rd.from_arrow(t).repartition(6), "k", "x", "y",
                     num_buckets=3)
        .to_pandas()
    )
    exp = np.corrcoef(x, y)[0, 1]
    assert abs(out.r.iloc[0] - round(exp, 6)) < 2e-6
    assert out.n.iloc[0] == n
    # degenerate keys -> null r
    t2 = pa.table({
        "k": pa.array(["s", "z", "z"], pa.string()),
        "x": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "y": pa.array([5.0, 7.0, 7.0], pa.float64()),
    })
    out2 = corr_per_key(rd.from_arrow(t2), "k", "x", "y").to_pandas()
    assert out2[out2.k == "s"].r.isna().all()   # n < 2
    assert out2[out2.k == "z"].r.isna().all() or not np.isnan(
        out2[out2.k == "z"].r.iloc[0]
    )  # zero y-variance pair handled without crashing

"""Salted two-stage aggregation: exactness under extreme key skew."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from mtb_validation_service_ray.stages.salt import salted_groupby_sum, skewed_key_stats


def _skewed_table(n=20_000, seed=17):
    rng = np.random.default_rng(seed)
    # 95% of rows share one key (the fmt-skew regime, FIXTURES.md §1)
    keys = np.where(rng.random(n) < 0.95, "hot", rng.choice(["a", "b", "c"], n))
    return pa.table(
        {
            "k": pa.array(keys.astype(object), pa.string()),
            "v": pa.array(rng.integers(0, 100, n).astype(np.float64)),
        }
    )


def test_salted_sum_exact_under_skew():
    t = _skewed_table()
    ds = rd.from_arrow(t)
    out = salted_groupby_sum(ds, "k", ["v"], salt=8).to_pandas().set_index("k")

    import pandas as pd

    expected = (
        t.to_pandas().groupby("k").agg(n=("v", "size"), sum_v=("v", "sum"))
    )
    assert sorted(out.index) == sorted(expected.index)
    for k in expected.index:
        assert out.loc[k, "n"] == expected.loc[k, "n"]
        np.testing.assert_allclose(out.loc[k, "sum_v"], expected.loc[k, "sum_v"])


def test_skewed_key_stats_on_image_table():
    from mtb_validation_service_ray.sources.fixtures import make_image_rows

    t = make_image_rows(0, 2000, seed=5, total=2000)
    stats = skewed_key_stats(
        rd.from_arrow(t.select(["fmt", "w", "h"])), key="fmt"
    ).to_pandas().set_index("fmt")
    # fmt skew: png ≈ 90%
    assert stats.loc["png", "n"] > 0.8 * 2000
    assert set(stats.index) <= {"png", "raw", "lossy"}
    assert stats["n"].sum() == 2000
    pdf = t.to_pandas()
    for fmt in stats.index:
        np.testing.assert_allclose(
            stats.loc[fmt, "mean_w"],
            round(pdf[pdf.fmt == fmt].w.mean(), 4),
            atol=1e-4,
        )

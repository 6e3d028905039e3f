"""hash_split / cap_per_key / sliding_window_agg: deterministic
assignment, no-leakage invariants, and brute-force window references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from mtb_validation_service_ray.stages.split import (
    cap_per_key,
    hash_split,
    split_hash_u32,
)
from mtb_validation_service_ray.stages.windows import sliding_window_agg


def test_hash_split_deterministic_and_leak_free():
    keys = np.arange(1, 5001, dtype=np.int64)
    t = pa.table({"k": pa.array(np.repeat(keys, 2)),
                  "v": pa.array(np.arange(10000, dtype=np.float64))})
    out = hash_split(rd.from_arrow(t), key_col="k").to_pandas()
    # every row of a key lands in the same split (no leakage)
    per_key = out.groupby("k")["split"].nunique()
    assert (per_key == 1).all()
    # deterministic: a rerun yields the identical assignment
    out2 = hash_split(rd.from_arrow(t), key_col="k").to_pandas()
    a = out.sort_values(["k", "v"]).reset_index(drop=True)
    b = out2.sort_values(["k", "v"]).reset_index(drop=True)
    assert a.split.tolist() == b.split.tolist()
    # fractions roughly honored on distinct keys
    fr = out.drop_duplicates("k").split.value_counts(normalize=True)
    assert abs(fr.get("train", 0) - 0.9) < 0.03
    assert abs(fr.get("val", 0) - 0.05) < 0.02
    assert abs(fr.get("test", 0) - 0.05) < 0.02


def test_hash_split_salt_changes_assignment():
    keys = np.arange(2000, dtype=np.int64)
    t = pa.table({"k": pa.array(keys)})
    a = hash_split(rd.from_arrow(t), key_col="k", salt=0).to_pandas()
    b = hash_split(rd.from_arrow(t), key_col="k", salt=7).to_pandas()
    a = a.sort_values("k").reset_index(drop=True)
    b = b.sort_values("k").reset_index(drop=True)
    assert (a.split != b.split).any()


def test_split_hash_u32_matches_sql_formula():
    ks = np.array([0, 1, 17, 2**31, 2**40 + 3, 2**62], dtype=np.int64)
    got = split_hash_u32(ks)
    want = [((int(k) % 2**32) * 2654435761) % 2**32 for k in ks]
    assert got.tolist() == want
    got_s = split_hash_u32(ks, salt=9)
    want_s = [(((int(k) + 9) % 2**32) * 2654435761) % 2**32 for k in ks]
    assert got_s.tolist() == want_s


def test_cap_per_key_matches_pandas_reference():
    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "key": rng.integers(0, 200, n).astype(np.int64),
            "ord": rng.integers(0, 50, n).astype(np.int64),
        }
    )
    out = (
        cap_per_key(
            rd.from_pandas(df), key_col="key", n=3,
            order_cols=["ord", "id"], num_buckets=8,
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    ref = df.sort_values(["key", "ord", "id"], kind="stable")
    ref = ref[ref.groupby("key", sort=False).cumcount() < 3]
    ref = ref.sort_values("id").reset_index(drop=True)
    assert out.id.tolist() == ref.id.tolist()
    assert (out.groupby("key").size() <= 3).all()


def test_sliding_window_matches_brute_force():
    rng = np.random.default_rng(5)
    n = 3000
    base = pd.Timestamp("2024-03-01").value // 1000
    ts_us = base + rng.integers(0, 72 * 3600, n) * 1_000_000
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(ts_us, unit="us"),
            "g": rng.choice(["a", "b", "c"], n),
            "value": np.round(rng.uniform(0, 100, n), 2),
        }
    )
    size_us, slide_us = 4 * 3600 * 1_000_000, 3600 * 1_000_000
    out = (
        sliding_window_agg(
            rd.from_pandas(df), ts_col="ts", key_col="g",
            size_us=size_us, slide_us=slide_us, value_col="value",
        )
        .to_pandas().sort_values(["window_start", "g"]).reset_index(drop=True)
    )
    # brute force: explode each event into its k windows
    k = size_us // slide_us
    t = df.ts.astype("int64").to_numpy() // 1000  # ns → us
    rows = []
    for j in range(k):
        w = (t // slide_us - j) * slide_us
        rows.append(pd.DataFrame({"w": w, "g": df.g, "v": df.value}))
    ex = pd.concat(rows)
    ref = (
        ex.groupby(["w", "g"])
        .agg(n_events=("v", "size"), sum_value=("v", "sum"),
             min_value=("v", "min"), max_value=("v", "max"))
        .reset_index()
    )
    ref["w"] = pd.to_datetime(ref.w, unit="us")
    ref = ref.sort_values(["w", "g"]).reset_index(drop=True)
    assert len(out) == len(ref)
    assert out.window_start.tolist() == ref.w.tolist()
    assert out.g.tolist() == ref.g.tolist()
    assert out.n_events.tolist() == ref.n_events.tolist()
    np.testing.assert_allclose(out.sum_value, ref.sum_value, atol=1e-6)
    np.testing.assert_allclose(out.min_value, ref.min_value, atol=0)
    np.testing.assert_allclose(out.max_value, ref.max_value, atol=0)
    np.testing.assert_allclose(
        out.avg_value, ref.sum_value / ref.n_events, atol=1e-9
    )


def test_sliding_window_unkeyed_and_size_validation():
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:10", "2024-01-01 01:20", "2024-01-01 01:40"]
            ),
            "value": [1.0, 2.0, 3.0],
        }
    )
    out = (
        sliding_window_agg(
            rd.from_pandas(df), ts_col="ts", key_col=None,
            size_us=2 * 3600 * 1_000_000, slide_us=3600 * 1_000_000,
            value_col="value",
        )
        .to_pandas().sort_values("window_start").reset_index(drop=True)
    )
    # windows: 23:00(evt1), 00:00(evt1+2+3), 01:00(evt2+3)
    assert out.n_events.tolist() == [1, 3, 2]
    np.testing.assert_allclose(out.sum_value, [1.0, 6.0, 5.0])
    import pytest

    with pytest.raises(ValueError):
        sliding_window_agg(
            rd.from_pandas(df), ts_col="ts", size_us=5, slide_us=2,
            value_col="value",
        )


def test_hash_sample_deterministic_and_unbiased():
    keys = np.arange(20000, dtype=np.int64)
    t = pa.table({"k": pa.array(keys)})
    from mtb_validation_service_ray.stages.split import hash_sample

    a = hash_sample(rd.from_arrow(t), key_col="k", fraction=0.2).to_pandas()
    b = hash_sample(rd.from_arrow(t), key_col="k", fraction=0.2).to_pandas()
    assert sorted(a.k) == sorted(b.k)  # rerun-stable
    assert abs(len(a) / len(keys) - 0.2) < 0.02
    # nested property: a smaller fraction is a subset of a larger one
    c = hash_sample(rd.from_arrow(t), key_col="k", fraction=0.05).to_pandas()
    assert set(c.k) <= set(a.k)
    import pytest

    with pytest.raises(ValueError):
        hash_sample(rd.from_arrow(t), key_col="k", fraction=1.5)


def test_rolling_window_matches_pandas_reference():
    from mtb_validation_service_ray.stages.windows import (
        rolling_window_per_key,
    )

    rng = np.random.default_rng(3)
    n = 3000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "key": rng.integers(0, 100, n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 10**6, n), unit="s", origin="2024-01-01"
            ),
            "v": np.round(rng.uniform(0, 10, n), 2),
        }
    )
    out = (
        rolling_window_per_key(
            rd.from_pandas(df), key_col="key", ts_col="ts", value_col="v",
            window_rows=4, tiebreak_col="id", num_buckets=8,
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    ref = df.sort_values(["key", "ts", "id"], kind="stable")
    r = ref.groupby("key", sort=False)["v"].rolling(4, min_periods=1)
    ref = ref.assign(
        roll_n=r.count().to_numpy().astype("int64"),
        roll_sum=r.sum().to_numpy(),
    ).sort_values("id").reset_index(drop=True)
    assert out.roll_n.tolist() == ref.roll_n.tolist()
    np.testing.assert_allclose(out.roll_sum, ref.roll_sum, atol=1e-9)


def test_grouped_quantiles_rank_selection():
    from mtb_validation_service_ray.stages.stats import grouped_quantiles

    df = pd.DataFrame(
        {
            "g": ["a"] * 7 + ["b"] * 4,
            "v": [5.0, 1.0, 3.0, 2.0, 4.0, 7.0, 6.0, 10.0, 40.0, 20.0, 30.0],
        }
    )
    out = (
        grouped_quantiles(
            rd.from_pandas(df), key_col="g", value_col="v",
            qs=(0.25, 0.5, 0.75),
        )
        .to_pandas().sort_values(["g", "q"]).reset_index(drop=True)
    )
    # g=a sorted 1..7: ranks ceil(q*7) = 2,4,6 -> 2,4,6
    # g=b sorted 10,20,30,40: ranks 1,2,3 -> 10,20,30
    assert out.value.tolist() == [2.0, 4.0, 6.0, 10.0, 20.0, 30.0]


def test_pivot_counts_wide_schema_and_values():
    from mtb_validation_service_ray.stages.stats import pivot_counts

    rng = np.random.default_rng(9)
    n = 5000
    cats = ["x", "y", "z"]
    df = pd.DataFrame(
        {
            "key": rng.integers(0, 300, n).astype(np.int64),
            "cat": rng.choice(cats + ["other"], n),  # unknown cat dropped
        }
    )
    out = (
        pivot_counts(
            rd.from_pandas(df), key_col="key", pivot_col="cat",
            categories=cats,
        )
        .to_pandas().sort_values("key").reset_index(drop=True)
    )
    ref = (
        df[df.cat.isin(cats)]
        .pivot_table(index="key", columns="cat", aggfunc="size", fill_value=0)
        .reindex(columns=cats, fill_value=0)
    )
    # keys with ONLY "other" rows don't appear — align on out's keys
    assert set(out.columns) == {"key", "n_x", "n_y", "n_z"}
    ref = ref.loc[out.key]
    for c in cats:
        assert out[f"n_{c}"].tolist() == ref[c].tolist()


def test_top_terms_counts():
    from mtb_validation_service_ray.stages.vocab import top_terms

    docs = pa.table(
        {
            "text": pa.array(
                ["the cat sat", "the CAT  ran", None, "", "dog the"],
                pa.string(),
            )
        }
    )
    out = top_terms(rd.from_arrow(docs), text_col="text", k=3)
    d = dict(zip(out.column("term").to_pylist(), out.column("n").to_pylist()))
    assert d == {"the": 3, "cat": 2, "dog": 1} or list(d)[0] == "the"
    assert out.column("term").to_pylist()[0] == "the"
    assert out.column("n").to_pylist()[0] == 3


def test_stratified_sample_exact_n_and_deterministic():
    from mtb_validation_service_ray.stages.split import (
        split_hash_u32,
        stratified_sample,
    )

    rng = np.random.default_rng(21)
    n = 3000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "g": rng.choice(["a", "b", "c", "rare"], n, p=[0.4, 0.4, 0.199, 0.001]),
        }
    )
    out = (
        stratified_sample(
            rd.from_pandas(df), key_col="g", n=10, id_col="id", num_buckets=8
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    sizes = out.groupby("g").size()
    full = df.groupby("g").size()
    for g in full.index:
        assert sizes.get(g, 0) == min(10, full[g])
    # selection = the n smallest hashes per group (ties by id)
    h = split_hash_u32(df.id.to_numpy())
    ref = df.assign(_h=h.astype(np.int64)).sort_values(["g", "_h", "id"])
    ref = ref[ref.groupby("g", sort=False).cumcount() < 10]
    assert sorted(out.id) == sorted(ref.id)
    assert "_h" not in out.columns


def test_term_doc_stats_and_top_term():
    from mtb_validation_service_ray.stages.vocab import (
        doc_top_term,
        term_doc_stats,
    )

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "apple banana apple",
                    "banana cherry",
                    "apple  Apple APPLE zebra",
                    None,
                ],
                pa.string(),
            ),
        }
    )
    stats = (
        term_doc_stats(rd.from_arrow(docs), num_buckets=4)
        .to_pandas().sort_values(["doc_id", "term"]).reset_index(drop=True)
    )
    got = {
        (r.doc_id, r.term): (r.tf, r.df) for r in stats.itertuples()
    }
    assert got[(1, "apple")] == (2, 2)   # in docs 1 and 3
    assert got[(1, "banana")] == (1, 2)  # in docs 1 and 2
    assert got[(3, "apple")] == (3, 2)   # case-folded
    assert got[(3, "zebra")] == (1, 1)
    assert (4 not in stats.doc_id.values)  # null text → no terms
    top = (
        doc_top_term(rd.from_arrow(docs))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # doc1: apple tf=2; doc2: tf tie (banana df=2, cherry df=1) → cherry
    # (rarer wins); doc3: apple tf=3
    assert top.doc_id.tolist() == [1, 2, 3]
    assert top.term.tolist() == ["apple", "cherry", "apple"]


def test_null_keys_survive_capping_splitting_windows():
    """Review r4: null keys must form their own group everywhere, never
    be dropped, misattributed, or crash."""
    from mtb_validation_service_ray.stages.split import hash_sample
    from mtb_validation_service_ray.stages.windows import (
        rolling_window_per_key,
    )

    # cap_per_key: null keys capped as ONE group, not deleted
    df = pd.DataFrame(
        {
            "id": np.arange(8, dtype=np.int64),
            "key": pd.array([1, 1, 1, None, None, None, None, 2],
                            dtype="Int64"),
        }
    )
    out = cap_per_key(
        rd.from_pandas(df), key_col="key", n=2, order_cols=["id"],
        num_buckets=4,
    ).to_pandas()
    null_rows = out[out.key.isna()]
    assert len(null_rows) == 2 and sorted(null_rows.id) == [3, 4]
    assert len(out) == 5  # 2 + 2 + 1

    # hash_split: null keys deterministically land in the LAST band
    hs = hash_split(rd.from_pandas(df), key_col="key").to_pandas()
    assert (hs[hs.key.isna()].split == "test").all()
    # hash_sample: null keys never sampled below fraction 1
    smp = hash_sample(rd.from_pandas(df), key_col="key", fraction=0.5)
    assert smp.to_pandas().key.notna().all()

    # sliding windows: null keys get their own window rows, and other
    # keys' aggregates are unchanged by their presence
    ev = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:10"] * 3 + ["2024-01-01 01:10"]
            ),
            "g": pd.array(["A", "B", None, None], dtype="object"),
            "value": [1.0, 2.0, 4.0, 8.0],
        }
    )
    sw = (
        sliding_window_agg(
            rd.from_pandas(ev), ts_col="ts", key_col="g",
            size_us=2 * 3600 * 1_000_000, slide_us=3600 * 1_000_000,
            value_col="value",
        )
        .to_pandas()
    )
    a = sw[sw.g == "A"]
    assert a.sum_value.sum() == 2.0  # 1.0 in each of its 2 windows
    nul = sw[sw.g.isna()]
    assert len(nul) == 3  # 00:00 window (4), 01:00 (4+8), 23:00(4)... plus 01:00-only 8
    # the 01:00 window holds both null-key events
    assert 12.0 in nul.sum_value.tolist()

    # rolling windows: null keys roll as one partition, no crash
    rw = (
        rolling_window_per_key(
            rd.from_pandas(
                pd.DataFrame(
                    {
                        "id": np.arange(4, dtype=np.int64),
                        "k": pd.array([1, None, None, 1], dtype="Int64"),
                        "ts": pd.to_datetime(
                            ["2024-01-01", "2024-01-02", "2024-01-03",
                             "2024-01-04"]
                        ),
                        "v": [1.0, 2.0, 3.0, 4.0],
                    }
                )
            ),
            key_col="k", ts_col="ts", value_col="v", window_rows=2,
            tiebreak_col="id", num_buckets=4,
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert rw.roll_sum.tolist() == [1.0, 2.0, 5.0, 5.0]


def test_asof_forward_tiebreak_and_f64_guard():
    import pytest

    from mtb_validation_service_ray.stages.joins import asof_join

    left = pa.table(
        {
            "eid": pa.array([1], pa.int64()),
            "k": pa.array([10], pa.int64()),
            "ts": pa.array(pd.to_datetime(["2024-01-02"])),
        }
    )
    right = pa.table(
        {
            "k2": pa.array([10, 10], pa.int64()),
            "ts2": pa.array(pd.to_datetime(["2024-01-05", "2024-01-05"])),
            "ver": pa.array([1, 2], pa.int64()),
        }
    )
    out = asof_join(
        rd.from_arrow(left), rd.from_arrow(right),
        key=("k", "k2"), ts=("ts", "ts2"), right_payload=["ver"],
        direction="forward", tiebreak="ver", num_buckets=2,
    ).to_pandas()
    assert out.ver.tolist() == [2]  # max tiebreak, not first-sorted

    big = pa.table(
        {
            "eid": pa.array([(1 << 53) + 3], pa.int64()),
            "k": pa.array([10], pa.int64()),
            "ts": pa.array(pd.to_datetime(["2024-01-02"])),
        }
    )
    with pytest.raises(Exception, match="2\\^53"):
        asof_join(
            rd.from_arrow(big), rd.from_arrow(right),
            key=("k", "k2"), ts=("ts", "ts2"), right_payload=["ver"],
            num_buckets=2,
        ).to_pandas()


def test_interval_join_zero_length_and_empty_intervals():
    from mtb_validation_service_ray.stages.joins import interval_join

    pts = pa.table(
        {
            "pid": pa.array([1, 2], pa.int64()),
            "ts": pa.array(pd.to_datetime(["2024-01-01", "2024-02-01"])),
        }
    )
    # all zero-length intervals: must not degrade to per-point slabs,
    # and closed="both" matches the instant exactly
    iv = pa.table(
        {
            "s": pa.array(pd.to_datetime(["2024-01-01", "2024-03-01"])),
            "e": pa.array(pd.to_datetime(["2024-01-01", "2024-03-01"])),
            "tag": pa.array(["a", "b"], pa.string()),
        }
    )
    out = interval_join(
        rd.from_arrow(pts), rd.from_arrow(iv),
        ts="ts", bounds=("s", "e"), payload=["tag"], closed="both",
        num_buckets=2,
    ).to_pandas()
    assert out.pid.tolist() == [1] and out.tag.tolist() == ["a"]

    # empty interval side: typed empty result, not a crash (Ray drops
    # 0-row blocks in to_pandas, so assert the schema on the Dataset)
    empty_iv = iv.slice(0, 0)
    out2 = interval_join(
        rd.from_arrow(pts), rd.from_arrow(empty_iv),
        ts="ts", bounds=("s", "e"), payload=["tag"], num_buckets=2,
    )
    assert out2.count() == 0
    assert set(out2.schema().names) == {"pid", "ts", "tag"}


def test_cms_top_terms_one_sided_and_matches_exact():
    """CMS estimates never undercount; with ample width the top-k
    matches the exact twin term-for-term; with a starved width the
    overestimate stays within the e/width bound."""
    import pyarrow as pa

    from mtb_validation_service_ray.stages.vocab import cms_top_terms, top_terms

    rng = __import__("numpy").random.default_rng(3)
    words = [f"w{i}" for i in range(300)]
    probs = rng.dirichlet(__import__("numpy").ones(300) * 0.2)
    docs = pa.table({
        "text": [
            " ".join(rng.choice(words, 30, p=probs)) for _ in range(400)
        ]
    })
    ds = rd.from_arrow(docs)
    exact = top_terms(rd.from_arrow(docs), k=10)
    approx = cms_top_terms(ds, k=10, width=1 << 14, depth=4)
    assert exact.column("term").to_pylist() == approx.column("term").to_pylist()
    assert exact.column("n").to_pylist() == approx.column("n_est").to_pylist()

    # starved sketch: estimates are >= truth and within e/width * total
    total = 400 * 30
    tight = cms_top_terms(rd.from_arrow(docs), k=10, width=256, depth=4)
    ex = dict(zip(exact.column("term").to_pylist(), exact.column("n").to_pylist()))
    import math

    bound = math.e / 256 * total
    for t, n_est in zip(
        tight.column("term").to_pylist(), tight.column("n_est").to_pylist()
    ):
        if t in ex:
            assert n_est >= ex[t]
            assert n_est <= ex[t] + 4 * bound  # loose multi-probe slack


def test_cms_merge_equals_single_sketch():
    import numpy as np

    from mtb_validation_service_ray.functions.sketches import CountMinSketch

    a, b, whole = (CountMinSketch(512, 3) for _ in range(3))
    v1 = np.array(["x", "y", "z"], dtype=object)
    v2 = np.array(["y", "q"], dtype=object)
    a.add(v1, np.array([5, 2, 1])); b.add(v2, np.array([7, 4]))
    whole.add(v1, np.array([5, 2, 1])); whole.add(v2, np.array([7, 4]))
    m = a.merge(b)
    assert (m.counts == whole.counts).all()
    assert m.estimate(np.array(["y"], dtype=object))[0] >= 9


def test_ranked_window_per_key_nulls_and_order():
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from mtb_validation_service_ray.stages.windows import ranked_window_per_key

    t = pa.table({
        "k": pa.array([1, 1, None, 2, 1, None], pa.int64()),
        "ts": pa.array([3, 1, 5, 2, 1, 4], pa.int64()),
        "tie": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50, 60], pa.int64()),
    })
    out = (
        ranked_window_per_key(
            rd.from_arrow(t), key_col="k", ts_col="ts", value_col="v",
            tiebreak_col="tie", num_buckets=3,
        )
        .to_pandas()
        .sort_values(["ts", "tie"])
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    df = df.sort_values(["k", "ts", "tie"]).reset_index(drop=True)
    gb = df.groupby("k", sort=False, dropna=False)
    df["row_num"] = (gb.cumcount() + 1).astype("int64")
    df["run_sum"] = gb.v.cumsum()
    df = df.sort_values(["ts", "tie"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["k", "ts", "tie", "v", "row_num", "run_sum"]].astype(
            {"run_sum": "int64"}
        ),
        df[["k", "ts", "tie", "v", "row_num", "run_sum"]].astype(
            {"run_sum": "int64"}
        ),
        check_dtype=False,
    )
    # null keys ranked as their own partition
    nulls = out[out.k.isna()].sort_values("ts")
    assert nulls.row_num.tolist() == [1, 2]


def test_bottomk_sample_exact_n_deterministic_and_stable():
    """Bottom-k: exact n rows, rerun-identical, block-layout-invariant,
    and a superset relation — bottom-(n) ⊂ bottom-(n+m)."""
    import numpy as np
    import pyarrow as pa

    from mtb_validation_service_ray.stages.split import bottomk_sample

    rng = np.random.default_rng(9)
    keys = rng.permutation(10_000).astype(np.int64)
    t = pa.table({"k": pa.array(keys), "v": pa.array(np.arange(10_000))})

    s1 = bottomk_sample(rd.from_arrow(t), key_col="k", n=100)
    s2 = bottomk_sample(
        rd.from_arrow(t).repartition(7), key_col="k", n=100
    )
    assert s1.num_rows == 100
    k1 = sorted(s1.column("k").to_pylist())
    assert k1 == sorted(s2.column("k").to_pylist())

    s3 = bottomk_sample(rd.from_arrow(t), key_col="k", n=250)
    assert set(k1) <= set(s3.column("k").to_pylist())

    # a different salt reshuffles the selection
    s4 = bottomk_sample(rd.from_arrow(t), key_col="k", n=100, salt=1)
    assert set(k1) != set(s4.column("k").to_pylist())

    # null keys never sampled while enough non-null keys exist
    tn = pa.table({
        "k": pa.array([1, 2, None, 3, None], pa.int64()),
        "v": pa.array(range(5)),
    })
    sn = bottomk_sample(rd.from_arrow(tn), key_col="k", n=3)
    assert sorted(sn.column("k").to_pylist()) == [1, 2, 3]


def test_ntile_per_key_sql_remainder_semantics():
    import numpy as np
    import pyarrow as pa

    from mtb_validation_service_ray.stages.windows import ntile_per_key

    # key a: 7 rows over 3 tiles -> sizes 3,2,2; key b: 2 rows over 3
    # tiles -> sizes 1,1 (tile 3 empty); null key: own partition
    t = pa.table({
        "k": pa.array([1] * 7 + [2] * 2 + [None], pa.int64()),
        "ts": pa.array(list(range(7)) + [0, 1] + [0], pa.int64()),
        "tie": pa.array(range(10), pa.int64()),
    })
    out = (
        ntile_per_key(
            rd.from_arrow(t), key_col="k", ts_col="ts", n_tiles=3,
            tiebreak_col="tie", num_buckets=2,
        )
        .to_pandas()
    )
    a = out[out.k == 1].sort_values("ts").tile.tolist()
    assert a == [1, 1, 1, 2, 2, 3, 3]
    b = out[out.k == 2].sort_values("ts").tile.tolist()
    assert b == [1, 2]
    assert out[out.k.isna()].tile.tolist() == [1]


def test_lag_lead_per_key_edges():
    import numpy as np
    import pyarrow as pa

    from mtb_validation_service_ray.stages.windows import lag_lead_per_key

    t = pa.table({
        "k": pa.array([1, 1, 1, 2, None], pa.int64()),
        "ts": pa.array([10, 30, 20, 5, 7], pa.int64()),
        "tie": pa.array(range(5), pa.int64()),
        "v": pa.array([100, 300, 200, 50, 70], pa.int64()),
    })
    out = (
        lag_lead_per_key(
            rd.from_arrow(t), key_col="k", ts_col="ts", value_col="v",
            tiebreak_col="tie", num_buckets=2,
        )
        .to_pandas()
        .sort_values(["ts", "tie"])
    )
    k1 = out[out.k == 1].sort_values("ts")
    assert k1.lag_value.fillna(-1).tolist() == [-1, 100, 200]
    assert k1.lead_value.fillna(-1).tolist() == [200, 300, -1]
    assert k1.delta_us.fillna(-1).tolist() == [-1, 10, 10]
    # singleton and null-key partitions: all edges null
    assert out[out.k == 2].lag_value.isna().all()
    assert out[out.k.isna()].lead_value.isna().all()


def test_percent_rank_ties_and_singleton():
    """SQL tie semantics: tied values share the MIN rank for
    percent_rank and the MAX rank for cume_dist; a singleton key gets
    pr=0, cd=1; null key/value rows are excluded."""
    from mtb_validation_service_ray.stages.windows import percent_rank_per_key

    t = pa.table({
        "k": pa.array(["a"] * 4 + ["b", None, "a"], pa.string()),
        "v": pa.array([1.0, 2.0, 2.0, 4.0, 9.0, 1.0, None], pa.float64()),
    })
    out = (
        percent_rank_per_key(rd.from_arrow(t), key_col="k", value_col="v",
                             num_buckets=3)
        .to_pandas()
    )
    assert len(out) == 5  # null key + null value rows dropped
    a = out[out.k == "a"].sort_values("v")
    # values [1,2,2,4]: ranks min [1,2,2,4], max [1,3,3,4], n=4
    assert np.allclose(a.pr.to_numpy(), [0.0, 1/3, 1/3, 1.0])
    assert np.allclose(a.cd.to_numpy(), [0.25, 0.75, 0.75, 1.0])
    b = out[out.k == "b"]
    assert b.pr.tolist() == [0.0] and b.cd.tolist() == [1.0]


def test_argmax_row_per_key_keeps_full_row_and_tiebreak():
    """The winning key row carries ALL payload columns; equal
    timestamps resolve by the tiebreak column; layout-invariant."""
    from mtb_validation_service_ray.stages.windows import argmax_row_per_key

    base = np.datetime64("2024-01-01", "us")
    t = pa.table({
        "eid": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "k": pa.array([7, 7, 7, None, 8, 8], pa.int64()),
        "ts": pa.array([base, base + np.timedelta64(5, "s"),
                        base + np.timedelta64(5, "s"), base, base, None]),
        "payload": pa.array(["p1", "p2", "p3", "p4", "p5", "p6"]),
    })
    for parts in (1, 4):
        out = (
            argmax_row_per_key(
                rd.from_arrow(t).repartition(parts), key_col="k",
                order_col="ts", tiebreak_col="eid", num_buckets=3,
            )
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        # key 7: ts ties at +5s -> eid 3 wins; key 8: null ts dropped
        assert out.eid.tolist() == [3, 5]
        assert out.payload.tolist() == ["p3", "p5"]
        assert out.k.tolist() == [7, 8]  # null key excluded


def test_mode_per_key_tie_and_nulls():
    from mtb_validation_service_ray.stages.windows import mode_per_key

    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 2, 2, None, 2], pa.int64()),
        "v": pa.array(["b", "a", "b", "a", "x", None, "y", "x"], pa.string()),
    })
    out = (
        mode_per_key(rd.from_arrow(t).repartition(3), key_col="k",
                     value_col="v", num_buckets=3)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    # key 1: a=2, b=2 tie -> smallest value "a"; key 2: x=2 (null v dropped)
    assert out.k.tolist() == [1, 2]
    assert out.mode_value.tolist() == ["a", "x"]
    assert out.n.tolist() == [2, 2]


def test_transition_counts_vs_brute():
    from mtb_validation_service_ray.stages.windows import transition_counts

    rng = np.random.default_rng(4)
    n = 2000
    base = np.datetime64("2024-01-01", "us")
    users = rng.integers(0, 40, n)
    states = rng.choice(["a", "b", "c"], n)
    ts = base + rng.integers(0, 10**6, n).astype("timedelta64[us]")
    t = pa.table({
        "eid": pa.array(range(n), pa.int64()),
        "u": pa.array(users, pa.int64()),
        "s": pa.array(states, pa.string()),
        "ts": pa.array(ts),
    })
    out = (
        transition_counts(
            rd.from_arrow(t).repartition(5), key_col="u", state_col="s",
            ts_col="ts", tiebreak_col="eid", num_buckets=4,
        )
        .to_pandas().set_index(["from_state", "to_state"]).n.to_dict()
    )
    # brute force
    import collections
    df = t.to_pandas().sort_values(["u", "ts", "eid"])
    exp = collections.Counter()
    for _, g in df.groupby("u"):
        s = g.s.tolist()
        for a, b in zip(s, s[1:]):
            exp[(a, b)] += 1
    assert out == dict(exp)


def test_topk_rows_per_key_matches_window():
    from mtb_validation_service_ray.stages.windows import topk_rows_per_key

    rng = np.random.default_rng(11)
    n = 1000
    t = pa.table({
        "eid": pa.array(range(n), pa.int64()),
        "k": pa.array(rng.integers(0, 30, n), pa.int64()),
        "v": pa.array(rng.integers(0, 50, n).astype("float64")),
    })
    out = (
        topk_rows_per_key(
            rd.from_arrow(t).repartition(5), key_col="k", order_col="v",
            k=3, tiebreak_col="eid", num_buckets=4,
        )
        .to_pandas().sort_values(["k", "rank"]).reset_index(drop=True)
    )
    df = t.to_pandas().sort_values(["v", "eid"], ascending=False)
    exp = df.groupby("k", sort=False).head(3)
    exp = exp.assign(rank=exp.groupby("k", sort=False).cumcount() + 1)
    exp = exp.sort_values(["k", "rank"]).reset_index(drop=True)
    assert out.eid.tolist() == exp.eid.tolist()
    assert out["rank"].tolist() == exp["rank"].tolist()


def test_funnel_counts_vs_brute():
    from mtb_validation_service_ray.stages.windows import funnel_counts

    rng = np.random.default_rng(13)
    n = 3000
    base = np.datetime64("2024-01-01", "us")
    t = pa.table({
        "u": pa.array(rng.integers(0, 60, n), pa.int64()),
        "et": pa.array(rng.choice(["a", "b", "c", "x"], n), pa.string()),
        "ts": pa.array(base + rng.integers(0, 10**6, n).astype("timedelta64[us]")),
    })
    steps = ["a", "b", "c"]
    out = (
        funnel_counts(
            rd.from_arrow(t).repartition(5), key_col="u", type_col="et",
            ts_col="ts", steps=steps, num_buckets=4,
        )
        .to_pandas().set_index("step").n_users.to_dict()
    )
    df = t.to_pandas()
    exp = [0, 0, 0]
    for _, g in df.groupby("u"):
        prev = None
        for i, s in enumerate(steps):
            cand = g[(g.et == s) & ((g.ts > prev) if prev is not None else True)]
            if len(cand) == 0:
                break
            prev = cand.ts.min()
            exp[i] += 1
    assert out == {1: exp[0], 2: exp[1], 3: exp[2]}, (out, exp)


def test_string_agg_per_key_modes():
    from mtb_validation_service_ray.stages.windows import string_agg_per_key

    t = pa.table({
        "k": pa.array(["a", "a", "a", "b", None, "b"], pa.string()),
        "v": pa.array(["z", "x", "x", "q", "m", None], pa.string()),
    })
    # keep duplicates: ordered concat includes both x's
    out = (
        string_agg_per_key(rd.from_arrow(t), key_col="k", value_col="v",
                           num_buckets=3)
        .to_pandas().set_index("k")
    )
    assert out.loc["a", "agg"] == "x,x,z" and out.loc["a", "n"] == 3
    assert out.loc["b", "agg"] == "q"  # null value and null key dropped
    assert len(out) == 2
    # distinct mode: duplicates collapse
    out2 = (
        string_agg_per_key(rd.from_arrow(t), key_col="k", value_col="v",
                           distinct=True, num_buckets=3)
        .to_pandas().set_index("k")
    )
    assert out2.loc["a", "agg"] == "x,z" and out2.loc["a", "n"] == 2

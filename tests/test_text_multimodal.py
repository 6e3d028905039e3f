"""Text-analysis kernels + multimodal stage plumbing tests."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from mtb_validation_service_ray.functions import codec
from mtb_validation_service_ray.functions.textfn import (
    detect_language,
    fingerprint64,
    quality_counts,
    quality_score,
    token_counts,
)
from mtb_validation_service_ray.sources.fixtures import make_image_rows
from mtb_validation_service_ray.stages.multimodal import (
    ImageFeatureStage,
    ImageResizeStage,
    image_features,
    resize_images,
)
from mtb_validation_service_ray.stages.windows import (
    latest_event_per_key,
    session_windows,
    tumbling_window_agg,
)


def test_token_and_quality_counts():
    col = pa.array(["Hello world, 42 times!", "", None, "  a  b  "])
    assert token_counts(col).to_pylist() == [4, 0, 0, 2]
    q = quality_counts(col)
    assert q["n_chars"].to_pylist() == [22, 0, 0, 8]
    assert q["n_alpha"].to_pylist() == [15, 0, 0, 2]
    assert q["n_digit"].to_pylist() == [2, 0, 0, 0]
    assert q["n_punct"].to_pylist() == [2, 0, 0, 0]
    scores = quality_score(col).to_pylist()
    assert all(0.0 <= s <= 1.0 for s in scores)
    assert scores[0] > scores[1]


def test_language_id_heuristic():
    col = pa.array(
        [
            "the cat and the dog sat in the garden for a while",
            "der hund und die katze sind nicht in dem haus",
            "le chat est dans la maison et les oiseaux",
            "el perro y el gato en la casa por una hora",
            "这是一个中文句子关于数据处理",
            "zzz qqq xxx",
        ]
    )
    assert detect_language(col).to_pylist() == ["en", "de", "fr", "es", "zh", "und"]


def test_token_repetition_ratio():
    from mtb_validation_service_ray.functions.textfn import (
        token_repetition_ratio,
    )

    col = pa.array(
        [
            "a b c d",          # all distinct
            "a a a a",          # one distinct of four
            "A a  B b",         # case/extra-space insensitive → 0.5
            "solo",             # single token
            "",                 # no tokens
            None,               # null
            "x y x y x",        # 2 distinct of 5
        ]
    )
    got = token_repetition_ratio(col).to_pylist()
    assert got == [0.0, 0.75, 0.5, 0.0, 0.0, 0.0, 0.6]
    # brute-force agreement on a random batch
    rng = np.random.default_rng(2)
    texts = [
        " ".join(rng.choice(["p", "q", "r", "s"], rng.integers(1, 12)))
        for _ in range(50)
    ]
    got = token_repetition_ratio(pa.array(texts)).to_pylist()
    expect = [
        1.0 - len(set(t.split())) / len(t.split()) for t in texts
    ]
    assert np.allclose(got, expect)


def test_fingerprint_normalizes_whitespace_and_case():
    col = pa.array(["Hello   World", "hello world", "hello  world ", "different"])
    f = fingerprint64(col).to_pylist()
    assert f[0] == f[1]
    # trailing space normalizes to a distinct string (" " suffix kept)
    assert f[0] != f[3]


def test_image_feature_stage_plumbing():
    t = make_image_rows(0, 30, seed=3, total=30)
    out = image_features(rd.from_arrow(t), concurrency=1, batch_size=10).to_pandas()
    assert len(out) == 30
    dims = {len(e) for e in out.embedding}
    assert dims == {ImageFeatureStage.FEATURE_DIM}
    # deterministic: same input → same features
    again = image_features(rd.from_arrow(t), concurrency=1, batch_size=10).to_pandas()
    a = np.vstack(out.sort_values("image_id").embedding.to_numpy())
    b = np.vstack(again.sort_values("image_id").embedding.to_numpy())
    np.testing.assert_array_equal(a, b)


def test_image_resize_stage():
    t = make_image_rows(0, 12, seed=4, total=12)
    out = resize_images(rd.from_arrow(t), out_w=16, out_h=16, concurrency=1).to_pandas()
    assert (out.w == 16).all() and (out.h == 16).all()
    px = codec.decode(out.bytes.iloc[0], "png", 16, 16)
    assert px.shape == (16, 16, 3)


def test_external_codec_is_cleanly_stubbed():
    stage = ImageResizeStage()
    batch = pa.table(
        {
            "image_id": ["img-x"],
            "bytes": [b"\xff\xd8\xff\xe0fakejpeg"],
            "w": pa.array([8], pa.int32()),
            "h": pa.array([8], pa.int32()),
            "fmt": ["jpeg"],
        }
    )
    with pytest.raises(NotImplementedError, match="jpeg"):
        stage(batch)


def test_tumbling_window_and_argmax_and_sessions():
    import pandas as pd

    ts = pd.to_datetime(
        ["2026-01-01 10:00", "2026-01-01 10:30", "2026-01-01 13:00",
         "2026-01-02 09:00", "2026-01-02 09:10", "2026-01-01 11:00"]
    )
    t = pa.table(
        {
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "event_type": ["a", "a", "a", "a", "b", "b"],
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
        }
    )
    ds = rd.from_arrow(t)
    win = tumbling_window_agg(ds, key_col=None, window="day").to_pandas()
    assert sorted(win.n_events.tolist()) == [2, 4]
    assert win.set_index("window_start").sum_value.sum() == 21.0

    last = latest_event_per_key(ds).to_pandas().set_index("user_id")
    assert last.loc[1, "n_events"] == 4
    assert str(last.loc[1, "last_ts"]).startswith("2026-01-02 09:00")

    sess = session_windows(ds, gap_seconds=3600).to_pandas()
    u1 = sess[sess.user_id == 1]
    # user 1: (10:00,10:30) | (13:00) | (next day 09:00) → 3 sessions
    assert len(u1) == 3
    assert sorted(u1.n_events.tolist()) == [1, 1, 2]


def test_polyhash_utf8_property():
    """The Arrow-buffer polynomial hash must equal a per-string big-int
    reference (exactness of the prefix-sum + modular-inverse trick),
    agree across slicing/chunking/large_string layouts, and be
    injective on distinct short strings (hypothesis-driven)."""
    import numpy as np
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mtb_validation_service_ray.functions.textfn import (
        _BYTE_P,
        _LEN_MIX,
        _splitmix64,
        polyhash_utf8,
    )

    def ref_hash(s: str) -> int:
        b = s.encode("utf-8")
        P, M = int(_BYTE_P), 1 << 64
        poly = sum(c * pow(P, j, M) for j, c in enumerate(b)) % M
        x = poly ^ ((len(b) * int(_LEN_MIX)) % M)
        return int(_splitmix64(np.array([x], dtype=np.uint64))[0])

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.text(max_size=40), min_size=1, max_size=30))
    def check(strings):
        arr = pa.array(strings, pa.string())
        got = [int(x) for x in polyhash_utf8(arr)]
        assert got == [ref_hash(s) for s in strings]
        # layout invariance: slice, chunk, large_string
        if len(arr) > 2:
            sl = arr.slice(1, len(arr) - 2)
            assert [int(x) for x in polyhash_utf8(sl)] == got[1:-1]
        ch = pa.chunked_array([arr.slice(0, 1), arr.slice(1)])
        assert [int(x) for x in polyhash_utf8(ch)] == got
        assert [
            int(x) for x in polyhash_utf8(arr.cast(pa.large_string()))
        ] == got
        # equal strings hash equal; distinct strings distinct (64-bit
        # collisions at these sizes would be a bug, not bad luck)
        by_s = {}
        for s, h in zip(strings, got):
            assert by_s.setdefault(s, h) == h
        assert len(set(by_s.values())) == len(by_s)

    check()

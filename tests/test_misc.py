"""Catalogs, IO shim, property-based codec roundtrips, schema edges."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mtb_validation_service_ray.functions import codec
from mtb_validation_service_ray.sources import io as io_shim
from mtb_validation_service_ray.state.catalogs import (
    CAPTION_LANG_CATALOG,
    FMT_CATALOG,
    catalog_values,
    fmt_values,
)


def test_catalog_version_pinning_and_fallback():
    assert fmt_values("1.0") == frozenset({"raw", "png"})
    assert fmt_values("1.1") == frozenset({"raw", "png", "lossy"})
    # unknown version falls back to current (icdo3TCodingValidator
    # fallback semantics, MTBValidators.scala:136-145)
    assert fmt_values("9.9") == fmt_values(None) == FMT_CATALOG["1.1"]
    assert catalog_values(CAPTION_LANG_CATALOG, None, "1.0") == CAPTION_LANG_CATALOG["1.0"]


def test_io_shim_fragments_and_kind(tmp_path):
    assert io_shim.dataset_uri_kind(str(tmp_path)) == "parquet"
    import pyarrow as pa

    for i in range(3):
        pq.write_table(pa.table({"x": [i]}), os.path.join(tmp_path, f"f{i}.parquet"))
    frags = io_shim.list_fragments(str(tmp_path))
    assert len(frags) == 3 and all(f.endswith(".parquet") for f in frags)
    assert io_shim.list_fragments(frags[0]) == [frags[0]]


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=96),
    h=st.integers(min_value=1, max_value=96),
    fmt=st.sampled_from(codec.FORMATS),
    seed=st.text(alphabet="abcdef0123456789", min_size=1, max_size=8),
)
def test_codec_roundtrip_property(w, h, fmt, seed):
    """Any dims × any codec: sniffable, decodable, PSNR within budget,
    phash within the lossy hamming tolerance."""
    px = codec.pixels_for_id(seed, w, h)
    payload = codec.encode(px, fmt)
    assert codec.sniff_format(payload, w, h) == fmt
    decoded = codec.decode(payload, fmt, w, h)
    assert decoded.shape == (h, w, 3)
    if fmt == "lossy":
        assert codec.psnr(px, decoded) >= 40.0
        assert codec.hamming64(codec.phash(px), codec.phash(decoded)) <= 8
    else:
        assert np.array_equal(px, decoded)


def test_violations_table_builder_shapes():
    import pyarrow as pa

    from mtb_validation_service_ray.schema import VIOLATION_SCHEMA, violations_table

    t = violations_table(["a", "b"], "R", "error", "/x", "msg")
    assert t.schema == VIOLATION_SCHEMA and t.num_rows == 2
    t2 = violations_table(
        pa.array(["a"]), "R", "error", "/x", ["m1"], pa.array([3], pa.int64())
    )
    assert t2.column("partition_id").to_pylist() == [3]


def test_tail_either_head_exempt():
    """Sorted-tail positional rule (MTBValidators.scala:710-717 analog):
    the partition head (min image_id) may lack caption+phash; any tail
    row may not."""
    import pyarrow as pa
    import ray.data as rd

    from mtb_validation_service_ray.stages.positional import tail_either_violations

    t = pa.table(
        {
            "image_id": ["a1", "a2", "a3", "b1", "b2"],
            "caption": [None, None, "has caption", None, "x"],
            "phash": pa.array([None, None, None, None, 7], pa.int64()),
            "partition_id": pa.array([0, 0, 0, 1, 1], pa.int32()),
        }
    )
    out = tail_either_violations(rd.from_arrow(t)).to_pandas()
    # a1 is partition 0's head → exempt despite missing both; a2 fires;
    # b1 is partition 1's head → exempt; a3/b2 have a value → fine
    assert list(out.record_id) == ["a2"]
    assert list(out.rule_id) == ["R-TAIL-EITHER"]
    assert list(out.path) == ["/record/tail"]

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


def test_cardinality_guards():
    """R-CARD-PART / R-CARD-RATIO dataset-level count guards
    (collection non-empty + count inequality, MTBValidators.scala:699-733)."""
    import pyarrow as pa
    import ray.data as rd

    from mtb_validation_service_ray.stages.cardinality import (
        count_ratio_violations,
        partition_cardinality_violations,
    )

    t = pa.table(
        {
            "image_id": [f"i{k}" for k in range(6)],
            "partition_id": pa.array([0, 0, 0, 1, 1, 3], pa.int32()),
        }
    )
    out = partition_cardinality_violations(
        rd.from_arrow(t), expected_partitions=range(4), min_rows=2
    ).to_pandas()
    # partition 2 absent, partition 3 thin (1 < 2)
    assert list(out.record_id) == ["partition=2", "partition=3"]
    assert set(out.rule_id) == {"R-CARD-PART"}

    comp = pa.table(
        {
            "image_id": ["i0", "i3"],
            "partition_id": pa.array([0, 1], pa.int32()),
        }
    )
    out2 = count_ratio_violations(rd.from_arrow(t), rd.from_arrow(comp)).to_pandas()
    # p0: 1 companion for 3 primary; p1: 1 for 2; p3: 0 for 1 → all fire
    assert list(out2.record_id) == ["partition=0", "partition=1", "partition=3"]
    assert set(out2.rule_id) == {"R-CARD-RATIO"}


def test_run_job_partition_cardinality(tmp_path):
    """An expected-but-missing partition surfaces as R-CARD-PART through
    run_job's global phase."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from mtb_validation_service_ray.pipelines.job import run_job
    from mtb_validation_service_ray.sources.fixtures import make_image_rows

    t = make_image_rows(0, 200, seed=9, total=200, n_partitions=4)
    src = tmp_path / "imgs"
    src.mkdir()
    # drop partition 2 entirely
    kept = t.filter(pc.not_equal(t.column("partition_id"), 2))
    pq.write_table(kept, str(src / "part-0.parquet"))
    r = run_job(
        str(src), str(tmp_path / "out"), chunk_files=4,
        expected_partitions=range(4), with_stats=False, concurrency=1,
    )
    import pandas as pd

    v = pd.concat(
        [
            pq.read_table(str(p)).to_pandas()
            for p in (tmp_path / "out" / "violations" / "all").glob("*.parquet")
        ]
    )
    card = v[v.rule_id == "R-CARD-PART"]
    assert list(card.record_id) == ["partition=2"]


def test_verdicts_null_record_id_paths_agree():
    """A null image_id must form its own verdict group — the driver
    fast path previously aliased it onto the LAST factorized record
    (corrupting that record's verdict) via the factorize -1 sentinel."""
    import pyarrow as pa
    import ray.data as rd

    from mtb_validation_service_ray.pipelines.verdicts import verdicts_with_unique

    ids = rd.from_arrow(
        pa.table(
            {
                "image_id": pa.array(["a", None, "b", None], pa.string()),
                "partition_id": pa.array([0, 0, 1, 1], pa.int32()),
            }
        )
    )
    viol = rd.from_arrow(
        pa.table(
            {
                "record_id": pa.array([None], pa.string()),
                "rule_id": ["R-PR-ID"],
                "severity": ["error"],
                "path": ["/record/image_id"],
                "message": ["image_id is missing"],
                "partition_id": pa.array([0], pa.int32()),
            }
        )
    )
    outs = {}
    for strategy in ("driver", "shuffle"):
        v, uq = verdicts_with_unique(ids, viol, strategy=strategy)
        df = v.to_pandas().sort_values("record_id", na_position="last").reset_index(drop=True)
        outs[strategy] = df
        # 'a' and 'b' are clean singletons: verdict pass, no issues
        clean = df[df.record_id.isin(["a", "b"])]
        assert set(clean.verdict) == {"pass"}, (strategy, df)
        assert set(clean.n_issues) == {0}
        # the two null ids group together: duplicate + the error row
        null_row = df[df.record_id.isna()]
        assert len(null_row) == 1
        assert null_row.verdict.iloc[0] == "error"
        assert int(null_row.n_issues.iloc[0]) == 2  # R-PR-ID + R-UQ-ID
    assert outs["driver"].verdict.tolist() == outs["shuffle"].verdict.tolist()


def test_run_job_rechunk_resume_no_double_emit(tmp_path):
    """A crash window can orphan a chunk dir; a resume with DIFFERENT
    chunking must prune it instead of double-emitting its violations."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import pandas as pd

    from mtb_validation_service_ray.pipelines.job import run_job
    from mtb_validation_service_ray.sources.fixtures import corrupted_fixture

    c = corrupted_fixture(400, n_partitions=4)
    src = tmp_path / "imgs"
    src.mkdir()
    for pid in range(4):
        part = c.table.filter(pc.equal(c.table.column("partition_id"), pid))
        pq.write_table(part, str(src / f"part-{pid}.parquet"))
    out = str(tmp_path / "out")

    r1 = run_job(str(src), out, chunk_files=2, with_stats=False, concurrency=1)
    # simulate the crash window under the OLD chunking: drop every
    # manifest but keep all chunk dirs on disk
    import os, shutil

    mdir = os.path.join(out, "_manifests")
    for name in os.listdir(mdir):
        os.remove(os.path.join(mdir, name))
    # resume with DIFFERENT chunking → new chunk ids; stale dirs must go
    r2 = run_job(str(src), out, chunk_files=1, with_stats=False, concurrency=1)
    assert r2.n_violations == r1.n_violations
    v = pd.concat(
        [
            pq.read_table(os.path.join(out, "violations", "all", f)).to_pandas()
            for f in os.listdir(os.path.join(out, "violations", "all"))
            if f.endswith(".parquet")
        ]
    )
    # each golden violation appears exactly once
    per_rule = v.groupby(["record_id", "rule_id"]).size()
    assert (per_rule == 1).all(), per_rule[per_rule > 1]


def test_tail_either_distributed_gate_agrees_with_driver():
    """Adversarial input (EVERY row a candidate) must stay off the
    driver: the count gate switches to the broadcast-heads judge and
    both arms emit identical violations."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from mtb_validation_service_ray.schema import PARTITION_COL
    from mtb_validation_service_ray.stages.positional import (
        tail_either_violations,
    )

    n = 400
    t = pa.table(
        {
            "image_id": [f"img-{i:016x}" for i in range(n)],
            "caption": pa.nulls(n, pa.string()),
            "phash": pa.nulls(n, pa.int64()),
            PARTITION_COL: pa.array(
                (np.arange(n) % 5).astype("int32"), pa.int32()
            ),
        }
    )
    driver = (
        tail_either_violations(rd.from_arrow(t).repartition(4))
        .to_pandas().sort_values("record_id").reset_index(drop=True)
    )
    dist = (
        tail_either_violations(
            rd.from_arrow(t).repartition(4), driver_max_candidates=10
        )
        .to_pandas().sort_values("record_id").reset_index(drop=True)
    )
    # every partition's min id is exempt; all other rows violate
    assert len(driver) == n - 5
    assert driver.equals(dist)

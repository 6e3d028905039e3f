"""Resumable job tests: manifests, skip-on-resume, identical outputs
(FIXTURES.md §4 "Resume" invariant)."""

import os

import pyarrow.parquet as pq
import pytest

from mtb_validation_service_ray.pipelines import checkpoint as ckpt
from mtb_validation_service_ray.pipelines.job import run_job
from mtb_validation_service_ray.rules.registry import default_image_ruleset
from mtb_validation_service_ray.sources.fixtures import (
    annotations_table,
    corrupted_fixture,
)


@pytest.fixture(scope="module")
def input_dir(tmp_path_factory):
    """Corrupted fixture written as one parquet file per partition."""
    d = tmp_path_factory.mktemp("images")
    c = corrupted_fixture(800, n_partitions=4)
    import pyarrow.compute as pc

    for pid in range(4):
        part = c.table.filter(pc.equal(c.table.column("partition_id"), pid))
        pq.write_table(part, os.path.join(d, f"part-{pid:02d}.parquet"))
    return str(d), c


def _violations_df(out_dir):
    import pandas as pd

    vdir = os.path.join(out_dir, "violations", "all")
    frames = [
        pq.read_table(os.path.join(vdir, f)).to_pandas()
        for f in os.listdir(vdir)
        if f.endswith(".parquet")
    ]
    return (
        pd.concat(frames)[["record_id", "rule_id", "severity", "path"]]
        .sort_values(["record_id", "rule_id"])
        .reset_index(drop=True)
    )


def test_job_end_to_end_and_resume(tmp_path, input_dir):
    src, c = input_dir
    ann = annotations_table(c.table)
    out1 = str(tmp_path / "run1")

    r1 = run_job(src, out1, annotations=ann, chunk_files=2, concurrency=1)
    assert r1.chunks_run == 2 and r1.files_skipped == 0
    assert r1.n_records == c.table.num_rows - 1  # duplicate id collapses
    assert r1.n_violations == len(c.golden)
    assert r1.stats is not None
    assert os.path.exists(os.path.join(out1, "stats.parquet"))
    v1 = _violations_df(out1)

    # resume in the same out_dir: all chunks skipped, outputs identical
    r2 = run_job(src, out1, annotations=ann, chunk_files=2, concurrency=1)
    assert r2.chunks_run == 0 and r2.files_skipped == 4
    v2 = _violations_df(out1)
    assert v1.equals(v2)
    assert r2.n_violations == r1.n_violations

    # partial completion: copy only one manifest into a fresh out_dir →
    # exactly the missing chunks run, outputs equal a from-scratch run
    out2 = str(tmp_path / "run2")
    os.makedirs(ckpt.manifest_dir(out2), exist_ok=True)
    manifests = sorted(os.listdir(ckpt.manifest_dir(out1)))
    import shutil

    first = manifests[0]
    shutil.copy(
        os.path.join(ckpt.manifest_dir(out1), first),
        os.path.join(ckpt.manifest_dir(out2), first),
    )
    # also copy that chunk's violations (a real kill leaves them on disk)
    cid = first[len("chunk=") : -len(".json")]
    src_chunk = os.path.join(out1, "violations", "rowlocal", f"chunk={cid}")
    dst_chunk = os.path.join(out2, "violations", "rowlocal", f"chunk={cid}")
    shutil.copytree(src_chunk, dst_chunk)

    r3 = run_job(src, out2, annotations=ann, chunk_files=2, concurrency=1)
    assert r3.chunks_run == 1 and r3.files_skipped == 2
    assert _violations_df(out2).equals(v1)


def test_resume_after_crash_between_write_and_manifest(tmp_path, input_dir):
    """A kill between a chunk's write_parquet and its manifest write leaves
    stale part files without a manifest.  The resume must clear and rewrite
    the chunk dir, not append beside the stale parts (which double-emits
    that chunk's violations)."""
    import shutil

    src, c = input_dir
    ann = annotations_table(c.table)
    out = str(tmp_path / "run")
    r1 = run_job(src, out, annotations=ann, chunk_files=2, concurrency=1)
    v1 = _violations_df(out)

    # simulate the crash: drop ONE manifest but keep its chunk dir + parts
    mdir = ckpt.manifest_dir(out)
    first = sorted(os.listdir(mdir))[0]
    os.remove(os.path.join(mdir, first))
    cid = first[len("chunk=") : -len(".json")]
    chunk_dir = os.path.join(out, "violations", "rowlocal", f"chunk={cid}")
    assert any(f.endswith(".parquet") for f in os.listdir(chunk_dir))

    r2 = run_job(src, out, annotations=ann, chunk_files=2, concurrency=1)
    assert r2.chunks_run == 1  # only the manifest-less chunk re-ran
    assert r2.n_violations == r1.n_violations
    assert _violations_df(out).equals(v1)


def test_changed_ruleset_invalidates_manifests(tmp_path, input_dir):
    src, c = input_dir
    out = str(tmp_path / "run")
    r1 = run_job(src, out, chunk_files=4, with_stats=False, concurrency=1)
    assert r1.chunks_run == 1
    pruned = default_image_ruleset().without("R-RG-PHASH")
    r2 = run_job(src, out, ruleset=pruned, chunk_files=4, with_stats=False,
                 concurrency=1)
    assert r2.chunks_run == 1 and r2.files_skipped == 0


def test_manifest_atomicity(tmp_path):
    out = str(tmp_path)
    p = ckpt.write_manifest(out, "abc", files=["f1", "f2"], ruleset_hash="h")
    assert os.path.exists(p)
    assert ckpt.completed_files(out, "h") == {"f1", "f2"}
    assert ckpt.completed_files(out, "other") == set()
    # torn manifest is ignored
    with open(os.path.join(ckpt.manifest_dir(out), "chunk=bad.json"), "w") as f:
        f.write("{not json")
    assert ckpt.completed_files(out, "h") == {"f1", "f2"}


def test_job_with_drift_reference(tmp_path, input_dir):
    """Drift violations flow through run_job when a reference histogram
    is supplied and the input's distribution deviates."""
    import numpy as np
    import ray.data as rd

    from mtb_validation_service_ray.sources.fixtures import make_image_rows
    from mtb_validation_service_ray.stages.stats import (
        profile_stats,
        reference_histograms,
    )

    src, c = input_dir
    # reference built from a deliberately DIFFERENT w distribution
    ref_table = make_image_rows(0, 1000, seed=77, total=1000)
    import pyarrow as pa
    import pyarrow.compute as pc

    shifted_w = pc.add(ref_table.column("w"), 300).cast(pa.int32())
    shifted = ref_table.set_column(
        ref_table.column_names.index("w"), "w", shifted_w
    ).drop_columns(["bytes"])
    ref = reference_histograms(profile_stats(rd.from_arrow(shifted), concurrency=1))

    out = str(tmp_path / "drift_run")
    r = run_job(src, out, chunk_files=4, reference_histograms=ref, concurrency=1)
    df = _violations_df_full(out)
    drift = df[df.rule_id.str.startswith("R-DRIFT")]
    assert len(drift) > 0
    assert set(drift.record_id.str.startswith("partition=")) == {True}


def _violations_df_full(out_dir):
    import pandas as pd

    vdir = os.path.join(out_dir, "violations", "all")
    frames = [
        pq.read_table(os.path.join(vdir, f)).to_pandas()
        for f in os.listdir(vdir)
        if f.endswith(".parquet")
    ]
    return pd.concat(frames).reset_index(drop=True)


def test_versioned_catalog_ruleset(input_dir):
    """fmt catalog version pinning: under catalog v1.0 (no 'lossy'),
    every lossy row in the valid table becomes an R-VS-FMT violation."""
    import ray.data as rd

    from mtb_validation_service_ray.sources.fixtures import make_image_rows
    from mtb_validation_service_ray.stages.row_pass import META_COLUMNS, run_row_pass
    from mtb_validation_service_ray.sources.fixtures import CAPTION_KEYS

    t = make_image_rows(0, 400, seed=13, total=400)
    n_lossy = t.filter(
        __import__("pyarrow").compute.equal(t.column("fmt"), "lossy")
    ).num_rows
    assert n_lossy > 0
    rs_old = default_image_ruleset(fmt_version="1.0")
    out = run_row_pass(
        rd.from_arrow(t.select(META_COLUMNS)), rs_old,
        {"caption_refs": frozenset(CAPTION_KEYS)}, concurrency=1,
    ).to_pandas()
    vs = out[out.rule_id == "R-VS-FMT"]
    assert len(vs) == n_lossy

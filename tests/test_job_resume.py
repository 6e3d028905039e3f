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
    assert r1.chunks_run == 2 and r1.chunks_skipped == 0
    assert r1.n_records == c.table.num_rows - 1  # duplicate id collapses
    assert r1.n_violations == len(c.golden)
    assert r1.stats is not None
    assert os.path.exists(os.path.join(out1, "stats.parquet"))
    v1 = _violations_df(out1)

    # resume in the same out_dir: all chunks skipped, outputs identical
    r2 = run_job(src, out1, annotations=ann, chunk_files=2, concurrency=1)
    assert r2.chunks_run == 0 and r2.chunks_skipped == 4
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
    assert r3.chunks_run == 1 and r3.chunks_skipped == 2
    assert _violations_df(out2).equals(v1)


def test_changed_ruleset_invalidates_manifests(tmp_path, input_dir):
    src, c = input_dir
    out = str(tmp_path / "run")
    r1 = run_job(src, out, chunk_files=4, with_stats=False, concurrency=1)
    assert r1.chunks_run == 1
    pruned = default_image_ruleset().without("R-RG-PHASH")
    r2 = run_job(src, out, ruleset=pruned, chunk_files=4, with_stats=False,
                 concurrency=1)
    assert r2.chunks_run == 1 and r2.chunks_skipped == 0


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

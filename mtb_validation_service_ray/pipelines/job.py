"""Resumable validation job driver (reference EP1 end-to-end, plus the
distributed concerns the reference never had — SURVEY.md §4).

``run_job`` validates an image table on disk in two phases:

1. **Row-local phase, checkpointed.**  Input fragments (Parquet files /
   Lance fragments) are processed in chunks; each chunk runs the
   metadata + decode passes and writes its violations under
   ``out/violations/rowlocal/chunk=<id>/`` followed by an atomic
   manifest (pipelines/checkpoint.py).  A killed job re-runs only the
   chunks without a manifest; ruleset changes (content hash) invalidate
   old manifests.
2. **Global phase.**  Dataset-wide checks (uniqueness, orphan
   anti-join, stats/drift profiling) plus the verdict roll-up run over
   the full input, writing ``out/violations/global/``,
   ``out/verdicts/``, ``out/stats.parquet`` and a job manifest.  These
   are shuffle passes over id/metadata columns only (never ``bytes``)
   and re-run on resume — their inputs are a tiny projection of the
   table, so recomputation is cheap relative to the decode phase.

Determinism: any wall-clock the rule set needs is pinned via the
``now`` job parameter (the reference's hidden ``LocalDate.now`` trap,
MTBValidators.scala:173, made explicit).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field
from typing import Any, Iterable

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..rules.core import RuleSet
from ..rules.registry import default_image_ruleset
from ..schema import PARTITION_COL, VIOLATION_SCHEMA
from ..sources import io as io_shim
from ..sources.fixtures import CAPTION_KEYS
from ..stages.decode_pass import DECODE_COLUMNS, run_decode_pass
from ..stages.referential import orphan_violations
from ..stages.row_pass import META_COLUMNS, run_row_pass
from ..stages.stats import drift_violations, profile_stats, stats_report
from ..stages.unique import duplicate_id_violations
from . import checkpoint as ckpt
from .verdicts import partition_report, verdicts


@dataclass
class JobResult:
    out_dir: str
    chunks_run: int
    files_skipped: int
    n_violations: int
    n_records: int
    stats: pa.Table | None = None
    partition_report: pa.Table | None = None
    extra: dict[str, Any] = field(default_factory=dict)


def run_job(
    input_uri: str,
    out_dir: str,
    *,
    ruleset: RuleSet | None = None,
    caption_refs: Iterable[str] | None = None,
    annotations: rd.Dataset | pa.Table | None = None,
    chunk_files: int = 8,
    now: str | None = None,
    expected_partitions: Iterable[int] | None = None,
    with_stats: bool = True,
    reference_histograms: dict | None = None,
    row_batch_size: int = 8192,
    decode_batch_size: int = 256,
    concurrency: int | tuple[int, int] | None = None,
    fused: bool = True,
) -> JobResult:
    ruleset = ruleset if ruleset is not None else default_image_ruleset()
    rs_hash = ruleset.content_hash()
    broadcast = {
        "caption_refs": (
            caption_refs if caption_refs is not None else frozenset(CAPTION_KEYS)
        )
    }
    os.makedirs(out_dir, exist_ok=True)

    # ---- phase 0: schema conformance (the engine's "parse" step —
    # Python lacks the reference's compile-time schema guarantee) ----
    fragments = io_shim.list_fragments(input_uri)
    if fragments and fragments[0].endswith(".parquet"):
        from ..schema import SchemaMismatch, check_schema

        problems = check_schema(pq.read_schema(fragments[0]))
        if problems:
            raise SchemaMismatch(
                f"input does not conform to the pinned image schema: {problems}"
            )

    # ---- phase 1: chunked row-local passes with checkpoints ----
    done = ckpt.completed_files(out_dir, rs_hash)
    pending = [f for f in fragments if f not in done]
    chunks = [
        pending[i : i + chunk_files] for i in range(0, len(pending), chunk_files)
    ]
    for files in chunks:
        cid = ckpt.chunk_id(files)
        if fused:
            # one read + one actor pool per chunk (stages/fused.py);
            # id-marker rows are skipped — the global phase re-reads the
            # (cheap) id column instead
            from ..stages.fused import ALL_COLUMNS, run_fused_pass

            union = run_fused_pass(
                io_shim.read_table(files, columns=ALL_COLUMNS),
                ruleset, broadcast,
                batch_size=max(row_batch_size // 8, 256),
                concurrency=concurrency,
                emit_id_rows=False,
            )
        else:
            meta_v = run_row_pass(
                io_shim.read_table(files, columns=META_COLUMNS),
                ruleset, broadcast,
                batch_size=row_batch_size, concurrency=concurrency,
            )
            dec_v = run_decode_pass(
                io_shim.read_table(files, columns=DECODE_COLUMNS),
                ruleset,
                batch_size=decode_batch_size, concurrency=concurrency,
            )
            union = meta_v.union(dec_v)
        chunk_dir = os.path.join(out_dir, "violations", "rowlocal", f"chunk={cid}")
        # A crash between write_parquet and write_manifest leaves stale
        # UUID-named part files; a resume re-run would append new parts
        # beside them and double-emit the chunk's violations — clear first.
        shutil.rmtree(chunk_dir, ignore_errors=True)
        union.write_parquet(chunk_dir)
        os.makedirs(chunk_dir, exist_ok=True)
        if not any(f.endswith(".parquet") for f in os.listdir(chunk_dir)):
            # clean chunk: keep the sink schema-stable for the later read
            pq.write_table(
                VIOLATION_SCHEMA.empty_table(),
                os.path.join(chunk_dir, "empty.parquet"),
            )
        n_rows = sum(
            pq.ParquetFile(os.path.join(chunk_dir, f)).metadata.num_rows
            for f in os.listdir(chunk_dir)
            if f.endswith(".parquet")
        )
        ckpt.write_manifest(
            out_dir, cid,
            files=files, ruleset_hash=rs_hash,
            metrics={"n_violations": n_rows, "now": now},
        )

    # ---- phase 2: global passes (ids/metadata projection only) ----
    from ..stages.positional import TAIL_COLUMNS, tail_either_violations

    id_ds = io_shim.read_table(fragments, columns=["image_id", PARTITION_COL])
    global_passes = [
        duplicate_id_violations(id_ds),
        tail_either_violations(io_shim.read_table(fragments, columns=TAIL_COLUMNS)),
    ]
    if expected_partitions is not None:
        from ..stages.cardinality import partition_cardinality_violations

        global_passes.append(
            partition_cardinality_violations(
                id_ds, expected_partitions=list(expected_partitions)
            )
        )
    if annotations is not None:
        ann = (
            rd.from_arrow(annotations)
            if isinstance(annotations, pa.Table)
            else annotations
        )
        global_passes.append(orphan_violations(id_ds, ann))

    stats_table = None
    drift_table = None
    if with_stats:
        meta_ds = io_shim.read_table(
            fragments, columns=["image_id", "w", "h", "caption", PARTITION_COL]
        )
        stats_ds = profile_stats(meta_ds, concurrency=concurrency)
        from ..stages.stats import _as_arrow
        stats_arrow = _as_arrow(stats_ds)
        stats_table = stats_report(stats_arrow)
        pq.write_table(stats_table, os.path.join(out_dir, "stats.parquet"))
        if reference_histograms:
            drift_table = drift_violations(stats_arrow, reference_histograms)

    # union everything, materialize once (violations are rare, result is
    # small), then reuse for verdicts + sinks without re-running passes
    rowlocal_dir = os.path.join(out_dir, "violations", "rowlocal")
    # reconcile chunk dirs against manifests: a crash window or a resume
    # with different chunking/ruleset can leave chunk=<cid> dirs whose
    # cid no manifest (with the CURRENT ruleset hash) accounts for —
    # reading them would double-emit their violations.  Anything
    # unaccounted is pruned; its input files were either re-processed
    # under new cids above or belong to an invalidated rule set.
    manifests = ckpt.load_manifests(out_dir)
    valid_cids = {
        cid for cid, m in manifests.items() if m.get("ruleset_hash") == rs_hash
    }
    # stale manifests (other ruleset hash) must go WITH their pruned
    # chunk dirs: leaving them on disk would let a later run under the
    # ORIGINAL ruleset claim those files as completed while their
    # violation output no longer exists (silent under-reporting)
    for cid in set(manifests) - valid_cids:
        try:
            os.remove(ckpt.manifest_path(out_dir, cid))
        except OSError:
            pass
    if os.path.isdir(rowlocal_dir):
        for name in os.listdir(rowlocal_dir):
            if (
                name.startswith("chunk=")
                and name[len("chunk="):] not in valid_cids
            ):
                shutil.rmtree(os.path.join(rowlocal_dir, name), ignore_errors=True)
    # select_columns drops the hive-style `chunk=` partition column the
    # parquet reader infers from the checkpoint layout
    all_violations = rd.read_parquet(rowlocal_dir).select_columns(
        [f.name for f in VIOLATION_SCHEMA]
    )
    for p in global_passes:
        all_violations = all_violations.union(p)
    if drift_table is not None and drift_table.num_rows:
        all_violations = all_violations.union(rd.from_arrow(drift_table))
    all_violations = all_violations.materialize()

    # derived sinks are rebuilt wholesale on every (re)run — clear them so
    # a resume doesn't append duplicate part files
    for derived in ("verdicts", os.path.join("violations", "all")):
        shutil.rmtree(os.path.join(out_dir, derived), ignore_errors=True)
    verdict_ds = verdicts(id_ds, all_violations).materialize()
    verdict_ds.write_parquet(os.path.join(out_dir, "verdicts"))
    all_dir = os.path.join(out_dir, "violations", "all")
    all_violations.write_parquet(all_dir)
    os.makedirs(all_dir, exist_ok=True)
    if not any(f.endswith(".parquet") for f in os.listdir(all_dir)):
        # schema-stable sink even with zero violations
        pq.write_table(
            VIOLATION_SCHEMA.empty_table(), os.path.join(all_dir, "empty.parquet")
        )

    report = partition_report(verdict_ds)
    pq.write_table(report, os.path.join(out_dir, "partition_report.parquet"))

    return JobResult(
        out_dir=out_dir,
        chunks_run=len(chunks),
        files_skipped=len(fragments) - len(pending),
        n_violations=all_violations.count(),
        n_records=verdict_ds.count(),
        stats=stats_table,
        partition_report=report,
        extra={"ruleset_hash": rs_hash, "now": now},
    )


def main(argv: list[str] | None = None) -> int:
    """CLI entry (`python -m mtb_validation_service_ray.pipelines.job`)
    — the `ray job submit` target.  Owns its Ray session; the pinned
    ``--now`` parameter replaces any wall-clock the rules would need
    (the reference's LocalDate.now trap, MTBValidators.scala:173)."""
    import argparse
    import json

    parser = argparse.ArgumentParser(description="resumable validation job")
    parser.add_argument("--input", required=True, help="image table uri/dir")
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument("--chunk-files", type=int, default=8)
    parser.add_argument("--now", default=None, help="pinned 'now' (ISO date)")
    parser.add_argument("--no-stats", action="store_true")
    parser.add_argument("--num-cpus", type=int, default=None)
    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():
        total_mem = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            # default ~43% object store spills large payload runs
            object_store_memory=int(total_mem * 0.55),
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    result = run_job(
        args.input, args.out,
        chunk_files=args.chunk_files, now=args.now,
        with_stats=not args.no_stats,
    )
    print(json.dumps({
        "out_dir": result.out_dir,
        "chunks_run": result.chunks_run,
        "files_skipped": result.files_skipped,
        "n_violations": result.n_violations,
        "n_records": result.n_records,
        "ruleset_hash": result.extra["ruleset_hash"],
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Scale drill: headline wall time + kill-and-resume correctness at a
given image count (VERDICT r2 #8 runs it at 1M rows).

Usage: python tools/scale_drill.py [n_images] [kill_after_sec]

Phases (each subprocess owns its Ray session):
1. generate the bench image table at ``n_images`` (cached in /tmp);
2. timed headline: full fused rule-set pass at 32 CPUs;
3. resumable job, SIGKILLed after ``kill_after_sec`` — then resumed;
   the resume must re-run ONLY the missing chunks;
4. fresh uninterrupted job in a clean dir; verdict parquets of the
   resumed and fresh runs must be identical row-for-row.

Prints one JSON summary line (recorded in BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_args = [a for a in sys.argv[1:] if a != "--skew"]
SKEW = "--skew" in sys.argv[1:]
N = int(_args[0]) if _args else 1_000_000
KILL_AFTER = float(_args[1]) if len(_args) > 1 else 30.0
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

HEADLINE_SNIPPET = r"""
import json, os, time, warnings
warnings.filterwarnings("ignore")
import ray
total_mem = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
ray.init(address="local", num_cpus={cpus}, include_dashboard=False,
         logging_level="ERROR", object_store_memory=int(total_mem * 0.55))
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from mtb_validation_service_ray.pipelines.validate import run_validation_fused
t0 = time.time()
res = run_validation_fused({d!r})
n = res.verdicts.count()
_ = res.violations.count()
print(json.dumps({{"sec": round(time.time() - t0, 2), "n": n}}))
ray.shutdown()
"""


SKEW_OPS_SNIPPET = r"""
import json, os, time, warnings
warnings.filterwarnings("ignore")
import ray
total_mem = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
ray.init(address="local", num_cpus={cpus}, include_dashboard=False,
         logging_level="ERROR", object_store_memory=int(total_mem * 0.55))
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
from mtb_validation_service_ray.stages.salt import salted_groupby_sum
from mtb_validation_service_ray.stages.dedup import (
    hash_hamming_candidates, overflow_report,
)
t0 = time.time()
ds = rd.read_parquet({d!r}, columns=["fmt", "w"])
fmt_rows = salted_groupby_sum(ds, "fmt", ["w"], salt=32).count()
salted_sec = round(time.time() - t0, 2)
t0 = time.time()
ds2 = rd.read_parquet({d!r}, columns=["image_id", "phash"])
cands = hash_hamming_candidates(
    ds2, hash_col="phash", id_col="image_id", max_hamming=3
)
n_pairs = cands.count()
rep = overflow_report(cands)
dedup_sec = round(time.time() - t0, 2)
print(json.dumps({{
    "salted_fmt_rows": fmt_rows, "salted_sec": salted_sec,
    "dedup_pairs": n_pairs, "dedup_sec": dedup_sec,
    "overflow_groups": rep.num_rows,
    "overflow_max_members": (
        max(rep.column("n_members").to_pylist()) if rep.num_rows else 0
    ),
    "overflow_pairs_emitted": (
        sum(rep.column("n_pairs_emitted").to_pylist()) if rep.num_rows else 0
    ),
}}))
ray.shutdown()
"""


def _job_cmd(images_dir: str, out_dir: str) -> list[str]:
    return [
        sys.executable, "-m", "mtb_validation_service_ray.pipelines.job",
        "--input", images_dir, "--out", out_dir,
        "--chunk-files", "8", "--no-stats", "--num-cpus", str(CPUS),
    ]


def _warm_cache(images_dir: str) -> None:
    for f in os.listdir(images_dir):
        if f.endswith(".parquet"):
            with open(os.path.join(images_dir, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass


def _run_headline(images_dir: str) -> dict:
    r = subprocess.run(
        [sys.executable, "-c", HEADLINE_SNIPPET.format(cpus=CPUS, d=images_dir)],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
    )
    return json.loads(r.stdout.strip().splitlines()[-1])


def skew_main() -> None:
    """--skew: the VERDICT r3 #7 drill — headline on the uniform AND the
    hardened-skew fixture (99% one fmt, 30% phash hot cluster), plus the
    salted fmt aggregate and the capped phash dedup on the skew table;
    the star cap must degrade gracefully (overflow_report populated)."""
    from bench import ensure_bench_images

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    uniform_dir = ensure_bench_images(N)
    skew_dir = ensure_bench_images(N, skew=True)
    ray.shutdown()

    _warm_cache(uniform_dir)
    uniform = _run_headline(uniform_dir)
    assert uniform["n"] == N, (uniform, N)
    _warm_cache(skew_dir)
    skew = _run_headline(skew_dir)
    assert skew["n"] == N, (skew, N)

    r = subprocess.run(
        [sys.executable, "-c", SKEW_OPS_SNIPPET.format(cpus=CPUS, d=skew_dir)],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
    )
    ops = json.loads(r.stdout.strip().splitlines()[-1])

    print(json.dumps({
        "n_images": N,
        "num_cpus": CPUS,
        "uniform_headline_sec": uniform["sec"],
        "skew_headline_sec": skew["sec"],
        "skew_over_uniform": round(skew["sec"] / uniform["sec"], 3),
        **ops,
    }))


def main() -> None:
    from bench import ensure_bench_images

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    images_dir = ensure_bench_images(N)
    ray.shutdown()

    # page-cache warm (real bytes)
    for f in os.listdir(images_dir):
        if f.endswith(".parquet"):
            with open(os.path.join(images_dir, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass

    # --- timed headline ---
    r = subprocess.run(
        [sys.executable, "-c", HEADLINE_SNIPPET.format(cpus=CPUS, d=images_dir)],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
    )
    headline = json.loads(r.stdout.strip().splitlines()[-1])
    assert headline["n"] == N, (headline, N)

    # --- kill-and-resume job ---
    out_resumed = f"/tmp/mtbray_drill_r3_n{N}"
    out_fresh = f"/tmp/mtbray_drill_r3_fresh_n{N}"
    for d in (out_resumed, out_fresh):
        shutil.rmtree(d, ignore_errors=True)
    p = subprocess.Popen(
        _job_cmd(images_dir, out_resumed),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        start_new_session=True,
    )
    time.sleep(KILL_AFTER)
    os.killpg(os.getpgid(p.pid), signal.SIGKILL)
    p.wait()
    n_manifests_after_kill = len(
        [f for f in os.listdir(os.path.join(out_resumed, "_manifests"))]
        if os.path.isdir(os.path.join(out_resumed, "_manifests")) else []
    )

    t0 = time.time()
    r2 = subprocess.run(
        _job_cmd(images_dir, out_resumed), capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    resume_sec = round(time.time() - t0, 2)
    resumed = json.loads(r2.stdout.strip().splitlines()[-1])

    t0 = time.time()
    r3 = subprocess.run(
        _job_cmd(images_dir, out_fresh), capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    fresh_sec = round(time.time() - t0, 2)
    fresh = json.loads(r3.stdout.strip().splitlines()[-1])

    # --- verdict equality ---
    import duckdb

    con = duckdb.connect()
    q = (
        "SELECT * FROM read_parquet('{}/verdicts/*.parquet') "
        "ORDER BY record_id"
    )
    a = con.execute(q.format(out_resumed)).fetchdf()
    b = con.execute(q.format(out_fresh)).fetchdf()
    identical = a.equals(b)

    print(json.dumps({
        "n_images": N,
        "num_cpus": CPUS,
        "headline_sec": headline["sec"],
        "images_per_sec": round(N / headline["sec"], 1),
        "kill_after_sec": KILL_AFTER,
        "manifests_at_kill": n_manifests_after_kill,
        "resume_files_skipped": resumed["files_skipped"],
        "resume_chunks_run": resumed["chunks_run"],
        "resume_sec": resume_sec,
        "fresh_sec": fresh_sec,
        "n_violations": resumed["n_violations"],
        "verdicts_identical": identical,
    }))


if __name__ == "__main__":
    skew_main() if SKEW else main()

"""Documents-scale curation drill (round 5): run the end-to-end
curation pipeline at a few-hundred-k-doc corpus with planted junk,
exact-duplicate, near-duplicate and HOT-CLUSTER structure, once on the
auto (count-gated driver) connected-components arm and once FORCED onto
the distributed label-fixpoint arm — survivors and accounting must be
identical, and the distributed arm's labels never exist on the driver.
Also times eval-set decontamination over the same corpus on both the
broadcast and the Bloom arm (counts must agree).

Usage: python tools/curate_drill.py [n_base_docs]

Prints one JSON summary line (recorded in BASELINE.md).  Each phase
runs in a fresh subprocess that owns its Ray session.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
HOT = 1_000  # one hot near-dup cluster (exercises the star cap)

GEN_SNIPPET = r"""
import json, os, time, warnings
warnings.filterwarnings("ignore")
import numpy as np, pyarrow as pa, ray
ray.init(address="local", num_cpus={cpus}, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd

N_BASE, HOT, OUT = {n_base}, {hot}, {out!r}
VOCAB = np.array([f"w{{i:03d}}" for i in range(1000)])
DOC_LEN = 100

def gen(batch: pa.Table) -> pa.Table:
    idx = batch.column("id").to_numpy()
    ids, texts = [], []
    for i in idx:
        rng = np.random.Generator(np.random.Philox(key=int(i)))
        words = VOCAB[rng.integers(0, len(VOCAB), DOC_LEN)]
        base = " ".join(words) + f" uniq{{i}}"
        ids.append(f"d{{i:08d}}"); texts.append(base)
        r = i % 100
        if r < 25:    # exact dup (case/whitespace variant)
            ids.append(f"x{{i:08d}}e"); texts.append(base.upper() + "  ")
        elif r < 45:  # near dup: swap one interior word
            toks = base.split(); toks[10] = "zzz"
            ids.append(f"x{{i:08d}}n"); texts.append(" ".join(toks))
        elif r < 50:  # junk
            ids.append(f"x{{i:08d}}j"); texts.append("!! 123 ## " * 3)
    if idx[0] == 0:   # hot cluster: HOT one-token variants of doc 0
        rng = np.random.Generator(np.random.Philox(key=7))
        words = VOCAB[np.random.Generator(np.random.Philox(key=0)).integers(0, len(VOCAB), DOC_LEN)]
        base = " ".join(words) + " uniq0"
        toks0 = base.split()
        for h in range(HOT):
            toks = list(toks0); toks[5 + (h % 80)] = f"hot{{h}}"
            ids.append(f"x{{0:08d}}h{{h:05d}}"); texts.append(" ".join(toks))
    return pa.table({{"doc_id": pa.array(ids), "text": pa.array(texts)}})

t0 = time.time()
rd.range(N_BASE, override_num_blocks=2 * {cpus}).map_batches(
    gen, batch_format="pyarrow"
).write_parquet(OUT)
print(json.dumps({{"gen_sec": round(time.time() - t0, 2)}}))
ray.shutdown()
"""

CURATE_SNIPPET = r"""
import json, os, time, warnings
warnings.filterwarnings("ignore")
import ray
total_mem = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
ray.init(address="local", num_cpus={cpus}, include_dashboard=False,
         logging_level="ERROR", object_store_memory=int(total_mem * 0.55))
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
from mtb_validation_service_ray.pipelines.curate import curate_documents

t0 = time.time()
res = curate_documents(
    rd.read_parquet({src!r}), jaccard_threshold=0.7,
    cc_strategy={strategy!r},
)
n_out = res.documents.count()
print(json.dumps({{"sec": round(time.time() - t0, 2), "n_out": n_out,
                  "stats": res.stats}}))
ray.shutdown()
"""

DECONTAM_SNIPPET = r"""
import json, os, time, warnings
warnings.filterwarnings("ignore")
import numpy as np, pyarrow as pa, ray
ray.init(address="local", num_cpus={cpus}, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
from mtb_validation_service_ray.stages.decontaminate import decontaminate

def side(want_eval):
    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        is_ev = pc.equal(pc.utf8_slice_codeunits(
            batch.column("doc_id"), 7, 9), "00")
        is_d = pc.equal(pc.utf8_slice_codeunits(batch.column("doc_id"), 0, 1), "d")
        m = pc.and_(is_ev, is_d)
        return batch.filter(m if want_eval else pc.invert(m))
    return fn

out = {{}}
for arm, kw in (("broadcast", {{}}), ("bloom", {{"broadcast_max_bytes": 0,
                                                "fp_rate": 1e-3}})):
    ds = rd.read_parquet({src!r})
    train = ds.map_batches(side(False), batch_format="pyarrow")
    ev = ds.map_batches(side(True), batch_format="pyarrow")
    t0 = time.time()
    kept = decontaminate(train, ev, n=8, mode="drop", **kw)
    n = kept.count()
    out[arm] = {{"sec": round(time.time() - t0, 2), "n_kept": n}}
print(json.dumps(out))
ray.shutdown()
"""


def _run(snippet: str, **fmt) -> dict:
    r = subprocess.run(
        [sys.executable, "-c", snippet.format(cpus=CPUS, **fmt)],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    if r.returncode != 0:
        print(r.stderr[-4000:], file=sys.stderr)
        raise SystemExit(1)
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    d = os.path.join("/tmp", f"mtbray_curate_drill_v1_n{N_BASE}_h{HOT}")
    summary: dict = {"n_base": N_BASE, "hot": HOT, "cpus": CPUS}
    if not os.path.exists(os.path.join(d, "_complete")):
        import shutil

        if os.path.isdir(d):
            shutil.rmtree(d)
        summary["gen"] = _run(GEN_SNIPPET, n_base=N_BASE, hot=HOT, out=d)
        open(os.path.join(d, "_complete"), "w").write("ok")

    auto = _run(CURATE_SNIPPET, src=d, strategy="auto")
    dist = _run(CURATE_SNIPPET, src=d, strategy="distributed")
    summary["curate_auto"] = auto
    summary["curate_distributed"] = dist
    summary["arms_identical"] = (
        auto["n_out"] == dist["n_out"] and auto["stats"] == dist["stats"]
    )
    s = auto["stats"]
    summary["accounting_closes"] = (
        s["n_input"] - s["n_quality_dropped"] - s["n_language_dropped"]
        - s["n_exact_dropped"] - s["n_near_dropped"] == s["n_survivors"]
        == auto["n_out"]
    )
    summary["decontaminate"] = _run(DECONTAM_SNIPPET, src=d)
    summary["decontam_arms_agree"] = (
        summary["decontaminate"]["broadcast"]["n_kept"]
        == summary["decontaminate"]["bloom"]["n_kept"]
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

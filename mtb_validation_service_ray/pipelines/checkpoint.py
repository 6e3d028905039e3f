"""Per-partition checkpoint manifests — resumable runs without a
transaction layer (SURVEY.md §7.3 #5; north rule "resumable from
checkpoint with per-partition lineage + metrics").

The reference persists one JSON file per record under a data directory
(FSBackedRepository, MTBValidationRepository.scala:36-47); the engine
persists one JSON manifest per *resume unit* (a chunk of input
fragments) under ``out/_manifests/``, written atomically
(tmp + ``os.replace``) only AFTER that chunk's violation rows have
landed.  On restart, completed chunks — identified by input fragment
list + rule-set content hash — are filtered out of the source listing
before the Dataset is built, so finished work is never recomputed and
never double-emitted.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

MANIFEST_DIR = "_manifests"


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIR)


def chunk_id(files: list[str]) -> str:
    import hashlib

    return hashlib.sha256("\n".join(sorted(files)).encode()).hexdigest()[:16]


def manifest_path(out_dir: str, cid: str) -> str:
    return os.path.join(manifest_dir(out_dir), f"chunk={cid}.json")


def write_manifest(
    out_dir: str,
    cid: str,
    *,
    files: list[str],
    ruleset_hash: str,
    metrics: dict[str, Any] | None = None,
) -> str:
    """Atomic write: the manifest appears only fully-formed."""
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    path = manifest_path(out_dir, cid)
    payload = {
        "chunk_id": cid,
        "files": sorted(files),
        "ruleset_hash": ruleset_hash,
        "completed_at_unix": time.time(),
        "metrics": metrics or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def load_manifests(out_dir: str) -> dict[str, dict[str, Any]]:
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return {}
    out = {}
    for name in sorted(os.listdir(mdir)):
        if not (name.startswith("chunk=") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
            out[m["chunk_id"]] = m
        except (json.JSONDecodeError, KeyError, OSError):
            continue  # torn/foreign file — treat as not completed
    return out


def completed_files(out_dir: str, ruleset_hash: str) -> set[str]:
    """Input fragments already fully processed under the SAME rule set
    (a changed rule set invalidates prior manifests)."""
    done: set[str] = set()
    for m in load_manifests(out_dir).values():
        if m.get("ruleset_hash") == ruleset_hash:
            done.update(m.get("files", []))
    return done

"""IO shim: Lance when available, Parquet otherwise.

The north rule targets Lance tables (BASELINE.json ``input_hint``), but
no ``lance``/``pylance`` wheel exists in this sandbox (SURVEY.md §7.1),
so every read/write goes through this shim: identical fragment/partition
semantics on both paths, Lance used opportunistically when importable.

The reference's storage layer is the analog: a repository trait with a
filesystem-backed implementation chosen at runtime via SPI
(MTBValidationRepository.scala:21-47) — storage behind an interface,
implementation pluggable.
"""

from __future__ import annotations

import glob
import os
from typing import Any

import ray.data as rd

try:  # pragma: no cover - lance wheel not present in sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def dataset_uri_kind(uri: str) -> str:
    if uri.endswith(".lance"):
        if not HAVE_LANCE:
            # failing loud beats silently reading/writing parquet into a
            # .lance-named path that a lance-enabled environment would
            # then refuse to open
            raise ImportError(
                f"{uri!r} is a Lance URI but no lance/pylance wheel is "
                "installed (SURVEY.md §7.1); install it or point at parquet"
            )
        return "lance"
    return "parquet"


def read_table(uri: str | list[str], *, columns: list[str] | None = None,
               **kwargs: Any) -> rd.Dataset:
    """Read an image table as a Ray Dataset with column pruning.

    Always pass ``columns`` — at 100 TB, reading the ``bytes`` column for
    a metadata-only pass is the single biggest wasted cost
    (SURVEY.md §7.3 #4)."""
    if isinstance(uri, str) and dataset_uri_kind(uri) == "lance":
        return rd.read_lance(uri, columns=columns, **kwargs)
    return rd.read_parquet(uri, columns=columns, **kwargs)


def write_table(ds: rd.Dataset, uri: str, **kwargs: Any) -> None:
    if dataset_uri_kind(uri) == "lance":
        ds.write_lance(uri, **kwargs)
        return
    ds.write_parquet(uri, **kwargs)


def list_fragments(uri: str) -> list[str]:
    """Input fragments = resumable partition units (one manifest each).

    Lance datasets expose fragments natively; on the Parquet path a
    fragment is one ``*.parquet`` file."""
    if dataset_uri_kind(uri) == "lance":  # pragma: no cover
        # Lance fragment ids are NOT readable URIs, and every caller of
        # list_fragments treats fragments as independently readable
        # resume units (job.py chunks them into read_table calls).  A
        # correct Lance resume unit needs fragment-scoped reads
        # (read_lance with fragment filters) end-to-end — honest
        # NotImplementedError until the wheel exists to test against,
        # instead of returning ids that crash downstream.
        raise NotImplementedError(
            "Lance fragment-granular resume is not wired up yet "
            "(ROADMAP #1); read_table/write_table on whole Lance "
            "datasets work once the wheel is installed"
        )
    if os.path.isdir(uri):
        return sorted(glob.glob(os.path.join(uri, "**", "*.parquet"), recursive=True))
    return [uri]

"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Neither this module nor the library calls ``ray.init``/``ray.shutdown``
— only ``bench.py``, CLI scripts and the test fixture own a session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: full rule-set validation of the deterministic
    image+caption fixture (BASELINE.json input_hint shape) — returns the
    per-record verdicts table (1500 rows, stable schema)."""
    from mtb_validation_service_ray.pipelines.queries import (
        _as_table,
        _image_fixture_dir,
    )
    from mtb_validation_service_ray.pipelines.validate import run_validation

    res = run_validation(_image_fixture_dir())
    return _as_table(res.verdicts)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (see mtb_validation_service_ray/pipelines/queries.py for the
    operator-by-operator mapping)."""
    from mtb_validation_service_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query — including
    the image-pipeline subset that reads the deterministic /tmp fixture
    parquet (metadata rules + gating, path-subtree roll-up, phash dup
    groups, exact stats lane).  Sketches, LSH candidate chains and
    fingerprints are rows-only (no SQL analog) and verified by the
    pytest suite instead."""
    from mtb_validation_service_ray.pipelines.queries import (
        ORACLE_SQL,
        ensure_image_oracle_inputs,
    )

    # the image oracles read deterministic /tmp fixture parquet — make
    # sure it exists before DuckDB does, regardless of run order
    ensure_image_oracle_inputs()
    return dict(ORACLE_SQL)

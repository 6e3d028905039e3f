"""Skew handling: salted two-stage aggregation.

The image table's key distributions are skewed by design — ~90% of rows
share one ``fmt``, dimensions have a hot mode, ``phash`` has a hot
cluster (FIXTURES.md §1).  A bare ``groupby(fmt)`` would send 90% of
the rows to one reducer (SURVEY.md §4 "Skew").

``salted_groupby_sum`` runs the canonical two-stage plan:

  1. map side: append ``salt = hash(row) % S`` and pre-aggregate each
     batch on ``(key, salt)`` with a vectorized pyarrow group_by —
     a hot key's rows collapse to ≤ S partial rows per block;
  2. one shuffle on ``(key, salt)`` — the hot key now spreads over S
     reducers;
  3. a second (tiny) shuffle on ``key`` merges the S partials.

For mergeable sums/counts/min/max this is exact.  The helper is used by
the skewed-stats path and is the documented pattern for any hot-key
aggregate in this engine.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

DEFAULT_SALT = 16

_AGG_FUNS = {"sum": "sum", "count": "count", "min": "min", "max": "max"}


def salted_groupby_sum(
    ds: rd.Dataset,
    key: str,
    value_cols: Iterable[str],
    *,
    salt: int = DEFAULT_SALT,
    count_alias: str = "n",
) -> rd.Dataset:
    """Exact per-key sums + counts of ``value_cols`` under key skew.

    Returns one row per key: (key, n, sum_<col>...)."""
    value_cols = list(value_cols)

    def map_side(batch: pa.Table) -> pa.Table:
        # deterministic salt: row index modulo S — spreading is all that
        # matters, randomness is not required
        s = (np.arange(len(batch)) % salt).astype(np.int32)
        t = batch.select([key] + value_cols).append_column("_salt", pa.array(s))
        aggs = [(c, "sum") for c in value_cols] + [([], "count_all")]
        g = t.group_by([key, "_salt"]).aggregate(aggs)
        cols = {key: g.column(key), "_salt": g.column("_salt")}
        for c in value_cols:
            cols[f"sum_{c}"] = g.column(f"{c}_sum")
        cols[count_alias] = g.column("count_all").cast(pa.int64())
        return pa.table(cols)

    stage1 = ds.map_batches(map_side, batch_format="pyarrow", zero_copy_batch=True)
    # stage 2: merge salted partials (hot key spread over `salt` groups)
    aggs2 = [Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in value_cols]
    aggs2.append(Sum(count_alias, alias_name=count_alias))
    merged_salted = stage1.groupby([key, "_salt"]).aggregate(*aggs2)
    # stage 3: tiny final merge per key
    aggs3 = [Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in value_cols]
    aggs3.append(Sum(count_alias, alias_name=count_alias))
    return merged_salted.groupby(key).aggregate(*aggs3)


def skewed_key_stats(
    ds: rd.Dataset,
    key: str = "fmt",
    value_cols: Iterable[str] = ("w", "h"),
    *,
    salt: int = DEFAULT_SALT,
) -> pa.Table:
    """Per-fmt count/mean stats over the (skewed) image table using the
    salted plan; returns a small sorted Table."""
    out = salted_groupby_sum(ds, key, value_cols, salt=salt)
    batches = list(out.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
    table = pa.concat_tables(batches) if batches else None
    if table is None:
        return pa.table({key: pa.array([], pa.string())})
    cols = {key: table.column(key), "n": table.column("n")}
    n = table.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    for c in value_cols:
        s = table.column(f"sum_{c}").to_numpy(zero_copy_only=False)
        cols[f"mean_{c}"] = pa.array(np.round(s / np.maximum(n, 1), 4))
    return pa.table(cols).sort_by(key)

"""Per-partition column statistics + distribution-drift pass.

The engine's promotion of the reference's MVH reporting path
(`MTBMVHService.report` — periodic aggregate over stored submissions,
MTBMVHServiceImpl.scala:78-84) to north-rule column profiling:
count / null-rate / min / max, HyperLogLog distinct, t-digest quantiles
and KS/PSI drift scores per partition (BASELINE.json ``north_star``).

Physical plan (SURVEY.md §4 "Stateful stats"):
  1. an **actor pool** (`map_batches(StatsPass, concurrency=...)`) holds
     the profiling config — histogram bin edges, reference histograms —
     loaded once per actor (`__init__`), the analog of the reference's
     lazy-singleton catalogs (MTBValidators.scala:747-770);
  2. each batch folds into **one partial row per partition id** —
     serialized mergeable sketches, a few KB — so the shuffle moves
     partials, never input rows;
  3. a tiny ``groupby(partition_id).map_groups`` merges the partials
     (sketches are mergeable by construction); the number of groups is
     the number of partitions, so per-group Python is fine here.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.sketches import (
    HyperLogLog,
    TDigest,
    hash64,
    histogram,
    ks_statistic,
    psi,
)
from ..schema import PARTITION_COL, VIOLATION_SCHEMA, violations_table

# bucket for rows whose partition_id is NULL (-1 is reserved for the
# global merged row in stats_report)
NULL_PID_BUCKET = -2

DEFAULT_NUMERIC_COLS = ("w", "h")
DEFAULT_ID_COL = "image_id"
DEFAULT_EDGES = {
    "w": np.array([0, 16, 24, 32, 48, 64, 96, 128, 256, 1024, 16384], dtype=float),
    "h": np.array([0, 16, 24, 32, 48, 64, 96, 128, 256, 1024, 16384], dtype=float),
}
QUANTILES = (0.01, 0.25, 0.5, 0.75, 0.99)


@dataclass
class PartialStats:
    """Mergeable per-partition partial."""

    n_rows: int = 0
    null_counts: dict[str, int] = field(default_factory=dict)
    num_min: dict[str, float] = field(default_factory=dict)
    num_max: dict[str, float] = field(default_factory=dict)
    num_sum: dict[str, float] = field(default_factory=dict)
    hll: HyperLogLog = field(default_factory=HyperLogLog)
    digests: dict[str, TDigest] = field(default_factory=dict)
    hists: dict[str, np.ndarray] = field(default_factory=dict)

    def merge(self, other: "PartialStats") -> "PartialStats":
        out = PartialStats(n_rows=self.n_rows + other.n_rows)
        keys = set(self.null_counts) | set(other.null_counts)
        out.null_counts = {
            k: self.null_counts.get(k, 0) + other.null_counts.get(k, 0) for k in keys
        }
        for k in set(self.num_min) | set(other.num_min):
            mins = [d[k] for d in (self.num_min, other.num_min) if k in d]
            maxs = [d[k] for d in (self.num_max, other.num_max) if k in d]
            sums = [d[k] for d in (self.num_sum, other.num_sum) if k in d]
            out.num_min[k], out.num_max[k], out.num_sum[k] = (
                min(mins), max(maxs), sum(sums),
            )
        out.hll = self.hll.merge(other.hll)
        for k in set(self.digests) | set(other.digests):
            a = self.digests.get(k, TDigest())
            b = other.digests.get(k, TDigest())
            out.digests[k] = a.merge(b)
        for k in set(self.hists) | set(other.hists):
            a = self.hists.get(k)
            b = other.hists.get(k)
            out.hists[k] = (a if a is not None else 0) + (b if b is not None else 0)
        return out


PARTIAL_SCHEMA = pa.schema(
    [
        pa.field(PARTITION_COL, pa.int32()),
        pa.field("n_rows", pa.int64()),
        pa.field("sketch", pa.binary()),
    ]
)


def _as_arrow(ds: "rd.Dataset | pa.Table") -> pa.Table:
    """Materialize a small Dataset (one row per partition) as one Table."""
    if isinstance(ds, pa.Table):
        return ds
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
    return pa.concat_tables(batches) if batches else PARTIAL_SCHEMA.empty_table()


class StatsPass:
    """Actor-pool UDF: fold each Arrow batch into one serialized
    ``PartialStats`` row per partition id."""

    def __init__(
        self,
        numeric_cols: tuple[str, ...] = DEFAULT_NUMERIC_COLS,
        id_col: str = DEFAULT_ID_COL,
        edges: dict[str, np.ndarray] | None = None,
    ):
        self.numeric_cols = numeric_cols
        self.id_col = id_col
        self.edges = edges if edges is not None else DEFAULT_EDGES

    def _fold(self, table: pa.Table) -> PartialStats:
        p = PartialStats(n_rows=table.num_rows)
        for name in table.column_names:
            if name == PARTITION_COL:
                continue
            p.null_counts[name] = table.column(name).null_count
        for name in self.numeric_cols:
            if name not in table.column_names:
                continue
            vals = table.column(name).to_numpy(zero_copy_only=False).astype(np.float64)
            vals = vals[~np.isnan(vals)]
            if len(vals) == 0:
                continue
            p.num_min[name] = float(vals.min())
            p.num_max[name] = float(vals.max())
            p.num_sum[name] = float(vals.sum())
            d = TDigest()
            d.add(vals)
            d._compress()
            p.digests[name] = d
            if name in self.edges:
                p.hists[name] = histogram(vals, self.edges[name])
        if self.id_col in table.column_names:
            ids = table.column(self.id_col).drop_null().to_numpy(zero_copy_only=False)
            if len(ids):
                p.hll.add_hashes(hash64(ids))
        return p

    def __call__(self, batch: pa.Table) -> pa.Table:
        if PARTITION_COL in batch.column_names:
            pid_col = batch.column(PARTITION_COL)
            if pid_col.null_count:
                # null pids would coerce to float NaN in to_numpy and
                # crash int(pid); route them to the -2 sentinel bucket
                # (-1 is the GLOBAL merged row stats_report emits)
                import pyarrow.compute as pc

                pid_col = pc.fill_null(pid_col, NULL_PID_BUCKET)
            pids = pid_col.to_numpy(zero_copy_only=False)
            out_pid, out_n, out_sk = [], [], []
            for pid in np.unique(pids):
                sub = batch.filter(
                    pa.array(pids == pid)
                )
                partial = self._fold(sub)
                out_pid.append(int(pid))
                out_n.append(partial.n_rows)
                out_sk.append(pickle.dumps(partial))
            return pa.table(
                {
                    PARTITION_COL: pa.array(out_pid, pa.int32()),
                    "n_rows": pa.array(out_n, pa.int64()),
                    "sketch": pa.array(out_sk, pa.binary()),
                },
                schema=PARTIAL_SCHEMA,
            )
        partial = self._fold(batch)
        return pa.table(
            {
                PARTITION_COL: pa.array([NULL_PID_BUCKET], pa.int32()),
                "n_rows": pa.array([partial.n_rows], pa.int64()),
                "sketch": pa.array([pickle.dumps(partial)], pa.binary()),
            },
            schema=PARTIAL_SCHEMA,
        )


def _merge_group(group: pd.DataFrame) -> pd.DataFrame:
    merged: PartialStats | None = None
    for blob in group["sketch"]:
        p = pickle.loads(blob)
        merged = p if merged is None else merged.merge(p)
    return pd.DataFrame(
        {
            PARTITION_COL: [group[PARTITION_COL].iloc[0]],
            "n_rows": [merged.n_rows],
            "sketch": [pickle.dumps(merged)],
        }
    )


def profile_stats(
    ds: rd.Dataset,
    *,
    numeric_cols: tuple[str, ...] = DEFAULT_NUMERIC_COLS,
    id_col: str = DEFAULT_ID_COL,
    edges: dict[str, np.ndarray] | None = None,
    batch_size: int = 8192,
    concurrency: int | tuple[int, int] | None = None,
) -> rd.Dataset:
    """Per-partition merged ``PartialStats`` rows (small Dataset: one
    row per partition)."""
    if concurrency is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
        # never cover every CPU: a pool summing to the cluster starves
        # the read tasks and deadlocks the pipeline
        concurrency = max(1, min(cpus // 2, cpus - 1))
    partials = ds.map_batches(
        StatsPass,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        fn_constructor_kwargs={
            "numeric_cols": numeric_cols,
            "id_col": id_col,
            "edges": edges,
        },
        concurrency=concurrency,
    )
    return partials.groupby(PARTITION_COL).map_groups(
        _merge_group, batch_format="pandas"
    )


def stats_report(stats_ds: rd.Dataset | pa.Table) -> pa.Table:
    """Expand merged partials into a readable metrics table (one row per
    partition + one ``partition_id = -1`` global row merged from all
    partials — small, driver-side)."""
    table = _as_arrow(stats_ds)
    rows: list[dict[str, Any]] = []
    global_merge: PartialStats | None = None
    for pid, blob in zip(
        table.column(PARTITION_COL).to_pylist(), table.column("sketch").to_pylist()
    ):
        p: PartialStats = pickle.loads(blob)
        global_merge = p if global_merge is None else global_merge.merge(p)
        rows.append(_expand(pid, p))
    if global_merge is not None:
        rows.append(_expand(-1, global_merge))
    rows.sort(key=lambda r: r[PARTITION_COL])
    return pa.Table.from_pylist(rows)


def _expand(pid: int, p: PartialStats) -> dict[str, Any]:
    row: dict[str, Any] = {PARTITION_COL: pid, "n_rows": p.n_rows}
    row["distinct_ids_est"] = round(p.hll.estimate(), 1)
    for col, n in sorted(p.null_counts.items()):
        row[f"null_{col}"] = n
    for col in sorted(p.num_min):
        row[f"min_{col}"] = p.num_min[col]
        row[f"max_{col}"] = p.num_max[col]
        row[f"mean_{col}"] = p.num_sum[col] / max(p.n_rows - p.null_counts.get(col, 0), 1)
    for col, d in sorted(p.digests.items()):
        for q, v in zip(QUANTILES, d.quantiles(QUANTILES)):
            row[f"p{int(q * 100):02d}_{col}"] = round(v, 3)
    return row


# --- drift -----------------------------------------------------------------

DRIFT_PSI_WARNING = 0.10
DRIFT_PSI_ERROR = 0.25


def reference_histograms(
    stats_ds: rd.Dataset | pa.Table,
) -> dict[str, np.ndarray]:
    """Global merged histograms from a profiling run over a *reference*
    (known-good) table — the broadcast side of the drift check."""
    table = _as_arrow(stats_ds)
    merged: PartialStats | None = None
    for blob in table.column("sketch").to_pylist():
        p = pickle.loads(blob)
        merged = p if merged is None else merged.merge(p)
    return dict(merged.hists) if merged else {}


def drift_violations(
    stats_ds: rd.Dataset | pa.Table,
    reference: dict[str, np.ndarray],
    *,
    psi_warning: float = DRIFT_PSI_WARNING,
    psi_error: float = DRIFT_PSI_ERROR,
) -> pa.Table:
    """Per-partition KS/PSI vs the reference histograms → partition-level
    violation rows (``record_id = "partition=<pid>"``), the north-rule
    R-DRIFT family.  Result is tiny (#partitions × #columns)."""
    table = _as_arrow(stats_ds)
    out: list[pa.Table] = []
    for pid, blob in zip(
        table.column(PARTITION_COL).to_pylist(), table.column("sketch").to_pylist()
    ):
        p: PartialStats = pickle.loads(blob)
        for col, ref_counts in reference.items():
            actual = p.hists.get(col)
            if actual is None:
                continue
            score_psi = psi(ref_counts, actual)
            score_ks = ks_statistic(ref_counts, actual)
            if score_psi >= psi_warning:
                severity = "error" if score_psi >= psi_error else "warning"
                out.append(
                    violations_table(
                        [f"partition={pid}"],
                        f"R-DRIFT-{col.upper()}",
                        severity,
                        f"/partition/{col}",
                        f"distribution drift: PSI={score_psi:.4f} KS={score_ks:.4f}",
                        pa.array([pid], pa.int32()),
                    )
                )
    if not out:
        return VIOLATION_SCHEMA.empty_table()
    return pa.concat_tables(out)


def grouped_quantiles(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> rd.Dataset:
    """EXACT per-group quantiles by rank selection: for each quantile q
    the element at 1-based rank ``max(1, ceil(q * n))`` of the group's
    sorted values — a discrete (no-interpolation) quantile whose result
    is always an actual data element, so equality against a SQL oracle
    is exact (no FP interpolation ties).  Complements the t-digest
    sketch: this lane is exact and shuffles each group to one worker
    (``map_groups``), the sketch lane is mergeable and never moves raw
    rows — pick by group size.  Skew bound: one group's values must fit
    a worker's heap; beyond that, use ``tdigest_quantiles``."""
    q_arr = np.asarray(qs, dtype=np.float64)

    def per_group(group: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(group[value_col].to_numpy(dtype=np.float64))
        n = len(v)
        ranks = np.maximum(1, np.ceil(q_arr * n).astype(np.int64))
        return pd.DataFrame(
            {
                key_col: [group[key_col].iloc[0]] * len(q_arr),
                "q": q_arr,
                "value": v[ranks - 1],
            }
        )

    return ds.groupby(key_col).map_groups(per_group, batch_format="pandas")


def pivot_counts(
    ds: rd.Dataset,
    *,
    key_col: str,
    pivot_col: str,
    categories: list[str],
) -> rd.Dataset:
    """Pivot (one-hot aggregate): one row per key with a count column
    per category — the wide feature layout a training pipeline feeds to
    a model.  ``categories`` is explicit so the output schema is stable
    and known before execution (required for streaming plans; also the
    only sane contract at 100 TB — discovering categories on the fly
    would need an extra pass).

    Scale shape: counts collapse to per-(key, category) partials inside
    each batch, ONE hash groupby merges them, and the widening is a
    vectorized column select on the already-tiny merged stream."""
    from ray.data.aggregate import Sum as _Sum

    cat_index = pd.Index(categories)

    def partials(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        cats = batch.column(pivot_col).to_numpy(zero_copy_only=False)
        # vectorized category lookup (unknown categories → -1, dropped)
        idx = cat_index.get_indexer(cats)
        keep = idx >= 0
        keys, idx = keys[keep], idx[keep]
        order = np.lexsort((idx, keys))
        ks, ix = keys[order], idx[order]
        change = np.r_[True, (ks[1:] != ks[:-1]) | (ix[1:] != ix[:-1])]
        starts = np.flatnonzero(change)
        cnt = np.diff(np.r_[starts, len(ks)])
        return pa.table(
            {
                key_col: pa.array(ks[starts]).cast(
                    batch.schema.field(key_col).type
                ),
                "_cat": pa.array(ix[starts].astype(np.int32)),
                "_n": pa.array(cnt.astype(np.int64)),
            }
        )

    merged = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "_cat"])
        .aggregate(_Sum("_n", alias_name="n"))
    )

    from ..functions.sketches import hash64

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(key_col).to_numpy(zero_copy_only=False))
        return batch.append_column(
            "_bucket", pa.array((h % np.uint64(64)).astype(np.int32))
        )

    def widen_bucket(group: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pivot per BUCKET of keys (never per key)
        wide = group.pivot_table(
            index=key_col, columns="_cat", values="n",
            aggfunc="sum", fill_value=0,
        )
        out = pd.DataFrame({key_col: wide.index.to_numpy()})
        for i, c in enumerate(categories):
            col = (
                wide[i].to_numpy()
                if i in wide.columns
                else np.zeros(len(wide), dtype=np.int64)
            )
            out[f"n_{c}"] = col.astype(np.int64)
        return out

    return (
        merged.map_batches(
            add_bucket, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("_bucket")
        .map_groups(widen_bucket, batch_format="pandas")
    )


def grouped_hll_distinct(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    *,
    p: int = 12,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Approximate COUNT(DISTINCT value) per key via per-group HLL —
    the mergeable-sketch grouped aggregate a 100 TB pipeline uses
    instead of shuffling raw values: each batch folds into one
    ``m``-byte register blob per (batch, key), so the exchange moves
    ``#batches × #keys_per_batch`` fixed-size rows, never the values.

    Registers build vectorized (one ``np.maximum.at`` over
    ``(key_code, register)`` pairs per batch) and merge vectorized
    (lexsorted ``np.maximum.reduceat`` per bucket).  Null values are
    ignored (SQL ``count(DISTINCT x)`` semantics); null keys form
    their own group.  Output: ``{key_col, n_distinct_est}`` — ±~1.6%
    at p=12, tolerance-asserted against the exact twin in tests.

    Regime note: each (batch, key) partial is ``2^p`` bytes, so this
    lane pays off when keys repeat across batches (keys ≪ rows).  For
    near-unique keys the blobs dwarf the values — use the exact lane
    (``bucketed_group_agg`` distinct, ``distinct_users_per_type``)
    there instead, or drop ``p``."""
    import pyarrow.compute as pc

    m = 1 << p
    key_type = _schema_of(ds).field(key_col).type

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        vals = batch.column(value_col)
        ok = pc.is_valid(vals)
        keys, vals = keys.filter(ok), vals.filter(ok)
        if len(vals) == 0:
            return pa.table({
                key_col: pa.array([], key_type),
                "_regs": pa.array([], pa.large_binary()),
            })
        codes, uniques = pd.factorize(
            keys.to_pandas(), use_na_sentinel=False
        )
        from ..functions.sketches import hll_idx_rank

        idx, rank = hll_idx_rank(
            hash64(vals.to_numpy(zero_copy_only=False)), p
        )
        regs = np.zeros((len(uniques), m), dtype=np.uint8)
        np.maximum.at(regs, (codes, idx), rank)
        return pa.table({
            key_col: pa.Array.from_pandas(pd.Series(uniques), type=key_type),
            "_regs": pa.array([r.tobytes() for r in regs], pa.large_binary()),
        })

    if num_buckets is None:
        import ray

        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col)
        filled = pc.fill_null(
            k, pa.scalar("", key_type)
            if pa.types.is_string(key_type) else pa.scalar(0, key_type)
        )
        b = (
            hash64(filled.to_numpy(zero_copy_only=False))
            % np.uint64(num_buckets)
        ).astype(np.int32)
        return batch.append_column("_bucket", pa.array(b))

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        stack = np.frombuffer(
            b"".join(group["_regs"].to_numpy()), dtype=np.uint8
        ).reshape(-1, m)
        codes, uniques = pd.factorize(group[key_col], use_na_sentinel=False)
        order = np.argsort(codes, kind="stable")
        sorted_stack = stack[order]
        starts = np.flatnonzero(
            np.r_[True, np.diff(codes[order]) != 0]
        )
        merged = np.maximum.reduceat(sorted_stack, starts, axis=0)
        from ..functions.sketches import hll_estimate_2d

        est = np.rint(hll_estimate_2d(merged)).astype(np.int64)
        # pin the key's Arrow type: a bucket whose keys are ALL null
        # would otherwise degrade the pandas column to float64 NaN
        return pa.table({
            key_col: pa.Array.from_pandas(
                pd.Series(uniques[codes[order][starts]]), type=key_type
            ),
            "n_distinct_est": pa.array(est, pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(merge_bucket, batch_format="pandas")
    )


def _schema_of(ds: rd.Dataset) -> pa.Schema:
    s = ds.schema()
    return getattr(s, "base_schema", s)


def grouped_tdigest_quantiles(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    *,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    max_centroids: int = 128,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Approximate per-key quantiles via mergeable t-digests — the
    sketch twin of the exact grouped-quantile lane: each batch folds
    into one bounded centroid blob per (batch, key), the exchange
    moves fixed-size sketch rows, and per-bucket merge cost scales
    with the number of partials, never raw values.  NaN/null values
    are ignored; null keys form their own group; a key whose values
    are all null yields NaN quantiles."""
    import pyarrow.compute as pc

    key_type = _schema_of(ds).field(key_col).type
    qcols = [f"q{int(q * 100):02d}" for q in quantiles]

    def pack(d: TDigest) -> bytes:
        d._compress()
        return np.concatenate([d.means, d.weights]).astype(np.float64).tobytes()

    def unpack(blob: bytes) -> TDigest:
        a = np.frombuffer(blob, dtype=np.float64)
        h = len(a) // 2
        return TDigest(max_centroids, a[:h].copy(), a[h:].copy())

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pandas()
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        codes, uniques = pd.factorize(keys, use_na_sentinel=False)
        blobs = []
        vals = np.asarray(vals, dtype=np.float64)
        order = np.argsort(codes, kind="stable")
        starts = np.flatnonzero(np.r_[True, np.diff(codes[order]) != 0])
        bounds = np.r_[starts, len(codes)]
        sorted_vals = vals[order]
        for gi in range(len(starts)):
            d = TDigest(max_centroids)
            d.add(sorted_vals[bounds[gi]:bounds[gi + 1]])
            blobs.append(pack(d))
        return pa.table({
            key_col: pa.Array.from_pandas(
                pd.Series(uniques[codes[order][starts]]), type=key_type
            ),
            "_td": pa.array(blobs, pa.large_binary()),
        })

    if num_buckets is None:
        import ray

        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col)
        filled = pc.fill_null(
            k, pa.scalar("", key_type)
            if pa.types.is_string(key_type) else pa.scalar(0, key_type)
        )
        b = (
            hash64(filled.to_numpy(zero_copy_only=False))
            % np.uint64(num_buckets)
        ).astype(np.int32)
        return batch.append_column("_bucket", pa.array(b))

    def merge_bucket(group: pd.DataFrame) -> pa.Table:
        codes, uniques = pd.factorize(group[key_col], use_na_sentinel=False)
        blobs = group["_td"].to_numpy()
        out_keys, rows = [], []
        for gi in range(len(uniques)):
            d = TDigest(max_centroids)
            for blob in blobs[codes == gi]:
                d = d.merge(unpack(blob))
            out_keys.append(uniques[gi])
            rows.append([d.quantile(q) for q in quantiles])
        arr = np.asarray(rows, dtype=np.float64).reshape(len(rows), len(quantiles))
        cols = {
            key_col: pa.Array.from_pandas(pd.Series(out_keys), type=key_type)
        }
        for j, qc in enumerate(qcols):
            cols[qc] = pa.array(arr[:, j], pa.float64())
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(merge_bucket, batch_format="pandas")
    )


def zscore_per_key(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    *,
    out_col: str = "z",
    decimals: int = 6,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-key z-score normalization — the feature-engineering two-pass:
    (1) per-key count/sum/sum-of-squares through the bucketed reduce
    (one small exchange of per-batch partials), (2) the tiny per-key
    (mean, std) table broadcasts once via ``ray.put`` and every batch
    normalizes vectorized — the fact table itself is never shuffled.

    Population std (``STDDEV_POP``); single-row or zero-variance keys,
    null values AND null keys yield a null z (the SQL oracle's
    ``event_type IS NULL THEN NULL`` arm).  Variance accumulates as
    per-batch centered ``(n, mean, M2)`` partials merged with the
    parallel (Chan) update — the naive ``E[x²] − mean²`` form
    catastrophically cancels for large-magnitude values while SQL's
    STDDEV_POP is stable (review finding r4).  The score is rounded
    half-AWAY (matching SQL ROUND, not numpy's half-even) to
    ``decimals`` so the hash compare is exact despite ulp drift."""
    import pyarrow.compute as pc
    import ray

    from .groupagg import append_bucket_column, default_num_buckets

    key_type = _schema_of(ds).field(key_col).type
    if num_buckets is None:
        num_buckets = default_num_buckets()

    def moments(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        vals = batch.column(value_col)
        ok = pc.and_(pc.is_valid(vals), pc.is_valid(keys))
        keys, vals = keys.filter(ok), vals.filter(ok)
        v = vals.to_numpy(zero_copy_only=False).astype(np.float64)
        codes, uniques = pd.factorize(keys.to_pandas())
        n = np.bincount(codes, minlength=len(uniques)).astype(np.float64)
        s = np.bincount(codes, weights=v, minlength=len(uniques))
        with np.errstate(invalid="ignore"):
            mean = np.where(n > 0, s / np.maximum(n, 1), 0.0)
        # centered second moment per key — stable for any magnitude
        dev = v - mean[codes]
        m2 = np.bincount(codes, weights=dev * dev, minlength=len(uniques))
        return pa.table({
            key_col: pa.Array.from_pandas(pd.Series(uniques), type=key_type),
            "_n": pa.array(n.astype(np.int64)),
            "_mean": pa.array(mean, pa.float64()),
            "_m2": pa.array(m2, pa.float64()),
        })

    def merge_bucket(group: pd.DataFrame) -> pa.Table:
        codes, uniques = pd.factorize(group[key_col])
        order = np.argsort(codes, kind="stable")
        n_arr = group["_n"].to_numpy()[order].astype(np.float64)
        mean_arr = group["_mean"].to_numpy()[order]
        m2_arr = group["_m2"].to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, np.diff(codes[order]) != 0])
        bounds = np.r_[starts, len(codes)]
        out_n = np.empty(len(starts))
        out_mean = np.empty(len(starts))
        out_m2 = np.empty(len(starts))
        for gi in range(len(starts)):
            lo, hi = bounds[gi], bounds[gi + 1]
            n, mean, m2 = n_arr[lo], mean_arr[lo], m2_arr[lo]
            for j in range(lo + 1, hi):  # Chan parallel-variance merge
                nb, mb, qb = n_arr[j], mean_arr[j], m2_arr[j]
                tot = n + nb
                delta = mb - mean
                m2 = m2 + qb + delta * delta * n * nb / tot
                mean = mean + delta * nb / tot
                n = tot
            out_n[gi], out_mean[gi], out_m2[gi] = n, mean, m2
        with np.errstate(invalid="ignore"):
            std = np.sqrt(np.maximum(out_m2 / np.maximum(out_n, 1), 0.0))
        return pa.table({
            key_col: pa.Array.from_pandas(
                pd.Series(uniques[codes[order][starts]]), type=key_type
            ),
            "_mean": pa.array(out_mean, pa.float64()),
            "_std": pa.array(std, pa.float64()),
        })

    stats = (
        ds.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda b: append_bucket_column(b, [key_col], num_buckets),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(merge_bucket, batch_format="pandas")
    )
    # per-key stats table: #distinct keys rows — the broadcast side
    tbls = [t for t in ray.get(stats.to_arrow_refs()) if t.num_rows]
    if tbls:
        st = pa.concat_tables(tbls)
        key_index = pd.Index(st.column(key_col).to_pandas())
        means = st.column("_mean").to_numpy(zero_copy_only=False)
        stds = st.column("_std").to_numpy(zero_copy_only=False)
    else:
        key_index = pd.Index([])
        means = stds = np.empty(0)
    lut_ref = ray.put((key_index, means, stds))

    def normalize(batch: pa.Table) -> pa.Table:
        key_index, means, stds = ray.get(lut_ref)
        keys_col = batch.column(key_col)
        valid_key = pc.is_valid(keys_col).to_numpy(zero_copy_only=False)
        keys = keys_col.to_pandas()
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        idx = key_index.get_indexer(pd.Index(keys))
        z = np.full(len(v), np.nan)
        hit = (idx >= 0) & valid_key
        if hit.any():
            mean = means[idx[hit]]
            std = stds[idx[hit]]
            vv = v[hit]
            with np.errstate(invalid="ignore", divide="ignore"):
                zz = np.where(std > 0, (vv - mean) / std, np.nan)
            # half-away rounding (SQL ROUND), not numpy's half-even
            scale = 10.0 ** decimals
            z[hit] = np.where(
                np.isnan(zz),
                np.nan,
                np.sign(zz) * np.floor(np.abs(zz) * scale + 0.5) / scale,
            )
        return batch.append_column(out_col, pa.array(z, pa.float64()))

    return ds.map_batches(
        normalize, batch_format="pyarrow", zero_copy_batch=True
    )


def robust_scale_per_key(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    *,
    out_col: str = "r",
    decimals: int = 6,
) -> rd.Dataset:
    """Per-key robust (median/IQR) normalization — the outlier-tolerant
    twin of ``zscore_per_key``: (1) exact per-key quantiles by rank
    selection (``grouped_quantiles`` — discrete, so every cutpoint is a
    real data element and a SQL row_number oracle matches exactly),
    (2) the tiny per-key (median, IQR) table broadcasts via ``ray.put``
    and every batch normalizes vectorized — the fact table itself is
    never shuffled.

    Null key/value, unseen keys (all-null groups) and IQR == 0 yield a
    null score.  Same key-cardinality contract as ``grouped_quantiles``
    (each key's values shuffle to one worker): meant for categorical
    keys, not near-unique ones.  Rounded half-AWAY to ``decimals`` like
    the z-score, so hash compares are exact."""
    import pyarrow.compute as pc
    import ray

    key_type = _schema_of(ds).field(key_col).type

    def keep(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.is_valid(batch.column(key_col)),
            pc.is_valid(batch.column(value_col)),
        )
        return batch.select([key_col, value_col]).filter(ok)

    q = grouped_quantiles(
        ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True),
        key_col=key_col,
        value_col=value_col,
        qs=(0.25, 0.5, 0.75),
    ).to_pandas()
    if len(q):
        wide = q.pivot_table(index=key_col, columns="q", values="value")
        key_index = pd.Index(wide.index)
        med = wide[0.5].to_numpy(dtype=np.float64)
        iqr = (wide[0.75] - wide[0.25]).to_numpy(dtype=np.float64)
    else:
        key_index = pd.Index([])
        med = iqr = np.empty(0)
    lut_ref = ray.put((key_index, med, iqr))

    def normalize(batch: pa.Table) -> pa.Table:
        key_index, med, iqr = ray.get(lut_ref)
        keys_col = batch.column(key_col)
        valid_key = pc.is_valid(keys_col).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        idx = key_index.get_indexer(pd.Index(keys_col.to_pandas()))
        r = np.full(len(v), np.nan)
        hit = (idx >= 0) & valid_key
        if hit.any():
            m, w = med[idx[hit]], iqr[idx[hit]]
            with np.errstate(invalid="ignore", divide="ignore"):
                rr = np.where(w > 0, (v[hit] - m) / w, np.nan)
            scale = 10.0 ** decimals
            # half-away rounding (SQL ROUND), not numpy's half-even
            r[hit] = np.where(
                np.isnan(rr),
                np.nan,
                np.sign(rr) * np.floor(np.abs(rr) * scale + 0.5) / scale,
            )
        return batch.append_column(out_col, pa.array(r, pa.float64()))

    return ds.map_batches(
        normalize, batch_format="pyarrow", zero_copy_batch=True
    )


def histogram_fixed(
    ds: rd.Dataset,
    value_col: str,
    *,
    lo: float,
    hi: float,
    nbins: int,
) -> rd.Dataset:
    """Fixed-width histogram with EXPLICIT bucket arithmetic —
    ``bucket = clip(floor((v − lo) / width), 0, nbins−1)`` — so a SQL
    oracle recomputes bit-identical buckets (numpy's ``histogram``
    treats the last edge differently and would disagree at boundaries).
    Out-of-range values clamp to the edge buckets; nulls are dropped
    but counted in the ``n_null`` row (bucket −1).  Per-batch bincount
    partials, one tiny merge — the classic mergeable profile lane."""
    import pyarrow.compute as pc

    width = (hi - lo) / nbins

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(value_col)
        n_null = col.null_count
        v = col.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(
            np.floor((v - lo) / width), 0, nbins - 1
        ).astype(np.int64) if len(v) else np.empty(0, np.int64)
        counts = np.bincount(b, minlength=nbins)
        return pa.table(
            {
                "bucket": pa.array(
                    np.r_[-1, np.arange(nbins)].astype(np.int64)
                ),
                "n": pa.array(np.r_[n_null, counts].astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .sum("n")
        .map_batches(
            # drop empty buckets (incl. a zero null-row) — SQL GROUP BY
            # only emits groups that exist
            lambda t: pa.table(
                {
                    "bucket": t.column("bucket"),
                    "n": t.column("sum(n)").cast(pa.int64()),
                }
            ).filter(pc.greater(t.column("sum(n)"), 0)),
            batch_format="pyarrow",
        )
    )


def rollup_agg(
    ds: rd.Dataset,
    levels: list[str],
    value_col: str,
    *,
    cube: bool = False,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """``GROUP BY ROLLUP(levels...)`` analog (``cube=True`` → ``GROUP
    BY CUBE``: every SUBSET of ``levels``, not just prefixes): count +
    sum at each grouping set, with the rolled-up columns null.  The
    finest level reduces the RAW table once (via the bucketed reduce);
    every other grouping set re-aggregates the finest (already tiny)
    result — sum-of-sums/sum-of-counts are re-entrant — so the raw
    table is read and shuffled exactly once no matter how many sets
    roll up.  Sum is kept on the integer-cents grid (``value × 100``
    as int64) so the oracle compare is exact."""
    import pyarrow.compute as pc

    from .groupagg import bucketed_group_agg

    def to_cents(batch: pa.Table) -> pa.Table:
        # floor(x·100 + 0.5): the engine's standard SQL-ROUND-matching
        # cents grid (Arrow's round is half-even; assumes non-negative
        # values — see the oracle-float-ties note in BASELINE.md)
        cents = pc.cast(
            pc.floor(
                pc.add(pc.multiply(batch.column(value_col), 100.0), 0.5)
            ),
            pa.int64(),
        )
        return batch.select(levels).append_column("_cents", cents)

    sch = _schema_of(ds)
    level_types = {c: sch.field(c).type for c in levels}

    finest = bucketed_group_agg(
        ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        levels,
        [("n", "_cents", "count"), ("sum_cents", "_cents", "sum")],
        num_buckets=num_buckets,
    ).materialize()

    if cube:
        from itertools import combinations

        grouping_sets = [
            list(c)
            for r in range(len(levels) - 1, -1, -1)
            for c in combinations(levels, r)
        ]
    else:
        grouping_sets = [levels[:d] for d in range(len(levels) - 1, -1, -1)]

    out_levels = [finest]
    for keys in grouping_sets:
        null_cols = tuple(c for c in levels if c not in keys)

        # every other grouping set folds the finest result — tiny input
        if keys:
            lvl = bucketed_group_agg(
                finest.map_batches(
                    lambda b, _n=null_cols: b.drop_columns(list(_n)),
                    batch_format="pyarrow",
                ),
                keys,
                [("n", "n", "sum"), ("sum_cents", "sum_cents", "sum")],
                num_buckets=num_buckets,
            ).map_batches(
                lambda b, _n=null_cols, _k=tuple(keys): pa.table(
                    {
                        **{c: b.column(c) for c in _k},
                        **{
                            c: pa.nulls(b.num_rows, level_types[c])
                            for c in _n
                        },
                        "n": b.column("n"),
                        "sum_cents": b.column("sum_cents"),
                    }
                ).select(list(levels) + ["n", "sum_cents"]),
                batch_format="pyarrow",
            ).materialize()
        else:
            # grand total: one-row fold of the finest result
            t = pa.concat_tables(
                [b for b in finest.iter_batches(batch_format="pyarrow")
                 if b.num_rows],
                promote_options="default",
            )
            cols = {
                c: pa.nulls(1, level_types[c]) for c in levels
            }
            cols["n"] = pa.array(
                [pc.sum(t.column("n")).as_py() or 0], pa.int64()
            )
            cols["sum_cents"] = pa.array(
                [pc.sum(t.column("sum_cents")).as_py() or 0], pa.int64()
            )
            lvl = rd.from_arrow(pa.table(cols))
        out_levels.append(lvl)

    out = out_levels[0]
    for lvl in out_levels[1:]:
        out = out.union(lvl)
    return out


def grouped_quantiles_cont(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    decimals: int = 6,
) -> rd.Dataset:
    """INTERPOLATED per-group quantiles (SQL ``PERCENTILE_CONT`` /
    DuckDB ``quantile_cont``, numpy type-7 linear): at rank
    ``h = (n−1)·q``, ``v[⌊h⌋] + (h−⌊h⌋)·(v[⌈h⌉] − v[⌊h⌋])`` — verified
    formula-identical to DuckDB's.  Rounded half-AWAY to ``decimals``
    so the hash compare absorbs any last-ulp divergence.  Same
    key-cardinality contract as ``grouped_quantiles`` (each group's
    values shuffle to one worker); null values are excluded."""
    q_arr = np.asarray(qs, dtype=np.float64)
    scale = 10.0 ** decimals

    def per_group(group: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(group[value_col].dropna().to_numpy(dtype=np.float64))
        n = len(v)
        if n == 0:
            return pd.DataFrame(
                {key_col: pd.Series(dtype=group[key_col].dtype),
                 "q": pd.Series(dtype=np.float64),
                 "value": pd.Series(dtype=np.float64)}
            )
        h = (n - 1) * q_arr
        lo = np.floor(h).astype(np.int64)
        hi = np.ceil(h).astype(np.int64)
        val = v[lo] + (h - lo) * (v[hi] - v[lo])
        val = np.sign(val) * np.floor(np.abs(val) * scale + 0.5) / scale
        return pd.DataFrame(
            {
                key_col: [group[key_col].iloc[0]] * len(q_arr),
                "q": q_arr,
                "value": val,
            }
        )

    return ds.groupby(key_col).map_groups(per_group, batch_format="pandas")


def corr_per_key(
    ds: rd.Dataset,
    key_col: str,
    x_col: str,
    y_col: str,
    *,
    decimals: int = 6,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-key Pearson correlation (SQL ``CORR(y, x)``) — e.g. value
    drift over time per category.  Per-batch CENTERED comoment partials
    ``(n, mean_x, mean_y, M2x, M2y, Cxy)`` merged with the parallel
    (Chan) update — the naive E[xy]−E[x]E[y] form catastrophically
    cancels for large-magnitude columns like epoch-microsecond
    timestamps, exactly as variance did for ``zscore_per_key``.  Rows
    with a null key/x/y are excluded; keys with n < 2 or zero variance
    on either side yield a null r (matching SQL CORR).  Rounded
    half-away to ``decimals``."""
    import pyarrow.compute as pc

    from .groupagg import append_bucket_column, default_num_buckets

    key_type = _schema_of(ds).field(key_col).type
    if num_buckets is None:
        num_buckets = default_num_buckets()

    def moments(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        xs = batch.column(x_col)
        ys = batch.column(y_col)
        ok = pc.and_(
            pc.and_(pc.is_valid(xs), pc.is_valid(ys)), pc.is_valid(keys)
        )
        keys, xs, ys = keys.filter(ok), xs.filter(ok), ys.filter(ok)
        x = xs.to_numpy(zero_copy_only=False).astype(np.float64)
        y = ys.to_numpy(zero_copy_only=False).astype(np.float64)
        codes, uniques = pd.factorize(keys.to_pandas())
        n = np.bincount(codes, minlength=len(uniques)).astype(np.float64)
        safe_n = np.maximum(n, 1)
        mx = np.bincount(codes, weights=x, minlength=len(uniques)) / safe_n
        my = np.bincount(codes, weights=y, minlength=len(uniques)) / safe_n
        dx = x - mx[codes]
        dy = y - my[codes]
        m2x = np.bincount(codes, weights=dx * dx, minlength=len(uniques))
        m2y = np.bincount(codes, weights=dy * dy, minlength=len(uniques))
        cxy = np.bincount(codes, weights=dx * dy, minlength=len(uniques))
        return pa.table({
            key_col: pa.Array.from_pandas(pd.Series(uniques), type=key_type),
            "_n": pa.array(n.astype(np.int64)),
            "_mx": pa.array(mx, pa.float64()),
            "_my": pa.array(my, pa.float64()),
            "_m2x": pa.array(m2x, pa.float64()),
            "_m2y": pa.array(m2y, pa.float64()),
            "_cxy": pa.array(cxy, pa.float64()),
        })

    def merge_bucket(group: pd.DataFrame) -> pa.Table:
        codes, uniques = pd.factorize(group[key_col])
        order = np.argsort(codes, kind="stable")
        arrs = {
            c: group[c].to_numpy()[order].astype(np.float64)
            for c in ("_n", "_mx", "_my", "_m2x", "_m2y", "_cxy")
        }
        starts = np.flatnonzero(np.r_[True, np.diff(codes[order]) != 0])
        bounds = np.r_[starts, len(codes)]
        out = {k: np.empty(len(starts)) for k in ("n", "r")}
        scale = 10.0 ** decimals
        for gi in range(len(starts)):
            lo, hi = bounds[gi], bounds[gi + 1]
            n = arrs["_n"][lo]; mx = arrs["_mx"][lo]; my = arrs["_my"][lo]
            m2x = arrs["_m2x"][lo]; m2y = arrs["_m2y"][lo]; cxy = arrs["_cxy"][lo]
            for j in range(lo + 1, hi):  # Chan parallel comoment merge
                nb = arrs["_n"][j]
                tot = n + nb
                dx = arrs["_mx"][j] - mx
                dy = arrs["_my"][j] - my
                m2x += arrs["_m2x"][j] + dx * dx * n * nb / tot
                m2y += arrs["_m2y"][j] + dy * dy * n * nb / tot
                cxy += arrs["_cxy"][j] + dx * dy * n * nb / tot
                mx += dx * nb / tot
                my += dy * nb / tot
                n = tot
            if n < 2 or m2x <= 0 or m2y <= 0:
                r = np.nan
            else:
                r = cxy / np.sqrt(m2x * m2y)
                r = np.sign(r) * np.floor(abs(r) * scale + 0.5) / scale
            out["n"][gi] = n
            out["r"][gi] = r
        return pa.table({
            key_col: pa.Array.from_pandas(
                pd.Series(uniques[codes[order][starts]]), type=key_type
            ),
            "n": pa.array(out["n"].astype(np.int64)),
            "r": pa.array(out["r"], pa.float64()),
        })

    return (
        ds.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda b: append_bucket_column(b, [key_col], num_buckets),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby("_bucket")
        .map_groups(merge_bucket, batch_format="pandas")
    )

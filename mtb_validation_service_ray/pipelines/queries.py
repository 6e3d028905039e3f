"""Driver-contract query catalog.

One entry per operator family from SURVEY.md §2, expressed over the
driver-generated TPC-H-ish tables (TESTDATA.md) so the DuckDB oracle can
verify row-counts + schema + values side-by-side, plus rows-only entries
for non-SQL-expressible ops (sketches, LSH, image validation).

Conventions (driver compare contract):
* every computed column carries the SAME name in the Ray result and the
  oracle SQL;
* floats that aggregate across rows are rounded with DuckDB's
  round-half-away-from-zero semantics on BOTH sides (``_round_away``);
* counts are int64 (`CAST(... AS BIGINT)` in SQL).

Scale notes: each query is written the way it would run at 10^12 rows —
column-pruned reads, vectorized map_batches, partial aggregation before
shuffles, broadcast semi/anti joins — even though the driver runs them
at sf=0.01.
"""

from __future__ import annotations

import functools
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.textfn import (
    CJK_PATTERN,
    STOPWORDS,
    TOKEN_PATTERN,
    detect_language,
    fingerprint64,
    quality_counts,
    token_counts,
)
from ..schema import PARTITION_COL
from ..sources.fixtures import make_image_rows
from ..stages.dedup import duplicate_groups, minhash_lsh_candidates, simhash_candidates
from ..stages.similarity import cosine_near_dups, knn_brute
from ..stages.stats import profile_stats, stats_report
from ..stages.windows import latest_event_per_key, session_windows, tumbling_window_agg
from .validate import run_validation, run_validation_fused


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _pool_size(cap: int = 4) -> int:
    """Fixed actor-pool size that can NEVER cover every CPU: a pool
    summing to the whole cluster starves the read tasks and deadlocks
    the pipeline (a pinned concurrency=4 hung every dedup query on a
    4-CPU session).  Capped because pool spawn cost dominates these
    small bench inputs beyond a handful of actors."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(1, min(cap, cpus - 1, cpus // 2))


def _round_away(arr, digits: int):
    """Round half away from zero — DuckDB ``ROUND`` semantics (numpy and
    Python round are half-to-even; mixing them breaks value hashes)."""
    a = np.asarray(arr, dtype=np.float64)
    factor = 10.0**digits
    return np.sign(a) * np.floor(np.abs(a) * factor + 0.5) / factor


def _as_table(ds: rd.Dataset) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
    return pa.concat_tables(batches) if batches else pa.table({})


def _with_schema(ds: rd.Dataset | pa.Table, schema: pa.Schema) -> pa.Table:
    """Materialize with a pinned schema — an empty result keeps its
    columns (a filter that drops every row must still hash-compare
    against the oracle's empty relation)."""
    t = ds if isinstance(ds, pa.Table) else _as_table(ds)
    if t.num_rows == 0:
        return schema.empty_table()
    return t.select(schema.names).cast(schema)


# ---------------------------------------------------------------------------
# Validation-kernel queries (SURVEY.md §2.0/§2.1 families on testdata)
# ---------------------------------------------------------------------------


def q_check_range_quantity(sf_dir: str):
    """Closed-interval range rule (R-RG family; ClosedInterval
    containment, MTBValidators.scala:363) on lineitem.l_quantity."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])

    def flag(batch: pa.Table) -> pa.Table:
        q = batch.column("l_quantity")
        bad = pc.or_(pc.less(q, 1.0), pc.greater(q, 30.0))
        return batch.filter(pc.fill_null(bad, True))

    return _with_schema(
        ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema([
            pa.field("l_orderkey", pa.int64()),
            pa.field("l_linenumber", pa.int32()),
            pa.field("l_quantity", pa.float64()),
        ]),
    )


def q_check_valueset_returnflag(sf_dir: str):
    """Value-set membership rule (R-VS family; csCodingValidator,
    MTBValidators.scala:144) summarized per code."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag"])
    agg = ds.groupby("l_returnflag").aggregate(Count(alias_name="n"))

    def validity(batch: pa.Table) -> pa.Table:
        ok = pc.is_in(
            batch.column("l_returnflag"),
            value_set=pa.array(["A", "N", "R"], pa.string()),
        )
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "n": batch.column("n").cast(pa.int64()),
                "valid": pc.cast(ok, pa.int64()),
            }
        )

    return agg.map_batches(validity, batch_format="pyarrow")


def q_check_presence_documents(sf_dir: str):
    """Presence rule (R-PR family; `must be (defined)`,
    MTBValidators.scala:242-244): null/empty counts over documents."""
    ds = _read(sf_dir, "documents", ["text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        missing_text = pc.or_(
            pc.is_null(text), pc.equal(pc.utf8_length(pc.fill_null(text, "")), 0)
        )
        return pa.table(
            {
                "n_rows": pa.array([len(batch)], pa.int64()),
                "n_text_missing": pa.array(
                    [pc.sum(pc.cast(missing_text, pa.int64())).as_py() or 0], pa.int64()
                ),
                "n_lang_missing": pa.array(
                    [batch.column("lang").null_count], pa.int64()
                ),
            }
        )

    partials = _as_table(ds.map_batches(partial, batch_format="pyarrow"))
    return pa.table(
        {
            "n_rows": pa.array([pc.sum(partials.column("n_rows")).as_py()], pa.int64()),
            "n_text_missing": pa.array(
                [pc.sum(partials.column("n_text_missing")).as_py()], pa.int64()
            ),
            "n_lang_missing": pa.array(
                [pc.sum(partials.column("n_lang_missing")).as_py()], pa.int64()
            ),
        }
    )


def q_check_regex_doc_start(sf_dir: str):
    """Regex plausibility rule (R-RE family; TNM.scala:12-18): documents
    whose text does not start with a lowercase letter."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def flag(batch: pa.Table) -> pa.Table:
        ok = pc.match_substring_regex(pc.fill_null(batch.column("text"), ""), "^[a-z]")
        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64())}
        ).filter(pc.invert(ok))

    return _with_schema(
        ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema([pa.field("doc_id", pa.int64())]),
    )


def q_check_xfield_nchars(sf_dir: str):
    """Cross-field consistency rule (R-XF family; derived-quantity
    equality, MTBValidators.scala:245-247): stored n_chars must equal
    the observed text length."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def flag(batch: pa.Table) -> pa.Table:
        obs = pc.utf8_length(pc.fill_null(batch.column("text"), ""))
        bad = pc.not_equal(obs.cast(pa.int64()), batch.column("n_chars").cast(pa.int64()))
        return pa.table({"doc_id": batch.column("doc_id").cast(pa.int64())}).filter(
            pc.fill_null(bad, True)
        )

    return _with_schema(
        ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema([pa.field("doc_id", pa.int64())]),
    )


def q_check_unique_orderkey(sf_dir: str):
    """Uniqueness scan (R-UQ family; exactly-one cardinality,
    MTBValidators.scala:696-698): orderkeys occurring more than once in
    lineitem — partial counts per batch, then the custom bucket-actor
    hash reduce (stages/hashreduce.py) instead of Ray's sort-based
    Aggregate, whose per-output-partition floor dominated this query
    (8.8 s → the reduce is one mailbox exchange + vectorized folds)."""
    from ..stages.hashreduce import hash_reduce

    ds = _read(sf_dir, "lineitem", ["l_orderkey"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["l_orderkey"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "l_orderkey": g.column("l_orderkey"),
                "cnt": g.column("count_all").cast(pa.int64()),
            }
        )

    agg = hash_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        "l_orderkey", [("cnt", "sum")],
    )

    def dups(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey").cast(pa.int64()),
                "n": batch.column("cnt").cast(pa.int64()),
            }
        ).filter(pc.greater(batch.column("cnt"), 1))

    return _with_schema(
        agg.map_batches(dups, batch_format="pyarrow"),
        pa.schema([pa.field("l_orderkey", pa.int64()), pa.field("n", pa.int64())]),
    )


def q_check_cardinality_lang(sf_dir: str):
    """Collection-cardinality guard (the reference's 8 collection
    non-empty warnings + count inequalities, MTBValidators.scala:699-733,
    promoted to dataset level): language groups holding fewer than 75
    documents — per-batch partial counts, one tiny groupby."""

    ds = _read(sf_dir, "documents", ["lang"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["lang"]).aggregate([([], "count_all")])
        return pa.table(
            {"lang": g.column("lang"),
             "cnt": g.column("count_all").cast(pa.int64())}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("cnt", alias_name="n"))
    )

    def thin(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"lang": batch.column("lang"),
             "n": batch.column("n").cast(pa.int64())}
        ).filter(pc.less(batch.column("n"), 75))

    return _with_schema(
        agg.map_batches(thin, batch_format="pyarrow"),
        pa.schema([("lang", pa.string()), ("n", pa.int64())]),
    )


def q_check_ref_users_without_purchase(sf_dir: str):
    """Referential anti-join (R-REF-ORPHAN family; claim without
    response ⇒ warning, MTBValidators.scala:621-623): users with no
    purchase event, via a broadcast key set — no shuffle join."""
    events = _read(sf_dir, "events", ["user_id", "event_type"])
    purchasers = events.map_batches(
        lambda b: pa.table(
            {"user_id": pc.unique(
                b.filter(pc.equal(b.column("event_type"), "purchase")).column("user_id")
            )}
        ),
        batch_format="pyarrow",
    )
    key_set = pc.unique(_as_table(purchasers).column("user_id"))
    key_ref = ray.put(key_set)

    def orphan_users(batch: pa.Table) -> pa.Table:
        keys = ray.get(key_ref)
        uniq = pc.unique(batch.column("user_id"))
        missing = pc.invert(pc.is_in(uniq, value_set=keys))
        return pa.table({"user_id": uniq.filter(missing).cast(pa.int64())})

    candidates = events.map_batches(orphan_users, batch_format="pyarrow")
    # batch-local unique → one final distinct
    distinct = candidates.groupby("user_id").aggregate(
        Count(alias_name="_n")
    ).select_columns(["user_id"])
    return _with_schema(distinct, pa.schema([pa.field("user_id", pa.int64())]))


# ---------------------------------------------------------------------------
# Aggregation / sort / window queries (SURVEY.md §2.3)
# ---------------------------------------------------------------------------


def q_agg_pricing_summary(sf_dir: str):
    """TPC-H-Q1-style grouped aggregate with partial aggregation inside
    map_batches before the (tiny) groupby shuffle."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        t = batch.append_column("disc_price", disc_price)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("l_quantity", "count")]
        )
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag"),
                "l_linestatus": g.column("l_linestatus"),
                "s_qty": g.column("l_quantity_sum"),
                "s_price": g.column("l_extendedprice_sum"),
                "s_disc": g.column("disc_price_sum"),
                "cnt": g.column("l_quantity_count").cast(pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        # the partial stream is ≤ a few rows per input block — coalesce
        # before the sort-based aggregate (cost scales with input
        # blocks × output partitions, BASELINE.md decision #4)
        .repartition(4)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("s_qty", alias_name="t_qty"),
            Sum("s_price", alias_name="t_price"),
            Sum("s_disc", alias_name="t_disc"),
            Sum("cnt", alias_name="n"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "sum_qty": pa.array(
                    _round_away(batch.column("t_qty").to_numpy(zero_copy_only=False), 2)
                ),
                "sum_base_price": pa.array(
                    _round_away(batch.column("t_price").to_numpy(zero_copy_only=False), 2)
                ),
                "sum_disc_price": pa.array(
                    _round_away(batch.column("t_disc").to_numpy(zero_copy_only=False), 2)
                ),
                "avg_qty": pa.array(
                    _round_away(
                        batch.column("t_qty").to_numpy(zero_copy_only=False) / n, 4
                    )
                ),
                "count_order": batch.column("n").cast(pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def q_agg_latest_event_per_user(sf_dir: str):
    """Grouped arg-max (lastResponsesByTherapy analog,
    MTBValidators.scala:686-692)."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    out = latest_event_per_key(ds, key_col="user_id", ts_col="ts")

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id").cast(pa.int64()),
                # string timestamps: pandas µs/ns resolution varies by
                # conversion path and breaks value hashes
                "last_ts": pc.strftime(
                    batch.column("last_ts"), format="%Y-%m-%d %H:%M:%S"
                ),
                "n_events": batch.column("n_events").cast(pa.int64()),
            }
        )

    return out.map_batches(cast, batch_format="pyarrow")


def q_agg_daily_events(sf_dir: str):
    """Tumbling-window aggregate over the events log."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    out = tumbling_window_agg(ds, ts_col="ts", key_col="event_type", window="day")

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": pc.strftime(
                    batch.column("window_start"), format="%Y-%m-%d %H:%M:%S"
                ),
                "event_type": batch.column("event_type"),
                "n_events": batch.column("n_events").cast(pa.int64()),
                "sum_value": pa.array(
                    _round_away(
                        batch.column("sum_value").to_numpy(zero_copy_only=False), 2
                    )
                ),
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def q_agg_top5_users_by_value(sf_dir: str):
    """Sort / top-k: 5 highest-spending users, deterministic tiebreak.

    Distributed top-k: each block of per-user aggregates keeps only its
    local top-5 (vectorized argpartition-style select), and the driver
    merges the tiny #blocks×5 candidate stream — the knn_brute merge
    pattern; the full per-user aggregate never lands on the driver."""
    ds = _read(sf_dir, "events", ["user_id", "value"])
    agg = ds.groupby("user_id").aggregate(Sum("value", alias_name="t"))
    k = 5

    def local_topk(batch: pa.Table) -> pa.Table:
        t = _round_away(batch.column("t").to_numpy(zero_copy_only=False), 2)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, -t))[:k]
        return pa.table(
            {
                "user_id": pa.array(uid[order].astype(np.int64), pa.int64()),
                "total_value": pa.array(t[order], pa.float64()),
            }
        )

    cands = _as_table(agg.map_batches(local_topk, batch_format="pyarrow"))
    uid = cands.column("user_id").to_numpy(zero_copy_only=False)
    tv = cands.column("total_value").to_numpy(zero_copy_only=False)
    order = np.lexsort((uid, -tv))[:k]
    return pa.table(
        {
            "user_id": pa.array(uid[order], pa.int64()),
            "total_value": pa.array(tv[order], pa.float64()),
        }
    )


def q_stats_profile_lineitem(sf_dir: str):
    """Column-stats roll-up per group (north-rule stats family)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    agg = ds.groupby("l_returnflag").aggregate(
        Count(alias_name="n"),
        Min("l_quantity", alias_name="min_qty"),
        Max("l_quantity", alias_name="max_qty"),
        Sum("l_quantity", alias_name="s_qty"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "n": batch.column("n").cast(pa.int64()),
                "min_qty": batch.column("min_qty"),
                "max_qty": batch.column("max_qty"),
                "avg_qty": pa.array(
                    _round_away(
                        batch.column("s_qty").to_numpy(zero_copy_only=False) / n, 4
                    )
                ),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def q_stats_salted_returnflag(sf_dir: str):
    """Skew-safe grouped stats: the salted two-stage aggregate
    (stages/salt.py) on the 3-value, heavily skewed l_returnflag key —
    exact, with the hot key spread over S reducers (SURVEY.md §4)."""
    from ..stages.salt import salted_groupby_sum

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    out = salted_groupby_sum(ds, "l_returnflag", ["l_quantity"], salt=16)

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = batch.column("sum_l_quantity").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "n": batch.column("n").cast(pa.int64()),
                "avg_qty": pa.array(_round_away(s / np.maximum(n, 1), 4)),
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def q_distinct_users_exact(sf_dir: str):
    """Exact distinct count (the HLL query's ground truth)."""
    ds = _read(sf_dir, "events", ["user_id"])
    n = ds.groupby("user_id").aggregate(Count(alias_name="_")).count()
    return pa.table({"n_distinct": pa.array([n], pa.int64())})


def q_join_revenue_by_region(sf_dir: str):
    """Star join done scale-safe (VERDICT r1 #5): only TRUE dimensions
    broadcast (nation⋈region, 25 rows); the fact-sized legs run as
    native hash-partitioned joins — customer→region is mapped
    distributively, orders⋈customer and lineitem⋈orders are
    ``Dataset.join``s, and lineitem pre-aggregates per batch before its
    join so the shuffled side is (orderkey, partial-revenue), never raw
    line items.  Nothing orders-sized ever lands on the driver."""
    n_parts = max(8, int(ray.cluster_resources().get("CPU", 8)))

    region = _as_table(_read(sf_dir, "region")).to_pandas()
    nation = _as_table(_read(sf_dir, "nation")).to_pandas()
    nation_region = dict(
        zip(
            nation.n_nationkey,
            nation.merge(
                region, left_on="n_regionkey", right_on="r_regionkey"
            ).r_name,
        )
    )
    nr_ref = ray.put(nation_region)

    def add_region(batch: pa.Table) -> pa.Table:
        import pandas as pd

        nr = ray.get(nr_ref)
        keys = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_custkey": batch.column("c_custkey"),
                "r_name": pa.array(
                    pd.Series(keys).map(nr).to_numpy(dtype=object), pa.string()
                ),
            }
        )

    cust_region = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        add_region, batch_format="pyarrow", zero_copy_batch=True
    )
    order_region = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).join(
        cust_region, join_type="inner", num_partitions=n_parts,
        on=("o_custkey",), right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "r_name"])

    def li_partial(batch: pa.Table) -> pa.Table:
        revenue = (
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - batch.column("l_discount").to_numpy(zero_copy_only=False))
        )
        t = pa.table(
            {"l_orderkey": batch.column("l_orderkey"),
             "rev": pa.array(revenue, pa.float64())}
        )
        g = t.group_by(["l_orderkey"]).aggregate([("rev", "sum")])
        return pa.table(
            {"l_orderkey": g.column("l_orderkey"), "rev": g.column("rev_sum")}
        )

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)

    joined = li.join(
        order_region, join_type="inner", num_partitions=n_parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    agg = joined.select_columns(["r_name", "rev"]).groupby("r_name").aggregate(
        Sum("rev", alias_name="t_rev")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "r_name": batch.column("r_name"),
                "revenue": pa.array(
                    _round_away(batch.column("t_rev").to_numpy(zero_copy_only=False), 2)
                ),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def q_parse_props_k(sf_dir: str):
    """Parser/normalizer family: extract the integer ``k`` from the JSON
    ``props`` column with a vectorized RE2 capture, aggregate per event
    type (the reference's parsing = its JSON codecs, SURVEY.md §1.1)."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        extracted = pc.extract_regex(
            pc.fill_null(batch.column("props"), ""), r'"k":\s*(?P<k>\d+)'
        )
        k = pc.cast(pc.struct_field(extracted, "k"), pa.int64())
        t = pa.table({"event_type": batch.column("event_type"), "k": k})
        g = t.group_by(["event_type"]).aggregate([("k", "sum"), ("k", "count")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "s": g.column("k_sum"),
                "c": g.column("k_count").cast(pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).groupby(
        "event_type"
    ).aggregate(Sum("s", alias_name="sum_k"), Sum("c", alias_name="n_k"))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "sum_k": batch.column("sum_k").cast(pa.int64()),
                "n_k": batch.column("n_k").cast(pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def q_agg_user_type_fold(sf_dir: str):
    """Date-filter + fold-to-set (MTBMVHService.sequenceTypes analog,
    MTBMVHServiceImpl.scala:51-76): per user, over events after a cutoff
    date, the count of distinct event types and a purchase flag."""
    cutoff = "2024-01-08"
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.greater(batch.column("ts"), pa.scalar(cutoff).cast(pa.timestamp("us")))
        t = batch.filter(keep)
        g = t.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "event_type": g.column("event_type"),
                "one": pa.array([1] * g.num_rows, pa.int64()),
            }
        )

    pairs = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # distinct (user, type) pairs, then fold per user
    distinct = pairs.groupby(["user_id", "event_type"]).aggregate(
        Count(alias_name="_n")
    )

    def fold(batch: pa.Table) -> pa.Table:
        is_purchase = pc.cast(
            pc.equal(batch.column("event_type"), "purchase"), pa.int64()
        )
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "one": pa.array([1] * len(batch), pa.int64()),
                "purch": is_purchase,
            }
        )

    agg = distinct.map_batches(fold, batch_format="pyarrow").groupby(
        "user_id"
    ).aggregate(Sum("one", alias_name="n_types"), Sum("purch", alias_name="purchased"))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id").cast(pa.int64()),
                "n_types": batch.column("n_types").cast(pa.int64()),
                "has_purchase": pc.greater(batch.column("purchased"), 0),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def q_censoring_coalesce(sf_dir: str):
    """Prioritized coalesce (dateOfDeathOrCensoring,
    MTBValidators.scala:159-174): per user, the purchase date if any,
    else the latest event date, else the pinned job 'now' — the hidden
    wall-clock made an explicit parameter."""
    now = "2026-08-17 00:00:00"  # pinned job parameter (no LocalDate.now)
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        is_purchase = pc.equal(batch.column("event_type"), "purchase")
        purchase_ts = pc.if_else(is_purchase, batch.column("ts"), pa.nulls(len(batch), pa.timestamp("us")))
        t = pa.table(
            {
                "user_id": batch.column("user_id"),
                "purchase_ts": purchase_ts,
                "any_ts": batch.column("ts"),
            }
        )
        g = t.group_by(["user_id"]).aggregate(
            [("purchase_ts", "max"), ("any_ts", "max")]
        )
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "p": g.column("purchase_ts_max"),
                "a": g.column("any_ts_max"),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).groupby(
        "user_id"
    ).aggregate(Max("p", alias_name="max_p"), Max("a", alias_name="max_a"))

    def finalize(batch: pa.Table) -> pa.Table:
        pinned = pa.scalar(now).cast(pa.timestamp("us"))
        coalesced = pc.coalesce(batch.column("max_p"), batch.column("max_a"), pinned)
        return pa.table(
            {
                "user_id": batch.column("user_id").cast(pa.int64()),
                "censoring_ts": pc.strftime(coalesced, format="%Y-%m-%d %H:%M:%S"),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Dedup / text / similarity queries (north-rule training-data ops)
# ---------------------------------------------------------------------------


def q_dedup_exact_by_key(sf_dir: str):
    """Exact dedup report keyed by (lang, n_chars) — hash-partition +
    per-group first (vectorized aggregates)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    out = duplicate_groups(ds, ["lang", "n_chars"], id_col="doc_id")

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch.column("lang"),
                "n_chars": batch.column("n_chars").cast(pa.int64()),
                "keep_id": batch.column("keep_id").cast(pa.int64()),
                "n": batch.column("n").cast(pa.int64()),
            }
        )

    return _with_schema(
        out.map_batches(cast, batch_format="pyarrow"),
        pa.schema([
            pa.field("lang", pa.string()),
            pa.field("n_chars", pa.int64()),
            pa.field("keep_id", pa.int64()),
            pa.field("n", pa.int64()),
        ]),
    )


def q_dedup_exact_text(sf_dir: str):
    """Exact dedup on full text (expected clean on this corpus — the
    check proves it)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = duplicate_groups(ds, ["text"], id_col="doc_id")

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "text": batch.column("text"),
                "keep_id": batch.column("keep_id").cast(pa.int64()),
                "n": batch.column("n").cast(pa.int64()),
            }
        )

    return _with_schema(
        out.map_batches(cast, batch_format="pyarrow"),
        pa.schema([
            pa.field("text", pa.string()),
            pa.field("keep_id", pa.int64()),
            pa.field("n", pa.int64()),
        ]),
    )


def q_text_token_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_tokens": token_counts(batch.column("text")).cast(pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_text_quality_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        q = quality_counts(batch.column("text"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_chars_obs": q["n_chars"].cast(pa.int64()),
                "n_alpha": q["n_alpha"].cast(pa.int64()),
                "n_digit": q["n_digit"].cast(pa.int64()),
                "n_space": q["n_space"].cast(pa.int64()),
                "n_tokens": q["n_tokens"].cast(pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_text_langid(sf_dir: str):
    """Language-ID heuristic (stopword/charset argmax) — the SQL oracle
    reproduces the identical argmax (first-max-wins) formula."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "lang_pred": detect_language(batch.column("text")),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_text_fingerprint(sf_dir: str):
    """Document fingerprint (rows-only: the 64-bit hash is not
    reproducible in SQL)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "fingerprint": fingerprint64(batch.column("text")),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_events_sessions_per_user(sf_dir: str):
    """Session windows (1h gap) rolled up per user."""
    from ..stages.hashreduce import hash_reduce

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    sess = session_windows(ds, key_col="user_id", ts_col="ts", gap_seconds=3600.0)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["user_id"]).group_by(["user_id"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"user_id": g.column("user_id"),
             "n_sessions": g.column("count_all").cast(pa.int64())}
        )

    agg = hash_reduce(
        sess.map_batches(partial, batch_format="pyarrow"),
        "user_id", [("n_sessions", "sum")], num_actors=8,
    )

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id").cast(pa.int64()),
                "n_sessions": batch.column("n_sessions").cast(pa.int64()),
            }
        )

    return agg.map_batches(cast, batch_format="pyarrow")


def q_events_sessions_streaming(sf_dir: str):
    """Streaming variant of the sessionizer: the events log streams
    through N parallel feeder tasks straight into the keyed shard-actor
    stage (stages/streaming.py — unbounded-log semantics; the driver
    never touches a batch) and is rolled up per user; hash-checked
    against the same SQL window-function oracle as the offline path.
    The interval fold is order-independent, so no arrival-order sort is
    needed and the result is deterministic despite parallel ingest."""
    from ..stages.streaming import stream_sessions_distributed

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    res = stream_sessions_distributed(
        ds, key_col="user_id", ts_col="ts", gap_seconds=3600.0,
        num_shards=4, num_feeders=4,
    )
    t = res.sessions
    counts = t.group_by(["key"]).aggregate([([], "count_all")])
    return pa.table(
        {
            "user_id": pc.cast(counts.column("key"), pa.int64()),
            "n_sessions": counts.column("count_all").cast(pa.int64()),
        }
    ).sort_by("user_id")


def q_knn_embeddings(sf_dir: str):
    """Brute-force cosine top-10 for the vec_id=0 embedding."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q0 = None
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=1 << 14):
        mask = pc.equal(b.column("vec_id"), 0)
        sub = b.filter(mask)
        if sub.num_rows:
            q0 = np.asarray(sub.column("embedding")[0].as_py(), dtype=np.float64)
            break
    top = knn_brute(ds, q0, k=10, embedding_col="embedding", id_col="vec_id")
    return pa.table(
        {
            "vec_id": top.column("vec_id").cast(pa.int64()),
            "score": pa.array(
                _round_away(top.column("score").to_numpy(zero_copy_only=False), 4)
            ),
        }
    )


def q_knn_ivf_embeddings(sf_dir: str):
    """IVF two-stage ANN top-10 for the vec_id=0 query (rows-only —
    approximate by design; recall vs brute force asserted in tests)."""
    from ..stages.similarity import ivf_knn

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q0 = None
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=1 << 14):
        sub = b.filter(pc.equal(b.column("vec_id"), 0))
        if sub.num_rows:
            q0 = np.asarray(sub.column("embedding")[0].as_py(), dtype=np.float64)
            break
    top = ivf_knn(ds, q0, k=10, n_cells=8, n_probe=4)
    return pa.table(
        {
            "vec_id": top.column("vec_id").cast(pa.int64()),
            "score": pa.array(
                _round_away(top.column("score").to_numpy(zero_copy_only=False), 4)
            ),
        }
    )


def q_text_quality_score(sf_dir: str):
    """Heuristic quality score per document — same closed-form formula
    reproduced in the SQL oracle (deterministic integer ingredients +
    one rounded float)."""
    from ..functions.textfn import quality_score

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        score = quality_score(batch.column("text"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "quality": pa.array(
                    _round_away(
                        np.asarray(score.to_numpy(zero_copy_only=False)), 6
                    )
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_dedup_embedding_cosine(sf_dir: str):
    """Embedding near-dup pairs at cosine ≥ 0.9 (broadcast strategy)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return _with_schema(
        cosine_near_dups(ds, threshold=0.9, id_col="vec_id"),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]),
    )


def q_dedup_ngram_jaccard(sf_dir: str):
    """n-gram Jaccard near-dup: MinHash-LSH candidate generation →
    exact shingle-set Jaccard verification (rows-only; the full
    candidate→verify chain).  Verification is a distributed
    candidates⋈texts double join — the corpus never lands on the
    driver (VERDICT r1 #2)."""
    from ..stages.dedup import verify_jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    cands = minhash_lsh_candidates(ds, id_col="doc_id", concurrency=_pool_size())
    verified = _as_table(verify_jaccard_pairs(cands, ds, threshold=0.5))
    if verified.num_rows == 0:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    return pa.table(
        {
            "doc_a": verified.column("doc_a").cast(pa.int64()),
            "doc_b": verified.column("doc_b").cast(pa.int64()),
            "jaccard": verified.column("jaccard"),
        }
    )


def q_dedup_minhash_docs(sf_dir: str):
    """MinHash-LSH candidate pairs over documents (rows-only)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = minhash_lsh_candidates(ds, id_col="doc_id", concurrency=_pool_size())

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_a": batch.column("doc_a").cast(pa.int64()),
                "doc_b": batch.column("doc_b").cast(pa.int64()),
                "n_bands": batch.column("n_bands").cast(pa.int64()),
            }
        )

    return out.map_batches(cast, batch_format="pyarrow")


def q_dedup_simhash_docs(sf_dir: str):
    """SimHash near-dup candidates over documents (rows-only)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = simhash_candidates(ds, id_col="doc_id", max_hamming=3, concurrency=_pool_size())

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_a": batch.column("doc_a").cast(pa.int64()),
                "doc_b": batch.column("doc_b").cast(pa.int64()),
                "hamming": batch.column("hamming").cast(pa.int64()),
            }
        )

    return out.map_batches(cast, batch_format="pyarrow")


def q_dedup_duplicate_clusters(sf_dir: str):
    """Full near-dup clustering chain: MinHash-LSH candidates →
    distributed exact-Jaccard verification → connected components
    (auto driver/distributed) → one row per clustered doc with its
    canonical (min-id) cluster label (rows-only)."""
    from ..stages.dedup import connected_components, verify_jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    cands = minhash_lsh_candidates(ds, id_col="doc_id", concurrency=_pool_size())
    verified = verify_jaccard_pairs(cands, ds, threshold=0.5)
    clusters = connected_components(verified)
    if clusters.num_rows == 0:
        return pa.table(
            {"id": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
        )
    return clusters.sort_by([("id", "ascending")])


# --- tokenizer parity shim (ADVICE r4 / VERDICT r4 #5) ----------------------
# The engine tokenizes Unicode-aware (Arrow utf8_split_whitespace, Python
# str.split); DuckDB oracles split on RE2 '\s+' (ASCII [\t\n\f\r ]).  The
# text-oracle queries below normalize every whitespace char OUTSIDE RE2's
# class to a plain space on BOTH sides before tokenizing, so the gate stays
# green on any fixture — not just the (verified pure-ASCII) driver one.
# The set = Python str.split() whitespace minus RE2 \s.
_NON_RE2_WS = (
    "\x0b\x1c\x1d\x1e\x1f\x85\xa0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000"
)
_WS_NORM_RE = "[" + _NON_RE2_WS + "]"
# the same class in RE2 hex-escape form, safe to embed in a SQL literal
_WS_NORM_SQL = (
    "[\\x{000B}\\x{001C}-\\x{001F}\\x{0085}\\x{00A0}\\x{1680}"
    "\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]"
)


def _ws_norm_batch(batch: pa.Table) -> pa.Table:
    i = batch.column_names.index("text")
    return batch.set_column(
        i, "text",
        pc.replace_substring_regex(batch.column("text"), _WS_NORM_RE, " "),
    )


def q_text_jaccard_adjacent(sf_dir: str):
    """Exact n-gram Jaccard VERIFICATION kernel, hash-checked: the pair
    set is deterministic and SQL-derivable (adjacent doc ids where both
    docs have ≥ 5 tokens — no LSH hash dependence), so DuckDB can
    recompute every word-5-gram Jaccard value from scratch and the
    engine's ``verify_jaccard_pairs`` must match it value-for-value.
    Pair derivation is one aggregate (each eligible doc d votes for
    pairs (d−1, d) and (d, d+1); a pair exists when it gets both
    votes) — no driver-side id collection.  Text is whitespace-
    normalized on both sides (``_ws_norm_batch`` / ``_WS_NORM_SQL``) so
    the engine's Unicode tokenizer and the oracle's RE2 split agree on
    any fixture."""
    from ..stages.dedup import verify_jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _ws_norm_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def votes(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ok = np.array(
            [t is not None and len(t.lower().split()) >= 5 for t in texts],
            dtype=bool,
        )
        d = ids[ok]
        # vote (pair_id=d, side left) and (pair_id=d-1, side right):
        # pair (p, p+1) exists iff pair_id p collects BOTH votes
        return pa.table(
            {
                "pair_id": pa.array(
                    np.concatenate([d, d - 1]).astype(np.int64), pa.int64()
                ),
                "side": pa.array(
                    np.concatenate(
                        [np.zeros(len(d), np.int8), np.ones(len(d), np.int8)]
                    )
                ),
            }
        )

    agg = (
        ds.map_batches(votes, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(4)
        .groupby("pair_id")
        .aggregate(Count(alias_name="n_votes"), Sum("side", alias_name="side_sum"))
    )

    def to_pairs(batch: pa.Table) -> pa.Table:
        # exactly one vote from EACH side (count alone would accept two
        # same-side votes if ids were ever non-unique)
        both = batch.filter(
            pc.and_(
                pc.and_(
                    pc.equal(batch.column("n_votes"), 2),
                    pc.equal(batch.column("side_sum"), 1),
                ),
                pc.greater_equal(batch.column("pair_id"), 0),
            )
        )
        a = both.column("pair_id").cast(pa.int64())
        return pa.table({"doc_a": a, "doc_b": pc.add(a, 1)})

    pairs = agg.map_batches(to_pairs, batch_format="pyarrow")
    verified = verify_jaccard_pairs(pairs, ds, threshold=0.0)
    t = _as_table(verified)
    if t.num_rows == 0:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    return pa.table(
        {
            "doc_a": t.column("doc_a").cast(pa.int64()),
            "doc_b": t.column("doc_b").cast(pa.int64()),
            "jaccard": t.column("jaccard"),
        }
    ).sort_by("doc_a")


# Tokenizer parity (ADVICE r3/r4, pinned in r5): the engine tokenizes
# Unicode-aware, the oracle splits on RE2 '\\s+' (ASCII).  Both sides now
# normalize the non-RE2 whitespace class to plain spaces first
# (_ws_norm_batch in the query / _WS_NORM_SQL here), so they agree on ANY
# fixture — a U+00A0 in a future document can no longer fail a correct
# engine.  Residual caveat: SQL lower() vs Arrow utf8_lower differ on
# non-ASCII LETTERS only (shared by every text oracle in this catalog).
_JACCARD_ADJACENT_ORACLE = """
WITH toks AS (
    SELECT doc_id,
           string_split(trim(regexp_replace(regexp_replace(lower(text),
               '__WS__', ' ', 'g'), '\\s+', ' ', 'g')), ' ') AS t
    FROM documents WHERE text IS NOT NULL
),
ok AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 5),
grams AS (
    SELECT doc_id,
           list_distinct(
               list_transform(range(1, n - 3),
                              i -> array_to_string(t[i:i+4], ' '))
           ) AS g
    FROM ok
),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.g AS ga, b.g AS gb
    FROM grams a JOIN grams b ON b.doc_id = a.doc_id + 1
)
SELECT doc_a, doc_b,
       ROUND(CAST(len(list_intersect(ga, gb)) AS DOUBLE)
             / len(list_distinct(list_concat(ga, gb))), 6) AS jaccard
FROM pairs ORDER BY doc_a
""".replace("__WS__", _WS_NORM_SQL)


def q_text_fingerprint_groups(sf_dir: str):
    """Document-fingerprint DUPLICATE GROUPS, hash-checked: the 64-bit
    fingerprint values themselves are engine-internal, but the
    partition they induce (docs equal up to case/whitespace) is exactly
    reproducible in SQL — so the groups (keep_id = min doc_id, n) get a
    full oracle while ``text_fingerprint`` stays rows-only."""
    from ..functions.textfn import fingerprint64

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "fp": fingerprint64(batch.column("text")),
            }
        )

    groups = duplicate_groups(
        ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True),
        ["fp"], id_col="doc_id",
    )

    def out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "keep_id": batch.column("keep_id").cast(pa.int64()),
                "n": batch.column("n").cast(pa.int64()),
            }
        )

    return _with_schema(
        groups.map_batches(out, batch_format="pyarrow").sort("keep_id"),
        pa.schema([("keep_id", pa.int64()), ("n", pa.int64())]),
    )


_FINGERPRINT_GROUPS_ORACLE = """
SELECT MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n
FROM (
    SELECT doc_id,
           trim(regexp_replace(lower(COALESCE(text, '')), '\\s+', ' ', 'g'))
               AS norm
    FROM documents
)
GROUP BY norm HAVING COUNT(*) > 1
ORDER BY keep_id
"""


def q_dedup_cc_pairs(sf_dir: str):
    """Connected components with a FULL DuckDB oracle (recursive CTE):
    the edge set is SQL-derivable — two users are linked when they are
    the exactly-two distinct users active in some (event_type, minute)
    bucket — so the cluster labels themselves hash-check (the LSH chain
    stays rows-only because its candidates are hash-function-dependent).
    Edge derivation is two vectorized aggregates (distinct triples,
    then per-bucket min/max/count — no per-group Python).  The
    driver/distributed CC strategy equivalence over this same edge
    derivation is asserted in tests/test_ingest_cc.py (running the
    multi-round distributed fixpoint here would triple the query's
    wall for no extra coverage)."""
    from ..stages.dedup import connected_components

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def add_minute(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "minute": pc.floor_temporal(batch.column("ts"), unit="minute"),
                "user_id": batch.column("user_id"),
            }
        )

    distinct = (
        ds.map_batches(add_minute, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "minute", "user_id"])
        .aggregate(Count(alias_name="_n"))
    )
    per_bucket = distinct.groupby(["event_type", "minute"]).aggregate(
        Min("user_id", alias_name="u_min"),
        Max("user_id", alias_name="u_max"),
        Count(alias_name="n_users"),
    )

    def edges(batch: pa.Table) -> pa.Table:
        two = batch.filter(pc.equal(batch.column("n_users"), 2))
        return pa.table(
            {
                "doc_a": two.column("u_min").cast(pa.int64()),
                "doc_b": two.column("u_max").cast(pa.int64()),
            }
        )

    e = per_bucket.map_batches(edges, batch_format="pyarrow")
    return connected_components(e, strategy="auto").sort_by(
        [("id", "ascending")]
    )


_CC_PAIRS_ORACLE = """
WITH RECURSIVE
tri AS (
    SELECT DISTINCT event_type, date_trunc('minute', ts) AS minute, user_id
    FROM events
),
per_bucket AS (
    SELECT event_type, minute,
           MIN(user_id) AS u_min, MAX(user_id) AS u_max, COUNT(*) AS n_users
    FROM tri GROUP BY 1, 2
),
edges AS (
    SELECT DISTINCT CAST(u_min AS BIGINT) AS sa, CAST(u_max AS BIGINT) AS sb
    FROM per_bucket WHERE n_users = 2
),
nodes AS (SELECT sa AS id FROM edges UNION SELECT sb FROM edges),
sym AS (SELECT sa, sb FROM edges UNION SELECT sb, sa FROM edges),
reach(id, lbl) AS (
    SELECT id, id FROM nodes
    UNION
    SELECT s.sb, r.lbl FROM reach r JOIN sym s ON s.sa = r.id
)
SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id ORDER BY id
"""


def q_hll_distinct_users(sf_dir: str):
    """HyperLogLog distinct estimate (rows-only; ±2% vs the exact
    query, asserted in tests)."""
    from ..functions.sketches import HyperLogLog, hash64

    ds = _read(sf_dir, "events", ["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        h = HyperLogLog()
        h.add_hashes(hash64(batch.column("user_id").to_numpy(zero_copy_only=False)))
        return pa.table({"registers": pa.array([h.registers.tobytes()], pa.binary())})

    partials = _as_table(ds.map_batches(partial, batch_format="pyarrow"))
    merged = HyperLogLog()
    for blob in partials.column("registers").to_pylist():
        merged = merged.merge(
            HyperLogLog(registers=np.frombuffer(blob, dtype=np.uint8).copy())
        )
    return pa.table(
        {"n_distinct_est": pa.array([int(round(merged.estimate()))], pa.int64())}
    )


def q_asof_latest_order_per_event(sf_dir: str):
    """Distributed as-of join, hash-checked: every event enriched with
    the latest order (by o_orderdate ≤ event ts) of the same customer.
    One hash shuffle on the key, per-bucket vectorized merge_asof;
    DuckDB recomputes it with a native ASOF LEFT JOIN.  Ties on
    (custkey, orderdate) resolve to the max o_orderkey on both sides."""
    from ..stages.joins import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(
        sf_dir, "orders",
        ["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"],
    )
    out = asof_join(
        ev, orders,
        key=("user_id", "o_custkey"), ts=("ts", "o_orderdate"),
        right_payload=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
    )

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id").cast(pa.int64()),
                "user_id": batch.column("user_id").cast(pa.int64()),
                "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
                "o_totalprice": batch.column("o_totalprice").cast(pa.float64()),
            }
        )

    return _as_table(
        out.select_columns(
            ["event_id", "user_id", "o_orderkey", "o_totalprice"]
        ).map_batches(cast, batch_format="pyarrow")
    ).sort_by("event_id")


def q_range_join_events_in_order_window(sf_dir: str):
    """Distributed interval (range) join, hash-checked: every event that
    falls inside its user's opening window (first 6 hours of that user's
    activity) — the interval side is a per-user groupby-min aggregate
    fed straight into the keyed plan (hash-bucket equijoin exchange +
    vectorized range mask); DuckDB recomputes it with a range-predicate
    join.  (events and orders live in disjoint eras in the fixture, so
    cross-table windows would be trivially empty — self-derived windows
    keep the oracle non-trivial.)"""
    from ..stages.joins import interval_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    six_hours_us = 6 * 3600 * 1_000_000

    def window_of(group: pd.DataFrame) -> pd.DataFrame:
        lo = group["ts"].min()
        return pd.DataFrame(
            {
                "w_user": [group["user_id"].iloc[0]],
                "w_start": [lo],
                "w_end": [lo + pd.Timedelta(microseconds=six_hours_us)],
            }
        )

    windows = (
        _read(sf_dir, "events", ["user_id", "ts"])
        .groupby("user_id")
        .map_groups(window_of, batch_format="pandas")
    )

    out = interval_join(
        ev,
        windows,
        ts="ts",
        bounds=("w_start", "w_end"),
        payload=["w_start"],
        key=("user_id", "w_user"),
    )

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id").cast(pa.int64()),
                "user_id": batch.column("user_id").cast(pa.int64()),
                "w_start": batch.column("w_start").cast(
                    pa.timestamp("us")
                ),
            }
        )

    return _as_table(
        out.select_columns(["event_id", "user_id", "w_start"]).map_batches(
            cast, batch_format="pyarrow"
        )
    ).sort_by([("event_id", "ascending")])


def q_orders_semi_bloom(sf_dir: str):
    """Bloom-prefiltered distributed semi-join: orders placed by
    'BUILDING'-segment customers.  The key side compresses into a
    broadcast Bloom bitmap (distributed build, fan-in OR merge); only
    Bloom "maybe" rows reach the exact int-bucketed verify, so the
    result is exact — DuckDB recomputes it with a plain EXISTS."""
    from ..stages.bloomjoin import bloom_semi_join

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]
    )
    bkeys = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.filter(
            pc.equal(b.column("c_mktsegment"), "BUILDING")
        ).select(["c_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = bloom_semi_join(orders, bkeys, on=("o_custkey", "c_custkey"))
    return _as_table(out).sort_by([("o_orderkey", "ascending")])


def q_events_anti_bloom(sf_dir: str):
    """Bloom-prefiltered distributed ANTI join: events from users with
    no order above 300k.  A Bloom "no" is a definite keep (no verify
    needed); only "maybe" rows run the exact NOT-EXISTS check, so the
    result is exact.  Null user_ids would be kept (NOT EXISTS, not
    NOT IN) — the fixture has none, asserted by the row count."""
    from ..stages.bloomjoin import bloom_semi_join

    events = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    big = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda b: b.filter(
            pc.greater(b.column("o_totalprice"), 300000.0)
        ).select(["o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = bloom_semi_join(
        events, big, on=("user_id", "o_custkey"), mode="anti"
    )
    return _as_table(out).sort_by([("event_id", "ascending")])


def _events_value_sides(sf_dir: str):
    """Two genuinely overlapping (user, type) relations: pairs with a
    high-value event vs pairs active in the first days of the log —
    each non-empty both ways so INTERSECT and EXCEPT are non-trivial."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "value", "ts"])
    cut = np.datetime64("2024-01-10T00:00:00", "us")

    def side(hi: bool):
        def fn(batch: pa.Table) -> pa.Table:
            if hi:
                keep = pc.greater(batch.column("value"), 100.0)
            else:
                keep = pc.less(
                    batch.column("ts"), pa.scalar(cut, pa.timestamp("us"))
                )
            return batch.filter(pc.fill_null(keep, False)).select(
                ["user_id", "event_type"]
            )
        return fn

    a = ev.map_batches(side(True), batch_format="pyarrow", zero_copy_batch=True)
    b = ev.map_batches(side(False), batch_format="pyarrow", zero_copy_batch=True)
    return a, b


def q_events_union_sides(sf_dir: str):
    """Distributed UNION DISTINCT over row tuples — completes the set
    family (same tagged-union bucketed plan; every group survives)."""
    from ..stages.setops import set_op

    a, b = _events_value_sides(sf_dir)
    out = set_op(a, b, "union")
    return _as_table(out).sort_by(
        [("user_id", "ascending"), ("event_type", "ascending")]
    )


def q_events_intersect_sides(sf_dir: str):
    """Distributed INTERSECT DISTINCT over row tuples: (user, type)
    pairs with both a >100-value event and an early-log event — tagged
    union, per-batch dedupe, one bucketed reduce; DuckDB recomputes
    with INTERSECT."""
    from ..stages.setops import set_op

    a, b = _events_value_sides(sf_dir)
    out = set_op(a, b, "intersect")
    return _as_table(out).sort_by(
        [("user_id", "ascending"), ("event_type", "ascending")]
    )


def q_events_except_sides(sf_dir: str):
    """Distributed EXCEPT DISTINCT: (user, type) pairs with a
    >100-value event but no early-log activity — same plan as
    INTERSECT with the survival flipped."""
    from ..stages.setops import set_op

    a, b = _events_value_sides(sf_dir)
    out = _with_schema(
        set_op(a, b, "except"),
        pa.schema([("user_id", pa.int64()), ("event_type", pa.string())]),
    )
    return out.sort_by(
        [("user_id", "ascending"), ("event_type", "ascending")]
    )


def q_events_sliding_window(sf_dir: str):
    """Sliding (hopping) 6-hour windows every hour over events, keyed
    by event_type — partial-aggregated inside the batch (lexsort +
    reduceat) so the k=6 replication never crosses the shuffle;
    DuckDB recomputes it by exploding each event into its 6 windows."""
    from ..stages.windows import sliding_window_agg

    hour_us = 3600 * 1_000_000
    out = sliding_window_agg(
        _read(sf_dir, "events", ["ts", "event_type", "value"]),
        ts_col="ts",
        key_col="event_type",
        size_us=6 * hour_us,
        slide_us=hour_us,
        value_col="value",
    )

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": pc.strftime(
                    batch.column("window_start").cast(pa.timestamp("s")),
                    format="%Y-%m-%d %H:%M:%S",
                ),
                "event_type": batch.column("event_type"),
                "n_events": batch.column("n_events").cast(pa.int64()),
                "sum_value": pa.array(
                    _round_away(
                        batch.column("sum_value").to_numpy(
                            zero_copy_only=False
                        ),
                        2,
                    )
                ),
                "min_value": batch.column("min_value").cast(pa.float64()),
                "max_value": batch.column("max_value").cast(pa.float64()),
                # avg as exact integer-cents floor division: values are
                # 2-decimal, so sum*100 is an integer (FP error ≪ 0.5
                # cents) and cents//n is tie-free — ROUND(sum/n, k)
                # would coin-flip on half-way ties vs the SQL oracle
                "avg_value": pa.array(
                    np.floor_divide(
                        np.rint(
                            batch.column("sum_value")
                            .to_numpy(zero_copy_only=False)
                            * 100.0
                        ).astype(np.int64),
                        batch.column("n_events")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64),
                    )
                    / 100.0
                ),
            }
        )

    return _as_table(out.map_batches(cast, batch_format="pyarrow")).sort_by(
        [("window_start", "ascending"), ("event_type", "ascending")]
    )


def q_split_lineitem_hash(sf_dir: str):
    """Deterministic hash train/val/test split of lineitem by
    l_orderkey (all lines of one order share a split — no leakage),
    hash-checked: the split hash is plain modular arithmetic
    (``((k % 2^32) * 2654435761) % 2^32``) so DuckDB recomputes the
    EXACT assignment, verified here by per-split row counts and
    quantity sums."""
    from ..stages.split import hash_split

    out = hash_split(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]),
        key_col="l_orderkey",
        fractions={"train": 0.9, "val": 0.05, "test": 0.05},
    )
    agg = out.groupby("split").aggregate(
        Count(alias_name="n_rows"),
        Sum("l_quantity", alias_name="sum_qty"),
    )

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "split": batch.column("split"),
                "n_rows": batch.column("n_rows").cast(pa.int64()),
                "sum_qty": pa.array(
                    _round_away(
                        batch.column("sum_qty").to_numpy(zero_copy_only=False),
                        2,
                    )
                ),
            }
        )

    return _as_table(agg.map_batches(cast, batch_format="pyarrow")).sort_by(
        "split"
    )


def q_cap_events_per_user(sf_dir: str):
    """Per-key cap — keep each user's 3 earliest events (ties broken by
    event_id), the "cap documents per domain" curation primitive;
    DuckDB recomputes it with row_number() OVER (PARTITION BY ...)."""
    from ..stages.split import cap_per_key

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    out = cap_per_key(ev, key_col="user_id", n=3, order_cols=["ts", "event_id"])

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id").cast(pa.int64()),
                "user_id": batch.column("user_id").cast(pa.int64()),
            }
        )

    return _as_table(
        out.select_columns(["event_id", "user_id"]).map_batches(
            cast, batch_format="pyarrow"
        )
    ).sort_by("event_id")


def q_text_top_terms(sf_dir: str):
    """Corpus vocabulary top-k: 20 most frequent whitespace terms
    (Arrow-native tokenize, Zipf-bounded partial counts, distributed
    top-k merge); ties broken by term ascending.  DuckDB recomputes it
    by unnesting the normalized token list."""
    from ..stages.vocab import top_terms

    return top_terms(
        _read(sf_dir, "documents", ["text"]), text_col="text", k=20
    )


def q_text_cms_top_terms(sf_dir: str):
    """Count-min-sketch approximate top-k terms (rows-only — sketch
    lane; the exact twin ``text_top_terms`` is hash-checked and the
    one-sided CMS error bound is asserted in tests/test_split_windows):
    per-batch local candidates + one fixed-size CMS blob, blobs merged
    by fan-in sum, candidates scored against the broadcast sketch."""
    from ..stages.vocab import cms_top_terms

    return cms_top_terms(
        _read(sf_dir, "documents", ["text"]), text_col="text", k=20
    )


def q_events_ranked_window(sf_dir: str):
    """Ranked running window per user: ROW_NUMBER and a running sum
    over (ts, event_id) order — one key-hash bucket shuffle, vectorized
    cumcount/cumsum per bucket.  The running sum rides on integer
    cents so the hash compare against the SQL window oracle is exact
    (same convention as events_rolling_avg)."""
    from ..stages.windows import ranked_window_per_key

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def to_cents(batch: pa.Table) -> pa.Table:
        # half-up via floor(x+0.5) — np.rint is half-to-EVEN while SQL
        # ROUND is half-away; this formula is identical on both sides
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "value_cents",
            pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
        )

    out = ranked_window_per_key(
        ev.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        key_col="user_id",
        ts_col="ts",
        value_col="value_cents",
        tiebreak_col="event_id",
    )

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id").cast(pa.int64()),
                "user_id": batch.column("user_id").cast(pa.int64()),
                "row_num": batch.column("row_num").cast(pa.int64()),
                "run_sum_cents": batch.column("run_sum").cast(pa.int64()),
            }
        )

    return _as_table(
        out.map_batches(cast, batch_format="pyarrow")
    ).sort_by([("event_id", "ascending")])


def q_events_lag_lead(sf_dir: str):
    """LAG/LEAD of value and microseconds-since-previous-event per
    user over (ts, event_id) order — sessionization features; nulls at
    partition edges.  Values ride on integer cents (same convention as
    events_ranked_window) so the hash compare is exact."""
    from ..stages.windows import lag_lead_per_key

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def to_cents(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "value_cents",
            pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
        )

    out = lag_lead_per_key(
        ev.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        key_col="user_id", ts_col="ts", value_col="value_cents",
        tiebreak_col="event_id",
    )

    def nan_to_null_int(col) -> pa.Array:
        # pandas shift() returns float64 with NaN at partition edges;
        # Arrow refuses NaN→int casts, so mask the NaNs into nulls
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        mask = np.isnan(v)
        return pa.array(
            np.where(mask, 0, v).astype(np.int64), mask=mask
        )

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id").cast(pa.int64()),
                "user_id": batch.column("user_id").cast(pa.int64()),
                "lag_cents": nan_to_null_int(batch.column("lag_value")),
                "lead_cents": nan_to_null_int(batch.column("lead_value")),
                "delta_us": nan_to_null_int(batch.column("delta_us")),
            }
        )

    return _as_table(
        out.map_batches(cast, batch_format="pyarrow")
    ).sort_by([("event_id", "ascending")])


def q_events_ntile_per_user(sf_dir: str):
    """NTILE(4) per user over (ts, event_id) order — exact SQL
    remainder semantics (first c%4 tiles take the extra row), one
    bucket shuffle, vectorized tiling per bucket."""
    from ..stages.windows import ntile_per_key

    out = ntile_per_key(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        key_col="user_id", ts_col="ts", n_tiles=4, tiebreak_col="event_id",
    )

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id").cast(pa.int64()),
                "user_id": batch.column("user_id").cast(pa.int64()),
                "tile": batch.column("tile").cast(pa.int64()),
            }
        )

    return _as_table(
        out.map_batches(cast, batch_format="pyarrow")
    ).sort_by([("event_id", "ascending")])


def q_events_rolling_avg(sf_dir: str):
    """Per-key rolling window (ROWS 2 PRECEDING): count and avg of each
    user's last 3 events by time; avg via tie-free integer-cents floor
    division (same convention as events_sliding_window)."""
    from ..stages.windows import rolling_window_per_key

    out = rolling_window_per_key(
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        window_rows=3,
        tiebreak_col="event_id",
    )

    def cast(batch: pa.Table) -> pa.Table:
        n = batch.column("roll_n").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        s = batch.column("roll_sum").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": batch.column("event_id").cast(pa.int64()),
                "user_id": batch.column("user_id").cast(pa.int64()),
                "roll_n": pa.array(n),
                "roll_avg": pa.array(
                    np.floor_divide(
                        np.rint(s * 100.0).astype(np.int64), n
                    )
                    / 100.0
                ),
            }
        )

    return _as_table(
        out.select_columns(
            ["event_id", "user_id", "roll_n", "roll_sum"]
        ).map_batches(cast, batch_format="pyarrow")
    ).sort_by("event_id")


def q_sample_orders_hash(sf_dir: str):
    """Deterministic 10% Bernoulli sample of orders by hashed key
    (rerun-stable, SQL-recomputable), summarized per order status."""
    from ..stages.split import hash_sample

    out = hash_sample(
        _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"]),
        key_col="o_orderkey",
        fraction=0.1,
    )
    agg = out.groupby("o_orderstatus").aggregate(
        Count(alias_name="n_orders"),
        Sum("o_totalprice", alias_name="sum_price"),
    )

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": batch.column("o_orderstatus"),
                "n_orders": batch.column("n_orders").cast(pa.int64()),
                "sum_price": pa.array(
                    _round_away(
                        batch.column("sum_price").to_numpy(
                            zero_copy_only=False
                        ),
                        2,
                    )
                ),
            }
        )

    return _as_table(agg.map_batches(cast, batch_format="pyarrow")).sort_by(
        "o_orderstatus"
    )


def q_tdigest_quantiles_per_type(sf_dir: str):
    """GROUPED t-digest quantiles (rows-only — sketch lane; the exact
    twin ``events_value_quantiles_exact`` is hash-checked and the ±3%
    tolerance is asserted in tests/test_stats.py): per-(batch, key)
    centroid blobs, one key-bucket exchange, mergeable centroids."""
    from ..stages.stats import grouped_tdigest_quantiles

    out = grouped_tdigest_quantiles(
        _read(sf_dir, "events", ["event_type", "value"]),
        "event_type", "value",
    )
    return _as_table(out).sort_by([("event_type", "ascending")])


def q_events_zscore_per_type(sf_dir: str):
    """Per-key z-score feature normalization: two-pass — per-key
    moments through the bucketed reduce, then the tiny (mean, std)
    table broadcasts and every batch normalizes vectorized (the fact
    table is never shuffled).  Rounded to 6 decimals on both sides so
    the hash compare is exact despite summation-order ulp drift."""
    from ..stages.stats import zscore_per_key

    out = zscore_per_key(
        _read(sf_dir, "events", ["event_id", "event_type", "value"]),
        "event_type", "value",
    )
    return _as_table(
        out.select_columns(["event_id", "event_type", "z"])
    ).sort_by([("event_id", "ascending")])


def q_events_robust_scale(sf_dir: str):
    """Per-key robust (median/IQR) normalization — the outlier-tolerant
    twin of the z-score lane: exact rank-selection quantiles per key
    (every cutpoint a real data element, so the SQL row_number oracle
    matches exactly), broadcast (median, IQR), vectorized normalize;
    the fact table is never shuffled."""
    from ..stages.stats import robust_scale_per_key

    out = robust_scale_per_key(
        _read(sf_dir, "events", ["event_id", "event_type", "value"]),
        "event_type", "value",
    )
    return _as_table(
        out.select_columns(["event_id", "event_type", "r"])
    ).sort_by([("event_id", "ascending")])


def q_events_percent_rank(sf_dir: str):
    """SQL PERCENT_RANK / CUME_DIST per key over value order — exact
    tie semantics (min-rank / max-rank ratios of integers), one
    key-hash bucket shuffle; null key/value rows excluded like the
    oracle's filtered window subquery."""
    from ..stages.windows import percent_rank_per_key

    out = percent_rank_per_key(
        _read(sf_dir, "events", ["event_id", "event_type", "value"]),
        key_col="event_type", value_col="value",
    )
    return _as_table(out).sort_by([("event_id", "ascending")])


def q_events_argmax_row(sf_dir: str):
    """Full-row grouped arg-max: each user's entire latest event row
    (ts DESC, event_id DESC tiebreak) — partial per-batch argmax, one
    bucketed reduce; the shuffle carries ≤ one row per (key, batch)."""
    from ..stages.windows import argmax_row_per_key

    out = argmax_row_per_key(
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
        key_col="user_id", order_col="ts", tiebreak_col="event_id",
    )
    return _as_table(out).sort_by([("user_id", "ascending")])


def q_events_mode_per_user(sf_dir: str):
    """Grouped MODE with deterministic ties (highest count, then
    smallest value): per-batch (key, value) partial counts, one
    key-hash bucket exchange, vectorized per-bucket merge + arg-max."""
    from ..stages.windows import mode_per_key

    out = mode_per_key(
        _read(sf_dir, "events", ["user_id", "event_type"]),
        key_col="user_id", value_col="event_type",
    )
    return _as_table(out).sort_by([("user_id", "ascending")])


def q_events_transitions(sf_dir: str):
    """Markov transition counts over each user's event sequence in
    (ts, event_id) order — grouped shift per key-hash bucket, partial
    pair counts, one small merge."""
    from ..stages.windows import transition_counts

    out = transition_counts(
        _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"]),
        key_col="user_id", state_col="event_type", ts_col="ts",
        tiebreak_col="event_id",
    )
    return _as_table(out).sort_by(
        [("from_state", "ascending"), ("to_state", "ascending")]
    )


def q_events_topk_per_user(sf_dir: str):
    """Top-3 full event rows per user by (value, event_id) with ranks —
    per-batch partial top-k, one bucketed reduce (≤ k rows per (key,
    batch) shuffled)."""
    from ..stages.windows import topk_rows_per_key

    out = topk_rows_per_key(
        _read(sf_dir, "events", ["event_id", "user_id", "value"]),
        key_col="user_id", order_col="value", k=3, tiebreak_col="event_id",
    )
    return _as_table(out).sort_by(
        [("user_id", "ascending"), ("rank", "ascending")]
    )


def q_events_rollup(sf_dir: str):
    """GROUP BY ROLLUP(event_type, user_id) analog: the raw table is
    reduced ONCE at the finest level; each coarser level re-aggregates
    the previous level's tiny result (sum-of-sums re-entrancy)."""
    from ..stages.stats import rollup_agg

    out = rollup_agg(
        _read(sf_dir, "events", ["event_type", "user_id", "value"]),
        ["event_type", "user_id"], "value",
    )
    return _as_table(out).sort_by(
        [("event_type", "ascending"), ("user_id", "ascending")]
    )


def q_events_value_quantiles_cont(sf_dir: str):
    """INTERPOLATED grouped quantiles (PERCENTILE_CONT twin of the
    rank-selection exact lane) — formula-identical to DuckDB's
    quantile_cont, rounded half-away to 6 decimals on both sides."""
    from ..stages.stats import grouped_quantiles_cont

    out = grouped_quantiles_cont(
        _read(sf_dir, "events", ["event_type", "value"]),
        key_col="event_type", value_col="value",
    )

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "q": batch.column("q").cast(pa.float64()),
                "value": batch.column("value").cast(pa.float64()),
            }
        )

    return _as_table(out.map_batches(cast, batch_format="pyarrow")).sort_by(
        [("event_type", "ascending"), ("q", "ascending")]
    )


def q_curate_documents(sf_dir: str):
    """End-to-end curation capstone (pipelines/curate.py): quality
    filter → exact fingerprint dedup → MinHash near-dup removal over
    the documents table; returns the surviving doc ids.  Rows-only
    (the candidate stage is hash-dependent); the pipeline is golden-
    tested in tests/test_curate.py."""
    from ..pipelines.curate import curate_documents

    res = curate_documents(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        min_quality=0.35, jaccard_threshold=0.8,
    )

    def ids_only(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64())}
        )

    return _as_table(
        res.documents.map_batches(ids_only, batch_format="pyarrow")
    ).sort_by([("doc_id", "ascending")])


def _decontam_sides(sf_dir: str):
    """documents split into (train, eval): eval = doc_id % 20 == 0.
    Both sides whitespace-normalized for oracle tokenizer parity."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _ws_norm_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def side(want_eval: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % 20 == 0) if want_eval else (ids % 20 != 0)
            return batch.filter(pa.array(m))

        return fn

    train = ds.map_batches(side(False), batch_format="pyarrow", zero_copy_batch=True)
    ev = ds.map_batches(side(True), batch_format="pyarrow", zero_copy_batch=True)
    return train, ev


def q_decontaminate_docs(sf_dir: str):
    """Eval-set decontamination, FLAG mode, hash-checked: eval set =
    documents with doc_id % 20 == 0, training side = the rest; a train
    doc is contaminated when it shares ANY word 8-gram with any eval
    doc.  Engine matches gram HASHES (rolling polynomial over token
    hashes — collision ~2^-64), the oracle matches the gram STRINGS;
    every train doc comes back with its 0/1 flag so the value hash
    covers the negatives too (stages/decontaminate.py, broadcast arm)."""
    from ..stages.decontaminate import decontaminate

    train, ev = _decontam_sides(sf_dir)
    flagged = decontaminate(train, ev, n=8, mode="flag")

    def out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "contaminated": batch.column("contaminated").cast(pa.int64()),
            }
        )

    return _as_table(
        flagged.map_batches(out, batch_format="pyarrow")
    ).sort_by([("doc_id", "ascending")])


def q_decontaminate_docs_drop(sf_dir: str):
    """Eval-set decontamination, DROP mode, hash-checked — and forced
    onto the BLOOM arm (broadcast budget 0) so the scale path (bitmap
    build → per-gram prefilter → exact semi-join verify → streaming
    anti join) is the one the oracle certifies."""
    from ..stages.decontaminate import decontaminate

    train, ev = _decontam_sides(sf_dir)
    kept = decontaminate(
        train, ev, n=8, mode="drop", broadcast_max_bytes=0, fp_rate=1e-3
    )

    def out(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("doc_id").cast(pa.int64())})

    return _as_table(
        kept.map_batches(out, batch_format="pyarrow")
    ).sort_by([("doc_id", "ascending")])


_DECONTAM_CTE = """
toks AS (
    SELECT doc_id,
           string_split(trim(regexp_replace(regexp_replace(lower(text),
               '__WS__', ' ', 'g'), '\\s+', ' ', 'g')), ' ') AS t
    FROM documents WHERE text IS NOT NULL
),
grams AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 6),
                                 i -> array_to_string(t[i:i+7], ' '))) AS g
    FROM toks WHERE len(t) >= 8
),
hit AS (
    SELECT DISTINCT tr.doc_id
    FROM grams tr
    WHERE tr.doc_id % 20 <> 0
      AND tr.g IN (SELECT g FROM grams WHERE doc_id % 20 = 0)
)
""".replace("__WS__", _WS_NORM_SQL)

_DECONTAM_FLAG_ORACLE = f"""
WITH {_DECONTAM_CTE}
SELECT d.doc_id,
       CAST(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           AS contaminated
FROM documents d LEFT JOIN hit h USING (doc_id)
WHERE d.doc_id % 20 <> 0
ORDER BY d.doc_id
"""

_DECONTAM_DROP_ORACLE = f"""
WITH {_DECONTAM_CTE}
SELECT d.doc_id FROM documents d
WHERE d.doc_id % 20 <> 0 AND d.doc_id NOT IN (SELECT doc_id FROM hit)
ORDER BY d.doc_id
"""


def q_text_repetition(sf_dir: str):
    """Token repetition ratio (1 − distinct/total tokens — the
    Gopher-style repetitiousness quality ingredient), hash-checked:
    DuckDB recomputes it from ``list_distinct`` over the same
    whitespace-normalized lowercase split; the engine counts distinct
    per doc with ONE batch-wide lexsort + boundary scan
    (functions/textfn.py::token_repetition_ratio)."""
    from ..functions.textfn import token_repetition_ratio

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _ws_norm_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def fn(batch: pa.Table) -> pa.Table:
        r = token_repetition_ratio(batch.column("text"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "rep_ratio": pa.array(
                    _round_away(r.to_numpy(zero_copy_only=False), 6),
                    pa.float64(),
                ),
            }
        )

    return _as_table(
        ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by([("doc_id", "ascending")])


_TEXT_REPETITION_ORACLE = """
WITH toks AS (
    SELECT doc_id,
           string_split(trim(regexp_replace(regexp_replace(lower(text),
               '__WS__', ' ', 'g'), '\\s+', ' ', 'g')), ' ') AS t
    FROM documents WHERE text IS NOT NULL
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       ROUND(COALESCE(
           1.0 - CAST(len(list_distinct(t.t)) AS DOUBLE) / len(t.t),
           0.0), 6) AS rep_ratio
FROM documents d LEFT JOIN toks t USING (doc_id)
ORDER BY d.doc_id
""".replace("__WS__", _WS_NORM_SQL)


def q_pack_documents_seqs(sf_dir: str):
    """Sequence packing, hash-checked: assign every document to a
    fixed 512-token training sequence via the distributed ordered
    prefix sum (stages/packing.py — range-slab two-level scan, no
    global sort); the oracle recomputes the exclusive running sum with
    a SQL window over the same regex token counts."""
    from ..stages.packing import pack_sequences

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = pack_sequences(ds, budget=512, order_col="doc_id")

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_tokens": batch.column("n_tokens").cast(pa.int64()),
                "seq_id": batch.column("seq_id").cast(pa.int64()),
            }
        )

    return _as_table(out.map_batches(cast, batch_format="pyarrow")).sort_by(
        [("doc_id", "ascending")]
    )


_PACK_SEQS_ORACLE = f"""
WITH nt AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(len(regexp_extract_all(coalesce(text, ''),
                                       '{{TOKEN_PATTERN}}')) AS BIGINT)
               AS n_tokens
    FROM documents
)
SELECT doc_id, n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (
                ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // 512 AS BIGINT) AS seq_id
FROM nt ORDER BY doc_id
""".replace("{TOKEN_PATTERN}", TOKEN_PATTERN)


def q_join_customer_orders_full(sf_dir: str):
    """FULL OUTER enrichment: high-balance customers x high-value order
    counts — Ray's native hash-partitioned full_outer join (key column
    coalesced), right side pre-aggregated through the bucketed reduce
    so only one tiny row per customer enters the join."""
    from ..stages.groupagg import bucketed_group_agg

    left = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).filter(
        expr="c_acctbal > 9000"
    )
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).filter(
        expr="o_totalprice > 300000"
    )

    def one(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": batch.column("o_custkey"),
                "_one": pa.array([1] * len(batch), pa.int64()),
            }
        )

    right = bucketed_group_agg(
        orders.map_batches(one, batch_format="pyarrow", zero_copy_batch=True),
        ["c_custkey"],
        [("n_orders", "_one", "sum")],
        partial=True,
    )
    out = left.join(
        right, join_type="full_outer", num_partitions=8, on=("c_custkey",)
    )
    return _as_table(out).sort_by([("c_custkey", "ascending")])


def q_events_corr_per_type(sf_dir: str):
    """Per-type Pearson correlation of value against event time
    (epoch µs) — the per-category drift/trend detector.  Chan-merged
    centered comoments: epoch-microsecond x values (~1.7e15) would
    catastrophically cancel the naive E[xy]−E[x]E[y] form."""
    from ..stages.stats import corr_per_key

    ds = _read(sf_dir, "events", ["event_type", "value", "ts"])

    def add_epoch(batch: pa.Table) -> pa.Table:
        e = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        return batch.append_column("_epoch", e.cast(pa.float64()))

    out = corr_per_key(
        ds.map_batches(add_epoch, batch_format="pyarrow", zero_copy_batch=True),
        "event_type", "_epoch", "value",
    )
    return _as_table(out).sort_by([("event_type", "ascending")])


def q_text_normalized(sf_dir: str):
    """The fingerprint normalization itself, hash-checked end to end:
    lowercase, collapse whitespace runs, trim — the exact string the
    64-bit fingerprint hashes (its direct SQL twin; the fingerprint
    GROUPS are checked separately in text_fingerprint_groups)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        filled = pc.utf8_lower(pc.fill_null(batch.column("text"), ""))
        n = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(filled, r"\s+", " ")
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "norm": n,
            }
        )

    return _as_table(
        ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by([("doc_id", "ascending")])


def q_events_string_agg(sf_dir: str):
    """Grouped ordered concat (STRING_AGG ... ORDER BY) of each user's
    distinct event types — ListArray slices + one Arrow binary_join per
    bucket, never a per-group Python join."""
    from ..stages.windows import string_agg_per_key

    out = string_agg_per_key(
        _read(sf_dir, "events", ["user_id", "event_type"]),
        key_col="user_id", value_col="event_type", distinct=True,
    )
    return _as_table(out).sort_by([("user_id", "ascending")])


def q_events_funnel(sf_dir: str):
    """Conversion funnel signup → view → purchase with strict time
    ordering per user — per-bucket vectorized step resolution, one tiny
    bounded merge; DuckDB recomputes with chained min-after subqueries."""
    from ..stages.windows import funnel_counts

    out = funnel_counts(
        _read(sf_dir, "events", ["user_id", "event_type", "ts"]),
        key_col="user_id", type_col="event_type", ts_col="ts",
        steps=["signup", "view", "purchase"],
    )
    return _as_table(out).sort_by([("step", "ascending")])


def q_events_cube(sf_dir: str):
    """GROUP BY CUBE(event_type, user_id) analog — every grouping-set
    subset re-aggregated from the once-reduced finest level."""
    from ..stages.stats import rollup_agg

    out = rollup_agg(
        _read(sf_dir, "events", ["event_type", "user_id", "value"]),
        ["event_type", "user_id"], "value", cube=True,
    )
    return _as_table(out).sort_by(
        [("event_type", "ascending"), ("user_id", "ascending")]
    )


def q_events_value_histogram(sf_dir: str):
    """Fixed-width 20-bin histogram of events.value over [0, 500) with
    explicit clip/floor bucket arithmetic (SQL-recomputable exactly);
    bucket −1 counts nulls."""
    from ..stages.stats import histogram_fixed

    out = histogram_fixed(
        _read(sf_dir, "events", ["value"]), "value",
        lo=0.0, hi=500.0, nbins=20,
    )
    return _as_table(out).sort_by([("bucket", "ascending")])


def q_sample_orders_bottomk(sf_dir: str):
    """Exact-size deterministic sample: the 500 orders with the
    globally smallest Knuth-hashed orderkey — per-batch local bottom-k,
    tiny candidate merge; DuckDB recomputes the same hash and LIMITs."""
    from ..stages.split import bottomk_sample

    out = bottomk_sample(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]),
        key_col="o_orderkey", n=500,
    )
    return out.sort_by([("o_orderkey", "ascending")])


def q_events_value_quantiles_exact(sf_dir: str):
    """EXACT grouped quantiles (rank selection, no interpolation) of
    events.value per event_type — the exact twin of the t-digest
    sketch lane, hash-checked because every result is a real data
    element."""
    from ..stages.stats import grouped_quantiles

    out = grouped_quantiles(
        _read(sf_dir, "events", ["event_type", "value"]),
        key_col="event_type",
        value_col="value",
        qs=(0.25, 0.5, 0.75),
    )

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "q": batch.column("q").cast(pa.float64()),
                "value": batch.column("value").cast(pa.float64()),
            }
        )

    return _as_table(out.map_batches(cast, batch_format="pyarrow")).sort_by(
        [("event_type", "ascending"), ("q", "ascending")]
    )


def q_events_pivot_user_type(sf_dir: str):
    """Pivot / one-hot aggregate: per-user event counts, one column per
    event type (explicit category list → stable schema)."""
    from ..stages.stats import pivot_counts

    cats = ["click", "error", "purchase", "signup", "view"]
    out = pivot_counts(
        _read(sf_dir, "events", ["user_id", "event_type"]),
        key_col="user_id",
        pivot_col="event_type",
        categories=cats,
    )

    def cast(batch: pa.Table) -> pa.Table:
        cols = {"user_id": batch.column("user_id").cast(pa.int64())}
        for c in cats:
            cols[f"n_{c}"] = batch.column(f"n_{c}").cast(pa.int64())
        return pa.table(cols)

    return _as_table(out.map_batches(cast, batch_format="pyarrow")).sort_by(
        "user_id"
    )


def q_sample_stratified_events(sf_dir: str):
    """Deterministic stratified sample: the 5 events per event_type
    with the smallest hashed ids (rerun-stable; DuckDB recomputes the
    exact selection via row_number over the same modular hash)."""
    from ..stages.split import stratified_sample

    out = stratified_sample(
        _read(sf_dir, "events", ["event_id", "event_type"]),
        key_col="event_type",
        n=5,
        id_col="event_id",
    )

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id").cast(pa.int64()),
                "event_type": batch.column("event_type"),
            }
        )

    return _as_table(out.map_batches(cast, batch_format="pyarrow")).sort_by(
        "event_id"
    )


def q_text_doc_top_term(sf_dir: str):
    """Most distinctive term per document (integer tf-idf argmax: max
    tf, tie → min df, tie → term asc) — exercises the two-level
    term-bucket tf/df pipeline, SQL-recomputable exactly because it
    stays in integers (no log)."""
    from ..stages.vocab import doc_top_term

    out = doc_top_term(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        id_col="doc_id",
        text_col="text",
    )

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "term": batch.column("term"),
                "tf": batch.column("tf").cast(pa.int64()),
                "df": batch.column("df").cast(pa.int64()),
            }
        )

    return _as_table(out.map_batches(cast, batch_format="pyarrow")).sort_by(
        "doc_id"
    )


def q_hll_distinct_users_per_type(sf_dir: str):
    """GROUPED HyperLogLog distinct (rows-only — sketch lane; its
    exact twin ``distinct_users_per_type`` is hash-checked, and the
    ±2% tolerance is asserted in tests/test_stats.py): per-group
    register blobs built and merged vectorized, so the shuffle moves
    ``#batches × #keys`` fixed-size sketch rows, never user_ids."""
    from ..stages.stats import grouped_hll_distinct

    out = grouped_hll_distinct(
        _read(sf_dir, "events", ["event_type", "user_id"]),
        "event_type", "user_id",
    )
    return _as_table(out).sort_by([("event_type", "ascending")])


def q_distinct_users_per_type(sf_dir: str):
    """Exact grouped COUNT(DISTINCT): distinct (type, user) pairs via
    the bucketed reduce, then a tiny per-type count — the exact twin of
    the HLL sketch lane, per group."""
    from ..stages.groupagg import bucketed_group_agg

    pairs = bucketed_group_agg(
        _read(sf_dir, "events", ["event_type", "user_id"]),
        ["event_type", "user_id"],
        [("n", "user_id", "count")],
    )
    agg = pairs.groupby("event_type").aggregate(Count(alias_name="n_users"))

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "n_users": batch.column("n_users").cast(pa.int64()),
            }
        )

    return _as_table(agg.map_batches(cast, batch_format="pyarrow")).sort_by(
        "event_type"
    )


def q_tdigest_value_quantiles(sf_dir: str):
    """t-digest quantiles of events.value (rows-only; tolerance-checked
    against numpy in tests)."""
    from ..functions.sketches import TDigest

    ds = _read(sf_dir, "events", ["value"])

    def partial(batch: pa.Table) -> pa.Table:
        import pickle

        d = TDigest()
        d.add(batch.column("value").to_numpy(zero_copy_only=False))
        d._compress()
        return pa.table({"digest": pa.array([pickle.dumps(d)], pa.binary())})

    import pickle

    partials = _as_table(ds.map_batches(partial, batch_format="pyarrow"))
    merged = TDigest()
    for blob in partials.column("digest").to_pylist():
        merged = merged.merge(pickle.loads(blob))
    qs = (0.01, 0.25, 0.5, 0.75, 0.99)
    return pa.table(
        {
            "quantile": pa.array(list(qs), pa.float64()),
            "value_est": pa.array(
                [round(v, 3) for v in merged.quantiles(qs)], pa.float64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# Image-table pipelines (the flagship; rows-only — no images in sf_dir)
# ---------------------------------------------------------------------------

_IMAGE_FIXTURE_ROWS = 1500


def _image_fixture_dirname(n: int = _IMAGE_FIXTURE_ROWS, seed: int = 42) -> str:
    """Pure path computation — safe at import time (no generation)."""
    return os.path.join(tempfile.gettempdir(), f"mtbray_images_v4_n{n}_s{seed}")


@functools.lru_cache(maxsize=4)
def _image_fixture_dir(n: int = _IMAGE_FIXTURE_ROWS, seed: int = 42) -> str:
    """Deterministic image table synthesized once per process under
    /tmp (BASELINE.json input_hint shape; no external data).  Parts are
    written tmp-then-rename so a concurrent first-time builder never
    exposes a truncated file."""
    import pyarrow.parquet as pq

    d = _image_fixture_dirname(n, seed)
    marker = os.path.join(d, "_complete")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        table = make_image_rows(0, n, seed=seed, total=n, n_partitions=8)
        for pid in range(8):
            part = table.filter(pc.equal(table.column(PARTITION_COL), pid))
            tmp = os.path.join(d, f".part-{pid}.parquet.tmp")
            pq.write_table(part, tmp)
            os.replace(tmp, os.path.join(d, f"part-{pid}.parquet"))
        with open(marker, "w") as f:
            f.write("ok")
    return d


def q_image_validate(sf_dir: str):
    """Flagship: full rule-set validation over the synthesized image
    table — returns the violations table (clean input ⇒ 0 rows)."""
    d = _image_fixture_dir()
    # fused single-read single-pool variant — equivalence with the
    # modular run_validation is asserted in tests/test_fused.py
    res = run_validation_fused(d, include_unique=True)
    return _as_table(res.violations)


def q_image_verdict_summary(sf_dir: str):
    """Verdict roll-up counts, hash-checked (VERDICT r3 #6): GROUP BY
    verdict over the same per-record reduce `image_verdict_meta`
    oracles — record counts + total issues per verdict tier, computed
    as a DISTRIBUTED hash aggregate over the verdict stream (at 10^12
    records the verdict table is 10^12 rows; it never lands on the
    driver).  The clean-fixture full-rule-set roll-up stays covered by
    `image_validate` + the fused-equivalence tests."""
    from .verdicts import verdicts_with_unique

    ids = rd.read_parquet(
        _corrupt_fixture_path(), columns=["image_id", PARTITION_COL]
    )
    viol = _image_meta_violations(sf_dir)
    verdicts, _ = verdicts_with_unique(ids, viol, strategy="shuffle")
    agg = verdicts.groupby("verdict").aggregate(
        Count(alias_name="n_records"), Sum("n_issues", alias_name="n_issues")
    )

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "verdict": batch.column("verdict").cast(pa.string()),
                "n_records": batch.column("n_records").cast(pa.int64()),
                "n_issues": batch.column("n_issues").cast(pa.int64()),
            }
        )

    return _as_table(agg.map_batches(cast, batch_format="pyarrow")).sort_by(
        "verdict"
    )


def q_image_stats_profile(sf_dir: str):
    """Per-partition stats/sketch profile of the image table — exact
    lane hash-checked (VERDICT r3 #6).  Runs the FULL profile (exact
    counts + HLL distinct + t-digest quantiles in one actor-pool pass),
    gates the sketch lanes in-process — HLL within 2% of the exact
    per-partition distinct count (its own Ray aggregate), t-digest
    quantiles monotone and inside [min, max] — then returns the exact
    columns (w AND h lanes; wider than the `image_stats_exact` twin)
    for DuckDB to hash-check."""
    d = _image_fixture_dir()
    meta = rd.read_parquet(d, columns=["image_id", "w", "h", "caption", PARTITION_COL])
    report = stats_report(profile_stats(meta, concurrency=_pool_size(2)))

    # exact distinct ids per partition (one shuffle; tiny output)
    def nunique(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                PARTITION_COL: [g[PARTITION_COL].iloc[0]],
                "exact": [g["image_id"].nunique()],
            }
        )

    exact_pp = _as_table(
        rd.read_parquet(d, columns=["image_id", PARTITION_COL])
        .groupby(PARTITION_COL)
        .map_groups(nunique, batch_format="pandas")
    ).to_pandas().set_index(PARTITION_COL)["exact"]
    rep = report.to_pandas().set_index(PARTITION_COL)
    for pid, row in rep.iterrows():
        exact = int(exact_pp.sum()) if pid == -1 else int(exact_pp[pid])
        est = float(row["distinct_ids_est"])
        assert abs(est - exact) <= 0.02 * exact + 1, (pid, est, exact)
        for col in ("w", "h"):
            qs = [row[f"p{q:02d}_{col}"] for q in (1, 25, 50, 75, 99)]
            assert all(a <= b + 1e-9 for a, b in zip(qs, qs[1:])), (pid, col, qs)
            assert row[f"min_{col}"] - 1e-6 <= qs[0], (pid, col)
            assert qs[-1] <= row[f"max_{col}"] + 1e-6, (pid, col)

    cols = {"partition_id": report.column(PARTITION_COL).cast(pa.int32()),
            "n_rows": report.column("n_rows").cast(pa.int64()),
            "null_caption": report.column("null_caption").cast(pa.int64())}
    for c in ("w", "h"):
        cols[f"min_{c}"] = report.column(f"min_{c}").cast(pa.float64())
        cols[f"max_{c}"] = report.column(f"max_{c}").cast(pa.float64())
        cols[f"mean_{c}"] = pa.array(
            _round_away(report.column(f"mean_{c}").to_numpy(zero_copy_only=False), 4)
        )
    return pa.table(cols)


def q_image_stats_exact(sf_dir: str):
    """Exact lane of the per-partition stats profile (count / null-rate
    / min / max / mean over the actor-pool sketch pass), hash-checked
    against SQL — the HLL/t-digest lanes stay rows-only in
    ``image_stats_profile``.  Includes the merged global row
    (partition_id = -1)."""
    d = _image_fixture_dir()
    meta = rd.read_parquet(d, columns=["image_id", "w", "h", "caption", PARTITION_COL])
    report = stats_report(profile_stats(meta, concurrency=_pool_size(2)))
    cols = {
        "partition_id": report.column(PARTITION_COL).cast(pa.int32()),
        "n_rows": report.column("n_rows").cast(pa.int64()),
        "null_caption": report.column("null_caption").cast(pa.int64()),
        "min_w": report.column("min_w").cast(pa.float64()),
        "max_w": report.column("max_w").cast(pa.float64()),
        "mean_w": pa.array(
            _round_away(report.column("mean_w").to_numpy(zero_copy_only=False), 4)
        ),
    }
    return pa.table(cols)


def q_image_embedding_dedup(sf_dir: str):
    """Full multimodal chain: decode → feature-extract (actor pool) →
    embedding-cosine near-dup pairs — the hot-cluster rows share pixel
    content per dims, so the chain must rediscover them (rows-only;
    summarized as per-image duplicate-partner counts for stability)."""
    from ..stages.multimodal import image_features

    d = _image_fixture_dir()
    ds = rd.read_parquet(d, columns=["image_id", "bytes", "w", "h", "fmt"]).limit(600)
    feats = image_features(ds, concurrency=_pool_size())

    def feature_hash(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        n = len(batch)
        per_row = flat.reshape(n, -1)
        # stable content hash: hash the raw feature bytes per row
        import pandas as pd

        h = pd.util.hash_array(
            np.array([row.tobytes() for row in per_row], dtype=object),
            categorize=False,
        ).astype(np.int64)
        return pa.table(
            {"image_id": batch.column("image_id"), "fhash": pa.array(h, pa.int64())}
        )

    hashed = feats.map_batches(feature_hash, batch_format="pyarrow")
    groups = duplicate_groups(hashed, ["fhash"], id_col="image_id")

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "keep_id": batch.column("keep_id").cast(pa.string()),
                "n": batch.column("n").cast(pa.int64()),
            }
        )

    out = _as_table(groups.map_batches(cast, batch_format="pyarrow"))
    return out.sort_by("keep_id")


def q_image_phash_dupgroups(sf_dir: str):
    """Near-duplicate image groups by perceptual hash: the hot-cluster
    rows share pixel content per dims, so their phash collides — exact
    dedup keyed on the hash of the pixels (rows-only)."""
    d = _image_fixture_dir()
    ds = rd.read_parquet(d, columns=["image_id", "phash"])
    out = duplicate_groups(ds, ["phash"], id_col="image_id")

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "phash": batch.column("phash").cast(pa.int64()),
                "keep_id": batch.column("keep_id").cast(pa.string()),
                "n": batch.column("n").cast(pa.int64()),
            }
        )

    return out.map_batches(cast, batch_format="pyarrow")


def q_image_phash_near_dups(sf_dir: str):
    """Perceptual-hash near-duplicate pairs (hamming ≤ 3) over the
    image table via the pigeonhole chunk-bucket plan — hash-checked:
    within the hamming budget the chunk cover is exhaustive, so absent
    star-cap sampling (asserted) the candidate set IS the hamming ball,
    which DuckDB recomputes with an n² self-join at fixture scale."""
    from ..stages.dedup import hash_hamming_candidates

    d = _image_fixture_dir()
    ds = rd.read_parquet(d, columns=["image_id", "phash"])
    # cap raised above C(n_fixture, 2): the structured phashes share
    # low-entropy chunks, so one chunk group can span most of the
    # table — exhaustive pairing keeps the set oracle-exact here while
    # the default cap stays the at-scale behavior (audit columns)
    out = _as_table(
        hash_hamming_candidates(
            ds, hash_col="phash", id_col="image_id", max_hamming=3,
            max_bucket_pairs=2_000_000,
        )
    )
    # no group was star-capped ⇒ the pair set is exact, not sampled
    assert out.num_rows == 0 or pc.max(out.column("sampled")).as_py() == 0
    return pa.table(
        {
            "doc_a": out.column("doc_a").cast(pa.string()),
            "doc_b": out.column("doc_b").cast(pa.string()),
            "hamming": out.column("hamming").cast(pa.int64()),
        }
    ).sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


def q_image_features(sf_dir: str):
    """Multimodal chain: decode → feature-extract (actor pool) over a
    slice of the image table."""
    from ..stages.multimodal import image_features

    d = _image_fixture_dir()
    ds = rd.read_parquet(d, columns=["image_id", "bytes", "w", "h", "fmt"]).limit(200)
    feats = image_features(ds, concurrency=_pool_size())

    def summarize(batch: pa.Table) -> pa.Table:
        dims = pc.list_value_length(batch.column("embedding"))
        return pa.table(
            {"image_id": batch.column("image_id"), "feature_dim": dims.cast(pa.int64())}
        )

    return feats.map_batches(summarize, batch_format="pyarrow")


# --- oracle-checked image metadata validation ------------------------------
# The corrupted fixture is written to a deterministic /tmp parquet so the
# DuckDB oracle can read the SAME input the Ray pipeline validates —
# this upgrades the flagship's metadata-rule subset from rows-only to a
# full hash-checked correctness gate (VERDICT r1 #9).

_CORRUPT_FIXTURE_ROWS = 1500


def _corrupt_fixture_pathname(n: int = _CORRUPT_FIXTURE_ROWS, seed: int = 42) -> str:
    """Pure path computation — safe at import time (no generation)."""
    return os.path.join(
        tempfile.gettempdir(), f"mtbray_corrupt_v5_n{n}_s{seed}", "images.parquet"
    )


@functools.lru_cache(maxsize=2)
def _corrupt_fixture_path(n: int = _CORRUPT_FIXTURE_ROWS, seed: int = 42) -> str:
    import pyarrow.parquet as pq

    from ..sources.fixtures import corrupted_fixture

    path = _corrupt_fixture_pathname(n, seed)
    d = os.path.dirname(path)
    if not os.path.exists(path):
        os.makedirs(d, exist_ok=True)
        c = corrupted_fixture(n, seed=seed)
        tmp = path + ".tmp"
        pq.write_table(c.table, tmp)
        os.replace(tmp, path)
    return path


def ensure_image_oracle_inputs() -> None:
    """Idempotent: make sure BOTH fixture parquets the image oracles
    read exist (called from ``__ray_entry__.oracle_sql()`` and the
    checker so the DuckDB side never races the Ray side; the oracle SQL
    strings themselves embed only computed paths, so importing this
    module generates nothing)."""
    _corrupt_fixture_path()
    _image_fixture_dir()


def _image_meta_violations(sf_dir: str) -> rd.Dataset:
    from ..sources.fixtures import CAPTION_KEYS
    from ..stages.row_pass import META_COLUMNS, run_row_pass

    ds = rd.read_parquet(_corrupt_fixture_path(), columns=META_COLUMNS)
    from ..rules.registry import default_image_ruleset

    return run_row_pass(
        ds, default_image_ruleset(),
        {"caption_refs": frozenset(CAPTION_KEYS)}, concurrency=_pool_size(),
    )


def q_image_validate_meta(sf_dir: str):
    """Metadata-rule subset of the flagship validation (presence /
    value-set / regex / range / conditional / referential / list rules
    over the corrupted fixture), hash-checked against a DuckDB oracle
    that replicates every kernel + its andThen gating in SQL."""
    t = _as_table(_image_meta_violations(sf_dir))
    return (
        t.select(["record_id", "rule_id", "severity", "path"])
        .sort_by([("record_id", "ascending"), ("rule_id", "ascending")])
    )


def q_image_issue_subtrees(sf_dir: str):
    """Hierarchical-path roll-up: issues per 2-segment path subtree —
    the consumer view the reference's Path tree enables (issues grouped
    by `Tumor-Staging/...`-style prefix)."""
    out = _image_meta_violations(sf_dir)

    def prefix(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column("path"), r"^(?P<p>/[^/]+/[^/]+)")
        subtree = pc.coalesce(pc.struct_field(m, "p"), batch.column("path"))
        return pa.table(
            {"subtree": subtree, "severity": batch.column("severity")}
        )

    agg = (
        out.map_batches(prefix, batch_format="pyarrow")
        .groupby(["subtree", "severity"])
        .aggregate(Count(alias_name="n"))
    )

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subtree": batch.column("subtree"),
                "severity": batch.column("severity"),
                "n": batch.column("n").cast(pa.int64()),
            }
        )

    return agg.map_batches(cast, batch_format="pyarrow")


def q_image_verdict_meta(sf_dir: str):
    """Verdict roll-up over the metadata-rule subset, hash-checked
    against a DuckDB replica of the reduce itself (max severity +
    issue count + uniqueness escalation per record — the reference's
    ``FatalIssuesDetected`` outcome partitioning, Tests.scala:45-56).
    Runs BOTH reduce strategies (vectorized driver fast path and the
    distributed hash aggregate) and asserts they agree before returning
    (VERDICT r2 #3)."""
    from .verdicts import verdicts_with_unique

    ids = rd.read_parquet(
        _corrupt_fixture_path(), columns=["image_id", PARTITION_COL]
    ).materialize()
    viol = _image_meta_violations(sf_dir).materialize()

    def canon(v: rd.Dataset):
        df = _as_table(v).to_pandas()
        df["partition_id"] = df["partition_id"].astype("int64")
        return df.sort_values("record_id", na_position="last").reset_index(
            drop=True
        )

    a = canon(verdicts_with_unique(ids, viol, strategy="driver")[0])
    b = canon(verdicts_with_unique(ids, viol, strategy="shuffle")[0])
    if not a.equals(b):
        diff = (a != b) & ~(a.isna() & b.isna())
        raise AssertionError(
            f"driver and shuffle verdict reduces disagree:\n"
            f"{a[diff.any(axis=1)].head()}\n{b[diff.any(axis=1)].head()}"
        )
    return pa.table(
        {
            "record_id": pa.array(a["record_id"], pa.string()),
            "verdict": pa.array(a["verdict"], pa.string()),
            "n_issues": pa.array(a["n_issues"], pa.int64()),
            "accepted": pa.array(a["accepted"], pa.bool_()),
            "partition_id": pa.array(a["partition_id"], pa.int64()),
        }
    )


def _image_verdict_oracle_sql() -> str:
    """DuckDB replica of the verdict reduce: per-record max severity
    rank over the meta-rule violations, +1 issue and an error-rank
    escalation for duplicated ids, fatal ⇒ not accepted.  NULL record
    ids form ONE group (chr(1) sentinel — same contract as the
    engine's NULL_ID_SENTINEL)."""
    from .. import SEVERITY_RANK
    from ..stages.unique import SEVERITY as UQ_SEVERITY

    uq_rank = SEVERITY_RANK[UQ_SEVERITY]
    fatal_rank = SEVERITY_RANK["fatal"]
    src = f"read_parquet('{_corrupt_fixture_pathname()}')"
    return f"""
    WITH viol AS (
        SELECT COALESCE(record_id, chr(1)) AS rid, severity
        FROM ({_image_meta_oracle_union()})
    ),
    occ AS (
        SELECT COALESCE(image_id, chr(1)) AS rid,
               MAX(image_id) AS record_id,
               CAST(COUNT(*) AS BIGINT) AS n_occ,
               MAX(partition_id) AS pid
        FROM {src} GROUP BY 1
    ),
    vagg AS (
        SELECT rid,
               MAX(CASE severity WHEN 'info' THEN 0 WHEN 'warning' THEN 1
                   WHEN 'error' THEN 2 WHEN 'fatal' THEN 3 END) AS vrank,
               CAST(COUNT(*) AS BIGINT) AS nv
        FROM viol GROUP BY rid
    ),
    j AS (
        SELECT occ.record_id, occ.pid,
               GREATEST(COALESCE(vagg.vrank, -1),
                        CASE WHEN occ.n_occ > 1 THEN {uq_rank} ELSE -1 END)
                   AS grank,
               CAST(COALESCE(vagg.nv, 0)
                    + CASE WHEN occ.n_occ > 1 THEN 1 ELSE 0 END AS BIGINT)
                   AS n_issues
        FROM occ LEFT JOIN vagg ON occ.rid = vagg.rid
    )
    SELECT record_id,
           CASE grank WHEN -1 THEN 'pass' WHEN 0 THEN 'info'
                WHEN 1 THEN 'warning' WHEN 2 THEN 'error'
                ELSE 'fatal' END AS verdict,
           n_issues,
           grank < {fatal_rank} AS accepted,
           CAST(pid AS BIGINT) AS partition_id
    FROM j ORDER BY record_id
    """


def _image_meta_oracle_union() -> str:
    """DuckDB replica of every metadata rule kernel incl. gating — one
    SELECT per rule, UNION ALL'd.  Reads the same parquet the Ray side
    validates (deterministic /tmp path)."""
    from ..sources.fixtures import CAPTION_KEYS
    from ..state.catalogs import caption_vocab, fmt_values

    src = f"read_parquet('{_corrupt_fixture_pathname()}')"
    fmts = ", ".join(f"'{v}'" for v in sorted(fmt_values()))
    keys = ", ".join(f"'{k}'" for k in sorted(CAPTION_KEYS))
    vocab = ", ".join(f"'{w}'" for w in sorted(caption_vocab()))
    cappat = r"[\x20-\x7E\x{00A1}-\x{FFFF}]+"
    cap_ok = (
        "caption IS NOT NULL AND length(caption) > 0"
    )
    sel = []

    def rule(rule_id, severity, path, cond, extra_from=""):
        sel.append(
            f"SELECT image_id AS record_id, '{rule_id}' AS rule_id, "
            f"'{severity}' AS severity, '{path}' AS path "
            f"FROM {src}{extra_from} WHERE {cond}"
        )

    rule("R-PR-ID", "error", "/record/image_id",
         "image_id IS NULL OR length(image_id) = 0")
    rule("R-PR-CAPTION", "warning", "/record/caption",
         "caption IS NULL OR length(caption) = 0")
    rule("R-PR-EITHER", "warning", "/record",
         "caption IS NULL AND phash IS NULL")
    rule("R-VS-FMT", "error", "/record/fmt",
         f"fmt IS NOT NULL AND fmt NOT IN ({fmts})")
    rule("R-RE-ID", "error", "/record/image_id/format",
         "image_id IS NOT NULL AND length(image_id) > 0 "
         "AND NOT regexp_full_match(image_id, 'img-[0-9a-f]{16}')")
    rule("R-RE-CAPTION", "warning", "/record/caption/charset",
         f"{cap_ok} AND NOT regexp_full_match(caption, '{cappat}')")
    rule("R-RG-W", "error", "/record/dims/w",
         "w IS NOT NULL AND (w < 1 OR w > 16384)")
    rule("R-RG-H", "error", "/record/dims/h",
         "h IS NOT NULL AND (h < 1 OR h > 16384)")
    rule("R-RG-PHASH", "warning", "/record/phash", "phash = 0")
    rule("R-RG-CAPLEN", "info", "/record/caption/length",
         f"{cap_ok} AND length(caption) < 8")
    rule("R-COND-FMT", "error", "/record/fmt/conditional",
         "(fmt = 'png' AND phash IS NULL) OR "
         "(fmt = 'lossy' AND (phash IS NULL OR caption IS NULL "
         "OR length(caption) = 0))")
    rule("R-REF-CAPKEY", "fatal", "/record/caption/key",
         f"{cap_ok} AND lower(split_part(caption, ' ', 1)) NOT IN ({keys})")
    # validateEach words rule with dynamic list-index paths + gating
    sel.append(f"""
        SELECT record_id, 'R-VSL-CAPWORDS' AS rule_id, 'warning' AS severity,
               '/record/caption/words[' || CAST(u['i'] - 1 AS VARCHAR) || ']' AS path
        FROM (
          SELECT image_id AS record_id,
                 unnest(list_transform(string_split(caption, ' '),
                                       (w, i) -> {{'w': w, 'i': i}})) AS u
          FROM {src}
          WHERE {cap_ok}
            AND regexp_full_match(caption, '{cappat}')
            AND lower(split_part(caption, ' ', 1)) IN ({keys})
        ) WHERE u['w'] NOT IN ({vocab})""")
    return " UNION ALL ".join(sel)


def _image_meta_oracle_sql() -> str:
    return (
        f"SELECT record_id, rule_id, severity, path FROM "
        f"({_image_meta_oracle_union()}) ORDER BY record_id, rule_id"
    )


def _image_subtrees_oracle_sql() -> str:
    return f"""
        SELECT COALESCE(NULLIF(regexp_extract(path, '^/[^/]+/[^/]+'), ''), path)
                 AS subtree,
               severity, CAST(COUNT(*) AS BIGINT) AS n
        FROM ({_image_meta_oracle_union()})
        GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# Oracle SQL (DuckDB; views pre-registered by the driver)
# ---------------------------------------------------------------------------


def _langid_sql() -> str:
    cols = []
    for lang, words in STOPWORDS.items():
        pattern = r"\b(" + "|".join(words) + r")\b"
        cols.append(
            f"CAST(len(regexp_extract_all(lower(text), '{pattern}')) AS DOUBLE) AS c_{lang}"
        )
    cols.append(
        f"3.0 * len(regexp_extract_all(text, '{CJK_PATTERN}')) AS c_zh"
    )
    return f"""
WITH c AS (SELECT doc_id, {', '.join(cols)} FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CASE WHEN greatest(c_en, c_de, c_fr, c_es, c_zh) = 0 THEN 'und'
       WHEN c_en >= greatest(c_de, c_fr, c_es, c_zh) THEN 'en'
       WHEN c_de >= greatest(c_fr, c_es, c_zh) THEN 'de'
       WHEN c_fr >= greatest(c_es, c_zh) THEN 'fr'
       WHEN c_es >= c_zh THEN 'es'
       ELSE 'zh' END AS lang_pred
FROM c"""


ORACLE_SQL: dict[str, str] = {
    "check_range_quantity": """
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_quantity < 1 OR l_quantity > 30""",
    "check_valueset_returnflag": """
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
               CAST(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END AS BIGINT) AS valid
        FROM lineitem GROUP BY l_returnflag""",
    "check_presence_documents": """
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_text_missing,
               CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_missing
        FROM documents""",
    "check_regex_doc_start": """
        SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
        WHERE NOT regexp_matches(coalesce(text, ''), '^[a-z]')""",
    "check_xfield_nchars": """
        SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
        WHERE text IS NULL OR length(text) <> n_chars""",
    "check_unique_orderkey": """
        SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1""",
    "check_ref_users_without_purchase": """
        SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id FROM events
        WHERE user_id NOT IN
          (SELECT user_id FROM events WHERE event_type = 'purchase')""",
    "join_revenue_by_region": """
        SELECT r.r_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name""",
    "parse_props_k": """
        SELECT event_type,
               CAST(SUM(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(COUNT(regexp_extract(props, '"k":\\s*(\\d+)', 1)) AS BIGINT) AS n_k
        FROM events GROUP BY event_type""",
    "agg_user_type_fold": """
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
               bool_or(event_type = 'purchase') AS has_purchase
        FROM events WHERE ts > TIMESTAMP '2024-01-08'
        GROUP BY user_id""",
    "censoring_coalesce": """
        SELECT CAST(user_id AS BIGINT) AS user_id,
               strftime(COALESCE(
                 MAX(CASE WHEN event_type = 'purchase' THEN ts END),
                 MAX(ts),
                 TIMESTAMP '2026-08-17 00:00:00'), '%Y-%m-%d %H:%M:%S.%f') AS censoring_ts
        FROM events GROUP BY user_id""",
    "agg_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_quantity) / COUNT(*), 4) AS avg_qty,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "agg_latest_event_per_user": """
        SELECT CAST(user_id AS BIGINT) AS user_id,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id""",
    "agg_daily_events": """
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM events GROUP BY 1, 2""",
    "agg_top5_users_by_value": """
        SELECT CAST(user_id AS BIGINT) AS user_id,
               ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY user_id
        ORDER BY total_value DESC, user_id LIMIT 5""",
    "stats_profile_lineitem": """
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
               min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
               ROUND(SUM(l_quantity) / COUNT(*), 4) AS avg_qty
        FROM lineitem GROUP BY l_returnflag""",
    "stats_salted_returnflag": """
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
               ROUND(SUM(l_quantity) / COUNT(*), 4) AS avg_qty
        FROM lineitem GROUP BY l_returnflag""",
    "distinct_users_exact": """
        SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct FROM events""",
    "dedup_exact_by_key": """
        SELECT lang, CAST(n_chars AS BIGINT) AS n_chars,
               CAST(min(doc_id) AS BIGINT) AS keep_id,
               CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY lang, n_chars HAVING count(*) > 1""",
    "dedup_exact_text": """
        SELECT text, CAST(min(doc_id) AS BIGINT) AS keep_id,
               CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY text HAVING count(*) > 1""",
    "text_token_counts": f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(len(regexp_extract_all(coalesce(text, ''), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tokens
        FROM documents""",
    "text_quality_counts": f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars_obs,
               CAST(len(regexp_extract_all(coalesce(text, ''), '[A-Za-z]')) AS BIGINT) AS n_alpha,
               CAST(len(regexp_extract_all(coalesce(text, ''), '[0-9]')) AS BIGINT) AS n_digit,
               CAST(len(regexp_extract_all(coalesce(text, ''), '\\s')) AS BIGINT) AS n_space,
               CAST(len(regexp_extract_all(coalesce(text, ''), '{TOKEN_PATTERN}')) AS BIGINT) AS n_tokens
        FROM documents""",
    "text_langid": _langid_sql(),
    "text_quality_score": """
        WITH q AS (
          SELECT doc_id,
                 CAST(length(coalesce(text, '')) AS DOUBLE) AS n,
                 CAST(len(regexp_extract_all(coalesce(text, ''), '[A-Za-z]')) AS DOUBLE) AS n_alpha,
                 CAST(len(regexp_extract_all(coalesce(text, ''), '\s')) AS DOUBLE) AS n_space
          FROM documents)
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               ROUND(GREATEST(LEAST(
                 0.5 * (n_alpha / GREATEST(n, 1.0))
                 + 0.3 * LEAST(n / 200.0, 1.0)
                 + 0.2 * (1.0 - ABS(n_space / GREATEST(n, 1.0) - 0.15)),
               1.0), 0.0), 6) AS quality
        FROM q""",
    "events_sessions_per_user": """
        WITH gaps AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           > INTERVAL 1 HOUR THEN 1 ELSE 0 END AS new_sess
          FROM events),
        sess AS (
          SELECT user_id,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM gaps)
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(count(DISTINCT sid) AS BIGINT) AS n_sessions
        FROM sess GROUP BY user_id""",
    "knn_embeddings": """
        SELECT CAST(vec_id AS BIGINT) AS vec_id,
               ROUND(list_cosine_similarity(
                   CAST(embedding AS DOUBLE[]),
                   (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
               ), 4) AS score
        FROM embeddings
        ORDER BY list_cosine_similarity(
                   CAST(embedding AS DOUBLE[]),
                   (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
               ) DESC, vec_id
        LIMIT 10""",
    "dedup_embedding_cosine": """
        SELECT CAST(a.vec_id AS BIGINT) AS id_a, CAST(b.vec_id AS BIGINT) AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.9""",
}


QUERIES = {
    "check_range_quantity": q_check_range_quantity,
    "check_valueset_returnflag": q_check_valueset_returnflag,
    "check_presence_documents": q_check_presence_documents,
    "check_regex_doc_start": q_check_regex_doc_start,
    "check_xfield_nchars": q_check_xfield_nchars,
    "check_unique_orderkey": q_check_unique_orderkey,
    "check_ref_users_without_purchase": q_check_ref_users_without_purchase,
    "check_cardinality_lang": q_check_cardinality_lang,
    "join_revenue_by_region": q_join_revenue_by_region,
    "parse_props_k": q_parse_props_k,
    "agg_user_type_fold": q_agg_user_type_fold,
    "censoring_coalesce": q_censoring_coalesce,
    "agg_pricing_summary": q_agg_pricing_summary,
    "agg_latest_event_per_user": q_agg_latest_event_per_user,
    "agg_daily_events": q_agg_daily_events,
    "agg_top5_users_by_value": q_agg_top5_users_by_value,
    "stats_profile_lineitem": q_stats_profile_lineitem,
    "stats_salted_returnflag": q_stats_salted_returnflag,
    "distinct_users_exact": q_distinct_users_exact,
    "dedup_exact_by_key": q_dedup_exact_by_key,
    "dedup_exact_text": q_dedup_exact_text,
    "text_token_counts": q_text_token_counts,
    "text_quality_counts": q_text_quality_counts,
    "text_langid": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
    "events_sessions_per_user": q_events_sessions_per_user,
    "events_sessions_streaming": q_events_sessions_streaming,
    "knn_embeddings": q_knn_embeddings,
    "knn_ivf_embeddings": q_knn_ivf_embeddings,
    "text_quality_score": q_text_quality_score,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "dedup_minhash_docs": q_dedup_minhash_docs,
    "dedup_duplicate_clusters": q_dedup_duplicate_clusters,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_simhash_docs": q_dedup_simhash_docs,
    "hll_distinct_users": q_hll_distinct_users,
    "tdigest_value_quantiles": q_tdigest_value_quantiles,
    "asof_latest_order_per_event": q_asof_latest_order_per_event,
    "range_join_events_in_order_window": q_range_join_events_in_order_window,
    "orders_semi_bloom": q_orders_semi_bloom,
    "events_anti_bloom": q_events_anti_bloom,
    "events_intersect_sides": q_events_intersect_sides,
    "events_except_sides": q_events_except_sides,
    "events_sliding_window": q_events_sliding_window,
    "split_lineitem_hash": q_split_lineitem_hash,
    "cap_events_per_user": q_cap_events_per_user,
    "text_top_terms": q_text_top_terms,
    "text_cms_top_terms": q_text_cms_top_terms,
    "events_rolling_avg": q_events_rolling_avg,
    "events_ranked_window": q_events_ranked_window,
    "events_ntile_per_user": q_events_ntile_per_user,
    "events_lag_lead": q_events_lag_lead,
    "sample_orders_hash": q_sample_orders_hash,
    "sample_orders_bottomk": q_sample_orders_bottomk,
    "events_zscore_per_type": q_events_zscore_per_type,
    "events_robust_scale": q_events_robust_scale,
    "events_percent_rank": q_events_percent_rank,
    "events_argmax_row": q_events_argmax_row,
    "events_mode_per_user": q_events_mode_per_user,
    "events_transitions": q_events_transitions,
    "events_union_sides": q_events_union_sides,
    "events_topk_per_user": q_events_topk_per_user,
    "events_rollup": q_events_rollup,
    "events_cube": q_events_cube,
    "events_funnel": q_events_funnel,
    "events_corr_per_type": q_events_corr_per_type,
    "text_normalized": q_text_normalized,
    "events_string_agg": q_events_string_agg,
    "join_customer_orders_full": q_join_customer_orders_full,
    "curate_documents_corpus": q_curate_documents,
    "decontaminate_docs": q_decontaminate_docs,
    "decontaminate_docs_drop": q_decontaminate_docs_drop,
    "pack_documents_seqs": q_pack_documents_seqs,
    "text_repetition": q_text_repetition,
    "events_value_quantiles_cont": q_events_value_quantiles_cont,
    "events_value_histogram": q_events_value_histogram,
    "events_value_quantiles_exact": q_events_value_quantiles_exact,
    "tdigest_quantiles_per_type": q_tdigest_quantiles_per_type,
    "events_pivot_user_type": q_events_pivot_user_type,
    "sample_stratified_events": q_sample_stratified_events,
    "text_doc_top_term": q_text_doc_top_term,
    "distinct_users_per_type": q_distinct_users_per_type,
    "hll_distinct_users_per_type": q_hll_distinct_users_per_type,
    "image_validate": q_image_validate,
    "image_validate_meta": q_image_validate_meta,
    "image_verdict_meta": q_image_verdict_meta,
    "dedup_cc_pairs": q_dedup_cc_pairs,
    "text_jaccard_adjacent": q_text_jaccard_adjacent,
    "text_fingerprint_groups": q_text_fingerprint_groups,
    "image_issue_subtrees": q_image_issue_subtrees,
    "image_verdict_summary": q_image_verdict_summary,
    "image_stats_profile": q_image_stats_profile,
    "image_stats_exact": q_image_stats_exact,
    "image_features": q_image_features,
    "image_phash_dupgroups": q_image_phash_dupgroups,
    "image_phash_near_dups": q_image_phash_near_dups,
    "image_embedding_dedup": q_image_embedding_dedup,
}

# appended (not in the literal) because the SQL embeds the deterministic
# /tmp fixture path, ensured on build — see ensure_image_oracle_inputs()
ORACLE_SQL["check_cardinality_lang"] = """
    SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents
    GROUP BY lang HAVING count(*) < 75"""
ORACLE_SQL["events_sessions_streaming"] = ORACLE_SQL["events_sessions_per_user"]
ORACLE_SQL["image_validate_meta"] = _image_meta_oracle_sql()
ORACLE_SQL["image_verdict_meta"] = _image_verdict_oracle_sql()
ORACLE_SQL["dedup_cc_pairs"] = _CC_PAIRS_ORACLE
ORACLE_SQL["text_jaccard_adjacent"] = _JACCARD_ADJACENT_ORACLE
ORACLE_SQL["decontaminate_docs"] = _DECONTAM_FLAG_ORACLE
ORACLE_SQL["decontaminate_docs_drop"] = _DECONTAM_DROP_ORACLE
ORACLE_SQL["pack_documents_seqs"] = _PACK_SEQS_ORACLE
ORACLE_SQL["text_repetition"] = _TEXT_REPETITION_ORACLE
ORACLE_SQL["text_fingerprint_groups"] = _FINGERPRINT_GROUPS_ORACLE
ORACLE_SQL["image_issue_subtrees"] = _image_subtrees_oracle_sql()
ORACLE_SQL["image_phash_dupgroups"] = f"""
    SELECT phash, MIN(image_id) AS keep_id, CAST(count(*) AS BIGINT) AS n
    FROM read_parquet('{_image_fixture_dirname()}/part-*.parquet')
    GROUP BY phash HAVING count(*) > 1"""
ORACLE_SQL["asof_latest_order_per_event"] = """
    WITH r AS (
        SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey,
               arg_max(o_totalprice, o_orderkey) AS o_totalprice
        FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, r.o_orderkey, r.o_totalprice
    FROM events e ASOF LEFT JOIN r
      ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    ORDER BY event_id"""

ORACLE_SQL["events_lag_lead"] = """
    SELECT event_id, user_id,
           LAG(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w AS lag_cents,
           LEAD(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w AS lead_cents,
           CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS BIGINT) AS delta_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY event_id"""

ORACLE_SQL["events_ntile_per_user"] = """
    SELECT event_id, user_id,
           CAST(NTILE(4) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS BIGINT) AS tile
    FROM events
    ORDER BY event_id"""

ORACLE_SQL["events_ranked_window"] = """
    SELECT event_id, user_id,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS row_num,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER (
               w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_sum_cents
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY event_id"""

ORACLE_SQL["events_intersect_sides"] = """
    SELECT user_id, event_type FROM events WHERE value > 100
    INTERSECT
    SELECT user_id, event_type FROM events WHERE ts < TIMESTAMP '2024-01-10'
    ORDER BY user_id, event_type"""

ORACLE_SQL["events_except_sides"] = """
    SELECT user_id, event_type FROM events WHERE value > 100
    EXCEPT
    SELECT user_id, event_type FROM events WHERE ts < TIMESTAMP '2024-01-10'
    ORDER BY user_id, event_type"""

ORACLE_SQL["orders_semi_bloom"] = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey
                    AND c.c_mktsegment = 'BUILDING')
    ORDER BY o_orderkey"""

ORACLE_SQL["events_anti_bloom"] = """
    SELECT event_id, user_id, value
    FROM events e
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = e.user_id
                        AND o.o_totalprice > 300000)
    ORDER BY event_id"""

ORACLE_SQL["range_join_events_in_order_window"] = """
    WITH w AS (
      SELECT user_id AS w_user, min(ts) AS w_start,
             min(ts) + INTERVAL 6 HOUR AS w_end
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, w.w_start
    FROM events e JOIN w
      ON e.user_id = w.w_user
     AND e.ts >= w.w_start
     AND e.ts < w.w_end
    ORDER BY e.event_id"""

ORACLE_SQL["image_phash_near_dups"] = f"""
    WITH src AS (SELECT image_id, phash
                 FROM read_parquet('{_image_fixture_dirname()}/part-*.parquet'))
    SELECT a.image_id AS doc_a, b.image_id AS doc_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
    FROM src a JOIN src b ON a.image_id < b.image_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 3
    ORDER BY doc_a, doc_b"""

ORACLE_SQL["events_sliding_window"] = """
    WITH x AS (
        SELECT (epoch_us(ts) // 3600000000 - t.j) * 3600000000 AS ws_us,
               event_type, value
        FROM events CROSS JOIN range(6) t(j)
    )
    SELECT strftime(make_timestamp(ws_us), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS sum_value,
           CAST(MIN(value) AS DOUBLE) AS min_value,
           CAST(MAX(value) AS DOUBLE) AS max_value,
           (CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) // COUNT(*))
               / 100.0 AS avg_value
    FROM x GROUP BY ws_us, event_type
    ORDER BY window_start, event_type"""

ORACLE_SQL["split_lineitem_hash"] = """
    WITH h AS (
        SELECT l_quantity,
               CAST((CAST(l_orderkey % 4294967296 AS HUGEINT)
                     * 2654435761) % 4294967296 AS DOUBLE) AS hv
        FROM lineitem
    )
    SELECT CASE WHEN hv < 0.9 * 4294967296 THEN 'train'
                WHEN hv < (0.9 + 0.05) * 4294967296 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM h GROUP BY split ORDER BY split"""

ORACLE_SQL["cap_events_per_user"] = """
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(user_id AS BIGINT) AS user_id
    FROM (
        SELECT event_id, user_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn <= 3 ORDER BY event_id"""

ORACLE_SQL["text_top_terms"] = """
    WITH toks AS (
        SELECT unnest(string_split(
            trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
        FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    )
    SELECT term, CAST(count(*) AS BIGINT) AS n
    FROM toks WHERE term <> ''
    GROUP BY term ORDER BY n DESC, term LIMIT 20"""

ORACLE_SQL["events_rolling_avg"] = """
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(user_id AS BIGINT) AS user_id,
           CAST(cnt AS BIGINT) AS roll_n,
           (CAST(ROUND(s * 100, 0) AS BIGINT) // cnt) / 100.0 AS roll_avg
    FROM (
        SELECT event_id, user_id,
               COUNT(value) OVER w AS cnt,
               SUM(value) OVER w AS s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ) ORDER BY event_id"""

ORACLE_SQL["sample_orders_hash"] = """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    WHERE CAST((CAST(o_orderkey % 4294967296 AS HUGEINT) * 2654435761)
               % 4294967296 AS DOUBLE) < 0.1 * 4294967296
    GROUP BY o_orderstatus ORDER BY o_orderstatus"""

ORACLE_SQL["events_zscore_per_type"] = """
    SELECT event_id, event_type,
           CASE WHEN value IS NULL OR event_type IS NULL
                     OR STDDEV_POP(value) OVER w = 0
                THEN NULL
                ELSE ROUND((value - AVG(value) OVER w)
                           / STDDEV_POP(value) OVER w, 6)
           END AS z
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    ORDER BY event_id"""

ORACLE_SQL["events_topk_per_user"] = """
    SELECT event_id, user_id, value, rank FROM (
        SELECT event_id, user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id DESC)
                   AS rank
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL
    ) WHERE rank <= 3 ORDER BY user_id, rank"""

ORACLE_SQL["events_rollup"] = """
    SELECT event_type, CAST(user_id AS BIGINT) AS user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events
    GROUP BY ROLLUP(event_type, user_id)
    ORDER BY event_type, user_id"""

ORACLE_SQL["events_value_quantiles_cont"] = """
    WITH g AS (
        SELECT event_type,
               quantile_cont(value, 0.25) AS q25,
               quantile_cont(value, 0.50) AS q50,
               quantile_cont(value, 0.75) AS q75
        FROM events GROUP BY event_type
    )
    SELECT event_type, q, ROUND(v, 6) AS value FROM (
        SELECT event_type, 0.25 AS q, q25 AS v FROM g
        UNION ALL SELECT event_type, 0.50, q50 FROM g
        UNION ALL SELECT event_type, 0.75, q75 FROM g
    ) ORDER BY event_type, q"""

ORACLE_SQL["join_customer_orders_full"] = """
    WITH l AS (
        SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000
    ), r AS (
        SELECT o_custkey AS c_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey
    )
    SELECT COALESCE(l.c_custkey, r.c_custkey) AS c_custkey,
           l.c_acctbal, r.n_orders
    FROM l FULL OUTER JOIN r ON l.c_custkey = r.c_custkey
    ORDER BY c_custkey"""

ORACLE_SQL["events_corr_per_type"] = """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CASE WHEN COUNT(*) < 2
                     OR STDDEV_POP(value) = 0
                     OR STDDEV_POP(CAST(epoch_us(ts) AS DOUBLE)) = 0
                THEN NULL
                ELSE ROUND(CORR(value, CAST(epoch_us(ts) AS DOUBLE)), 6)
           END AS r
    FROM events
    WHERE event_type IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
    GROUP BY event_type ORDER BY event_type"""

ORACLE_SQL["text_normalized"] = """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           trim(regexp_replace(lower(COALESCE(text, '')), '\\s+', ' ', 'g'))
               AS norm
    FROM documents ORDER BY doc_id"""

ORACLE_SQL["events_string_agg"] = """
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY event_type) AS agg,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT DISTINCT user_id, event_type FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    )
    GROUP BY user_id ORDER BY user_id"""

ORACLE_SQL["events_funnel"] = """
    WITH base AS (
        SELECT user_id, event_type, ts FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
              AND ts IS NOT NULL
    ),
    s1 AS (SELECT user_id, MIN(ts) AS t FROM base
           WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT b.user_id, MIN(b.ts) AS t
           FROM base b JOIN s1 ON b.user_id = s1.user_id
           WHERE b.event_type = 'view' AND b.ts > s1.t
           GROUP BY b.user_id),
    s3 AS (SELECT b.user_id, MIN(b.ts) AS t
           FROM base b JOIN s2 ON b.user_id = s2.user_id
           WHERE b.event_type = 'purchase' AND b.ts > s2.t
           GROUP BY b.user_id)
    SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS step, 'signup' AS step_type,
               CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
        UNION ALL
        SELECT 2, 'view', COUNT(*) FROM s2
        UNION ALL
        SELECT 3, 'purchase', COUNT(*) FROM s3
    ) ORDER BY step"""

ORACLE_SQL["events_cube"] = """
    SELECT event_type, CAST(user_id AS BIGINT) AS user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events
    GROUP BY CUBE(event_type, user_id)
    ORDER BY event_type, user_id"""

ORACLE_SQL["events_value_histogram"] = """
    WITH b AS (
        SELECT CASE WHEN value IS NULL THEN -1
                    ELSE CAST(LEAST(GREATEST(
                             FLOOR((value - 0.0) / 25.0), 0), 19) AS BIGINT)
               END AS bucket
        FROM events
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY bucket ORDER BY bucket"""

ORACLE_SQL["events_mode_per_user"] = """
    SELECT user_id, mode_value, n FROM (
        SELECT user_id, event_type AS mode_value,
               CAST(COUNT(*) AS BIGINT) AS n,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY COUNT(*) DESC, event_type ASC)
                   AS rn
        FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        GROUP BY user_id, event_type
    ) WHERE rn = 1 ORDER BY user_id"""

ORACLE_SQL["events_transitions"] = """
    WITH s AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
              AND ts IS NOT NULL
    )
    SELECT prev AS from_state, event_type AS to_state,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM s WHERE prev IS NOT NULL
    GROUP BY prev, event_type
    ORDER BY from_state, to_state"""

ORACLE_SQL["events_union_sides"] = """
    SELECT user_id, event_type FROM events WHERE value > 100
    UNION
    SELECT user_id, event_type FROM events WHERE ts < TIMESTAMP '2024-01-10'
    ORDER BY user_id, event_type"""

ORACLE_SQL["events_percent_rank"] = """
    SELECT event_id, event_type, value,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST() OVER w AS cd
    FROM events
    WHERE value IS NOT NULL AND event_type IS NOT NULL
    WINDOW w AS (PARTITION BY event_type ORDER BY value)
    ORDER BY event_id"""

ORACLE_SQL["events_argmax_row"] = """
    SELECT event_id, user_id, ts, value FROM (
        SELECT event_id, user_id, ts, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ) WHERE rn = 1 ORDER BY user_id"""

ORACLE_SQL["events_robust_scale"] = """
    WITH r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
        WHERE value IS NOT NULL AND event_type IS NOT NULL
    ), q AS (
        SELECT event_type,
               MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.25 * n) AS BIGINT))
                        THEN value END) AS q1,
               MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.50 * n) AS BIGINT))
                        THEN value END) AS med,
               MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.75 * n) AS BIGINT))
                        THEN value END) AS q3
        FROM r GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           CASE WHEN e.value IS NULL OR e.event_type IS NULL
                     OR q.event_type IS NULL OR q.q3 - q.q1 = 0
                THEN NULL
                ELSE ROUND((e.value - q.med) / (q.q3 - q.q1), 6)
           END AS r
    FROM events e LEFT JOIN q ON e.event_type = q.event_type
    ORDER BY event_id"""

ORACLE_SQL["sample_orders_bottomk"] = """
    SELECT o_orderkey, o_custkey, o_totalprice FROM (
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY CAST((CAST(o_orderkey % 4294967296 AS HUGEINT)
                       * 2654435761) % 4294967296 AS BIGINT), o_orderkey
        LIMIT 500
    ) ORDER BY o_orderkey"""

ORACLE_SQL["events_value_quantiles_exact"] = """
    WITH r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ), qq AS (SELECT unnest([0.25, 0.5, 0.75]) AS q)
    SELECT r.event_type AS event_type, qq.q AS q, r.value AS value
    FROM r JOIN qq
      ON r.rn = GREATEST(1, CAST(CEIL(qq.q * r.n) AS BIGINT))
    ORDER BY event_type, q"""

ORACLE_SQL["events_pivot_user_type"] = """
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT)
               AS n_click,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
               AS n_error,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS n_purchase,
           CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT)
               AS n_signup,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT)
               AS n_view
    FROM events GROUP BY user_id ORDER BY user_id"""

ORACLE_SQL["sample_stratified_events"] = """
    SELECT CAST(event_id AS BIGINT) AS event_id, event_type FROM (
        SELECT event_id, event_type,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY (CAST(event_id % 4294967296 AS HUGEINT)
                             * 2654435761) % 4294967296, event_id) AS rn
        FROM events
    ) WHERE rn <= 5 ORDER BY event_id"""

ORACLE_SQL["text_doc_top_term"] = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(
            trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
        FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM toks WHERE term <> '' GROUP BY doc_id, term
    ), df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ), ranked AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               row_number() OVER (PARTITION BY tf.doc_id
                   ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rn
        FROM tf JOIN df USING (term)
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, term,
           CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
    FROM ranked WHERE rn = 1 ORDER BY doc_id"""

ORACLE_SQL["distinct_users_per_type"] = """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type"""

ORACLE_SQL["image_verdict_summary"] = f"""
    SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(SUM(n_issues) AS BIGINT) AS n_issues
    FROM ({_image_verdict_oracle_sql()})
    GROUP BY verdict ORDER BY verdict"""


def _image_stats_lane_sql(pid_expr: str) -> str:
    lanes = ["CAST(sum(CASE WHEN caption IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_caption"]
    for c in ("w", "h"):
        lanes.append(f"CAST(MIN({c}) AS DOUBLE) AS min_{c}")
        lanes.append(f"CAST(MAX({c}) AS DOUBLE) AS max_{c}")
        lanes.append(
            f"ROUND(SUM(CAST({c} AS DOUBLE)) / GREATEST(count(*) - "
            f"count(*) FILTER (WHERE {c} IS NULL), 1), 4) AS mean_{c}"
        )
    return (
        f"SELECT {pid_expr} AS partition_id, "
        f"CAST(count(*) AS BIGINT) AS n_rows, " + ", ".join(lanes) + " FROM src"
    )


ORACLE_SQL["image_stats_profile"] = f"""
    WITH src AS (SELECT * FROM read_parquet('{_image_fixture_dirname()}/part-*.parquet'))
    {_image_stats_lane_sql('CAST(partition_id AS INT)')} GROUP BY partition_id
    UNION ALL {_image_stats_lane_sql('-1')}"""

ORACLE_SQL["image_stats_exact"] = f"""
    WITH src AS (SELECT * FROM read_parquet('{_image_fixture_dirname()}/part-*.parquet')),
    per AS (
      SELECT CAST(partition_id AS INT) AS partition_id,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN caption IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_caption,
             CAST(MIN(w) AS DOUBLE) AS min_w, CAST(MAX(w) AS DOUBLE) AS max_w,
             ROUND(SUM(CAST(w AS DOUBLE))
                   / GREATEST(count(*) - count(*) FILTER (WHERE w IS NULL), 1), 4)
               AS mean_w
      FROM src GROUP BY partition_id),
    overall AS (
      SELECT -1 AS partition_id, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN caption IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_caption,
             CAST(MIN(w) AS DOUBLE) AS min_w, CAST(MAX(w) AS DOUBLE) AS max_w,
             ROUND(SUM(CAST(w AS DOUBLE))
                   / GREATEST(count(*) - count(*) FILTER (WHERE w IS NULL), 1), 4)
               AS mean_w
      FROM src)
    SELECT * FROM per UNION ALL SELECT * FROM overall"""

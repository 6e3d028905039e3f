"""In-suite oracle gate: a fast subset of the driver-contract queries
cross-checked against DuckDB on sf0.001 (the full set runs via
tools/check_queries.py at sf0.01)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

FAST_QUERIES = [
    "check_range_quantity",
    "check_valueset_returnflag",
    "check_presence_documents",
    "check_unique_orderkey",
    "agg_pricing_summary",
    "agg_latest_event_per_user",
    "agg_daily_events",
    "stats_profile_lineitem",
    "dedup_exact_by_key",
    "text_token_counts",
    "text_langid",
    "knn_embeddings",
    "censoring_coalesce",
    "stats_salted_returnflag",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = np.round(df[c].astype(np.float64), 9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(name, duck):
    import pyarrow as pa
    import ray.data as rd

    from mtb_validation_service_ray.pipelines.queries import ORACLE_SQL, QUERIES

    result = QUERIES[name](SF_DIR)
    if isinstance(result, rd.Dataset):
        got = result.to_pandas()
    elif isinstance(result, pa.Table):
        got = result.to_pandas()
    else:
        got = result
    exp = duck.execute(ORACLE_SQL[name]).fetchdf()
    g, e = _canon(got), _canon(exp)
    assert list(g.columns) == list(e.columns), (list(g.columns), list(e.columns))
    assert len(g) == len(e), (len(g), len(e))
    pd.testing.assert_frame_equal(g, e, check_dtype=False)

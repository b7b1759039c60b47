"""Self-check of the driver contract: every queries() entry runs at sf0.001
and, where an oracle_sql() entry exists, matches DuckDB row-for-row
(order-insensitive, columns sorted by name — the driver's comparison)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_df(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_runs_and_matches_oracle(name, con):
    q = entrymod.queries()[name]
    out = _to_df(q(SF_DIR))
    assert len(out) >= 0
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        assert len(out) > 0, f"{name}: rows-only check expects nonempty"
        return
    want = con.execute(sql).fetchdf()
    got_c, want_c = _canon(out), _canon(want)
    assert list(got_c.columns) == list(want_c.columns), (
        name, list(got_c.columns), list(want_c.columns)
    )
    assert len(got_c) == len(want_c), (name, len(got_c), len(want_c))
    pd.testing.assert_frame_equal(got_c, want_c, check_dtype=False), name


def test_entry_smoke():
    res = entrymod.entry()
    df = _to_df(res)
    assert len(df) > 0
    assert set(df.columns) == {"record_id", "cluster_id", "cluster_score"}

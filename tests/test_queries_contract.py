"""Contract tests for the driver-facing queries()/oracle_sql() registry."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod  # noqa: E402

SF = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
    assert len(oracles) >= 15


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = np.round(df[c].astype(np.float64), 6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize(
    "name",
    [
        "rollup_1h_cascade",
        "sma",
        "exact_dedup",
        "ohlc_1h",
        "gapfill_linear_1h",
        "pricing_summary",
        "stratified_sample",
        "promo_revenue_share",
        "rich_idle_customers",
        "sole_late_supplier",
    ],
)
def test_query_matches_duckdb_oracle(con, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    res = qs[name](SF)
    ray_df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    sql_df = con.execute(oracles[name]).fetchdf()
    a, b = _normalize(ray_df), _normalize(sql_df)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=0, atol=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_sketch_queries_track_exact_answers(con):
    """The approximate sketch operators must land near their exact
    counterparts on the same data (they carry no SQL oracle by design)."""
    qs = entrymod.queries()
    hll = qs["distinct_users_hll"](SF).to_pandas()
    exact = con.execute(
        "SELECT event_type, COUNT(DISTINCT user_id) AS n FROM events GROUP BY 1"
    ).fetchdf()
    merged = hll.merge(exact, on="event_type")
    assert len(merged) == len(exact)
    rel = np.abs(merged["distinct_users_est"] - merged["n"]) / merged["n"]
    assert (rel < 0.05).all(), merged

    td = qs["quantiles_tdigest"](SF).to_pandas()
    ev = con.execute("SELECT event_type, value FROM events").fetchdf()
    for _, row in td.iterrows():
        v = ev.loc[ev["event_type"] == row["event_type"], "value"].to_numpy()
        rank = np.mean(v <= row["estimate"])
        assert abs(rank - row["q"]) < 0.02, (row["event_type"], row["q"], rank)


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    ds = entrymod.entry()
    assert ds.count() > 0
    names = set(ds.schema().names)
    assert {"host", "url", "bucket_ts", "count", "sum", "mean"} <= names
